"""Cross-table pixel-fidelity validation (the north-rule per-row
invariant: decoded-pixel allclose / PSNR >= 40 dB for lossy formats,
plus exact caption equality).

Given two versions of an image table keyed by id — reference output vs
this engine's output, or a table before/after a re-encode migration —
:func:`pixel_fidelity` verifies every pair at the DECODED-PIXEL level,
not the byte level: two payloads may differ byte-for-byte (different
encoder, different filter choices) while being pixel-identical, and a
lossy re-encode is acceptable exactly while PSNR stays above the
threshold.

The contract is engine-exact: the kernel emits the squared-error sum
``sse`` and pixel count ``n_px`` as BIGINTs, and the PSNR gate is the
integer comparison ``255^2 * n_px >= 10^(dB/10) * sse`` — algebraically
identical to ``10*log10(255^2 * n_px / sse) >= dB`` but with no log
anywhere in the decision path, so verdicts never depend on libm
rounding (same philosophy as tfidf's rational idf).

Distribution: ONE full-outer shuffle join on the id (both payload
columns move through the exchange once — unavoidable for content
comparison; store both tables bucketed by id to turn it into a
zero-shuffle sort-merge join), then ONE Arrow-batched ``mapInPandas``
pass that decodes both sides and reduces each pair to a ~50-byte
report row. Caption equality is evaluated JVM-side (``eqNullSafe``)
before the Python stage, so the kernel only ever sees the two binary
columns. Nothing is collected.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

__all__ = ["pixel_fidelity", "FIDELITY_REPORT_SCHEMA"]

#: id column is appended with the caller's name/type at runtime
FIDELITY_REPORT_SCHEMA = (
    "status string, both_decoded boolean, pixels_exact boolean, "
    "psnr_ok boolean, sse bigint, n_px bigint"
)


def pixel_fidelity(
    a: DataFrame,
    b: DataFrame,
    *,
    id_col: str,
    bytes_col: str = "bytes",
    caption_col: Optional[str] = None,
    min_psnr_db: float = 40.0,
) -> DataFrame:
    """Per-id decoded-pixel fidelity report between tables ``a`` and
    ``b``.

    Output: (id, status, both_decoded, pixels_exact, psnr_ok,
    sse, n_px[, caption_equal]):

    * ``status`` — ``'pass'`` (both decoded, PSNR gate met; includes
      bit-exact pairs), ``'low_psnr'``, ``'dims_differ'`` (decoded
      shapes disagree — no meaningful PSNR), ``'undecodable'`` (either
      side failed to decode), ``'missing_a'`` / ``'missing_b'`` (id
      absent on one side).
    * ``sse`` — exact BIGINT sum of squared per-channel differences;
      ``n_px`` — number of channel samples (h*w*3). NULL unless both
      sides decoded with matching dims.
    * ``pixels_exact`` — sse == 0; ``psnr_ok`` — the integer-compare
      PSNR gate (``pixels_exact`` implies ``psnr_ok``).
    * ``caption_equal`` (only when ``caption_col`` given) — null-safe
      caption equality, computed JVM-side; NULL when the id is missing
      on a side.

    PSNR >= ``min_psnr_db``  ⇔  255² · n_px >= 10^(dB/10) · sse; with
    the default 40 dB the scale factor is exactly 10^4, so the gate is
    a pure-integer comparison.
    """
    import pandas as pd

    id_type = a.schema[id_col].dataType.simpleString()
    scale = 10.0 ** (float(min_psnr_db) / 10.0)

    a_side = a.select(
        F.col(id_col).alias("__id_a"),
        F.col(bytes_col).alias("__bytes_a"),
        *(
            [F.col(caption_col).alias("__cap_a")]
            if caption_col
            else []
        ),
    )
    b_side = b.select(
        F.col(id_col).alias("__id_b"),
        F.col(bytes_col).alias("__bytes_b"),
        *(
            [F.col(caption_col).alias("__cap_b")]
            if caption_col
            else []
        ),
    )
    joined = a_side.join(
        b_side, F.col("__id_a").eqNullSafe(F.col("__id_b")), "full_outer"
    ).select(
        F.coalesce("__id_a", "__id_b").alias(id_col),
        F.col("__id_a").isNotNull().alias("__in_a"),
        F.col("__id_b").isNotNull().alias("__in_b"),
        "__bytes_a",
        "__bytes_b",
        *(
            [
                F.when(
                    F.col("__id_a").isNotNull() & F.col("__id_b").isNotNull(),
                    F.col("__cap_a").eqNullSafe(F.col("__cap_b")),
                ).alias("caption_equal")
            ]
            if caption_col
            else []
        ),
    )

    passthrough = [id_col, "__in_a", "__in_b"] + (
        ["caption_equal"] if caption_col else []
    )
    out_schema = f"{id_col} {id_type}, " + FIDELITY_REPORT_SCHEMA + (
        ", caption_equal boolean" if caption_col else ""
    )

    def kernel(iterator):
        import numpy as np

        from ..functions.codecs import ImageDecodeError, decode_image

        for pdf in iterator:
            n = len(pdf)
            status: list = [None] * n
            sse = np.zeros(n, dtype=np.int64)
            npx = np.zeros(n, dtype=np.int64)
            valid = np.zeros(n, dtype=bool)
            both = np.zeros(n, dtype=bool)
            in_a = pdf["__in_a"].to_numpy()
            in_b = pdf["__in_b"].to_numpy()
            for i in range(n):
                if not in_a[i]:
                    status[i] = "missing_a"
                    continue
                if not in_b[i]:
                    status[i] = "missing_b"
                    continue
                try:
                    pa = decode_image(bytes(pdf["__bytes_a"].iloc[i]))
                    pb = decode_image(bytes(pdf["__bytes_b"].iloc[i]))
                except (ImageDecodeError, TypeError, ValueError):
                    status[i] = "undecodable"
                    continue
                both[i] = True
                if pa.shape != pb.shape:
                    status[i] = "dims_differ"
                    continue
                d = pa.astype(np.int64) - pb.astype(np.int64)
                sse[i] = int(np.sum(d * d))
                npx[i] = pa.size
                valid[i] = True
                # 255^2 * n_px >= 10^(dB/10) * sse  ⇔  PSNR >= dB
                ok = 65025 * npx[i] >= scale * sse[i]
                status[i] = "pass" if ok else "low_psnr"
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "status": status,
                    "both_decoded": pd.array(
                        [
                            (None if s in ("missing_a", "missing_b") else b_)
                            for s, b_ in zip(status, both)
                        ],
                        dtype="boolean",
                    ),
                    "pixels_exact": pd.array(
                        [
                            (sse[i] == 0) if valid[i] else None
                            for i in range(n)
                        ],
                        dtype="boolean",
                    ),
                    "psnr_ok": pd.array(
                        [
                            (status[i] == "pass") if valid[i] else None
                            for i in range(n)
                        ],
                        dtype="boolean",
                    ),
                    "sse": pd.array(
                        [int(sse[i]) if valid[i] else None for i in range(n)],
                        dtype="Int64",
                    ),
                    "n_px": pd.array(
                        [int(npx[i]) if valid[i] else None for i in range(n)],
                        dtype="Int64",
                    ),
                    **(
                        {"caption_equal": pdf["caption_equal"].astype("boolean")}
                        if caption_col
                        else {}
                    ),
                }
            )

    slim = joined.select(*passthrough, "__bytes_a", "__bytes_b")
    return slim.mapInPandas(kernel, out_schema)
