"""Image-payload constraint checks (Axis A of the north rule).

The reference's ``value_load`` cast kernel (oblate/fields/primitive.py)
generalized to binary payloads: decodability, declared-vs-encoded
width/height/format consistency, and phash recompute — executed in ONE
Arrow-batched ``mapInPandas`` pass that emits a compact report column
set; all violation logic downstream is pure Column expressions.

Scale notes:

* Column pruning matters enormously here: the ``bytes`` column dominates
  I/O. The kernel projects exactly (id, bytes, declared metadata) — a
  run that validates only captions never reads bytes at all (Catalyst
  prunes it, see SURVEY.md §4).
* The kernel emits *metadata only* (ok flag, dims, fmt, phash — ~50
  bytes/row), so the exchange back from Python is tiny regardless of
  image size.
* phash comparison uses ``bit_count(declared ^ actual)`` (JVM-side
  hamming distance) so near-match tolerance is a plan knob, not a
  Python loop.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..errors import ErrorCode

__all__ = ["image_payload_report", "image_payload_violations", "IMAGE_REPORT_SCHEMA"]

IMAGE_REPORT_SCHEMA = (
    "image_id string, decode_ok boolean, decode_err string, "
    "w_actual int, h_actual int, fmt_actual string, phash_actual bigint, "
    "w_declared int, h_declared int, fmt_declared string, phash_declared bigint"
)


def image_payload_report(
    df: DataFrame,
    *,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    w_col: str = "w",
    h_col: str = "h",
    fmt_col: str = "fmt",
    phash_col: str = "phash",
    compute_phash: bool = True,
) -> DataFrame:
    """Decode every payload once, emit the actual-vs-declared report.

    ``compute_phash=False`` skips the DCT (the expensive part) for runs
    that only need decode/dimension checks.
    """
    import pandas as pd

    from ..functions.codecs import ImageDecodeError, decode_image, detect_format, phash64

    cols = [id_col, bytes_col, w_col, h_col, fmt_col, phash_col]

    def kernel(iterator):
        for pdf in iterator:
            n = len(pdf)
            out = {
                "image_id": pdf[id_col].astype(str),
                "decode_ok": [False] * n,
                "decode_err": [None] * n,
                "w_actual": [None] * n,
                "h_actual": [None] * n,
                "fmt_actual": [None] * n,
                "phash_actual": [None] * n,
                "w_declared": pdf[w_col],
                "h_declared": pdf[h_col],
                "fmt_declared": pdf[fmt_col],
                "phash_declared": pdf[phash_col],
            }
            for i, blob in enumerate(pdf[bytes_col]):
                if blob is None:
                    out["decode_err"][i] = "payload is NULL"
                    continue
                data = bytes(blob)
                try:
                    pixels = decode_image(data)
                except ImageDecodeError as e:
                    out["decode_err"][i] = str(e)
                    continue
                out["decode_ok"][i] = True
                out["h_actual"][i] = int(pixels.shape[0])
                out["w_actual"][i] = int(pixels.shape[1])
                out["fmt_actual"][i] = detect_format(data)
                if compute_phash:
                    out["phash_actual"][i] = phash64(pixels)
            # nullable Int64: a plain list with Nones becomes float64 and
            # silently truncates 64-bit hashes to 53-bit mantissas
            out["phash_actual"] = pd.array(out["phash_actual"], dtype="Int64")
            out["w_actual"] = pd.array(out["w_actual"], dtype="Int32")
            out["h_actual"] = pd.array(out["h_actual"], dtype="Int32")
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(kernel, IMAGE_REPORT_SCHEMA)


def image_payload_violations(
    report: DataFrame,
    *,
    phash_tolerance: int = 0,
) -> DataFrame:
    """Report -> violation rows, pure Column expressions.

    Emits (row_id, field_key, error_code, message, value_repr,
    partition_id) matching the engine's violation contract. A failed
    decode suppresses the downstream consistency checks (same gating as
    the reference: a failed load runs no validators,
    oblate/schema.py:267-277).
    """
    r = report
    decode_failed = ~F.col("decode_ok")
    dims_mismatch = F.col("decode_ok") & (
        (F.col("w_declared") != F.col("w_actual")) | (F.col("h_declared") != F.col("h_actual"))
    )
    fmt_mismatch = F.col("decode_ok") & (F.col("fmt_declared") != F.col("fmt_actual"))
    phash_mismatch = F.col("decode_ok") & (
        F.bit_count(
            F.col("phash_declared").bitwiseXOR(F.col("phash_actual"))
        )
        > phash_tolerance
    )

    check_ddl = "struct<field_key:string,error_code:string,message:string,value_repr:string>"

    def chk(cond, field_key, code, message):
        return F.when(
            cond,
            F.struct(
                F.lit(field_key).alias("field_key"),
                F.lit(code).alias("error_code"),
                message.alias("message"),
                F.lit(None).cast("string").alias("value_repr"),
            ),
        ).otherwise(F.lit(None).cast(check_ddl))

    checks = F.filter(
        F.array(
            chk(
                decode_failed,
                "bytes",
                ErrorCode.IMAGE_DECODE_FAILED,
                F.concat(F.lit("Image bytes failed to decode: "), F.coalesce(F.col("decode_err"), F.lit("unknown"))),
            ),
            chk(
                dims_mismatch,
                "w,h",
                ErrorCode.IMAGE_DIMS_MISMATCH,
                F.concat(
                    F.lit("Declared dimensions "),
                    F.col("w_declared").cast("string"),
                    F.lit("x"),
                    F.col("h_declared").cast("string"),
                    F.lit(" do not match encoded "),
                    F.col("w_actual").cast("string"),
                    F.lit("x"),
                    F.col("h_actual").cast("string"),
                ),
            ),
            chk(
                fmt_mismatch,
                "fmt",
                ErrorCode.IMAGE_FMT_MISMATCH,
                F.concat(
                    F.lit("Declared format '"),
                    F.col("fmt_declared"),
                    F.lit("' does not match encoded '"),
                    F.coalesce(F.col("fmt_actual"), F.lit("?")),
                    F.lit("'"),
                ),
            ),
            chk(
                phash_mismatch,
                "phash",
                ErrorCode.IMAGE_PHASH_MISMATCH,
                F.concat(
                    F.lit("Stored phash "),
                    F.col("phash_declared").cast("string"),
                    F.lit(" does not match recomputed "),
                    F.col("phash_actual").cast("string"),
                ),
            ),
        ),
        lambda x: x.isNotNull(),
    )

    return (
        r.select(
            F.col("image_id").alias("row_id"),
            F.explode(checks).alias("v"),
            F.spark_partition_id().alias("partition_id"),
        )
        .select(
            "row_id",
            F.col("v.field_key").alias("field_key"),
            F.col("v.error_code").alias("error_code"),
            F.col("v.message").alias("message"),
            F.col("v.value_repr").alias("value_repr"),
            "partition_id",
        )
    )


def image_schema():
    """The row-level Schema for the input_hint image table — the
    reference-semantics checks (Literal/Range/Length/none) that compose
    with the payload kernel and the table-level uniqueness checks."""
    from .. import fields
    from .. import validate as V
    from ..schema import Schema

    class ImageRow(Schema):
        image_id = fields.String()
        bytes = fields.Binary()
        w = fields.Integer(validators=[V.Range(1, 4096)])
        h = fields.Integer(validators=[V.Range(1, 4096)])
        fmt = fields.Literal("bmp", "png", "ppm")
        caption = fields.String(validators=[V.Length(max=120)])
        phash = fields.Integer()

    return ImageRow


def validate_image_table(
    df: DataFrame,
    *,
    phash_tolerance: int = 0,
    check_payload: bool = True,
    check_unique: bool = True,
) -> DataFrame:
    """Full north-rule validation of an image+caption table: row-level
    schema checks + payload kernel + salted uniqueness on image_id and
    phash. Returns one unified violations DataFrame.

    Each component is a separate Catalyst plan unioned at the end;
    Spark schedules them as independent stages over the same scan
    (the parquet footer/cache makes the second scan cheap; at cluster
    scale, persist the source or use a single-pass observe variant).
    """
    from .stats import uniqueness_violations

    schema = image_schema()
    res = schema.validate(df, row_id="image_id", extra_columns_ok=("image_id",))
    parts = [res.violations]

    if check_payload:
        report = image_payload_report(df)
        parts.append(image_payload_violations(report, phash_tolerance=phash_tolerance))

    if check_unique:
        uid = uniqueness_violations(df, "image_id", row_id="image_id").drop("dup_count")
        uph = uniqueness_violations(df, "phash", row_id="image_id").drop("dup_count")
        pid = F.lit(-1).alias("partition_id")  # table-level checks have no source partition
        parts.append(uid.withColumn("value_repr", F.lit(None).cast("string")).select(
            "row_id", "field_key", "error_code", "message", "value_repr", pid))
        parts.append(uph.withColumn("value_repr", F.lit(None).cast("string")).select(
            "row_id", "field_key", "error_code", "message", "value_repr", pid))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
