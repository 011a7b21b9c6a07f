"""Measure the reference library's single-node validation throughput on
the SAME rows our engine validates, for the BASELINE.md comparison.

The reference (izxxr/oblate, pure-Python row-at-a-time) can only check
the metadata columns (it has no binary/image notion), so two comparisons
are reported:

1. metadata-only: reference Schema(dict) loop vs our engine's row-level
   schema checks.
2. full payload: plain-python decode+phash per image (the reference
   would have to run exactly this per row) vs our engine's full
   validation suite.

Usage: python tools/reference_throughput.py [n_rows]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/reference")  # import the real reference library
sys.path.insert(0, "/root/repo")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000

    import oblate
    from oblate import fields as rf
    from oblate import validate as rv

    class ImageRow(oblate.Schema):
        image_id = rf.String()
        w = rf.Integer(validators=[rv.Range(1, 4096)])
        h = rf.Integer(validators=[rv.Range(1, 4096)])
        fmt = rf.Literal("bmp", "png", "ppm")
        caption = rf.String(validators=[rv.Length(max=120)])
        phash = rf.Integer()

    # the same deterministic rows our engine validates (metadata only)
    from oblate_spark.fixtures import make_row

    rows = []
    for i in range(n):
        r = make_row(i)
        rows.append(
            {
                "image_id": r["image_id"],
                "w": r["w"],
                "h": r["h"],
                "fmt": r["fmt"],
                "caption": r["caption"],
                "phash": r["phash"],
            }
        )

    # best-of-2: the sandbox host has multi-second interference bursts;
    # a single pass can understate the reference by 2x
    dt = None
    for _ in range(2):
        t0 = time.time()
        n_bad = 0
        for row in rows:
            try:
                ImageRow(row)
            except oblate.ValidationError:
                n_bad += 1
        d = time.time() - t0
        dt = d if dt is None or d < dt else dt
    meta_rps = n / dt

    # payload work the reference WOULD have to do per row (plain python,
    # single process — its execution model)
    from oblate_spark.functions.codecs import ImageDecodeError, decode_image, phash64

    payload_rows = [make_row(i, px=(64, 128)) for i in range(min(n, 5000))]  # bench-size images
    dt_payload = None
    for _ in range(2):
        t0 = time.time()
        for r in payload_rows:
            try:
                px = decode_image(bytes(r["bytes"]))
                phash64(px)
            except ImageDecodeError:
                pass
        d = time.time() - t0
        dt_payload = d if dt_payload is None or d < dt_payload else dt_payload
    payload_rps = len(payload_rows) / dt_payload

    combined_rps = 1.0 / (1.0 / meta_rps + 1.0 / payload_rps)
    print(
        json.dumps(
            {
                "n_rows": n,
                "reference_metadata_rows_per_sec": round(meta_rps, 1),
                "reference_invalid_rows": n_bad,
                "single_process_payload_rows_per_sec": round(payload_rps, 1),
                "reference_equivalent_full_rows_per_sec": round(combined_rps, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
