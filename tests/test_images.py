"""Axis-A image validation: codecs, payload kernel, full-table flow
against the golden defect manifest of the synthetic fixture
(FIXTURES.md F1)."""

from __future__ import annotations

import numpy as np
import pytest

from oblate_spark import fixtures
from oblate_spark.functions import codecs
from oblate_spark.operators.images import (
    image_payload_report,
    image_payload_violations,
    validate_image_table,
)

N = 1000


@pytest.fixture(scope="module")
def images_df(spark):
    df = fixtures.build_images_df(spark, N, partitions=8)
    df = df.cache()
    df.count()
    return df


def test_codec_roundtrip_and_fidelity():
    rng = np.random.default_rng(7)
    for fmt in ("bmp", "png", "ppm"):
        px = rng.integers(0, 256, (21, 33, 3), dtype=np.uint8)
        out = codecs.decode_image(codecs.encode_image(px, fmt))
        # pixel-fidelity invariant: allclose (exact for lossless codecs,
        # PSNR>=40dB would be the threshold for lossy ones)
        assert np.array_equal(px, out)
        assert codecs.psnr(px, out) == float("inf")


def test_generation_is_parallelism_invariant(spark):
    a = fixtures.build_images_df(spark, 50, partitions=2).orderBy("image_id").collect()
    b = fixtures.build_images_df(spark, 50, partitions=8).orderBy("image_id").collect()
    for ra, rb in zip(a, b):
        assert ra["image_id"] == rb["image_id"]
        assert bytes(ra["bytes"]) == bytes(rb["bytes"])
        assert ra["phash"] == rb["phash"]
        assert ra["caption"] == rb["caption"]  # exact caption equality invariant


def test_payload_report_counts(images_df):
    report = image_payload_report(images_df).cache()
    expected = fixtures.expected_defect_counts(N)
    assert report.filter("NOT decode_ok").count() == expected["bad_bytes"]
    v = image_payload_violations(report)
    by_code = {r["error_code"]: r["cnt"] for r in v.groupBy("error_code").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("cnt")
    ).collect()}
    assert by_code["image.decode_failed"] == expected["bad_bytes"]
    assert by_code["image.dims_mismatch"] == expected["dims_mismatch"]
    assert by_code["image.phash_mismatch"] == expected["stale_phash"]
    # bad_fmt rows ('gif' declared, real encoding intact) -> fmt mismatch
    assert by_code["image.fmt_mismatch"] == expected["bad_fmt"]
    report.unpersist()


def test_full_table_validation_matches_manifest(images_df):
    from pyspark.sql import functions as F

    violations = validate_image_table(images_df).cache()
    by_code = {
        r["error_code"]: r["cnt"]
        for r in violations.groupBy("error_code").agg(F.count("*").alias("cnt")).collect()
    }
    exp = fixtures.expected_defect_counts(N)

    assert by_code["field.none_disallowed"] == exp["caption_null"]  # caption NULL
    assert by_code["image.decode_failed"] == exp["bad_bytes"]
    assert by_code["image.dims_mismatch"] == exp["dims_mismatch"]
    assert by_code["image.phash_mismatch"] == exp["stale_phash"]
    assert by_code["validate.range"] == exp["w_range"]
    assert by_code["validate.length"] == exp["caption_overlength"]
    # fmt='gif': Literal violation AND payload fmt-mismatch
    assert by_code["literal.invalid_value"] == exp["bad_fmt"]

    # uniqueness: each dup_image_id row pairs with a distinct base row
    uid = violations.filter("field_key = 'image_id'").count()
    assert uid == 2 * exp["dup_image_id"]

    # phash dups: hot bucket (all share one phash) + dup_phash pair rows
    uph_rows = violations.filter(
        "field_key = 'phash' AND error_code = 'unique.duplicate'"
    ).count()
    assert uph_rows == exp["hot_phash"] + exp["dup_phash"]
    violations.unpersist()


def test_exact_message_strings(images_df):
    violations = validate_image_table(images_df, check_payload=False, check_unique=False)
    msgs = {r["error_code"]: r["message"] for r in violations.collect()}
    assert msgs["field.none_disallowed"] == "This field must not be None."
    assert msgs["validate.range"] == "Value must be in range 1 to 4096 inclusive"
    assert msgs["validate.length"] == "Value length must be less than 120 characters"
    assert msgs["literal.invalid_value"] == "Value must be one of: 'bmp', 'png', 'ppm'"


def _zero_dim_bmp() -> bytes:
    """Valid 1x1 BMP with the height field rewritten to 0."""
    import struct

    px = np.zeros((1, 1, 3), dtype=np.uint8)
    data = bytearray(codecs.encode_image(px, "bmp"))
    struct.pack_into("<i", data, 22, 0)  # DIB height := 0
    return bytes(data)


def _zero_dim_png() -> bytes:
    """Valid 1x1 PNG with IHDR width rewritten to 0 (CRC refreshed)."""
    import struct
    import zlib

    px = np.zeros((1, 1, 3), dtype=np.uint8)
    data = bytearray(codecs.encode_image(px, "png"))
    # IHDR payload starts at 16 (8 sig + 4 len + 4 tag)
    struct.pack_into(">I", data, 16, 0)  # width := 0
    crc = zlib.crc32(bytes(data[12:33])) & 0xFFFFFFFF
    struct.pack_into(">I", data, 33, crc)
    return bytes(data)


def test_zero_dimension_payloads_rejected_not_crash():
    """Regression (round-2 ADVICE): h=0 BMP / w=0 PNG previously passed
    decode and crashed phash with IndexError, failing the Spark task."""
    for blob in (_zero_dim_bmp(), _zero_dim_png()):
        with pytest.raises(codecs.ImageDecodeError):
            codecs.decode_image(blob)


def test_malformed_payload_is_violation_not_task_failure(spark):
    """Any exception in decode/phash must surface as an
    image.decode_failed violation row, never abort the job."""
    rows = [
        ("ok_row", codecs.encode_image(np.full((4, 4, 3), 9, np.uint8), "bmp")),
        ("zero_bmp", _zero_dim_bmp()),
        ("zero_png", _zero_dim_png()),
    ]
    df = spark.createDataFrame(
        [(i, b, 4, 4, "bmp", "cap", 0) for i, b in rows],
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash bigint",
    )
    report = image_payload_report(df)
    bad = {r["image_id"] for r in report.filter("NOT decode_ok").collect()}
    assert bad == {"zero_bmp", "zero_png"}


def test_file_driven_kernel_hadoop_listing(spark, images_df, tmp_path):
    """image_payload_report_from_files lists via the Hadoop FileSystem
    API (object-store-safe, not local glob): multi-directory input and
    scheme-qualified file: URIs both resolve, and the report matches the
    DataFrame-driven kernel on the same rows."""
    from pyspark.sql import functions as F

    from oblate_spark.operators.images import (
        image_payload_report,
        image_payload_report_from_files,
    )

    d1, d2 = str(tmp_path / "part1"), str(tmp_path / "part2")
    par = F.substring("image_id", -1, 1).cast("int") % 2
    a = images_df.filter(par == 0)
    b = images_df.filter(par == 1)
    a.write.mode("overwrite").parquet(d1)
    b.write.mode("overwrite").parquet(d2)

    # multi-directory list input, scheme-qualified on one of them
    rep = image_payload_report_from_files(spark, [f"file:{d1}", d2])
    base = image_payload_report(a.unionByName(b))
    # the fixture contains duplicate image_ids (uniqueness defects), so
    # compare sorted multisets of full report rows, not id-keyed dicts
    key = lambda df: sorted(
        (r["image_id"], r["decode_ok"], r["w_actual"], r["h_actual"], r["fmt_actual"], r["phash_actual"])
        for r in df.collect()
    )
    assert key(rep) == key(base)

    with pytest.raises(ValueError, match="no parquet files"):
        image_payload_report_from_files(spark, str(tmp_path / "empty_nowhere"))


def test_file_driven_kernel_max_files_subset(spark, images_df, tmp_path):
    """max_files truncates the name-sorted file list deterministically:
    the subset report equals the rows of exactly those parquet files
    (the warm-up/sampling knob bench.py uses)."""
    import glob

    import pyarrow.parquet as pq

    from oblate_spark.operators.images import image_payload_report_from_files

    d = str(tmp_path / "subset")
    images_df.repartition(4).write.mode("overwrite").parquet(d)

    from oblate_spark.operators.images import _list_parquet_files

    listed = sorted(_list_parquet_files(spark, [d]))[:2]
    expect_rows = sum(pq.read_table(f[5:] if f.startswith("file:") else f).num_rows
                      for f, _sz in listed)
    rep = image_payload_report_from_files(spark, d, max_files=2)
    assert rep.count() == expect_rows
    assert 0 < expect_rows < images_df.count()


def test_pixel_fidelity_statuses(spark):
    """Hand-built pairs hit every status arm: bit-exact re-encode
    passes, small noise passes the 40dB gate, heavy noise fails it,
    dims mismatch and undecodable are flagged, missing ids surface as
    missing_a/missing_b, caption equality is null-safe."""
    import numpy as np

    from oblate_spark.functions.codecs import encode_image
    from oblate_spark.operators.fidelity import pixel_fidelity

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (8, 9, 3), dtype=np.uint8)
    rows_a = [
        (1, bytearray(encode_image(px, "bmp")), "cap"),
        (2, bytearray(encode_image(px, "png")), None),
        (3, bytearray(encode_image(px, "ppm")), "x"),
        (4, bytearray(encode_image(px, "bmp")), "y"),
        (5, bytearray(b"not an image"), "z"),
        (6, bytearray(encode_image(px, "bmp")), "only in a"),
    ]
    rows_b = [
        (1, bytearray(encode_image(px, "ppm")), "cap"),        # pixel-exact, other codec
        (2, bytearray(encode_image(px ^ 1, "bmp")), "edited"), # 48dB pass; caption differs (NULL vs str)
        (3, bytearray(encode_image(px ^ 0x80, "ppm")), "x"),   # 6dB fail
        (4, bytearray(encode_image(px[:4], "bmp")), "y"),      # dims differ
        (5, bytearray(encode_image(px, "bmp")), "z"),          # a undecodable
        (7, bytearray(encode_image(px, "bmp")), "only in b"),
    ]
    a = spark.createDataFrame(rows_a, "idx long, bytes binary, caption string")
    b = spark.createDataFrame(rows_b, "idx long, bytes binary, caption string")
    out = {
        r["idx"]: r
        for r in pixel_fidelity(
            a, b, id_col="idx", caption_col="caption"
        ).collect()
    }
    n_px = 8 * 9 * 3
    assert out[1]["status"] == "pass" and out[1]["pixels_exact"] is True
    assert out[1]["sse"] == 0 and out[1]["n_px"] == n_px
    assert out[1]["caption_equal"] is True
    assert out[2]["status"] == "pass" and out[2]["pixels_exact"] is False
    assert out[2]["sse"] == n_px and out[2]["psnr_ok"] is True
    assert out[2]["caption_equal"] is False  # NULL vs 'edited'
    assert out[3]["status"] == "low_psnr" and out[3]["sse"] == 16384 * n_px
    assert out[3]["psnr_ok"] is False
    assert out[4]["status"] == "dims_differ" and out[4]["sse"] is None
    assert out[4]["both_decoded"] is True
    assert out[5]["status"] == "undecodable" and out[5]["both_decoded"] is False
    assert out[6]["status"] == "missing_b" and out[6]["caption_equal"] is None
    assert out[7]["status"] == "missing_a"


def test_degraded_fixture_matches_manifest(spark):
    """The degraded twin's closed-form manifest holds end-to-end on a
    300-row slice: category determines sse exactly (lsb -> n_px,
    msb -> 16384*n_px, identical -> 0 even though the bytes may be a
    different encoding)."""
    from oblate_spark import fixtures
    from oblate_spark.operators.fidelity import pixel_fidelity

    n = 300
    a = fixtures.build_indexed_images_df(spark, n)
    b = fixtures.build_degraded_images_df(spark, n)
    rows = {
        r["idx"]: r
        for r in pixel_fidelity(
            a, b, id_col="idx", caption_col="caption"
        ).collect()
    }
    assert len(rows) == n
    for i in range(n):
        cat = fixtures.fidelity_category_for_index(i)
        r = rows[i]
        if cat == "undecodable":
            assert r["status"] == "undecodable", i
        elif cat == "identical":
            assert r["status"] == "pass" and r["sse"] == 0, i
        elif cat == "lsb_flip":
            assert r["status"] == "pass" and r["sse"] == r["n_px"], i
        else:
            assert r["status"] == "low_psnr" and r["sse"] == 16384 * r["n_px"], i
        assert r["caption_equal"] == (i % 10 != 9), i
