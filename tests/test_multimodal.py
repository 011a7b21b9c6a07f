"""Multimodal payload plumbing: real image resize/features, stubbed
audio/video kernels with real Spark-side schemas and batch shapes."""

from __future__ import annotations

import numpy as np
import pytest

from oblate_spark import fixtures
from oblate_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def images_df(spark):
    df = fixtures.build_images_df(spark, 60, partitions=4).cache()
    df.count()
    return df


def test_image_resize_real(spark, images_df):
    out = mm.image_resize(images_df, width=16, height=16).cache()
    rows = out.collect()
    assert len(rows) == 60
    from oblate_spark.functions.codecs import decode_image

    decoded = 0
    for r in rows:
        if r["bytes"] is None:
            continue  # injected bad_bytes rows can't be resized
        px = decode_image(bytes(r["bytes"]))
        assert px.shape == (16, 16, 3)
        decoded += 1
    bad = fixtures.expected_defect_counts(60).get("bad_bytes", 0)
    assert decoded == 60 - bad
    out.unpersist()


def test_image_resize_deterministic(spark, images_df):
    a = {r["image_id"]: bytes(r["bytes"]) for r in mm.image_resize(images_df).collect() if r["bytes"]}
    b = {r["image_id"]: bytes(r["bytes"]) for r in mm.image_resize(images_df).collect() if r["bytes"]}
    assert a == b


def test_image_features_normalized(spark, images_df):
    feats = mm.image_features(images_df).collect()
    assert feats
    for r in feats[:10]:
        v = np.array(r["embedding"])
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9


def test_audio_features_stub_plumbing(spark, images_df):
    # binary column stands in for audio payloads; the kernel contract
    # (schema, determinism, batch shape) is what's under test
    out = mm.audio_features(images_df, bytes_col="bytes", id_col="image_id", dim=8)
    rows = out.collect()
    assert out.columns == ["image_id", "embedding"]
    assert all(len(r["embedding"]) == 8 for r in rows)
    again = {r["image_id"]: r["embedding"] for r in mm.audio_features(
        images_df, bytes_col="bytes", id_col="image_id", dim=8).collect()}
    assert all(again[r["image_id"]] == r["embedding"] for r in rows)


def test_audio_features_stub_gate(spark, images_df):
    with pytest.raises(NotImplementedError):
        mm.audio_features(images_df, bytes_col="bytes", id_col="image_id", allow_stub=False)


def test_video_frame_sample_stub(spark, images_df):
    out = mm.video_frame_sample(images_df, bytes_col="bytes", id_col="image_id", n_frames=3)
    rows = out.collect()
    per_id: dict = {}
    for r in rows:
        per_id.setdefault(r["image_id"], []).append(r["frame_index"])
    assert all(sorted(v) == [0, 1, 2] for v in per_id.values())
    # frames are decodable images (stub emits real PPMs)
    from oblate_spark.functions.codecs import decode_image

    px = decode_image(bytes(rows[0]["frame_bytes"]))
    assert px.shape == (8, 8, 3)
