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
    assert out.columns == ["image_id", "embedding", "is_stub"]
    assert all(r["is_stub"] for r in rows)  # image bytes are not WAV -> stub vectors, flagged
    assert all(len(r["embedding"]) == 8 for r in rows)
    again = {r["image_id"]: r["embedding"] for r in mm.audio_features(
        images_df, bytes_col="bytes", id_col="image_id", dim=8).collect()}
    assert all(again[r["image_id"]] == r["embedding"] for r in rows)


def test_audio_features_stub_gate(spark, images_df):
    # audio decode is now REAL for WAV; image payloads are not audio, so
    # with allow_stub=False every row is skipped (no stub fallback)
    out = mm.audio_features(
        images_df.limit(5), bytes_col="bytes", id_col="image_id", allow_stub=False
    )
    assert out.count() == 0


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


def test_wav_codec_roundtrip_and_features():
    import numpy as np

    from oblate_spark.functions.audiocodecs import (
        AudioDecodeError,
        audio_feature_vector,
        decode_wav,
        encode_wav,
    )

    rate = 8000
    t = np.arange(rate)  # 1 second
    tone = (np.sin(2 * np.pi * 440.0 * t / rate) * 20000).astype(np.int16)
    blob = encode_wav(tone, rate)
    samples, got_rate = decode_wav(blob)
    assert got_rate == rate and samples.shape == (rate, 1)
    assert np.allclose(samples[:, 0], tone / 32768.0, atol=1e-9)

    vec = audio_feature_vector(samples, rate, dim=16)
    assert len(vec) == 16
    assert abs(vec[0] - 1.0) < 1e-9                    # duration 1s
    assert abs(vec[1] - (20000 / 32768) / np.sqrt(2)) < 0.01  # sine RMS
    assert abs(vec[3] * (rate / 2) - 440.0) < 5.0      # spectral centroid at the tone

    # stereo + 8-bit paths
    stereo = np.stack([tone, -tone], axis=1)
    s2, r2 = decode_wav(encode_wav(stereo, rate))
    assert s2.shape == (rate, 2) and r2 == rate

    for bad in (b"", b"RIFFxxxxWAVE", blob[:40], b"\x00" * 64):
        with pytest.raises(AudioDecodeError):
            decode_wav(bad)


def test_audio_features_real_wav_kernel(spark):
    """audio_features is REAL for WAV payloads: the spectral centroid
    separates a 200 Hz tone from a 3000 Hz tone; undecodable payloads
    fall back to the stub (or are skipped with allow_stub=False)."""
    import numpy as np

    from oblate_spark.functions.audiocodecs import encode_wav
    from oblate_spark.operators.multimodal import audio_features

    rate = 8000
    t = np.arange(rate)

    def tone(freq):
        return encode_wav((np.sin(2 * np.pi * freq * t / rate) * 20000).astype(np.int16), rate)

    rows = [("low", tone(200.0)), ("high", tone(3000.0)), ("junk", b"not audio")]
    df = spark.createDataFrame(rows, "clip_id string, payload binary")

    feats = {
        r["clip_id"]: r["embedding"]
        for r in audio_features(df, bytes_col="payload", id_col="clip_id", dim=16).collect()
    }
    assert set(feats) == {"low", "high", "junk"}
    stubs = {
        r["clip_id"]: r["is_stub"]
        for r in audio_features(df, bytes_col="payload", id_col="clip_id", dim=16).collect()
    }
    assert stubs == {"low": False, "high": False, "junk": True}
    assert feats["low"][3] < feats["high"][3]  # centroid orders the tones
    assert abs(feats["low"][0] - 1.0) < 1e-9   # real decode: duration 1s

    strict = audio_features(
        df, bytes_col="payload", id_col="clip_id", dim=16, allow_stub=False
    ).collect()
    assert {r["clip_id"] for r in strict} == {"low", "high"}  # junk skipped


def test_audio_fixture_and_report_match_manifest(spark):
    from oblate_spark import fixtures
    from oblate_spark.operators.multimodal import audio_payload_report

    # parallelism invariance (same property as the image fixture)
    a = fixtures.build_audio_df(spark, 40, partitions=2).orderBy("clip_id").collect()
    b = fixtures.build_audio_df(spark, 40, partitions=8).orderBy("clip_id").collect()
    for ra, rb in zip(a, b):
        assert ra["clip_id"] == rb["clip_id"]
        assert bytes(ra["payload"]) == bytes(rb["payload"])

    rep = {r["clip_id"]: r for r in audio_payload_report(
        fixtures.build_audio_df(spark, 100)).collect()}
    for i in range(100):
        m = fixtures.audio_manifest_for_index(i)
        r = rep[m["clip_id"]]
        assert r["decode_ok"] == m["decode_ok"]
        assert r["rate"] == m["rate"] and r["n_samples"] == m["n_samples"]
        if m["decode_ok"]:
            assert abs(r["duration"] - m["n_samples"] / fixtures.AUDIO_RATE) < 1e-12


def test_image_resize_non_square(spark):
    """Non-square targets must be truly resampled to width x height —
    the old square-resample-then-crop emitted a 32x32 payload while
    claiming h=64, or threw away the bottom half of the picture."""
    from oblate_spark import fixtures
    from oblate_spark.functions.codecs import decode_image
    from oblate_spark.operators.multimodal import image_resize

    df = fixtures.build_images_df(spark, 6, partitions=2)
    out = image_resize(df, width=16, height=40).filter("bytes is not null").collect()
    assert out
    for r in out:
        px = decode_image(bytes(r["bytes"]))
        assert px.shape == (40, 16, 3)
        assert (r["w"], r["h"]) == (16, 40)


def test_image_features_dim_cap(spark):
    from oblate_spark.operators.multimodal import image_features

    with pytest.raises(ValueError, match="<= 64"):
        image_features(spark.range(1).selectExpr("'x' as image_id", "cast(null as binary) as bytes"), dim=128)


def test_video_frames_marked_stub(spark):
    from oblate_spark import fixtures
    from oblate_spark.operators.multimodal import video_frame_sample

    df = fixtures.build_images_df(spark, 2, partitions=1).selectExpr(
        "image_id as vid", "bytes as payload"
    )
    rows = video_frame_sample(df, bytes_col="payload", id_col="vid", n_frames=2).collect()
    assert rows and all(r["is_stub"] for r in rows)


def test_y4m_codec_roundtrip():
    import numpy as np

    from oblate_spark.functions.videocodecs import (
        VideoDecodeError,
        decode_y4m,
        encode_y4m,
        probe_y4m,
    )

    rng = np.random.default_rng(7)
    # mono is bit-exact through the luma plane
    gray = rng.integers(0, 256, (3, 8, 16), dtype=np.uint8)
    blob = encode_y4m(gray, fps=(30, 1), colorspace="mono")
    meta = probe_y4m(blob)
    assert meta == {
        "colorspace": "mono", "w": 16, "h": 8,
        "fps_num": 30, "fps_den": 1, "n_frames": 3,
    }
    frames, fps = decode_y4m(blob)
    assert fps == (30, 1) and frames.shape == (3, 8, 16, 3)
    assert (frames[:, :, :, 0] == gray).all()  # gray-replicated channels
    assert (frames[:, :, :, 1] == gray).all()

    # 444 survives RGB->YUV->RGB within rounding (+-1 count)
    rgb = rng.integers(0, 256, (4, 8, 8, 3), dtype=np.uint8)
    back, _ = decode_y4m(encode_y4m(rgb, colorspace="444"))
    assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 1

    # 420 subsamples chroma but keeps luma within subsampling error
    b420 = encode_y4m(rgb, colorspace="420jpeg")
    assert probe_y4m(b420)["colorspace"] == "420jpeg"
    picked, _ = decode_y4m(b420, frame_indices=[2, 0])
    assert picked.shape == (2, 8, 8, 3)
    luma = lambda a: a[..., 0] * 0.299 + a[..., 1] * 0.587 + a[..., 2] * 0.114
    assert np.abs(luma(picked[0].astype(float)) - luma(rgb[2].astype(float))).max() < 4

    # selective decode matches full decode frame-for-frame
    full, _ = decode_y4m(b420)
    assert (picked[0] == full[2]).all() and (picked[1] == full[0]).all()

    with pytest.raises(VideoDecodeError):
        decode_y4m(b420, frame_indices=[99])
    for bad in (
        b"", b"garbage", b"YUV4MPEG2 W4 H4\n", blob[:20],
        b420[: len(b420) - 3],  # truncated last frame
        encode_y4m(rgb, colorspace="444")[:60],
    ):
        with pytest.raises(VideoDecodeError):
            probe_y4m(bad)

    # odd dims reject 420 on both ends
    odd = rng.integers(0, 256, (1, 7, 8, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        encode_y4m(odd, colorspace="420jpeg")


def test_y4m_odd_dimension_c420_rejected_everywhere():
    """The two classic demuxer edge bugs, part 1: odd-dimension C420.
    A floor-dividing demuxer would mis-size the chroma planes and walk
    the stream off-by-(w//2 or h//2) bytes per frame; this demuxer's
    contract is to REJECT odd-dim 420 headers cleanly (the Y4M/420
    convention — 2x2 chroma blocks need even dims), which the payload
    report must surface as decode_ok=false, never a task failure."""
    import numpy as np

    from oblate_spark.functions.videocodecs import (
        VideoDecodeError, encode_y4m, probe_y4m,
    )

    rng = np.random.default_rng(23)
    for w, h in ((5, 4), (4, 5), (5, 5), (1, 1), (3, 9)):
        # hand-craft the header (encode_y4m refuses to produce these):
        # plausible floor-sized payload so only the header check can
        # catch it
        plane = w * h + 2 * ((w // 2) * (h // 2))
        body = rng.integers(0, 256, plane, dtype=np.uint8).tobytes()
        for cs in ("420jpeg", "420mpeg2", "420"):
            blob = (
                f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{cs}\n".encode()
                + b"FRAME\n" + body
            )
            with pytest.raises(VideoDecodeError):
                probe_y4m(blob)
    # the same dims are fine for 444/mono (no chroma blocks)
    odd = rng.integers(0, 256, (1, 5, 7, 3), dtype=np.uint8)
    assert probe_y4m(encode_y4m(odd, colorspace="444"))["n_frames"] == 1
    assert probe_y4m(encode_y4m(odd[:, :, :, 0], colorspace="mono"))["w"] == 7


def test_y4m_truncated_mid_frame_payload():
    """Part 2: truncation at EVERY byte position of the final frame —
    header cut, FRAME-marker cut, and mid-plane cut must all raise
    VideoDecodeError (probe walks every frame, so a short tail can
    never silently report fewer frames... except exactly at a frame
    boundary, where the stream genuinely IS a valid shorter clip)."""
    import numpy as np

    from oblate_spark.functions.videocodecs import (
        VideoDecodeError, encode_y4m, probe_y4m,
    )

    rng = np.random.default_rng(29)
    rgb = rng.integers(0, 256, (3, 4, 6, 3), dtype=np.uint8)
    blob = encode_y4m(rgb, colorspace="420jpeg")
    hdr_end = blob.index(b"\n") + 1
    frame_size = len(b"FRAME\n") + 4 * 6 + 2 * (2 * 3)
    assert len(blob) == hdr_end + 3 * frame_size
    boundaries = {hdr_end + k * frame_size for k in (1, 2)}
    for cut in range(hdr_end, len(blob)):
        piece = blob[:cut]
        if cut in boundaries:
            assert probe_y4m(piece)["n_frames"] == (cut - hdr_end) // frame_size
        else:
            with pytest.raises(VideoDecodeError):
                probe_y4m(piece)


def test_video_payload_report_flags_odd_and_truncated(spark):
    """End-to-end: the odd-dim C420 and truncated-frame payloads flow
    through video_payload_report as decode_ok=false rows."""
    import numpy as np

    from oblate_spark.functions.videocodecs import encode_y4m
    from oblate_spark.operators.multimodal import video_payload_report

    rng = np.random.default_rng(31)
    good = encode_y4m(
        rng.integers(0, 256, (2, 4, 4, 3), dtype=np.uint8), colorspace="420jpeg"
    )
    oddhdr = b"YUV4MPEG2 W5 H4 F25:1 C420jpeg\nFRAME\n" + b"\x80" * (5 * 4 + 2 * 4)
    rows = [
        ("good", bytearray(good)),
        ("odd_c420", bytearray(oddhdr)),
        ("truncated", bytearray(good[:-3])),
    ]
    df = spark.createDataFrame(rows, "video_id string, payload binary")
    rep = {r["video_id"]: r for r in video_payload_report(df).collect()}
    assert rep["good"]["decode_ok"] is True and rep["good"]["n_frames"] == 2
    assert rep["odd_c420"]["decode_ok"] is False
    assert rep["truncated"]["decode_ok"] is False


def test_y4m_probe_never_misraises():
    """Fuzz: arbitrary byte mutations of a valid stream either probe
    fine or raise VideoDecodeError — never any other exception (the
    kernel's no-task-failure contract)."""
    import numpy as np

    from oblate_spark.functions.videocodecs import (
        VideoDecodeError, encode_y4m, probe_y4m,
    )

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, (2, 4, 4, 3), dtype=np.uint8)
    base = bytearray(encode_y4m(rgb, colorspace="444"))
    for trial in range(200):
        blob = bytearray(base)
        for _ in range(rng.integers(1, 4)):
            blob[rng.integers(0, len(blob))] = rng.integers(0, 256)
        try:
            probe_y4m(bytes(blob))
        except VideoDecodeError:
            pass
    for trial in range(100):
        junk = rng.integers(0, 256, rng.integers(0, 200), dtype=np.uint8).tobytes()
        try:
            probe_y4m(junk)
        except VideoDecodeError:
            pass


def test_video_frame_sample_real(spark):
    """Y4M payloads demux REALLY: sampled frames carry is_stub=False,
    the closed-form sampler indices, and pixel content matching the
    encoded source (mono = exact)."""
    import numpy as np

    from oblate_spark.functions.codecs import decode_image
    from oblate_spark.functions.videocodecs import encode_y4m
    from oblate_spark.operators.multimodal import sample_frame_indices, video_frame_sample

    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, (6, 8, 8), dtype=np.uint8)
    rows = [
        ("real", bytearray(encode_y4m(gray, colorspace="mono"))),
        ("junk", bytearray(b"not a video")),
    ]
    df = spark.createDataFrame(rows, "video_id string, payload binary")
    out = video_frame_sample(df, bytes_col="payload", id_col="video_id", n_frames=4)
    got = {(r["video_id"], r["frame_index"]): r for r in out.collect()}

    expect_real = sample_frame_indices(6, 4)  # [0, 1, 3, 4]
    assert sorted(k for v, k in got if v == "real") == sorted(expect_real)
    for k in expect_real:
        r = got[("real", k)]
        assert r["is_stub"] is False
        px = decode_image(bytes(r["frame_bytes"]))
        assert (px[:, :, 0] == gray[k]).all()
    assert all(got[("junk", k)]["is_stub"] is True for k in range(4))

    # allow_stub=False: undecodable payloads become ONE marker row
    # (frame_index=-1, frame_bytes NULL) instead of stub frames — a
    # corrupt clip must never silently vanish from the output
    strict = video_frame_sample(
        df, bytes_col="payload", id_col="video_id", n_frames=4, allow_stub=False
    )
    srows = strict.collect()
    assert {r["video_id"] for r in srows} == {"real", "junk"}
    markers = [r for r in srows if r["video_id"] == "junk"]
    assert len(markers) == 1
    assert markers[0]["frame_index"] == -1
    assert markers[0]["frame_bytes"] is None
    assert markers[0]["is_stub"] is False
    assert all(r["frame_index"] >= 0 for r in srows if r["video_id"] == "real")


def test_video_frame_sample_strict_null_payload_marker(spark):
    """NULL payloads also surface as marker rows in strict mode (and
    are dropped in stub mode — no bytes to derive a stub from)."""
    from oblate_spark.operators.multimodal import video_frame_sample

    df = spark.createDataFrame(
        [("nul", None)], "video_id string, payload binary"
    )
    strict = video_frame_sample(
        df, bytes_col="payload", id_col="video_id", n_frames=4, allow_stub=False
    ).collect()
    assert len(strict) == 1 and strict[0]["frame_index"] == -1
    lax = video_frame_sample(
        df, bytes_col="payload", id_col="video_id", n_frames=4
    ).collect()
    assert lax == []


def test_video_payload_report_and_fixture_manifest(spark):
    """video_payload_report matches the closed-form fixture manifest
    row-for-row (the video_validation oracle, in miniature)."""
    from oblate_spark import fixtures
    from oblate_spark.operators.multimodal import video_payload_report

    n = 30
    rep = video_payload_report(fixtures.build_video_df(spark, n))
    by_id = {r["video_id"]: r for r in rep.collect()}
    assert len(by_id) == n
    for i in range(n):
        m = fixtures.video_manifest_for_index(i)
        r = by_id[m["video_id"]]
        for k in ("decode_ok", "w", "h", "n_frames", "fps_num", "fps_den", "colorspace"):
            assert r[k] == m[k], (i, k, r[k], m[k])
