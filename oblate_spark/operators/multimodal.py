"""Multimodal binary-payload plumbing (training-data pipeline ops).

Images/audio/video are opaque ``binary`` columns with typed metadata;
transformations run as Arrow-batched kernels over ``mapInPandas``. The
image path is fully REAL (this repo ships its own codecs,
functions/codecs.py), so is the audio path for RIFF/WAVE PCM
(functions/audiocodecs.py: pure-numpy decode + spectral features), and
so is the video path for YUV4MPEG2 (functions/videocodecs.py:
pure-numpy demux + frame decode). Compressed formats (mp3/ogg audio,
mp4/webm video) need libs absent from this sandbox, so those remain
deterministic STUBS — the Spark-side plumbing (schemas, partitioning,
UDF signatures, batch shapes) is real and tested, and the stub body is
the single function to swap for pyav/soundfile when available.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
from pyspark.sql import DataFrame

__all__ = [
    "image_resize",
    "image_features",
    "audio_features",
    "audio_payload_report",
    "video_frame_sample",
    "video_payload_report",
    "sample_frame_indices",
]

#: flip to True only in environments with real audio/video codecs
REAL_AV_CODECS_AVAILABLE = False


def image_resize(
    df: DataFrame, *, bytes_col: str = "bytes", id_col: str = "image_id",
    width: int = 32, height: int = 32, out_fmt: str = "ppm",
) -> DataFrame:
    """REAL image resize: decode -> area-average resample -> re-encode.

    Output: (id, bytes binary, w int, h int, fmt string). Undecodable
    payloads yield NULL bytes (callers route them through the validation
    kernel's decode_failed path instead)."""
    import pandas as pd

    def kernel(iterator):
        from ..functions.codecs import ImageDecodeError, decode_image, encode_image
        from ..functions.codecs import _resize_area  # area resampler

        for pdf in iterator:
            ids, blobs = pdf[id_col], pdf[bytes_col]
            out_bytes: list = []
            for blob in blobs:
                if blob is None:
                    out_bytes.append(None)
                    continue
                try:
                    px = decode_image(bytes(blob))
                except ImageDecodeError:
                    out_bytes.append(None)
                    continue
                # true width x height area resample (a square resample
                # followed by a crop silently discarded image content
                # for non-square targets and lied in the metadata)
                chans = [
                    np.clip(
                        np.rint(_resize_area(px[:, :, c].astype(np.float64), width, height)),
                        0,
                        255,
                    )
                    for c in range(3)
                ]
                small = np.stack(chans, axis=2).astype(np.uint8)
                out_bytes.append(bytearray(encode_image(small, out_fmt)))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "bytes": out_bytes,
                    "w": width,
                    "h": height,
                    "fmt": out_fmt,
                }
            )

    return df.select(id_col, bytes_col).mapInPandas(
        kernel, f"{id_col} string, bytes binary, w int, h int, fmt string"
    )


def image_features(
    df: DataFrame, *, bytes_col: str = "bytes", id_col: str = "image_id", dim: int = 64
) -> DataFrame:
    """REAL image feature extraction: the 8x8 DCT block (the same one
    pHash thresholds) as a dense float vector — a cheap, deterministic
    visual embedding usable by operators.similarity. ``dim`` slices
    that 64-coefficient block, so it is capped at 64 — asking for more
    would silently return 64-dim vectors that break downstream
    fixed-width cosine joins."""
    if dim > 64:
        raise ValueError(f"dim must be <= 64 (the 8x8 DCT block); got {dim}")
    import pandas as pd

    def kernel(iterator):
        from ..functions.codecs import ImageDecodeError, _DCT32, _resize_area, decode_image

        for pdf in iterator:
            ids, feats = [], []
            for i, blob in zip(pdf[id_col], pdf[bytes_col]):
                if blob is None:
                    continue
                try:
                    px = decode_image(bytes(blob))
                except ImageDecodeError:
                    continue
                gray = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                d = _DCT32 @ _resize_area(gray, 32) @ _DCT32.T
                vec = d[:8, :8].flatten()[:dim]
                norm = np.linalg.norm(vec) or 1.0
                ids.append(i)
                feats.append((vec / norm).astype(float).tolist())
            # object dtype: an EMPTY batch otherwise yields float64
            # columns that Arrow cannot convert to array<double>
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=object),
                    "embedding": pd.Series(feats, dtype=object),
                }
            )

    return df.select(id_col, bytes_col).mapInPandas(
        kernel, f"{id_col} string, embedding array<double>"
    )


def _stub_vector(payload: bytes, dim: int) -> list:
    """Deterministic fake feature vector: seeded from the payload hash.
    Replaces a real decode in sandboxes without av codecs."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(float).tolist()


def audio_features(
    df: DataFrame, *, bytes_col: str, id_col: str, dim: int = 32, allow_stub: bool = True
) -> DataFrame:
    """Audio feature extraction over binary payloads — REAL for
    RIFF/WAVE PCM (this repo ships its own pure-numpy WAV codec,
    functions/audiocodecs.py): duration / RMS / zero-crossing rate /
    spectral centroid / log-spaced FFT band energies.

    Compressed formats (mp3/ogg/flac) need decoders absent from this
    sandbox: with ``allow_stub`` an undecodable payload falls back to a
    deterministic hash-seeded vector (so downstream plumbing always has
    full coverage); with ``allow_stub=False`` undecodable payloads are
    skipped — swap a real decoder into ``decode_wav``'s interface to
    extend coverage.

    Every output row carries ``is_stub``: False for really-decoded
    features, True for hash-seeded fallback vectors — so stub features
    can never be mistaken for real ones downstream (filter
    ``~is_stub`` before using the embeddings for anything semantic)."""
    import pandas as pd

    def kernel(iterator):
        from ..functions.audiocodecs import audio_feature_vector, decode_wav

        for pdf in iterator:
            ids, feats, stub = [], [], []
            for i, blob in zip(pdf[id_col], pdf[bytes_col]):
                if blob is None:
                    continue
                data = bytes(blob)
                try:
                    samples, rate = decode_wav(data)
                    vec = audio_feature_vector(samples, rate, dim).tolist()
                    is_stub = False
                except Exception:  # undecodable payload, never a task failure
                    if not allow_stub:
                        continue
                    vec = _stub_vector(data, dim)
                    is_stub = True
                ids.append(i)
                feats.append(vec)
                stub.append(is_stub)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=object),
                    "embedding": pd.Series(feats, dtype=object),
                    "is_stub": pd.Series(stub, dtype=bool),
                }
            )

    return df.select(id_col, bytes_col).mapInPandas(
        kernel, f"{id_col} string, embedding array<double>, is_stub boolean"
    )


def sample_frame_indices(total: int, n_frames: int) -> list:
    """Uniform frame-sample positions: ``n_frames`` indices spread over
    ``total`` demuxed frames (closed-form; duplicates when n > total).
    Module-level so fixture oracles reproduce it exactly."""
    return [min(total - 1, (k * total) // n_frames) for k in range(n_frames)]


def video_frame_sample(
    df: DataFrame, *, bytes_col: str, id_col: str, n_frames: int = 4, allow_stub: bool = True
) -> DataFrame:
    """Uniform frame sampling from video payloads — REAL for YUV4MPEG2
    (this repo ships its own pure-numpy Y4M demuxer,
    functions/videocodecs.py): each payload is demuxed, ``n_frames``
    uniformly-spread frames are decoded (only those — the kernel never
    materializes a whole clip) and re-encoded as PPM thumbnails ready
    for the image operators (resize, features, dedup on frames).

    Compressed containers (mp4/webm) need demuxers absent from this
    sandbox: with ``allow_stub`` an undecodable payload falls back to
    ``n_frames`` deterministic hash-derived 8x8 pseudo-frames (so
    downstream plumbing always has full coverage; NULL payloads are
    dropped — there is no byte content to derive a stub from). With
    ``allow_stub=False`` an undecodable or NULL payload emits ONE
    marker row ``(id, frame_index=-1, frame_bytes=NULL,
    is_stub=false)`` — corrupt clips must never silently vanish from
    the output the way the image/audio paths never drop malformed
    payloads; filter ``frame_index >= 0`` for decoded frames only.
    Every output row carries ``is_stub`` — False for really-demuxed
    frames (and markers), True for the fallback (mirroring
    audio_features), so fabricated frames can never be mistaken for
    real ones downstream:
    (id, frame_index int, frame_bytes binary, is_stub boolean)."""
    import pandas as pd

    if REAL_AV_CODECS_AVAILABLE:
        # the flag's contract: when real compressed-format demuxers
        # exist, the fallback body below must be REPLACED, not silently
        # used — fabricating frames while claiming real demux would
        # poison downstream consumers
        raise NotImplementedError(
            "REAL_AV_CODECS_AVAILABLE is set but video_frame_sample still "
            "carries the hash-stub fallback — swap in the pyav/ffmpeg "
            "demuxer for compressed containers here"
        )

    def kernel(iterator):
        from ..functions.codecs import encode_image
        from ..functions.videocodecs import VideoDecodeError, decode_y4m, probe_y4m

        for pdf in iterator:
            ids, idxs, frames, stubs = [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[bytes_col]):
                if blob is None:
                    if not allow_stub:
                        ids.append(i)
                        idxs.append(-1)
                        frames.append(None)
                        stubs.append(False)
                    continue
                data = bytes(blob)
                try:
                    total = probe_y4m(data)["n_frames"]
                    picks = sample_frame_indices(total, n_frames)
                    decoded, _fps = decode_y4m(data, frame_indices=picks)
                    for k, px in zip(picks, decoded):
                        ids.append(i)
                        idxs.append(k)
                        frames.append(bytearray(encode_image(px, "ppm")))
                        stubs.append(False)
                    continue
                except VideoDecodeError:
                    if not allow_stub:
                        # marker row: the clip is undecodable, not absent
                        ids.append(i)
                        idxs.append(-1)
                        frames.append(None)
                        stubs.append(False)
                        continue
                # fallback: deterministic pseudo-frames. Hash the
                # payload ONCE; mix the frame index into the digest
                # (re-hashing a multi-MB blob per frame was n_frames x
                # full-payload md5 in the hot kernel)
                payload_digest = hashlib.md5(data).digest()
                for k in range(n_frames):
                    seed = int.from_bytes(
                        hashlib.md5(payload_digest + k.to_bytes(4, "big")).digest()[:8],
                        "big",
                    )
                    rng = np.random.default_rng(seed)
                    px = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
                    ids.append(i)
                    idxs.append(k)
                    frames.append(bytearray(encode_image(px, "ppm")))
                    stubs.append(True)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_index": idxs,
                    "frame_bytes": frames,
                    "is_stub": pd.Series(stubs, dtype=bool),
                }
            )

    return df.select(id_col, bytes_col).mapInPandas(
        kernel, f"{id_col} string, frame_index int, frame_bytes binary, is_stub boolean"
    )


def video_payload_report(
    df: DataFrame, *, bytes_col: str = "payload", id_col: str = "video_id"
) -> DataFrame:
    """Video analogue of the image/audio payload reports: probe every
    payload once (REAL for YUV4MPEG2 — header parse + per-FRAME plane-
    size walk, no pixel materialization), emit compact per-clip outcome
    columns (decode_ok, w, h, n_frames, fps_num, fps_den, colorspace).
    Malformed/truncated payloads become decode_ok=false rows, never
    task failures."""
    import pandas as pd

    def kernel(iterator):
        from ..functions.videocodecs import probe_y4m

        for pdf in iterator:
            n = len(pdf)
            ok = np.zeros(n, dtype=bool)
            w = np.zeros(n, dtype=np.int32)
            h = np.zeros(n, dtype=np.int32)
            nf = np.zeros(n, dtype=np.int64)
            fn = np.zeros(n, dtype=np.int32)
            fd = np.zeros(n, dtype=np.int32)
            cs: list = [None] * n
            for j, blob in enumerate(pdf[bytes_col]):
                if blob is None:
                    continue
                try:
                    meta = probe_y4m(bytes(blob))
                except Exception:
                    continue
                ok[j] = True
                w[j], h[j] = meta["w"], meta["h"]
                nf[j] = meta["n_frames"]
                fn[j], fd[j] = meta["fps_num"], meta["fps_den"]
                cs[j] = meta["colorspace"]
            miss = ~ok
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "decode_ok": ok,
                    "w": pd.arrays.IntegerArray(w, miss.copy()),
                    "h": pd.arrays.IntegerArray(h, miss.copy()),
                    "n_frames": pd.arrays.IntegerArray(nf, miss.copy()),
                    "fps_num": pd.arrays.IntegerArray(fn, miss.copy()),
                    "fps_den": pd.arrays.IntegerArray(fd, miss.copy()),
                    "colorspace": pd.Series(cs, dtype=object),
                }
            )

    return df.select(id_col, bytes_col).mapInPandas(
        kernel,
        f"{id_col} string, decode_ok boolean, w int, h int, n_frames bigint, "
        "fps_num int, fps_den int, colorspace string",
    )


def audio_payload_report(
    df: DataFrame, *, bytes_col: str = "payload", id_col: str = "clip_id"
) -> DataFrame:
    """Audio analogue of the image payload report: decode every payload
    once (REAL for RIFF/WAVE PCM), emit compact per-clip outcome columns
    (decode_ok, rate, n_samples, n_channels, duration). Malformed
    payloads become decode_ok=false rows, never task failures."""
    import pandas as pd

    def kernel(iterator):
        from ..functions.audiocodecs import decode_wav

        for pdf in iterator:
            n = len(pdf)
            ok = np.zeros(n, dtype=bool)
            rate = np.zeros(n, dtype=np.int32)
            nsamp = np.zeros(n, dtype=np.int64)
            nch = np.zeros(n, dtype=np.int32)
            dur = np.zeros(n, dtype=np.float64)
            for j, blob in enumerate(pdf[bytes_col]):
                if blob is None:
                    continue
                try:
                    samples, r = decode_wav(bytes(blob))
                except Exception:
                    continue
                ok[j] = True
                rate[j] = r
                nsamp[j] = samples.shape[0]
                nch[j] = samples.shape[1]
                dur[j] = samples.shape[0] / float(r)
            miss = ~ok
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "decode_ok": ok,
                    "rate": pd.arrays.IntegerArray(rate, miss.copy()),
                    "n_samples": pd.arrays.IntegerArray(nsamp, miss.copy()),
                    "n_channels": pd.arrays.IntegerArray(nch, miss.copy()),
                    "duration": pd.arrays.FloatingArray(dur, miss.copy()),
                }
            )

    return df.select(id_col, bytes_col).mapInPandas(
        kernel,
        f"{id_col} string, decode_ok boolean, rate int, n_samples bigint, "
        "n_channels int, duration double",
    )
