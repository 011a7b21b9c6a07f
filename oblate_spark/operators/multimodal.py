"""Multimodal binary-payload plumbing (training-data pipeline ops).

Images/audio/video are opaque ``binary`` columns with typed metadata;
transformations run as Arrow-batched kernels over ``mapInPandas``. The
image path is fully REAL (this repo ships its own codecs); audio/video
decoding needs libs absent from this sandbox, so those kernels are
deterministic STUBS — the Spark-side plumbing (schemas, partitioning,
UDF signatures, batch shapes) is real and tested, and the stub body is
the single function to swap for soundfile/pyav when available.
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
    "video_frame_sample",
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
                chans = [
                    np.clip(np.rint(_resize_area(px[:, :, c].astype(np.float64), width)), 0, 255)
                    for c in range(3)
                ]
                small = np.stack(chans, axis=2).astype(np.uint8)[:height, :width]
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
    visual embedding usable by operators.similarity."""
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
            yield pd.DataFrame({id_col: ids, "embedding": feats})

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
    """Audio feature extraction over binary payloads.

    STUB: real decoding (soundfile/librosa) is unavailable in this
    sandbox. With ``allow_stub`` the kernel emits a deterministic
    hash-seeded vector (full Arrow plumbing exercised); otherwise it
    raises NotImplementedError, the marker for swapping in a real codec.
    """
    import pandas as pd

    if not REAL_AV_CODECS_AVAILABLE and not allow_stub:
        raise NotImplementedError(
            "audio decoding requires soundfile/librosa, absent in this sandbox"
        )

    def kernel(iterator):
        for pdf in iterator:
            ids, feats = [], []
            for i, blob in zip(pdf[id_col], pdf[bytes_col]):
                if blob is None:
                    continue
                ids.append(i)
                feats.append(_stub_vector(bytes(blob), dim))
            yield pd.DataFrame({id_col: ids, "embedding": feats})

    return df.select(id_col, bytes_col).mapInPandas(
        kernel, f"{id_col} string, embedding array<double>"
    )


def video_frame_sample(
    df: DataFrame, *, bytes_col: str, id_col: str, n_frames: int = 4, allow_stub: bool = True
) -> DataFrame:
    """Uniform frame sampling from video payloads.

    STUB: real demuxing (pyav/ffmpeg) is unavailable here. The stub
    emits ``n_frames`` deterministic pseudo-frames (hash-derived 8x8
    PPM thumbnails) per payload so downstream image operators — resize,
    features, dedup on frames — run against real binary columns with
    the exact schema a real demuxer would produce:
    (id, frame_index int, frame_bytes binary)."""
    import pandas as pd

    if not REAL_AV_CODECS_AVAILABLE and not allow_stub:
        raise NotImplementedError("video demuxing requires pyav/ffmpeg, absent in this sandbox")

    def kernel(iterator):
        from ..functions.codecs import encode_image

        for pdf in iterator:
            ids, idxs, frames = [], [], []
            for i, blob in zip(pdf[id_col], pdf[bytes_col]):
                if blob is None:
                    continue
                for k in range(n_frames):
                    seed = int.from_bytes(
                        hashlib.md5(bytes(blob) + k.to_bytes(4, "big")).digest()[:8], "big"
                    )
                    rng = np.random.default_rng(seed)
                    px = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
                    ids.append(i)
                    idxs.append(k)
                    frames.append(bytearray(encode_image(px, "ppm")))
            yield pd.DataFrame({id_col: ids, "frame_index": idxs, "frame_bytes": frames})

    return df.select(id_col, bytes_col).mapInPandas(
        kernel, f"{id_col} string, frame_index int, frame_bytes binary"
    )
