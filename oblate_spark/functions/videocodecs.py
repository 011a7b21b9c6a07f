"""Pure-numpy video codec: YUV4MPEG2 (Y4M) demux/mux (multimodal
Axis-A extension).

The sandbox has no pyav/ffmpeg, but Y4M — the uncompressed interchange
container every ffmpeg/x264 pipeline can read and write — is fully
parseable with stdlib + numpy, exactly like the RIFF/WAVE PCM path
(functions/audiocodecs.py). So the video path ships its own demuxer:
a plain-text header (``YUV4MPEG2 W<w> H<h> F<num>:<den> C<cs>\\n``)
followed by ``FRAME\\n`` + raw planar YUV per frame. Supported
colorspaces: C444 (full chroma), C420 family (2x2-subsampled chroma),
Cmono (luma only). Compressed containers (mp4/webm) slot in behind the
same interface when a real demuxer is available.

Pixel conversion uses full-range BT.601 (the JPEG/JFIF matrix — the
convention the ``C420jpeg`` colorspace tag names), so a mono round trip
is bit-exact and RGB survives a 444 round trip within +-1 count of
rounding.

Malformed payloads raise ``VideoDecodeError`` only — the mapInPandas
kernels convert that into violation rows, never task failures (same
contract as the image/audio codecs; fuzz-tested).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "VideoDecodeError",
    "encode_y4m",
    "decode_y4m",
    "probe_y4m",
]

_SUPPORTED_CS = ("444", "420jpeg", "420mpeg2", "420paldv", "420", "mono")


class VideoDecodeError(ValueError):
    pass


def _rgb_to_yuv(px: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 RGB -> (h, w, 3) uint8 full-range YUV (BT.601)."""
    f = px.astype(np.float64)
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    v = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(np.rint(np.stack([y, u, v], axis=2)), 0, 255).astype(np.uint8)


def _yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Full-plane float64 Y/U/V -> (h, w, 3) uint8 RGB (BT.601)."""
    uc, vc = u - 128.0, v - 128.0
    r = y + 1.402 * vc
    g = y - 0.344136 * uc - 0.714136 * vc
    b = y + 1.772 * uc
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def _subsample2(plane: np.ndarray) -> np.ndarray:
    """2x2 block mean (the 420 chroma downsample); dims must be even."""
    h, w = plane.shape
    return plane.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))


def encode_y4m(
    frames: np.ndarray,
    *,
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "444",
) -> bytes:
    """Frames -> Y4M bytes.

    ``frames``: uint8, shape (n, h, w, 3) RGB for 444/420* colorspaces
    or (n, h, w) luma for mono. 420 requires even w and h (2x2 chroma
    blocks)."""
    f = np.asarray(frames)
    if colorspace not in _SUPPORTED_CS:
        raise ValueError(f"unsupported colorspace {colorspace!r}")
    mono = colorspace == "mono"
    if mono:
        if f.ndim != 3 or f.shape[0] == 0:
            raise ValueError("mono expects (n, h, w) frames")
    else:
        if f.ndim != 4 or f.shape[3] != 3 or f.shape[0] == 0:
            raise ValueError("expected (n, h, w, 3) RGB frames")
    n, h, w = f.shape[:3]
    if colorspace.startswith("420") and (h % 2 or w % 2):
        raise ValueError("420 colorspaces require even frame dimensions")
    num, den = fps
    header = f"YUV4MPEG2 W{w} H{h} F{num}:{den} Ip A1:1 C{colorspace}\n"
    out = [header.encode("ascii")]
    for k in range(n):
        out.append(b"FRAME\n")
        if mono:
            out.append(f[k].astype(np.uint8).tobytes())
            continue
        yuv = _rgb_to_yuv(f[k])
        y, u, v = (yuv[:, :, c].astype(np.float64) for c in range(3))
        out.append(y.astype(np.uint8).tobytes())
        if colorspace == "444":
            out.append(u.astype(np.uint8).tobytes())
            out.append(v.astype(np.uint8).tobytes())
        else:
            out.append(np.clip(np.rint(_subsample2(u)), 0, 255).astype(np.uint8).tobytes())
            out.append(np.clip(np.rint(_subsample2(v)), 0, 255).astype(np.uint8).tobytes())
    return b"".join(out)


def _parse_header(data: bytes) -> tuple[dict, int]:
    """Y4M stream header -> ({w, h, fps_num, fps_den, colorspace},
    offset of first FRAME marker)."""
    if not data.startswith(b"YUV4MPEG2"):
        raise VideoDecodeError("not a YUV4MPEG2 payload")
    nl = data.find(b"\n", 0, 512)
    if nl < 0:
        raise VideoDecodeError("unterminated Y4M stream header")
    try:
        tokens = data[9:nl].decode("ascii").split()
    except UnicodeDecodeError as e:
        raise VideoDecodeError("non-ascii Y4M header") from e
    meta = {"colorspace": "420jpeg"}  # spec default when C is absent
    try:
        for tok in tokens:
            if tok.startswith("W"):
                meta["w"] = int(tok[1:])
            elif tok.startswith("H"):
                meta["h"] = int(tok[1:])
            elif tok.startswith("F"):
                num, den = tok[1:].split(":")
                meta["fps_num"], meta["fps_den"] = int(num), int(den)
            elif tok.startswith("C"):
                meta["colorspace"] = tok[1:]
            # Ip/A/X parameters are irrelevant to demuxing
    except ValueError as e:
        raise VideoDecodeError(f"malformed Y4M header token: {e}") from e
    for req in ("w", "h", "fps_num", "fps_den"):
        if req not in meta:
            raise VideoDecodeError("Y4M header missing W/H/F parameter")
    if meta["w"] <= 0 or meta["h"] <= 0 or meta["fps_num"] <= 0 or meta["fps_den"] <= 0:
        raise VideoDecodeError("non-positive Y4M dimensions or frame rate")
    cs = meta["colorspace"]
    if cs not in _SUPPORTED_CS:
        raise VideoDecodeError(f"unsupported Y4M colorspace {cs!r}")
    if cs.startswith("420") and (meta["w"] % 2 or meta["h"] % 2):
        raise VideoDecodeError("420 colorspace with odd frame dimensions")
    return meta, nl + 1


def _frame_size(meta: dict) -> int:
    w, h, cs = meta["w"], meta["h"], meta["colorspace"]
    if cs == "mono":
        return w * h
    if cs == "444":
        return 3 * w * h
    return w * h + 2 * (w // 2) * (h // 2)


def _iter_frames(data: bytes, meta: dict, start: int):
    """Yield raw frame payload offsets, validating FRAME markers and
    plane sizes; raises on truncation/garbage between frames."""
    size = _frame_size(meta)
    idx = start
    while idx < len(data):
        if not data.startswith(b"FRAME", idx):
            raise VideoDecodeError("expected FRAME marker")
        nl = data.find(b"\n", idx, idx + 256)
        if nl < 0:
            raise VideoDecodeError("unterminated FRAME header")
        body = nl + 1
        if body + size > len(data):
            raise VideoDecodeError("truncated frame payload")
        yield body
        idx = body + size


def probe_y4m(data: bytes) -> dict:
    """Validate and summarize a Y4M payload WITHOUT materializing pixel
    arrays: {w, h, fps_num, fps_den, colorspace, n_frames}. Walks every
    FRAME marker so truncation anywhere in the stream is caught — this
    is the cheap kernel for payload reports over huge tables."""
    meta, start = _parse_header(bytes(data))
    n = sum(1 for _ in _iter_frames(bytes(data), meta, start))
    if n == 0:
        raise VideoDecodeError("Y4M stream with zero frames")
    return {**meta, "n_frames": n}


def decode_y4m(
    data: bytes, *, frame_indices=None
) -> tuple[np.ndarray, tuple[int, int]]:
    """Y4M bytes -> (uint8 RGB frames (n, h, w, 3), (fps_num, fps_den)).

    Mono payloads come back gray-replicated to 3 channels; 420 chroma is
    nearest-upsampled back to full resolution. ``frame_indices`` decodes
    only the selected frames (in the given order) — the frame-sampling
    kernel never materializes a whole clip."""
    buf = bytes(data)
    meta, start = _parse_header(buf)
    w, h, cs = meta["w"], meta["h"], meta["colorspace"]
    offsets = list(_iter_frames(buf, meta, start))
    if not offsets:
        raise VideoDecodeError("Y4M stream with zero frames")
    picks = range(len(offsets)) if frame_indices is None else frame_indices
    frames = []
    for k in picks:
        if not (0 <= k < len(offsets)):
            raise VideoDecodeError(f"frame index {k} out of range (n={len(offsets)})")
        o = offsets[k]
        y = np.frombuffer(buf, dtype=np.uint8, count=w * h, offset=o).reshape(h, w).astype(np.float64)
        if cs == "mono":
            g = np.clip(np.rint(y), 0, 255).astype(np.uint8)
            frames.append(np.stack([g, g, g], axis=2))
            continue
        if cs == "444":
            u = np.frombuffer(buf, dtype=np.uint8, count=w * h, offset=o + w * h).reshape(h, w)
            v = np.frombuffer(buf, dtype=np.uint8, count=w * h, offset=o + 2 * w * h).reshape(h, w)
        else:  # 420 family: nearest-upsample the subsampled chroma
            cw, chh = w // 2, h // 2
            u = np.frombuffer(buf, dtype=np.uint8, count=cw * chh, offset=o + w * h).reshape(chh, cw)
            v = np.frombuffer(buf, dtype=np.uint8, count=cw * chh, offset=o + w * h + cw * chh).reshape(chh, cw)
            u = u.repeat(2, axis=0).repeat(2, axis=1)
            v = v.repeat(2, axis=0).repeat(2, axis=1)
        frames.append(_yuv_to_rgb(y, u.astype(np.float64), v.astype(np.float64)))
    return np.stack(frames), (meta["fps_num"], meta["fps_den"])
