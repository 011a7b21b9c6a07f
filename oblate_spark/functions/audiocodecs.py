"""Pure-numpy audio codec + features (multimodal Axis-A extension).

The sandbox has no soundfile/librosa, but RIFF/WAVE PCM is fully
decodable with struct+numpy — so the audio path ships its own codec the
same way the image path does (functions/codecs.py): WAV PCM 16-bit and
8-bit, mono or multi-channel, plus a deterministic spectral feature
vector (duration, RMS, zero-crossing rate, spectral centroid, log-
spaced FFT band energies). Compressed formats (mp3/ogg/flac) would
slot in behind the same interface when a real decoder is available.

Malformed payloads raise ``AudioDecodeError`` only — the mapInPandas
kernels convert that into violation rows, never task failures (same
contract as the image codecs; fuzz-tested).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "AudioDecodeError",
    "encode_wav",
    "decode_wav",
    "audio_feature_vector",
]


class AudioDecodeError(ValueError):
    pass


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 samples, shape (n,) or (n, channels) -> RIFF/WAVE PCM bytes."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2 or s.shape[0] == 0:
        raise ValueError("expected (n,) or (n, channels) samples")
    s = s.astype("<i2")
    n, ch = s.shape
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes -> (float64 samples in [-1, 1], shape
    (n, channels), sample_rate). Accepts 16-bit signed and 8-bit
    unsigned PCM. Raises AudioDecodeError for anything malformed."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise AudioDecodeError("not a RIFF/WAVE payload")
    idx = 12
    fmt = None
    pcm = None
    while idx + 8 <= len(data):
        tag = data[idx : idx + 4]
        (length,) = struct.unpack_from("<I", data, idx + 4)
        payload = data[idx + 8 : idx + 8 + length]
        if len(payload) < length:
            raise AudioDecodeError("truncated WAV chunk")
        if tag == b"fmt ":
            if length < 16:
                raise AudioDecodeError("short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", payload, 0)
        elif tag == b"data":
            pcm = payload
        idx += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise AudioDecodeError("missing fmt/data chunk")
    audio_fmt, ch, rate, _byterate, _block, bits = fmt
    if audio_fmt != 1 or ch <= 0 or rate <= 0:
        raise AudioDecodeError("unsupported WAV variant (PCM only)")
    if bits == 16:
        frame = ch * 2
        n = len(pcm) // frame
        if n == 0:
            raise AudioDecodeError("empty WAV data")
        arr = np.frombuffer(pcm[: n * frame], dtype="<i2").reshape(n, ch)
        return arr.astype(np.float64) / 32768.0, rate
    if bits == 8:
        n = len(pcm) // ch
        if n == 0:
            raise AudioDecodeError("empty WAV data")
        arr = np.frombuffer(pcm[: n * ch], dtype=np.uint8).reshape(n, ch)
        return (arr.astype(np.float64) - 128.0) / 128.0, rate
    raise AudioDecodeError(f"unsupported bit depth {bits}")


def audio_feature_vector(samples: np.ndarray, rate: int, dim: int = 32) -> np.ndarray:
    """Deterministic feature vector from decoded samples: [duration_s,
    rms, zero_crossing_rate, spectral_centroid_normalized] followed by
    (dim - 4) log-spaced FFT band log-energies (L2-normalized). Pure
    numpy; same contract a real mel-spectrogram extractor would fill."""
    if dim < 5:
        raise ValueError("dim must be >= 5")
    mono = samples.mean(axis=1) if samples.ndim == 2 else np.asarray(samples, dtype=np.float64)
    n = len(mono)
    duration = n / float(rate)
    rms = float(np.sqrt(np.mean(mono * mono))) if n else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(mono))))) if n > 1 else 0.0

    spec = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    power = spec * spec
    total = power.sum()
    centroid = float((freqs * power).sum() / total) if total > 0 else 0.0
    nyquist = rate / 2.0

    n_bands = dim - 4
    # log-spaced band edges from ~20 Hz to nyquist
    edges = np.geomspace(20.0, max(nyquist, 21.0), n_bands + 1)
    bands = np.zeros(n_bands)
    for b in range(n_bands):
        mask = (freqs >= edges[b]) & (freqs < edges[b + 1])
        bands[b] = np.log1p(power[mask].sum())
    norm = np.linalg.norm(bands) or 1.0
    return np.concatenate(
        [[duration, rms, zcr, centroid / nyquist if nyquist else 0.0], bands / norm]
    )
