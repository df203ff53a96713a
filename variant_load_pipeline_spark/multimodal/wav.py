"""Pure-stdlib WAV (PCM) codec — a REAL audio decode path with no
external audio libraries (stdlib ``wave`` + numpy).

Covers integer PCM WAV: 8-bit unsigned, 16-bit and 32-bit signed, any
channel count / sample rate.  Like the PNG codec, this is the per-row
kernel inside Arrow batches; the Spark-side contract (binary column in,
fixed-schema features out) lives in ``binary_ops``.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

_DTYPES = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n_frames, n_channels) array, sample_rate).

    8-bit PCM is unsigned per the spec; 16/32-bit are signed
    little-endian.
    """
    with wave.open(io.BytesIO(data), "rb") as w:
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        frames = w.readframes(w.getnframes())
    if width == 3:  # 24-bit: widen each sample to 4 bytes
        b = np.frombuffer(frames, np.uint8).reshape(-1, 3)
        ext = np.where(b[:, 2] >= 128, 255, 0).astype(np.uint8)
        samples = (
            np.column_stack([b, ext]).tobytes()
        )
        arr = np.frombuffer(samples, "<i4")
    else:
        dt = _DTYPES.get(width)
        if dt is None:
            raise ValueError(f"unsupported sample width {width}")
        arr = np.frombuffer(frames, dt)
    return arr.reshape(-1, n_ch), rate


def encode_wav(
    samples: np.ndarray, sample_rate: int, sampwidth: int = 2
) -> bytes:
    """(n_frames[, n_channels]) int array -> PCM WAV bytes."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    dt = _DTYPES.get(sampwidth)
    if dt is None:
        raise ValueError(f"unsupported sample width {sampwidth}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(a.shape[1])
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(np.ascontiguousarray(a, dtype=dt).tobytes())
    return buf.getvalue()


def wav_features(data: bytes) -> dict:
    """Decode + summarize: geometry, duration, mean absolute amplitude."""
    arr, rate = decode_wav(data)
    n_frames, n_ch = arr.shape
    return {
        "n_frames": int(n_frames),
        "n_channels": int(n_ch),
        "sample_rate": int(rate),
        "duration_ms": int(n_frames * 1000 // rate) if rate else 0,
        "mean_abs_amplitude": round(
            float(np.abs(arr.astype(np.float64)).mean()) if n_frames else 0.0,
            6,
        ),
    }
