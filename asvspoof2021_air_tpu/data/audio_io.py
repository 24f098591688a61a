"""Audio file IO without external audio dependencies.

The environment carries no librosa/soundfile/ffmpeg; WAV (PCM 8/16/24/32-bit
and float32) is handled natively via the stdlib + numpy, with an optional
soundfile fallback for FLAC when that library is present (the reference loads
via librosa with a soundfile fallback, /root/reference/raw_dataset.py:20-28).
"""

from __future__ import annotations

import struct
import wave
from typing import Optional, Tuple

import numpy as np

try:  # optional
    import soundfile as _sf
except ImportError:  # pragma: no cover
    _sf = None


def read_wav(path: str, target_sr: Optional[int] = 16000) -> Tuple[np.ndarray, int]:
    """Read a WAV file to mono float32 in [-1, 1]; resamples with a
    polyphase-free linear interpolator only if target_sr differs."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)

    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        ints = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        ints = np.where(ints >= 1 << 23, ints - (1 << 24), ints)
        data = ints.astype(np.float32) / float(1 << 23)
    else:
        raise ValueError(f"unsupported WAV sample width {width} in {path}")

    if n_ch > 1:
        data = data.reshape(-1, n_ch).mean(axis=1)

    if target_sr is not None and sr != target_sr:
        data = resample_linear(data, sr, target_sr)
        sr = target_sr
    return data, sr


def write_wav(path: str, data: np.ndarray, sr: int = 16000) -> None:
    """Write mono float32 [-1, 1] to 16-bit PCM WAV."""
    data = np.clip(np.asarray(data, dtype=np.float32), -1.0, 1.0)
    pcm = np.round(data * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def resample_linear(data: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    """Linear-interpolation resampler (adequate for the telephony-band
    augmentation chain; the native C++ tier carries the windowed-sinc
    resampler for codec simulation)."""
    n_out = int(round(len(data) * target_sr / sr))
    x_old = np.arange(len(data), dtype=np.float64)
    x_new = np.linspace(0, len(data) - 1, n_out)
    return np.interp(x_new, x_old, data).astype(np.float32)


def read_flac(path: str, target_sr: Optional[int] = 16000) -> Tuple[np.ndarray, int]:
    """Read a FLAC file to mono float32 via the native decoder
    (native/augment/flac.cc); no librosa/soundfile needed."""
    from asvspoof2021_air_tpu.data import augment_host

    with open(path, "rb") as f:
        data = f.read()
    samples, sr, bps = augment_host.flac_decode(data)
    scale = float(1 << (bps - 1))
    mono = samples.astype(np.float32).mean(axis=1) / scale
    if target_sr is not None and sr != target_sr:
        mono = resample_linear(mono, sr, target_sr)
        sr = target_sr
    return mono, sr


def load_audio(path: str, target_sr: int = 16000) -> Tuple[np.ndarray, int]:
    """Load any supported audio file to mono float32 at target_sr.

    WAV and FLAC are handled natively; other formats require soundfile.
    """
    if path.lower().endswith(".wav"):
        return read_wav(path, target_sr)
    if path.lower().endswith(".flac"):
        try:
            return read_flac(path, target_sr)
        except (ValueError, OSError):
            if _sf is None:
                raise
    if _sf is not None:
        data, sr = _sf.read(path, dtype="float32")
        if data.ndim > 1:
            data = data.mean(axis=1)
        if sr != target_sr:
            data = resample_linear(data, sr, target_sr)
            sr = target_sr
        return data, sr
    raise RuntimeError(
        f"cannot load {path}: unsupported format (WAV/FLAC are native; others "
        "need the optional soundfile package)"
    )
