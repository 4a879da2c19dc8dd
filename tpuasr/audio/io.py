"""Host-side WAV IO.

Reference parity: ``load_audio`` in ref:data/data_loader.py reads a WAV
and normalizes samples to [-1, 1]. The environment has no
librosa/soundfile, so this uses scipy.io.wavfile (always available).
"""

from __future__ import annotations

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def load_audio(path: str, expected_sample_rate: int | None = None) -> np.ndarray:
    """Read a WAV file -> mono float32 ndarray in [-1, 1].

    Integer PCM is scaled by its dtype range; float WAVs pass through.
    Multi-channel audio is averaged to mono (reference behavior for the
    deepspeech family: corpora are mono; averaging is the safe superset).
    """
    sr, data = wavfile.read(path)
    if expected_sample_rate is not None and sr != expected_sample_rate:
        data = _to_float(data)
        data = resample_poly_host(data, sr, expected_sample_rate)
        sr = expected_sample_rate
    data = _to_float(data)
    if data.ndim > 1:
        data = data.mean(axis=1)
    return np.ascontiguousarray(data, dtype=np.float32)


def load_audio_pcm16(path: str,
                     expected_sample_rate: int | None = None) -> np.ndarray:
    """Read a WAV -> mono int16 ndarray (PCM16 counts).

    Fast path for the corpora norm (16-bit PCM mono at the expected
    rate): the samples pass through untouched — no float conversion on
    the host at all. Anything else goes through the float pipeline and
    is re-quantized. Device code divides by 32768 (tpuasr.train.step),
    so int16 batches halve the host->device transfer bytes — that
    transfer is the sustained-throughput bottleneck on tunneled TPUs
    (BASELINE.md).
    """
    sr, data = wavfile.read(path)
    if (
        data.dtype == np.int16
        and data.ndim == 1
        and (expected_sample_rate is None or sr == expected_sample_rate)
    ):
        return data
    w = load_audio(path, expected_sample_rate=expected_sample_rate)
    return (np.clip(w, -1.0, 1.0) * 32767.0).astype(np.int16)


def _to_float(data: np.ndarray) -> np.ndarray:
    if data.dtype == np.int16:
        return data.astype(np.float32) / 32768.0
    if data.dtype == np.int32:
        return data.astype(np.float32) / 2147483648.0
    if data.dtype == np.uint8:
        return (data.astype(np.float32) - 128.0) / 128.0
    return data.astype(np.float32)


def resample_poly_host(data: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase resample on host (corpus prep path; the training-time
    tempo augmentation is on-device — see tpuasr.audio.augment)."""
    if sr_in == sr_out:
        return data
    g = np.gcd(int(sr_in), int(sr_out))
    if data.ndim > 1:
        data = data.mean(axis=1)
    return resample_poly(data.astype(np.float32), sr_out // g, sr_in // g).astype(
        np.float32
    )


def save_audio(path: str, data: np.ndarray, sample_rate: int) -> None:
    data = np.clip(np.asarray(data, dtype=np.float32), -1.0, 1.0)
    wavfile.write(path, sample_rate, (data * 32767.0).astype(np.int16))


def duration_seconds(path: str) -> float:
    """Duration without decoding (replaces the reference's `sox --i -D`
    subprocess in manifest prep, ref:data/utils.py)."""
    sr, data = wavfile.read(path, mmap=True)
    return float(data.shape[0]) / float(sr)
