"""Frontend golden tests vs a NumPy/scipy oracle (SURVEY.md §7)."""

import numpy as np
import pytest

from tpuasr.audio.frontend import (
    FrontendConfig,
    log_spectrogram,
    make_frontend,
    num_frames,
)


def oracle_log_spect(wave: np.ndarray, cfg: FrontendConfig) -> np.ndarray:
    """Straightforward per-utterance STFT oracle mirroring the reference's
    librosa path: center=True reflect pad, periodic hamming, |rfft|, log1p,
    per-utterance mean/std normalize."""
    n_fft, hop = cfg.n_fft, cfg.hop
    half = n_fft // 2
    x = np.pad(wave.astype(np.float64), half, mode="reflect")
    n = np.arange(n_fft)
    win = 0.54 - 0.46 * np.cos(2 * np.pi * n / n_fft)
    t_max = 1 + len(wave) // hop
    frames = np.stack([x[t * hop : t * hop + n_fft] * win for t in range(t_max)])
    mag = np.abs(np.fft.rfft(frames, axis=-1))
    feat = np.log1p(mag)
    if cfg.normalize:
        feat = (feat - feat.mean()) / (feat.std() + 0.0)
    return feat.astype(np.float32)


@pytest.mark.parametrize("dft", ["matmul", "fft"])
def test_matches_numpy_oracle_single(dft):
    rng = np.random.RandomState(0)
    cfg = FrontendConfig(dft=dft)
    wave = rng.uniform(-1, 1, size=4000).astype(np.float32)
    lengths = np.array([4000], dtype=np.int32)
    feats, feat_lengths = log_spectrogram(wave[None, :], lengths, cfg)
    feats = np.asarray(feats)

    ref = oracle_log_spect(wave, cfg)
    assert int(feat_lengths[0]) == ref.shape[0] == num_frames(4000, cfg.hop)
    np.testing.assert_allclose(feats[0], ref, rtol=2e-4, atol=2e-4)


def test_padding_invariance():
    """A padded batch must produce the same features for the short
    utterance as computing it alone (masking correctness)."""
    rng = np.random.RandomState(1)
    cfg = FrontendConfig()
    short = rng.uniform(-1, 1, size=3200).astype(np.float32)
    long = rng.uniform(-1, 1, size=6400).astype(np.float32)

    waves = np.zeros((2, 6400), dtype=np.float32)
    waves[0, :3200] = short
    waves[1] = long
    lengths = np.array([3200, 6400], dtype=np.int32)
    feats, feat_lengths = log_spectrogram(waves, lengths, cfg)
    feats = np.asarray(feats)

    solo, solo_len = log_spectrogram(short[None], np.array([3200], np.int32), cfg)
    t = int(solo_len[0])
    assert int(feat_lengths[0]) == t
    np.testing.assert_allclose(feats[0, :t], np.asarray(solo)[0, :t], rtol=1e-5, atol=1e-5)
    # padded frames zeroed
    assert np.all(feats[0, t:] == 0.0)


def test_normalization_stats():
    rng = np.random.RandomState(2)
    cfg = FrontendConfig()
    wave = rng.uniform(-1, 1, size=8000).astype(np.float32)
    feats, feat_lengths = log_spectrogram(wave[None], np.array([8000], np.int32), cfg)
    t = int(feat_lengths[0])
    valid = np.asarray(feats)[0, :t]
    assert abs(valid.mean()) < 1e-4
    assert abs(valid.std() - 1.0) < 1e-3


def test_shapes_and_jit():
    cfg = FrontendConfig()
    fn = make_frontend(cfg)
    waves = np.zeros((3, 16000), dtype=np.float32)
    lengths = np.array([16000, 8000, 100], dtype=np.int32)
    feats, feat_lengths = fn(waves, lengths)
    assert feats.shape == (3, 1 + 16000 // cfg.hop, cfg.n_features)
    assert feats.shape[2] == 161
    assert list(np.asarray(feat_lengths)) == [101, 51, 1]
