"""On-device augmentation tests (speed/gain, noise, SpecAugment)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.audio.augment import (
    AugmentConfig,
    inject_noise,
    spec_augment,
    speed_and_gain,
)


def test_speed_changes_length():
    rng = np.random.RandomState(0)
    waves = jnp.asarray(rng.randn(8, 16000).astype(np.float32))
    lengths = jnp.full((8,), 16000, jnp.int32)
    cfg = AugmentConfig(tempo_low=0.85, tempo_high=1.15)
    out, new_lengths = speed_and_gain(jax.random.PRNGKey(0), waves, lengths, cfg)
    assert out.shape == waves.shape
    nl = np.asarray(new_lengths)
    # rates in [0.85, 1.15] -> lengths in [16000/1.15, 16000] (clipped)
    assert (nl >= 16000 / 1.16).all() and (nl <= 16000).all()
    assert len(set(nl.tolist())) > 1  # per-utterance randomness
    # padded region zeroed
    out = np.asarray(out)
    for i in range(8):
        assert np.all(out[i, nl[i]:] == 0.0)


def test_speed_identity_at_rate_one():
    rng = np.random.RandomState(1)
    waves = jnp.asarray(rng.randn(2, 4000).astype(np.float32))
    lengths = jnp.full((2,), 4000, jnp.int32)
    cfg = AugmentConfig(tempo_low=1.0, tempo_high=1.0,
                        gain_db_low=0.0, gain_db_high=0.0)
    out, nl = speed_and_gain(jax.random.PRNGKey(0), waves, lengths, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(waves),
                               rtol=1e-5, atol=1e-6)


def test_noise_injection_prob_and_level():
    rng = np.random.RandomState(2)
    waves = jnp.asarray(rng.randn(16, 4000).astype(np.float32))
    lengths = jnp.full((16,), 4000, jnp.int32)
    bank = jnp.asarray(rng.randn(32000).astype(np.float32))
    cfg = AugmentConfig(noise_prob=1.0, noise_min=0.3, noise_max=0.3)
    out = inject_noise(jax.random.PRNGKey(0), waves, lengths, bank, cfg)
    diff = np.asarray(out) - np.asarray(waves)
    # every utterance got noise at ~0.3x its own RMS
    rms_x = np.sqrt((np.asarray(waves) ** 2).mean(axis=1))
    rms_d = np.sqrt((diff ** 2).mean(axis=1))
    np.testing.assert_allclose(rms_d / rms_x, 0.3, rtol=0.15)

    cfg0 = AugmentConfig(noise_prob=0.0)
    out0 = inject_noise(jax.random.PRNGKey(0), waves, lengths, bank, cfg0)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(waves))


def test_spec_augment_masks():
    rng = np.random.RandomState(3)
    feats = jnp.asarray(np.abs(rng.randn(4, 50, 161)).astype(np.float32) + 1.0)
    fl = jnp.full((4,), 50, jnp.int32)
    cfg = AugmentConfig(spec_augment=True, freq_mask_width=30,
                        time_mask_frac=0.2)
    out = np.asarray(spec_augment(jax.random.PRNGKey(0), feats, fl, cfg))
    assert out.shape == feats.shape
    # some bins zeroed, most untouched
    zeros = (out == 0.0).mean()
    assert 0.0 < zeros < 0.5
    # untouched bins identical
    same = out == np.asarray(feats)
    assert same.mean() > 0.5


def _dominant_hz(x: np.ndarray, sr: int = 16000) -> float:
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return float(np.argmax(spec)) * sr / len(x)


def test_wsola_preserves_pitch_scales_duration():
    """wsola_tempo (sox-tempo semantics, SURVEY.md:127): duration
    scales by 1/rate while the dominant frequency stays put — unlike
    the resample path, where pitch shifts with rate."""
    from tpuasr.audio.augment import speed_and_gain, wsola_tempo

    sr, f0 = 16000, 440.0
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    l_max = int(1.3 * sr)  # headroom: rate < 1 stretches the signal
    buf = np.zeros((2, l_max), np.float32)
    buf[:, :sr] = tone
    waves = jnp.asarray(buf)
    lengths = jnp.full((2,), sr, jnp.int32)

    for rate in (0.85, 1.15):
        rates = jnp.full((2,), rate, jnp.float32)
        out, nl = wsola_tempo(rates, waves, lengths)
        out, nl = np.asarray(out), np.asarray(nl)
        assert abs(nl[0] - sr / rate) <= max(1, 0.01 * sr), (rate, nl)
        # analyze the interior (skip the fade-in block)
        seg = out[0, 512 : nl[0] - 512]
        fd = _dominant_hz(seg)
        assert abs(fd - f0) < 15.0, (rate, fd)
        # padded region zeroed
        assert np.all(out[0, nl[0]:] == 0.0)

    # contrast: the resample path SHIFTS pitch with rate
    cfg = AugmentConfig(tempo_low=1.15, tempo_high=1.15,
                        gain_db_low=0.0, gain_db_high=0.0,
                        tempo_mode="resample")
    out_r, nl_r = speed_and_gain(jax.random.PRNGKey(0), waves, lengths, cfg)
    fd_r = _dominant_hz(np.asarray(out_r)[0, : int(nl_r[0])])
    assert abs(fd_r - f0 * 1.15) < 15.0, fd_r


def test_wsola_identity_at_rate_one():
    """rate=1.0: frames are taken exactly where they are re-laid, so
    overlap-add reconstructs the signal (Hann halves sum to 1)."""
    from tpuasr.audio.augment import wsola_tempo

    rng = np.random.RandomState(3)
    waves = jnp.asarray(rng.randn(2, 4096).astype(np.float32))
    lengths = jnp.full((2,), 4096, jnp.int32)
    out, nl = wsola_tempo(jnp.ones((2,), jnp.float32), waves, lengths)
    out = np.asarray(out)
    # interior matches exactly (first block is the documented fade-in)
    np.testing.assert_allclose(out[:, 512:4096], np.asarray(waves)[:, 512:4096],
                               rtol=1e-4, atol=1e-4)


def test_tempo_and_gain_dispatches_mode():
    from tpuasr.audio.augment import tempo_and_gain

    rng = np.random.RandomState(4)
    waves = jnp.asarray(rng.randn(4, 8192).astype(np.float32))
    lengths = jnp.full((4,), 8192, jnp.int32)
    for mode in ("wsola", "resample"):
        cfg = AugmentConfig(tempo_mode=mode)
        out, nl = tempo_and_gain(jax.random.PRNGKey(1), waves, lengths, cfg)
        assert out.shape == waves.shape
        assert np.asarray(nl).min() > 0
        assert np.isfinite(np.asarray(out)).all()
