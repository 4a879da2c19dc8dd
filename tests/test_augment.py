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
