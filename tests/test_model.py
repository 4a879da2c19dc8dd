"""Model shape/masking/length-propagation tests (SURVEY.md §7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.model.ds2 import (
    CONV_SPECS,
    DeepSpeech2,
    ModelConfig,
    conv_out_features,
    conv_out_lengths,
    count_params,
    _reverse_prefix,
)

TINY = ModelConfig(
    n_classes=10,
    n_features=161,
    hidden_size=32,
    hidden_layers=2,
    compute_dtype=jnp.float32,
)


def test_conv_out_lengths_formula():
    # brute-force check of the floor formula per layer
    for t in [1, 5, 16, 100, 101, 333]:
        out = t
        for (kt, _, st, _, pt, _) in CONV_SPECS:
            out = (out + 2 * pt - kt) // st + 1
        assert conv_out_lengths(t) == out
    # reference shape: time halves (approximately) through stride 2 then 1
    assert conv_out_lengths(100) == 50


def test_conv_out_features():
    # 161 mel-less spectrogram bins -> 81 -> 41; x32 channels = 1312
    assert conv_out_features(161, 32) == 41 * 32


def test_reverse_prefix_involution():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 7, 2).astype(np.float32))
    lengths = jnp.array([7, 4, 1], jnp.int32)
    y = _reverse_prefix(x, lengths)
    # valid prefix reversed
    np.testing.assert_array_equal(
        np.asarray(y)[1, :4], np.asarray(x)[1, 3::-1]
    )
    # padding untouched
    np.testing.assert_array_equal(np.asarray(y)[1, 4:], np.asarray(x)[1, 4:])
    # involution
    np.testing.assert_array_equal(
        np.asarray(_reverse_prefix(y, lengths)), np.asarray(x)
    )


@pytest.mark.parametrize("rnn_type", ["gru", "lstm", "rnn"])
def test_forward_shapes(rnn_type):
    cfg = ModelConfig(
        n_classes=10, hidden_size=16, hidden_layers=1,
        rnn_type=rnn_type, compute_dtype=jnp.float32,
    )
    model = DeepSpeech2(cfg)
    feats = jnp.zeros((2, 40, 161), jnp.float32)
    lengths = jnp.array([40, 23], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), feats, lengths)
    logits, out_lengths = model.apply(variables, feats, lengths)
    t_out = conv_out_lengths(40)
    assert logits.shape == (2, t_out, 10)
    assert int(out_lengths[0]) == t_out
    assert int(out_lengths[1]) == conv_out_lengths(23)


def test_padding_invariance():
    """Logits for a short utterance must not depend on batch padding:
    the core masking guarantee (conv mask, BN mask, RNN carry mask)."""
    rng = np.random.RandomState(1)
    model = DeepSpeech2(TINY)
    t_long, t_short = 60, 33
    short = rng.randn(t_short, 161).astype(np.float32)

    feats_a = np.zeros((2, t_long, 161), np.float32)
    feats_a[0, :t_short] = short
    feats_a[1] = rng.randn(t_long, 161)
    lengths_a = np.array([t_short, t_long], np.int32)

    feats_b = np.zeros((1, t_long, 161), np.float32)
    feats_b[0, :t_short] = short
    lengths_b = np.array([t_short], np.int32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats_a),
                           jnp.asarray(lengths_a))
    la, out_a = model.apply(variables, jnp.asarray(feats_a), jnp.asarray(lengths_a))
    lb, out_b = model.apply(variables, jnp.asarray(feats_b), jnp.asarray(lengths_b))
    t_valid = int(out_b[0])
    np.testing.assert_allclose(
        np.asarray(la)[0, :t_valid], np.asarray(lb)[0, :t_valid],
        rtol=2e-4, atol=2e-4,
    )
    # padded logits exactly zero
    assert np.all(np.asarray(la)[0, t_valid:] == 0.0)


def test_unidirectional_with_lookahead():
    cfg = ModelConfig(
        n_classes=10, hidden_size=16, hidden_layers=1,
        bidirectional=False, lookahead_context=5, compute_dtype=jnp.float32,
    )
    model = DeepSpeech2(cfg)
    feats = jnp.zeros((1, 40, 161), jnp.float32)
    lengths = jnp.array([40], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), feats, lengths)
    logits, _ = model.apply(variables, feats, lengths)
    assert logits.shape[-1] == 10


def test_train_mode_updates_batch_stats():
    model = DeepSpeech2(TINY)
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(2, 40, 161).astype(np.float32))
    lengths = jnp.array([40, 30], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), feats, lengths)
    (logits, _), updates = model.apply(
        variables, feats, lengths, train=True, mutable=["batch_stats"]
    )
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(updates["batch_stats"])
    assert any(
        not np.allclose(np.asarray(o), np.asarray(n)) for o, n in zip(old, new)
    )


def test_param_count_ds2_full():
    """Flagship DS2 (2 conv + 5 BiGRU-800) lands in the reference's
    ~40-100M parameter ballpark."""
    cfg = ModelConfig(n_classes=44)
    model = DeepSpeech2(cfg)
    variables = model.init_variables(jax.random.PRNGKey(0), t_max=8, batch=1)
    n = count_params(variables["params"])
    assert 30e6 < n < 120e6
