"""Pallas BiLSTM kernel numerics vs the lax.scan oracle (interpreter
mode on CPU; mirrors tests/test_pallas_gru.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpuasr.ops.lstm as lstm_mod
from tpuasr.ops.lstm import bilstm_pallas, bilstm_reference


@pytest.fixture(autouse=True)
def interpret_mode():
    lstm_mod.INTERPRET = True
    yield
    lstm_mod.INTERPRET = False


def _inputs(rng, t=10, b=4, h=16, dtype=jnp.float32):
    xg = jnp.asarray(rng.randn(t, 2, b, 4 * h).astype(np.float32)) * 0.5
    w_h = jnp.asarray(rng.randn(2, h, 4 * h).astype(np.float32)) * 0.3
    b_h = jnp.asarray(rng.randn(2, 4 * h).astype(np.float32)) * 0.1
    lengths = np.array([t, t - 3, 2, t - 1][:b], np.int32)
    m_fwd = (np.arange(t)[:, None] < lengths[None, :]).astype(np.float32)
    m_bwd = (np.arange(t)[:, None] >= (t - lengths)[None, :]).astype(
        np.float32
    )
    mask = jnp.asarray(np.stack([m_fwd, m_bwd], axis=1))  # (T, 2, B)
    return xg.astype(dtype), w_h.astype(dtype), b_h, mask


def test_forward_matches_reference():
    rng = np.random.RandomState(0)
    xg, w_h, b_h, mask = _inputs(rng)
    ys_k = bilstm_pallas(xg, w_h, b_h, mask, 4)
    ys_r = bilstm_reference(xg, w_h, b_h, mask)
    np.testing.assert_allclose(np.asarray(ys_k), np.asarray(ys_r),
                               rtol=2e-5, atol=2e-5)


def test_forward_time_padding():
    """T not a multiple of the chunk size."""
    rng = np.random.RandomState(1)
    xg, w_h, b_h, mask = _inputs(rng, t=7)
    ys_k = bilstm_pallas(xg, w_h, b_h, mask, 4)
    ys_r = bilstm_reference(xg, w_h, b_h, mask)
    assert ys_k.shape == ys_r.shape
    np.testing.assert_allclose(np.asarray(ys_k), np.asarray(ys_r),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_reference():
    rng = np.random.RandomState(2)
    xg, w_h, b_h, mask = _inputs(rng, t=8, b=3, h=8)
    dy = jnp.asarray(rng.randn(8, 2, 3, 8).astype(np.float32))

    def loss_k(xg, w_h, b_h):
        return jnp.sum(bilstm_pallas(xg, w_h, b_h, mask, 4) * dy)

    def loss_r(xg, w_h, b_h):
        return jnp.sum(bilstm_reference(xg, w_h, b_h, mask) * dy)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(xg, w_h, b_h)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(xg, w_h, b_h)
    for a, b, name in zip(gk, gr, ["dxg", "dw_h", "db_h"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4,
            err_msg=name,
        )


def test_model_pallas_lstm_matches_scan():
    """Full DS2 forward with rnn_type='lstm': pallas == scan."""
    from tpuasr.model.ds2 import DeepSpeech2, ModelConfig

    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(2, 40, 161).astype(np.float32))
    lengths = jnp.asarray(np.array([40, 25], np.int32))

    cfg_s = ModelConfig(n_classes=10, hidden_size=16, hidden_layers=2,
                        rnn_type="lstm", compute_dtype=jnp.float32,
                        rnn_impl="scan")
    cfg_p = ModelConfig(n_classes=10, hidden_size=16, hidden_layers=2,
                        rnn_type="lstm", compute_dtype=jnp.float32,
                        rnn_impl="pallas")
    m_s = DeepSpeech2(cfg_s)
    m_p = DeepSpeech2(cfg_p)
    variables = m_s.init(jax.random.PRNGKey(0), feats, lengths)
    lo_s, ol_s = m_s.apply(variables, feats, lengths)
    lo_p, ol_p = m_p.apply(variables, feats, lengths)
    np.testing.assert_array_equal(np.asarray(ol_s), np.asarray(ol_p))
    np.testing.assert_allclose(np.asarray(lo_s), np.asarray(lo_p),
                               rtol=2e-4, atol=2e-4)


def test_train_step_with_pallas_lstm_learns():
    """Gradient flows end to end: loss decreases over a few steps."""
    from tpuasr.audio.frontend import FrontendConfig
    from tpuasr.model.ds2 import ModelConfig
    from tpuasr.train.step import (TrainConfig, init_train_state,
                                   make_train_step)

    mc = ModelConfig(n_classes=8, hidden_size=8, hidden_layers=1,
                     rnn_type="lstm", compute_dtype=jnp.float32,
                     rnn_impl="pallas")
    tc = TrainConfig(lr=3e-3)
    state = init_train_state(mc, tc, jax.random.PRNGKey(0))
    step = make_train_step(mc, FrontendConfig(), tc)
    rng = np.random.RandomState(0)
    waves = jnp.asarray(rng.randn(2, 3200).astype(np.float32) * 0.1)
    wl = jnp.asarray(np.full((2,), 3200, np.int32))
    labels = jnp.asarray(rng.randint(1, 8, size=(2, 4)).astype(np.int32))
    ll = jnp.asarray(np.full((2,), 4, np.int32))
    valid = jnp.ones((2,), bool)
    losses = []
    for i in range(8):
        state, m = step(state, waves, wl, labels, ll, valid,
                        jnp.float32(3e-3), jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_unidirectional_lstm_pallas_matches_scan():
    from tpuasr.model.ds2 import DeepSpeech2, ModelConfig

    rng = np.random.RandomState(10)
    feats = jnp.asarray(rng.randn(2, 30, 161).astype(np.float32))
    lengths = jnp.asarray(np.array([30, 17], np.int32))
    kw = dict(n_classes=10, hidden_size=16, hidden_layers=1,
              rnn_type="lstm", bidirectional=False, lookahead_context=4,
              compute_dtype=jnp.float32)
    m_s = DeepSpeech2(ModelConfig(rnn_impl="scan", **kw))
    m_p = DeepSpeech2(ModelConfig(rnn_impl="pallas", **kw))
    variables = m_s.init(jax.random.PRNGKey(0), feats, lengths)
    lo_s, ol_s = m_s.apply(variables, feats, lengths)
    lo_p, ol_p = m_p.apply(variables, feats, lengths)
    np.testing.assert_array_equal(np.asarray(ol_s), np.asarray(ol_p))
    np.testing.assert_allclose(np.asarray(lo_s), np.asarray(lo_p),
                               rtol=2e-4, atol=2e-4)


def test_singleton_direction_shapes_and_grads():
    """nd=1 (unidirectional): outputs AND cotangents must be nd=1 and
    match the scan oracle — the kernels were once 2-dir-hardcoded and
    silently fabricated a phantom direction from block padding."""
    rng = np.random.RandomState(11)
    t, b, h = 6, 3, 8
    xg = jnp.asarray(rng.randn(t, 1, b, 4 * h).astype(np.float32)) * 0.5
    w_h = jnp.asarray(rng.randn(1, h, 4 * h).astype(np.float32)) * 0.3
    b_h = jnp.asarray(rng.randn(1, 4 * h).astype(np.float32)) * 0.1
    mask = jnp.asarray(
        (np.arange(t)[:, None, None] <
         np.array([t, t - 2, 3])[None, None, :]).astype(np.float32)
    )  # (T, 1, B)
    ys = bilstm_pallas(xg, w_h, b_h, mask, 2)
    assert ys.shape == (t, 1, b, h)
    ys_r = bilstm_reference(xg, w_h, b_h, mask)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_r),
                               rtol=2e-5, atol=2e-5)
    dy = jnp.asarray(rng.randn(t, 1, b, h).astype(np.float32))
    gk = jax.grad(lambda *a: jnp.sum(bilstm_pallas(*a, mask, 2) * dy),
                  argnums=(0, 1, 2))(xg, w_h, b_h)
    gr = jax.grad(lambda *a: jnp.sum(bilstm_reference(*a, mask) * dy),
                  argnums=(0, 1, 2))(xg, w_h, b_h)
    for a, b_, name in zip(gk, gr, ["dxg", "dw_h", "db_h"]):
        assert a.shape == b_.shape, (name, a.shape, b_.shape)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=3e-4, atol=3e-4, err_msg=name)
