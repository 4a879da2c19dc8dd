"""Pallas BiGRU kernel numerics vs the lax.scan oracle (interpreter
mode on CPU; the real-TPU timing lives in the bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpuasr.ops.gru as gru_mod
from tpuasr.ops.gru import bigru_pallas, bigru_reference


@pytest.fixture(autouse=True)
def interpret_mode():
    gru_mod.INTERPRET = True
    yield
    gru_mod.INTERPRET = False


def _inputs(rng, t=10, b=4, h=16, dtype=jnp.float32):
    xg = jnp.asarray(rng.randn(t, 2, b, 3 * h).astype(np.float32)) * 0.5
    w_h = jnp.asarray(rng.randn(2, h, 3 * h).astype(np.float32)) * 0.3
    b_h = jnp.asarray(rng.randn(2, 3 * h).astype(np.float32)) * 0.1
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
    ys_k = bigru_pallas(xg, w_h, b_h, mask, 4)
    ys_r = bigru_reference(xg, w_h, b_h, mask)
    np.testing.assert_allclose(np.asarray(ys_k), np.asarray(ys_r),
                               rtol=2e-5, atol=2e-5)


def test_forward_time_padding():
    """T not a multiple of the chunk size."""
    rng = np.random.RandomState(1)
    xg, w_h, b_h, mask = _inputs(rng, t=7)
    ys_k = bigru_pallas(xg, w_h, b_h, mask, 4)
    ys_r = bigru_reference(xg, w_h, b_h, mask)
    assert ys_k.shape == ys_r.shape
    np.testing.assert_allclose(np.asarray(ys_k), np.asarray(ys_r),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_reference():
    rng = np.random.RandomState(2)
    xg, w_h, b_h, mask = _inputs(rng, t=8, b=3, h=8)
    dy = jnp.asarray(rng.randn(8, 2, 3, 8).astype(np.float32))

    def loss_k(xg, w_h, b_h):
        return jnp.sum(bigru_pallas(xg, w_h, b_h, mask, 4) * dy)

    def loss_r(xg, w_h, b_h):
        return jnp.sum(bigru_reference(xg, w_h, b_h, mask) * dy)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(xg, w_h, b_h)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(xg, w_h, b_h)
    for a, b, name in zip(gk, gr, ["dxg", "dw_h", "db_h"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4,
            err_msg=name,
        )


def test_model_pallas_impl_matches_scan():
    """Full DS2 forward: rnn_impl='pallas' vs 'scan' on identical params."""
    from tpuasr.model.ds2 import DeepSpeech2, ModelConfig

    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(2, 40, 161).astype(np.float32))
    lengths = jnp.asarray(np.array([40, 25], np.int32))

    cfg_s = ModelConfig(n_classes=10, hidden_size=16, hidden_layers=2,
                        compute_dtype=jnp.float32, rnn_impl="scan")
    cfg_p = ModelConfig(n_classes=10, hidden_size=16, hidden_layers=2,
                        compute_dtype=jnp.float32, rnn_impl="pallas")
    m_s = DeepSpeech2(cfg_s)
    m_p = DeepSpeech2(cfg_p)
    variables = m_s.init(jax.random.PRNGKey(0), feats, lengths)
    lo_s, ol_s = m_s.apply(variables, feats, lengths)
    lo_p, ol_p = m_p.apply(variables, feats, lengths)
    np.testing.assert_array_equal(np.asarray(ol_s), np.asarray(ol_p))
    np.testing.assert_allclose(np.asarray(lo_s), np.asarray(lo_p),
                               rtol=2e-4, atol=2e-4)


def test_forward_large_batch():
    """Batch >> 8 (serving/training batches reach 128): the kernel's
    batch handling must not depend on small-B tiling assumptions."""
    rng = np.random.RandomState(7)
    t, b, h = 6, 96, 16
    xg = jnp.asarray(rng.randn(t, 2, b, 3 * h).astype(np.float32)) * 0.5
    w_h = jnp.asarray(rng.randn(2, h, 3 * h).astype(np.float32)) * 0.3
    b_h = jnp.asarray(rng.randn(2, 3 * h).astype(np.float32)) * 0.1
    lengths = rng.randint(1, t + 1, size=(b,)).astype(np.int32)
    m_fwd = (np.arange(t)[:, None] < lengths[None, :]).astype(np.float32)
    m_bwd = (np.arange(t)[:, None] >= (t - lengths)[None, :]).astype(np.float32)
    mask = jnp.asarray(np.stack([m_fwd, m_bwd], axis=1))
    ys_k = bigru_pallas(xg, w_h, b_h, mask, 4)
    ys_r = bigru_reference(xg, w_h, b_h, mask)
    np.testing.assert_allclose(np.asarray(ys_k), np.asarray(ys_r),
                               rtol=2e-5, atol=2e-5)


def test_unidirectional_model_pallas_matches_scan():
    """RecurrentCore (unidirectional, Lookahead models) runs the fused
    kernel with a singleton direction axis; logits match scan."""
    from tpuasr.model.ds2 import DeepSpeech2, ModelConfig

    rng = np.random.RandomState(9)
    feats = jnp.asarray(rng.randn(2, 40, 161).astype(np.float32))
    lengths = jnp.asarray(np.array([40, 23], np.int32))
    kw = dict(n_classes=10, hidden_size=16, hidden_layers=2,
              bidirectional=False, lookahead_context=4,
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
    """nd=1 (unidirectional): outputs AND cotangents nd=1 == scan."""
    rng = np.random.RandomState(12)
    t, b, h = 6, 3, 8
    xg = jnp.asarray(rng.randn(t, 1, b, 3 * h).astype(np.float32)) * 0.5
    w_h = jnp.asarray(rng.randn(1, h, 3 * h).astype(np.float32)) * 0.3
    b_h = jnp.asarray(rng.randn(1, 3 * h).astype(np.float32)) * 0.1
    mask = jnp.asarray(
        (np.arange(t)[:, None, None] <
         np.array([t, t - 2, 3])[None, None, :]).astype(np.float32)
    )
    ys = bigru_pallas(xg, w_h, b_h, mask, 2)
    assert ys.shape == (t, 1, b, h)
    np.testing.assert_allclose(
        np.asarray(ys), np.asarray(bigru_reference(xg, w_h, b_h, mask)),
        rtol=2e-5, atol=2e-5)
    dy = jnp.asarray(rng.randn(t, 1, b, h).astype(np.float32))
    gk = jax.grad(lambda *a: jnp.sum(bigru_pallas(*a, mask, 2) * dy),
                  argnums=(0, 1, 2))(xg, w_h, b_h)
    gr = jax.grad(lambda *a: jnp.sum(bigru_reference(*a, mask) * dy),
                  argnums=(0, 1, 2))(xg, w_h, b_h)
    for a, b_, name in zip(gk, gr, ["dxg", "dw_h", "db_h"]):
        assert a.shape == b_.shape, (name, a.shape, b_.shape)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=3e-4, atol=3e-4, err_msg=name)
