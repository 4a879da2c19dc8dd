"""Gate-major Pallas BiGRU (v2) numerics vs the scan model path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpuasr.ops.gru2 as gru2_mod
from tpuasr.model.ds2 import DeepSpeech2, ModelConfig


@pytest.fixture(autouse=True)
def interpret_mode():
    gru2_mod.INTERPRET = True
    yield
    gru2_mod.INTERPRET = False


def _cfg(impl):
    return ModelConfig(n_classes=10, hidden_size=16, hidden_layers=2,
                       compute_dtype=jnp.float32, rnn_impl=impl)


def test_model_pallas2_matches_scan():
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 40, 161).astype(np.float32))
    lengths = jnp.asarray(np.array([40, 23], np.int32))
    m_s = DeepSpeech2(_cfg("scan"))
    m_p = DeepSpeech2(_cfg("pallas2"))
    variables = m_s.init(jax.random.PRNGKey(0), feats, lengths)
    lo_s, ol_s = m_s.apply(variables, feats, lengths)
    lo_p, ol_p = m_p.apply(variables, feats, lengths)
    np.testing.assert_array_equal(np.asarray(ol_s), np.asarray(ol_p))
    np.testing.assert_allclose(np.asarray(lo_s), np.asarray(lo_p),
                               rtol=2e-4, atol=2e-4)


def test_model_pallas2_grads_match_scan():
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(2, 24, 161).astype(np.float32))
    lengths = jnp.asarray(np.array([24, 17], np.int32))
    m_s = DeepSpeech2(_cfg("scan"))
    m_p = DeepSpeech2(_cfg("pallas2"))
    variables = m_s.init(jax.random.PRNGKey(0), feats, lengths)

    def loss(model):
        def f(params):
            (lo, _), _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                feats, lengths, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(lo * lo)
        return f

    g_s = jax.grad(loss(m_s))(variables["params"])
    g_p = jax.grad(loss(m_p))(variables["params"])
    flat_s, _ = jax.tree_util.tree_flatten_with_path(g_s)
    flat_p = jax.tree.leaves(g_p)
    for (path, a), b in zip(flat_s, flat_p):
        scale = max(1.0, float(np.abs(np.asarray(a)).max()))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale,
            rtol=5e-4, atol=5e-4, err_msg=str(path),
        )
