"""Pallas CTC kernel numerics vs the scan implementation and optax
(interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import tpuasr.ops.ctc as ctc_ops
from tpuasr.ctc.loss import ctc_loss, ctc_loss_pallas


@pytest.fixture(autouse=True)
def interpret_mode():
    ctc_ops.INTERPRET = True
    old_tc = ctc_ops.TIME_CHUNK
    ctc_ops.TIME_CHUNK = 4  # exercise chunk boundaries on tiny T
    yield
    ctc_ops.INTERPRET = False
    ctc_ops.TIME_CHUNK = old_tc


def _case(rng, b=3, t=11, c=6, l=4):
    logits = jnp.asarray(rng.randn(b, t, c).astype(np.float32))
    logit_lengths = jnp.asarray(np.array([t, t - 3, 5][:b], np.int32))
    labels = jnp.asarray(rng.randint(1, c, size=(b, l)).astype(np.int32))
    label_lengths = jnp.asarray(np.array([l, 2, 0][:b], np.int32))
    return logits, logit_lengths, labels, label_lengths


def test_loss_matches_scan():
    rng = np.random.RandomState(0)
    args = _case(rng)
    got = ctc_loss_pallas(*args)
    want = ctc_loss(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_grads_match_optax():
    rng = np.random.RandomState(1)
    logits, logit_lengths, labels, label_lengths = _case(rng)

    g_pallas = jax.grad(
        lambda lg: jnp.sum(
            ctc_loss_pallas(lg, logit_lengths, labels, label_lengths)
        )
    )(logits)

    t, l = logits.shape[1], labels.shape[1]
    logit_pad = (
        np.arange(t)[None, :] >= np.asarray(logit_lengths)[:, None]
    ).astype(np.float32)
    label_pad = (
        np.arange(l)[None, :] >= np.asarray(label_lengths)[:, None]
    ).astype(np.float32)
    g_optax = jax.grad(
        lambda lg: jnp.sum(
            optax.ctc_loss(lg, jnp.asarray(logit_pad), labels,
                           jnp.asarray(label_pad))
        )
    )(logits)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_optax),
                               rtol=2e-4, atol=2e-4)


def test_weighted_cotangent():
    """Per-utterance cotangent weighting (the mean/mask in train_step)."""
    rng = np.random.RandomState(2)
    logits, logit_lengths, labels, label_lengths = _case(rng)
    w = jnp.asarray(np.array([0.5, 0.0, 2.0], np.float32))

    g_pallas = jax.grad(
        lambda lg: jnp.sum(
            w * ctc_loss_pallas(lg, logit_lengths, labels, label_lengths)
        )
    )(logits)
    g_scan = jax.grad(
        lambda lg: jnp.sum(
            w * ctc_loss(lg, logit_lengths, labels, label_lengths)
        )
    )(logits)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_scan),
                               rtol=2e-4, atol=2e-4)
