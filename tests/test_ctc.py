"""CTC loss vs optax oracle + brute-force alignment enumeration
(SURVEY.md §7 test strategy)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpuasr.ctc.loss import ctc_loss, ctc_loss_mean


def brute_force_ctc(logprobs: np.ndarray, labels: list[int], blank: int = 0):
    """-log sum over all alignments collapsing to `labels` (tiny T only)."""
    t, c = logprobs.shape
    total = -np.inf
    for path in itertools.product(range(c), repeat=t):
        # collapse: remove repeats then blanks
        collapsed = []
        prev = None
        for s in path:
            if s != prev:
                collapsed.append(s)
            prev = s
        collapsed = [s for s in collapsed if s != blank]
        if collapsed == list(labels):
            lp = sum(logprobs[i, s] for i, s in enumerate(path))
            total = np.logaddexp(total, lp)
    return -total


def test_vs_brute_force():
    rng = np.random.RandomState(0)
    t, c = 4, 3
    logits = rng.randn(1, t, c).astype(np.float32)
    logprobs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits[0])))
    for labels in ([1], [1, 2], [1, 1], [2, 1, 2]):
        want = brute_force_ctc(logprobs, labels)
        lab = np.zeros((1, 3), np.int32)
        lab[0, : len(labels)] = labels
        got = ctc_loss(
            jnp.asarray(logits),
            jnp.array([t], jnp.int32),
            jnp.asarray(lab),
            jnp.array([len(labels)], jnp.int32),
        )
        np.testing.assert_allclose(float(got[0]), want, rtol=1e-5, atol=1e-5)


def test_vs_optax_batch():
    rng = np.random.RandomState(1)
    b, t, c, l = 4, 20, 8, 6
    logits = rng.randn(b, t, c).astype(np.float32)
    logit_lengths = np.array([20, 17, 11, 20], np.int32)
    labels = rng.randint(1, c, size=(b, l)).astype(np.int32)
    label_lengths = np.array([6, 4, 2, 1], np.int32)

    got = ctc_loss(
        jnp.asarray(logits),
        jnp.asarray(logit_lengths),
        jnp.asarray(labels),
        jnp.asarray(label_lengths),
    )

    # optax.ctc_loss(logits, logit_paddings, labels, label_paddings)
    logit_pad = (np.arange(t)[None, :] >= logit_lengths[:, None]).astype(np.float32)
    label_pad = (np.arange(l)[None, :] >= label_lengths[:, None]).astype(np.float32)
    want = optax.ctc_loss(
        jnp.asarray(logits),
        jnp.asarray(logit_pad),
        jnp.asarray(labels),
        jnp.asarray(label_pad),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_gradients_vs_optax():
    rng = np.random.RandomState(2)
    b, t, c, l = 2, 12, 6, 4
    logits = rng.randn(b, t, c).astype(np.float32)
    logit_lengths = np.array([12, 9], np.int32)
    labels = rng.randint(1, c, size=(b, l)).astype(np.int32)
    label_lengths = np.array([4, 3], np.int32)
    logit_pad = (np.arange(t)[None, :] >= logit_lengths[:, None]).astype(np.float32)
    label_pad = (np.arange(l)[None, :] >= label_lengths[:, None]).astype(np.float32)

    g_ours = jax.grad(
        lambda lg: jnp.sum(
            ctc_loss(lg, jnp.asarray(logit_lengths), jnp.asarray(labels),
                     jnp.asarray(label_lengths))
        )
    )(jnp.asarray(logits))
    g_optax = jax.grad(
        lambda lg: jnp.sum(
            optax.ctc_loss(lg, jnp.asarray(logit_pad), jnp.asarray(labels),
                           jnp.asarray(label_pad))
        )
    )(jnp.asarray(logits))
    np.testing.assert_allclose(
        np.asarray(g_ours), np.asarray(g_optax), rtol=1e-3, atol=1e-4
    )


def test_empty_label():
    logits = jnp.zeros((1, 5, 3), jnp.float32)
    loss = ctc_loss(
        logits, jnp.array([5], jnp.int32),
        jnp.zeros((1, 2), jnp.int32), jnp.array([0], jnp.int32),
    )
    # all-blank path: loss = -5 * log(1/3)
    np.testing.assert_allclose(float(loss[0]), 5 * np.log(3.0), rtol=1e-5)


def test_infeasible_masked_in_mean():
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(2, 3, 5).astype(np.float32))
    labels = jnp.asarray(np.array([[1, 2, 3, 4], [1, 0, 0, 0]], np.int32))
    # first utterance: 4 labels in 3 frames -> infeasible
    loss, ok = ctc_loss_mean(
        logits, jnp.array([3, 3], jnp.int32), labels,
        jnp.array([4, 1], jnp.int32),
    )
    assert bool(ok[0]) is False and bool(ok[1]) is True
    assert np.isfinite(float(loss))
