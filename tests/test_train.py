"""Train step / checkpoint / resume tests (SURVEY.md §7)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.audio.frontend import FrontendConfig
from tpuasr.labels import Alphabet
from tpuasr.model.ds2 import ModelConfig
from tpuasr.train.checkpoint import (
    CheckpointPackage,
    load_checkpoint,
    restore_opt_state,
    save_checkpoint,
)
from tpuasr.train.step import (
    TrainConfig,
    init_train_state,
    make_eval_step,
    make_train_step,
)

MC = ModelConfig(n_classes=10, hidden_size=16, hidden_layers=1,
                 compute_dtype=jnp.float32)
FC = FrontendConfig()
TC = TrainConfig(lr=1e-3)


def _batch(rng, b=2, l=8000):
    waves = jnp.asarray(rng.randn(b, l).astype(np.float32) * 0.1)
    wl = jnp.asarray(np.full((b,), l, np.int32))
    lab = jnp.asarray(rng.randint(1, 10, size=(b, 4)).astype(np.int32))
    ll = jnp.asarray(np.full((b,), 4, np.int32))
    valid = jnp.ones((b,), bool)
    return waves, wl, lab, ll, valid


def test_loss_decreases():
    rng = np.random.RandomState(0)
    state = init_train_state(MC, TC, jax.random.PRNGKey(0))
    step = make_train_step(MC, FC, TC)
    batch = _batch(rng)
    losses = []
    for i in range(8):
        state, m = step(state, *batch, jnp.float32(3e-3), jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_invalid_slot_does_not_affect_valid_logits():
    """Regression: batch-padding duplicates (valid=False) must not leak
    into BatchNorm statistics (found in round-1 e2e verification)."""
    rng = np.random.RandomState(1)
    state = init_train_state(MC, TC, jax.random.PRNGKey(0))
    step = make_train_step(MC, FC, TC)
    waves, wl, lab, ll, _ = _batch(rng, b=3)

    # run with third slot invalid vs third slot absent-but-different data
    waves_a = waves
    waves_b = waves.at[2].set(jnp.asarray(rng.randn(8000).astype(np.float32)))
    valid = jnp.asarray(np.array([True, True, False]))
    s_a, m_a = step(state, waves_a, wl, lab, ll, valid,
                    jnp.float32(1e-3), jax.random.PRNGKey(5))
    state2 = init_train_state(MC, TC, jax.random.PRNGKey(0))
    s_b, m_b = step(state2, waves_b, wl, lab, ll, valid,
                    jnp.float32(1e-3), jax.random.PRNGKey(5))
    # identical loss and identical updated params regardless of the
    # content of the invalid slot
    assert abs(float(m_a["loss"]) - float(m_b["loss"])) < 1e-6
    da = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        s_a.params, s_b.params,
    )
    assert max(jax.tree.leaves(da)) < 1e-6


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    state = init_train_state(MC, TC, jax.random.PRNGKey(0))
    step = make_train_step(MC, FC, TC)
    batch = _batch(rng)
    for i in range(2):
        state, _ = step(state, *batch, jnp.float32(1e-3), jax.random.PRNGKey(i))

    pkg = CheckpointPackage(
        MC, FC, Alphabet().labels,
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)},
        opt_state=jax.device_get(state.opt_state),
        epoch=3, iteration=17, loss_history=[2.0, 1.0],
    )
    path = str(tmp_path / "m.ckpt")
    save_checkpoint(path, pkg)
    pkg2 = load_checkpoint(path)
    assert pkg2.epoch == 3 and pkg2.iteration == 17
    assert pkg2.model_config == MC
    assert pkg2.frontend_config == FC
    assert pkg2.loss_history == [2.0, 1.0]

    fresh = init_train_state(MC, TC, jax.random.PRNGKey(1))
    restored = restore_opt_state(fresh.params, pkg2.variables["params"])
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        jax.device_get(state.params), restored,
    )
    assert max(jax.tree.leaves(diffs)) == 0.0
    # optimizer state (momentum trace) round-trips too
    ro = restore_opt_state(fresh.opt_state, pkg2.opt_state)
    d2 = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        jax.device_get(state.opt_state), ro,
    )
    assert max(jax.tree.leaves(d2)) == 0.0


def test_eval_step_shapes():
    state = init_train_state(MC, TC, jax.random.PRNGKey(0))
    ev = make_eval_step(MC, FC)
    rng = np.random.RandomState(3)
    waves = jnp.asarray(rng.randn(2, 8000).astype(np.float32) * 0.1)
    wl = jnp.asarray(np.array([8000, 4000], np.int32))
    logits, ol = ev({"params": state.params, "batch_stats": state.batch_stats},
                    waves, wl)
    assert logits.shape[0] == 2 and logits.shape[2] == 10
    assert int(ol[1]) < int(ol[0])


def test_lr_anneal():
    tc = TrainConfig(lr=3e-4, learning_anneal=1.1)
    assert abs(tc.lr_at_epoch(0) - 3e-4) < 1e-12
    assert abs(tc.lr_at_epoch(2) - 3e-4 / 1.21) < 1e-9
