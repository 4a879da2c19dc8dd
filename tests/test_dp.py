"""Data-parallel correctness: a sharded train step over an 8-device CPU
mesh must produce the same updated params as the single-device step on
the same global batch (SURVEY.md §7: DP-vs-single-device grad equality,
the standard JAX multi-device simulation test)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuasr.audio.frontend import FrontendConfig
from tpuasr.model.ds2 import ModelConfig
from tpuasr.train.step import TrainConfig, init_train_state, make_train_step

MC = ModelConfig(n_classes=10, hidden_size=16, hidden_layers=1,
                 compute_dtype=jnp.float32)
FC = FrontendConfig()
TC = TrainConfig()


def _global_batch(rng, b=8, l=4000):
    return (
        rng.randn(b, l).astype(np.float32) * 0.1,
        np.full((b,), l, np.int32),
        rng.randint(1, 10, size=(b, 4)).astype(np.int32),
        np.full((b,), 4, np.int32),
        np.ones((b,), bool),
    )


def test_dp_matches_single_device():
    rng = np.random.RandomState(0)
    batch = _global_batch(rng)
    lr = jnp.float32(1e-3)
    key = jax.random.PRNGKey(7)

    # single device
    state1 = init_train_state(MC, TC, jax.random.PRNGKey(0))
    step1 = make_train_step(MC, FC, TC)
    s1, m1 = step1(state1, *(jnp.asarray(a) for a in batch), lr, key)

    # 8-device data-parallel mesh
    devs = jax.devices("cpu")
    assert len(devs) >= 8, "conftest must force 8 cpu devices"
    mesh = Mesh(np.asarray(devs[:8]), ("data",))
    data_s = NamedSharding(mesh, P("data"))
    repl_s = NamedSharding(mesh, P())

    state8 = init_train_state(MC, TC, jax.random.PRNGKey(0))
    state8 = jax.tree.map(lambda x: jax.device_put(x, repl_s), state8)
    step8 = make_train_step(MC, FC, TC)
    sharded = tuple(jax.device_put(a, data_s) for a in batch)
    s8, m8 = step8(state8, *sharded, lr, key)

    assert abs(float(m1["loss"]) - float(m8["loss"])) < 1e-5
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        jax.device_get(s1.params), jax.device_get(s8.params),
    )
    assert max(jax.tree.leaves(diffs)) < 1e-5


def test_dryrun_multichip_fresh_process():
    """The driver runs dryrun_multichip in a bare interpreter with NO
    conftest — the entry module alone must bootstrap the CPU mesh
    without initializing the default (axon TPU) backend, which crashed
    round 1 on a libtpu version mismatch (MULTICHIP_r01 ok=false).
    Exercise that exact path: fresh subprocess, no pytest, no conftest.
    """
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    # Keep the axon site dir (required for jax import here) AND the repo.
    parts = ["/root/repo"] + [p for p in env.get("PYTHONPATH", "").split(":") if p]
    env["PYTHONPATH"] = ":".join(dict.fromkeys(parts))
    code = (
        "import __graft_entry__ as ge; ge.dryrun_multichip(8); print('DRYRUN_OK')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=2100, env=env,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed in fresh process:\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    )
    assert "DRYRUN_OK" in proc.stdout
