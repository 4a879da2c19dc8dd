"""Device mesh + sharding helpers.

Reference parity: the entire L3 distributed layer (ref:multiproc.py +
DistributedDataParallel + NCCL/Gloo allreduce, SURVEY.md §3.3) reduces
on TPU to a 1-axis ``data`` mesh: batches are sharded over the axis,
parameters are replicated, and XLA inserts the gradient psum over ICI
(no hand-written comm layer — SURVEY.md §5.8). Multi-host runs call
``jax.distributed.initialize()`` first (``distributed_init``) and feed
per-host manifest shards (BucketingPlan.sharded_batches).

Beyond reference parity (TPU-native scaling): ``make_mesh(tp=N)``
builds a 2D (data, model) mesh for combined data + TENSOR parallelism.
The RNN gate matrices — >95% of the parameters (input_kernel /
recurrent_kernel, (dirs, I, G*H)) — shard their gate axis over
``model``; everything else (convs, BN, head) replicates. Activations
stay batch-sharded; GSPMD inserts the collectives (the
scaling-book recipe: annotate shardings, let XLA partition). Gradient
math is unchanged, so dp x tp trajectories equal single-device runs
bit-for-bit up to reduction order (tests/test_tp.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# param leaves whose LAST axis (the G*H gate axis) shards over `model`
_TP_SHARDED_LEAVES = frozenset(
    {"input_kernel", "input_bias", "recurrent_kernel", "recurrent_bias"}
)


def make_mesh(devices=None, tp: int = 1) -> Mesh:
    """1-axis ``data`` mesh, or a 2D (data, model) mesh when tp > 1."""
    devices = list(devices if devices is not None else jax.devices())
    if tp <= 1:
        return Mesh(np.asarray(devices), (DATA_AXIS,))
    if len(devices) % tp:
        raise ValueError(f"{len(devices)} devices not divisible by tp={tp}")
    grid = np.asarray(devices).reshape(len(devices) // tp, tp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _leaf_key(path) -> str:
    last = path[-1]
    return getattr(last, "key", getattr(last, "name", str(last)))


def param_sharding_specs(mesh: Mesh, tree, direction_tp: bool = False):
    """PartitionSpec pytree for a params-shaped tree: RNN gate matrices
    shard their last axis over ``model`` (when present and divisible),
    everything else replicates. Works on any tree embedding the param
    names in its paths (raw params AND optax momentum states).

    ``direction_tp`` (tp=2 + bidirectional + fused Pallas kernels):
    shard the leading DIRECTION axis (size 2) of the BiRecurrentCore
    leaves instead of the gate axis — each model shard owns one scan
    direction whole, so the recurrence needs ZERO per-step collectives
    (the gate-axis layout all-gathers hidden state every time step).
    The Pallas kernels run unchanged per shard via shard_map
    (model/ds2.py BiRecurrentCore)."""
    tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get(MODEL_AXIS, 1)

    def spec(path, leaf):
        if (
            tp > 1
            and hasattr(leaf, "ndim")
            and leaf.ndim >= 1
            and _leaf_key(path) in _TP_SHARDED_LEAVES
        ):
            if direction_tp:
                if leaf.ndim >= 2 and leaf.shape[0] == tp == 2:
                    return P(MODEL_AXIS)
                return P()
            if leaf.shape[-1] % tp == 0:
                return P(*([None] * (leaf.ndim - 1)), MODEL_AXIS)
        return P()

    return jax.tree_util.tree_map_with_path(spec, tree)


def shard_params(mesh: Mesh, tree, direction_tp: bool = False):
    """device_put a params-shaped tree under the TP sharding rules
    (falls back to full replication on a 1-axis mesh)."""
    specs = param_sharding_specs(mesh, tree, direction_tp=direction_tp)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch pytree with the batch dim sharded."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)


def distributed_init(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host rendezvous (replaces the reference's
    ``torch.distributed.init_process_group(dist_url, ...)``). On TPU
    pods the runtime supplies everything; arguments are only needed
    off-TPU."""
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
