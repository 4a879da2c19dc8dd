"""Device mesh + sharding helpers.

Reference parity: the entire L3 distributed layer (ref:multiproc.py +
DistributedDataParallel + NCCL/Gloo allreduce, SURVEY.md §3.3) reduces
on TPU to a 1-axis ``data`` mesh: batches are sharded over the axis,
parameters are replicated, and XLA inserts the gradient psum over ICI
(no hand-written comm layer — SURVEY.md §5.8). Multi-host runs call
``jax.distributed.initialize()`` first (``distributed_init``) and feed
per-host manifest shards (BucketingPlan.sharded_batches).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


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
