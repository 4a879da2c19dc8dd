"""Self-describing single-file checkpoints.

Reference parity: ``DeepSpeech.serialize()`` / ``load_model_package()``
(ref:model.py) — one ``.pth`` holding model hyperparams, the labels,
audio_conf, weights, optimizer state, epoch/iteration and the
loss/WER/CER history arrays, so ``transcribe.py`` needs no side config
and ``--continue-from`` resumes exactly (SURVEY.md §5.4).

Format (``.tpuasr`` file): 8-byte magic ``TPUASR01`` + u64 LE header
length + UTF-8 JSON header + flax msgpack payload. The header carries
everything needed to rebuild the model (ModelConfig, FrontendConfig,
labels, training progress, histories); the payload carries the
params / batch_stats / optimizer-state pytree.
"""

from __future__ import annotations

import json
import os
import struct
from dataclasses import dataclass, field
from typing import Any

import jax
import numpy as np
from flax import serialization

from tpuasr.audio.frontend import FrontendConfig
from tpuasr.labels import Alphabet
from tpuasr.model.ds2 import ModelConfig

MAGIC = b"TPUASR01"


@dataclass
class CheckpointPackage:
    model_config: ModelConfig
    frontend_config: FrontendConfig
    labels: str
    variables: Any  # {"params": ..., "batch_stats": ...}
    opt_state: Any = None
    epoch: int = 0
    iteration: int = 0
    # Batches already consumed in epoch ``epoch`` (0 = epoch boundary).
    # Set by --checkpoint-per-batch and preemption saves; resume skips
    # this many batches of the epoch schedule, reproducing the
    # continuous run exactly (ref:train.py --continue-from semantics,
    # SURVEY.md §5.4).
    epoch_batch: int = 0
    loss_history: list = field(default_factory=list)
    wer_history: list = field(default_factory=list)
    cer_history: list = field(default_factory=list)
    best_wer: float = float("inf")

    @property
    def alphabet(self) -> Alphabet:
        return Alphabet(labels=self.labels)


def _to_plain(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, pkg: CheckpointPackage) -> None:
    header = {
        "version": 1,
        "model_config": pkg.model_config.to_dict(),
        "frontend_config": pkg.frontend_config.to_dict(),
        "labels": pkg.labels,
        "epoch": pkg.epoch,
        "iteration": pkg.iteration,
        "epoch_batch": pkg.epoch_batch,
        "loss_history": list(map(float, pkg.loss_history)),
        "wer_history": list(map(float, pkg.wer_history)),
        "cer_history": list(map(float, pkg.cer_history)),
        "best_wer": float(pkg.best_wer),
        "has_opt_state": pkg.opt_state is not None,
    }
    payload = {"variables": serialization.to_state_dict(_to_plain(pkg.variables))}
    if pkg.opt_state is not None:
        payload["opt_state"] = serialization.to_state_dict(_to_plain(pkg.opt_state))
    blob = serialization.msgpack_serialize(payload)
    header_bytes = json.dumps(header, ensure_ascii=False).encode("utf-8")
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<Q", len(header_bytes)))
        f.write(header_bytes)
        f.write(blob)
    os.replace(tmp, path)  # atomic: never leaves a torn checkpoint


def load_checkpoint(path: str) -> CheckpointPackage:
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic != MAGIC:
            raise ValueError(f"{path}: not a tpuasr checkpoint (magic {magic!r})")
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen).decode("utf-8"))
        payload = serialization.msgpack_restore(f.read())
    pkg = CheckpointPackage(
        model_config=ModelConfig.from_dict(header["model_config"]),
        frontend_config=FrontendConfig.from_dict(header["frontend_config"]),
        labels=header["labels"],
        variables=payload["variables"],
        opt_state=payload.get("opt_state"),
        epoch=header["epoch"],
        iteration=header["iteration"],
        epoch_batch=header.get("epoch_batch", 0),
        loss_history=header["loss_history"],
        wer_history=header["wer_history"],
        cer_history=header["cer_history"],
        best_wer=header.get("best_wer", float("inf")),
    )
    return pkg


def restore_opt_state(template, state_dict):
    """Restore a msgpack'd optimizer state into the optimizer's own
    pytree structure (flax state-dict round trip)."""
    return serialization.from_state_dict(template, state_dict)


def device_put_blocking(tree):
    """``jax.device_put`` + wait for the transfers to REALLY complete.

    Large checkpoint uploads must finish BEFORE further runtime traffic
    (LM-table uploads, corpus residency, compile requests) is issued:
    on a tunneled runtime, interleaving new requests with a
    multi-hundred-MB in-flight transfer wedged the stream (observed
    2026-08-17: four cli.test runs blocked in tcp_recvmsg with the
    compile request never arriving; a fresh process moved 16 MB/s).

    ``block_until_ready`` is NOT a barrier here — the runtime plugin
    acks staged host-side buffers (measured: 165 MB "ready" in 0.5 s
    through a ~16 MB/s tunnel). The only honest barrier is a device
    computation whose *value* we materialize on the host. One jitted
    whole-tree checksum = one compile (persistent-cacheable) + one
    scalar download; per-leaf ``sum()`` would compile one graph per
    distinct leaf shape (measured 558 s vs the wire's ~10 s).
    """
    import jax
    import jax.numpy as jnp

    out = jax.device_put(tree)
    leaves = jax.tree.leaves(out)
    if leaves:
        checksum = jax.jit(
            lambda ls: sum((jnp.sum(x.astype(jnp.float32)) for x in ls),
                           start=jnp.float32(0)))
        float(checksum(leaves))  # float() = true host materialization
    return out
