"""Epoch training loop.

Reference parity: ``main()`` in ref:train.py (call stack SURVEY.md
§4.1): SortaGrad epoch schedule, per-iteration loss logging, per-epoch
greedy-decode validation WER/CER, LR annealing (/= 1.1 per epoch),
per-epoch checkpoints + best-model tracking, --checkpoint-per-batch,
--continue-from exact resume and --finetune weights-only load.
"""

from __future__ import annotations

import signal
import threading
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.audio.frontend import FrontendConfig
from tpuasr.data.loader import AudioBatchLoader, Batch
from tpuasr.decode.greedy import GreedyDecoder
from tpuasr.decode.metrics import ErrorRateMeter
from tpuasr.labels import Alphabet
from tpuasr.model.ds2 import ModelConfig
from tpuasr.train.checkpoint import (
    CheckpointPackage,
    load_checkpoint,
    restore_opt_state,
    save_checkpoint,
)
from tpuasr.train.logging import AverageMeter, MetricsLogger
from tpuasr.train.profiling import StepProfiler
from tpuasr.train.mesh import (make_mesh, replicate, shard_batch,
                               shard_params)
from tpuasr.train.step import (
    TrainConfig,
    TrainState,
    init_train_state,
    make_eval_step,
    make_optimizer,
    make_resident_epoch_runner,
    make_train_step,
)


@dataclass
class LoopConfig:
    epochs: int = 70
    seed: int = 123456
    save_folder: str | None = None
    model_path: str | None = None  # best-model path
    checkpoint_per_epoch: bool = True
    checkpoint_per_batch: int = 0  # 0 = off
    log_dir: str | None = None
    tensorboard: bool = False
    quiet: bool = False
    use_mesh: bool = True
    mesh_tp: int = 1  # >1: 2D (data, model) mesh — dp x TENSOR parallel
    profile_dir: str | None = None  # JAX device trace of steps 10-15
    # Host-sync cadence: metrics live on device and are materialized
    # (blocking) only every N steps, so the device never waits on the
    # host between syncs — the loop sustains the bare-step rate. 1
    # reproduces the reference's per-iteration readout.
    sync_every: int = 10
    # Validation cadence in epochs (1 = the reference's per-epoch
    # eval). The FINAL epoch always evaluates, so wer_history[-1] is
    # populated whenever a val loader is present; skipped epochs record
    # NaN. Big corpora with many short epochs set this > 1.
    eval_every: int = 1


class _PreemptionExit(Exception):
    pass


class PreemptionGuard:
    """SIGTERM/SIGINT -> checkpoint-and-exit instead of dying mid-step.

    The reference had no failure handling (SURVEY.md §5.3: a dead rank
    killed the DDP job; recovery = manual --continue-from). On TPU
    pools preemption is ROUTINE, so the loop treats termination signals
    as a request to save an exact-resume checkpoint at the next safe
    point and return cleanly. No-op outside the main thread (signal
    handlers can only be installed there, e.g. under a serving worker).
    """

    def __init__(self, enabled: bool = True):
        self.triggered = False
        self._prev: dict = {}
        self._installed = False
        if enabled and threading.current_thread() is threading.main_thread():
            for sig in (signal.SIGTERM, signal.SIGINT):
                self._prev[sig] = signal.signal(sig, self._handler)
            self._installed = True

    def _handler(self, signum, frame):
        if self.triggered:  # second signal: give up and propagate
            raise KeyboardInterrupt
        self.triggered = True

    def restore(self):
        if self._installed:
            for sig, prev in self._prev.items():
                signal.signal(sig, prev)
            self._installed = False


def _device_batch(batch: Batch, mesh):
    arrays = (
        batch.waves,
        batch.wave_lengths,
        batch.labels,
        batch.label_lengths,
        batch.valid,
    )
    if mesh is not None:
        return shard_batch(mesh, arrays)
    return tuple(jnp.asarray(a) for a in arrays)


def evaluate(
    eval_step,
    variables,
    loader: AudioBatchLoader,
    alphabet: Alphabet,
    mesh=None,
    max_batches: int | None = None,
) -> tuple[float, float, float]:
    """Greedy-decode validation (ref:train.py validation block).
    Returns (wer, cer, avg_loss-free placeholder 0.0)."""
    decoder = GreedyDecoder(alphabet)
    meter = ErrorRateMeter()
    for i, batch in enumerate(loader.epoch(0)):
        if max_batches is not None and i >= max_batches:
            break
        waves, wave_lengths, labels, label_lengths, valid = _device_batch(
            batch, mesh
        )
        logits, out_lengths = eval_step(variables, waves, wave_lengths)
        hyps = decoder.decode(logits, out_lengths)
        for j, (hyp, ref) in enumerate(zip(hyps, batch.texts)):
            if batch.valid[j]:
                meter.update(hyp, ref)
    return meter.wer, meter.cer, 0.0


def train(
    model_cfg: ModelConfig,
    frontend_cfg: FrontendConfig,
    train_cfg: TrainConfig,
    loop_cfg: LoopConfig,
    train_loader: AudioBatchLoader,
    val_loader: AudioBatchLoader | None,
    alphabet: Alphabet,
    continue_from: str | None = None,
    finetune: bool = False,
    augment_fn=None,
    mesh=None,  # explicit Mesh override (tests pass a CPU mesh)
) -> CheckpointPackage:
    logger = MetricsLogger(loop_cfg.log_dir, loop_cfg.tensorboard, loop_cfg.quiet)
    if mesh is None:
        can_mesh = loop_cfg.use_mesh and len(jax.devices()) > 1
        if loop_cfg.mesh_tp > 1 and not can_mesh:
            # never silently train un-parallel after the CLI already
            # downgraded kernels "for TP"
            raise ValueError(
                f"--mesh-tp {loop_cfg.mesh_tp} needs a multi-device "
                f"mesh but {len(jax.devices())} device(s) are visible "
                f"(use_mesh={loop_cfg.use_mesh})")
        mesh = make_mesh(tp=loop_cfg.mesh_tp) if can_mesh else None

    # Per-step randomness is derived as fold_in(base_rng, iteration) —
    # a pure function of (seed, global step) — so a mid-epoch resume
    # reproduces the continuous run's augmentation stream exactly with
    # no fast-forwarding (SURVEY.md §5.4 exact-resume contract).
    base_rng = jax.random.PRNGKey(loop_cfg.seed)
    start_epoch, iteration, start_batch = 0, 0, 0
    histories = {"loss": [], "wer": [], "cer": []}
    best_wer = float("inf")

    # Checkpoints are self-describing (SURVEY.md §5.4): on resume, adopt
    # the package's model/frontend config + alphabet BEFORE building the
    # params/opt_state template, so CLI flags that disagree with the
    # checkpoint (e.g. --hidden-layers) can never produce a wrong-shape
    # template or a confusing restore mismatch.
    if continue_from:
        pkg = load_checkpoint(continue_from)
        model_cfg = pkg.model_config
        frontend_cfg = pkg.frontend_config
        alphabet = pkg.alphabet
    state = init_train_state(model_cfg, train_cfg, base_rng)
    if continue_from:
        state = state.replace(
            params=jax.tree.map(
                jnp.asarray,
                restore_opt_state(state.params, pkg.variables["params"]),
            ),
            batch_stats=jax.tree.map(
                jnp.asarray,
                restore_opt_state(state.batch_stats, pkg.variables["batch_stats"]),
            ),
        )
        if not finetune:  # exact resume (--continue-from)
            if pkg.opt_state is not None:
                state = state.replace(
                    opt_state=restore_opt_state(state.opt_state, pkg.opt_state)
                )
            start_epoch = pkg.epoch
            iteration = pkg.iteration
            start_batch = pkg.epoch_batch  # mid-epoch position, 0 = boundary
            histories = {
                "loss": list(pkg.loss_history),
                "wer": list(pkg.wer_history),
                "cer": list(pkg.cer_history),
            }
            best_wer = pkg.best_wer

    # Direction-TP (tp=2 + bidirectional + fused Pallas RNN kernels):
    # shard the DIRECTION axis instead of the gate axis — zero per-step
    # collectives, and the kernels run per-shard via shard_map inside
    # BiRecurrentCore (which resolves the ambient mesh set below).
    direction_tp = (
        mesh is not None
        and dict(zip(mesh.axis_names, mesh.devices.shape)).get("model") == 2
        and model_cfg.rnn_impl in ("pallas", "pallas2")
        and model_cfg.bidirectional
    )
    if mesh is not None:
        # 1-axis mesh: replicate (DP). 2D (data, model) mesh: the RNN
        # gate matrices (and their optimizer momentum, same tree paths)
        # shard over `model` — combined dp x tp, GSPMD-partitioned.
        state = TrainState(
            params=shard_params(mesh, state.params,
                                direction_tp=direction_tp),
            batch_stats=replicate(mesh, state.batch_stats),
            opt_state=shard_params(mesh, state.opt_state,
                                   direction_tp=direction_tp),
            step=replicate(mesh, state.step),
        )

    def mesh_ctx():
        """Ambient-mesh context for device dispatches: BiRecurrentCore's
        direction-TP shard_map resolves the 'model' axis from it, and
        ctc_loss_pallas shard_maps over 'data' when it's set — which is
        how the Pallas CTC kernel survives TP (batch-parallel, no
        model-axis dependence; ctc/loss.py _ambient_batch_mesh).
        No-op for scan impls on a plain DP mesh / no mesh."""
        import contextlib

        needs_ambient = direction_tp or (
            mesh is not None and train_cfg.ctc_impl == "pallas"
            and "model" in mesh.axis_names)
        if needs_ambient:
            from jax.sharding import set_mesh

            return set_mesh(mesh)
        return contextlib.nullcontext()

    # Epoch-in-a-scan fast path: with a device-resident corpus (the
    # loader exposes bucket_chunks) one dispatch trains a whole
    # bucket's schedule — the per-step dispatch latency that otherwise
    # floors sustained throughput disappears (BASELINE.md).
    # Under a mesh the banks are replicated and the index matrix's
    # batch axis is sharded over ``data`` — each device gathers its own
    # batch shard from its bank copy and XLA inserts the gradient psum,
    # exactly like the streaming DP path.
    # --checkpoint-per-batch N caps the scan length at N (a checkpoint
    # is a host-visible event, so it bounds the dispatch granularity);
    # preemption signals are honored between chunks the same way.
    use_epoch_scan = hasattr(train_loader, "bucket_chunks")
    if use_epoch_scan:
        epoch_runner = make_resident_epoch_runner(
            model_cfg, frontend_cfg, train_cfg, augment_fn
        )
        mesh_banks: dict = {}
    train_step = make_train_step(model_cfg, frontend_cfg, train_cfg, augment_fn)
    eval_step = make_eval_step(model_cfg, frontend_cfg)

    def make_pkg(epoch: int, epoch_batch: int = 0) -> CheckpointPackage:
        host_state = jax.device_get(state)
        return CheckpointPackage(
            model_config=model_cfg,
            frontend_config=frontend_cfg,
            labels=alphabet.labels,
            variables={
                "params": host_state.params,
                "batch_stats": host_state.batch_stats,
            },
            opt_state=host_state.opt_state,
            epoch=epoch,
            iteration=iteration,
            epoch_batch=epoch_batch,
            loss_history=histories["loss"],
            wer_history=histories["wer"],
            cer_history=histories["cer"],
            best_wer=best_wer,
        )

    profiler = StepProfiler(loop_cfg.profile_dir)
    guard = PreemptionGuard()

    def check_preempt():
        if guard.triggered:
            raise _PreemptionExit

    pkg = make_pkg(start_epoch)
    epoch_done = 0  # batches consumed in the current epoch (for preempt saves)
    try:
        for epoch in range(start_epoch, loop_cfg.epochs):
            lr = train_cfg.lr_at_epoch(epoch)  # anneal: lr / 1.1^epoch
            lr_dev = jnp.float32(lr)  # one transfer per epoch, not per step
            loss_meter = AverageMeter()
            step_time = AverageMeter()
            data_time = AverageMeter()
            epoch_start = time.time()
            t_prev = time.time()

            # Deferred host sync: steps dispatch asynchronously and their
            # device-side metrics are drained in windows, so the TPU never
            # idles waiting for a float() + JSONL write every iteration
            # (round-1 weakness: per-step sync cost the sustained rate).
            pending: list = []  # (iteration, batch_index, metrics_on_device, batch_size)
            window_t0 = time.time()
            window_data = 0.0

            def drain(n_total: int):
                nonlocal window_t0, window_data
                if not pending:
                    return
                n_steps = len(pending)
                utts = sum(n for _, _, _, n in pending)
                # materialize FIRST: float() blocks until the device has
                # actually executed every dispatched step, so the window
                # wall below is true throughput, not dispatch rate.
                rows = [
                    (it, {k: float(v) for k, v in m.items()}, n)
                    for it, _, m, n in pending
                ]
                wall = time.time() - window_t0
                per_step = wall / n_steps
                per_data = window_data / n_steps
                step_time.update(per_step, n=n_steps)
                data_time.update(per_data, n=n_steps)
                for it, vals, n in rows:
                    loss_meter.update(vals["loss"], n=n)
                    logger.log(it, {**vals, "lr": lr, "epoch": epoch,
                                    "step_time": per_step,
                                    "data_time": per_data}, prefix="train/")
                i_cur = pending[-1][1]
                logger.console(
                    f"Epoch {epoch} [{i_cur}/{n_total}] "
                    f"loss {loss_meter.val:.4f} (avg {loss_meter.avg:.4f}) "
                    f"step {per_step * 1e3:.0f}ms data {per_data * 1e3:.0f}ms "
                    f"({utts / max(wall, 1e-9):.1f} utt/s)"
                )
                pending.clear()
                logger.flush()
                window_t0 = time.time()
                window_data = 0.0

            n_total = train_loader.num_batches(epoch)
            # Mid-epoch resume: skip the batches the checkpoint already
            # consumed. The epoch schedule is a pure function of
            # (seed, epoch), so the remaining batches — and, on the scan
            # path, the remaining chunk boundaries — reproduce the
            # continuous run's exactly.
            resume_skip = start_batch if epoch == start_epoch else 0
            epoch_done = resume_skip
            if use_epoch_scan:
                cap = loop_cfg.checkpoint_per_batch
                from jax.sharding import NamedSharding, PartitionSpec

                pos = 0  # batches of this epoch's schedule seen so far
                for b, bank, idx_mat, n_valid, valid_mat in (
                    train_loader.bucket_chunks(epoch)
                ):
                    bank_arrays = None
                    n_bucket = idx_mat.shape[0]
                    # --checkpoint-per-batch N caps each scan at N batches
                    # (saves and preemption are host events, so they bound
                    # the dispatch granularity); 0 = one scan per bucket.
                    starts = range(0, n_bucket, cap) if cap else (0,)
                    for s in starts:
                        e = min(s + cap, n_bucket) if cap else n_bucket
                        lo = pos
                        pos += e - s
                        if pos <= resume_skip:
                            continue  # consumed before the resume point
                        # mid-chunk resume (checkpoint from a different
                        # cap/path): slice off the consumed rows
                        r0 = s + max(resume_skip - lo, 0)
                        check_preempt()
                        if bank_arrays is None:
                            bank_arrays = (bank.waves, bank.wave_lengths,
                                           bank.labels, bank.label_lengths)
                            if mesh is not None:
                                # banks replicated once per bucket; batch
                                # axis of the schedule sharded over data —
                                # each device gathers its own shard, XLA
                                # psums the grads
                                if b not in mesh_banks:
                                    mesh_banks[b] = replicate(mesh, bank_arrays)
                                bank_arrays = mesh_banks[b]
                        idx_c, valid_c = idx_mat[r0:e], valid_mat[r0:e]
                        nv_c = n_valid[r0:e]
                        k = idx_c.shape[0]
                        if mesh is not None:
                            kb_sharding = NamedSharding(
                                mesh, PartitionSpec(None, "data")
                            )
                            idx_dev = jax.device_put(idx_c, kb_sharding)
                            valid_dev = jax.device_put(valid_c, kb_sharding)
                        else:
                            idx_dev = jnp.asarray(idx_c)
                            valid_dev = jnp.asarray(valid_c)
                        # rng + global start iteration: the runner folds
                        # base_rng with (iteration + k), so the per-step
                        # stream matches fold_in(base_rng, global_step)
                        # regardless of chunk boundaries / resume cadence.
                        k0_dev = jnp.uint32(iteration)
                        t0c = time.time()
                        with mesh_ctx():
                            state, metrics = epoch_runner(
                                state, *bank_arrays, idx_dev, valid_dev,
                                lr_dev, base_rng, k0_dev,
                            )
                        vals = {kk: np.asarray(v) for kk, v in metrics.items()}
                        wall = time.time() - t0c
                        per_step = wall / k
                        step_time.update(per_step, n=k)
                        utts = int(nv_c.sum())
                        for j in range(k):
                            iteration += 1
                            loss_meter.update(float(vals["loss"][j]),
                                              n=int(nv_c[j]))
                            logger.log(
                                iteration,
                                {**{kk: float(v[j]) for kk, v in vals.items()},
                                 "lr": lr, "epoch": epoch,
                                 "step_time": per_step, "data_time": 0.0},
                                prefix="train/",
                            )
                        epoch_done += k
                        logger.console(
                            f"Epoch {epoch} bucket {b} "
                            f"[{epoch_done}/{n_total}] "
                            f"loss {loss_meter.val:.4f} "
                            f"(avg {loss_meter.avg:.4f}) "
                            f"step {per_step * 1e3:.0f}ms "
                            f"({utts / max(wall, 1e-9):.1f} utt/s)"
                        )
                        logger.flush()
                        if cap and loop_cfg.save_folder:
                            save_checkpoint(
                                f"{loop_cfg.save_folder}/"
                                f"tpuasr_e{epoch}_b{epoch_done}.ckpt",
                                make_pkg(epoch, epoch_done),
                            )
                        check_preempt()
            else:
                for i, batch in enumerate(train_loader.epoch(epoch)):
                    if i < resume_skip:
                        continue  # consumed before the resume point
                    check_preempt()
                    t_data = time.time()
                    window_data += t_data - t_prev
                    waves, wave_lengths, labels, label_lengths, valid = _device_batch(
                        batch, mesh
                    )
                    step_rng = jax.random.fold_in(base_rng, iteration)
                    profiler.maybe_start(iteration)
                    with mesh_ctx():
                        state, metrics = train_step(
                            state, waves, wave_lengths, labels,
                            label_lengths, valid, lr_dev, step_rng,
                        )
                    iteration += 1
                    epoch_done = i + 1
                    profiler.maybe_stop(iteration)
                    pending.append((iteration, i, metrics, batch.size))
                    t_prev = time.time()
                    if len(pending) >= max(loop_cfg.sync_every, 1):
                        drain(n_total)
                    if (
                        loop_cfg.checkpoint_per_batch
                        and loop_cfg.save_folder
                        and (i + 1) % loop_cfg.checkpoint_per_batch == 0
                    ):
                        drain(n_total)
                        save_checkpoint(
                            f"{loop_cfg.save_folder}/tpuasr_e{epoch}_b{i + 1}.ckpt",
                            make_pkg(epoch, i + 1),
                        )
                drain(n_total)

            histories["loss"].append(loss_meter.avg)
            wer, cer = float("nan"), float("nan")
            eval_this = (epoch + 1) % max(loop_cfg.eval_every, 1) == 0 \
                or epoch + 1 == loop_cfg.epochs
            if val_loader is not None and eval_this:
                variables = {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                }
                with mesh_ctx():
                    wer, cer, _ = evaluate(eval_step, variables,
                                           val_loader, alphabet, mesh)
            histories["wer"].append(wer)
            histories["cer"].append(cer)
            logger.log(epoch, {"loss": loss_meter.avg, "wer": wer, "cer": cer,
                               "epoch_time": time.time() - epoch_start},
                       prefix="epoch/")
            logger.console(
                f"Epoch {epoch} done in {time.time() - epoch_start:.1f}s: "
                f"loss {loss_meter.avg:.4f} WER {wer:.2f} CER {cer:.2f} lr {lr:.2e}"
            )

            pkg = make_pkg(epoch + 1)
            if loop_cfg.save_folder and loop_cfg.checkpoint_per_epoch:
                save_checkpoint(f"{loop_cfg.save_folder}/tpuasr_{epoch + 1}.ckpt", pkg)
            if loop_cfg.model_path and (np.isnan(wer) or wer <= best_wer):
                if not np.isnan(wer):
                    best_wer = wer
                    pkg.best_wer = best_wer
                save_checkpoint(loop_cfg.model_path, pkg)

    except _PreemptionExit:
        pkg = make_pkg(epoch, epoch_done)
        if loop_cfg.save_folder:
            path = f"{loop_cfg.save_folder}/tpuasr_preempt.ckpt"
            save_checkpoint(path, pkg)
            logger.console(f"preemption signal: saved {path}; resume with "
                           f"--continue-from {path}")
        else:
            logger.console("preemption signal: stopping (no --save-folder, "
                           "nothing persisted)")
    finally:
        guard.restore()

    profiler.close()
    logger.close()
    return pkg
