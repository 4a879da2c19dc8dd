"""Jitted train / eval steps.

Reference parity: the inner loop of ref:train.py (SURVEY.md §4.1) —
forward, warp-ctc loss / batch_size, inf/NaN guard, backward,
clip_grad_norm_(400), SGD + Nesterov momentum step — plus the
validation forward. The reference's CPU dataloader hot path (STFT +
normalize) runs INSIDE this step on device, fused by XLA with the
model itself; augmentation (noise/tempo/SpecAugment) likewise.

TPU-first details:
  * The learning rate is a plain dynamic scalar argument, so the
    per-epoch annealing (lr /= 1.1) never retriggers compilation.
  * Gradient clipping runs before the momentum trace, matching
    ``clip_grad_norm_`` followed by ``optimizer.step()``.
  * The inf/NaN guard is per-utterance (mask out of the loss mean)
    rather than the reference's whole-batch skip — strictly better and
    branch-free (no data-dependent control flow under jit).
  * Under a data mesh the same jitted function IS the DP program:
    batches arrive sharded on the ``data`` axis, parameters replicated,
    and XLA emits the gradient psum over ICI.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tpuasr.audio.frontend import FrontendConfig, log_spectrogram
from tpuasr.ctc.loss import ctc_loss
from tpuasr.model.ds2 import DeepSpeech2, ModelConfig


def _waves_to_float(waves):
    """Accept int16 PCM batches (half the host->device transfer bytes —
    the sustained-throughput bottleneck on tunneled TPUs) and rescale on
    device; float batches pass through."""
    if jnp.issubdtype(waves.dtype, jnp.integer):
        return waves.astype(jnp.float32) * (1.0 / 32768.0)
    return waves


@dataclass(frozen=True)
class TrainConfig:
    """Mirrors the reference's optimizer flags (ref:train.py argparse):
    --lr 3e-4 --momentum 0.9 (Nesterov) --max-norm 400
    --learning-anneal 1.1."""

    lr: float = 3e-4
    momentum: float = 0.9
    nesterov: bool = True
    max_norm: float = 400.0
    learning_anneal: float = 1.1
    ctc_impl: str = "scan"  # "scan" | "pallas" (tpuasr.ops.ctc)

    def lr_at_epoch(self, epoch: int) -> float:
        return self.lr / (self.learning_anneal ** epoch)


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_norm),
        optax.trace(decay=cfg.momentum, nesterov=cfg.nesterov),
    )


def init_train_state(model_cfg: ModelConfig, train_cfg: TrainConfig, rng,
                     t_max: int = 64, batch: int = 2) -> TrainState:
    model = DeepSpeech2(model_cfg)
    variables = model.init_variables(rng, t_max=t_max, batch=batch)
    tx = make_optimizer(train_cfg)
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def _build_step_fn(model_cfg: ModelConfig, frontend_cfg: FrontendConfig,
                   train_cfg: TrainConfig, augment_fn=None):
    """The un-jitted train step body, shared by the per-batch jit
    (make_train_step) and the epoch-in-a-scan runner
    (make_resident_epoch_runner)."""
    model = DeepSpeech2(model_cfg)
    tx = make_optimizer(train_cfg)
    if train_cfg.ctc_impl == "pallas":
        from tpuasr.ctc.loss import ctc_loss_pallas as loss_impl
    else:
        loss_impl = ctc_loss

    def train_step(state: TrainState, waves, wave_lengths, labels,
                   label_lengths, valid, lr, rng):
        waves = _waves_to_float(waves)
        if augment_fn is not None:
            rng_w, rng_f = jax.random.split(rng)
            waves, wave_lengths = augment_fn.waves(rng_w, waves, wave_lengths)
        feats, feat_lengths = log_spectrogram(waves, wave_lengths, frontend_cfg)
        if augment_fn is not None:
            feats = augment_fn.feats(rng_f, feats, feat_lengths)
        # Batch-padding slots (valid=False duplicates) must not leak into
        # BatchNorm statistics: zero their lengths so every masked stage
        # ignores them entirely.
        feat_lengths = jnp.where(valid, feat_lengths, 0)

        def loss_fn(params):
            (logits, out_lengths), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                feats, feat_lengths, train=True, mutable=["batch_stats"],
            )
            per_utt = loss_impl(logits, out_lengths, labels, label_lengths)
            ok = (
                valid
                & (label_lengths <= out_lengths)
                & jnp.isfinite(per_utt)
                & (per_utt < 1e29)
            )
            n_ok = jnp.maximum(jnp.sum(ok), 1)
            loss = jnp.sum(jnp.where(ok, per_utt, 0.0)) / n_ok
            return loss, (updates["batch_stats"], jnp.sum(ok))

        (loss, (new_stats, n_ok)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        grad_norm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)

        new_state = TrainState(
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
            step=state.step + 1,
        )
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "param_norm": optax.global_norm(params),  # --log-params
            "n_ok": n_ok,
            "n_frames": jnp.sum(feat_lengths * valid),
        }
        return new_state, metrics

    return train_step


def make_train_step(model_cfg: ModelConfig, frontend_cfg: FrontendConfig,
                    train_cfg: TrainConfig, augment_fn=None):
    """Returns jitted fn: (state, waves, wave_lengths, labels,
    label_lengths, valid, lr, rng) -> (state, metrics)."""
    return jax.jit(
        _build_step_fn(model_cfg, frontend_cfg, train_cfg, augment_fn),
        donate_argnums=(0,),
    )


def make_resident_epoch_runner(model_cfg: ModelConfig,
                               frontend_cfg: FrontendConfig,
                               train_cfg: TrainConfig, augment_fn=None):
    """Epoch-in-a-scan over a device-resident corpus bank: ONE device
    dispatch trains K batches (gather + full step per scan iteration).

    Per-step host<->device dispatch latency is the sustained-throughput
    floor once data is resident (measured ~100 ms/step through the
    tunneled runtime, BASELINE.md); scanning the whole bucket schedule
    on device removes it entirely — the sustained rate becomes the
    bare-step rate. Returns jitted fn:
      (state, waves_bank (N,L) int16/f32, wl_bank (N,), labels_bank
       (N,C), ll_bank (N,), idx_mat (K,B) int32, valid_mat (K,B) bool,
       lr, rng, k0 (uint32 global start iteration)) ->
      (state, metrics stacked over K)
    """
    step_fn = _build_step_fn(model_cfg, frontend_cfg, train_cfg, augment_fn)

    @partial(jax.jit, donate_argnums=(0,))
    def run_epoch(state: TrainState, waves_bank, wl_bank, labels_bank,
                  ll_bank, idx_mat, valid_mat, lr, rng, k0):
        # Per-step randomness is fold_in(rng, k0 + k) where k0 is the
        # chunk's GLOBAL start iteration: the stream is a pure function
        # of (seed, global step), independent of --checkpoint-per-batch
        # chunk boundaries and identical to the streaming path's
        # fold_in(base_rng, iteration).
        ks = k0.astype(jnp.uint32) + jnp.arange(
            idx_mat.shape[0], dtype=jnp.uint32)

        def body(carry, inp):
            idx, valid, k = inp
            waves = jnp.take(waves_bank, idx, axis=0)
            wl = jnp.take(wl_bank, idx, axis=0)
            labels = jnp.take(labels_bank, idx, axis=0)
            ll = jnp.take(ll_bank, idx, axis=0)
            new_state, metrics = step_fn(
                carry, waves, wl, labels, ll, valid, lr,
                jax.random.fold_in(rng, k),
            )
            return new_state, metrics

        return jax.lax.scan(body, state, (idx_mat, valid_mat, ks))

    return run_epoch


def make_resident_eval_runner(model_cfg: ModelConfig,
                              frontend_cfg: FrontendConfig,
                              blank_id: int = 0):
    """Eval-in-a-scan over a device-resident corpus: ONE dispatch runs
    eval forward + greedy best-path for a whole bucket schedule
    (mirrors make_resident_epoch_runner; the reference's test.py loops
    host batches through the GPU one at a time). Returns jitted fn:
      (variables, waves_bank, wl_bank, idx_mat (K,B)) ->
      (ids (K,B,T'), emit (K,B,T'), out_lengths (K,B))
    Host side only assembles strings from the emit masks.
    """
    from tpuasr.decode.greedy import greedy_best_path

    model = DeepSpeech2(model_cfg)

    @jax.jit
    def run(variables, waves_bank, wl_bank, idx_mat):
        def body(_, idx):
            waves = _waves_to_float(jnp.take(waves_bank, idx, axis=0))
            wl = jnp.take(wl_bank, idx, axis=0)
            feats, feat_lengths = log_spectrogram(waves, wl, frontend_cfg)
            logits, out_lengths = model.apply(variables, feats, feat_lengths,
                                              train=False)
            ids, emit = greedy_best_path(logits, out_lengths,
                                         blank_id=blank_id)
            return None, (ids, emit, out_lengths)

        _, out = jax.lax.scan(body, None, idx_mat)
        return out

    return run


def make_resident_beam_eval_runner(model_cfg: ModelConfig,
                                   frontend_cfg: FrontendConfig,
                                   beam_width: int, blank_id: int,
                                   cutoff_top_n: int = 40,
                                   cutoff_prob: float = 1.0,
                                   prune_logp: float = -20.0,
                                   **lm_kw):
    """Beam-search eval-in-a-scan: ONE dispatch runs eval forward +
    the fused Pallas beam kernel for a whole bucket schedule, emitting
    the packed int16 backpointer readout per chunk — the beam analogue
    of make_resident_eval_runner (BASELINE config 4: "beam-search
    decoding ... batch eval on full LapsBM"). ``lm_kw`` forwards the
    kernel's LM-fusion kwargs (char_table/ctx_len or word_tables, plus
    alpha/beta/space_id — see DeviceBeamDecoder.kernel_lm_kwargs);
    LMs the kernel cannot fuse use the per-batch path. Returns jitted
    fn:
      (variables, waves_bank, wl_bank, idx_mat (K,B)) ->
      packed (K, B, T'*W + 2W) int16 (decode/beam.unpack_decode_outputs
      + _backtrack on host).
    """
    from functools import partial

    from tpuasr.decode.beam import _packable, pack_decode_outputs
    from tpuasr.ops.beam import beam_scan_pallas

    if not _packable(beam_width, model_cfg.n_classes):
        # the 15-bit int16 backpointer encoding holds W <= 254 beams
        # over C <= 126 classes; beyond that the packed readout would
        # silently corrupt decodes — fail loudly (DeviceBeamDecoder
        # falls back to unpacked transfers; the scan runner has no such
        # path yet)
        raise ValueError(
            f"resident beam eval needs beam_width <= 254 and n_classes "
            f"<= 126 for the packed readout (got W={beam_width}, "
            f"C={model_cfg.n_classes}); use the per-batch decoder"
        )
    model = DeepSpeech2(model_cfg)
    kernel = partial(beam_scan_pallas, beam_width=beam_width,
                     blank_id=blank_id, cutoff_top_n=cutoff_top_n,
                     cutoff_prob=cutoff_prob, prune_logp=prune_logp,
                     **lm_kw)

    @jax.jit
    def run(variables, waves_bank, wl_bank, idx_mat):
        def body(_, idx):
            waves = _waves_to_float(jnp.take(waves_bank, idx, axis=0))
            wl = jnp.take(wl_bank, idx, axis=0)
            feats, feat_lengths = log_spectrogram(waves, wl, frontend_cfg)
            logits, out_lengths = model.apply(variables, feats, feat_lengths,
                                              train=False)
            lp = jax.nn.log_softmax(logits, axis=-1)
            parents, chars, scores = kernel(lp, out_lengths)
            return None, pack_decode_outputs(parents, chars, scores)

        _, packed = jax.lax.scan(body, None, idx_mat)
        return packed

    return run


def make_eval_step(model_cfg: ModelConfig, frontend_cfg: FrontendConfig):
    """Returns jitted fn: (variables, waves, wave_lengths) ->
    (logits, out_lengths) with eval-mode BN (running stats).
    The reference's InferenceBatchSoftmax is intentionally NOT applied:
    decoders take raw logits (argmax/log-softmax invariant)."""
    model = DeepSpeech2(model_cfg)

    @jax.jit
    def eval_step(variables, waves, wave_lengths):
        waves = _waves_to_float(waves)
        feats, feat_lengths = log_spectrogram(waves, wave_lengths, frontend_cfg)
        logits, out_lengths = model.apply(variables, feats, feat_lengths,
                                          train=False)
        return logits, out_lengths

    return eval_step
