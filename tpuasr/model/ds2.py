"""Deep Speech 2-style acoustic model, TPU-first.

Reference parity (ref:model.py — reconstructed, mount empty at survey
time; see SURVEY.md §4.4):
  * MaskConv: 2x Conv2d over (freq, time) — k=(41,11) s=(2,2) then
    k=(21,11) s=(2,1) — each followed by BatchNorm2d + HardTanh(0, 20),
    with positions past each utterance's true length zeroed.
  * BatchRNN x N (default 5): bidirectional GRU/LSTM/RNN, hidden 800,
    forward+backward outputs SUMMED (not concatenated); BatchNorm
    (SequenceWise) before every layer except the first.
  * Head: SequenceWise(BatchNorm1d + Linear(hidden -> n_classes,
    bias=False)). The reference's InferenceBatchSoftmax lives in the
    decoders here — the model always returns raw logits.
  * DeepSpeech.get_seq_lens -> conv_out_lengths.

TPU-first design decisions (not a port):
  * NHWC layout (B, T, F, C) — time and freq are the conv spatial dims,
    channels last, which is the layout XLA tiles best on TPU.
  * The RNN is a time-major `lax.scan` whose input projection
    (x @ W_x for all timesteps) is hoisted out of the scan as one big
    (T*B, H_in) @ (H_in, G*H) MXU matmul; only the (B, H) @ (H, G*H)
    recurrent matmul stays inside the scan.
  * Backward direction = length-aware prefix reversal (valid frames
    reversed into the same slots, padding stays padding) + the same
    forward scan — no dynamic shapes, no ragged control flow.
  * BatchNorm statistics are computed over VALID timesteps only
    (masked), unlike the reference which normalizes over padding too;
    this is the correct generalization and is flagged for parity work.
  * All matmuls can run in bfloat16 (``compute_dtype``) with f32
    parameters and f32 BatchNorm statistics.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# (kernel_t, kernel_f, stride_t, stride_f, pad_t, pad_f) per conv layer.
# Matches the reference family's conv1 k=(41f,11t) s=(2,2) p=(20,5) and
# conv2 k=(21f,11t) s=(2f,1t) p=(10,5), expressed time-first.
CONV_SPECS = (
    (11, 41, 2, 2, 5, 20),
    (11, 21, 1, 2, 5, 10),
)


@dataclass(frozen=True)
class ModelConfig:
    """Hyperparameters; mirrors the reference checkpoint package fields
    (hidden_size, hidden_layers, rnn_type, bidirectional, labels)."""

    n_classes: int = 44
    n_features: int = 161
    conv_channels: int = 32
    hidden_size: int = 800
    hidden_layers: int = 5
    rnn_type: str = "gru"  # gru | lstm | rnn
    bidirectional: bool = True
    lookahead_context: int = 20  # used only when not bidirectional
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    # lax.scan unroll factor for the recurrent time loop. Measured on
    # v5e: no effect on step time (the loop is weight-refetch-bound,
    # not dispatch-bound) while inflating compile time ~8x, so default 1.
    rnn_unroll: int = 1
    # "scan" (lax.scan) | "pallas" (fused VMEM-resident kernel,
    # tpuasr.ops.gru) | "pallas2" (gate-major kernel, tpuasr.ops.gru2)
    # — kernels are bidirectional-GRU only, other configs fall back.
    rnn_impl: str = "scan"
    # "masked" (default): BN statistics / RNN carries / direction
    # reversal see only each utterance's true length — the numerically
    # right thing for padded batches. "reference": padding-INCLUSIVE
    # semantics exactly like the torch reference family (BN over every
    # padded position, RNN runs the full padded axis, backward
    # direction starts from the padding) — opt-in for exact-finetune
    # parity with imported reference checkpoints (ref:model.py
    # SequenceWise BN, SURVEY.md:137). True lengths still bound CTC
    # and decoding.
    bn_mask_mode: str = "masked"

    def to_dict(self) -> dict:
        return {
            "n_classes": self.n_classes,
            "n_features": self.n_features,
            "conv_channels": self.conv_channels,
            "hidden_size": self.hidden_size,
            "hidden_layers": self.hidden_layers,
            "rnn_type": self.rnn_type,
            "bidirectional": self.bidirectional,
            "lookahead_context": self.lookahead_context,
            "compute_dtype": jnp.dtype(self.compute_dtype).name,
            "param_dtype": jnp.dtype(self.param_dtype).name,
            "rnn_unroll": self.rnn_unroll,
            "rnn_impl": self.rnn_impl,
            "bn_mask_mode": self.bn_mask_mode,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ModelConfig":
        d = dict(d)
        for k in ("compute_dtype", "param_dtype"):
            if k in d:
                d[k] = jnp.dtype(d[k])
        return cls(**{k: v for k, v in d.items() if k in cls.__dataclass_fields__})


def conv_out_lengths(lengths: jnp.ndarray | int) -> jnp.ndarray | int:
    """Length propagation through the conv stack along time
    (reference: DeepSpeech.get_seq_lens)."""
    out = lengths
    for (kt, _, st, _, pt, _) in CONV_SPECS:
        out = (out + 2 * pt - kt) // st + 1
    return out


def conv_out_features(n_features: int, conv_channels: int) -> int:
    f = n_features
    for (_, kf, _, sf, _, pf) in CONV_SPECS:
        f = (f + 2 * pf - kf) // sf + 1
    return f * conv_channels


def _time_mask(lengths: jnp.ndarray, t_max: int) -> jnp.ndarray:
    """(B,) lengths -> (B, T) 1.0/0.0 validity mask."""
    return (
        jnp.arange(t_max, dtype=jnp.int32)[None, :] < lengths[:, None]
    )


class MaskedBatchNorm(nn.Module):
    """BatchNorm over valid (batch x time) positions only.

    Works on (B, T, ..., C); statistics are reduced over all axes but
    the last, weighted by the validity mask. Running statistics live in
    the ``batch_stats`` collection (torch momentum convention:
    new = (1 - momentum) * old + momentum * batch, momentum=0.1).
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, train: bool):
        # mask: broadcastable to x's leading dims, e.g. (B, T)
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        m = jnp.broadcast_to(
            mask.astype(jnp.float32).reshape(mask.shape + (1,) * (x.ndim - mask.ndim)),
            x.shape[:-1] + (1,),
        )
        if train:
            denom = jnp.maximum(jnp.sum(m), 1.0)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.sum(xf * m, axis=axes) / denom
            var = jnp.sum((xf - mean) ** 2 * m, axis=axes) / denom
            if not self.is_initializing():
                # torch BatchNorm stores the UNBIASED variance (n/(n-1))
                # in running_var; match that so eval-mode statistics
                # interop with reference checkpoints.
                unbiased = var * (denom / jnp.maximum(denom - 1.0, 1.0))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return (y * m).astype(orig_dtype)


class MaskedConvBlock(nn.Module):
    """One conv layer of the MaskConv stack: Conv -> masked BN ->
    HardTanh(0, 20) -> zero padded positions (ref:model.py MaskConv)."""

    spec: tuple
    channels: int
    compute_dtype: Any
    param_dtype: Any

    @nn.compact
    def __call__(self, x, lengths, train: bool, mask_lengths=None):
        """``mask_lengths`` overrides the lengths used for MASKING only
        (bn_mask_mode="reference" passes full-axis lengths so BN stats
        include padding, like the reference's BatchNorm2d); ``lengths``
        always drives the returned length propagation."""
        kt, kf, st, sf, pt, pf = self.spec
        x = nn.Conv(
            features=self.channels,
            kernel_size=(kt, kf),
            strides=(st, sf),
            padding=((pt, pt), (pf, pf)),
            use_bias=False,
            dtype=self.compute_dtype,
            param_dtype=self.param_dtype,
        )(x)
        out_lengths = (lengths + 2 * pt - kt) // st + 1
        ml = (out_lengths if mask_lengths is None
              else (mask_lengths + 2 * pt - kt) // st + 1)
        mask = _time_mask(ml, x.shape[1])
        x = MaskedBatchNorm(param_dtype=self.param_dtype)(x, mask, train)
        x = jnp.clip(x, 0.0, 20.0)  # HardTanh(0, 20)
        x = x * mask[:, :, None, None].astype(x.dtype)
        return x, out_lengths


def _reverse_prefix(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse each example's valid prefix in place along time.

    (B, T, ...) with valid frames [0, len) -> frames reversed within
    [0, len); padding slots untouched. Applying it twice is identity.
    """
    t_max = x.shape[1]
    t = jnp.arange(t_max, dtype=jnp.int32)[None, :]
    idx = jnp.where(t < lengths[:, None], lengths[:, None] - 1 - t, t)
    idx = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, idx, axis=1)


GATES = {"gru": 3, "lstm": 4, "rnn": 1}


class RecurrentCore(nn.Module):
    """Unidirectional masked RNN core over (B, T, H_in) -> (B, T, H).

    The input projection runs as one big matmul outside the scan; the
    scan body does only the recurrent matmul + gate math. Gate order
    follows cuDNN/PyTorch ([r, z, n] for GRU, [i, f, g, o] for LSTM) so
    reference checkpoints can be transposed in for parity testing.
    """

    hidden: int
    rnn_type: str
    compute_dtype: Any
    param_dtype: Any
    unroll: int = 8
    impl: str = "scan"

    @nn.compact
    def __call__(self, x, mask):
        g = GATES[self.rnn_type]
        h = self.hidden
        x_proj = nn.Dense(
            g * h,
            use_bias=True,
            dtype=self.compute_dtype,
            param_dtype=self.param_dtype,
            name="input_proj",
        )(x)  # (B, T, G*H)
        w_h = self.param(
            "recurrent_kernel",
            nn.initializers.orthogonal() if self.rnn_type != "rnn" else nn.initializers.lecun_normal(),
            (h, g * h),
            self.param_dtype,
        )
        b_h = self.param("recurrent_bias", nn.initializers.zeros, (g * h,), self.param_dtype)

        dt = self.compute_dtype
        w_h_c = w_h.astype(dt)
        b_h_c = b_h.astype(dt)

        batch = x.shape[0]
        xg_t = jnp.swapaxes(x_proj, 0, 1)  # (T, B, G*H) time-major
        m_t = jnp.swapaxes(mask, 0, 1)[:, :, None].astype(dt)  # (T, B, 1)

        if self.impl == "pallas" and self.rnn_type in ("gru", "lstm"):
            # the fused bidirectional kernels are direction-count
            # generic: run them with a singleton direction axis
            if self.rnn_type == "gru":
                from tpuasr.ops.gru import bigru_pallas as fused
            else:
                from tpuasr.ops.lstm import bilstm_pallas as fused
            ys = fused(
                xg_t.astype(dt)[:, None],  # (T, 1, B, G*H)
                w_h[None].astype(dt),
                b_h[None].astype(jnp.float32),
                jnp.swapaxes(mask, 0, 1)[:, None].astype(jnp.float32),
            )  # (T, 1, B, H)
            ys = jnp.swapaxes(ys[:, 0], 0, 1)  # (B, T, H)
            return ys * mask[:, :, None].astype(ys.dtype)

        rnn_type = self.rnn_type

        def step(carry, inp):
            xg, m = inp
            if rnn_type == "lstm":
                hc, cc = carry
                gates = xg + jnp.dot(hc, w_h_c, preferred_element_type=dt) + b_h_c
                i_, f_, g_, o_ = jnp.split(gates, 4, axis=-1)
                i_ = jax.nn.sigmoid(i_)
                f_ = jax.nn.sigmoid(f_)
                g_ = jnp.tanh(g_)
                o_ = jax.nn.sigmoid(o_)
                c_new = f_ * cc + i_ * g_
                h_new = o_ * jnp.tanh(c_new)
                hc = m * h_new + (1 - m) * hc
                cc = m * c_new + (1 - m) * cc
                return (hc, cc), hc
            hc = carry
            hg = jnp.dot(hc, w_h_c, preferred_element_type=dt) + b_h_c
            if rnn_type == "gru":
                xr, xz, xn = jnp.split(xg, 3, axis=-1)
                hr, hz, hn = jnp.split(hg, 3, axis=-1)
                r = jax.nn.sigmoid(xr + hr)
                z = jax.nn.sigmoid(xz + hz)
                n_ = jnp.tanh(xn + r * hn)
                h_new = (1 - z) * n_ + z * hc
            else:  # vanilla tanh RNN
                h_new = jnp.tanh(xg + hg)
            hc = m * h_new + (1 - m) * hc
            return hc, hc

        h0 = jnp.zeros((batch, h), dt)
        carry0 = (h0, h0) if rnn_type == "lstm" else h0
        _, ys = jax.lax.scan(
            step, carry0, (xg_t.astype(dt), m_t), unroll=self.unroll
        )
        ys = jnp.swapaxes(ys, 0, 1)  # (B, T, H)
        return ys * mask[:, :, None].astype(ys.dtype)


def _ambient_direction_tp():
    """The ambient mesh when direction-TP applies (a 2-way ``model``
    axis set via jax.sharding.set_mesh — train.loop.mesh_ctx does this
    for --mesh-tp 2 + fused kernels): BiRecurrentCore then runs its
    Pallas kernels ONE DIRECTION PER MODEL SHARD via shard_map. The
    directions of a bidirectional scan are embarrassingly parallel, so
    this TP needs ZERO per-step collectives — unlike gate-axis TP,
    which all-gathers hidden state every time step (train/mesh.py)."""
    try:
        from jax.sharding import get_abstract_mesh

        am = get_abstract_mesh()
        shape = dict(getattr(am, "shape", {}) or {})
        if shape.get("model") == 2 and "data" in shape:
            return am
    except Exception:
        pass
    return None


def _maybe_direction_shard(fused):
    """Wrap a (T,2,B,*)-layout fused bi-kernel in a direction-sharding
    shard_map when an ambient 2-way model mesh is set (no-op
    otherwise). Each shard sees a singleton direction axis — the
    kernels are direction-count generic."""
    am = _ambient_direction_tp()
    if am is None:
        return fused
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    return shard_map(
        fused, mesh=am,
        in_specs=(P(None, "model", "data"), P("model"), P("model"),
                  P(None, "model", "data")),
        out_specs=P(None, "model", "data"),
        check_vma=False,  # pallas outputs carry no vma
    )


class BiRecurrentCore(nn.Module):
    """Direction-batched bidirectional RNN core.

    TPU-first: instead of two sequential scans (forward + reversed),
    both directions run in ONE `lax.scan` with a leading direction axis
    of 2 — the recurrent matmul becomes a batched (2, B, H) x
    (2, H, G*H) einsum (bigger MXU tiles) and the number of sequential
    scan dispatches halves. The backward direction consumes the
    length-aware prefix-reversed input, so masks are shared.
    """

    hidden: int
    rnn_type: str
    compute_dtype: Any
    param_dtype: Any
    unroll: int = 8
    impl: str = "scan"

    @nn.compact
    def __call__(self, x, x_flip, mask_fwd, mask_bwd):
        """x_flip is the time-FLIPPED input (jnp.flip, a cheap layout op
        — not a per-example gather); mask_bwd marks its valid region
        [T-len, T). The flipped-scan outputs, flipped back, equal the
        prefix-reversed backward states exactly (h0=0 on padding)."""
        g = GATES[self.rnn_type]
        h = self.hidden
        dt = self.compute_dtype
        b, t_max, h_in = x.shape

        xs = jnp.stack([x, x_flip], axis=0)  # (2, B, T, H_in)
        mask = jnp.stack([mask_fwd, mask_bwd], axis=0)  # (2, B, T)
        init = (nn.initializers.orthogonal()
                if self.rnn_type != "rnn" else nn.initializers.lecun_normal())
        w_x = self.param("input_kernel", nn.initializers.lecun_normal(),
                         (2, h_in, g * h), self.param_dtype)
        b_x = self.param("input_bias", nn.initializers.zeros,
                         (2, g * h), self.param_dtype)
        w_h = self.param("recurrent_kernel", init, (2, h, g * h),
                         self.param_dtype)
        b_h = self.param("recurrent_bias", nn.initializers.zeros,
                         (2, g * h), self.param_dtype)

        mask_t = jnp.moveaxis(mask, 2, 0)  # (T, 2, B)

        if self.impl == "pallas2" and self.rnn_type == "gru":
            # gate-major kernel: no per-step relayouts (tpuasr.ops.gru2)
            from tpuasr.ops.gru2 import bigru_pallas2

            am = _ambient_direction_tp()
            if am is not None:
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                bigru_pallas2 = shard_map(
                    bigru_pallas2, mesh=am,
                    in_specs=(P(None, "model", None, "data"), P("model"),
                              P("model"), P(None, "model", "data")),
                    out_specs=P(None, "model", "data"),
                    check_vma=False,  # pallas outputs carry no vma
                )
            xg_g = (
                jnp.einsum(
                    "dbti,digh->tdgbh",
                    xs.astype(dt),
                    w_x.reshape(2, h_in, g, h).astype(dt),
                )
                + b_x.reshape(2, g, h).astype(dt)[None, :, :, None, :]
            )  # (T, 2, 3, B, H)
            w_h_g = jnp.transpose(w_h.reshape(2, h, g, h), (0, 2, 1, 3))
            ys = bigru_pallas2(
                xg_g, w_h_g.astype(dt),
                b_h.reshape(2, g, h).astype(jnp.float32),
                mask_t.astype(jnp.float32),
            )  # (T, 2, B, H)
            ys = jnp.moveaxis(ys, 0, 2)
            return ys[0], ys[1]

        xg = (
            jnp.einsum("dbti,dig->dbtg", xs.astype(dt), w_x.astype(dt))
            + b_x.astype(dt)[:, None, None, :]
        )
        w_h_c = w_h.astype(dt)
        b_h_c = b_h.astype(dt)[:, None, :]

        xg_t = jnp.moveaxis(xg, 2, 0)  # (T, 2, B, G*H)

        if self.impl == "pallas" and self.rnn_type == "gru":
            from tpuasr.ops.gru import bigru_pallas

            bigru_pallas = _maybe_direction_shard(bigru_pallas)
            ys = bigru_pallas(
                xg_t.astype(dt), w_h.astype(dt), b_h.astype(jnp.float32),
                mask_t.astype(jnp.float32),
            )  # (T, 2, B, H)
            ys = jnp.moveaxis(ys, 0, 2)  # (2, B, T, H)
            return ys[0], ys[1]

        if self.impl == "pallas" and self.rnn_type == "lstm":
            from tpuasr.ops.lstm import bilstm_pallas

            bilstm_pallas = _maybe_direction_shard(bilstm_pallas)
            ys = bilstm_pallas(
                xg_t.astype(dt), w_h.astype(dt), b_h.astype(jnp.float32),
                mask_t.astype(jnp.float32),
            )  # (T, 2, B, H)
            ys = jnp.moveaxis(ys, 0, 2)
            return ys[0], ys[1]

        m_t = mask_t[:, :, :, None].astype(dt)  # (T, 2, B, 1)
        rnn_type = self.rnn_type

        def gates_of(hc, xg_step):
            return (
                xg_step
                + jnp.einsum("dbh,dhg->dbg", hc, w_h_c,
                             preferred_element_type=dt)
                + b_h_c
            )

        def step(carry, inp):
            xg_step, m = inp
            if rnn_type == "lstm":
                hc, cc = carry
                gates = gates_of(hc, xg_step)
                i_, f_, g_, o_ = jnp.split(gates, 4, axis=-1)
                c_new = (jax.nn.sigmoid(f_) * cc
                         + jax.nn.sigmoid(i_) * jnp.tanh(g_))
                h_new = jax.nn.sigmoid(o_) * jnp.tanh(c_new)
                hc = m * h_new + (1 - m) * hc
                cc = m * c_new + (1 - m) * cc
                return (hc, cc), hc
            hc = carry
            if rnn_type == "gru":
                hg = (jnp.einsum("dbh,dhg->dbg", hc, w_h_c,
                                 preferred_element_type=dt) + b_h_c)
                xr, xz, xn = jnp.split(xg_step, 3, axis=-1)
                hr, hz, hn = jnp.split(hg, 3, axis=-1)
                r = jax.nn.sigmoid(xr + hr)
                z = jax.nn.sigmoid(xz + hz)
                n_ = jnp.tanh(xn + r * hn)
                h_new = (1 - z) * n_ + z * hc
            else:
                h_new = jnp.tanh(gates_of(hc, xg_step))
            hc = m * h_new + (1 - m) * hc
            return hc, hc

        h0 = jnp.zeros((2, b, h), dt)
        carry0 = (h0, h0) if rnn_type == "lstm" else h0
        _, ys = jax.lax.scan(
            step, carry0, (xg_t.astype(dt), m_t), unroll=self.unroll
        )
        ys = jnp.moveaxis(ys, 0, 2)  # (2, B, T, H)
        return ys[0], ys[1]


class BatchRNN(nn.Module):
    """One (optionally bidirectional) RNN layer with pre-BatchNorm
    (ref:model.py BatchRNN): BN (except first layer) -> RNN, with
    forward + backward outputs summed to keep width constant."""

    hidden: int
    rnn_type: str
    bidirectional: bool
    batch_norm: bool
    compute_dtype: Any
    param_dtype: Any
    unroll: int = 8
    impl: str = "scan"

    @nn.compact
    def __call__(self, x, lengths, train: bool, mask_lengths=None):
        if mask_lengths is not None:  # bn_mask_mode="reference"
            lengths = mask_lengths
        mask = _time_mask(lengths, x.shape[1])
        if self.batch_norm:
            x = MaskedBatchNorm(param_dtype=self.param_dtype)(x, mask, train)
        if not self.bidirectional:
            return RecurrentCore(
                self.hidden, self.rnn_type, self.compute_dtype,
                self.param_dtype, unroll=self.unroll, impl=self.impl,
                name="fwd",
            )(x, mask)
        x_flip = jnp.flip(x, axis=1)
        t_max = x.shape[1]
        mask_bwd = (
            jnp.arange(t_max, dtype=jnp.int32)[None, :]
            >= (t_max - lengths)[:, None]
        )
        fwd, bwd_flip = BiRecurrentCore(
            self.hidden, self.rnn_type, self.compute_dtype, self.param_dtype,
            unroll=self.unroll, impl=self.impl, name="bi",
        )(x, x_flip, mask, mask_bwd)
        bwd = jnp.flip(bwd_flip, axis=1)
        out = fwd + bwd  # direction-sum, reference behavior
        return out * mask[:, :, None].astype(out.dtype)


class Lookahead(nn.Module):
    """Lookahead context layer for unidirectional models (DS2 paper;
    ref:model.py Lookahead): per-feature convolution over the next
    ``context`` frames."""

    context: int
    compute_dtype: Any
    param_dtype: Any

    @nn.compact
    def __call__(self, x):
        h = x.shape[-1]
        y = nn.Conv(
            features=h,
            kernel_size=(self.context,),
            padding=((0, self.context - 1),),
            feature_group_count=h,
            use_bias=False,
            dtype=self.compute_dtype,
            param_dtype=self.param_dtype,
        )(x)
        return jnp.clip(y, 0.0, 20.0)  # HardTanh(0, 20)


class DeepSpeech2(nn.Module):
    """Full acoustic model: (B, T, F) log-spectrograms + frame lengths
    -> (B, T', n_classes) raw logits + output lengths."""

    config: ModelConfig

    @nn.compact
    def __call__(self, feats, lengths, train: bool = False):
        cfg = self.config
        x = feats.astype(cfg.compute_dtype)[:, :, :, None]  # (B, T, F, 1)
        out_lengths = lengths
        # bn_mask_mode="reference": masking (BN stats, RNN carries,
        # reversal) sees the FULL padded axis — reference-family
        # semantics for exact finetune parity. Slots with length 0
        # (static-batch fill) stay excluded either way.
        ml = None
        if cfg.bn_mask_mode == "reference":
            ml = jnp.where(jnp.asarray(lengths) > 0,
                           jnp.int32(feats.shape[1]), 0)
        for i, spec in enumerate(CONV_SPECS):
            kt, _, st, _, pt, _ = spec
            x, out_lengths = MaskedConvBlock(
                spec=spec,
                channels=cfg.conv_channels,
                compute_dtype=cfg.compute_dtype,
                param_dtype=cfg.param_dtype,
                name=f"conv{i}",
            )(x, out_lengths, train, mask_lengths=ml)
            if ml is not None:
                ml = (ml + 2 * pt - kt) // st + 1

        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)

        for i in range(cfg.hidden_layers):
            x = BatchRNN(
                hidden=cfg.hidden_size,
                rnn_type=cfg.rnn_type,
                bidirectional=cfg.bidirectional,
                batch_norm=(i > 0),
                compute_dtype=cfg.compute_dtype,
                param_dtype=cfg.param_dtype,
                unroll=cfg.rnn_unroll,
                impl=cfg.rnn_impl,
                name=f"rnn{i}",
            )(x, out_lengths, train, mask_lengths=ml)

        if not cfg.bidirectional and cfg.lookahead_context > 0:
            x = Lookahead(
                context=cfg.lookahead_context,
                compute_dtype=cfg.compute_dtype,
                param_dtype=cfg.param_dtype,
                name="lookahead",
            )(x)

        mask = _time_mask(out_lengths if ml is None else ml, x.shape[1])
        x = MaskedBatchNorm(param_dtype=cfg.param_dtype, name="head_bn")(
            x, mask, train
        )
        logits = nn.Dense(
            cfg.n_classes,
            use_bias=False,
            dtype=cfg.compute_dtype,
            param_dtype=cfg.param_dtype,
            name="head",
        )(x)
        logits = logits.astype(jnp.float32)
        logits = logits * mask[:, :, None]
        return logits, out_lengths

    def init_variables(self, rng, t_max: int = 64, batch: int = 2):
        cfg = self.config
        feats = jnp.zeros((batch, t_max, cfg.n_features), jnp.float32)
        lengths = jnp.full((batch,), t_max, jnp.int32)
        return self.init(rng, feats, lengths, train=False)


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
