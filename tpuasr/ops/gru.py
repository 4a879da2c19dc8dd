"""Pallas TPU kernel: fused bidirectional GRU time loop.

Why: the lax.scan GRU re-fetches the recurrent weight matrix
(2 x 800 x 2400 bf16 ~ 7.7 MB) from HBM on EVERY timestep — measured
~27 us/step on v5e, entirely HBM-bound, which makes the RNN stack the
dominant cost of the DS2 train step (SURVEY.md §3.2 row "cuDNN RNN").
This kernel keeps the weights and the hidden state resident in VMEM
across the whole time loop and streams only the per-timestep input
projections/outputs, the way cuDNN persistent RNN kernels do on GPU.

Structure:
  * Input projections (x @ W_x — embarrassingly parallel) stay OUTSIDE
    the kernel as one big MXU matmul that XLA already does optimally.
  * Forward kernel: grid over time chunks (TPU grid steps run
    sequentially on a core, so VMEM scratch carries h across chunks);
    per step: two (B, H) @ (H, 3H) MXU dots + VPU gate math + length
    masking (padded frames pass h through unchanged).
  * Backward (custom_vjp): a reverse-time kernel computes the gate
    pre-activation gradients dhg (which equal d(xg)); the weight
    gradient is then ONE big einsum over time outside the kernel
    (MXU-friendly), dW = sum_t h_{t-1}^T dhg_t.

Both directions are batched in the kernel (leading axis 2): the
backward-in-time direction consumes the length-aware prefix-reversed
input prepared by the model (tpuasr.model.ds2._reverse_prefix).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TIME_CHUNK = 8
# v5e has >16 MB of physical VMEM; the Mosaic default scoped limit is
# 16 MB. The recurrent weights alone are ~7.7 MB bf16, so raise it.
VMEM_LIMIT = 100 * 1024 * 1024

# The backward kernel's double-buffered per-chunk windows scale with
# time_chunk * B * H; measured on v5e: B=128/H=800/tc=16 needs 163 MB
# (OOM at the 128 MB cap) while tc=8 fits. Budget tc*B*H at the
# largest power-of-two chunk that stays within what tc=8/B=128/H=800
# demonstrably fits.
_CHUNK_BUDGET_ELEMS = 8 * 128 * 800


def _auto_time_chunk(b: int, h: int) -> int:
    tc = DEFAULT_TIME_CHUNK
    while tc > 1 and tc * b * h > _CHUNK_BUDGET_ELEMS:
        tc //= 2
    return tc

# Test hook: run kernels in the Pallas interpreter (CPU) for numerics
# checks without TPU hardware.
INTERPRET = False


def _gru_gates(xg, hg, h_prev):
    """PyTorch/cuDNN gate order [r, z, n]. All (2, B, 3H) -> h (2, B, H)."""
    xr, xz, xn = jnp.split(xg, 3, axis=-1)
    hr, hz, hn = jnp.split(hg, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h_prev, (r, z, n)


def _fwd_kernel(xg_ref, wh_ref, bh_ref, m_ref, out_ref, h_ref, *, time_chunk):
    n_dir = wh_ref.shape[0]  # 2 bidirectional, 1 unidirectional

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)

    bh = bh_ref[:].astype(jnp.float32)[:, None, :]

    def body(t, h_c):
        # h is a loop-carried SSA VALUE, not a scratch read/write per
        # step: ref round-trips put a memory dependency between the two
        # (otherwise independent) direction chains each iteration
        h = h_c.astype(jnp.float32)  # (D, B, H)
        hg = jnp.stack([
            jnp.dot(h_c[d], wh_ref[d], preferred_element_type=jnp.float32)
            for d in range(n_dir)
        ]) + bh
        xg = xg_ref[t].astype(jnp.float32)  # (D, B, 3H)
        h_new, _gates = _gru_gates(xg, hg, h)
        m = m_ref[t].astype(jnp.float32)[:, :, None]  # (D, B, 1)
        h_new = (m * h_new + (1.0 - m) * h).astype(h_ref.dtype)
        out_ref[t] = h_new.astype(out_ref.dtype)
        return h_new

    h_last = jax.lax.fori_loop(0, time_chunk, body, h_ref[:], unroll=True)
    h_ref[:] = h_last


def _bwd_kernel(xg_ref, wh_ref, bh_ref, m_ref, hprev_ref, dy_ref,
                dhg_ref, dh_ref, *, time_chunk):
    """Reverse-time chunk: consumes chunks in descending time order.

    hprev_ref[t] is h_{t-1} (the forward output shifted by one, h0=0).
    dh_ref (scratch) carries dL/dh_t flowing backward across chunks.
    Emits dhg[t] = gradient wrt the gate pre-activations hg_t, which is
    also the gradient wrt xg_t for the r/z gates and xn (see below).
    """

    n_dir = wh_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dh_ref[:] = jnp.zeros_like(dh_ref)

    def body(i, _):
        t = time_chunk - 1 - i
        h_prev = hprev_ref[t].astype(jnp.float32)  # (D, B, H)
        hg = jnp.stack([
            jnp.dot(hprev_ref[t, d], wh_ref[d],
                    preferred_element_type=jnp.float32)
            for d in range(n_dir)
        ]) + bh_ref[:].astype(jnp.float32)[:, None, :]
        xg = xg_ref[t].astype(jnp.float32)
        _, (r, z, n) = _gru_gates(xg, hg, h_prev)
        _, _, hn = jnp.split(hg, 3, axis=-1)

        dh = dh_ref[:].astype(jnp.float32) + dy_ref[t].astype(jnp.float32)
        m = m_ref[t].astype(jnp.float32)[:, :, None]  # (2, B, 1)

        # h = (1-z) n + z h_prev
        dn = dh * (1.0 - z)
        dz = dh * (h_prev - n)
        dh_direct = dh * z
        dn_pre = dn * (1.0 - n * n)
        dr = dn_pre * hn
        dhn = dn_pre * r
        dz_pre = dz * z * (1.0 - z)
        dr_pre = dr * r * (1.0 - r)
        dhg = jnp.concatenate([dr_pre, dz_pre, dhn], axis=-1)  # (2, B, 3H)
        dhg = dhg * m  # padded frames contribute nothing

        # chain into h_{t-1}: direct term + through the recurrent matmul
        # (contract on the gate axis — no transpose materialization)
        dims = (((1,), (1,)), ((), ()))
        dh_prev = jnp.stack([
            jax.lax.dot_general(dhg[d], wh_ref[d], dims,
                                preferred_element_type=jnp.float32)
            for d in range(n_dir)
        ]) + dh_direct * m
        # where masked, h passed through: dh flows to t-1 unchanged
        dh_ref[:] = (m * dh_prev + (1.0 - m) * dh).astype(dh_ref.dtype)

        # the xg and hg pre-activation grads share the r/z components;
        # pack [dr_pre, dz_pre, dn_pre, dhn] (4H) — dxg uses the first
        # three, dhg swaps dn_pre for dhn (the extra r factor)
        dhg_ref[t] = (
            jnp.concatenate([dr_pre, dz_pre, dn_pre, dhn], axis=-1) * m
        ).astype(dhg_ref.dtype)
        return 0

    jax.lax.fori_loop(0, time_chunk, body, 0, unroll=True)


def _pad_time(x, tc):
    t = x.shape[0]
    pad = (-t) % tc
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def bigru_pallas(xg, w_h, b_h, mask, time_chunk=None):
    """Fused bidirectional GRU time loop.

    Args:
      xg: (T, 2, B, 3H) input projections (x @ W_x + b_x), both
        directions (dir 1 already prefix-reversed).
      w_h: (2, H, 3H) recurrent weights, b_h: (2, 3H).
      mask: (T, 2, B) per-direction validity (dir 0: t < len; dir 1,
        flipped layout: t >= T - len).
    Returns:
      ys: (T, 2, B, H) hidden states (padded frames hold the carried h;
      callers re-mask outputs as the scan path does).
    """
    ys, _ = _bigru_fwd(xg, w_h, b_h, mask, time_chunk)
    return ys


def _bigru_fwd(xg, w_h, b_h, mask, time_chunk):
    t_orig, nd, b, g3 = xg.shape
    h = w_h.shape[1]
    if time_chunk is None:
        time_chunk = _auto_time_chunk(b, h)
    xg_p = _pad_time(xg, time_chunk)
    m_p = _pad_time(mask.astype(jnp.float32), time_chunk)
    t_pad = xg_p.shape[0]
    n_chunks = t_pad // time_chunk

    ys = pl.pallas_call(
        functools.partial(_fwd_kernel, time_chunk=time_chunk),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((time_chunk, nd, b, g3), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, h, g3), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, g3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((time_chunk, nd, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((time_chunk, nd, b, h), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, nd, b, h), xg.dtype),
        scratch_shapes=[pltpu.VMEM((nd, b, h), xg.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=INTERPRET,
    )(xg_p, w_h.astype(xg.dtype), b_h.astype(jnp.float32), m_p)

    ys = ys[:t_orig]
    return ys, (xg, w_h, b_h, mask, ys)


def _bigru_bwd(time_chunk, res, dy):
    xg, w_h, b_h, mask, ys = res
    t_orig, nd, b, g3 = xg.shape
    h = w_h.shape[1]
    if time_chunk is None:
        time_chunk = _auto_time_chunk(b, h)

    h_prev = jnp.concatenate([jnp.zeros_like(ys[:1]), ys[:-1]], axis=0)
    xg_p = _pad_time(xg, time_chunk)
    m_p = _pad_time(mask.astype(jnp.float32), time_chunk)
    hprev_p = _pad_time(h_prev, time_chunk)
    dy_p = _pad_time(dy.astype(xg.dtype), time_chunk)
    t_pad = xg_p.shape[0]
    n_chunks = t_pad // time_chunk
    rev = lambda i: (n_chunks - 1 - i, 0, 0, 0)  # noqa: E731
    rev2 = lambda i: (n_chunks - 1 - i, 0, 0)  # noqa: E731

    packed = pl.pallas_call(
        functools.partial(_bwd_kernel, time_chunk=time_chunk),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((time_chunk, nd, b, g3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, h, g3), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, g3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((time_chunk, nd, b), rev2, memory_space=pltpu.VMEM),
            pl.BlockSpec((time_chunk, nd, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((time_chunk, nd, b, h), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((time_chunk, nd, b, g3 + h), rev,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, nd, b, g3 + h), xg.dtype),
        scratch_shapes=[pltpu.VMEM((nd, b, h), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=INTERPRET,
    )(xg_p, w_h.astype(xg.dtype), b_h.astype(jnp.float32), m_p, hprev_p, dy_p)

    packed = packed[:t_orig]
    # [dr_pre, dz_pre, dn_pre, dhn] -> dxg = [dr,dz,dn_pre], dhg = [dr,dz,dhn]
    dxg = packed[..., :g3].astype(xg.dtype)
    dhg = jnp.concatenate(
        [packed[..., : 2 * h], packed[..., g3:]], axis=-1
    ).astype(jnp.float32)

    # weight/bias grads as big parallel MXU contractions
    dw = jnp.einsum("tdbh,tdbg->dhg", h_prev.astype(jnp.float32), dhg)
    db = jnp.sum(dhg, axis=(0, 2))
    return dxg, dw.astype(w_h.dtype), db.astype(b_h.dtype), None


bigru_pallas.defvjp(
    lambda xg, w_h, b_h, mask, tc: _bigru_fwd(xg, w_h, b_h, mask, tc),
    _bigru_bwd,
)


def bigru_reference(xg, w_h, b_h, mask):
    """lax.scan reference implementation (oracle for the kernel)."""
    dt = xg.dtype

    def step(h, inp):
        xg_t, m_t = inp  # m_t: (2, B)
        hg = (
            jnp.einsum("dbh,dhg->dbg", h, w_h.astype(dt),
                       preferred_element_type=jnp.float32)
            + b_h.astype(jnp.float32)[:, None, :]
        )
        h_new, _ = _gru_gates(xg_t.astype(jnp.float32), hg,
                              h.astype(jnp.float32))
        m = m_t.astype(jnp.float32)[:, :, None]
        h_new = m * h_new + (1.0 - m) * h.astype(jnp.float32)
        h_new = h_new.astype(dt)
        return h_new, h_new

    h0 = jnp.zeros((xg.shape[1], xg.shape[2], w_h.shape[1]), dt)
    _, ys = jax.lax.scan(step, h0, (xg, mask))
    return ys
