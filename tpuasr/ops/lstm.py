"""Pallas TPU kernel: fused bidirectional LSTM time loop.

Same design as the fused BiGRU kernel (tpuasr/ops/gru.py — see its
docstring for the VMEM-residency rationale; reference parity: the
cuDNN LSTM path of ref:model.py BatchRNN, SURVEY.md §3.2 row
"cuDNN RNN"): input projections stay outside as one big MXU matmul,
the kernel runs the serial time loop with weights AND the (h, c)
carries resident in VMEM, grid steps over time chunks.

LSTM specifics vs GRU:
  * two carries (h, c); padded frames pass BOTH through unchanged.
  * the cell-state sequence is a second kernel output — backward
    needs c_{t-1} and tanh(c_t) per step and recomputing them would
    re-run the whole forward.
  * the gate pre-activation gradient is the SAME for the x- and
    h-projections (dxg == dhg) — the backward kernel emits one (4H)
    gradient block, no GRU-style r-gate asymmetry.

Gate order follows the PyTorch/cuDNN convention [i, f, g, o]
(tpuasr.compat imports reference LSTM checkpoints in this layout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuasr.ops.gru import VMEM_LIMIT, _pad_time

DEFAULT_TIME_CHUNK = 8
# Same budget logic as ops/gru.py, but LSTM streams 4H gate windows
# plus two extra (tc, 2, B, H) state windows in backward — ~4/3 the
# GRU's per-chunk bytes, so 3/4 of its demonstrated-safe budget.
_CHUNK_BUDGET_ELEMS = 6 * 128 * 800

# Test hook: run kernels in the Pallas interpreter (CPU).
INTERPRET = False


def _auto_time_chunk(b: int, h: int) -> int:
    tc = DEFAULT_TIME_CHUNK
    while tc > 1 and tc * b * h > _CHUNK_BUDGET_ELEMS:
        tc //= 2
    return tc


def _lstm_gates(xg, hg):
    """PyTorch/cuDNN gate order [i, f, g, o]; all (2, B, 4H) f32."""
    xi, xf, xc, xo = jnp.split(xg, 4, axis=-1)
    hi, hf, hc, ho = jnp.split(hg, 4, axis=-1)
    i = jax.nn.sigmoid(xi + hi)
    f = jax.nn.sigmoid(xf + hf)
    g = jnp.tanh(xc + hc)
    o = jax.nn.sigmoid(xo + ho)
    return i, f, g, o


def _fwd_kernel(xg_ref, wh_ref, bh_ref, m_ref, out_ref, cseq_ref,
                h_ref, c_ref, *, time_chunk):
    n_dir = wh_ref.shape[0]  # 2 bidirectional, 1 unidirectional

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    def body(t, _):
        h = h_ref[:].astype(jnp.float32)  # (2, B, H)
        c = c_ref[:].astype(jnp.float32)
        hg = jnp.stack([
            jnp.dot(h_ref[d], wh_ref[d], preferred_element_type=jnp.float32)
            for d in range(n_dir)
        ]) + bh_ref[:].astype(jnp.float32)[:, None, :]
        xg = xg_ref[t].astype(jnp.float32)  # (2, B, 4H)
        i, f, g, o = _lstm_gates(xg, hg)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        m = m_ref[t].astype(jnp.float32)[:, :, None]  # (2, B, 1)
        h_new = m * h_new + (1.0 - m) * h
        c_new = m * c_new + (1.0 - m) * c
        h_ref[:] = h_new.astype(h_ref.dtype)
        c_ref[:] = c_new.astype(c_ref.dtype)
        out_ref[t] = h_new.astype(out_ref.dtype)
        cseq_ref[t] = c_new.astype(cseq_ref.dtype)
        return 0

    jax.lax.fori_loop(0, time_chunk, body, 0, unroll=True)


def _bwd_kernel(xg_ref, wh_ref, bh_ref, m_ref, hprev_ref, cprev_ref,
                cseq_ref, dy_ref, dhg_ref, dh_ref, dc_ref, *, time_chunk):
    """Reverse-time chunk (descending chunk order; see gru.py).
    Emits dhg[t] = gradient wrt gate pre-activations (== dxg[t])."""

    n_dir = wh_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)

    def body(idx, _):
        t = time_chunk - 1 - idx
        h_prev = hprev_ref[t].astype(jnp.float32)
        c_prev = cprev_ref[t].astype(jnp.float32)
        hg = jnp.stack([
            jnp.dot(hprev_ref[t, d], wh_ref[d],
                    preferred_element_type=jnp.float32)
            for d in range(n_dir)
        ]) + bh_ref[:].astype(jnp.float32)[:, None, :]
        xg = xg_ref[t].astype(jnp.float32)
        i, f, g, o = _lstm_gates(xg, hg)
        tc_t = jnp.tanh(cseq_ref[t].astype(jnp.float32))

        m = m_ref[t].astype(jnp.float32)[:, :, None]  # (2, B, 1)
        dh = dh_ref[:].astype(jnp.float32) + dy_ref[t].astype(jnp.float32)
        dc_in = dc_ref[:].astype(jnp.float32)

        # h = o * tanh(c);  c = f c_prev + i g   (valid frames)
        do = dh * tc_t
        dct = dc_in + dh * o * (1.0 - tc_t * tc_t)
        di = dct * g
        df = dct * c_prev
        dg = dct * i
        dc_prev = dct * f
        di_pre = di * i * (1.0 - i)
        df_pre = df * f * (1.0 - f)
        dg_pre = dg * (1.0 - g * g)
        do_pre = do * o * (1.0 - o)
        dhg = jnp.concatenate([di_pre, df_pre, dg_pre, do_pre], axis=-1)
        dhg = dhg * m

        dims = (((1,), (1,)), ((), ()))
        dh_prev = jnp.stack([
            jax.lax.dot_general(dhg[d], wh_ref[d], dims,
                                preferred_element_type=jnp.float32)
            for d in range(n_dir)
        ])
        # masked frames pass h and c straight through: gradients flow
        # to t-1 unchanged there
        dh_ref[:] = (m * dh_prev + (1.0 - m) * dh).astype(dh_ref.dtype)
        dc_ref[:] = (m * dc_prev + (1.0 - m) * dc_in).astype(dc_ref.dtype)
        dhg_ref[t] = dhg.astype(dhg_ref.dtype)
        return 0

    jax.lax.fori_loop(0, time_chunk, body, 0, unroll=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def bilstm_pallas(xg, w_h, b_h, mask, time_chunk=None):
    """Fused bidirectional LSTM time loop.

    Args:
      xg: (T, 2, B, 4H) input projections (x @ W_x + b_x), dir 1
        prefix-reversed (same contract as bigru_pallas).
      w_h: (2, H, 4H) recurrent weights, b_h: (2, 4H).
      mask: (T, 2, B) per-direction validity.
    Returns:
      ys: (T, 2, B, H) hidden states.
    """
    ys, _ = _bilstm_fwd(xg, w_h, b_h, mask, time_chunk)
    return ys


def _bilstm_fwd(xg, w_h, b_h, mask, time_chunk):
    t_orig, nd, b, g4 = xg.shape
    h = w_h.shape[1]
    if time_chunk is None:
        time_chunk = _auto_time_chunk(b, h)
    xg_p = _pad_time(xg, time_chunk)
    m_p = _pad_time(mask.astype(jnp.float32), time_chunk)
    t_pad = xg_p.shape[0]
    n_chunks = t_pad // time_chunk

    ys, cs = pl.pallas_call(
        functools.partial(_fwd_kernel, time_chunk=time_chunk),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((time_chunk, nd, b, g4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, h, g4), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, g4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((time_chunk, nd, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((time_chunk, nd, b, h), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((time_chunk, nd, b, h), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_pad, nd, b, h), xg.dtype),
            # cell sequence in compute dtype (the in-kernel carry stays
            # f32; this is only the backward's recompute input)
            jax.ShapeDtypeStruct((t_pad, nd, b, h), xg.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((nd, b, h), xg.dtype),
            pltpu.VMEM((nd, b, h), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=INTERPRET,
    )(xg_p, w_h.astype(xg.dtype), b_h.astype(jnp.float32), m_p)

    ys = ys[:t_orig]
    return ys, (xg, w_h, b_h, mask, ys, cs[:t_orig])


def _bilstm_bwd(time_chunk, res, dy):
    xg, w_h, b_h, mask, ys, cs = res
    t_orig, nd, b, g4 = xg.shape
    h = w_h.shape[1]
    if time_chunk is None:
        time_chunk = _auto_time_chunk(b, h)

    h_prev = jnp.concatenate([jnp.zeros_like(ys[:1]), ys[:-1]], axis=0)
    c_prev = jnp.concatenate([jnp.zeros_like(cs[:1]), cs[:-1]], axis=0)
    xg_p = _pad_time(xg, time_chunk)
    m_p = _pad_time(mask.astype(jnp.float32), time_chunk)
    hprev_p = _pad_time(h_prev, time_chunk)
    cprev_p = _pad_time(c_prev, time_chunk)
    cs_p = _pad_time(cs, time_chunk)
    dy_p = _pad_time(dy.astype(xg.dtype), time_chunk)
    t_pad = xg_p.shape[0]
    n_chunks = t_pad // time_chunk
    rev4 = lambda i: (n_chunks - 1 - i, 0, 0, 0)  # noqa: E731
    rev3 = lambda i: (n_chunks - 1 - i, 0, 0)  # noqa: E731

    dhg = pl.pallas_call(
        functools.partial(_bwd_kernel, time_chunk=time_chunk),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((time_chunk, nd, b, g4), rev4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, h, g4), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nd, g4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((time_chunk, nd, b), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((time_chunk, nd, b, h), rev4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((time_chunk, nd, b, h), rev4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((time_chunk, nd, b, h), rev4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((time_chunk, nd, b, h), rev4,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((time_chunk, nd, b, g4), rev4,
                               memory_space=pltpu.VMEM),
        # dhg streams out in the compute dtype (bf16 in training) like
        # the GRU kernel — an f32 window here doubles the dominant
        # VMEM allocation and OOMs at B=128
        out_shape=jax.ShapeDtypeStruct((t_pad, nd, b, g4), xg.dtype),
        scratch_shapes=[
            pltpu.VMEM((nd, b, h), jnp.float32),
            pltpu.VMEM((nd, b, h), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=INTERPRET,
    )(xg_p, w_h.astype(xg.dtype), b_h.astype(jnp.float32), m_p,
      hprev_p, cprev_p, cs_p, dy_p)

    dhg = dhg[:t_orig]
    dxg = dhg  # dxg == dhg for LSTM (same pre-activation gradients)
    dhg_f32 = dhg.astype(jnp.float32)
    dw = jnp.einsum("tdbh,tdbg->dhg", h_prev.astype(jnp.float32), dhg_f32)
    db = jnp.sum(dhg_f32, axis=(0, 2))
    return dxg, dw.astype(w_h.dtype), db.astype(b_h.dtype), None


bilstm_pallas.defvjp(
    lambda xg, w_h, b_h, mask, tc: _bilstm_fwd(xg, w_h, b_h, mask, tc),
    _bilstm_bwd,
)


def bilstm_reference(xg, w_h, b_h, mask):
    """lax.scan reference implementation (oracle for the kernel)."""
    dt = xg.dtype

    def step(carry, inp):
        h, c = carry
        xg_t, m_t = inp
        hg = (
            jnp.einsum("dbh,dhg->dbg", h, w_h.astype(dt),
                       preferred_element_type=jnp.float32)
            + b_h.astype(jnp.float32)[:, None, :]
        )
        i, f, g, o = _lstm_gates(xg_t.astype(jnp.float32), hg)
        c_new = f * c.astype(jnp.float32) + i * g
        h_new = o * jnp.tanh(c_new)
        m = m_t.astype(jnp.float32)[:, :, None]
        h_new = m * h_new + (1.0 - m) * h.astype(jnp.float32)
        c_new = m * c_new + (1.0 - m) * c.astype(jnp.float32)
        return (h_new.astype(dt), c_new.astype(jnp.float32)), h_new.astype(dt)

    b, h = xg.shape[2], w_h.shape[1]
    h0 = jnp.zeros((xg.shape[1], b, h), dt)
    c0 = jnp.zeros((xg.shape[1], b, h), jnp.float32)
    (_, _), ys = jax.lax.scan(step, (h0, c0), (xg, mask))
    return ys
