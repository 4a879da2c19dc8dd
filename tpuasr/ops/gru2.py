"""Pallas BiGRU v2: gate-major layout (no per-step relayouts).

The v1 kernel (tpuasr.ops.gru) computes a (B, 3H) gate matmul and then
splits at offsets H and 2H — with H=800 those cuts are not lane-tile
aligned (800 % 128 != 0), so Mosaic inserts relayout copies EVERY
timestep; measured ~10 us/step, no faster than lax.scan forward.

v2 keeps gates as separate (B, H) planes end to end:
  * recurrent weights laid out (2, 3, H, H) — one (B,H)@(H,H) MXU dot
    per gate per direction, outputs born separate;
  * input projections arrive gate-major (T, 2, 3, B, H), computed
    outside by one einsum;
  * gate math is pure elementwise on (B, H) tiles — zero
    concat/split/stack inside the time loop.

Same math, masks, and custom-VJP structure as v1 (PyTorch gate order
r, z, n; backward emits per-gate pre-activation grads, dW as one
outside einsum).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TIME_CHUNK = 8
VMEM_LIMIT = 100 * 1024 * 1024

INTERPRET = False


def _fwd_kernel(xg_ref, wh_ref, bh_ref, m_ref, out_ref, h_ref, *, time_chunk):
    # direction-count generic: 2 normally, 1 per shard under
    # direction-TP (model/ds2.py shard_map) or in RecurrentCore
    n_dir = xg_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_ref[:] = jnp.zeros_like(h_ref)

    def body(t, _):
        def gates(d):
            h = h_ref[d]  # (B, H)
            out = []
            for g in range(3):
                hg = jnp.dot(h, wh_ref[d, g],
                             preferred_element_type=jnp.float32)
                out.append(hg + bh_ref[d, g][None, :].astype(jnp.float32))
            return out  # [hr, hz, hn] each (B, H) f32

        new_h = []
        for d in range(n_dir):
            hr, hz, hn = gates(d)
            xr = xg_ref[t, d, 0].astype(jnp.float32)
            xz = xg_ref[t, d, 1].astype(jnp.float32)
            xn = xg_ref[t, d, 2].astype(jnp.float32)
            h_prev = h_ref[d].astype(jnp.float32)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h_prev
            m = m_ref[t, d][:, None].astype(jnp.float32)  # (B, 1)
            new_h.append(m * h_new + (1.0 - m) * h_prev)

        for d in range(n_dir):
            h_ref[d] = new_h[d].astype(h_ref.dtype)
            out_ref[t, d] = new_h[d].astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, time_chunk, body, 0, unroll=True)


def _bwd_kernel(xg_ref, wh_ref, bh_ref, m_ref, hprev_ref, dy_ref,
                dg_ref, dh_ref, *, time_chunk):
    """Reverse-time chunks; emits per-gate grads
    dg[t, d, 0..3] = [dxr(=dhr), dxz(=dhz), dxn, dhn]."""
    n_dir = xg_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dh_ref[:] = jnp.zeros_like(dh_ref)

    def body(i, _):
        t = time_chunk - 1 - i
        for d in range(n_dir):
            h_prev = hprev_ref[t, d].astype(jnp.float32)
            hr = jnp.dot(hprev_ref[t, d], wh_ref[d, 0],
                         preferred_element_type=jnp.float32) \
                + bh_ref[d, 0][None, :].astype(jnp.float32)
            hz = jnp.dot(hprev_ref[t, d], wh_ref[d, 1],
                         preferred_element_type=jnp.float32) \
                + bh_ref[d, 1][None, :].astype(jnp.float32)
            hn = jnp.dot(hprev_ref[t, d], wh_ref[d, 2],
                         preferred_element_type=jnp.float32) \
                + bh_ref[d, 2][None, :].astype(jnp.float32)
            xr = xg_ref[t, d, 0].astype(jnp.float32)
            xz = xg_ref[t, d, 1].astype(jnp.float32)
            xn = xg_ref[t, d, 2].astype(jnp.float32)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)

            dh = dh_ref[d].astype(jnp.float32) + dy_ref[t, d].astype(
                jnp.float32
            )
            m = m_ref[t, d][:, None].astype(jnp.float32)

            dn = dh * (1.0 - z)
            dz = dh * (h_prev - n)
            dn_pre = dn * (1.0 - n * n)
            dr = dn_pre * hn
            dhn = dn_pre * r
            dz_pre = dz * z * (1.0 - z)
            dr_pre = dr * r * (1.0 - r)
            dr_pre = dr_pre * m
            dz_pre = dz_pre * m
            dn_pre = dn_pre * m
            dhn = dhn * m

            dims = (((1,), (1,)), ((), ()))
            dh_prev = (
                jax.lax.dot_general(dr_pre, wh_ref[d, 0], dims,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(dz_pre, wh_ref[d, 1], dims,
                                      preferred_element_type=jnp.float32)
                + jax.lax.dot_general(dhn, wh_ref[d, 2], dims,
                                      preferred_element_type=jnp.float32)
                + dh * z * m
            )
            dh_ref[d] = (m * dh_prev + (1.0 - m) * dh).astype(dh_ref.dtype)

            dg_ref[t, d, 0] = dr_pre.astype(dg_ref.dtype)
            dg_ref[t, d, 1] = dz_pre.astype(dg_ref.dtype)
            dg_ref[t, d, 2] = dn_pre.astype(dg_ref.dtype)
            dg_ref[t, d, 3] = dhn.astype(dg_ref.dtype)
        return 0

    jax.lax.fori_loop(0, time_chunk, body, 0, unroll=True)


def _pad_time(x, tc, fill=0.0):
    t = x.shape[0]
    pad = (-t) % tc
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                    constant_values=fill)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def bigru_pallas2(xg, w_h, b_h, mask, time_chunk=DEFAULT_TIME_CHUNK):
    """Gate-major fused BiGRU.

    Args:
      xg: (T, 2, 3, B, H) gate-major input projections.
      w_h: (2, 3, H, H); b_h: (2, 3, H).
      mask: (T, 2, B) per-direction validity.
    Returns:
      ys: (T, 2, B, H).
    """
    ys, _ = _fwd(xg, w_h, b_h, mask, time_chunk)
    return ys


def _fwd(xg, w_h, b_h, mask, time_chunk):
    t_orig, n_dir, _, b, h = xg.shape
    xg_p = _pad_time(xg, time_chunk)
    m_p = _pad_time(mask.astype(jnp.float32), time_chunk)
    t_pad = xg_p.shape[0]
    n_chunks = t_pad // time_chunk

    ys = pl.pallas_call(
        functools.partial(_fwd_kernel, time_chunk=time_chunk),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((time_chunk, n_dir, 3, b, h),
                         lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_dir, 3, h, h), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_dir, 3, h), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((time_chunk, n_dir, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((time_chunk, n_dir, b, h),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, n_dir, b, h), xg.dtype),
        scratch_shapes=[pltpu.VMEM((n_dir, b, h), xg.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=INTERPRET,
    )(xg_p, w_h.astype(xg.dtype), b_h.astype(jnp.float32), m_p)
    ys = ys[:t_orig]
    return ys, (xg, w_h, b_h, mask, ys)


def _bwd(time_chunk, res, dy):
    xg, w_h, b_h, mask, ys = res
    t_orig, n_dir, _, b, h = xg.shape

    h_prev = jnp.concatenate([jnp.zeros_like(ys[:1]), ys[:-1]], axis=0)
    xg_p = _pad_time(xg, time_chunk)
    m_p = _pad_time(mask.astype(jnp.float32), time_chunk)
    hprev_p = _pad_time(h_prev, time_chunk)
    dy_p = _pad_time(dy.astype(xg.dtype), time_chunk)
    t_pad = xg_p.shape[0]
    n_chunks = t_pad // time_chunk
    rev5 = lambda i: (n_chunks - 1 - i, 0, 0, 0, 0)  # noqa: E731
    rev4 = lambda i: (n_chunks - 1 - i, 0, 0, 0)  # noqa: E731
    rev3 = lambda i: (n_chunks - 1 - i, 0, 0)  # noqa: E731

    dg = pl.pallas_call(
        functools.partial(_bwd_kernel, time_chunk=time_chunk),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((time_chunk, n_dir, 3, b, h), rev5,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_dir, 3, h, h), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_dir, 3, h), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((time_chunk, n_dir, b), rev3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((time_chunk, n_dir, b, h), rev4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((time_chunk, n_dir, b, h), rev4,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((time_chunk, n_dir, 4, b, h), rev5,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, n_dir, 4, b, h), xg.dtype),
        scratch_shapes=[pltpu.VMEM((n_dir, b, h), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=INTERPRET,
    )(xg_p, w_h.astype(xg.dtype), b_h.astype(jnp.float32), m_p, hprev_p,
      dy_p)

    dg = dg[:t_orig].astype(jnp.float32)
    dxg = dg[:, :, :3]  # (T, 2, 3, B, H)
    # dhg for the weight grad: [dr_pre, dz_pre, dhn]
    dhg = jnp.stack([dg[:, :, 0], dg[:, :, 1], dg[:, :, 3]], axis=2)
    dw = jnp.einsum("tdbh,tdgbk->dghk", h_prev.astype(jnp.float32), dhg)
    db = jnp.sum(dhg, axis=(0, 3))
    return (dxg.astype(xg.dtype), dw.astype(w_h.dtype), db.astype(b_h.dtype),
            None)


bigru_pallas2.defvjp(lambda *a: _fwd(*a), _bwd)
