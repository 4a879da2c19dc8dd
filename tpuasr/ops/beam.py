"""Pallas TPU kernel: fused CTC prefix beam-search scan (no-LM path).

Why: the XLA device beam (tpuasr/decode/beam.py) is serial-latency
bound — each lax.scan frame issues ~dozens of tiny VPU ops with
inter-op overhead, measured ~0.55 ms/frame at B=32/W=10 (BASELINE.md
round 2). The entire per-frame state is a handful of (B, W) vectors,
so the whole time loop fits in one Pallas kernel with the beam state
resident in VMEM scratch — the same structure as the fused BiGRU
kernel (tpuasr/ops/gru.py): grid over time chunks (TPU grid steps run
sequentially on a core), no HBM round-trips except streaming the
per-frame log-probs in and the backpointers out.

Semantics: EXACTLY the XLA implementation's algorithm (Hannun prefix
beam search with exact stay<->extend absorption dedup and ctcdecode
cutoff pruning — see decode/beam.py for the derivation), including
`cutoff_top_n` / `cutoff_prob` / `prune_logp`, re-expressed without
top_k/argsort/gather (unsupported or slow in Mosaic):
  * candidate rank     = count of strictly-better (lp, index) pairs
    (a (B, C, C) comparison mask — C is tiny),
  * cutoff_prob        = exclusive better-ranked probability mass
    < cutoff_prob (equivalent to XLA's cumsum+count form),
  * pool top-W         = W unrolled iterations of (max, first-index,
    one-hot select, mask-out) — identical tie-breaking to lax.top_k
    (lowest flat index wins),
  * every gather       = one-hot mask + lane reduction.

LM fusion runs IN-KERNEL for both modes when the tables are small
enough (decode/beam.py gates and picks the implementation): char-LM
via a dense per-context score table (order <= 3; bit-packed contexts,
two-hot bf16 hi/lo MXU lookup), word-LM via full-table-compare probes
with the per-beam word state (rolling hash, completed-word ring,
partial length) held as 2D VMEM planes. Large-vocabulary word LMs
stay on the XLA hash-probe path.

STATEFUL (streaming) mode: pass ``state=``/``return_state=True`` and
the beam state rides in/out as kernel refs instead of scratch init —
chunked calls are bit-identical to one batch call over the
concatenation (the recursion has no lookahead), which is what the
device-resident incremental serving beam builds on
(decode/device_stream.py).

Reference parity: ctcdecode C++ beam decoder (SURVEY.md §3.2,
ref:decoder.py BeamCTCDecoder).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Shared with the XLA implementation: the kernel's exact-parity
# contract (tests compare scores to 1e-5) requires identical hash
# constants, the same NEG floor, and the same clamped logsumexp —
# import rather than duplicate so they cannot drift. (decode.beam
# imports THIS module only lazily inside functions; no cycle.)
from tpuasr.decode.beam import (  # noqa: E402
    BOS_TOK, NEG, PAD_TOK, UNK_TOK, WORD_OOV_NAT, _M1, _M2, _fmix32,
    _lse, _mix32,
)

DEFAULT_TIME_CHUNK = 8
VMEM_LIMIT = 100 * 1024 * 1024
# Max rows per wide-table kernel input ref (28 MiB at 14*256 bf16
# lanes). Round 3 saw the remote compile service die on one 14 MiB
# monolithic table input, but the round-4 minimal repro
# (scripts/wide_lm_repro.py, run on-chip 2026-08-19) compiles 512..4096
# row single-table kernels cleanly — the kill was environmental, not a
# size rule — so 262144-cap orders (2048 rows) ride as ONE ref again
# (chunked probes measured ~36% slower at 131072 caps). Chunking stays
# for anything beyond 4096 rows. Tests shrink this to exercise
# multi-chunk probes.
MAX_WIDE_ROWS_PER_REF = 4096

# Test hook: run the kernel in the Pallas interpreter (CPU).
INTERPRET = False


# Char-LM contexts are bit-packed 6 bits per char (class ids < 64):
# the rolling-context update is then a pure shift/or/and — Mosaic has
# no integer mod-by-non-power-of-two, which a base-C encoding needs.
CTX_SHIFT = 6


def _beam_kernel(lp_ref, len_ref, *rest, time_chunk, beam_width,
                 blank_id, cutoff_top_n, cutoff_prob, prune_logp,
                 char_lm=False, word_lm=False, word_wide=False,
                 wide_caps=(), wide_chunks=(), wide_salts=(),
                 n_probes=8, w_order=0,
                 ring_len=0, alpha=0.0, beta=0.0, space_id=None,
                 ctx_len=0, time_unroll=True, n_state=0):
    rest = list(rest)
    if char_lm:
        lmtab_ref = rest.pop(0)
        ctx_mask = (1 << (CTX_SHIFT * ctx_len)) - 1
        # the table arrives as stacked bf16 (hi; lo) halves: a plain
        # f32 table loses ~8 mantissa bits through the MXU (bf16
        # truncation flips near-tie beams — measured score drift up to
        # 7.7 vs the XLA path); looking up hi and lo in ONE dot via a
        # two-hot row vector recovers f32-accurate scores
        r_num = lmtab_ref.shape[0] // 2
    if word_lm and word_wide:
        # per-order (R_k, WIDE_PLANES*256) bf16 block-fetch matrix,
        # split into wide_chunks[k] row-chunk refs of
        # <= MAX_WIDE_ROWS_PER_REF rows each (one ref per order up to
        # 524288-cap; the probe sums per-chunk fetches, same math)
        wtabs = [[rest.pop(0) for _ in range(wide_chunks[k])]
                 for k in range(w_order)]
    elif word_lm:
        # per-order (1, cap) rows: keys1, keys2, logps, backoffs
        wtabs = [tuple(rest.pop(0) for _ in range(4))
                 for _ in range(w_order)]
    # stateful (streaming) calls pass the carried beam state as extra
    # inputs (after the tables) and emit the updated state as extra
    # outputs (after scores) — ref order matches the scratch order
    state_in = [rest.pop(0) for _ in range(n_state)]
    (parents_ref, chars_ref, scores_ref) = rest[:3]
    rest = rest[3:]
    state_out = [rest.pop(0) for _ in range(n_state)]
    (pb_ref, pnb_ref, h1_ref, h2_ref, last_ref) = rest[:5]
    rest = rest[5:]
    if char_lm or word_lm:
        lm_ref = rest.pop(0)
    if char_lm:
        ctx_ref = rest.pop(0)
    if word_lm:
        wh1_ref, wh2_ref, wlen_ref = rest.pop(0), rest.pop(0), rest.pop(0)
        wc1_refs = [rest.pop(0) for _ in range(ring_len)]
        wc2_refs = [rest.pop(0) for _ in range(ring_len)]
    w = beam_width
    b, c_num = lp_ref.shape[1], lp_ref.shape[2]
    pool = w + w * c_num

    def _wprobe(k, q1, q2):
        """Full-table probe of order-k word tables with (B, W) query
        hash pairs: per-beam (B, cap) compares replace the XLA path's
        serial gathers (Mosaic has none). Open addressing stores a key
        once, so the masked sums extract the unique hit; empty (0,0)
        slots are excluded (a (0,0) query only arises for the empty
        partial word, whose score is never used)."""
        k1r, k2r, lpr, bor = wtabs[k]
        nonempty = (k1r[:] != 0) | (k2r[:] != 0)  # (1, cap)
        f_cols, v_cols, b_cols = [], [], []
        for j in range(w):
            hit = ((k1r[:] == q1[:, j:j + 1])
                   & (k2r[:] == q2[:, j:j + 1]) & nonempty)  # (B, cap)
            # boolean any-reductions over sub-128-lane tiles hit an
            # unsupported i1 vreg cast in Mosaic — count in f32 instead
            hitf = jnp.where(hit, 1.0, 0.0)
            f_cols.append(jnp.sum(hitf, axis=1, keepdims=True))
            v_cols.append(jnp.sum(hitf * lpr[:], axis=1, keepdims=True))
            b_cols.append(jnp.sum(hitf * bor[:], axis=1, keepdims=True))
        found = jnp.concatenate(f_cols, axis=1) > 0.0  # (B, W)
        val = jnp.where(found, jnp.concatenate(v_cols, axis=1), NEG)
        bo = jnp.concatenate(b_cols, axis=1)
        return found, val, bo

    def _wprobe_wide(k, q1, q2):
        """Large-table probe: fetch each query's 8-slot linear-probe
        window with ONE one-hot MXU matmul over the block-fetch matrix
        (decode.beam.WideTables), then compare the 4+4 key byte planes
        per lane. Same slots as the XLA `_probe` (identical layout and
        pow2 cap), so found/val/bo match it; logp/backoff reconstruct
        from 3-way bf16 splits (~2^-24 relative)."""
        # Mosaic layout rule learned on-chip: NEVER concatenate raw
        # (B, 1) column slices along the sublane axis — slice j keeps
        # lane offset {0,j} and tpu.concatenate requires equal offsets
        # on the non-concat dim ("result/input offset mismatch",
        # regardless of B). Every sublane concat below therefore takes
        # full-width (B, lanes) blocks whose (B, 1) operands were
        # broadcast INSIDE the block (broadcasts normalize the
        # offset); (W*B, 1) -> (B, W) goes back via lane-axis concats
        # of offset-clean sublane slices (b is a multiple of 8 —
        # decode.beam pads ragged batches).
        chunks = wtabs[k]  # list of (R_p, 14*256) bf16 row-chunks
        cap = wide_caps[k]
        salt = wide_salts[k] if wide_salts else 0
        lanes = 256
        # home slot: MUST match decode.beam._home / _np_home (the
        # packer's placement) bit for bit — salt 0 is h1 % cap, a
        # nonzero salt re-mixes the query hash through the
        # full-avalanche fmix32 finalizer first (salted packing avoids
        # capacity doubling on home clusters, incl. high-bit-only ones)
        qh = _fmix32(q1 ^ jnp.uint32(salt)) if salt else q1
        slot = qh & jnp.uint32(cap - 1)  # (B, W)
        as_i32 = lambda u: jax.lax.bitcast_convert_type(u, jnp.int32)  # noqa: E731
        row = as_i32(slot >> jnp.uint32(7))
        off = as_i32(slot & jnp.uint32(127))
        # A query's row lives in exactly one chunk: the per-chunk
        # one-hot is zero elsewhere, so summing the per-chunk fetches
        # reconstructs the single-matrix fetch exactly (same FLOPs —
        # the one big matmul is just evaluated as its row blocks).
        fetched = None
        r_base = 0
        for tab in chunks:
            r_p = tab.shape[0]
            iota_r = jax.lax.broadcasted_iota(jnp.int32, (b, r_p), 1) \
                + r_base
            oh = jnp.concatenate(
                [(row[:, j:j + 1] == iota_r).astype(jnp.bfloat16)
                 for j in range(w)],
                axis=0,
            )  # (W*B, R_p) — beams stacked on the sublane axis
            part = jnp.dot(oh, tab[:],
                           preferred_element_type=jnp.float32)  # (W*B, 14L)
            fetched = part if fetched is None else fetched + part
            r_base += r_p
        planes = [fetched[:, p * lanes:(p + 1) * lanes] for p in range(14)]

        lane_b = jax.lax.broadcasted_iota(jnp.int32, (b, lanes), 1)
        hit = jnp.concatenate(
            [(lane_b >= off[:, j:j + 1])
             & (lane_b < off[:, j:j + 1] + n_probes) for j in range(w)],
            axis=0,
        )  # (W*B, lanes)
        for i in range(4):
            qb1 = as_i32((q1 >> jnp.uint32(8 * i)) & jnp.uint32(0xFF)
                         ).astype(jnp.float32)  # (B, W)
            qb2 = as_i32((q2 >> jnp.uint32(8 * i)) & jnp.uint32(0xFF)
                         ).astype(jnp.float32)
            hit = hit & jnp.concatenate(
                [(planes[i][j * b:(j + 1) * b] == qb1[:, j:j + 1])
                 & (planes[4 + i][j * b:(j + 1) * b] == qb2[:, j:j + 1])
                 for j in range(w)],
                axis=0,
            )
        # empty slots have all-zero key bytes (byte planes are >= 0)
        nz = (planes[0] + planes[1] + planes[2] + planes[3]
              + planes[4] + planes[5] + planes[6] + planes[7]) > 0.0
        hitf = jnp.where(hit & nz, 1.0, 0.0)
        lp_sum = planes[8] + planes[9] + planes[10]
        bo_sum = planes[11] + planes[12] + planes[13]
        f_flat = jnp.sum(hitf, axis=1, keepdims=True)  # (W*B, 1)
        v_flat = jnp.sum(hitf * lp_sum, axis=1, keepdims=True)
        b_flat = jnp.sum(hitf * bo_sum, axis=1, keepdims=True)

        def unstack(x):  # (W*B, 1) -> (B, W)
            return jnp.concatenate(
                [x[j * b:(j + 1) * b] for j in range(w)], axis=1
            )

        found = unstack(f_flat) > 0.0
        val = jnp.where(found, unstack(v_flat), NEG)
        return found, val, unstack(b_flat)

    if word_wide:
        _wprobe = _wprobe_wide  # noqa: F811 — swap the probe impl

    def _wfold(pairs):
        H1 = jnp.zeros((b, w), jnp.uint32)
        H2 = jnp.zeros((b, w), jnp.uint32)
        for t1, t2 in pairs:
            H1 = _mix32(H1, t1, jnp.uint32(_M1))
            H2 = _mix32(H2, t2, jnp.uint32(_M2))
        return H1, H2

    def _wscore(wh1, wh2, wc1s, wc2s):
        """(B, W) word-LM scores + effective token hashes — the
        in-kernel mirror of decode.beam._word_lm_score (wlen > 0
        gating happens at the call sites, as in the XLA path)."""
        uf, _, _ = _wprobe(0, *_wfold([(wh1, wh2)]))
        eff1 = jnp.where(uf, wh1, jnp.uint32(UNK_TOK[0]))
        eff2 = jnp.where(uf, wh2, jnp.uint32(UNK_TOK[1]))
        score = jnp.zeros((b, w), jnp.float32)
        resolved = jnp.zeros((b, w), bool)
        bo_acc = jnp.zeros((b, w), jnp.float32)
        for m in range(min(w_order - 1, ring_len), -1, -1):
            ctx_pairs = [(wc1s[ring_len - m + i], wc2s[ring_len - m + i])
                         for i in range(m)]
            kh1, kh2 = _wfold(ctx_pairs + [(eff1, eff2)])
            f, v, _ = _wprobe(m, kh1, kh2)
            score = jnp.where(f & ~resolved, bo_acc + v, score)
            resolved = resolved | f
            if m > 0:
                bf, _, bbo = _wprobe(m - 1, *_wfold(ctx_pairs))
                bo_acc = jnp.where(
                    resolved, bo_acc, bo_acc + jnp.where(bf, bbo, 0.0)
                )
        score = jnp.where(resolved, score, bo_acc + WORD_OOV_NAT)
        return score, eff1, eff2

    # scratch refs in the canonical state order (the stateful in/out
    # refs, make_beam_state, and this list MUST all agree)
    scratch_refs = [pb_ref, pnb_ref, h1_ref, h2_ref, last_ref]
    if char_lm or word_lm:
        scratch_refs.append(lm_ref)
    if char_lm:
        scratch_refs.append(ctx_ref)
    if word_lm:
        scratch_refs += [wh1_ref, wh2_ref, wlen_ref]
        scratch_refs += wc1_refs + wc2_refs

    @pl.when(pl.program_id(0) == 0)
    def _init():
        if n_state:
            # streaming: resume from the carried state of the previous
            # chunk — chunked calls then reproduce the batch scan
            # exactly (the time recursion has no lookahead)
            for dst, src in zip(scratch_refs, state_in):
                dst[:] = src[:]
            return
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)
        pb_ref[:] = jnp.where(w_iota == 0, 0.0, NEG).astype(jnp.float32)
        pnb_ref[:] = jnp.full((b, w), NEG, jnp.float32)
        # distinct initial hashes so empty duplicates don't merge;
        # beam 0 (the live empty prefix) hashes to 0
        h0 = jax.lax.broadcasted_iota(jnp.uint32, (b, w), 1)
        h0 = jnp.where(h0 == 0, jnp.uint32(0), h0 + 1)
        h1_ref[:] = h0
        h2_ref[:] = h0
        last_ref[:] = jnp.full((b, w), -1, jnp.int32)
        if char_lm or word_lm:
            lm_ref[:] = jnp.zeros((b, w), jnp.float32)
        if char_lm:
            ctx_ref[:] = jnp.zeros((b, w), jnp.int32)
        if word_lm:
            wh1_ref[:] = jnp.zeros((b, w), jnp.uint32)
            wh2_ref[:] = jnp.zeros((b, w), jnp.uint32)
            wlen_ref[:] = jnp.zeros((b, w), jnp.int32)
            for k in range(ring_len):
                # host context starts at (<s>,): BOS is the newest slot
                if k == ring_len - 1:
                    wc1_refs[k][:] = jnp.full((b, w), BOS_TOK[0], jnp.uint32)
                    wc2_refs[k][:] = jnp.full((b, w), BOS_TOK[1], jnp.uint32)
                else:
                    wc1_refs[k][:] = jnp.full((b, w), PAD_TOK[0], jnp.uint32)
                    wc2_refs[k][:] = jnp.full((b, w), PAD_TOK[1], jnp.uint32)

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (b, c_num), 1)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (b, pool), 1)
    # bound OUTSIDE the fori_loop: program_id must bind in the kernel's
    # top-level jaxpr (both for Mosaic and the interpreter)
    t_base = pl.program_id(0) * time_chunk

    if char_lm:
        iota_2r = jax.lax.broadcasted_iota(jnp.int32, (b, 2 * r_num), 1)

    def body(i, _):
        t = t_base + i
        lp = lp_ref[i].astype(jnp.float32)  # (B, C)
        pb, pnb = pb_ref[:], pnb_ref[:]
        h1, h2 = h1_ref[:], h2_ref[:]
        last = last_ref[:]
        if char_lm or word_lm:
            lm = lm_ref[:]
        if char_lm:
            ctx = ctx_ref[:]
        if word_lm:
            wh1, wh2, wlen = wh1_ref[:], wh2_ref[:], wlen_ref[:]
            wc1s = [r[:] for r in wc1_refs]
            wc2s = [r[:] for r in wc2_refs]
            wscore, weff1, weff2 = _wscore(wh1, wh2, wc1s, wc2s)
            word_bonus = jnp.where(
                wlen > 0, alpha * wscore + beta, 0.0
            )  # (B, W)

        # ---- ctcdecode candidate pruning, rank form ----
        # rank_c = #chars with strictly better (lp, idx); ties -> lower
        # index first, exactly lax.top_k's order in the XLA path.
        better = (lp[:, :, None] > lp[:, None, :]) | (
            (lp[:, :, None] == lp[:, None, :])
            & (iota_c[:, :, None] < iota_c[:, None, :])
        )  # (B, C other, C me) -> better[b, j, c] = j outranks c
        rank = jnp.sum(better.astype(jnp.float32), axis=1)  # (B, C)
        keep = rank < float(min(cutoff_top_n, c_num))
        if cutoff_prob < 1.0:
            # keep while the EXCLUSIVE better-ranked mass < cutoff_prob
            # (== XLA's `rank < sum(cumsum(exp) < p) + 1`)
            excl = jnp.sum(
                jnp.where(better, jnp.exp(lp)[:, :, None], 0.0), axis=1
            )  # (B, C)
            keep = keep & (excl < cutoff_prob)
        keep = keep & ((lp > prune_logp) | (iota_c == blank_id))

        p_tot = _lse(pb, pnb)  # (B, W)

        # ---- stay candidates ----
        blank_col = jnp.sum(
            jnp.where(iota_c == blank_id, lp, 0.0), axis=1, keepdims=True
        )  # (B, 1)
        blank_kept = jnp.any(keep & (iota_c == blank_id), axis=1,
                             keepdims=True)  # (B, 1)
        stay_pb = jnp.where(blank_kept, p_tot + blank_col, NEG)
        last_oh = last[:, :, None] == iota_c[:, None, :]  # (B, W, C)
        lp_last = jnp.sum(jnp.where(last_oh, lp[:, None, :], 0.0), axis=2)
        last_kept = (last >= 0) & jnp.any(
            last_oh & keep[:, None, :], axis=2
        )
        stay_pnb = jnp.where(last_kept, pnb + lp_last, NEG)

        # ---- extend candidates, flat (B, W*C) ----
        # Built by CONCATENATING per-beam 2D chunks: Mosaic cannot
        # relayout a (B, W, C) -> (B, W*C) reshape (the last two dims
        # are the tiled ones), but lane-axis concats of 2D chunks and
        # unit-dim broadcasts compile fine. W is 10; the loop unrolls.
        e_num = w * c_num
        ext_mask = (iota_c == blank_id) | ~keep  # (B, C)
        cu = iota_c.astype(jnp.uint32)  # (B, C)
        ext_chunks, eh1_chunks, eh2_chunks = [], [], []
        lm_chunks, ctx_chunks = [], []
        for j in range(w):
            base_j = jnp.where(
                last[:, j:j + 1] == iota_c, pb[:, j:j + 1],
                p_tot[:, j:j + 1],
            )  # (B, C)
            ext_chunks.append(jnp.where(ext_mask, NEG, base_j + lp))
            eh1_chunks.append(_mix32(h1[:, j:j + 1], cu, jnp.uint32(_M1)))
            eh2_chunks.append(_mix32(h2[:, j:j + 1], cu, jnp.uint32(_M2)))
            if char_lm:
                # dense LM lookup: TWO-hot over the stacked (hi; lo)
                # table -> one (B, 2R) @ (2R, C) MXU dot per beam
                # sums both halves = f32-accurate score, no gathers
                cj = ctx[:, j:j + 1]
                oh_j = ((cj == iota_2r) | (cj + r_num == iota_2r)
                        ).astype(jnp.bfloat16)
                sc_j = jnp.dot(oh_j, lmtab_ref[:],
                               preferred_element_type=jnp.float32)
                lm_add = alpha * sc_j
                if space_id is not None and beta != 0.0:
                    lm_add = lm_add + jnp.where(
                        iota_c == space_id, beta, 0.0
                    )
                lm_chunks.append(lm[:, j:j + 1] + lm_add)
                ctx_chunks.append(
                    ((ctx[:, j:j + 1] << CTX_SHIFT) | iota_c) & ctx_mask
                )
            if word_lm:
                # word score lands on the space column only, for beams
                # with a non-empty partial word (host semantics)
                lm_chunks.append(lm[:, j:j + 1] + jnp.where(
                    iota_c == space_id, word_bonus[:, j:j + 1], 0.0
                ))
        ext2 = jnp.concatenate(ext_chunks, axis=1)  # (B, E)
        eh1_2 = jnp.concatenate(eh1_chunks, axis=1)
        eh2_2 = jnp.concatenate(eh2_chunks, axis=1)

        # ---- exact stay<->extend absorption dedup (3D broadcasts of
        # 2D operands only) ----
        match = (
            (h1[:, :, None] == eh1_2[:, None, :])
            & (h2[:, :, None] == eh2_2[:, None, :])
        )  # (B, W stay, W*C extend)
        k_max = jnp.maximum(
            jnp.max(ext2, axis=1, keepdims=True), -1e20
        )  # (B, 1)
        exp_ext = jnp.where(ext2 > NEG / 2, jnp.exp(ext2 - k_max), 0.0)
        absorbed = jnp.sum(
            jnp.where(match, exp_ext[:, None, :], 0.0), axis=2
        )  # (B, W)
        absorbed_log = jnp.where(
            absorbed > 0.0, jnp.log(absorbed) + k_max, NEG
        )
        stay_score_pre = _lse(stay_pb, stay_pnb)
        stay_pnb = _lse(stay_pnb, absorbed_log)
        # representative identity: strongest absorbed extend may take
        # over the (parent, char) backpointer (same prefix either way)
        masked_ext = jnp.where(match, ext2[:, None, :], NEG)  # (B, W, E)
        best_ext_val = jnp.max(masked_ext, axis=2)  # (B, W)
        iota_e = jax.lax.broadcasted_iota(jnp.int32, (b, w, e_num), 2)
        best_flat = jnp.min(
            jnp.where(masked_ext == best_ext_val[:, :, None], iota_e, e_num),
            axis=2,
        )  # (B, W) flat index parent * C + char
        take_ext = best_ext_val > stay_score_pre
        stay_parent = jnp.where(take_ext, best_flat // c_num, iota_w)
        stay_newchar = jnp.where(take_ext, best_flat % c_num, -1)
        ext2 = jnp.where(jnp.any(match, axis=1), NEG, ext2)

        # ---- candidate pool: stays then extends (XLA layout) ----
        cand_pb = jnp.concatenate(
            [stay_pb, jnp.full((b, w * c_num), NEG, jnp.float32)], axis=1
        )
        cand_pnb = jnp.concatenate([stay_pnb, ext2], axis=1)
        cand_h1 = jnp.concatenate([h1, eh1_2], axis=1)
        cand_h2 = jnp.concatenate([h2, eh2_2], axis=1)
        ext_last = jnp.concatenate([iota_c] * w, axis=1)  # (B, E)
        cand_last = jnp.concatenate([last, ext_last], axis=1)
        ext_parent = jnp.concatenate(
            [jnp.full((b, c_num), j, jnp.int32) for j in range(w)], axis=1
        )
        cand_parent = jnp.concatenate([stay_parent, ext_parent], axis=1)
        cand_new = jnp.concatenate([stay_newchar, ext_last], axis=1)
        score = _lse(cand_pb, cand_pnb)  # (B, P)
        if char_lm or word_lm:
            # stays keep their prefix's accumulated LM score/context
            # (a representative-swapped stay is the same prefix, so the
            # LM state is identical either way — as in the XLA path)
            cand_lm = jnp.concatenate([lm] + lm_chunks, axis=1)
            score = score + cand_lm
        if char_lm:
            cand_ctx = jnp.concatenate([ctx] + ctx_chunks, axis=1)

        # ---- top-W selection: W unrolled (max, first index, select,
        # mask) rounds — lax.top_k tie-breaking (lowest index wins).
        # Picked entries are masked to a sentinel STRICTLY below the
        # NEG floor: masking to NEG would make them tie with (and get
        # re-picked before) genuine NEG candidates, duplicating a live
        # beam whose mass the absorption dedup then double-counts. ----
        picked = -3.0e38
        cols = {k: [] for k in
                ("pb", "pnb", "h1", "h2", "last", "parent", "new")}
        # hash lanes go through the select as int32 bit-patterns:
        # Mosaic has no unsigned reductions, and a one-hot-masked sum
        # is exact under any reinterpretation
        as_i32 = lambda u: jax.lax.bitcast_convert_type(u, jnp.int32)  # noqa: E731
        arrs = dict(pb=cand_pb, pnb=cand_pnb, h1=as_i32(cand_h1),
                    h2=as_i32(cand_h2), last=cand_last,
                    parent=cand_parent, new=cand_new)
        if char_lm or word_lm:
            arrs["lm"] = cand_lm
            cols["lm"] = []
        if char_lm:
            arrs["ctx"] = cand_ctx
            cols["ctx"] = []
        for _k in range(w):
            m = jnp.max(score, axis=1, keepdims=True)  # (B, 1)
            idx = jnp.min(
                jnp.where(score == m, iota_p, pool), axis=1, keepdims=True
            )
            onehot = iota_p == idx  # (B, P)
            for name, arr in arrs.items():
                zero = jnp.zeros((), arr.dtype)
                cols[name].append(
                    jnp.sum(jnp.where(onehot, arr, zero), axis=1,
                            keepdims=True)
                )
            score = jnp.where(onehot, picked, score)
        sel = {name: jnp.concatenate(cs, axis=1)
               for name, cs in cols.items()}

        # ---- freeze state past each utterance's length ----
        alive = t < len_ref[:]  # (B, 1) — lengths arrive as a column
        # vector: an i1 (B,) -> (B, 1) minor-dim insertion is
        # unsupported in Mosaic, so it must never exist
        as_u32 = lambda s: jax.lax.bitcast_convert_type(s, jnp.uint32)  # noqa: E731
        pb_ref[:] = jnp.where(alive, sel["pb"], pb)
        pnb_ref[:] = jnp.where(alive, sel["pnb"], pnb)
        h1_ref[:] = jnp.where(alive, as_u32(sel["h1"]), h1)
        h2_ref[:] = jnp.where(alive, as_u32(sel["h2"]), h2)
        last_ref[:] = jnp.where(alive, sel["last"], last)
        if char_lm or word_lm:
            lm_ref[:] = jnp.where(alive, sel["lm"], lm)
        if char_lm:
            ctx_ref[:] = jnp.where(alive, sel["ctx"], ctx)
        if word_lm:
            # per-beam word state follows the SELECTED parent (the XLA
            # path gathers state.wh[parent] after top-k), then applies
            # the space/grow transitions for extended beams
            def psel(arr, u32=False):
                out = []
                for j in range(w):
                    ohp = sel["parent"][:, j:j + 1] == iota_w  # (B, W)
                    src = (jax.lax.bitcast_convert_type(arr, jnp.int32)
                           if u32 else arr)
                    v = jnp.sum(jnp.where(ohp, src, 0), axis=1,
                                keepdims=True)
                    out.append(v)
                v = jnp.concatenate(out, axis=1)
                return (jax.lax.bitcast_convert_type(v, jnp.uint32)
                        if u32 else v)

            p_wh1 = psel(wh1, u32=True)
            p_wh2 = psel(wh2, u32=True)
            p_wlen = psel(wlen)
            p_wc1 = [psel(a, u32=True) for a in wc1s]
            p_wc2 = [psel(a, u32=True) for a in wc2s]
            pe1 = psel(weff1, u32=True)
            pe2 = psel(weff2, u32=True)
            newchar = sel["new"]
            extended = newchar >= 0
            is_space = extended & (newchar == space_id)
            closes = is_space & (p_wlen > 0)
            # ring push (oldest drops) only when a word closes
            n_wc1 = [jnp.where(closes,
                               p_wc1[k + 1] if k + 1 < ring_len else pe1,
                               p_wc1[k]) for k in range(ring_len)]
            n_wc2 = [jnp.where(closes,
                               p_wc2[k + 1] if k + 1 < ring_len else pe2,
                               p_wc2[k]) for k in range(ring_len)]
            grows = extended & (newchar != space_id)
            cu_new = jnp.maximum(newchar, 0).astype(jnp.uint32)
            n_wh1 = jnp.where(
                is_space, jnp.uint32(0),
                jnp.where(grows, _mix32(p_wh1, cu_new, jnp.uint32(_M1)),
                          p_wh1))
            n_wh2 = jnp.where(
                is_space, jnp.uint32(0),
                jnp.where(grows, _mix32(p_wh2, cu_new, jnp.uint32(_M2)),
                          p_wh2))
            n_wlen = jnp.where(is_space, 0,
                               jnp.where(grows, p_wlen + 1, p_wlen))
            wh1_ref[:] = jnp.where(alive, n_wh1, wh1)
            wh2_ref[:] = jnp.where(alive, n_wh2, wh2)
            wlen_ref[:] = jnp.where(alive, n_wlen, wlen)
            for k in range(ring_len):
                wc1_refs[k][:] = jnp.where(alive, n_wc1[k], wc1s[k])
                wc2_refs[k][:] = jnp.where(alive, n_wc2[k], wc2s[k])
        parents_ref[i] = jnp.where(alive, sel["parent"], iota_w)
        chars_ref[i] = jnp.where(alive, sel["new"], -1)
        return 0

    jax.lax.fori_loop(0, time_chunk, body, 0, unroll=time_unroll)
    scores_ref[:] = _lse(pb_ref[:], pnb_ref[:])
    if char_lm or word_lm:
        scores_ref[:] = scores_ref[:] + lm_ref[:]
    if n_state:
        # carry the post-chunk beam state out (constant out blocks: the
        # last grid step's write is the one that lands in HBM). scores
        # may still get the word-close added below — that close is
        # deliberately NOT in the carried state (it re-applies each
        # call, "score if the stream ended now").
        for dst, src in zip(state_out, scratch_refs):
            dst[:] = src[:]
    if word_lm:
        # close the final partial word (ctcdecode finish_decoding) —
        # only the LAST chunk's scores survive, so don't pay the
        # full-table probes on every grid step
        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _close():
            fscore, _, _ = _wscore(
                wh1_ref[:], wh2_ref[:],
                [r[:] for r in wc1_refs], [r[:] for r in wc2_refs],
            )
            scores_ref[:] = scores_ref[:] + jnp.where(
                wlen_ref[:] > 0, alpha * fscore + beta, 0.0
            )


def _state_dtypes(lm_mode: str, ring_len: int) -> list:
    """Canonical beam-state field dtypes for ``make_beam_state`` /
    stateful ``beam_scan_pallas`` calls. Order MUST match the kernel's
    ``scratch_refs`` list: pb, pnb, h1, h2, last, [lm], [ctx],
    [wh1, wh2, wlen, wc1_0.., wc2_0..]."""
    dts = [jnp.float32, jnp.float32, jnp.uint32, jnp.uint32, jnp.int32]
    if lm_mode in ("char", "word"):
        dts.append(jnp.float32)  # lm
    if lm_mode == "char":
        dts.append(jnp.int32)  # ctx
    if lm_mode == "word":
        dts += [jnp.uint32, jnp.uint32, jnp.int32]  # wh1, wh2, wlen
        dts += [jnp.uint32] * (2 * ring_len)  # wc1_k then wc2_k
    return dts


def make_beam_state(b: int, beam_width: int, *, lm_mode: str = "none",
                    ring_len: int = 0) -> tuple:
    """Fresh (stream-start) beam state for stateful ``beam_scan_pallas``
    calls: a tuple of (B, W) arrays bit-identical to the kernel's
    ``_init`` values, so tick 0 from this state equals the batch
    kernel's frame 0. ``lm_mode``: "none" | "char" | "word";
    ``ring_len`` = max(1, order - 1) for word LMs."""
    import numpy as np

    w = beam_width
    pb = np.full((b, w), NEG, np.float32)
    pb[:, 0] = 0.0
    pnb = np.full((b, w), NEG, np.float32)
    h0 = np.arange(w, dtype=np.uint32)[None, :] + np.uint32(1)
    h0 = np.where(np.arange(w)[None, :] == 0, np.uint32(0),
                  h0).astype(np.uint32)
    h0 = np.broadcast_to(h0, (b, w)).copy()
    last = np.full((b, w), -1, np.int32)
    state = [pb, pnb, h0, h0.copy(), last]
    if lm_mode in ("char", "word"):
        state.append(np.zeros((b, w), np.float32))  # lm
    if lm_mode == "char":
        state.append(np.zeros((b, w), np.int32))  # ctx
    if lm_mode == "word":
        state += [np.zeros((b, w), np.uint32),  # wh1
                  np.zeros((b, w), np.uint32),  # wh2
                  np.zeros((b, w), np.int32)]   # wlen
        for k in range(ring_len):  # wc1 ring, newest (BOS) last
            tok = BOS_TOK if k == ring_len - 1 else PAD_TOK
            state.append(np.full((b, w), tok[0], np.uint32))
        for k in range(ring_len):  # wc2 ring
            tok = BOS_TOK if k == ring_len - 1 else PAD_TOK
            state.append(np.full((b, w), tok[1], np.uint32))
    return tuple(jnp.asarray(s) for s in state)


def beam_scan_pallas(logprobs, lengths, *, beam_width, blank_id,
                     cutoff_top_n=40, cutoff_prob=1.0,
                     prune_logp=-20.0, time_chunk=DEFAULT_TIME_CHUNK,
                     char_table=None, ctx_len=0, word_tables=None,
                     word_wide_tables=None,
                     alpha=0.0, beta=0.0, space_id=None,
                     state=None, return_state=False):
    """Fused prefix beam search: no-LM, char-LM (dense table), or
    word-LM (full-table-compare probes; small tables only — the
    caller gates on capacity, see decode.beam._use_pallas).

    Args:
      logprobs: (B, T, C) float log-probabilities.
      lengths: (B,) int32 valid frame counts.
      char_table: optional (R, C) f32 dense char-LM scores, R = 1 <<
        (6 * ctx_len), indexed by the 6-bit-packed last-ctx_len-char
        context (decode.beam.dense_char_lm_table builds it with the
        EXACT backoff scores of the hashed XLA path).
      state: optional carried beam state from ``make_beam_state`` or a
        previous ``return_state=True`` call — the streaming path:
        feeding T-frame chunks with the state threaded through yields
        bit-identical backpointers/scores to one batch call over the
        concatenation (the time recursion has no lookahead).
      return_state: also return the post-scan state tuple.
    Returns:
      parents (B, T, W) int32, chars (B, T, W) int32 (-1 = stay),
      scores (B, W) float32 UNSORTED — same contract as the XLA
      decoder's scan (decode/beam.py make_beam_search), fed to the same
      host backtracking. With ``return_state``: (..., state) appended.
    """
    b, t, c_num = logprobs.shape
    w = beam_width
    t_pad = -(-t // time_chunk) * time_chunk
    lp = jnp.transpose(logprobs, (1, 0, 2)).astype(jnp.float32)
    if t_pad != t:
        lp = jnp.pad(lp, ((0, t_pad - t), (0, 0), (0, 0)))
    n_chunks = t_pad // time_chunk
    char_lm = char_table is not None
    word_wide = word_wide_tables is not None
    word_lm = word_tables is not None or word_wide
    if word_tables is not None and word_wide:
        raise ValueError("pass word_tables or word_wide_tables, not both")
    if char_lm and word_lm:
        raise ValueError("pass char_table or word tables, not both")
    if char_lm and c_num > (1 << CTX_SHIFT):
        raise ValueError(
            f"in-kernel char-LM packs class ids in {CTX_SHIFT} bits; "
            f"n_class={c_num} exceeds {1 << CTX_SHIFT}"
        )
    w_src = word_wide_tables if word_wide else word_tables
    w_order = w_src.order if word_lm else 0
    ring_len = max(1, w_order - 1) if word_lm else 0

    # Unrolling the time loop is worth ~MXU pipelining for small
    # bodies, but each unrolled step of a LARGE wide-LM body keeps its
    # own probe temporaries live on the Mosaic stack: the 262144-cap
    # trigram (42 MiB tables) blew the 100 MiB scoped-VMEM budget by
    # 19 MiB on-chip with unroll=8. Roll the loop once the tables are
    # big enough that stack, not latency, is the binding constraint.
    # TPUASR_BEAM_UNROLL=0/1 overrides for A/B measurement.
    wide_bytes = (sum(int(m.shape[0]) * int(m.shape[1]) * 2
                      for m in word_wide_tables.rows)
                  if word_wide else 0)
    # Round-4 on-chip finding #2: at B=128 the unrolled wide body is
    # also a compile-time bomb — the remote compile service died
    # mid-compile after 46 min (bench_runs/r4/30_eval_beam_wide_fix.log)
    # on a config whose B=32 twin compiles (slowly) and runs. Roll the
    # loop for large batches as well as large tables. The SMALL
    # full-compare path is batch-bound too: the same CLI config on the
    # small path (caps [32,512,4096], B=128) never finished compiling
    # inside 1 h (bench_runs/r4/40_eval_beam_b128_smallpath.log), so
    # the B >= 64 rule applies to every word-LM body, not just wide.
    time_unroll = not (word_lm
                       and (wide_bytes > 24 * 1024 * 1024 or b >= 64))
    env_unroll = os.environ.get("TPUASR_BEAM_UNROLL")
    if env_unroll is not None:
        time_unroll = env_unroll not in ("0", "false", "False")

    # Split each order's block-fetch matrix into <=MAX_WIDE_ROWS_PER_REF
    # row chunks (see the constant's comment: monolithic refs up to
    # 4096 rows are repro-validated on-chip; the math is the same
    # matmul evaluated as its row blocks).
    wide_mats: list = []
    wide_chunks: tuple = ()
    if word_wide:
        split = []
        for k in range(w_order):
            mat = word_wide_tables.rows[k]
            r_k = mat.shape[0]
            n_split = -(-r_k // MAX_WIDE_ROWS_PER_REF)
            rows_per = -(-r_k // n_split)
            parts = [mat[p * rows_per:(p + 1) * rows_per]
                     for p in range(n_split)]
            split.append(parts)
            wide_mats.extend(parts)
        wide_chunks = tuple(len(p) for p in split)

    lm_mode = "word" if word_lm else ("char" if char_lm else "none")
    stateful = state is not None or return_state
    if stateful and state is None:
        state = make_beam_state(b, w, lm_mode=lm_mode, ring_len=ring_len)
    if stateful:
        dts = _state_dtypes(lm_mode, ring_len)
        if len(state) != len(dts):
            raise ValueError(
                f"state has {len(state)} fields; this LM mode "
                f"({lm_mode}, ring_len={ring_len}) needs {len(dts)}")
    n_state = len(state) if stateful else 0

    kern = functools.partial(
        _beam_kernel, time_chunk=time_chunk, beam_width=w,
        blank_id=blank_id, cutoff_top_n=cutoff_top_n,
        cutoff_prob=cutoff_prob, prune_logp=prune_logp,
        char_lm=char_lm, word_lm=word_lm, word_wide=word_wide,
        wide_caps=tuple(word_wide_tables.caps) if word_wide else (),
        wide_salts=(tuple(word_wide_tables.salts)
                    if word_wide else ()),
        wide_chunks=wide_chunks,
        n_probes=w_src.n_probes if word_lm else 8,
        w_order=w_order,
        ring_len=ring_len, alpha=alpha, beta=beta, space_id=space_id,
        ctx_len=ctx_len, time_unroll=time_unroll, n_state=n_state,
    )
    in_specs = [
        pl.BlockSpec((time_chunk, b, c_num), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b, 1), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [lp, lengths.astype(jnp.int32).reshape(b, 1)]
    scratch = [
        pltpu.VMEM((b, w), jnp.float32),  # pb
        pltpu.VMEM((b, w), jnp.float32),  # pnb
        pltpu.VMEM((b, w), jnp.uint32),   # h1
        pltpu.VMEM((b, w), jnp.uint32),   # h2
        pltpu.VMEM((b, w), jnp.int32),    # last
    ]
    if char_lm:
        # stacked bf16 (hi; lo) halves — see the kernel comment
        tab32 = char_table.astype(jnp.float32)
        hi = tab32.astype(jnp.bfloat16)
        lo = (tab32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        stacked = jnp.concatenate([hi, lo], axis=0)
        in_specs.append(
            pl.BlockSpec(stacked.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM))
        inputs.append(stacked)
    if word_wide:
        for mat in wide_mats:
            in_specs.append(
                pl.BlockSpec(mat.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM))
            inputs.append(mat)
    elif word_lm:
        for k in range(w_order):
            for arr in (word_tables.keys1[k], word_tables.keys2[k],
                        word_tables.logps[k], word_tables.backoffs[k]):
                row = jnp.asarray(arr).reshape(1, -1)
                in_specs.append(
                    pl.BlockSpec(row.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
                inputs.append(row)
    if stateful:
        for arr, dt in zip(state, _state_dtypes(lm_mode, ring_len)):
            arr = jnp.asarray(arr, dt)
            if arr.shape != (b, w):
                raise ValueError(
                    f"state field shape {arr.shape} != ({b}, {w})")
            in_specs.append(
                pl.BlockSpec((b, w), lambda i: (0, 0),
                             memory_space=pltpu.VMEM))
            inputs.append(arr)
    if char_lm or word_lm:
        scratch.append(pltpu.VMEM((b, w), jnp.float32))  # lm
    if char_lm:
        scratch.append(pltpu.VMEM((b, w), jnp.int32))    # ctx
    if word_lm:
        scratch += [
            pltpu.VMEM((b, w), jnp.uint32),  # wh1
            pltpu.VMEM((b, w), jnp.uint32),  # wh2
            pltpu.VMEM((b, w), jnp.int32),   # wlen
        ]
        scratch += [pltpu.VMEM((b, w), jnp.uint32)
                    for _ in range(2 * ring_len)]  # wc1_k then wc2_k
    out_specs = [
        pl.BlockSpec((time_chunk, b, w), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((time_chunk, b, w), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((b, w), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((t_pad, b, w), jnp.int32),
        jax.ShapeDtypeStruct((t_pad, b, w), jnp.int32),
        jax.ShapeDtypeStruct((b, w), jnp.float32),
    ]
    if stateful:
        for dt in _state_dtypes(lm_mode, ring_len):
            out_specs.append(
                pl.BlockSpec((b, w), lambda i: (0, 0),
                             memory_space=pltpu.VMEM))
            out_shape.append(jax.ShapeDtypeStruct((b, w), dt))
    outs = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=INTERPRET,
    )(*inputs)
    parents, chars, scores = outs[:3]
    state_out = tuple(outs[3:])

    parents = jnp.transpose(parents[:t], (1, 0, 2))
    chars = jnp.transpose(chars[:t], (1, 0, 2))
    if w <= 127 and c_num <= 126:
        # backpointers fit int8 (parent < W, char in [-1, C)): the
        # (B, T, W) device->host copy is the decode bottleneck on
        # tunneled hosts — 4x fewer bytes than int32
        parents = parents.astype(jnp.int8)
        chars = chars.astype(jnp.int8)
    if return_state:
        return parents, chars, scores, state_out
    return parents, chars, scores
