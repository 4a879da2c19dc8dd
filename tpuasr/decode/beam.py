"""On-device vectorized CTC prefix beam search (+ char n-gram fusion).

TPU-native replacement for the reference's ctcdecode C++ CPU thread
pool (SURVEY.md §3.2): the whole batch decodes in ONE jitted
`lax.scan` over time — beams are a fixed-width tensor dimension, so
every step is dense top-k / gather / logsumexp work on the VPU, with
no host round-trips until the final string readout.

Algorithm (Hannun-style prefix beam search, log-space):
  per beam: (log_pb, log_pnb) for ending-in-blank / non-blank,
  identified by a rolling 2x32-bit prefix hash (collision prob ~2^-64
  within a beam set — prefixes are never materialized on device except
  as the (W, T) storage used for final readout).

Per frame: W "stay" candidates (blank extension + repeat-last merge)
and W*C "extend" candidates are scored; the top 4W by score are
hash-deduplicated with a (4W, 4W) equality mask (exact within the
kept pool — mass outside the top-4W that would merge into a kept
prefix is negligible and this bound is the standard device-side
approximation), then the top W survive.

Optional shallow fusion with a character-level n-gram LM: device-
resident hashed tables (tpuasr.decode.lm.HashedNGramLM) probed by
rolling context hashes — `alpha * log P_lm(c | last chars)` is added
at every extension, `beta` per space (word bonus). Word-level LM
fusion parity with ctcdecode runs on host (tpuasr.decode.beam_host).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.labels import Alphabet

NEG = -1e30
OOV_LOGP = -20.0  # natural-log floor for LM-unseen characters

# 32-bit hash mixing constants (two independent streams)
_M1 = np.uint32(0x9E3779B1)
_M2 = np.uint32(0x85EBCA77)


def _mix32(h, x, mult):
    h = (h ^ x) * mult
    return h ^ (h >> 15)


def _lse(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, NEG)
    return jnp.maximum(
        m_safe + jnp.log1p(jnp.exp(jnp.minimum(a, b) - m_safe)), NEG
    )


@dataclass(frozen=True)
class BeamConfig:
    beam_width: int = 10
    blank_id: int = 0
    space_id: int | None = None
    alpha: float = 0.0  # char-LM weight (natural log domain)
    beta: float = 0.0  # word bonus per space
    pool_mult: int = 4  # dedup pool = pool_mult * beam_width


def _step(state, lp, cfg: BeamConfig, t, lm_tables=None):
    """One time step for one utterance. lp: (C,) log-probs."""
    pb, pnb, h1, h2, last, store, length, lm_score, ctx = state
    w = pb.shape[0]
    c_num = lp.shape[0]

    p_tot = _lse(pb, pnb)

    # ---- stay candidates (same prefix) ----
    stay_pb = p_tot + lp[cfg.blank_id]
    stay_pnb = jnp.where(last >= 0, pnb + lp[jnp.maximum(last, 0)], NEG)

    # ---- extend candidates: (W, C) ----
    chars = jnp.arange(c_num, dtype=jnp.int32)[None, :]  # (1, C)
    is_repeat = chars == last[:, None]
    base = jnp.where(is_repeat, pb[:, None], p_tot[:, None])
    ext = base + lp[None, :]
    ext = jnp.where(chars == cfg.blank_id, NEG, ext)

    # char-LM fusion: alpha * log P(c | ctx) at every extension. The LM
    # contribution is tracked SEPARATELY from the CTC mass (pb/pnb stay
    # pure CTC, like ctcdecode) and only enters the ranking score.
    lm_add = jnp.zeros_like(ext)
    if lm_tables is not None and cfg.alpha != 0.0:
        lm_add = cfg.alpha * _char_lm_scores(lm_tables, ctx, c_num)  # (W, C)
    if cfg.space_id is not None and cfg.beta != 0.0:
        lm_add = lm_add + jnp.where(chars == cfg.space_id, cfg.beta, 0.0)

    ext_h1 = _mix32(h1[:, None], chars.astype(jnp.uint32), _M1)
    ext_h2 = _mix32(h2[:, None], chars.astype(jnp.uint32), _M2)

    # ---- candidate pool ----
    cand_pb = jnp.concatenate([stay_pb, jnp.full((w * c_num,), NEG)], 0)
    cand_pnb = jnp.concatenate([stay_pnb, ext.reshape(-1)], 0)
    cand_h1 = jnp.concatenate([h1, ext_h1.reshape(-1)], 0)
    cand_h2 = jnp.concatenate([h2, ext_h2.reshape(-1)], 0)
    cand_last = jnp.concatenate(
        [last, jnp.broadcast_to(chars, (w, c_num)).reshape(-1)], 0
    )
    cand_parent = jnp.concatenate(
        [
            jnp.arange(w, dtype=jnp.int32),
            jnp.broadcast_to(
                jnp.arange(w, dtype=jnp.int32)[:, None], (w, c_num)
            ).reshape(-1),
        ],
        0,
    )
    cand_new = jnp.concatenate(
        [jnp.full((w,), -1, jnp.int32),
         jnp.broadcast_to(chars, (w, c_num)).reshape(-1)], 0
    )
    cand_lm = jnp.concatenate(
        [lm_score, (lm_score[:, None] + lm_add).reshape(-1)], 0
    )

    score = _lse(cand_pb, cand_pnb) + cand_lm

    # ---- dedup within top pool ----
    k = min(cfg.pool_mult * w, score.shape[0])
    top_score, top_idx = jax.lax.top_k(score, k)
    tpb = cand_pb[top_idx]
    tpnb = cand_pnb[top_idx]
    th1 = cand_h1[top_idx]
    th2 = cand_h2[top_idx]

    same = (th1[:, None] == th1[None, :]) & (th2[:, None] == th2[None, :])
    iota = jnp.arange(k)
    first = jnp.argmax(same, axis=1)  # first (highest-score) occurrence
    is_first = first == iota
    # merge every duplicate's mass into its first occurrence
    mask_into = same & (first[None, :] == iota[:, None])  # row i collects j
    merged_pb = _merge_lse(tpb, mask_into)
    merged_pnb = _merge_lse(tpnb, mask_into)
    merged_pb = jnp.where(is_first, merged_pb, NEG)
    merged_pnb = jnp.where(is_first, merged_pnb, NEG)

    final_score = _lse(merged_pb, merged_pnb) + cand_lm[top_idx]
    top_w_score, top_w = jax.lax.top_k(final_score, w)
    sel = top_idx[top_w]

    new_pb = merged_pb[top_w]
    new_pnb = merged_pnb[top_w]
    new_h1 = cand_h1[sel]
    new_h2 = cand_h2[sel]
    new_last = cand_last[sel]
    new_lm = cand_lm[sel]
    parent = cand_parent[sel]
    newchar = cand_new[sel]

    # ---- prefix storage / length / LM context update ----
    old_store = store[parent]
    old_len = length[parent]
    appended = _append(old_store, old_len, newchar)
    new_store = jnp.where((newchar >= 0)[:, None], appended, old_store)
    new_length = jnp.where(newchar >= 0, old_len + 1, old_len)
    old_ctx = ctx[parent]
    new_ctx = jnp.where(
        (newchar >= 0)[:, None],
        jnp.concatenate([old_ctx[:, 1:], jnp.maximum(newchar, 0)[:, None]], 1),
        old_ctx,
    )

    return (new_pb, new_pnb, new_h1, new_h2, new_last, new_store,
            new_length, new_lm, new_ctx)


def _merge_lse(vals, mask):
    """Row-wise logsumexp of vals[j] where mask[i, j]."""
    v = jnp.where(mask, vals[None, :], NEG)
    m = jnp.max(v, axis=1)
    m_safe = jnp.maximum(m, NEG)
    out = m_safe + jnp.log(jnp.sum(jnp.exp(v - m_safe[:, None]), axis=1))
    return jnp.maximum(out, NEG)


def _append(store, lengths, chars):
    t_cap = store.shape[1]
    onehot = (
        jnp.arange(t_cap, dtype=jnp.int32)[None, :] == lengths[:, None]
    )
    return jnp.where(onehot, jnp.maximum(chars, 0)[:, None], store)


def _char_lm_scores(lm_tables, ctx, c_num):
    """(W, C) log P(c | ctx chars) from hashed char-LM tables with
    stupid-backoff-style fallback (full backoff weights applied when
    present)."""
    keys, logps, backoffs, order, n_probes = lm_tables
    w, k_ctx = ctx.shape
    chars = jnp.arange(c_num, dtype=jnp.uint32)

    def hash_ngram(ctx_tail, c):
        # ctx_tail: (W, m) int32; returns (W,) pair-hash combined for char c
        h1 = jnp.zeros((w,), jnp.uint32)
        h2 = jnp.zeros((w,), jnp.uint32)
        for i in range(ctx_tail.shape[1]):
            x = ctx_tail[:, i].astype(jnp.uint32)
            h1 = _mix32(h1, x, _M1)
            h2 = _mix32(h2, x, _M2)
        h1 = _mix32(h1[:, None], c[None, :], _M1)  # (W, C)
        h2 = _mix32(h2[:, None], c[None, :], _M2)
        return h1, h2

    def probe(table_i, h1, h2):
        keys1, keys2 = keys[table_i]
        cap = keys1.shape[0]
        slot = (h1 % jnp.uint32(cap)).astype(jnp.int32)
        found = jnp.zeros(h1.shape, bool)
        val = jnp.full(h1.shape, NEG, jnp.float32)
        bo = jnp.zeros(h1.shape, jnp.float32)
        for _ in range(n_probes):
            k1 = keys1[slot]
            k2 = keys2[slot]
            hit = (k1 == h1) & (k2 == h2) & ~found
            val = jnp.where(hit, logps[table_i][slot], val)
            bo = jnp.where(hit, backoffs[table_i][slot], bo)
            found = found | hit
            slot = (slot + 1) % cap
        return found, val, bo

    # highest order first with backoff accumulation
    score = jnp.full((w, c_num), NEG, jnp.float32)
    resolved = jnp.zeros((w, c_num), bool)
    bo_acc = jnp.zeros((w, c_num), jnp.float32)
    for m in range(order - 1, -1, -1):  # context length m
        ctx_tail = ctx[:, k_ctx - m:] if m > 0 else ctx[:, :0]
        h1, h2 = hash_ngram(ctx_tail, chars)
        found, val, _ = probe(m, h1, h2)
        use = found & ~resolved
        score = jnp.where(use, bo_acc + val, score)
        resolved = resolved | found
        if m > 0:
            # accumulate this context's backoff for unresolved entries
            hb1 = jnp.zeros((w,), jnp.uint32)
            hb2 = jnp.zeros((w,), jnp.uint32)
            for i in range(m):
                x = ctx_tail[:, i].astype(jnp.uint32)
                hb1 = _mix32(hb1, x, _M1)
                hb2 = _mix32(hb2, x, _M2)
            bfound, _, bbo = probe(m - 1, hb1[:, None] * jnp.uint32(1),
                                   hb2[:, None] * jnp.uint32(1))
            step_bo = jnp.where(bfound, bbo, 0.0)
            bo_acc = jnp.where(resolved, bo_acc, bo_acc + step_bo)
    # OOV floor: characters absent from the LM score a fixed penalty
    # instead of -inf (keeps fusion numerically sane for rare chars).
    return jnp.where(resolved, score, OOV_LOGP)


def make_beam_search(cfg: BeamConfig, t_cap: int, n_class: int,
                     lm_tables=None):
    """Build the jitted batched decoder:
    (logprobs (B,T,C), lengths (B,)) -> (store (B,W,t_cap),
    out_lens (B,W), scores (B,W))."""

    def decode_one(logprobs, length):
        w = cfg.beam_width
        pb = jnp.full((w,), NEG).at[0].set(0.0)
        pnb = jnp.full((w,), NEG)
        h1 = jnp.zeros((w,), jnp.uint32)
        h2 = jnp.zeros((w,), jnp.uint32)
        # distinct initial hashes so empty duplicates don't merge
        h1 = h1.at[:].set(jnp.arange(w, dtype=jnp.uint32) + 1)
        h2 = h2.at[:].set(jnp.arange(w, dtype=jnp.uint32) + 1)
        h1 = h1.at[0].set(0)
        h2 = h2.at[0].set(0)
        last = jnp.full((w,), -1, jnp.int32)
        store = jnp.zeros((w, t_cap), jnp.int32)
        blen = jnp.zeros((w,), jnp.int32)
        lm_score = jnp.zeros((w,), jnp.float32)
        k_ctx = 4 if lm_tables is None else max(1, lm_tables[3] - 1)
        ctx = jnp.zeros((w, k_ctx), jnp.int32)

        def body(state, inp):
            lp, t = inp
            new_state = _step(state, lp, cfg, t, lm_tables)
            keep = t < length
            state = jax.tree.map(
                lambda n, o: jnp.where(
                    keep.reshape((1,) * n.ndim), n, o
                ), new_state, state,
            )
            return state, None

        ts = jnp.arange(logprobs.shape[0], dtype=jnp.int32)
        state0 = (pb, pnb, h1, h2, last, store, blen, lm_score, ctx)
        state, _ = jax.lax.scan(body, state0, (logprobs, ts))
        pb, pnb, h1, h2, last, store, blen, lm_score, ctx = state
        scores = _lse(pb, pnb) + lm_score
        order = jnp.argsort(-scores)
        return store[order], blen[order], scores[order]

    @jax.jit
    def decode(logprobs, lengths):
        return jax.vmap(decode_one)(logprobs, lengths)

    return decode


class DeviceBeamDecoder:
    """Batched on-device beam decoder with the framework decoder API."""

    def __init__(self, alphabet: Alphabet, beam_width: int = 10,
                 char_lm=None, alpha: float = 0.0, beta: float = 0.0):
        self.alphabet = alphabet
        lm_tables = None
        if char_lm is not None:
            lm_tables = pack_lm_tables(char_lm, alphabet)
        self._lm_tables = lm_tables
        self.cfg = BeamConfig(
            beam_width=beam_width,
            blank_id=alphabet.blank_id,
            space_id=alphabet.space_id,
            alpha=alpha,
            beta=beta,
        )
        self._cache = {}

    def decode(self, logits, lengths, return_offsets: bool = False):
        logits = jnp.asarray(logits)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        t_cap, n_class = logits.shape[1], logits.shape[2]
        key = (t_cap, n_class)
        if key not in self._cache:
            self._cache[key] = make_beam_search(
                self.cfg, t_cap, n_class, self._lm_tables
            )
        store, blen, scores = self._cache[key](logprobs, jnp.asarray(lengths))
        store = np.asarray(store)
        blen = np.asarray(blen)
        texts = [
            self.alphabet.decode(store[b, 0, : blen[b, 0]]).strip()
            for b in range(store.shape[0])
        ]
        if return_offsets:
            return texts, [np.array([], np.int64)] * len(texts)
        return texts


def pack_lm_tables(char_lm, alphabet: Alphabet):
    """Convert a char-level ArpaLM into device arrays keyed by the
    SAME rolling 2x32-bit hashes the kernel computes over class ids."""
    from tpuasr.decode.lm import ArpaLM

    assert isinstance(char_lm, ArpaLM)
    import math as _math

    ln10 = _math.log(10.0)
    order = char_lm.order
    n_probes = 8
    keys, logps, backoffs = [], [], []

    def ids_of(toks):
        out = []
        for t in toks:
            if t in (" ", "<sp>"):
                out.append(alphabet.space_id)
            else:
                enc = alphabet.encode(t)
                if len(enc) != 1:
                    return None
                out.append(enc[0])
        return out

    for k, table in enumerate(char_lm.ngrams):
        n = max(len(table), 1)
        cap = 1
        while cap < n * 2:
            cap *= 2
        k1 = np.zeros(cap, np.uint32)
        k2 = np.zeros(cap, np.uint32)
        lp = np.full(cap, NEG, np.float32)
        bo = np.zeros(cap, np.float32)
        for toks, (logp, b) in table.items():
            ids = ids_of(toks)
            if ids is None:
                continue
            h1 = np.uint32(0)
            h2 = np.uint32(0)
            with np.errstate(over="ignore"):
                for c in ids:
                    h1 = np.uint32(
                        (np.uint32(h1 ^ np.uint32(c)) * _M1) & np.uint32(0xFFFFFFFF)
                    )
                    h1 = h1 ^ (h1 >> np.uint32(15))
                    h2 = np.uint32(
                        (np.uint32(h2 ^ np.uint32(c)) * _M2) & np.uint32(0xFFFFFFFF)
                    )
                    h2 = h2 ^ (h2 >> np.uint32(15))
            slot = int(h1 % np.uint32(cap))
            placed = False
            for _ in range(n_probes):
                if k1[slot] == 0 and k2[slot] == 0:
                    k1[slot], k2[slot] = h1, h2
                    lp[slot] = logp * ln10
                    bo[slot] = b * ln10
                    placed = True
                    break
                slot = (slot + 1) % cap
            if not placed:  # grow-on-collision left for the Pallas pass
                pass
        keys.append((jnp.asarray(k1), jnp.asarray(k2)))
        logps.append(jnp.asarray(lp))
        backoffs.append(jnp.asarray(bo))
    return (keys, logps, backoffs, order, n_probes)
