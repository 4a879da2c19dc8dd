"""On-device vectorized CTC prefix beam search (+ n-gram LM fusion).

TPU-native replacement for the reference's ctcdecode C++ CPU thread
pool (SURVEY.md §3.2, ref:decoder.py BeamCTCDecoder): the whole batch
decodes in ONE jitted `lax.scan` over time — beams are a fixed-width
tensor dimension, so every step is dense top-k / gather / logsumexp
work on the VPU, with no host round-trips until the final string
readout.

Algorithm (Hannun-style prefix beam search, log-space):
  per beam: (log_pb, log_pnb) for ending-in-blank / non-blank,
  identified by a rolling 2x32-bit prefix hash (collision prob ~2^-64
  within a beam set — prefixes are never materialized on device except
  as the (W, T) storage used for final readout).

Per frame: W "stay" candidates (blank extension + repeat-last merge)
and W*n_top "extend" candidates are scored. Deduplication is EXACT
over the full pool and costs one tiny matmul: beams are distinct
prefixes, so the only possible duplicate is stay_i == extend_(j, c)
with prefix_i = prefix_j + c — matching extends are absorbed into
stay_i's non-blank mass via a hash-match matrix and masked out, after
which a single top-k picks the W survivors (no sort-merge window).

ctcdecode API parity (SURVEY.md §5.6 decoder flags): `cutoff_top_n` /
`cutoff_prob` / `prune_logp` per-frame candidate pruning with the same
semantics as the host oracle (tpuasr.decode.beam_host), n-best output,
and per-character frame offsets (tracked in a parallel (W, T) store).

LM shallow fusion, both levels, device-resident:
  * char n-gram: `alpha * log P_lm(c | last chars)` at every extension
    (hashed tables probed by rolling context hashes).
  * WORD n-gram (ctcdecode semantics, BASELINE config 4): each beam
    carries a rolling hash of its current partial word and a ring of
    the last (order-1) completed-word hashes; when a space is emitted
    after a non-empty word, `alpha * log P_lm(word | context) + beta`
    is added (Katz backoff over hashed tables, OOV -> <unk>), and the
    final partial word is closed after the scan — exactly the host
    BeamCTCDecoder's scoring, so device-vs-host parity is testable.

The LM contribution is tracked SEPARATELY from the CTC mass (pb/pnb
stay pure CTC, like ctcdecode) and only enters the ranking score.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.labels import Alphabet

NEG = -1e30
OOV_LOGP = -20.0  # natural-log floor for LM-unseen characters (char mode)
# Word mode matches the host oracle: ArpaLM returns LOG10_EPS (-99
# log10) for words absent even as <unk> unigrams.
WORD_OOV_NAT = -99.0 * np.log(10.0)

# 32-bit hash mixing constants (two independent streams)
_M1 = np.uint32(0x9E3779B1)
_M2 = np.uint32(0x85EBCA77)

# Reserved token hash pairs for words that are not character sequences.
# Real words hash via the rolling char-id mix; colliding with these is
# a ~2^-64 event.
BOS_TOK = (np.uint32(0x7F4A7C15), np.uint32(0x3C6EF372))
UNK_TOK = (np.uint32(0x9E3779B9), np.uint32(0x85EBCA6B))
EOS_TOK = (np.uint32(0x27220A95), np.uint32(0x165667B1))
PAD_TOK = (np.uint32(0x50AD50AD), np.uint32(0xDEFACED1))


def _mix32(h, x, mult):
    h = (h ^ x) * mult
    return h ^ (h >> 15)


def _np_mix32(h, x, mult):
    with np.errstate(over="ignore"):
        h = np.uint32((np.uint32(h) ^ np.uint32(x)) * mult)
    return np.uint32(h ^ (h >> np.uint32(15)))


def _np_hash_ids(ids, mult) -> np.uint32:
    h = np.uint32(0)
    for c in ids:
        h = _np_mix32(h, np.uint32(c), mult)
    return h


def _np_fmix32(h) -> np.uint32:
    """murmur3 fmix32: full-avalanche 32-bit finalizer. Every input bit
    flips every output bit with p~0.5 — required for salted homes,
    where keys differing ONLY in high bits must land in different
    low-bit home slots (a single xor-multiply-xorshift round cannot
    diffuse bit 31 down to bit 0; that bug shipped red in round 4)."""
    with np.errstate(over="ignore"):
        h = np.uint32(h)
        h = np.uint32(h ^ (h >> np.uint32(16)))
        h = np.uint32(h * np.uint32(0x85EBCA6B))
        h = np.uint32(h ^ (h >> np.uint32(13)))
        h = np.uint32(h * np.uint32(0xC2B2AE35))
        h = np.uint32(h ^ (h >> np.uint32(16)))
    return h


def _fmix32(h):
    """Traced twin of `_np_fmix32` (uint32 array in/out)."""
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(16))
    return h


def _np_home(h1: np.uint32, cap: int, salt: int) -> int:
    """Home slot of key h1 in a cap-slot table (cap = power of two).
    salt 0 is the historical h1 % cap; a nonzero salt re-mixes with a
    full-avalanche finalizer so ANY differing key bit (including bits
    >= log2(cap)) re-rolls the home. MUST match the traced `_home`
    below and the kernel's slot math (ops/beam.py `_wprobe_wide`) bit
    for bit."""
    if salt:
        h1 = _np_fmix32(np.uint32(h1) ^ np.uint32(salt))
    return int(np.uint32(h1) % np.uint32(cap))


def _home(h1, cap: int, salt: int):
    """Traced twin of `_np_home` (h1: uint32 array) -> int32 slots."""
    if salt:
        h1 = _fmix32(h1 ^ jnp.uint32(salt))
    return (h1 & jnp.uint32(cap - 1)).astype(jnp.int32)


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
    alpha: float = 0.0  # LM weight (natural log domain)
    beta: float = 0.0  # word bonus
    pool_mult: int = 4  # retained for API compat; dedup is exact now (unused)
    # ctcdecode-parity per-frame candidate pruning (host defaults):
    cutoff_top_n: int = 40
    cutoff_prob: float = 1.0
    prune_logp: float = -20.0


class HashedTables(NamedTuple):
    """Open-addressed (2x32-bit key) -> (logp, backoff) tables, one per
    n-gram order, as device arrays. Natural-log values."""

    keys1: tuple  # per order: (cap,) uint32
    keys2: tuple
    logps: tuple  # per order: (cap,) float32
    backoffs: tuple
    order: int
    n_probes: int
    # per order: uint32 home-derivation salt from _pack_table. 0 =
    # home is h1 % cap (the historical rule); nonzero = home is
    # _mix32(h1, salt) & (cap-1) — tried before doubling capacity when
    # clustered homes defeat the window matching (empty = all zero).
    salts: tuple = ()


WIDE_LANES = 256  # each row duplicates 2x128 consecutive (mod cap) slots
WIDE_PLANES = 14  # k1 b0..3, k2 b0..3, logp hi/mid/lo, backoff hi/mid/lo


class WideTables(NamedTuple):
    """Block-fetch layout of ``HashedTables`` for the in-kernel
    LARGE-vocabulary word-LM path (ops/beam.py `_wprobe_wide`).

    Mosaic has no gathers, so the kernel fetches each query's probe
    window with ONE one-hot MXU matmul per order: row r of ``rows[k]``
    holds the 256 consecutive (mod cap) slots starting at 128*r —
    every 8-slot linear-probe window starting in [128r, 128r+128) lies
    inside row r, so `slot >> 7` names the row and `slot & 127` the
    lane offset. Values ship as bf16 planes that reconstruct exactly
    on fetch: uint32 keys as 4 byte planes (integers <= 255 are exact
    in bf16; compared per plane, never recombined), f32 logps/backoffs
    as 3-way hi/mid/lo bf16 splits (~2^-24 relative, cf. the two-hot
    char table). Slot layout and cap are IDENTICAL to the source
    HashedTables (already power-of-two via _pack_table), so scores
    match the XLA hash-probe path."""

    rows: tuple  # per order: (R_k, WIDE_PLANES * WIDE_LANES) bf16
    caps: tuple  # per order: python int, power of two
    order: int
    n_probes: int
    salts: tuple = ()  # per order home salts (see HashedTables.salts)


def _split3(x: np.ndarray) -> list:
    """f32 -> three bf16-representable f32 planes summing to x with
    ~2^-24 relative error (hi/mid exact bf16 values)."""
    import ml_dtypes

    bf = ml_dtypes.bfloat16
    x = np.asarray(x, np.float32)
    hi = x.astype(bf).astype(np.float32)
    r = x - hi
    mid = r.astype(bf).astype(np.float32)
    lo = (r - mid).astype(bf).astype(np.float32)
    return [hi, mid, lo]


def build_wide_word_tables(tables: HashedTables) -> WideTables:
    """HashedTables -> WideTables (host, once per decoder)."""
    rows, caps = [], []
    for k in range(tables.order):
        k1 = np.asarray(tables.keys1[k]).astype(np.uint32)
        k2 = np.asarray(tables.keys2[k]).astype(np.uint32)
        lp = np.asarray(tables.logps[k], np.float32)
        bo = np.asarray(tables.backoffs[k], np.float32)
        cap = int(k1.shape[0])
        if cap & (cap - 1):
            raise ValueError(f"table cap {cap} not a power of two")
        r_k = max(cap // 128, 1)
        idx = (np.arange(r_k)[:, None] * 128
               + np.arange(WIDE_LANES)[None, :]) % cap  # (R, 256)
        planes = []
        for arr in (k1, k2):
            for i in range(4):
                planes.append(((arr >> np.uint32(8 * i))
                               & np.uint32(0xFF)).astype(np.float32))
        planes += _split3(lp) + _split3(bo)
        wide = np.stack([p[idx] for p in planes], axis=1)  # (R, P, 256)
        wide = wide.reshape(r_k, WIDE_PLANES * WIDE_LANES)
        # Pad to >= 8 rows (a full sublane tile): with R == 1 the
        # kernel's per-beam one-hot compare produces (B, 1) vectors
        # whose lane offset still points at the sliced beam column, and
        # Mosaic rejects the sublane concat ("result/input offset
        # mismatch on non-concat dimension" — observed on-chip with a
        # cap-64 unigram order). Padded rows are all-zero and sit at
        # indices >= cap/128, which `slot >> 7` can never name, so the
        # fetch math is unchanged.
        r_pad = max(8, r_k)
        if r_pad != r_k:
            wide = np.pad(wide, ((0, r_pad - r_k), (0, 0)))
        rows.append(jnp.asarray(wide, jnp.bfloat16))
        caps.append(cap)
    return WideTables(tuple(rows), tuple(caps), tables.order,
                      tables.n_probes, tuple(tables.salts))


def wide_tables_bytes(tables: HashedTables) -> int:
    """VMEM footprint of build_wide_word_tables(tables)."""
    return sum(
        max(int(np.asarray(k).shape[0]) // 128, 8) * WIDE_PLANES
        * WIDE_LANES * 2
        for k in tables.keys1
    )


class BeamState(NamedTuple):
    """Per-beam device state. Prefixes are NOT materialized on device:
    each frame emits (parent, appended char) backpointers as scan
    outputs and the host backtracks the winners afterwards — the scan
    body carries only O(W) vectors (a (W, T) store gather per frame is
    the kind of serial-latency op chain that dominates beam cost)."""

    pb: jnp.ndarray  # (W,) log P(prefix, ending in blank)
    pnb: jnp.ndarray  # (W,) log P(prefix, ending in non-blank)
    h1: jnp.ndarray  # (W,) uint32 prefix hash stream 1
    h2: jnp.ndarray  # (W,) uint32 prefix hash stream 2
    last: jnp.ndarray  # (W,) int32 last char (-1 = empty prefix)
    lm_score: jnp.ndarray  # (W,) accumulated LM + bonus score
    ctx: jnp.ndarray  # (W, k_ctx) int32 char-LM context (char mode)
    wh1: jnp.ndarray  # (W,) uint32 partial-word rolling hash 1
    wh2: jnp.ndarray  # (W,) uint32 partial-word rolling hash 2
    wlen: jnp.ndarray  # (W,) int32 partial-word char count
    wc1: jnp.ndarray  # (W, K) uint32 completed-word context ring 1
    wc2: jnp.ndarray  # (W, K) uint32 completed-word context ring 2


def _probe(tables: HashedTables, k: int, h1, h2):
    """Probe order-k table with hash pair arrays (any shape).
    Returns (found, logp, backoff).

    Linear probing means the n_probes candidate slots are CONSECUTIVE,
    so all of them fetch in ONE gather per array (4 gathers total)
    instead of 4 gathers per probe iteration — the serial gather chain
    was the dominant cost of LM-fused decoding. Open addressing stores
    a key at most once, so the hit mask has at most one True and the
    value extraction is a masked sum, no first-hit select needed."""
    keys1, keys2 = tables.keys1[k], tables.keys2[k]
    cap = keys1.shape[0]
    salt = tables.salts[k] if tables.salts else 0
    slot = _home(h1, cap, salt)
    probes = jnp.arange(tables.n_probes, dtype=jnp.int32)
    idx = (slot[..., None] + probes) % cap  # (..., P)
    hit = (keys1[idx] == h1[..., None]) & (keys2[idx] == h2[..., None])
    # empty slots store (0, 0); an all-zeros query key (empty word /
    # blank ngram) would otherwise "hit" every empty slot in the probe
    # window and sum k*NEG — mask them out, mirroring ops/beam._wprobe
    hit &= (keys1[idx] != 0) | (keys2[idx] != 0)
    found = jnp.any(hit, axis=-1)
    val = jnp.where(
        found, jnp.sum(jnp.where(hit, tables.logps[k][idx], 0.0), axis=-1),
        NEG,
    )
    bo = jnp.sum(jnp.where(hit, tables.backoffs[k][idx], 0.0), axis=-1)
    return found, val, bo


def _fold_tokens(pairs):
    """Fold a list of (t1, t2) uint32 token-hash pairs into one key
    pair (the same chain the packers compute on host)."""
    H1 = jnp.zeros(pairs[0][0].shape, jnp.uint32)
    H2 = jnp.zeros(pairs[0][0].shape, jnp.uint32)
    for t1, t2 in pairs:
        H1 = _mix32(H1, t1, jnp.uint32(_M1))
        H2 = _mix32(H2, t2, jnp.uint32(_M2))
    return H1, H2


def _np_fold_tokens(pairs):
    H1, H2 = np.uint32(0), np.uint32(0)
    for t1, t2 in pairs:
        H1 = _np_mix32(H1, t1, _M1)
        H2 = _np_mix32(H2, t2, _M2)
    return H1, H2


def _char_lm_scores(lm_tables: HashedTables, ctx, c_num):
    """(W, C) log P(c | ctx chars) from hashed char-LM tables with the
    full Katz backoff chain (backoff weights accumulated down the
    orders, exactly the host ArpaLM.score_word recursion)."""
    order = lm_tables.order
    w, k_ctx = ctx.shape
    chars = jnp.arange(c_num, dtype=jnp.uint32)

    def hash_ngram(ctx_tail, c):
        # ctx_tail: (W, m) int32; returns (W, C) pair-hash for each char
        h1 = jnp.zeros((w,), jnp.uint32)
        h2 = jnp.zeros((w,), jnp.uint32)
        for i in range(ctx_tail.shape[1]):
            x = ctx_tail[:, i].astype(jnp.uint32)
            h1 = _mix32(h1, x, jnp.uint32(_M1))
            h2 = _mix32(h2, x, jnp.uint32(_M2))
        h1 = _mix32(h1[:, None], c[None, :], jnp.uint32(_M1))  # (W, C)
        h2 = _mix32(h2[:, None], c[None, :], jnp.uint32(_M2))
        return h1, h2

    score = jnp.full((w, c_num), NEG, jnp.float32)
    resolved = jnp.zeros((w, c_num), bool)
    bo_acc = jnp.zeros((w, c_num), jnp.float32)
    for m in range(order - 1, -1, -1):  # context length m, longest first
        ctx_tail = ctx[:, k_ctx - m:] if m > 0 else ctx[:, :0]
        h1, h2 = hash_ngram(ctx_tail, chars)
        found, val, _ = _probe(lm_tables, m, h1, h2)
        use = found & ~resolved
        score = jnp.where(use, bo_acc + val, score)
        resolved = resolved | found
        if m > 0:
            # accumulate this context's backoff for unresolved entries
            hb1 = jnp.zeros((w,), jnp.uint32)
            hb2 = jnp.zeros((w,), jnp.uint32)
            for i in range(m):
                x = ctx_tail[:, i].astype(jnp.uint32)
                hb1 = _mix32(hb1, x, jnp.uint32(_M1))
                hb2 = _mix32(hb2, x, jnp.uint32(_M2))
            bfound, _, bbo = _probe(
                lm_tables, m - 1, hb1[:, None], hb2[:, None]
            )
            step_bo = jnp.where(bfound, bbo, 0.0)
            bo_acc = jnp.where(resolved, bo_acc, bo_acc + step_bo)
    # OOV floor: characters absent from the LM score a fixed penalty
    # instead of -inf (keeps fusion numerically sane for rare chars).
    return jnp.where(resolved, score, OOV_LOGP)


def dense_char_lm_table(lm_tables: HashedTables, n_class: int):
    """Materialize the char-LM scores for EVERY possible context as a
    dense (R, C) table, R = 1 << (6 * ctx_len): the fused Pallas beam
    kernel (ops/beam.py) cannot probe hash tables (no gathers in
    Mosaic) but can one-hot-matmul a dense table. Built by running the
    SAME `_char_lm_scores` backoff recursion the XLA path uses over
    all bit-packed contexts, so kernel and XLA scores are identical by
    construction. Only orders <= 3 are dense-able (ctx_len <= 2,
    R <= 4096); callers gate on that."""
    from tpuasr.ops.beam import CTX_SHIFT

    k_ctx = max(1, lm_tables.order - 1)
    if k_ctx > 2:
        raise ValueError("dense char-LM tables support order <= 3")
    if n_class > (1 << CTX_SHIFT):
        raise ValueError(f"n_class {n_class} exceeds {1 << CTX_SHIFT}")
    r_num = 1 << (CTX_SHIFT * k_ctx)
    r = np.arange(r_num, dtype=np.int32)
    cols = [(r >> (CTX_SHIFT * (k_ctx - 1 - i))) & ((1 << CTX_SHIFT) - 1)
            for i in range(k_ctx)]  # oldest first, newest last
    ctx = jnp.asarray(np.stack(cols, axis=1))  # (R, k_ctx)
    table = _char_lm_scores(lm_tables, ctx, n_class)  # (R, C)
    return np.asarray(table), k_ctx


def _word_lm_score(wt: HashedTables, bos_unused, wc1, wc2, wh1, wh2):
    """(W,) natural-log P(word | word context) with Katz backoff over
    hashed word tables, mirroring the host ArpaLM.score_word:
      * OOV word (absent as a unigram) -> scored as <unk>;
      * longest context first; each failed level accumulates that
        context's backoff weight (0 when the context has none);
      * absent even as <unk> -> the ARPA -99 log10 floor.
    Also returns the EFFECTIVE token hash pair (word, or <unk> when
    OOV) — that is what enters the context ring, matching the host's
    UNK substitution of out-of-vocabulary context tokens.
    """
    K = wc1.shape[1]  # ring length = order - 1

    uni1, uni2 = _fold_tokens([(wh1, wh2)])
    uni_found, _, _ = _probe(wt, 0, uni1, uni2)
    eff1 = jnp.where(uni_found, wh1, jnp.uint32(UNK_TOK[0]))
    eff2 = jnp.where(uni_found, wh2, jnp.uint32(UNK_TOK[1]))

    score = jnp.zeros(wh1.shape, jnp.float32)
    resolved = jnp.zeros(wh1.shape, bool)
    bo_acc = jnp.zeros(wh1.shape, jnp.float32)
    for m in range(min(wt.order - 1, K), -1, -1):
        ctx_pairs = [(wc1[:, K - m + i], wc2[:, K - m + i]) for i in range(m)]
        kh1, kh2 = _fold_tokens(ctx_pairs + [(eff1, eff2)])
        found, val, _ = _probe(wt, m, kh1, kh2)
        score = jnp.where(found & ~resolved, bo_acc + val, score)
        resolved = resolved | found
        if m > 0:
            bh1, bh2 = _fold_tokens(ctx_pairs)
            bfound, _, bbo = _probe(wt, m - 1, bh1, bh2)
            bo_acc = jnp.where(
                resolved, bo_acc, bo_acc + jnp.where(bfound, bbo, 0.0)
            )
    # Host floor: a word absent even as <unk> still pays the backoff
    # weights of the contexts it fell through (ArpaLM.score_word adds
    # every nonzero backoff before hitting the -99 unigram default).
    score = jnp.where(resolved, score, bo_acc + WORD_OOV_NAT)
    return score, eff1, eff2


def _step(state: BeamState, lp, t, cfg: BeamConfig,
          lm_tables: HashedTables | None, word_tables: HashedTables | None):
    """One time step for one utterance. lp: (C,) log-probs.
    Returns (new_state, (parent (W,), appended_char (W,) with -1 =
    stay)) — the backpointers the host backtracks into prefixes.

    ctcdecode candidate pruning, host-oracle semantics AND a perf win:
    only the top `cutoff_top_n` chars by log-prob (further cut by the
    `cutoff_prob` cumulative mass and the `prune_logp` floor — blank
    bypasses only the floor) enter the extend fan-out, so the candidate
    pool is W + W*n_top instead of W + W*C."""
    w = state.pb.shape[0]
    c_num = lp.shape[0]
    n_top = min(cfg.cutoff_top_n, c_num)

    # top-n candidate chars, descending log-prob (rank order = exact
    # host semantics, no threshold-tie ambiguity)
    top_lp, top_chars = jax.lax.top_k(lp, n_top)  # (n_top,)
    if cfg.cutoff_prob < 1.0:
        cum = jnp.cumsum(jnp.exp(top_lp))
        keep_count = jnp.minimum(jnp.sum(cum < cfg.cutoff_prob) + 1, n_top)
    else:
        keep_count = jnp.asarray(n_top, jnp.int32)
    rank = jnp.arange(n_top, dtype=jnp.int32)
    keep = (rank < keep_count) & (
        (top_lp > cfg.prune_logp) | (top_chars == cfg.blank_id)
    )  # (n_top,)

    p_tot = _lse(state.pb, state.pnb)

    # ---- stay candidates (same prefix) ----
    blank_kept = jnp.any(keep & (top_chars == cfg.blank_id))
    stay_pb = jnp.where(blank_kept, p_tot + lp[cfg.blank_id], NEG)
    last_kept = (state.last >= 0) & jnp.any(
        keep[None, :] & (top_chars[None, :] == state.last[:, None]), axis=1
    )
    stay_pnb = jnp.where(
        last_kept, state.pnb + lp[jnp.maximum(state.last, 0)], NEG
    )

    # ---- extend candidates: (W, n_top) ----
    chars = top_chars[None, :]  # (1, n_top)
    is_repeat = chars == state.last[:, None]
    base = jnp.where(is_repeat, state.pb[:, None], p_tot[:, None])
    ext = base + top_lp[None, :]
    ext = jnp.where((chars == cfg.blank_id) | ~keep[None, :], NEG, ext)

    # LM fusion contribution per extension (ranking score only).
    lm_add = jnp.zeros((w, n_top), jnp.float32)
    if lm_tables is not None and cfg.alpha != 0.0:
        full = cfg.alpha * _char_lm_scores(lm_tables, state.ctx, c_num)
        lm_add = full[:, top_chars]
        if cfg.space_id is not None and cfg.beta != 0.0:
            lm_add = lm_add + jnp.where(chars == cfg.space_id, cfg.beta, 0.0)
    wscore = weff1 = weff2 = None
    if word_tables is not None and cfg.space_id is not None:
        # Completing a word: only the space column gets the word score,
        # and only for beams with a non-empty partial word (the host
        # skips leading/double spaces entirely: no LM term, no beta).
        wscore, weff1, weff2 = _word_lm_score(
            word_tables, None, state.wc1, state.wc2, state.wh1, state.wh2
        )
        word_bonus = jnp.where(
            state.wlen > 0, cfg.alpha * wscore + cfg.beta, 0.0
        )  # (W,)
        lm_add = lm_add + jnp.where(
            chars == cfg.space_id, word_bonus[:, None], 0.0
        )

    ext_h1 = _mix32(state.h1[:, None], chars.astype(jnp.uint32), jnp.uint32(_M1))
    ext_h2 = _mix32(state.h2[:, None], chars.astype(jnp.uint32), jnp.uint32(_M2))

    # ---- EXACT full-pool dedup via stay<->extend absorption ----
    # Beams are distinct prefixes, so two extends can never collide
    # (prefix_j1 + c1 == prefix_j2 + c2 forces j1 == j2), and two stays
    # can't either. The ONLY duplicates are stay_i == extend_(j, c)
    # with prefix_i = prefix_j + c. Absorb every matching extend's CTC
    # mass into stay_i's pnb (the host dict does exactly this), then
    # mask the absorbed extends — the pool is duplicate-free and the
    # old 4W-window sort/merge machinery disappears entirely.
    match = (
        (state.h1[:, None, None] == ext_h1[None, :, :])
        & (state.h2[:, None, None] == ext_h2[None, :, :])
    ).reshape(w, -1)  # (W stays, W*n_top extend candidates)
    ext_flat = ext.reshape(-1)  # (W*n_top,)
    k_max = jnp.maximum(jnp.max(ext_flat), -1e20)
    exp_ext = jnp.where(ext_flat > NEG / 2, jnp.exp(ext_flat - k_max), 0.0)
    absorbed = match.astype(jnp.float32) @ exp_ext  # (W,)
    absorbed_log = jnp.where(absorbed > 0.0, jnp.log(absorbed) + k_max, NEG)
    stay_score_pre = _lse(stay_pb, stay_pnb)
    stay_pnb = _lse(stay_pnb, absorbed_log)
    # Representative identity: if an absorbed extend outweighs the
    # stay, the merged candidate adopts ITS (parent, char) — the
    # decoded text/mass are identical either way (same prefix), but
    # char offsets then follow the DOMINANT alignment's emission frame.
    masked_ext = jnp.where(match, ext_flat[None, :], NEG)
    best_ext_val = jnp.max(masked_ext, axis=1)
    best_ext_idx = jnp.argmax(masked_ext, axis=1)  # flat (parent*n_top+col)
    take_ext = best_ext_val > stay_score_pre
    stay_parent = jnp.where(
        take_ext, (best_ext_idx // n_top).astype(jnp.int32),
        jnp.arange(w, dtype=jnp.int32),
    )
    stay_newchar = jnp.where(
        take_ext, top_chars[best_ext_idx % n_top], jnp.int32(-1)
    )
    ext_flat = jnp.where(jnp.any(match, axis=0), NEG, ext_flat)

    # ---- candidate pool (duplicate-free): stays then extends ----
    cand_pb = jnp.concatenate([stay_pb, jnp.full((w * n_top,), NEG)], 0)
    cand_pnb = jnp.concatenate([stay_pnb, ext_flat], 0)
    cand_h1 = jnp.concatenate([state.h1, ext_h1.reshape(-1)], 0)
    cand_h2 = jnp.concatenate([state.h2, ext_h2.reshape(-1)], 0)
    cand_last = jnp.concatenate(
        [state.last, jnp.broadcast_to(chars, (w, n_top)).reshape(-1)], 0
    )
    cand_parent = jnp.concatenate(
        [
            stay_parent,
            jnp.broadcast_to(
                jnp.arange(w, dtype=jnp.int32)[:, None], (w, n_top)
            ).reshape(-1),
        ],
        0,
    )
    cand_new = jnp.concatenate(
        [stay_newchar,
         jnp.broadcast_to(chars, (w, n_top)).reshape(-1)], 0
    )
    cand_lm = jnp.concatenate(
        [state.lm_score, (state.lm_score[:, None] + lm_add).reshape(-1)], 0
    )

    score = _lse(cand_pb, cand_pnb) + cand_lm
    top_w_score, sel = jax.lax.top_k(score, w)

    new_pb = cand_pb[sel]
    new_pnb = cand_pnb[sel]
    new_h1 = cand_h1[sel]
    new_h2 = cand_h2[sel]
    new_last = cand_last[sel]
    new_lm = cand_lm[sel]
    parent = cand_parent[sel]
    newchar = cand_new[sel]
    extended = newchar >= 0

    # ---- char-LM context update (prefixes themselves live on host) ----
    old_ctx = state.ctx[parent]
    new_ctx = jnp.where(
        extended[:, None],
        jnp.concatenate([old_ctx[:, 1:], jnp.maximum(newchar, 0)[:, None]], 1),
        old_ctx,
    )

    # ---- word-LM per-beam state (untouched — not even gathered — when
    # word fusion is off: every op in the scan body costs serial latency) ----
    new_wh1, new_wh2 = state.wh1, state.wh2
    new_wlen = state.wlen
    new_wc1, new_wc2 = state.wc1, state.wc2
    if word_tables is not None and cfg.space_id is not None:
        new_wh1, new_wh2 = state.wh1[parent], state.wh2[parent]
        new_wlen = state.wlen[parent]
        new_wc1, new_wc2 = state.wc1[parent], state.wc2[parent]
        is_space = extended & (newchar == cfg.space_id)
        closes_word = is_space & (new_wlen > 0)
        # push the completed word's effective hash into the ring
        pe1 = weff1[parent]
        pe2 = weff2[parent]
        pushed1 = jnp.concatenate([new_wc1[:, 1:], pe1[:, None]], 1)
        pushed2 = jnp.concatenate([new_wc2[:, 1:], pe2[:, None]], 1)
        new_wc1 = jnp.where(closes_word[:, None], pushed1, new_wc1)
        new_wc2 = jnp.where(closes_word[:, None], pushed2, new_wc2)
        # extend the partial word with a non-space char
        grows = extended & (newchar != cfg.space_id)
        cu = jnp.maximum(newchar, 0).astype(jnp.uint32)
        new_wh1 = jnp.where(
            is_space, jnp.uint32(0),
            jnp.where(grows, _mix32(new_wh1, cu, jnp.uint32(_M1)), new_wh1),
        )
        new_wh2 = jnp.where(
            is_space, jnp.uint32(0),
            jnp.where(grows, _mix32(new_wh2, cu, jnp.uint32(_M2)), new_wh2),
        )
        new_wlen = jnp.where(
            is_space, 0, jnp.where(grows, new_wlen + 1, new_wlen)
        )

    new_state = BeamState(new_pb, new_pnb, new_h1, new_h2, new_last,
                          new_lm, new_ctx,
                          new_wh1, new_wh2, new_wlen, new_wc1, new_wc2)
    return new_state, (parent, newchar)


def make_beam_search(cfg: BeamConfig, t_cap: int, n_class: int,
                     lm_tables: HashedTables | None = None,
                     word_tables: HashedTables | None = None):
    """Build the jitted batched decoder:
    (logprobs (B,T,C), lengths (B,)) -> (parents (B,T,W) int32,
    chars (B,T,W) int32 with -1 = stay, scores (B,W) UNSORTED) — the
    host backtracks the backpointers into prefixes + frame offsets."""

    def decode_one(logprobs, length):
        w = cfg.beam_width
        pb = jnp.full((w,), NEG).at[0].set(0.0)
        pnb = jnp.full((w,), NEG)
        # distinct initial hashes so empty duplicates don't merge;
        # beam 0 (the live empty prefix) hashes to 0.
        h1 = (jnp.arange(w, dtype=jnp.uint32) + 1).at[0].set(0)
        h2 = (jnp.arange(w, dtype=jnp.uint32) + 1).at[0].set(0)
        last = jnp.full((w,), -1, jnp.int32)
        lm_score = jnp.zeros((w,), jnp.float32)
        k_ctx = 4 if lm_tables is None else max(1, lm_tables.order - 1)
        ctx = jnp.zeros((w, k_ctx), jnp.int32)
        k_word = 1 if word_tables is None else max(1, word_tables.order - 1)
        wc1 = jnp.full((w, k_word), PAD_TOK[0], jnp.uint32)
        wc2 = jnp.full((w, k_word), PAD_TOK[1], jnp.uint32)
        if word_tables is not None:
            # host context starts at (<s>,): BOS is the newest ring slot
            wc1 = wc1.at[:, -1].set(jnp.uint32(BOS_TOK[0]))
            wc2 = wc2.at[:, -1].set(jnp.uint32(BOS_TOK[1]))
        wh1 = jnp.zeros((w,), jnp.uint32)
        wh2 = jnp.zeros((w,), jnp.uint32)
        wlen = jnp.zeros((w,), jnp.int32)
        state0 = BeamState(pb, pnb, h1, h2, last,
                           lm_score, ctx, wh1, wh2, wlen, wc1, wc2)
        iota_w = jnp.arange(w, dtype=jnp.int32)

        def body(state, inp):
            lp, t = inp
            new_state, (parent, newchar) = _step(
                state, lp, t, cfg, lm_tables, word_tables
            )
            keep = t < length
            state = jax.tree.map(
                lambda n, o: jnp.where(
                    keep.reshape((1,) * n.ndim), n, o
                ), new_state, state,
            )
            # frozen (padding) frames emit identity backpointers
            parent = jnp.where(keep, parent, iota_w)
            newchar = jnp.where(keep, newchar, jnp.int32(-1))
            return state, (parent, newchar)

        ts = jnp.arange(logprobs.shape[0], dtype=jnp.int32)
        state, (parents, chars_out) = jax.lax.scan(
            body, state0, (logprobs, ts)
        )
        scores = _lse(state.pb, state.pnb) + state.lm_score
        if word_tables is not None and cfg.space_id is not None:
            # close the final partial word (ctcdecode finish_decoding)
            wscore, _, _ = _word_lm_score(
                word_tables, None, state.wc1, state.wc2, state.wh1, state.wh2
            )
            scores = scores + jnp.where(
                state.wlen > 0, cfg.alpha * wscore + cfg.beta, 0.0
            )
        return parents, chars_out, scores

    @jax.jit
    def decode(logprobs, lengths):
        parents, chars_out, scores = jax.vmap(decode_one)(logprobs, lengths)
        if _packable(cfg.beam_width, n_class):
            # one int16 device->host readout instead of three int32
            # ones: the readout, not the search, bounds decode
            # throughput on tunneled hosts (BASELINE.md round 2)
            return pack_decode_outputs(parents, chars_out, scores)
        return parents, chars_out, scores

    return decode


class DeviceBeamDecoder:
    """Batched on-device beam decoder with the framework decoder API
    plus ctcdecode-parity features: word- OR char-level LM fusion,
    cutoff pruning, n-best, per-char frame offsets."""

    def __init__(self, alphabet: Alphabet, beam_width: int = 10,
                 char_lm=None, word_lm=None, alpha: float = 0.0,
                 beta: float = 0.0, cutoff_top_n: int = 40,
                 cutoff_prob: float = 1.0, prune_logp: float = -20.0,
                 impl: str = "auto"):
        if char_lm is not None and word_lm is not None:
            raise ValueError("pass char_lm or word_lm, not both")
        if impl not in ("auto", "pallas", "xla"):
            raise ValueError(f"impl must be auto|pallas|xla, got {impl!r}")
        self.impl = impl
        self.alphabet = alphabet
        # raw LM objects kept for host fallbacks (long-form decode)
        self.char_lm = char_lm
        self.word_lm = word_lm
        self._lm_tables = (
            pack_lm_tables(char_lm, alphabet) if char_lm is not None else None
        )
        self._word_tables = (
            pack_word_lm_tables(word_lm, alphabet)
            if word_lm is not None else None
        )
        self.cfg = BeamConfig(
            beam_width=beam_width,
            blank_id=alphabet.blank_id,
            space_id=alphabet.space_id,
            alpha=alpha,
            beta=beta,
            cutoff_top_n=cutoff_top_n,
            cutoff_prob=cutoff_prob,
            prune_logp=prune_logp,
        )
        self._cache = {}
        self._warm: set = set()  # (t, c, b) keys past first dispatch
        self._dense_char_table: dict = {}  # n_class -> (table, k_ctx)

    # in-kernel word-LM probing: caps up to MAX_KERNEL_WORD_CAP use the
    # full-table compare (cheapest, zero extra build); bigger tables
    # use the block-fetch MXU path (WideTables), gated by total table
    # VMEM; beyond it the XLA hash-probe path decodes. The round-3
    # "monolithic 14 MiB table input kills the remote compiler" finding
    # did NOT reproduce in round 4 (scripts/wide_lm_repro.py: 512..4096
    # row single-table kernels all compile on-chip), so orders ride as
    # one ref up to 4096 rows (ops/beam.MAX_WIDE_ROWS_PER_REF) and the
    # binding constraint is table VMEM next to the kernel's other
    # buffers (VMEM_LIMIT = 100 MiB); very large tables also roll the
    # time loop to bound Mosaic stack (ops/beam.py time_unroll).
    MAX_KERNEL_WORD_CAP = 8192
    MAX_WIDE_BYTES = 64 * 1024 * 1024
    # Measured on-chip (bench_runs/r5/04): at B=128/W=10 the ROLLED
    # wide body's probe temporaries demand ~56 MiB of scoped-VMEM
    # stack NEXT TO 63 MiB of tables (118.98M vs the 102.69M budget) —
    # ~44 KiB per batch-x-beam row (the (W*B, 14*256) f32 fetch pair
    # dominates). The batch-aware gate below budgets 48 KiB/row with
    # the total capped under the kernel's 100 MiB VMEM limit.
    WIDE_STACK_PER_BW = 48 * 1024
    WIDE_VMEM_BUDGET = 96 * 1024 * 1024

    def _kernel_lm_ineligible(self) -> str | None:
        """Why the fused kernel cannot fuse this decoder's LM (None =
        eligible / no LM)."""
        if self._word_tables is not None:
            wt = self._word_tables
            if wt.order > 3:
                return f"word-LM order {wt.order} > 3"
            caps = [int(k.shape[0]) for k in wt.keys1]
            if any(c > self.MAX_KERNEL_WORD_CAP for c in caps):
                nbytes = wide_tables_bytes(wt)
                if nbytes > self.MAX_WIDE_BYTES:
                    return (f"word-LM wide tables need {nbytes >> 20} MiB "
                            f"VMEM > {self.MAX_WIDE_BYTES >> 20} MiB "
                            f"(caps {caps})")
        if self._lm_tables is not None:
            from tpuasr.ops.beam import CTX_SHIFT

            if self._lm_tables.order > 3:
                return f"char-LM order {self._lm_tables.order} > 3"
            if self.alphabet.size > (1 << CTX_SHIFT):
                return (f"alphabet size {self.alphabet.size} > "
                        f"{1 << CTX_SHIFT}")
        return None

    def _use_pallas(self) -> bool:
        if self.impl == "xla":
            return False
        why_not = self._kernel_lm_ineligible()
        if why_not is not None:
            if self.impl == "pallas":
                # an explicit kernel request must fail loudly, not
                # silently hand back the XLA path
                raise ValueError(
                    f"impl='pallas' requested but the LM cannot fuse "
                    f"in-kernel ({why_not}); use impl='auto'/'xla'"
                )
            return False  # "auto": XLA fusion path
        if self.impl == "pallas":
            return True
        from tpuasr.ops import beam as _ops_beam

        if _ops_beam.INTERPRET:
            return True  # interpreter mode runs anywhere (tests)
        # "auto": the Mosaic kernel needs a TPU
        d = jax.config.jax_default_device
        if d is not None:
            platform = d if isinstance(d, str) else getattr(d, "platform", d)
            return str(platform).lower() != "cpu"
        return jax.default_backend() != "cpu"

    def _kernel_lm_kwargs(self, n_class: int) -> dict:
        """LM kwargs for beam_scan_pallas — the ONE place that decides
        how this decoder's LM rides in the fused kernel (shared by
        _run and the resident eval runner in cli.test)."""
        import jax.numpy as jnp

        # alpha == 0 disables char fusion entirely in the XLA path
        # (including the beta space bonus) — mirror that
        if self._lm_tables is not None and self.cfg.alpha != 0.0:
            if self._dense_char_table.get(n_class) is None:
                self._dense_char_table[n_class] = dense_char_lm_table(
                    self._lm_tables, n_class
                )
            table, k_ctx = self._dense_char_table[n_class]
            return dict(
                char_table=jnp.asarray(table), ctx_len=k_ctx,
                alpha=self.cfg.alpha, beta=self.cfg.beta,
                space_id=self.cfg.space_id,
            )
        if (self._word_tables is not None
                and self.cfg.space_id is not None):
            caps = [int(k.shape[0]) for k in self._word_tables.keys1]
            if any(c > self.MAX_KERNEL_WORD_CAP for c in caps):
                # large-vocabulary path: block-fetch matrices, built
                # once per decoder (round-3: gets 50k+-entry word LMs
                # off the slow XLA hash-probe path)
                if getattr(self, "_word_wide", None) is None:
                    self._word_wide = build_wide_word_tables(
                        self._word_tables
                    )
                return dict(
                    word_wide_tables=self._word_wide,
                    alpha=self.cfg.alpha, beta=self.cfg.beta,
                    space_id=self.cfg.space_id,
                )
            return dict(
                word_tables=self._word_tables,
                alpha=self.cfg.alpha, beta=self.cfg.beta,
                space_id=self.cfg.space_id,
            )
        return {}

    def kernel_fits_batch(self, n_class: int, b: int) -> bool:
        """Batch-aware refinement of the static wide-table gate: the
        block-fetch probe's scratch scales with B*W, so a table set
        that fits at B=32 can blow the scoped-VMEM budget at B=128
        (seen live: wide3's 63 MiB tables OOMed by 16.3 MiB at B=128,
        bench_runs/r5/04). False => decode via the XLA path at this
        batch size (smaller batches may still fuse)."""
        if self._word_tables is None:
            return True
        caps = [int(k.shape[0]) for k in self._word_tables.keys1]
        if all(c <= self.MAX_KERNEL_WORD_CAP for c in caps):
            return True  # small full-compare path: no block-fetch stack
        stack = b * self.cfg.beam_width * self.WIDE_STACK_PER_BW
        return (wide_tables_bytes(self._word_tables) + stack
                <= self.WIDE_VMEM_BUDGET)

    def kernel_sig(self, n_class: int, b: int) -> str:
        """Compile-bomb family signature for the compile watchdog
        (decode/compile_guard.py): the Mosaic body's size/risk is set
        by beam width, class count, batch, and the fused LM tables —
        NOT by total T (the time loop is chunked/rolled), so T is
        deliberately excluded and resident-eval and batch decodes of
        the same config share one blocklist entry."""
        if self._word_tables is not None:
            caps = tuple(int(k.shape[0]) for k in self._word_tables.keys1)
            lm = f"word:caps={caps}"
        elif self._lm_tables is not None:
            lm = f"char:order={self._lm_tables.order}"
        else:
            lm = "none"
        return (f"W={self.cfg.beam_width}|C={n_class}|B={b}|lm={lm}|"
                f"ctn={self.cfg.cutoff_top_n}")

    def _build_kernel(self, n_class: int):
        """The jitted fused-kernel callable (packed outputs when the
        (W, C) fit int8 packing)."""
        from functools import partial

        from tpuasr.ops.beam import beam_scan_pallas

        lm_kw = self._kernel_lm_kwargs(n_class)
        kernel = partial(
            beam_scan_pallas,
            beam_width=self.cfg.beam_width,
            blank_id=self.cfg.blank_id,
            cutoff_top_n=self.cfg.cutoff_top_n,
            cutoff_prob=self.cfg.cutoff_prob,
            prune_logp=self.cfg.prune_logp,
            **lm_kw,
        )
        if _packable(self.cfg.beam_width, n_class):
            def packed(lp, lens, _k=kernel):
                return pack_decode_outputs(*_k(lp, lens))

            return jax.jit(packed)
        return jax.jit(kernel)

    def _run(self, logits, lengths, track_offsets: bool = True):
        logits = jnp.asarray(logits)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        t_cap, n_class = logits.shape[1], logits.shape[2]
        # The wide-table kernel stacks beams on the sublane axis
        # ((W*B, R) one-hot fetch, ops/beam._wprobe_wide); Mosaic
        # rejects that concat when B is not a multiple of the 8-row
        # sublane tile. Pad ragged batches up (zero logits, length 1)
        # and strip the rows after backtracking — cheaper than the
        # per-beam kernel restructure, whose ~10x bigger unrolled
        # program never returned from the remote compiler.
        b_in = logprobs.shape[0]
        pad_b = 0
        if self._word_tables is not None and self._use_pallas():
            caps = [int(k.shape[0]) for k in self._word_tables.keys1]
            if any(c > self.MAX_KERNEL_WORD_CAP for c in caps):
                pad_b = -b_in % 8
        if pad_b:
            logprobs = jnp.concatenate(
                [logprobs,
                 jnp.zeros((pad_b, t_cap, n_class), logprobs.dtype)],
                axis=0)
            lengths = jnp.concatenate(
                [jnp.asarray(lengths, jnp.int32),
                 jnp.ones((pad_b,), jnp.int32)], axis=0)
        b_pad = logprobs.shape[0]
        key = (t_cap, n_class, b_pad)
        sig = self.kernel_sig(n_class, b_pad)
        if key not in self._cache:
            from tpuasr.decode import compile_guard

            want_pallas = self._use_pallas()
            if want_pallas and not self.kernel_fits_batch(n_class, b_pad):
                import sys

                print(f"tpuasr: wide word-LM tables + B={b_pad} probe "
                      f"stack exceed the kernel VMEM budget — decoding "
                      f"via the XLA path at this batch size",
                      file=sys.stderr, flush=True)
                want_pallas = False
            if want_pallas and not compile_guard.blocklisted(sig):
                self._cache[key] = (self._build_kernel(n_class), True)
            else:
                self._cache[key] = (make_beam_search(
                    self.cfg, t_cap, n_class, self._lm_tables,
                    self._word_tables
                ), False)
        fn, is_pallas = self._cache[key]
        if is_pallas and key not in self._warm:
            # first dispatch compiles — run it under the watchdog so a
            # pathological Mosaic compile (two hit in round 4) cannot
            # wedge the CLI; on expiry the config is blocklisted and
            # this decode (and all future ones) takes the XLA path
            from tpuasr.decode import compile_guard

            try:
                out = compile_guard.run_guarded(
                    lambda: jax.block_until_ready(
                        fn(logprobs, jnp.asarray(lengths))), sig)
            except compile_guard.BeamCompileFallback as e:
                import sys

                print(f"tpuasr: WARNING: {e}", file=sys.stderr,
                      flush=True)
                fn = make_beam_search(self.cfg, t_cap, n_class,
                                      self._lm_tables, self._word_tables)
                self._cache[key] = (fn, False)
                out = fn(logprobs, jnp.asarray(lengths))
        else:
            out = fn(logprobs, jnp.asarray(lengths))
        self._warm.add(key)
        if isinstance(out, tuple):
            parents, chars, scores = (np.asarray(x) for x in out)
        else:
            parents, chars, scores = unpack_decode_outputs(
                np.asarray(out), t_cap, self.cfg.beam_width
            )
        res = _backtrack(parents, chars, scores)
        if pad_b:
            res = tuple(a[:b_in] for a in res)
        return res

    def _readout(self, store_row, toff_row, n):
        """ids (+frames) -> (stripped text, aligned offsets)."""
        raw = self.alphabet.decode(store_row[:n])
        frames = toff_row[:n]
        lead = len(raw) - len(raw.lstrip())
        kept = len(raw.strip())
        return raw.strip(), frames[lead:lead + kept]

    # -- public surface for external runners (decode/resident_eval.py) --

    def kernel_eligible(self) -> bool:
        """True when this decoder's whole search (incl. any LM fusion)
        runs in the fused Pallas kernel — the precondition for the
        resident eval-in-a-scan runner."""
        return self._use_pallas()

    def kernel_lm_kwargs(self, n_class: int) -> dict:
        """LM-fusion kwargs for ops.beam.beam_scan_pallas, derived from
        this decoder's configuration (single source of truth)."""
        return self._kernel_lm_kwargs(n_class)

    def readout(self, store_row, toff_row, n):
        """Backtracked id/frame rows -> (stripped text, aligned
        offsets); the host half of any packed-kernel readout."""
        return self._readout(store_row, toff_row, n)

    def decode(self, logits, lengths, return_offsets: bool = False):
        store, toff, blen, _ = self._run(logits, lengths,
                                         track_offsets=return_offsets)
        texts, offsets = [], []
        for b in range(store.shape[0]):
            text, offs = self._readout(store[b, 0], toff[b, 0], blen[b, 0])
            texts.append(text)
            offsets.append(offs)
        if return_offsets:
            return texts, offsets
        return texts

    def decode_nbest(self, logits, lengths, n_best: int | None = None):
        """Per utterance: [(text, score, offsets)] best-first, deduped
        (the beam can hold the same prefix as blank/non-blank split
        only transiently; identical texts are merged keeping the best
        score)."""
        store, toff, blen, scores = self._run(logits, lengths)
        n_best = n_best or self.cfg.beam_width
        out = []
        for b in range(store.shape[0]):
            rows, seen = [], set()
            for w in range(store.shape[1]):
                if len(rows) >= n_best:
                    break
                text, offs = self._readout(store[b, w], toff[b, w], blen[b, w])
                if text in seen:
                    continue
                seen.add(text)
                rows.append((text, float(scores[b, w]), offs))
            out.append(rows)
        return out


def pack_decode_outputs(parents, chars, scores):
    """Fold (parents (B,T,W) int, chars (B,T,W) int, scores (B,W) f32)
    into ONE int16 array (B, T*W + 2W) — device side, inside jit.

    Rationale: each device->host readout costs a fixed round trip
    (tens of ms on tunneled hosts, BASELINE.md) — one packed transfer
    beats three. Backpointers use 15 bits (parent*128 + char+1, valid
    for W <= 254 / C <= 126 — caller checks); scores ship as raw f32
    bits split into two int16 lanes."""
    b, t, w = parents.shape
    bp = (parents.astype(jnp.int32) * 128
          + (chars.astype(jnp.int32) + 1)).astype(jnp.int16)
    bits = jax.lax.bitcast_convert_type(
        scores.astype(jnp.float32), jnp.int32
    )
    lo = (bits & 0xFFFF).astype(jnp.uint16)
    hi = ((bits >> 16) & 0xFFFF).astype(jnp.uint16)
    return jnp.concatenate(
        [bp.reshape(b, t * w),
         jax.lax.bitcast_convert_type(lo, jnp.int16),
         jax.lax.bitcast_convert_type(hi, jnp.int16)], axis=1
    )


def unpack_decode_outputs(raw: np.ndarray, t: int, w: int):
    """Host-side inverse of pack_decode_outputs."""
    b = raw.shape[0]
    bp = raw[:, : t * w].astype(np.int32).reshape(b, t, w)
    parents = bp >> 7
    chars = (bp & 127) - 1
    lo = raw[:, t * w: t * w + w].view(np.uint16).astype(np.uint32)
    hi = raw[:, t * w + w:].view(np.uint16).astype(np.uint32)
    scores = ((hi << 16) | lo).view(np.float32)
    return parents, chars, scores


def _packable(beam_width: int, n_class: int) -> bool:
    return beam_width <= 254 and n_class <= 126


def _backtrack(parents: np.ndarray, chars: np.ndarray, scores: np.ndarray):
    """Backpointers -> (store (B,W,T), toff (B,W,T), blen (B,W),
    scores (B,W)), beams sorted best-first per utterance.

    Walking t = T-1..0 with the (B, W) lineage cursor records, for each
    final beam, the char appended at every frame along its own history
    (-1 where it stayed); reading those in ascending t IS the prefix,
    and the frame indices ARE the per-char offsets.
    """
    b_n, t_n, w_n = chars.shape
    bidx = np.arange(b_n)[:, None]
    cur = np.broadcast_to(np.arange(w_n), (b_n, w_n)).copy()
    lineage = np.empty((b_n, t_n, w_n), np.int32)
    for t in range(t_n - 1, -1, -1):
        lineage[:, t, :] = chars[bidx, t, cur]
        cur = parents[bidx, t, cur]
    store = np.zeros((b_n, w_n, t_n), np.int32)
    toff = np.zeros((b_n, w_n, t_n), np.int32)
    blen = np.zeros((b_n, w_n), np.int32)
    order = np.argsort(-scores, axis=1)
    out_scores = np.take_along_axis(scores, order, axis=1)
    for b in range(b_n):
        for rank, w in enumerate(order[b]):
            frames = np.nonzero(lineage[b, :, w] >= 0)[0]
            n = len(frames)
            store[b, rank, :n] = lineage[b, frames, w]
            toff[b, rank, :n] = frames
            blen[b, rank] = n
    return store, toff, blen, out_scores


# ---------------------------------------------------------------------------
# Host-side table packing (drop-free: capacity grows until every entry
# places within n_probes linear probes of its home slot)
# ---------------------------------------------------------------------------


def _assign_windows(homes, cap: int, n_probes: int):
    """Place every key in SOME slot of its probe window [home, home +
    n_probes) mod cap, or return None if impossible at this capacity.

    Every lookup path (XLA ``_probe``, kernel ``_wprobe`` /
    ``_wprobe_wide``) compares ALL n_probes window slots
    unconditionally — there is no empty-slot early exit — so a key's
    position WITHIN its window is semantically free. That turns
    placement into bipartite matching (key -> any window slot), solved
    with Kuhn's augmenting paths: greedy first-empty insertion for the
    common case, and when a key finds its window full, a BFS
    augmentation re-arranges earlier keys within their OWN windows
    before giving up. Round-4 motivation: greedy-only insertion hit one
    8-long cluster in a 2012-entry trigram and doubled the table twice
    (load 0.12), pushing a tiny LM onto the wide block-fetch path.

    Returns an int64 array: slot index per key."""
    owner = np.full(cap, -1, np.int64)       # slot -> key index
    assigned = np.full(len(homes), -1, np.int64)  # key index -> slot

    def window(k):
        h = homes[k]
        return [(h + j) % cap for j in range(n_probes)]

    from collections import deque

    for u in range(len(homes)):
        placed = False
        for s in window(u):
            if owner[s] < 0:
                owner[s], assigned[u] = u, s
                placed = True
                break
        if placed:
            continue
        # augment: BFS over alternating (key -> window slot -> owner)
        slot_from: dict = {}
        q = deque([u])
        free = None
        while q and free is None:
            k = q.popleft()
            for s in window(k):
                if s in slot_from:
                    continue
                slot_from[s] = k
                if owner[s] < 0:
                    free = s
                    break
                q.append(int(owner[s]))
        if free is None:
            return None  # no perfect matching at this capacity
        s = free
        while True:
            k = slot_from[s]
            prev = int(assigned[k])
            owner[s], assigned[k] = k, s
            if k == u:
                break
            s = prev
    return assigned


# Home-salt schedule per capacity: salt 0 (historical h1 % cap) first,
# then re-mixed homes. A failed matching is usually ONE dense home
# cluster (an interval-Hall violation — with 8-slot windows and 10^5+
# keys, a single 9-dense run forces it even for uniform hashes, and
# token hashes are not uniform); re-salting re-rolls the layout for
# free, where doubling pays 2x VMEM on every probe forever. Salting
# also removes a liveness hole: >= 8 keys whose h1 share all low bits
# (h1 % cap equal at EVERY pow2 cap) used to double capacity forever.
_PACK_SALTS = (0, 1, 2, 3, 5, 9)


def _pack_table(items, n_probes: int):
    """items: list of (h1, h2, logp_nat, bo_nat). Returns uint32 key
    arrays + float32 value arrays + the home salt used. NEVER drops an
    entry: capacity starts at load ~0.8; when ``_assign_windows`` finds
    no placement that keeps every entry within ``n_probes`` linear
    probes of its home slot (the device lookup budget), the homes are
    re-salted through ``_PACK_SALTS`` before capacity doubles."""
    n = max(len(items), 1)
    cap = n_probes  # floor: a cap below n_probes would wrap the probe
    # window onto itself and the lookup's masked SUM would double-count
    # the hit slot (caught by test_char_lm_device_scores_match_arpa)
    while cap * 4 < n * 5:  # cap >= 1.25 * n  (target load 0.8)
        cap *= 2
    keys = []
    for h1, h2, l, b in items:
        if h1 == 0 and h2 == 0:
            # (0,0) marks an empty slot; nudge (lookup of this key
            # then misses — a ~2^-64 event, vs. corrupting the table)
            h2 = np.uint32(1)
        keys.append((np.uint32(h1), np.uint32(h2), l, b))
    while True:
        for salt in _PACK_SALTS:
            homes = [_np_home(h1, cap, salt) for h1, _, _, _ in keys]
            slots = _assign_windows(homes, cap, n_probes) \
                if keys else np.zeros(0, np.int64)
            if slots is not None:
                k1 = np.zeros(cap, np.uint32)
                k2 = np.zeros(cap, np.uint32)
                lp = np.full(cap, NEG, np.float32)
                bo = np.zeros(cap, np.float32)
                for (h1, h2, l, b), s in zip(keys, slots):
                    k1[s], k2[s] = h1, h2
                    lp[s], bo[s] = l, b
                return (jnp.asarray(k1), jnp.asarray(k2),
                        jnp.asarray(lp), jnp.asarray(bo), salt)
        cap *= 2


def pack_lm_tables(char_lm, alphabet: Alphabet) -> HashedTables:
    """Convert a char-level ArpaLM into device arrays keyed by the
    SAME rolling 2x32-bit hashes the kernel computes over class ids."""
    if getattr(char_lm, "ngrams", None) is None:
        raise ValueError(
            "device LM fusion needs an enumerable LM (ARPA text); a "
            "KenLM probing binary stores only opaque hashes — convert "
            "to ARPA or use the host/native beam decoder"
        )
    import math as _math

    ln10 = _math.log(10.0)
    n_probes = 8

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

    keys1, keys2, logps, backoffs, salts = [], [], [], [], []
    for table in char_lm.ngrams:
        items = []
        for toks, (logp, b) in table.items():
            ids = ids_of(toks)
            if ids is None:
                continue  # multi-char / non-alphabet token: unreachable by the beam
            h1 = _np_hash_ids(ids, _M1)
            h2 = _np_hash_ids(ids, _M2)
            items.append((h1, h2, logp * ln10, b * ln10))
        k1, k2, lp, bo, salt = _pack_table(items, n_probes)
        keys1.append(k1)
        keys2.append(k2)
        logps.append(lp)
        backoffs.append(bo)
        salts.append(salt)
    return HashedTables(tuple(keys1), tuple(keys2), tuple(logps),
                        tuple(backoffs), char_lm.order, n_probes,
                        tuple(salts))


def word_token_hash(word: str, alphabet: Alphabet):
    """Token hash pair for a vocabulary word = the rolling char-id hash
    the beam accumulates while typing it. Reserved tokens (<s>, </s>,
    <unk>) get fixed pairs the beam can never produce."""
    if word == "<s>":
        return BOS_TOK
    if word == "</s>":
        return EOS_TOK
    if word == "<unk>":
        return UNK_TOK
    ids = alphabet.encode(word)
    if alphabet.decode(ids) != word:
        return None  # not producible by the beam (case/charset mismatch)
    return (_np_hash_ids(ids, _M1), _np_hash_ids(ids, _M2))


def pack_word_lm_tables(word_lm, alphabet: Alphabet) -> HashedTables:
    """Convert a WORD-level ArpaLM into device hash tables. Each
    n-gram's key folds the token hash pairs of its words; tokens whose
    characters don't round-trip through the alphabet (e.g. a lowercase
    LM against an uppercase alphabet — the host oracle treats those
    words as OOV too) are skipped as unreachable."""
    if getattr(word_lm, "ngrams", None) is None:
        raise ValueError(
            "device LM fusion needs an enumerable LM (ARPA text); a "
            "KenLM probing binary stores only opaque hashes — convert "
            "to ARPA or use the host/native beam decoder"
        )
    import math as _math

    ln10 = _math.log(10.0)
    n_probes = 8
    cache: dict = {}

    def tok(wordstr):
        if wordstr not in cache:
            cache[wordstr] = word_token_hash(wordstr, alphabet)
        return cache[wordstr]

    keys1, keys2, logps, backoffs, salts = [], [], [], [], []
    for table in word_lm.ngrams:
        items = []
        for toks, (logp, b) in table.items():
            pairs = [tok(t) for t in toks]
            if any(p is None for p in pairs):
                continue
            h1, h2 = _np_fold_tokens(pairs)
            items.append((h1, h2, logp * ln10, b * ln10))
        k1, k2, lp, bo, salt = _pack_table(items, n_probes)
        keys1.append(k1)
        keys2.append(k2)
        logps.append(lp)
        backoffs.append(bo)
        salts.append(salt)
    return HashedTables(tuple(keys1), tuple(keys2), tuple(logps),
                        tuple(backoffs), word_lm.order, n_probes,
                        tuple(salts))
