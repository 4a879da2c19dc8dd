"""Host CTC prefix beam search with n-gram LM shallow fusion.

Reference parity: the ctcdecode C++ extension (parlance) the reference
wraps as ``BeamCTCDecoder`` (ref:decoder.py; SURVEY.md §3.2) — CTC
prefix beam search (Hannun et al. 2014) over per-frame posteriors with
word-level KenLM fusion: score = log P_ctc + alpha*log P_lm + beta*|words|,
LM applied as each word completes (space emitted) and once at the end.

This pure-Python implementation is the correctness oracle for the
on-device decoder (tpuasr.decode.beam) and the exact-parity path for
ctcdecode comparisons; the C++ native version (native/) accelerates
the same algorithm for host batch eval.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from tpuasr.decode.lm import ArpaLM, BOS
from tpuasr.labels import Alphabet

LOG0 = -1e30
LN10 = math.log(10.0)


def _lse(a: float, b: float) -> float:
    if a < b:
        a, b = b, a
    if b <= LOG0 / 2:
        return a
    return a + math.log1p(math.exp(b - a))


def prefix_beam_search(
    logprobs: np.ndarray,
    alphabet: Alphabet,
    beam_width: int = 10,
    lm: ArpaLM | None = None,
    alpha: float = 0.8,
    beta: float = 1.0,
    cutoff_top_n: int = 40,
    cutoff_prob: float = 1.0,
    prune_logp: float = -20.0,
) -> list[tuple[str, float]]:
    """Decode one utterance.

    Args:
      logprobs: (T, C) natural-log posteriors (log_softmax of logits).
      alphabet: label mapping; blank = alphabet.blank_id; word
        delimiter = space.
      lm: optional word ArpaLM for shallow fusion.
    Returns:
      beams as (text, total_score) sorted best-first.
    """
    beams = beam_init()
    for t in range(logprobs.shape[0]):
        beams = beam_step(beams, logprobs[t], alphabet, beam_width, lm,
                          alpha, beta, cutoff_top_n, cutoff_prob,
                          prune_logp)
    return beam_results(beams, alphabet, lm, alpha, beta)


def beam_init() -> dict:
    """Fresh beam state: prefix tuple -> [log_pb, log_pnb, lm_score,
    n_words]. The state is a plain dict so callers (the streaming
    transcriber) can carry it across logit chunks."""
    return {(): [0.0, LOG0, 0.0, 0]}


def beam_step(beams: dict, lp: np.ndarray, alphabet: Alphabet,
              beam_width: int, lm: ArpaLM | None = None,
              alpha: float = 0.8, beta: float = 1.0,
              cutoff_top_n: int = 40, cutoff_prob: float = 1.0,
              prune_logp: float = -20.0) -> dict:
    """Advance the beam state by ONE frame of (C,) log-posteriors."""
    blank = alphabet.blank_id
    space = alphabet.space_id
    n_class = lp.shape[0]
    # candidate chars: top-n / cumulative cutoff pruning (ctcdecode's
    # cutoff_top_n / cutoff_prob)
    order = np.argsort(-lp)
    if cutoff_prob < 1.0:
        cum = np.cumsum(np.exp(lp[order]))
        keep = int(np.searchsorted(cum, cutoff_prob) + 1)
    else:
        keep = n_class
    cand = [c for c in order[: min(keep, cutoff_top_n)]
            if lp[c] > prune_logp or c == blank]

    nxt: dict = defaultdict(lambda: [LOG0, LOG0, 0.0, 0])

    for prefix, (pb, pnb, lms, nw) in beams.items():
        p_tot = _lse(pb, pnb)
        last = prefix[-1] if prefix else None

        for c in cand:
            lpc = float(lp[c])
            if c == blank:
                e = nxt[prefix]
                e[0] = _lse(e[0], p_tot + lpc)
                e[2], e[3] = lms, nw
                continue
            if c == last:
                # repeat without blank: stays same prefix
                e = nxt[prefix]
                e[1] = _lse(e[1], pnb + lpc)
                e[2], e[3] = lms, nw
                # with blank in between: extends
                contrib = pb + lpc
            else:
                contrib = p_tot + lpc
            new_prefix = prefix + (c,)
            lms_new, nw_new = lms, nw
            if lm is not None and c == space:
                word = _last_word(prefix, alphabet, space)
                if word:
                    ctx = _context(prefix, alphabet, space)
                    lms_new = lms + alpha * LN10 * lm.score_word(ctx, word) + beta
                    nw_new = nw + 1
            e = nxt[new_prefix]
            e[1] = _lse(e[1], contrib)
            e[2], e[3] = lms_new, nw_new

    # keep top beams by ctc + lm score
    scored = sorted(
        nxt.items(),
        key=lambda kv: -(_lse(kv[1][0], kv[1][1]) + kv[1][2]),
    )
    return dict(scored[:beam_width])


def beam_results(beams: dict, alphabet: Alphabet,
                 lm: ArpaLM | None = None, alpha: float = 0.8,
                 beta: float = 1.0) -> list[tuple[str, float]]:
    """Finalize a beam state: close partial words against the LM
    (ctcdecode finish_decoding) and return (text, score) best-first."""
    space = alphabet.space_id
    results = []
    for prefix, (pb, pnb, lms, nw) in beams.items():
        total = _lse(pb, pnb) + lms
        if lm is not None:
            word = _last_word(prefix, alphabet, space)
            if word:
                ctx = _context(prefix + (space,), alphabet, space)
                total += alpha * LN10 * lm.score_word(ctx, word) + beta
        results.append((alphabet.decode(prefix), total))
    results.sort(key=lambda x: -x[1])
    return results


def _last_word(prefix: tuple, alphabet: Alphabet, space: int) -> str:
    """Characters since the previous space (the word just completed)."""
    chars = []
    for c in reversed(prefix):
        if c == space:
            break
        chars.append(c)
    return alphabet.decode(reversed(chars))


def _context(prefix: tuple, alphabet: Alphabet, space: int) -> tuple:
    """Completed words before the word being closed, BOS-prefixed."""
    text = alphabet.decode(prefix).strip()
    words = text.split()
    return (BOS,) + tuple(words[:-1]) if words else (BOS,)


class BeamCTCDecoder:
    """Reference-API beam decoder (ref:decoder.py BeamCTCDecoder):
    wraps prefix_beam_search over a batch of logits."""

    def __init__(
        self,
        alphabet: Alphabet,
        lm_path: str | None = None,
        alpha: float = 0.8,
        beta: float = 1.0,
        beam_width: int = 10,
        cutoff_top_n: int = 40,
        cutoff_prob: float = 1.0,
        num_processes: int = 1,
    ):
        from tpuasr.decode.lm import load_lm

        self.alphabet = alphabet
        self.lm = load_lm(lm_path) if lm_path else None  # ARPA or KenLM binary
        self.alpha = alpha
        self.beta = beta
        self.beam_width = beam_width
        self.cutoff_top_n = cutoff_top_n
        self.cutoff_prob = cutoff_prob

    def decode(self, logits, lengths, return_offsets: bool = False):
        import jax.nn

        logprobs = np.asarray(jax.nn.log_softmax(logits, axis=-1))
        lengths = np.asarray(lengths)
        texts = []
        for b in range(logprobs.shape[0]):
            res = prefix_beam_search(
                logprobs[b, : int(lengths[b])],
                self.alphabet,
                beam_width=self.beam_width,
                lm=self.lm,
                alpha=self.alpha,
                beta=self.beta,
                cutoff_top_n=self.cutoff_top_n,
                cutoff_prob=self.cutoff_prob,
            )
            texts.append(res[0][0].strip() if res else "")
        if return_offsets:
            return texts, [np.array([], np.int64)] * len(texts)
        return texts
