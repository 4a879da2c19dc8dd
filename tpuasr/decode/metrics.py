"""WER / CER metrics.

Reference parity: ``Decoder.wer()`` / ``Decoder.cer()`` in
ref:decoder.py — Levenshtein distance over words / characters. The
reference aggregate (ref:test.py) sums per-utterance distances and
divides by total reference token count; ``ErrorRateMeter`` reproduces
that exactly. Pure NumPy (eval-time only — not a hot path; the
reference used the python-Levenshtein C extension, SURVEY.md §3.2).
"""

from __future__ import annotations

import numpy as np


def _lev_dp(a, b) -> int:
    if len(a) < len(b):
        a, b = b, a
    if len(b) == 0:
        return len(a)
    bn = np.array(list(b) if isinstance(b, str) else list(b), dtype=object)
    prev = np.arange(len(b) + 1, dtype=np.int64)
    for i, ca in enumerate(a, start=1):
        sub = prev[:-1] + (bn != ca)
        cur = np.empty_like(prev)
        cur[0] = i
        for j in range(1, len(b) + 1):
            cur[j] = min(sub[j - 1], prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    return int(prev[-1])


def levenshtein(a, b) -> int:
    """Edit distance between two sequences (str or list)."""
    return _lev_dp(a, b)


def word_errors(hyp: str, ref: str) -> tuple[int, int]:
    """(edit distance over words, number of reference words)."""
    h, r = hyp.split(), ref.split()
    return _lev_dp(h, r), len(r)


def char_errors(hyp: str, ref: str) -> tuple[int, int]:
    """(edit distance over characters, number of reference chars).
    Spaces count as characters (matching the reference family's
    ``cer`` over the raw strings)."""
    return _lev_dp(hyp, ref), len(ref)


def wer(hyp: str, ref: str) -> float:
    d, n = word_errors(hyp, ref)
    return d / max(n, 1)


def cer(hyp: str, ref: str) -> float:
    d, n = char_errors(hyp, ref)
    return d / max(n, 1)


class ErrorRateMeter:
    """Accumulates the reference's aggregate WER/CER
    (sum of distances / sum of reference lengths, x100)."""

    def __init__(self):
        self.word_dist = 0
        self.word_count = 0
        self.char_dist = 0
        self.char_count = 0
        self.n_utts = 0

    def update(self, hyp: str, ref: str) -> None:
        wd, wc = word_errors(hyp, ref)
        cd, cc = char_errors(hyp, ref)
        self.word_dist += wd
        self.word_count += wc
        self.char_dist += cd
        self.char_count += cc
        self.n_utts += 1

    @property
    def wer(self) -> float:
        return 100.0 * self.word_dist / max(self.word_count, 1)

    @property
    def cer(self) -> float:
        return 100.0 * self.char_dist / max(self.char_count, 1)
