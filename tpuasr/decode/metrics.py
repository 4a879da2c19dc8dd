"""WER / CER metrics.

Reference parity: ``Decoder.wer()`` / ``Decoder.cer()`` in
ref:decoder.py — Levenshtein distance over words / characters. The
reference aggregate (ref:test.py) sums per-utterance distances and
divides by total reference token count; ``ErrorRateMeter`` reproduces
that exactly.

The reference used the python-Levenshtein C extension (SURVEY.md
§3.2); here the distance runs in the native C++ lib when built
(``make -C native``, same .so as the host beam decoder) and otherwise
in fully vectorized NumPy — the row recurrence's horizontal dependency
``cur[j] = min(..., cur[j-1]+1)`` resolves in one pass as
``minimum.accumulate(c - arange) + arange``. Batch eval scores
thousands of utterances on one host core; a Python-level inner loop
here was the cli.test bottleneck.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_NATIVE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "libtpuasr_native.so",
)
_native_dist = None


def _load_native():
    global _native_dist
    if _native_dist is not None:
        return _native_dist
    try:
        if not os.path.exists(_NATIVE_PATH):
            # the .so is untracked (built artifact): build on first use
            import subprocess

            subprocess.run(
                ["make", "-C", os.path.dirname(_NATIVE_PATH)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_NATIVE_PATH)
        fn = lib.tpuasr_edit_distance
        fn.restype = ctypes.c_int32
        i32p = ctypes.POINTER(ctypes.c_int32)
        fn.argtypes = [i32p, ctypes.c_int32, i32p, ctypes.c_int32]
        _native_dist = fn
    except Exception:
        _native_dist = False  # lib missing or unbuildable: NumPy fallback
    return _native_dist


def _to_ids(seq) -> np.ndarray:
    """Tokens -> int32 codes. Chars use their codepoints; arbitrary
    hashables (words) are interned per call pair via _lev_dp."""
    return np.array([ord(c) for c in seq], dtype=np.int32)


def _lev_dp(a, b) -> int:
    if len(a) < len(b):
        a, b = b, a
    if len(b) == 0:
        return len(a)
    if isinstance(a, str):
        ai, bi = _to_ids(a), _to_ids(b)
    else:  # word lists: intern tokens to ids
        vocab: dict = {}
        ai = np.array([vocab.setdefault(t, len(vocab)) for t in a], np.int32)
        bi = np.array([vocab.setdefault(t, len(vocab)) for t in b], np.int32)
    fn = _load_native()
    if fn:
        return int(fn(
            ai.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(ai),
            bi.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(bi),
        ))
    nb = len(bi)
    ar = np.arange(nb + 1, dtype=np.int64)
    prev = ar.copy()
    c = np.empty(nb + 1, dtype=np.int64)
    for i in range(1, len(ai) + 1):
        # c[j] = min(prev[j-1] + subst, prev[j] + 1) for j>=1; c[0] = i
        np.minimum(prev[:-1] + (bi != ai[i - 1]), prev[1:] + 1, out=c[1:])
        c[0] = i
        # cur[j] = min_{k<=j} (c[k] + j - k): one accumulate pass
        prev = np.minimum.accumulate(c - ar) + ar
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
