"""Greedy (best-path) CTC decoding.

Reference parity: ``GreedyDecoder`` in ref:decoder.py — per-timestep
argmax, collapse repeats, drop blanks, optional per-character frame
offsets (used by ref:transcribe.py).

TPU-first split: the argmax + repeat-collapse mask runs on device over
the whole padded batch in one jitted call (pure elementwise/argmax —
VPU work, fused by XLA); only the final ragged string assembly runs on
host (strings cannot live on a TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.labels import Alphabet


from functools import partial


@partial(jax.jit, static_argnames=("blank_id",))
def greedy_best_path(logits: jnp.ndarray, lengths: jnp.ndarray,
                     blank_id: int = 0):
    """(B, T, C) logits (or log-probs — argmax is invariant) -> per-frame
    best ids (B, T) plus an emission mask (B, T) that is True exactly at
    frames contributing a character after CTC collapse."""
    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B, T)
    prev = jnp.pad(ids, ((0, 0), (1, 0)), constant_values=-1)[:, :-1]
    t = jnp.arange(ids.shape[1], dtype=jnp.int32)[None, :]
    emit = (ids != blank_id) & (ids != prev) & (t < lengths[:, None])
    return ids, emit


class GreedyDecoder:
    """String-level greedy decoder with the reference's API surface:
    ``decode(logits, lengths)`` -> (transcripts, offsets)."""

    def __init__(self, alphabet: Alphabet):
        self.alphabet = alphabet
        self._blank = alphabet.blank_id

    def decode(self, logits, lengths, return_offsets: bool = False):
        ids, emit = greedy_best_path(
            jnp.asarray(logits), jnp.asarray(lengths), blank_id=self._blank
        )
        ids = np.asarray(ids)
        emit = np.asarray(emit)
        texts, offsets = [], []
        for b in range(ids.shape[0]):
            frames = np.nonzero(emit[b])[0]
            texts.append(self.alphabet.decode(ids[b, frames]))
            offsets.append(frames)
        if return_offsets:
            return texts, offsets
        return texts

    def convert_to_strings(self, label_seqs) -> list[str]:
        """Reference-parity helper (GreedyDecoder.convert_to_strings):
        integer target sequences -> strings."""
        return [self.alphabet.decode(seq) for seq in label_seqs]
