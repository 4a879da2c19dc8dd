"""Device-resident incremental beam search for streaming serving.

Round-4 measurement (BASELINE.md stream table): at 8 concurrent
streams the stateful host C++ beam sessions add ~35 ms of host work
per tick (greedy 30.8 ms/step vs beam 65.9), a 2.1x aggregate gap —
the beam math ran per-stream on one CPU core while the TPU idled.
This module moves the per-tick beam search into the fused Pallas beam
kernel (ops/beam.py), batched over stream slots, with the per-slot
beam state (prefix probabilities, hash streams, word-LM rings) carried
ACROSS ticks on device exactly like the acoustic RNN carries
(stream.py _build_step) — the kernel's stateful mode is proven
chunked==batch bit-identical (tests/test_pallas_beam.py
test_stateful_chunks_*).

Host keeps only the cheap part: per-chunk backpointer backtracking
(O(T_chunk * W) numpy) composed incrementally into per-beam suffix
sequences, committing the longest common prefix of the live beams —
the same stable-prefix semantics as the host/native session engines
(stream._beam_emit / _native_emit).

Reference parity: ctcdecode's stateful decoder sessions
(SURVEY.md §3.2 ctcdecode; ref:decoder.py BeamCTCDecoder) — the north
star moved decode on-device.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.decode.beam import NEG, DeviceBeamDecoder

_LIVE = NEG / 2  # scores above this are real beams, not dead fillers


class _SlotDecode:
    """Host-side incremental decode state of one stream slot."""

    __slots__ = ("committed_ids", "committed_frames", "suffixes",
                 "scores", "frames_seen", "taken")

    def __init__(self, beam_width: int):
        self.committed_ids: list[int] = []
        self.committed_frames: list[int] = []
        # per-beam (id, frame) sequences past the committed point
        self.suffixes: list[list] = [[] for _ in range(beam_width)]
        self.scores = np.full((beam_width,), NEG, np.float32)
        self.frames_seen = 0
        self.taken = 0  # committed chars already handed to the caller


class DeviceBeamStreams:
    """Batched device-resident incremental beam over stream slots.

    One jitted stateful-kernel call per tick advances EVERY slot's
    beam search; per-slot lengths freeze the slots with no data (the
    kernel emits identity backpointers there). The decoder argument
    supplies beam config + in-kernel LM fusion (word or char LM); it
    must be kernel-eligible (DeviceBeamDecoder.kernel_eligible) —
    callers fall back to the host/native session engines otherwise.
    """

    def __init__(self, decoder: DeviceBeamDecoder, max_streams: int,
                 n_class: int, time_frames: int):
        if not decoder.kernel_eligible():
            raise ValueError(
                "device streaming beam needs the fused kernel "
                f"({decoder._kernel_lm_ineligible() or 'impl=xla'})")
        self.dec = decoder
        self.w = decoder.cfg.beam_width
        self.s = max_streams
        self.c = n_class
        self.t = time_frames
        lm_kw = decoder.kernel_lm_kwargs(n_class)
        if "word_wide_tables" in lm_kw:
            # wide block-fetch tables force B % 8 == 0 and add MiB of
            # VMEM traffic per tick — serving LMs ride the small
            # full-compare path; big-LM streaming stays host-session
            raise ValueError("device streaming beam supports the "
                             "small word-LM path only (caps <= "
                             f"{decoder.MAX_KERNEL_WORD_CAP})")
        from tpuasr.ops.beam import beam_scan_pallas, make_beam_state

        if "word_tables" in lm_kw:
            lm_mode = "word"
            ring = max(1, lm_kw["word_tables"].order - 1)
        elif "char_table" in lm_kw:
            lm_mode = "char"
            ring = 0
        else:
            lm_mode, ring = "none", 0
        # internal batch pads to a full sublane tile: a lone stream
        # (B=1) would hand Mosaic sub-8-row scratch; padded slots carry
        # frozen init state forever (lens 0) at negligible cost
        self._bpad = max(max_streams, 8)
        self._state0 = make_beam_state(self._bpad, self.w,
                                       lm_mode=lm_mode, ring_len=ring)
        self.state = self._state0
        cfg = decoder.cfg
        kernel = functools.partial(
            beam_scan_pallas, beam_width=self.w, blank_id=cfg.blank_id,
            cutoff_top_n=cfg.cutoff_top_n, cutoff_prob=cfg.cutoff_prob,
            prune_logp=cfg.prune_logp, return_state=True, **lm_kw)
        bpad = self._bpad

        @jax.jit
        def _advance(logits, lo, lens, state):
            # shift each slot's valid window [lo, lo+len) down to 0 via
            # a per-slot one-hot time matmul (no per-element gathers on
            # TPU) and log-softmax the classes; frames past len are
            # frozen by the kernel's alive mask
            s_in, t_n = logits.shape[0], logits.shape[1]
            if s_in < bpad:
                logits = jnp.pad(logits, ((0, bpad - s_in), (0, 0),
                                          (0, 0)))
                lo = jnp.pad(lo, (0, bpad - s_in))
                lens = jnp.pad(lens, (0, bpad - s_in))
            t_out = jnp.arange(t_n)[:, None]
            t_in = jnp.arange(t_n)[None, :]
            sel = (t_in == t_out + lo[:, None, None]).astype(logits.dtype)
            shifted = jnp.einsum("sot,stc->soc", sel, logits)
            lp = jax.nn.log_softmax(shifted.astype(jnp.float32), axis=-1)
            return kernel(lp, lens, state=state)

        @jax.jit
        def _reset_rows(state, keep):
            keep2 = keep[:, None]
            return tuple(jnp.where(keep2, cur, init)
                         for cur, init in zip(state, self._state0))

        self._advance = _advance
        self._reset_rows = _reset_rows
        self._slots = [_SlotDecode(self.w) for _ in range(max_streams)]

    # ---- lifecycle ----

    def reset_slot(self, i: int) -> None:
        """Fresh beam state for slot ``i`` (a newly opened stream)."""
        keep = np.ones((self._bpad,), bool)
        keep[i] = False
        self.state = self._reset_rows(self.state, jnp.asarray(keep))
        self._slots[i] = _SlotDecode(self.w)

    # ---- data plane ----

    def advance(self, logits, lo: np.ndarray, lens: np.ndarray) -> None:
        """One batched tick: ``logits`` (S, T, C) raw logits (device
        array from the streaming step — stays on device), ``lo``/
        ``lens`` (S,) int32 per-slot valid windows [lo, lo+len).
        Slots with len 0 are frozen.

        NOTE: serving callers should prefer fusing ``self._advance``
        into the SAME jit as the acoustic step (one dispatch per tick —
        MultiStreamTranscriber does this; a separate dispatch measured
        +70 ms/tick through a tunneled host, bench_runs/r5/08) and then
        call ``fold`` with the fetched outputs."""
        parents, chars, scores, self.state = self._advance(
            jnp.asarray(logits), jnp.asarray(lo, jnp.int32),
            jnp.asarray(lens, jnp.int32), self.state)
        self.fold(*jax.device_get((parents, chars, scores)), lens)

    def fold(self, parents: np.ndarray, chars: np.ndarray,
             scores: np.ndarray, lens: np.ndarray) -> None:
        """Host half of a tick: compose the fetched backpointers into
        per-slot suffixes + commits. ``parents``/``chars`` (S, T, W),
        ``scores`` (S, W), ``lens`` (S,)."""
        parents = np.asarray(parents)
        chars = np.asarray(chars)
        self._scores_all = np.asarray(scores)
        for i in range(self.s):
            n = int(lens[i])
            if n <= 0:
                continue
            self._fold_chunk(i, parents[i, :n], chars[i, :n],
                             self._scores_all[i])

    def _fold_chunk(self, i: int, parents: np.ndarray, chars: np.ndarray,
                    scores: np.ndarray) -> None:
        """Compose one chunk's backpointers into slot ``i``'s per-beam
        suffix sequences and commit the live beams' common prefix."""
        sl = self._slots[i]
        t_n, w = chars.shape
        cur = np.arange(w)
        appends: list[list] = [[] for _ in range(w)]
        base = sl.frames_seen
        # chunk-local lineage walk (the batch _backtrack, one chunk)
        for t in range(t_n - 1, -1, -1):
            ch = chars[t, cur]
            for j in np.nonzero(ch >= 0)[0]:
                appends[j].append((int(ch[j]), base + t))
            cur = parents[t, cur]
        for j in range(w):
            appends[j].reverse()
        sl.suffixes = [sl.suffixes[int(cur[j])] + appends[j]
                       for j in range(w)]
        sl.scores = scores
        sl.frames_seen += t_n
        # stable commit: LCP of the live beams' id sequences
        live = np.nonzero(scores > _LIVE)[0]
        if len(live) == 0:
            return
        seqs = [[p[0] for p in sl.suffixes[j]] for j in live]
        lcp = seqs[0]
        for s2 in seqs[1:]:
            n = 0
            for a, b2 in zip(lcp, s2):
                if a != b2:
                    break
                n += 1
            lcp = lcp[:n]
            if not lcp:
                break
        if not lcp:
            return
        best = int(live[np.argmax(scores[live])])
        take = sl.suffixes[best][:len(lcp)]
        sl.committed_ids.extend(p[0] for p in take)
        sl.committed_frames.extend(p[1] for p in take)
        sl.suffixes = [s2[len(lcp):] for s2 in sl.suffixes]

    # ---- results ----

    def committed(self, i: int) -> tuple[list, list]:
        sl = self._slots[i]
        return list(sl.committed_ids), list(sl.committed_frames)

    def take_committed(self, i: int) -> tuple[list, list]:
        """Newly committed (ids, frames) since the last take."""
        sl = self._slots[i]
        ids = sl.committed_ids[sl.taken:]
        frames = sl.committed_frames[sl.taken:]
        sl.taken = len(sl.committed_ids)
        return ids, frames

    def finalize(self, i: int) -> tuple[list, list, float]:
        """Best beam's FULL (ids, frames, score) — the flush readout.
        Identical to the batch kernel + _backtrack best row, because
        chunked stateful calls emit the same backpointers and the last
        tick's scores include the word-close."""
        sl = self._slots[i]
        best = int(np.argmax(sl.scores))
        ids = sl.committed_ids + [p[0] for p in sl.suffixes[best]]
        frames = sl.committed_frames + [p[1] for p in sl.suffixes[best]]
        return ids, frames, float(sl.scores[best])
