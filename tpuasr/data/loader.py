"""Host batch loader: manifest entries -> padded NumPy batches.

Replaces the reference's CPU-heavy ``AudioDataLoader`` +
``SpectrogramDataset`` worker pool (ref:data/data_loader.py). The
reference decoded audio, ran sox augmentation, STFT, normalization and
collation on host workers; here the host does ONLY wav decode +
transcript encode + padding — spectrograms, normalization and
augmentation all run on device (tpuasr.audio.frontend / .augment),
which is the north-star requirement.

Collation contract (vs the reference's _collate_fn): the reference
emitted (B,1,F,T_max), input_percentages and a flat 1-D target vector
(warp-ctc layout). Our device pipeline wants raw waveforms: a batch is
(waves (B, L_bucket), wave_lengths, labels (B, L_cap), label_lengths,
valid) — all static shapes per bucket, so XLA compiles once per bucket.
Short final batches are padded with repeated entries and masked via
``valid`` instead of shrinking the batch (static batch dim).
"""

from __future__ import annotations

import queue
import threading
import warnings
from dataclasses import dataclass

import numpy as np

from tpuasr.audio.io import load_audio, load_audio_pcm16
from tpuasr.data.buckets import BatchPlanEntry, BucketingPlan
from tpuasr.labels import Alphabet


@dataclass
class Batch:
    waves: np.ndarray  # (B, L_bucket) float32 or int16 (transfer_dtype)
    wave_lengths: np.ndarray  # (B,) int32
    labels: np.ndarray  # (B, L_cap) int32
    label_lengths: np.ndarray  # (B,) int32
    valid: np.ndarray  # (B,) bool — False for batch-padding duplicates
    bucket: int
    texts: list  # reference transcripts (for eval)
    n_valid: int | None = None  # set when fields are device arrays

    @property
    def size(self) -> int:
        if self.n_valid is not None:  # avoid a device sync on the hot path
            return self.n_valid
        return int(self.valid.sum())


class AudioBatchLoader:
    """Iterates a BucketingPlan epoch, reading + padding on a background
    thread with bounded prefetch (double buffering: the device computes
    step N while the host reads step N+1)."""

    def __init__(
        self,
        plan: BucketingPlan,
        alphabet: Alphabet,
        sample_rate: int = 16000,
        prefetch: int = 2,
        rank: int = 0,
        world: int = 1,
        on_overflow: str = "warn",  # "warn" | "error" — utterance exceeds bucket caps
        cache_audio: bool = False,
        transfer_dtype: str = "float32",  # "float32" | "int16"
    ):
        self.plan = plan
        self.alphabet = alphabet
        self.sample_rate = sample_rate
        self.prefetch = prefetch
        self.rank = rank
        self.world = world
        if on_overflow not in ("warn", "error"):
            raise ValueError(f"on_overflow must be 'warn' or 'error', got {on_overflow!r}")
        self.on_overflow = on_overflow
        if transfer_dtype not in ("float32", "int16"):
            raise ValueError(f"transfer_dtype must be float32|int16, got {transfer_dtype!r}")
        # int16 batches halve the host->device bytes AND skip the host
        # PCM->float conversion; the jitted steps rescale on device.
        self.transfer_dtype = transfer_dtype
        # Optional whole-corpus wave cache: epoch 2+ skips disk + PCM
        # decode entirely. Suits benchmark/smoke corpora and small
        # corpora on IO-starved hosts; augmentation still randomizes on
        # device every step, so cached waves do NOT freeze the epoch.
        self._wave_cache: dict | None = {} if cache_audio else None

    def _overflow(self, kind: str, path: str, have: int, cap: int) -> None:
        msg = (
            f"{kind} overflow for {path}: {have} > bucket cap {cap} — "
            f"truncating corrupts CTC supervision; prune overlong "
            f"utterances from the manifest (--max-duration) or widen the "
            f"bucket spec."
        )
        if self.on_overflow == "error":
            raise ValueError(msg)
        warnings.warn(msg, stacklevel=3)

    def _make_batch(self, pb: BatchPlanEntry) -> Batch:
        spec = self.plan.spec
        bsz = self.plan.batch_size
        l_bucket = spec.bucket_samples(pb.bucket)
        l_cap = spec.bucket_label_cap(pb.bucket)

        idx = list(pb.indices)
        n_real = len(idx)
        while len(idx) < bsz:  # static batch: pad with repeats, masked
            idx.append(idx[-1])

        wave_np_dtype = np.int16 if self.transfer_dtype == "int16" else np.float32
        waves = np.zeros((bsz, l_bucket), wave_np_dtype)
        wave_lengths = np.zeros((bsz,), np.int32)
        labels = np.zeros((bsz, l_cap), np.int32)
        label_lengths = np.zeros((bsz,), np.int32)
        texts = []
        for j, i in enumerate(idx):
            e = self.plan.entries[i]
            if self._wave_cache is not None and e.wav_path in self._wave_cache:
                w = self._wave_cache[e.wav_path]
            else:
                if self.transfer_dtype == "int16":
                    w = load_audio_pcm16(e.wav_path,
                                         expected_sample_rate=self.sample_rate)
                else:
                    w = load_audio(e.wav_path,
                                   expected_sample_rate=self.sample_rate)
                if self._wave_cache is not None:
                    self._wave_cache[e.wav_path] = w
            if len(w) > l_bucket:
                self._overflow("wave", e.wav_path, len(w), l_bucket)
            n = min(len(w), l_bucket)
            waves[j, :n] = w[:n]
            wave_lengths[j] = n
            text = e.read_transcript()
            ids = self.alphabet.encode(text)
            if len(ids) > l_cap:
                self._overflow("label", e.wav_path, len(ids), l_cap)
                ids = ids[:l_cap]
            labels[j, : len(ids)] = ids
            label_lengths[j] = len(ids)
            texts.append(text)
        valid = np.arange(bsz) < n_real
        return Batch(waves, wave_lengths, labels, label_lengths, valid,
                     pb.bucket, texts)

    def epoch(self, epoch: int):
        """Yield prefetched batches for one epoch (this rank's shard)."""
        schedule = self.plan.sharded_batches(epoch, self.rank, self.world)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            try:
                for pb in schedule:
                    q.put(self._make_batch(pb))
                q.put(stop)
            except BaseException as exc:  # propagate — never end the epoch silently
                q.put(exc)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item

    def num_batches(self, epoch: int) -> int:
        return len(self.plan.sharded_batches(epoch, self.rank, self.world))
