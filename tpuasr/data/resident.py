"""Device-resident corpus: batches assembled by on-device gather.

TPU-native data path for corpora that fit HBM (LapsBM-scale sets, the
synthetic benches, any eval manifest): the reference streams every
batch CPU->GPU each step (ref:data/data_loader.py workers + pinned
copies); here the WHOLE corpus is packed into per-bucket HBM banks
ONCE (int16 waves = 2 bytes/sample), and each training step's batch is
a `jnp.take` over the bank — the only host->device traffic per step is
a (B,) int32 index vector.

Why it matters: sustained-loop measurements (BASELINE.md) show the
host->device wave transfer dominating the step on tunneled TPUs
(~140 ms for a 5 MB int16 batch vs a 69 ms compute step); even on
production hosts it is the largest non-compute cost. With a resident
corpus the sustained rate equals the bare-step rate.

``ResidentBatchLoader`` exposes the same ``epoch(e)`` -> ``Batch``
iterator as ``AudioBatchLoader``, so the training loop is unchanged;
its ``waves``/``labels`` fields simply arrive as device arrays.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

from tpuasr.data.buckets import BucketingPlan
from tpuasr.data.loader import AudioBatchLoader, Batch
from tpuasr.labels import Alphabet


@dataclass
class _BucketBank:
    """One bucket's HBM bank. ``rows`` (manifest entry index -> bank
    row) and the arrays are public: external runners
    (decode/resident_eval.py) consume them via ``bucket_chunks``."""

    waves: object  # (N, L_bucket) int16 device array
    wave_lengths: object  # (N,) int32 device array
    labels: object  # (N, L_cap) int32 device array
    label_lengths: object  # (N,) int32 device array
    rows: dict  # manifest entry index -> bank row


class ResidentBatchLoader:
    """Packs the plan's corpus into HBM once; yields gathered batches."""

    def __init__(
        self,
        plan: BucketingPlan,
        alphabet: Alphabet,
        sample_rate: int = 16000,
        rank: int = 0,
        world: int = 1,
        on_overflow: str = "warn",
    ):
        import jax
        import jax.numpy as jnp

        self.plan = plan
        self.alphabet = alphabet
        self.rank = rank
        self.world = world
        # banks pad each utterance to ITS OWN bucket, so every batch
        # must stay within one bucket — including the epoch-0 SortaGrad
        # pass (which otherwise chunks across bucket boundaries)
        plan.homogeneous = True
        # reuse AudioBatchLoader's read/encode/overflow logic row by row
        reader = AudioBatchLoader(
            plan, alphabet, sample_rate=sample_rate,
            on_overflow=on_overflow, transfer_dtype="int16",
        )
        spec = plan.spec
        by_bucket: dict = {}
        for i, e in enumerate(plan.entries):
            by_bucket.setdefault(spec.bucket_of(e.duration), []).append(i)

        self.texts = [e.read_transcript() for e in plan.entries]
        self.banks: dict = {}
        for b, idxs in by_bucket.items():
            l_bucket = spec.bucket_samples(b)
            l_cap = spec.bucket_label_cap(b)
            n = len(idxs)
            waves = np.zeros((n, l_bucket), np.int16)
            wl = np.zeros((n,), np.int32)
            labels = np.zeros((n, l_cap), np.int32)
            ll = np.zeros((n,), np.int32)
            rows = {}
            for r, i in enumerate(idxs):
                e = plan.entries[i]
                from tpuasr.audio.io import load_audio_pcm16

                w = load_audio_pcm16(e.wav_path, expected_sample_rate=sample_rate)
                if len(w) > l_bucket:
                    reader._overflow("wave", e.wav_path, len(w), l_bucket)
                m = min(len(w), l_bucket)
                waves[r, :m] = w[:m]
                wl[r] = m
                ids = alphabet.encode(self.texts[i])
                if len(ids) > l_cap:
                    reader._overflow("label", e.wav_path, len(ids), l_cap)
                    ids = ids[:l_cap]
                labels[r, : len(ids)] = ids
                ll[r] = len(ids)
                rows[i] = r
            self.banks[b] = _BucketBank(
                waves=jax.device_put(waves),
                wave_lengths=jax.device_put(wl),
                labels=jax.device_put(labels),
                label_lengths=jax.device_put(ll),
                rows=rows,
            )

        # ONE dispatch assembles the whole batch (tunneled TPUs pay a
        # real latency per eager op, so per-field takes are costly)
        @jax.jit
        def _gather(waves, wl, labels, ll, idx):
            return (jnp.take(waves, idx, axis=0), jnp.take(wl, idx, axis=0),
                    jnp.take(labels, idx, axis=0), jnp.take(ll, idx, axis=0))

        self._gather = _gather
        # valid masks are one of bsz possible vectors: precompute on device
        bsz = plan.batch_size
        self._valid = [
            jax.device_put(np.arange(bsz) < k) for k in range(bsz + 1)
        ]

    def epoch(self, epoch: int):
        import jax.numpy as jnp

        bsz = self.plan.batch_size
        for pb in self.plan.sharded_batches(epoch, self.rank, self.world):
            bank = self.banks[pb.bucket]
            idx = [bank.rows[i] for i in pb.indices]
            n_real = len(idx)
            while len(idx) < bsz:
                idx.append(idx[-1])
            idx_dev = jnp.asarray(np.asarray(idx, np.int32))
            waves, wl, labels, ll = self._gather(
                bank.waves, bank.wave_lengths, bank.labels,
                bank.label_lengths, idx_dev,
            )
            yield Batch(
                waves=waves,
                wave_lengths=wl,
                labels=labels,
                label_lengths=ll,
                valid=self._valid[n_real],
                bucket=pb.bucket,
                texts=[self.texts[i] for i in pb.indices]
                + [self.texts[pb.indices[-1]]] * (bsz - n_real),
                n_valid=n_real,
            )

    def num_batches(self, epoch: int) -> int:
        return len(self.plan.sharded_batches(epoch, self.rank, self.world))

    def bucket_chunks(self, epoch: int):
        """Epoch schedule grouped per bucket for the scan runner
        (tpuasr.train.step.make_resident_epoch_runner): yields
        (bucket, idx_mat (K, B) int32, n_valid (K,) int32, valid_mat
        (K, B) bool). Within a bucket the (shuffled) batch order is
        preserved; buckets are visited shortest-first, which keeps the
        epoch-0 SortaGrad curriculum exact."""
        bsz = self.plan.batch_size
        by_bucket: dict = {}
        for pb in self.plan.sharded_batches(epoch, self.rank, self.world):
            by_bucket.setdefault(pb.bucket, []).append(pb)
        for b in sorted(by_bucket):
            bank = self.banks[b]
            pbs = by_bucket[b]
            idx_mat = np.zeros((len(pbs), bsz), np.int32)
            n_valid = np.zeros((len(pbs),), np.int32)
            valid_mat = np.zeros((len(pbs), bsz), bool)
            for k, pb in enumerate(pbs):
                idx = [bank.rows[i] for i in pb.indices]
                n_valid[k] = len(idx)
                while len(idx) < bsz:
                    idx.append(idx[-1])
                idx_mat[k] = idx
                valid_mat[k, : n_valid[k]] = True
            yield b, bank, idx_mat, n_valid, valid_mat
