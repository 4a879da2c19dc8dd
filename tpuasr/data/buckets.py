"""Static-shape duration bucketing + SortaGrad schedule.

Reference parity: ``BucketingSampler`` / ``DistributedBucketingSampler``
in ref:data/data_loader.py — the dataset is duration-sorted; epoch 0 is
consumed in sorted order (SortaGrad, named in BASELINE.json), later
epochs shuffle; under data-parallel training each rank takes every
world_size-th batch.

TPU-first redesign (SURVEY.md §5.7): instead of padding every batch to
its own max length (a new XLA compilation per shape), utterances are
assigned to a SMALL STATIC SET of duration buckets; every batch is
padded to its bucket's sample count and label slots to the bucket's
label cap, so the train step compiles once per bucket and never again.
From epoch 1 on, batches are formed WITHIN a bucket (less padding than
the reference's sorted-chunk scheme) and batch order is shuffled.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from tpuasr.data.manifest import ManifestEntry

# Default bucket boundaries in seconds: dense where PT-BR read-speech
# utterances live (2-8 s), sparse tails. 10 compiled shapes.
DEFAULT_BUCKET_SECONDS = (1.0, 1.5, 2.0, 3.0, 4.0, 5.0, 6.5, 8.0, 11.0, 16.5)

# Label capacity per bucket second: PT-BR read speech runs ~12-16
# chars/s; 25 chars/s (+5 slack) never truncates real transcripts.
LABEL_CHARS_PER_SECOND = 25
LABEL_SLACK = 5


@dataclass(frozen=True)
class BucketSpec:
    seconds: tuple = DEFAULT_BUCKET_SECONDS
    sample_rate: int = 16000

    def bucket_samples(self, i: int) -> int:
        return int(round(self.seconds[i] * self.sample_rate))

    def bucket_label_cap(self, i: int) -> int:
        return int(math.ceil(self.seconds[i] * LABEL_CHARS_PER_SECOND)) + LABEL_SLACK

    def bucket_of(self, duration: float) -> int:
        """Smallest bucket that fits; overlong utterances go to the last
        bucket (and should have been pruned by order_and_prune)."""
        for i, s in enumerate(self.seconds):
            if duration <= s:
                return i
        return len(self.seconds) - 1

    @property
    def n_buckets(self) -> int:
        return len(self.seconds)


@dataclass
class BatchPlanEntry:
    bucket: int
    indices: list  # indices into the manifest entry list


@dataclass
class BucketingPlan:
    """An epoch-indexed batch schedule over a manifest.

    ``batches(epoch)`` yields BatchPlanEntry in the order to train:
    epoch 0 in duration-sorted order (SortaGrad), epoch >= 1 with
    intra-bucket shuffling and shuffled batch order. ``shard(rank,
    world)`` restricts to every world-th batch with equal counts per
    rank (DistributedBucketingSampler behavior).
    """

    entries: list  # list[ManifestEntry], duration-annotated
    batch_size: int
    spec: BucketSpec = field(default_factory=BucketSpec)
    seed: int = 0
    sorta_grad: bool = True
    shuffle: bool = True
    drop_last: bool = False
    # homogeneous=True keeps every batch within ONE bucket even in the
    # epoch-0 SortaGrad pass (chunks are duration-sorted within each
    # bucket, buckets visited shortest-first, so the curriculum is
    # preserved with strictly LESS padding). Required by the
    # device-resident loader; beneficial generally.
    homogeneous: bool = False

    def __post_init__(self):
        self._durations = np.array(
            [e.duration for e in self.entries], dtype=np.float64
        )
        self._order = np.argsort(self._durations, kind="stable")
        self._bucket_ids = np.array(
            [self.spec.bucket_of(d) for d in self._durations], dtype=np.int64
        )

    def _sorted_batches(self) -> list[BatchPlanEntry]:
        out = []
        if self.homogeneous:
            for b in range(self.spec.n_buckets):
                members = self._order[self._bucket_ids[self._order] == b]
                for start in range(0, len(members), self.batch_size):
                    idx = members[start : start + self.batch_size]
                    if len(idx) < self.batch_size and self.drop_last:
                        continue
                    out.append(BatchPlanEntry(b, list(map(int, idx))))
            return out
        for start in range(0, len(self._order), self.batch_size):
            idx = self._order[start : start + self.batch_size]
            if len(idx) < self.batch_size and self.drop_last:
                continue
            bucket = int(self._bucket_ids[idx].max())
            out.append(BatchPlanEntry(bucket, list(map(int, idx))))
        return out

    def _bucketed_batches(self, rng: np.random.RandomState) -> list[BatchPlanEntry]:
        out = []
        for b in range(self.spec.n_buckets):
            members = np.nonzero(self._bucket_ids == b)[0]
            if len(members) == 0:
                continue
            rng.shuffle(members)
            for start in range(0, len(members), self.batch_size):
                idx = members[start : start + self.batch_size]
                if len(idx) < self.batch_size and self.drop_last:
                    continue
                out.append(BatchPlanEntry(b, list(map(int, idx))))
        rng.shuffle(out)
        return out

    def batches(self, epoch: int) -> list[BatchPlanEntry]:
        if (epoch == 0 and self.sorta_grad) or not self.shuffle:
            return self._sorted_batches()
        rng = np.random.RandomState(self.seed + epoch)
        return self._bucketed_batches(rng)

    def sharded_batches(self, epoch: int, rank: int, world: int):
        """Every rank sees the same schedule and takes batches
        [rank::world]; trailing batches that don't divide evenly are
        dropped so every rank steps the same number of times (required
        for lockstep SPMD)."""
        all_b = self.batches(epoch)
        n = (len(all_b) // world) * world
        return all_b[rank:n:world]


def make_buckets(
    entries: list[ManifestEntry],
    batch_size: int,
    spec: BucketSpec | None = None,
    **kw,
) -> BucketingPlan:
    return BucketingPlan(entries, batch_size, spec or BucketSpec(), **kw)
