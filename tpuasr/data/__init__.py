from tpuasr.data.manifest import (
    ManifestEntry,
    read_manifest,
    write_manifest,
    create_manifest,
    merge_manifests,
    order_and_prune,
)
from tpuasr.data.buckets import BucketSpec, BucketingPlan, make_buckets
from tpuasr.data.loader import AudioBatchLoader, Batch
