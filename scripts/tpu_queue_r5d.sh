#!/bin/bash
# Round-5 on-chip ladder, stage 4 — final-session sanity + headroom.
# Items:
#   20: bench.py default (train B=128) — HEAD headline sanity; also
#       warms the persistent compile cache the driver's end-of-round
#       bench run will hit
#   21: train B=256 probe — the infer sweep saturated the MXU between
#       B=128 (3038 utt/s) and B=256 (3100); if the train step scales
#       the same way the default batch should move
#   22: 32-stream device-beam capacity row (16 streams measured 116.4x
#       aggregate at 44 ms/tick, bench_runs/r5/12 — the batched kernel
#       advance is nearly batch-size-free, so map where that stops)
# Usage: bash scripts/tpu_queue_r5d.sh [start_N]   (default 20)
set -u
cd /root/repo
export TPUASR_COMPILE_CACHE=/root/repo/.jax_cache
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
export OUT=bench_runs/r5
mkdir -p "$OUT"
START=${1:-20}
N=19

run() {
  local name="$1" tmo="$2"; shift 2
  N=$((N + 1))
  local tag; tag=$(printf '%02d' "$N")_$name
  if [ "$N" -lt "$START" ]; then return 0; fi
  echo "=== [$tag] start $(date -u +%FT%TZ): $*"
  local t0 rc
  t0=$(date +%s)
  timeout "$tmo" "$@" >"$OUT/$tag.log" 2>&1
  rc=$?
  printf '%s\t%s\t%s\n' "$tag" "$rc" "$(( $(date +%s) - t0 ))" \
    >>"$OUT/SUMMARY.tsv"
  echo "=== [$tag] rc=$rc after $(( $(date +%s) - t0 ))s"
}

# env -u: let bench fall back to its /tmp/tpuasr_jax_cache default so
# the driver's end-of-round run (no env) hits a warm persistent cache
run bench_train_b128 5400 env -u TPUASR_COMPILE_CACHE python bench.py

run bench_train_b256 5400 python bench.py --batch 256

run stream_beam32_device 5400 python bench.py --mode stream --streams 32 \
  --stream-decoder beam --stream-beam-impl device

echo "=== queue_r5 stage4 done $(date -u +%FT%TZ)"
