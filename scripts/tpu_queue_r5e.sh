#!/bin/bash
# Round-5 on-chip ladder, stage 5 — serving-capacity ceiling.
# Items:
#   23: 64-stream device-beam capacity (8/16/32 measured 62.9x/116.4x/
#       206.8x aggregate at 42/44/49.5 ms/tick, bench_runs/r5/15,12,22 —
#       near-linear so far; map where the batched kernel advance stops
#       being batch-size-free)
#   24: 32-stream greedy anchor (same-session tunnel speed reference:
#       the beam rows only mean something against a same-hour greedy
#       number, r5 stage-2 lesson)
# Usage: bash scripts/tpu_queue_r5e.sh [start_N]   (default 23)
set -u
cd /root/repo
export TPUASR_COMPILE_CACHE=/root/repo/.jax_cache
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
export OUT=bench_runs/r5
mkdir -p "$OUT"
START=${1:-23}
N=22

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

run stream_beam64_device 5400 python bench.py --mode stream --streams 64 \
  --stream-decoder beam --stream-beam-impl device

run stream_greedy32 5400 python bench.py --mode stream --streams 32

echo "=== queue_r5 stage5 done $(date -u +%FT%TZ)"
