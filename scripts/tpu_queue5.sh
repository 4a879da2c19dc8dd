#!/bin/bash
# Round-4 on-chip ladder, stage 5 — validates the rolled-at-B>=64 rule
# on the SMALL full-compare word-LM path (item 40 hung in compile for
# the full hour unrolled: bench_runs/r4/40_eval_beam_b128_smallpath.log)
# and pushes the 506k-entry trigram (wide3.arpa) through the wide
# kernel at B=128 under the matching packer's caps.
# Items:
#   50: item-40 config re-run — small path, B=128, time loop now ROLLED
#   51: wide3.arpa (506k entries) CLI eval at B=128 — expected
#       in-kernel wide + rolled (caps should stay under the 64 MiB
#       gate with matching packing; item 35 measured the XLA fallback)
#
# Same conventions as scripts/tpu_queue.sh: sequential, one JAX
# process at a time, logs to bench_runs/r4/NN_*.log + SUMMARY.tsv.
# Usage: bash scripts/tpu_queue5.sh [start_N]   (default 50)
set -u
cd /root/repo
export TPUASR_COMPILE_CACHE=/root/repo/.jax_cache
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
export OUT=bench_runs/r4
export CORPUS=bench_runs/corpus2048
mkdir -p "$OUT"
START=${1:-50}
N=49

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

run eval_beam_b128_smallpath_rolled 3600 python -m tpuasr.cli.test \
  --model-path models/tpuasr_final.ckpt --test-manifest "$CORPUS/val.csv" \
  --batch-size 128 --device-resident-audio --timing \
  --decoder beam-device --lm-path bench_runs/word3.arpa \
  --device-lm-level word --alpha 0.6 --beta 0.4

run eval_beam_wide3_b128 7200 python -m tpuasr.cli.test \
  --model-path models/tpuasr_final.ckpt --test-manifest "$CORPUS/val.csv" \
  --batch-size 128 --device-resident-audio --timing \
  --decoder beam-device --lm-path bench_runs/wide3.arpa \
  --device-lm-level word --alpha 0.6 --beta 0.4

echo "=== queue5 done $(date -u +%FT%TZ)"
