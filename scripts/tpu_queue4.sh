#!/bin/bash
# Round-4 on-chip ladder, stage 4 — validates the late-round-4 fixes:
#   (a) matching-based hash-table packing (caps at load ~0.8, no
#       failure-doubling): small word LMs return to the full-compare
#       kernel path; wide tables shrink ~2x at 16k/50k vocab
#   (b) wide kernel rolls its time loop at B >= 64 (item 30's unrolled
#       B=128 compile killed the remote compile service after 46 min)
# Items:
#   40: item-30 config re-run — now expected on the SMALL kernel path
#   41: bench beamlm 16k (new caps; vs item 31 monolithic 525.0 utt/s)
#   42: bench beamlm 50k (new caps; vs item 32 rolled-loop result)
#   43: 262k-cap CLI eval at B=128 (only if item 35 failed; rolled-at-B
#       rule now applies automatically)
#
# Same conventions as scripts/tpu_queue.sh: sequential, one JAX
# process at a time, logs to bench_runs/r4/NN_*.log + SUMMARY.tsv.
# Usage: bash scripts/tpu_queue4.sh [start_N]   (default 40)
set -u
cd /root/repo
export TPUASR_COMPILE_CACHE=/root/repo/.jax_cache
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
export OUT=bench_runs/r4
export CORPUS=bench_runs/corpus2048
mkdir -p "$OUT"
START=${1:-40}
N=39

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

run eval_beam_b128_smallpath 3600 python -m tpuasr.cli.test \
  --model-path models/tpuasr_final.ckpt --test-manifest "$CORPUS/val.csv" \
  --batch-size 128 --device-resident-audio --timing \
  --decoder beam-device --lm-path bench_runs/word3.arpa \
  --device-lm-level word --alpha 0.6 --beta 0.4

run bench_beamlm16k_newpack 3600 python bench.py --mode beamlm \
  --batch 32 --lm-vocab 16000

run bench_beamlm50k_newpack 5400 python bench.py --mode beamlm \
  --batch 32 --lm-vocab 50000

if [ -f bench_runs/wide3.arpa ] && [ "${QUEUE4_RUN_262K:-0}" = 1 ]; then
  run eval_beam_wide262k_rolled 7200 python -m tpuasr.cli.test \
    --model-path models/tpuasr_final.ckpt \
    --test-manifest "$CORPUS/val.csv" \
    --batch-size 128 --device-resident-audio --timing \
    --decoder beam-device --lm-path bench_runs/wide3.arpa \
    --device-lm-level word --alpha 0.6 --beta 0.4
fi

echo "=== queue4 done $(date -u +%FT%TZ)"
