#!/bin/bash
# Round-4 on-chip ladder, stage 3 — re-validates the two stage-1
# failures after the wide word-LM fixes (monolithic refs <= 4096 rows,
# >= 8-row table padding, rolled time loop for very large tables):
#   05_bench_beamlm50k  (VMEM stack OOM: 119 MiB > 100 MiB scoped)
#   14_eval_beam_wide   (Mosaic sublane concat of (B, 1) R=1 pieces)
# then runs the stage-2 genuinely-wide 262144-cap CLI eval (items
# 20-22, never started) and a monolithic-vs-chunked A/B at 16k vocab.
#
# Same conventions as scripts/tpu_queue.sh: sequential, one JAX
# process at a time, logs to bench_runs/r4/NN_*.log + SUMMARY.tsv.
# Usage: bash scripts/tpu_queue3.sh [start_N]   (default 30)
set -u
cd /root/repo
export TPUASR_COMPILE_CACHE=/root/repo/.jax_cache
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
CPUENV="env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu"
export OUT=bench_runs/r4
export CORPUS=bench_runs/corpus2048
mkdir -p "$OUT"
START=${1:-30}
N=29 # stage-3 numbering starts at 30

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

# 30: stage-1 item 14 regression — tiny-cap LM through the wide path
run eval_beam_wide_fix 5400 python -m tpuasr.cli.test \
  --model-path models/tpuasr_final.ckpt --test-manifest "$CORPUS/val.csv" \
  --batch-size 128 --device-resident-audio --timing \
  --decoder beam-device --lm-path bench_runs/word3.arpa \
  --device-lm-level word --alpha 0.6 --beta 0.4

# 31: 16k vocab, now monolithic refs (round-3 measured 63.7 ms here)
run bench_beamlm16k_mono 3600 python bench.py --mode beamlm --batch 32 \
  --lm-vocab 16000

# 32: stage-1 item 05 — 50k vocab, monolithic 2048-row refs + rolled
# time loop (the VMEM-stack fix target)
run bench_beamlm50k_fix 5400 python bench.py --mode beamlm --batch 32 \
  --lm-vocab 50000

# 33-35: stage-2 (fe003e4) — genuinely wide LM through the real CLI
if [ ! -f bench_runs/wide3.arpa ]; then
  run wide_text 600 $CPUENV python scripts/make_wide_lm_text.py \
    --manifest "$CORPUS/train.csv" --out bench_runs/wide_lm_text.txt \
    --vocab-size 50000 --lines 40000
  run wide_arpa 1800 $CPUENV python -m tpuasr.cli.train_lm \
    --text bench_runs/wide_lm_text.txt --out bench_runs/wide3.arpa --order 3
else
  N=$((N + 2))
fi
run eval_beam_wide262k 7200 python -m tpuasr.cli.test \
  --model-path models/tpuasr_final.ckpt --test-manifest "$CORPUS/val.csv" \
  --batch-size 128 --device-resident-audio --timing \
  --decoder beam-device --lm-path bench_runs/wide3.arpa \
  --device-lm-level word --alpha 0.6 --beta 0.4

# 36: unrolled arm of the 50k config (A/B the rolled-loop cost; may
# legitimately fail with the stack OOM — that's the measurement)
run beamlm50k_unroll 5400 env TPUASR_BEAM_UNROLL=1 \
  python bench.py --mode beamlm --batch 32 --lm-vocab 50000

echo "=== queue3 done $(date -u +%FT%TZ)"
