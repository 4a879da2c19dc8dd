#!/bin/bash
# Round-4 on-chip ladder, stage 2 — runs AFTER scripts/tpu_queue.sh
# (same logging conventions; kept separate because editing a running
# bash script corrupts its execution).
#
# Adds the genuinely-wide word-LM resident eval (VERDICT r3 #1c): an
# LM whose per-order caps reach 262144 (the round-3 compiler-kill
# regime, now chunked in-kernel), trained through the REAL train_lm
# CLI, evaluated with cli.test --decoder beam-device at B=128 over the
# 1024-utt val corpus.
set -u
cd /root/repo
export TPUASR_COMPILE_CACHE=/root/repo/.jax_cache
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
CPUENV="env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu"
export OUT=bench_runs/r4
export CORPUS=bench_runs/corpus2048
mkdir -p "$OUT"
START=${1:-1}
N=20 # continue numbering after stage 1

run() {
  local name="$1" tmo="$2"; shift 2
  N=$((N + 1))
  local tag; tag=$(printf '%02d' "$N")_$name
  if [ "$N" -lt $((START + 20)) ]; then return 0; fi
  echo "=== [$tag] start $(date -u +%FT%TZ): $*"
  local t0 rc
  t0=$(date +%s)
  timeout "$tmo" "$@" >"$OUT/$tag.log" 2>&1
  rc=$?
  printf '%s\t%s\t%s\n' "$tag" "$rc" "$(( $(date +%s) - t0 ))" \
    >>"$OUT/SUMMARY.tsv"
  echo "=== [$tag] rc=$rc after $(( $(date +%s) - t0 ))s"
}

run wide_text 600 $CPUENV python scripts/make_wide_lm_text.py \
  --manifest "$CORPUS/train.csv" --out bench_runs/wide_lm_text.txt \
  --vocab-size 50000 --lines 40000
run wide_arpa 1800 $CPUENV python -m tpuasr.cli.train_lm \
  --text bench_runs/wide_lm_text.txt --out bench_runs/wide3.arpa --order 3
run eval_beam_wide262k 7200 python -m tpuasr.cli.test \
  --model-path models/tpuasr_final.ckpt --test-manifest "$CORPUS/val.csv" \
  --batch-size 128 --device-resident-audio --timing \
  --decoder beam-device --lm-path bench_runs/wide3.arpa \
  --device-lm-level word --alpha 0.6 --beta 0.4

echo "=== queue2 done $(date -u +%FT%TZ)"
