#!/bin/bash
# Round-5 on-chip ladder, stage 1 — revalidates the wide-LM kernel
# after the salted-home remix changed to fmix32 (VERDICT r4 next #1)
# and publishes warm throughput for production-scale LMs (next #2).
# Items:
#   01: beamlm 16k vocab B=32   — item-41 config re-run post-fmix32
#   02: beamlm 50k vocab B=32   — item-42 config re-run (158k entries)
#   03: salted wide parity on-chip (scripts/salt_onchip_check.py) —
#       compiled Mosaic kernel vs XLA with forced nonzero salts
#   04: cli.test wide3.arpa (506k entries) B=128 --timing-repeats 2 —
#       WER parity + a WARM timing row at production scale
#   05: bench beamlm --lm-path wide3.arpa B=32 — warm utt/s, expected
#       in-kernel (the >=500k-entry in-kernel point)
#   06: bench beamlm big4.arpa (order-4, ~1M entries) B=32 — XLA
#       fallback by ORDER; measures the fallback cost at scale
#   07: bench beamlm big3.arpa (trigram, ~1M entries) B=32 — XLA
#       fallback by the 64 MiB VMEM gate; maps where in-kernel ends
#
# big3/big4 are gitignored (45/67 MB); regenerate with:
#   python scripts/make_wide_lm_text.py --manifest bench_runs/corpus2048/train.csv \
#     --out bench_runs/big_lm_text.txt --vocab-size 60000 --lines 120000 --repeat 10
#   python -m tpuasr.cli.train_lm --text bench_runs/big_lm_text.txt \
#     --out bench_runs/big3.arpa --order 3   (and --order 4 -> big4.arpa)
#
# Same conventions as scripts/tpu_queue.sh: sequential, one JAX
# process at a time, logs to bench_runs/r5/NN_*.log + SUMMARY.tsv.
# Usage: bash scripts/tpu_queue_r5.sh [start_N]   (default 1)
set -u
cd /root/repo
export TPUASR_COMPILE_CACHE=/root/repo/.jax_cache
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
export OUT=bench_runs/r5
export CORPUS=bench_runs/corpus2048
mkdir -p "$OUT"
START=${1:-1}
N=0

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

run bench_beamlm16k_fmix 3600 python bench.py --mode beamlm \
  --batch 32 --lm-vocab 16000

run bench_beamlm50k_fmix 5400 python bench.py --mode beamlm \
  --batch 32 --lm-vocab 50000

run salt_onchip_check 3600 python scripts/salt_onchip_check.py

run eval_beam_wide3_b128_warm 7200 python -m tpuasr.cli.test \
  --model-path models/tpuasr_final.ckpt --test-manifest "$CORPUS/val.csv" \
  --batch-size 128 --device-resident-audio --timing --timing-repeats 2 \
  --decoder beam-device --lm-path bench_runs/wide3.arpa \
  --device-lm-level word --alpha 0.6 --beta 0.4

run bench_beamlm_wide3_b32 7200 python bench.py --mode beamlm \
  --batch 32 --lm-path bench_runs/wide3.arpa

run bench_beamlm_big4_b32 7200 python bench.py --mode beamlm \
  --batch 32 --lm-path bench_runs/big4.arpa

run bench_beamlm_big3_b32 7200 python bench.py --mode beamlm \
  --batch 32 --lm-path bench_runs/big3.arpa

echo "=== queue_r5 stage1 done $(date -u +%FT%TZ)"
