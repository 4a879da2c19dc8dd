#!/bin/bash
# Round-5 on-chip ladder, stage 2 — device-resident streaming beam
# (VERDICT r4 next #3: target >= 60x aggregate realtime at 8 streams,
# vs 38.9x with the native C++ host sessions, greedy 83.1x).
# Items:
#   08: 8-stream beam, DEVICE engine (fused kernel carries per-slot
#       beam state across ticks — decode/device_stream.py)
#   09: 8-stream beam, NATIVE C++ sessions (the round-4 baseline)
#   10: 8-stream greedy (variance anchor vs r4's 83.1x)
#   11: 1-stream beam, native (r4: 9.6x)
#   12: 16-stream beam, device (scaling headroom)
#
# Usage: bash scripts/tpu_queue_r5b.sh [start_N]   (default 8)
set -u
cd /root/repo
export TPUASR_COMPILE_CACHE=/root/repo/.jax_cache
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
export OUT=bench_runs/r5
mkdir -p "$OUT"
START=${1:-8}
N=7

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

run stream_beam8_device 5400 python bench.py --mode stream --streams 8 \
  --stream-decoder beam --stream-beam-impl device

run stream_beam8_native 3600 python bench.py --mode stream --streams 8 \
  --stream-decoder beam --stream-beam-impl native

run stream_greedy8 3600 python bench.py --mode stream --streams 8

run stream_beam1_native 3600 python bench.py --mode stream --streams 1 \
  --stream-decoder beam

run stream_beam16_device 5400 python bench.py --mode stream --streams 16 \
  --stream-decoder beam --stream-beam-impl device

# item 04 re-run under the round-5 batch-aware VMEM gate: wide3 at
# B=128 now routes to the per-batch XLA loop (the in-kernel attempt
# OOMed scoped VMEM by 16.3 MiB — bench_runs/r5/04) and must produce
# an honest warm timing row instead of a crash.
run eval_beam_wide3_b128_fallback 7200 python -m tpuasr.cli.test \
  --model-path models/tpuasr_final.ckpt \
  --test-manifest bench_runs/corpus2048/val.csv \
  --batch-size 128 --device-resident-audio --timing --timing-repeats 2 \
  --decoder beam-device --lm-path bench_runs/wide3.arpa \
  --device-lm-level word --alpha 0.6 --beta 0.4

# wide3 B=32 CLI eval (in-kernel per the new gate): WER parity row at
# production scale + warm timing through the REAL eval surface.
run eval_beam_wide3_b32_warm 7200 python -m tpuasr.cli.test \
  --model-path models/tpuasr_final.ckpt \
  --test-manifest bench_runs/corpus2048/val.csv \
  --batch-size 32 --device-resident-audio --timing --timing-repeats 2 \
  --decoder beam-device --lm-path bench_runs/wide3.arpa \
  --device-lm-level word --alpha 0.6 --beta 0.4

echo "=== queue_r5 stage2 done $(date -u +%FT%TZ)"
