#!/bin/bash
# Round-5 on-chip ladder, stage 3 — re-run the 8-stream device beam
# with the FUSED tick (the stage-2 item 08 ran the two-dispatch build:
# 25.0x with ~70 ms of tunnel round-trip per tick; the beam advance now
# rides in the same jit as the acoustic step, commit d87ab2d). Item 10
# measured greedy8 at 72.9x the same hour (r4: 83.1x) — today's tunnel
# is slower, so compare beam vs greedy WITHIN this stage.
# Items:
#   15: 8-stream beam, DEVICE engine, fused tick
#   16: 8-stream beam, device, fused — repeat (variance)
#   17: 8-stream greedy (same-hour anchor)
# Usage: bash scripts/tpu_queue_r5c.sh [start_N]   (default 15)
set -u
cd /root/repo
export TPUASR_COMPILE_CACHE=/root/repo/.jax_cache
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
export OUT=bench_runs/r5
mkdir -p "$OUT"
START=${1:-15}
N=14

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

run stream_beam8_device_fused 5400 python bench.py --mode stream \
  --streams 8 --stream-decoder beam --stream-beam-impl device

run stream_beam8_device_fused2 3600 python bench.py --mode stream \
  --streams 8 --stream-decoder beam --stream-beam-impl device

run stream_greedy8_anchor 3600 python bench.py --mode stream --streams 8

# HTTP streaming serving with DEVICE beam sessions (r4 items 16/17
# measured greedy serving; this is the beam+LM serving row): server
# owns the chip; clients are plain HTTP (pattern: scripts/tpu_queue.sh)
stream_load_beam() {
  local mode_flag="$1" name="$2"
  python -m tpuasr.cli.serve --model-path models/tpuasr_uni.ckpt \
    --port 8733 --streaming --max-streams 8 \
    --stream-norm-stats bench_runs/corpus2048/train.csv \
    --decoder beam --lm-path bench_runs/word3.arpa \
    --stream-beam-impl device --alpha 0.6 --beta 0.4 \
    >"$OUT/serve_beamdev_$name.log" 2>&1 &
  echo $! >/tmp/tpuasr_serve.pid
  for _ in $(seq 1 360); do
    curl -fsS -m 2 http://127.0.0.1:8733/healthz >/dev/null 2>&1 && break
    sleep 5
  done
  python scripts/stream_load_test.py --port 8733 --streams 8 \
    --seconds 30 $mode_flag
  local rc=$?
  kill "$(cat /tmp/tpuasr_serve.pid)" 2>/dev/null
  wait "$(cat /tmp/tpuasr_serve.pid)" 2>/dev/null
  return $rc
}
run load_beamdev_tput 5400 bash -c "$(declare -f stream_load_beam); stream_load_beam '' tput"
run load_beamdev_rt 3600 bash -c "$(declare -f stream_load_beam); stream_load_beam --realtime rt"

echo "=== queue_r5 stage3 done $(date -u +%FT%TZ)"
