#!/bin/bash
# Round-4 on-chip validation ladder (VERDICT r3 items #1, #3, #6).
#
# Runs every queued TPU measurement SEQUENTIALLY — one JAX process at a
# time (1-core VM, tunneled runtime; see CLAUDE.md). Each item logs to
# bench_runs/r4/NN_<name>.log and appends one TSV row (name, rc,
# seconds) to bench_runs/r4/SUMMARY.tsv; failures record rc and move
# on. The wide-LM compiler-kill repro runs LAST because it can wedge
# the remote compile service for everything after it.
#
# Usage: bash scripts/tpu_queue.sh [start_item]   (default 1)
set -u
cd /root/repo
export TPUASR_COMPILE_CACHE=/root/repo/.jax_cache
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
# Pure-host items (corpus synthesis, ARPA training) must not touch the
# tunnel: this env runs them on plain CPU jax (see CLAUDE.md).
CPUENV="env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu"

export OUT=bench_runs/r4
export CORPUS=bench_runs/corpus2048
mkdir -p "$OUT" models
START=${1:-1}
N=0

run() { # run <name> <timeout_s> <cmd...>
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

# ---- stage A: bench.py modes (self-contained, no checkpoint) --------
run bench_train      3600 python bench.py
run bench_infer      2400 python bench.py --mode infer
run bench_beam       2400 python bench.py --mode beam --batch 32
run bench_beamlm16k  3600 python bench.py --mode beamlm --batch 32 --lm-vocab 16000
run bench_beamlm50k  5400 python bench.py --mode beamlm --batch 32 --lm-vocab 50000
run stream_g1        2400 python bench.py --mode stream
run stream_g8        2400 python bench.py --mode stream --streams 8
run stream_b1        2400 python bench.py --mode stream --stream-decoder beam
run stream_b8        2400 python bench.py --mode stream --streams 8 --stream-decoder beam

# ---- stage B: checkpoints + real-CLI eval / serving ----------------
if [ ! -f "$CORPUS/train.csv" ]; then
  run synth_corpus 900 $CPUENV python -m tpuasr.cli.synth_corpus \
    "$CORPUS" --n 2048 --val-fraction 0.1 --seed 7
else
  N=$((N + 1))
fi
run train_flagship 7200 python -m tpuasr.cli.train \
  --train-manifest "$CORPUS/train.csv" --val-manifest "$CORPUS/val.csv" \
  --device-resident-audio --rnn-impl pallas --ctc-impl pallas \
  --epochs 40 --batch-size 32 --lr 5e-4 --learning-anneal 1.02 \
  --model-path models/tpuasr_final.ckpt --save-folder models/
run eval_greedy 3600 python -m tpuasr.cli.test \
  --model-path models/tpuasr_final.ckpt --test-manifest "$CORPUS/val.csv" \
  --batch-size 128 --device-resident-audio --timing
run train_lm 900 $CPUENV python -m tpuasr.cli.train_lm \
  --manifest "$CORPUS/train.csv" --out bench_runs/word3.arpa --order 3
run eval_beam_wide 5400 python -m tpuasr.cli.test \
  --model-path models/tpuasr_final.ckpt --test-manifest "$CORPUS/val.csv" \
  --batch-size 128 --device-resident-audio --timing \
  --decoder beam-device --lm-path bench_runs/word3.arpa \
  --device-lm-level word --alpha 0.6 --beta 0.4
run train_uni 5400 python -m tpuasr.cli.train \
  --train-manifest "$CORPUS/train.csv" --val-manifest "$CORPUS/val.csv" \
  --device-resident-audio --rnn-impl pallas --ctc-impl pallas \
  --no-bidirectional --epochs 20 --batch-size 32 --lr 5e-4 \
  --learning-anneal 1.02 --model-path models/tpuasr_uni.ckpt \
  --save-folder models/
# serve + multi-client streaming load test (VERDICT #6): server owns
# the chip; clients are plain HTTP.
stream_load() {
  local mode_flag="$1" name="$2"
  python -m tpuasr.cli.serve --model-path models/tpuasr_uni.ckpt \
    --port 8731 --streaming --max-streams 8 \
    --stream-norm-stats "$CORPUS/train.csv" \
    >"$OUT/serve_$name.log" 2>&1 &
  echo $! >/tmp/tpuasr_serve.pid
  for _ in $(seq 1 360); do
    curl -fsS -m 2 http://127.0.0.1:8731/healthz >/dev/null 2>&1 && break
    sleep 5
  done
  python scripts/stream_load_test.py --port 8731 --streams 8 \
    --seconds 30 $mode_flag
  local rc=$?
  kill "$(cat /tmp/tpuasr_serve.pid)" 2>/dev/null
  wait "$(cat /tmp/tpuasr_serve.pid)" 2>/dev/null
  return $rc
}
run load_throughput 5400 bash -c "$(declare -f stream_load); stream_load '' tput"
run load_realtime   3600 bash -c "$(declare -f stream_load); stream_load --realtime rt"

# ---- stage C: profile + compiler-kill repro (LAST) -----------------
run profile_step 3600 python scripts/profile_step.py
run wide_lm_repro 7200 python scripts/wide_lm_repro.py

echo "=== queue done $(date -u +%FT%TZ)"
