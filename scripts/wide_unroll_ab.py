"""A/B the wide word-LM kernel's time-loop unroll at production scale.

The roll rule (ops/beam.py: tables > 24 MiB -> unroll=1) was set by the
round-4 OOM at unroll=8 (262144-cap trigram: 42 MiB tables + ~77 MiB of
per-step probe temporaries blew the 100 MiB scoped-VMEM budget). But a
PARTIAL unroll was never measured: wide3 (63.0 MiB tables, B=32) keeps
~33 MiB of headroom, enough for ~2 steps' probe temporaries — and the
unrolled small-table kernels measured meaningfully faster (Mosaic
pipelines the probe matmuls across timesteps).

This script A/Bs time_chunk x unroll on the REAL bench path by
monkeypatching beam_scan_pallas's time_chunk default in a child process
(decode/beam.py fetches the module attr at kernel-build time) and
forcing TPUASR_BEAM_UNROLL=1, i.e. each grid step fully unrolls its
(now smaller) chunk: time_chunk=2 == unroll-2.

Usage: python scripts/wide_unroll_ab.py [--arms roll8 u2] \
           [--lm-path bench_runs/wide3.arpa]
"""
import argparse
import os
import subprocess
import sys

CHILD = r"""
import functools, os, sys
import tpuasr.ops.beam as beam_ops
tc = os.environ.get("AB_TIME_CHUNK")
if tc:
    beam_ops.beam_scan_pallas = functools.partial(
        beam_ops.beam_scan_pallas, time_chunk=int(tc))
sys.argv = ["bench.py", "--mode", "beamlm", "--batch", "32",
            "--lm-path", os.environ["AB_LM_PATH"]]
import runpy
runpy.run_path("bench.py", run_name="__main__")
"""

# arm -> (time_chunk or None for default 8, TPUASR_BEAM_UNROLL or None
# for the roll rule's own choice)
ARMS = {
    "roll8": (None, "0"),   # baseline: chunk 8, rolled (today's rule)
    "u2": ("2", "1"),       # chunk 2, fully unrolled == unroll-2
    "u4": ("4", "1"),       # chunk 4, fully unrolled == unroll-4
    "roll2": ("2", "0"),    # chunk 2 rolled (isolates grid-size effect)
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lm-path", default="bench_runs/wide3.arpa")
    ap.add_argument("--timeout", type=float, default=3600.0)
    ap.add_argument("--arms", nargs="*", default=["roll8", "u2"])
    args = ap.parse_args()
    env = dict(os.environ)
    env.setdefault("TPUASR_COMPILE_CACHE", "/root/repo/.jax_cache")
    env["AB_LM_PATH"] = args.lm_path
    for arm in args.arms:
        tc, unroll = ARMS[arm]
        env.pop("AB_TIME_CHUNK", None)
        env.pop("TPUASR_BEAM_UNROLL", None)
        if tc:
            env["AB_TIME_CHUNK"] = tc
        if unroll is not None:
            env["TPUASR_BEAM_UNROLL"] = unroll
        print(f"--- arm {arm} (time_chunk={tc or 'default'}, "
              f"unroll={unroll})", flush=True)
        r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                           capture_output=True, text=True,
                           timeout=args.timeout)
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
        if r.returncode != 0:
            print(f"rc={r.returncode}\n{r.stderr[-1200:]}", flush=True)


if __name__ == "__main__":
    main()
