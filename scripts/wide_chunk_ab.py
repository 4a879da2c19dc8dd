"""A/B the wide word-LM kernel: monolithic vs chunked table refs.

Round 3 measured the 16k-vocab trigram (caps 131072/order, R=1024 rows
-> ONE chunk per order under round 4's MAX_WIDE_ROWS_PER_REF=1024) at
63.7 ms/batch; round 4's first on-chip run of the logically-identical
chunked path read 86.8 ms. The generated math should be the same —
this script pins the variable by running bench --mode beamlm twice in
subprocesses: once as-is (chunked bound), once with
TPUASR_WIDE_ROWS_OVERRIDE forcing monolithic refs (the exact round-3
kernel inputs).

Usage: python scripts/wide_chunk_ab.py [--lm-vocab 16000]
"""
import argparse
import os
import subprocess
import sys

CHILD = r"""
import os, sys
import tpuasr.ops.beam as beam_ops
ov = os.environ.get("TPUASR_WIDE_ROWS_OVERRIDE")
if ov:
    beam_ops.MAX_WIDE_ROWS_PER_REF = int(ov)
sys.argv = ["bench.py", "--mode", "beamlm", "--batch", "32",
            "--lm-vocab", os.environ.get("AB_VOCAB", "16000")]
import runpy
runpy.run_path("bench.py", run_name="__main__")
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lm-vocab", default="16000")
    ap.add_argument("--timeout", type=float, default=3600.0)
    ap.add_argument("--arms", nargs="*", default=["chunked", "monolithic"])
    args = ap.parse_args()
    env = dict(os.environ)
    env.setdefault("TPUASR_COMPILE_CACHE", "/root/repo/.jax_cache")
    env["AB_VOCAB"] = args.lm_vocab
    for arm in args.arms:
        env.pop("TPUASR_WIDE_ROWS_OVERRIDE", None)
        if arm == "monolithic":
            env["TPUASR_WIDE_ROWS_OVERRIDE"] = "1048576"
        print(f"--- arm {arm}", flush=True)
        r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                           capture_output=True, text=True,
                           timeout=args.timeout)
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
        if r.returncode != 0:
            print(f"rc={r.returncode}\n{r.stderr[-800:]}", flush=True)


if __name__ == "__main__":
    main()
