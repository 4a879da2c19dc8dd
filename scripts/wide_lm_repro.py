"""Minimal repro probe for the round-3 remote-compiler kill.

Round 3 found that a fused beam kernel carrying ONE monolithic
(2048, 3584) bf16 table input (14 MiB — a 262144-cap word-LM order)
reproducibly killed the remote compile service silently, while
(1024, 3584) inputs (7 MiB) compiled fine. Round 4 works around it by
splitting every order into <=1024-row chunk inputs (ops/beam.py
MAX_WIDE_ROWS_PER_REF).

This probe isolates the variable: ONE trivial kernel, ONE table input,
sweep the row count. Run each case in a subprocess with a timeout so a
killed compile can't hang the probe.

Usage: python scripts/wide_lm_repro.py [--rows 512 1024 2048] [--timeout 1800]
"""
import argparse
import os
import subprocess
import sys
import time

CHILD = r"""
import functools, sys
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rows = int(sys.argv[1])
LANES = 3584  # 14 planes x 256 lanes, the wide-table layout

def kernel(oh_ref, tab_ref, out_ref):
    out_ref[:] = jnp.dot(oh_ref[:], tab_ref[:],
                         preferred_element_type=jnp.float32)

@jax.jit
def probe(oh, tab):
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((8, rows), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((rows, LANES), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, LANES), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(oh, tab)

oh = jnp.zeros((8, rows), jnp.bfloat16)
tab = jnp.ones((rows, LANES), jnp.bfloat16)
out = probe(oh, tab)
print("OK", rows, float(out.sum()))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, nargs="*",
                    default=[512, 1024, 2048, 4096])
    ap.add_argument("--timeout", type=float, default=1800.0)
    args = ap.parse_args()
    env = dict(os.environ)
    env.setdefault("TPUASR_COMPILE_CACHE", "/root/repo/.jax_cache")
    for rows in args.rows:
        mib = rows * 3584 * 2 / (1 << 20)
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", CHILD, str(rows)],
                               capture_output=True, text=True,
                               timeout=args.timeout, env=env)
            dt = time.time() - t0
            status = ("OK" if r.returncode == 0 and "OK" in r.stdout
                      else f"FAIL rc={r.returncode}")
            print(f"rows={rows} ({mib:.1f} MiB): {status} in {dt:.0f}s",
                  flush=True)
            if r.returncode != 0:
                print(r.stderr[-500:], flush=True)
        except subprocess.TimeoutExpired:
            print(f"rows={rows} ({mib:.1f} MiB): TIMEOUT after "
                  f"{args.timeout:.0f}s — compile service likely killed "
                  f"(round-3 signature: client blocks in tcp_recvmsg, "
                  f"no :8093 connection)", flush=True)


if __name__ == "__main__":
    main()
