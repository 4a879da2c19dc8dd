"""Multi-process launcher.

Reference parity: ref:multiproc.py — spawn one train.py per GPU with
rank env/args and stream their output (SURVEY.md §4.5). On TPU pods
the runtime launches one process per host and `jax.distributed`
handles rendezvous, so this launcher exists for (a) drop-in script
compatibility and (b) multi-process CPU simulation of multi-host
training (each process gets a process id + coordinator address).

Usage:
  python -m tpuasr.cli.multiproc --world-size 2 -- \
      python -m tpuasr.cli.train --train-manifest ... --world-size 2
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="tpuasr multi-process launcher")
    p.add_argument("--world-size", type=int, required=True)
    p.add_argument("--dist-url", default="localhost:12355",
                   help="coordinator address host:port")
    p.add_argument("command", nargs=argparse.REMAINDER,
                   help="command to launch per process (after --)")
    args = p.parse_args(argv)

    cmd = args.command
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        p.error("no command given (pass it after --)")

    procs = []
    for rank in range(args.world_size):
        env = dict(os.environ)
        env.update({
            "TPUASR_PROCESS_ID": str(rank),
            "TPUASR_NUM_PROCESSES": str(args.world_size),
            "TPUASR_COORDINATOR": args.dist_url,
        })
        full = cmd + ["--rank", str(rank),
                      "--world-size", str(args.world_size),
                      "--dist-url", args.dist_url]
        procs.append(subprocess.Popen(full, env=env))

    rc = 0
    for pr in procs:
        rc |= pr.wait()
    return rc


if __name__ == "__main__":
    sys.exit(main())
