"""Compile watchdog with automatic XLA fallback for the fused beam
kernel.

Round 4 hit the same failure mode twice: an untested (batch, table)
family sent the Mosaic beam kernel into a pathological compile that
either killed the remote compile service after 46 minutes
(bench_runs/r4/30) or never returned inside an hour (bench_runs/r4/40).
Each incident was closed by a static roll rule (ops/beam.py
time_unroll), but nothing prevented the NEXT untested family from
wedging a CLI eval indefinitely.

This module is the dynamic guard: the FIRST dispatch of a fused-beam
config (which triggers its compile) runs on a daemon thread with a
deadline. On expiry the config is blocklisted — in-process AND on disk
next to the compile cache — the caller is told via
``BeamCompileTimeout``, and the decode proceeds on the XLA hash-probe
path. A blocklisted config never attempts the kernel again (including
across processes/restarts), so one pathological compile costs one
timeout, ever. The zombie compile thread stays parked (daemon: it dies
with the process); if the remote compile service itself died, the XLA
fallback's compile surfaces that as its own failure rather than a
silent wedge.

Knobs (documented in OPERATIONS.md):
  TPUASR_BEAM_COMPILE_TIMEOUT  seconds for a first-time fused-beam
      compile+dispatch; 0 disables the guard. Default 2400 (40 min —
      above the slowest LEGITIMATE compile observed on this setup,
      below neither historical bomb).
  TPUASR_COMPILE_CACHE  when set, the blocklist persists to
      beam_compile_blocklist.json in that directory.
"""
from __future__ import annotations

import json
import os
import threading

_DEFAULT_TIMEOUT = 2400.0

_lock = threading.Lock()
_blocklist: set[str] = set()
_loaded_from: str | None = None


class BeamCompileFallback(RuntimeError):
    """Base: the fused-beam kernel cannot be used for this config (it
    hung or failed to compile); the config is blocklisted and callers
    should decode via the XLA path."""


class BeamCompileTimeout(BeamCompileFallback):
    """A fused-beam config's first compile exceeded the watchdog
    deadline; the config is now blocklisted and callers should decode
    via the XLA path."""

    def __init__(self, sig: str, timeout: float):
        super().__init__(
            f"fused beam kernel compile exceeded {timeout:.0f}s for "
            f"config [{sig}]; config blocklisted — decoding falls back "
            f"to the XLA path (raise TPUASR_BEAM_COMPILE_TIMEOUT or fix "
            f"the config to retry the kernel)")
        self.sig = sig
        self.timeout = timeout


class BeamCompileError(BeamCompileFallback):
    """A fused-beam config's compile FAILED outright (e.g. scoped-VMEM
    stack OOM — hit live on-chip with 63 MiB wide tables at B=128,
    bench_runs/r5/04: 119.0M demanded vs the 102.7M budget). Same
    treatment as a hang: blocklist + XLA fallback."""

    def __init__(self, sig: str, cause: BaseException):
        super().__init__(
            f"fused beam kernel compile failed for config [{sig}]: "
            f"{cause}; config blocklisted — decoding falls back to the "
            f"XLA path")
        self.sig = sig
        self.__cause__ = cause


# Substrings that identify a COMPILE failure (vs a genuine runtime
# error the caller must see): Mosaic/XLA kernel compilation and the
# remote compile service's transport errors.
_COMPILE_ERROR_MARKERS = (
    "Ran out of memory in memory space vmem",
    "scoped vmem limit",
    "remote_compile",
    "Mosaic",
    "tpu_compile_helper",
    "XLA compilation",
)


def is_compile_error(e: BaseException) -> bool:
    msg = str(e)
    return any(m in msg for m in _COMPILE_ERROR_MARKERS)


def timeout_seconds() -> float | None:
    """The active deadline, or None when the guard is disabled
    (TPUASR_BEAM_COMPILE_TIMEOUT=0, interpreter mode, or a non-TPU
    backend — CPU jit of the interpreter path is never a compile
    bomb)."""
    env = os.environ.get("TPUASR_BEAM_COMPILE_TIMEOUT")
    if env is not None:
        v = float(env)
        return v if v > 0 else None
    from tpuasr.ops import beam as _ops_beam

    if _ops_beam.INTERPRET:
        return None
    import jax

    try:
        if jax.default_backend() == "cpu":
            return None
    except Exception:
        return None
    return _DEFAULT_TIMEOUT


def _blocklist_file() -> str | None:
    d = os.environ.get("TPUASR_COMPILE_CACHE")
    return os.path.join(d, "beam_compile_blocklist.json") if d else None


def _load_locked() -> None:
    global _loaded_from
    path = _blocklist_file()
    if path == _loaded_from:
        return
    _loaded_from = path
    if path and os.path.exists(path):
        try:
            with open(path, encoding="utf-8") as f:
                _blocklist.update(json.load(f)["blocklist"])
        except Exception:
            pass  # a corrupt blocklist must never block decoding


def blocklisted(sig: str) -> bool:
    with _lock:
        _load_locked()
        return sig in _blocklist


def blocklist(sig: str) -> None:
    """Record ``sig`` as a known compile bomb (process + disk)."""
    with _lock:
        _load_locked()
        _blocklist.add(sig)
        path = _blocklist_file()
        if path:
            try:
                os.makedirs(os.path.dirname(path), exist_ok=True)
                tmp = path + ".tmp"
                with open(tmp, "w", encoding="utf-8") as f:
                    json.dump({"blocklist": sorted(_blocklist)}, f,
                              indent=1)
                os.replace(tmp, path)
            except Exception:
                pass


def run_guarded(fn, sig: str, timeout: float | None = None):
    """Run ``fn()`` (a first-time kernel dispatch) under the watchdog.
    Returns fn's result; raises ``BeamCompileTimeout`` after
    blocklisting ``sig`` if the deadline passes, ``BeamCompileError``
    (also blocklisting) if fn dies with a COMPILE failure; re-raises
    fn's own exception otherwise. timeout None = call directly with
    no deadline thread (compile-error mapping still applies)."""
    if timeout is None:
        timeout = timeout_seconds()
    if timeout is None:
        try:
            return fn()
        except Exception as e:
            if is_compile_error(e):
                blocklist(sig)
                raise BeamCompileError(sig, e) from e
            raise
    box: dict = {}
    done = threading.Event()

    def target():
        try:
            box["result"] = fn()
        except BaseException as e:  # noqa: BLE001 — reraised below
            box["error"] = e
        finally:
            done.set()

    th = threading.Thread(target=target, daemon=True,
                          name=f"beam-compile[{sig}]")
    th.start()
    if not done.wait(timeout):
        blocklist(sig)
        raise BeamCompileTimeout(sig, timeout)
    if "error" in box:
        e = box["error"]
        if is_compile_error(e):
            blocklist(sig)
            raise BeamCompileError(sig, e) from e
        raise e
    return box["result"]
