"""tpuasr — TPU-native end-to-end speech recognition framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the
``igormq/aes-lac-2018`` reference (Deep Speech 2-style CTC ASR for
Brazilian Portuguese): on-device log-spectrogram frontend, masked
conv + bidirectional GRU/LSTM acoustic model, CTC loss as a
time-major scan/Pallas kernel, greedy and LM-fused beam-search
decoding on device, manifest-driven datasets with SortaGrad
curriculum, and data-parallel training over a TPU mesh.

Reference parity map (reconstructed paths; the reference mount was
empty at survey time — see SURVEY.md §0):
  ref:data/data_loader.py  -> tpuasr.audio / tpuasr.data
  ref:model.py             -> tpuasr.model.ds2
  ref:decoder.py           -> tpuasr.decode
  ref:train.py             -> tpuasr.train + tpuasr.cli.train
  ref:test.py              -> tpuasr.cli.test
  ref:transcribe.py        -> tpuasr.cli.transcribe
  warp-ctc (C++/CUDA)      -> tpuasr.ctc (lax.scan + Pallas)
  ctcdecode + KenLM (C++)  -> tpuasr.decode.beam + tpuasr.decode.lm
                              (+ native/ host C++ parity decoder)
  sox (CLI)                -> tpuasr.audio.augment (on-device)
"""

__version__ = "0.1.0"

# Optional device override (useful where a TPU plugin claims the default
# backend): TPUASR_DEVICE=cpu [TPUASR_CPU_DEVICES=8] forces CPU execution.
import os as _os

if _os.environ.get("TPUASR_DEVICE"):
    import jax as _jax

    if _os.environ["TPUASR_DEVICE"] == "cpu":
        try:
            # restrict platform discovery too: enumerating devices
            # otherwise initializes every registered TPU plugin, which
            # hangs forever when its transport is wedged
            _jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass  # backends already initialized
    if _os.environ.get("TPUASR_CPU_DEVICES"):
        _jax.config.update(
            "jax_num_cpu_devices", int(_os.environ["TPUASR_CPU_DEVICES"])
        )
    _jax.config.update("jax_default_device", _os.environ["TPUASR_DEVICE"])

# Persistent XLA compile cache (first TPU compiles of the unrolled
# train step take minutes): TPUASR_COMPILE_CACHE=<dir>.
if _os.environ.get("TPUASR_COMPILE_CACHE"):
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir", _os.environ["TPUASR_COMPILE_CACHE"]
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
