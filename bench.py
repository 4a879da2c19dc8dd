"""Headline benchmark: DS2 CTC training throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "utt/s/chip", "vs_baseline": N}

Measures the full jitted train step (on-device log-spectrogram frontend
+ 2 conv + 5 BiGRU-800 + CTC loss + clip/momentum SGD update) on
synthetic 5-second 16 kHz utterances — the shape profile of the PT-BR
corpora (BASELINE.json configs 3/5).

Baseline: the reference's GPU throughput was never published and the
reference mount is empty (SURVEY.md §6); BASELINE.md records the
documented proxy of 15 utt/s/GPU (2018-era single-GPU DS2 training,
deepspeech.pytorch family, ~5 s utterances). vs_baseline uses that
proxy; the north-star target is >= 5x.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_PROXY_UTT_PER_SEC = 15.0  # see BASELINE.md; [L] estimate
# Default batch = the measured per-chip throughput sweet spot on v5e
# (BASELINE.md batch-scaling table: 463 utt/s @32, 583 @64, 876 @128).
# The reference family trained at B=20-32 per GPU (memory-bound); on
# TPU the hardware-appropriate batch is part of the design. Override
# with --batch for comparability probes.
BATCH = 128
SECONDS = 5.0
SAMPLE_RATE = 16000
WARMUP = 2
ITERS = 10


def main(mode: str = "train") -> None:
    import jax

    # Persistent compile cache: the first TPU compile of the full train
    # step takes minutes via remote compile; cache it across runs.
    # TPUASR_COMPILE_CACHE (already applied by the package import) wins
    # so bench shares the cache with CLI/test runs.
    import os

    try:
        if not os.environ.get("TPUASR_COMPILE_CACHE"):
            jax.config.update("jax_compilation_cache_dir",
                              "/tmp/tpuasr_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from tpuasr.audio.frontend import FrontendConfig
    from tpuasr.labels import Alphabet
    from tpuasr.model.ds2 import ModelConfig
    from tpuasr.train.step import TrainConfig, init_train_state, make_train_step

    alphabet = Alphabet()
    frontend_cfg = FrontendConfig()
    train_cfg = TrainConfig()

    # Prefer the fused Pallas BiGRU kernel; fall back to lax.scan if the
    # kernel fails to compile on this runtime. --rnn-impl/--ctc-impl
    # override for kernel-selection probes.
    import sys

    argv = sys.argv[1:]
    rnn_impl = (argv[argv.index("--rnn-impl") + 1]
                if "--rnn-impl" in argv else "pallas")
    rnn_type = (argv[argv.index("--rnn-type") + 1]
                if "--rnn-type" in argv else "gru")
    ctc_impl = (argv[argv.index("--ctc-impl") + 1]
                if "--ctc-impl" in argv else "pallas")
    train_cfg = TrainConfig(ctc_impl=ctc_impl)
    model_cfg = ModelConfig(n_classes=alphabet.size, rnn_impl=rnn_impl,
                            rnn_type=rnn_type)
    state = init_train_state(model_cfg, train_cfg, jax.random.PRNGKey(0))
    if mode == "infer":
        _bench_infer(model_cfg, frontend_cfg, state)
        return
    if mode.startswith("beam"):
        import sys

        argv = sys.argv[1:]
        cut = int(argv[argv.index("--cutoff-top-n") + 1]) \
            if "--cutoff-top-n" in argv else 40
        beam_impl = (argv[argv.index("--beam-impl") + 1]
                     if "--beam-impl" in argv else "auto")
        lm_mode = ("word" if "lm" in mode
                   else "char" if "char" in mode else "none")
        _bench_beam(model_cfg, frontend_cfg, state, cutoff_top_n=cut,
                    lm_mode=lm_mode, impl=beam_impl)
        return
    train_step = make_train_step(model_cfg, frontend_cfg, train_cfg)

    n = int(SECONDS * SAMPLE_RATE)
    rng = np.random.RandomState(0)
    waves = jnp.asarray(rng.randn(BATCH, n).astype(np.float32) * 0.1)
    wave_lengths = jnp.asarray(np.full((BATCH,), n, np.int32))
    label_len = int(SECONDS * 14)  # ~14 chars/s
    labels = jnp.asarray(
        rng.randint(1, alphabet.size, size=(BATCH, label_len)).astype(np.int32)
    )
    label_lengths = jnp.asarray(np.full((BATCH,), label_len, np.int32))
    valid = jnp.ones((BATCH,), bool)
    lr = jnp.float32(3e-4)

    def one(i):
        nonlocal state
        state, metrics = train_step(
            state, waves, wave_lengths, labels, label_lengths, valid, lr,
            jax.random.PRNGKey(i),
        )
        return metrics

    # warmup with a REAL host sync each step: float() materializes the
    # scalar, which some PJRT transports wait for more honestly than
    # block_until_ready (measured: block_until_ready once reported a
    # 2.5 ms "step" that float-sync shows is ~200 ms).
    try:
        for i in range(WARMUP):
            m = one(i)
            _ = float(m["loss"])
    except Exception:
        rnn_impl = "scan"
        train_cfg = TrainConfig()  # scan CTC too
        model_cfg = ModelConfig(n_classes=alphabet.size, rnn_impl=rnn_impl,
                                rnn_type=rnn_type)
        state = init_train_state(model_cfg, train_cfg, jax.random.PRNGKey(0))
        train_step = make_train_step(model_cfg, frontend_cfg, train_cfg)
        for i in range(WARMUP):
            m = one(i)
            _ = float(m["loss"])

    t0 = time.perf_counter()
    for i in range(ITERS):
        m = one(WARMUP + i)
    _ = float(m["loss"])  # final state depends on every queued step
    dt = time.perf_counter() - t0

    utt_per_sec = BATCH * ITERS / dt
    rtf = utt_per_sec * SECONDS  # seconds of audio processed per second
    result = {
        "metric": "ds2_train_utterances_per_sec_per_chip",
        "value": round(utt_per_sec, 3),
        "unit": "utt/s/chip",
        "vs_baseline": round(utt_per_sec / REFERENCE_PROXY_UTT_PER_SEC, 3),
        "extra": {
            "step_ms": round(1e3 * dt / ITERS, 2),
            "train_rtf": round(rtf, 1),
            "batch": BATCH,
            "utt_seconds": SECONDS,
            "device": str(jax.devices()[0]),
            "rnn_impl": rnn_impl,
            "rnn_type": rnn_type,
            "loss": float(m["loss"]),
        },
    }
    print(json.dumps(result))


def _bench_beam(model_cfg, frontend_cfg, state, cutoff_top_n: int = 40,
                lm_mode: str = "none", impl: str = "auto") -> None:
    """Config-4 benchmark: on-device beam search (W=10), optionally
    with word- (XLA fusion) or char- (in-kernel dense-table fusion)
    n-gram shallow fusion, over the eval forward's logits."""
    import jax
    import jax.numpy as jnp

    from tpuasr.decode.beam import DeviceBeamDecoder
    from tpuasr.decode.lm import train_ngram
    from tpuasr.labels import Alphabet
    from tpuasr.train.step import make_eval_step

    alphabet = Alphabet()
    eval_step = make_eval_step(model_cfg, frontend_cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    n = int(SECONDS * SAMPLE_RATE)
    rng = np.random.RandomState(0)
    waves = jnp.asarray(rng.randn(BATCH, n).astype(np.float32) * 0.1)
    wave_lengths = jnp.asarray(np.full((BATCH,), n, np.int32))
    logits, ol = eval_step(variables, waves, wave_lengths)
    logits.block_until_ready()

    word_lm = char_lm = None
    words = ["ALO", "MUNDO", "BOM", "DIA", "TUDO", "BEM", "CASA", "SOM"]
    if lm_mode == "word":
        lines = [" ".join(rng.choice(words, size=4)) for _ in range(200)]
        word_lm = train_ngram(lines, order=3)
    elif lm_mode == "char":
        lines = [" ".join(list(" ".join(rng.choice(words, size=4))))
                 for _ in range(200)]
        char_lm = train_ngram(lines, order=3)
    with_lm = lm_mode != "none"
    dec = DeviceBeamDecoder(alphabet, beam_width=10, word_lm=word_lm,
                            char_lm=char_lm,
                            alpha=0.8 if with_lm else 0.0,
                            beta=1.0 if with_lm else 0.0,
                            cutoff_top_n=cutoff_top_n, impl=impl)

    for _ in range(WARMUP):
        store, toff, blen, scores = dec._run(logits, ol)
    t0 = time.perf_counter()
    iters = max(ITERS // 2, 3)
    for _ in range(iters):
        store, toff, blen, scores = dec._run(logits, ol)
    dt = time.perf_counter() - t0

    utt_per_sec = BATCH * iters / dt
    result = {
        "metric": "ds2_device_beam_utterances_per_sec_per_chip",
        "value": round(utt_per_sec, 3),
        "unit": "utt/s/chip",
        "vs_baseline": round(utt_per_sec / REFERENCE_PROXY_UTT_PER_SEC, 3),
        "extra": {
            "batch_ms": round(1e3 * dt / iters, 2),
            "batch": BATCH,
            "beam_width": 10,
            "cutoff_top_n": cutoff_top_n,
            "lm": lm_mode,
            "impl": "pallas" if dec._use_pallas() else "xla",
        },
    }
    print(json.dumps(result))


def _bench_infer(model_cfg, frontend_cfg, state) -> None:
    """Config-2 benchmark: batched greedy inference with the fused
    frontend (frontend + model fwd + argmax/collapse on device)."""
    import jax
    import jax.numpy as jnp

    from tpuasr.decode.greedy import greedy_best_path
    from tpuasr.train.step import make_eval_step

    eval_step = make_eval_step(model_cfg, frontend_cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    n = int(SECONDS * SAMPLE_RATE)
    rng = np.random.RandomState(0)
    waves = jnp.asarray(rng.randn(BATCH, n).astype(np.float32) * 0.1)
    wave_lengths = jnp.asarray(np.full((BATCH,), n, np.int32))

    def one():
        logits, ol = eval_step(variables, waves, wave_lengths)
        ids, emit = greedy_best_path(logits, ol)
        return emit

    for _ in range(WARMUP):
        emit = one()
        _ = int(jnp.sum(emit))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        emit = one()
    _ = int(jnp.sum(emit))
    dt = time.perf_counter() - t0

    utt_per_sec = BATCH * ITERS / dt
    result = {
        "metric": "ds2_greedy_infer_utterances_per_sec_per_chip",
        "value": round(utt_per_sec, 3),
        "unit": "utt/s/chip",
        "vs_baseline": round(utt_per_sec / REFERENCE_PROXY_UTT_PER_SEC, 3),
        "extra": {
            "batch_ms": round(1e3 * dt / ITERS, 2),
            "infer_rtf": round(utt_per_sec * SECONDS, 1),
            "batch": BATCH,
            "utt_seconds": SECONDS,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    import sys

    argv = sys.argv[1:]
    if "--batch" in argv:  # batch-scaling probes (BASELINE.md)
        BATCH = int(argv[argv.index("--batch") + 1])
    mode = "train"
    if "--mode" in argv:
        mode = argv[argv.index("--mode") + 1]
    main(mode)
