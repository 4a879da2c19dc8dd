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

import argparse
import json
import time

import numpy as np

REFERENCE_PROXY_UTT_PER_SEC = 15.0  # see BASELINE.md; [L] estimate
SAMPLE_RATE = 16000
WARMUP = 2
ITERS = 10

# Peak dense bf16 TFLOP/s per chip by TPU generation (public numbers;
# MFU = achieved matmul FLOP/s ÷ this). Keyed on substrings of
# jax.devices()[0]'s string form; --peak-tflops overrides.
PEAK_TFLOPS = (
    ("v5 lite", 197.0),  # v5e
    ("v5e", 197.0),
    ("v5p", 459.0),
    ("v4", 275.0),
    ("v6", 918.0),  # v6e (Trillium)
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="tpuasr single-chip benchmark")
    p.add_argument("--mode", default="train",
                   choices=["train", "infer", "beam", "beamlm", "beamchar",
                            "stream"],
                   help="train step | greedy inference | device beam "
                   "(no LM / word LM / char LM) | streaming step latency")
    p.add_argument("--chunk-frames", type=int, default=32,
                   help="stream mode: feature frames per streaming step")
    p.add_argument("--streams", type=int, default=1,
                   help="stream mode: concurrent live streams sharing "
                   "one batched step (MultiStreamTranscriber)")
    p.add_argument("--stream-decoder", default="greedy",
                   choices=["greedy", "beam"],
                   help="stream mode: greedy or incremental beam "
                   "with a small word LM")
    p.add_argument("--stream-beam-impl", default="auto",
                   choices=["auto", "host", "native", "device"],
                   help="stream mode beam engine: device = the fused "
                   "Pallas kernel carrying per-slot beam state across "
                   "ticks (multi-stream only); native = stateful C++ "
                   "sessions; auto = device, then native, then host")
    # Default batch = the measured per-chip throughput sweet spot on v5e
    # (BASELINE.md batch-scaling table: 463 utt/s @32, 583 @64, 876
    # @128). The reference family trained at B=20-32 per GPU
    # (memory-bound); batching to the hardware is the TPU-native design.
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--seconds", type=float, default=5.0,
                   help="synthetic utterance duration")
    p.add_argument("--rnn-impl", default="pallas",
                   choices=["scan", "pallas", "pallas2"])
    p.add_argument("--rnn-type", default="gru", choices=["gru", "lstm", "rnn"])
    p.add_argument("--ctc-impl", default="pallas", choices=["scan", "pallas"])
    p.add_argument("--cutoff-top-n", type=int, default=40,
                   help="beam modes: per-frame candidate pruning")
    p.add_argument("--beam-impl", default="auto",
                   choices=["auto", "pallas", "xla"])
    p.add_argument("--lm-vocab", type=int, default=0,
                   help="beamlm mode: synthesize a word LM with this "
                   "many vocabulary words (0 = the tiny 8-word LM); "
                   ">= ~3000 routes the kernel onto the block-fetch "
                   "large-vocabulary path")
    p.add_argument("--lm-path", default=None,
                   help="beamlm mode: load this ARPA/.binary word LM "
                   "instead of synthesizing one (production-scale warm "
                   "throughput, e.g. bench_runs/wide3.arpa)")
    p.add_argument("--lm-order", type=int, default=3,
                   help="beamlm mode with --lm-vocab: n-gram order of "
                   "the synthesized LM (order > 3 exercises the XLA "
                   "fallback — the fused kernel fuses orders <= 3)")
    p.add_argument("--peak-tflops", type=float, default=None,
                   help="override the per-chip peak bf16 TFLOP/s used "
                   "for the MFU estimate")
    return p


def _peak_flops(device_str: str, override: float | None) -> float:
    if override:
        return override * 1e12
    s = device_str.lower()
    for key, tf in PEAK_TFLOPS:
        if key in s:
            return tf * 1e12
    return 197.0e12  # assume v5e (this build's target chip)


def forward_flops_per_utt(model_cfg, frontend_cfg, n_samples: int) -> float:
    """Analytic matmul FLOPs (2*MACs) for ONE utterance's forward pass:
    conv stack + recurrent stack + head. Frontend DFT and CTC are <1%
    and excluded; a train step is counted as 3x forward (backward ~ 2x).
    """
    from tpuasr.model.ds2 import CONV_SPECS

    hop = int(round(frontend_cfg.window_stride * frontend_cfg.sample_rate))
    t = 1 + n_samples // hop  # librosa center-padded frame count
    f = model_cfg.n_features
    c_in, c_out = 1, model_cfg.conv_channels
    flops = 0.0
    for (kt, kf, st, sf, pt, pf) in CONV_SPECS:
        t_out = (t + 2 * pt - kt) // st + 1
        f_out = (f + 2 * pf - kf) // sf + 1
        flops += 2.0 * kt * kf * c_in * c_out * t_out * f_out
        t, f, c_in = t_out, f_out, c_out
    rnn_in = f * c_out
    h = model_cfg.hidden_size
    n_dir = 2 if model_cfg.bidirectional else 1
    gates = {"gru": 3, "lstm": 4, "rnn": 1}[model_cfg.rnn_type]
    for layer in range(model_cfg.hidden_layers):
        i = rnn_in if layer == 0 else h
        flops += n_dir * t * gates * 2.0 * (i * h + h * h)
    flops += 2.0 * h * model_cfg.n_classes * t  # output head
    return flops


def _init_watchdog(timeout_s: float):
    """The axon backend init can block EVERY process indefinitely when
    the TPU tunnel wedges (observed 2026-08-17: 6+ hours). A hung bench
    helps nobody — after ``timeout_s`` without backend init, print an
    honest error line and exit hard (os._exit: the main thread is stuck
    in an uninterruptible C call). Cancelled once devices enumerate."""
    import os
    import threading

    done = threading.Event()

    def fire():
        if done.wait(timeout_s):
            return
        print(json.dumps({
            "metric": "ds2_train_utterances_per_sec_per_chip",
            "value": 0.0,
            "unit": "utt/s/chip",
            "vs_baseline": 0.0,
            "error": f"JAX backend init exceeded {timeout_s:.0f}s — "
                     "TPU tunnel wedged (see BASELINE.md round-3-late "
                     "note); rerun when the tunnel recovers",
        }), flush=True)
        os._exit(2)

    threading.Thread(target=fire, daemon=True).start()
    return done


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    import os as _os

    watchdog_done = _init_watchdog(
        float(_os.environ.get("TPUASR_BENCH_INIT_TIMEOUT", "900")))
    import jax

    jax.devices()  # blocks here if the tunnel is wedged
    watchdog_done.set()

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

    batch, seconds = args.batch, args.seconds
    alphabet = Alphabet()
    frontend_cfg = FrontendConfig()
    # Prefer the fused Pallas kernels; train mode falls back to lax.scan
    # if a kernel fails to compile on this runtime.
    rnn_impl = args.rnn_impl
    train_cfg = TrainConfig(ctc_impl=args.ctc_impl)
    model_cfg = ModelConfig(n_classes=alphabet.size, rnn_impl=rnn_impl,
                            rnn_type=args.rnn_type)
    if args.mode == "stream":
        _bench_stream(args, frontend_cfg, alphabet)
        return
    state = init_train_state(model_cfg, train_cfg, jax.random.PRNGKey(0))
    if args.mode == "infer":
        _bench_infer(args, model_cfg, frontend_cfg, state)
        return
    if args.mode.startswith("beam"):
        lm_mode = ("word" if "lm" in args.mode
                   else "char" if "char" in args.mode else "none")
        _bench_beam(args, model_cfg, frontend_cfg, state,
                    cutoff_top_n=args.cutoff_top_n, lm_mode=lm_mode,
                    impl=args.beam_impl)
        return
    train_step = make_train_step(model_cfg, frontend_cfg, train_cfg)

    n = int(seconds * SAMPLE_RATE)
    rng = np.random.RandomState(0)
    waves = jnp.asarray(rng.randn(batch, n).astype(np.float32) * 0.1)
    wave_lengths = jnp.asarray(np.full((batch,), n, np.int32))
    label_len = int(seconds * 14)  # ~14 chars/s
    labels = jnp.asarray(
        rng.randint(1, alphabet.size, size=(batch, label_len)).astype(np.int32)
    )
    label_lengths = jnp.asarray(np.full((batch,), label_len, np.int32))
    valid = jnp.ones((batch,), bool)
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
                                rnn_type=args.rnn_type)
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

    utt_per_sec = batch * ITERS / dt
    rtf = utt_per_sec * seconds  # seconds of audio processed per second
    step_flops = 3.0 * forward_flops_per_utt(model_cfg, frontend_cfg, n)
    peak = _peak_flops(str(jax.devices()[0]), args.peak_tflops)
    result = {
        "metric": "ds2_train_utterances_per_sec_per_chip",
        "value": round(utt_per_sec, 3),
        "unit": "utt/s/chip",
        "vs_baseline": round(utt_per_sec / REFERENCE_PROXY_UTT_PER_SEC, 3),
        "extra": {
            "step_ms": round(1e3 * dt / ITERS, 2),
            "train_rtf": round(rtf, 1),
            "batch": batch,
            "utt_seconds": seconds,
            "device": str(jax.devices()[0]),
            "rnn_impl": rnn_impl,
            "rnn_type": args.rnn_type,
            "loss": float(m["loss"]),
            # model FLOP utilization: analytic matmul FLOPs (fwd+bwd =
            # 3x fwd) / wall / peak — visible in every BENCH_r*.json so
            # perf regressions show up as a ratio, not just utt/s
            "mfu": round(utt_per_sec * step_flops / peak, 4),
            "gflop_per_utt_train": round(step_flops / 1e9, 1),
        },
    }
    print(json.dumps(result))


def _bench_beam(args, model_cfg, frontend_cfg, state, cutoff_top_n: int = 40,
                lm_mode: str = "none", impl: str = "auto") -> None:
    """Config-4 benchmark: on-device beam search (W=10), optionally
    with word- or char-n-gram shallow fusion (in-kernel where eligible),
    over the eval forward's logits."""
    import jax
    import jax.numpy as jnp

    from tpuasr.decode.beam import DeviceBeamDecoder
    from tpuasr.decode.lm import train_ngram
    from tpuasr.labels import Alphabet
    from tpuasr.train.step import make_eval_step

    batch, seconds = args.batch, args.seconds
    alphabet = Alphabet()
    eval_step = make_eval_step(model_cfg, frontend_cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    n = int(seconds * SAMPLE_RATE)
    rng = np.random.RandomState(0)
    waves = jnp.asarray(rng.randn(batch, n).astype(np.float32) * 0.1)
    wave_lengths = jnp.asarray(np.full((batch,), n, np.int32))
    logits, ol = eval_step(variables, waves, wave_lengths)
    logits.block_until_ready()

    word_lm = char_lm = None
    words = ["ALO", "MUNDO", "BOM", "DIA", "TUDO", "BEM", "CASA", "SOM"]
    n_entries = None
    if lm_mode == "word" and args.lm_path:
        from tpuasr.decode.lm import load_lm

        word_lm = load_lm(args.lm_path)
        n_entries = sum(len(t) for t in word_lm.ngrams)
    elif lm_mode == "word" and args.lm_vocab:
        # synthetic large-vocabulary LM: every word appears (full
        # unigram coverage), lines of 6 give ~vocab unique bi/trigrams
        letters = np.array(list("ABCDEFGHIJKLMNOPQRSTUVWXYZ"))
        # sorted(): set iteration order varies with PYTHONHASHSEED, so
        # an unsorted list gave every process a DIFFERENT vocab (and,
        # for borderline tables, different hash-table caps run to run)
        vocab = sorted({
            "".join(rng.choice(letters, size=rng.randint(3, 8)))
            for _ in range(int(args.lm_vocab * 1.2))
        })[: args.lm_vocab]
        order = np.arange(len(vocab))
        rng.shuffle(order)
        lines = [
            " ".join(vocab[i] for i in order[s : s + 6])
            for s in range(0, len(order), 6)
        ]
        word_lm = train_ngram(lines, order=args.lm_order)
        n_entries = sum(len(t) for t in word_lm.ngrams)
    elif lm_mode == "word":
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

    utt_per_sec = batch * iters / dt
    result = {
        "metric": "ds2_device_beam_utterances_per_sec_per_chip",
        "value": round(utt_per_sec, 3),
        "unit": "utt/s/chip",
        "vs_baseline": round(utt_per_sec / REFERENCE_PROXY_UTT_PER_SEC, 3),
        "extra": {
            "batch_ms": round(1e3 * dt / iters, 2),
            "batch": batch,
            "beam_width": 10,
            "cutoff_top_n": cutoff_top_n,
            "lm": lm_mode,
            "lm_vocab": args.lm_vocab or None,
            "lm_path": args.lm_path,
            "lm_entries": n_entries,
            "impl": "pallas" if dec.kernel_eligible() else "xla",
        },
    }
    print(json.dumps(result))


def _bench_stream(args, frontend_cfg, alphabet) -> None:
    """Streaming-step latency: unidirectional(+Lookahead) model, fixed
    chunk — the serving live-stream case (tpuasr.stream). --streams 1
    measures a lone stream's real-time factor; --streams N measures N
    concurrent streams sharing one batched step (aggregate RTF =
    N * chunk seconds / tick wall time — the MXU batch payoff)."""
    import jax

    from tpuasr.model.ds2 import ModelConfig
    from tpuasr.stream import MultiStreamTranscriber, StreamingTranscriber
    from tpuasr.train.step import TrainConfig, init_train_state

    model_cfg = ModelConfig(n_classes=alphabet.size, bidirectional=False,
                            rnn_type=args.rnn_type, rnn_impl="scan")
    state = init_train_state(model_cfg, TrainConfig(), jax.random.PRNGKey(0))
    variables = jax.device_put({"params": state.params,
                                "batch_stats": state.batch_stats})
    kw = {}
    if args.stream_decoder == "beam":
        from tpuasr.decode.lm import train_ngram

        kw = dict(decoder="beam", beam_width=10, alpha=0.5, beta=0.3,
                  lm=train_ngram(["ALO MUNDO BOM DIA", "TUDO BEM OLA",
                                  "BOM DIA ALO MUNDO"], order=3),
                  beam_impl=args.stream_beam_impl)
    block = args.chunk_frames * frontend_cfg.hop
    rng = np.random.RandomState(0)
    wave = (rng.randn(block * (WARMUP + ITERS + 2)) * 0.1).astype(np.float32)
    s = max(args.streams, 1)
    engine = args.stream_decoder
    if s == 1:
        kw.pop("beam_impl", None)  # single-stream: host/native only
        st = StreamingTranscriber(variables, model_cfg, frontend_cfg,
                                  alphabet, chunk_frames=args.chunk_frames,
                                  **kw)
        feed_tick = st.feed
    else:
        mst = MultiStreamTranscriber(variables, model_cfg, frontend_cfg,
                                     alphabet, max_streams=s,
                                     chunk_frames=args.chunk_frames, **kw)
        if args.stream_decoder == "beam":
            engine = ("beam-device" if mst._dev_engine is not None
                      else "beam-native" if mst._mk_native is not None
                      else "beam-host")
        sids = [mst.open() for _ in range(s)]

        def feed_tick(chunk):
            for sid in sids:
                mst.feed(sid, chunk)
            mst.tick()  # one batched step; np readback = host sync

    pos = 0
    for _ in range(WARMUP + 1):  # first feed compiles the step
        feed_tick(wave[pos:pos + block])
        pos += block
    lat = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        feed_tick(wave[pos:pos + block])
        pos += block
        lat.append(time.perf_counter() - t0)
    chunk_s = args.chunk_frames * frontend_cfg.window_stride
    med = sorted(lat)[len(lat) // 2]
    rtf = s * chunk_s / med
    # algorithmic delay: conv right context + lookahead, in conv frames
    delay_frames = 2 + 5 + max(model_cfg.lookahead_context - 1, 0)
    result = {
        "metric": "ds2_streaming_realtime_factor",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf, 2),  # 1.0 = real time
        "extra": {
            "streams": s,
            "chunk_ms": round(chunk_s * 1e3, 1),
            "step_ms_median": round(med * 1e3, 2),
            "step_ms_min": round(min(lat) * 1e3, 2),
            "chunk_frames": args.chunk_frames,
            "rnn_type": args.rnn_type,
            "stream_decoder": engine,
            "algorithmic_latency_ms": round(
                (delay_frames * 2 + 1) * frontend_cfg.window_stride * 1e3,
                0),
        },
    }
    print(json.dumps(result))


def _bench_infer(args, model_cfg, frontend_cfg, state) -> None:
    """Config-2 benchmark: batched greedy inference with the fused
    frontend (frontend + model fwd + argmax/collapse on device)."""
    import jax
    import jax.numpy as jnp

    from tpuasr.decode.greedy import greedy_best_path
    from tpuasr.train.step import make_eval_step

    batch, seconds = args.batch, args.seconds
    eval_step = make_eval_step(model_cfg, frontend_cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    n = int(seconds * SAMPLE_RATE)
    rng = np.random.RandomState(0)
    waves = jnp.asarray(rng.randn(batch, n).astype(np.float32) * 0.1)
    wave_lengths = jnp.asarray(np.full((batch,), n, np.int32))

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

    utt_per_sec = batch * ITERS / dt
    fwd_flops = forward_flops_per_utt(model_cfg, frontend_cfg, n)
    peak = _peak_flops(str(jax.devices()[0]), args.peak_tflops)
    result = {
        "metric": "ds2_greedy_infer_utterances_per_sec_per_chip",
        "value": round(utt_per_sec, 3),
        "unit": "utt/s/chip",
        "vs_baseline": round(utt_per_sec / REFERENCE_PROXY_UTT_PER_SEC, 3),
        "extra": {
            "batch_ms": round(1e3 * dt / ITERS, 2),
            "infer_rtf": round(utt_per_sec * seconds, 1),
            "batch": batch,
            "utt_seconds": seconds,
            "mfu": round(utt_per_sec * fwd_flops / peak, 4),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
