"""Decompose the flagship train step's wall time component by component.

Times each subgraph of the B=128 train step as its own jitted function
(frontend, RNN layer, CTC, model forward, loss forward, forward+backward,
full step) and prints a table with per-component ms, share of the full
step, and the analytic-FLOP MFU of the compute-bearing pieces — the data
needed to decide where the next optimization dollar goes (BASELINE.md
round-3 MFU thread; reference had no profiler at all, SURVEY.md §5.1).

Run on the real chip (background, nothing else on the tunnel):

    TPUASR_COMPILE_CACHE=/root/repo/.jax_cache \
    PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/profile_step.py --batch 128

Every subgraph is a NEW XLA graph: through this VM's remote compile
service each costs 5-20 min the first time (cached afterwards), so the
script prints progress per component. Timing follows the repo rule:
materialize a scalar with float() — block_until_ready under-reports
through the tunneled runtime.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

SAMPLE_RATE = 16000
WARMUP = 2
ITERS = 10


def _timed(label, fn, *args):
    """Compile + warm up fn, then return median wall ms via float-sync."""
    t0 = time.perf_counter()
    for _ in range(WARMUP):
        out = fn(*args)
        _ = float(out)
    compile_s = time.perf_counter() - t0
    lat = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(out)
        lat.append(time.perf_counter() - t0)
    med = sorted(lat)[len(lat) // 2] * 1e3
    print(f"  {label:<28s} {med:8.2f} ms   (min {min(lat)*1e3:.2f}, "
          f"compile+warm {compile_s:.1f}s)", flush=True)
    return med


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--rnn-impl", default="pallas",
                   choices=["scan", "pallas", "pallas2"])
    p.add_argument("--ctc-impl", default="pallas", choices=["scan", "pallas"])
    p.add_argument("--peak-tflops", type=float, default=197.0,
                   help="per-chip peak bf16 TFLOP/s for MFU (v5e=197)")
    args = p.parse_args(argv)

    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))  # repo root, for bench.py

    import jax
    import jax.numpy as jnp

    from bench import forward_flops_per_utt
    from tpuasr.audio.frontend import FrontendConfig, log_spectrogram
    from tpuasr.ctc.loss import ctc_loss, ctc_loss_pallas
    from tpuasr.labels import Alphabet
    from tpuasr.model.ds2 import (BatchRNN, DeepSpeech2, ModelConfig,
                                  conv_out_features, conv_out_lengths)
    from tpuasr.train.step import (TrainConfig, init_train_state,
                                   make_train_step)

    B, n = args.batch, int(args.seconds * SAMPLE_RATE)
    alphabet = Alphabet()
    fe = FrontendConfig()
    model_cfg = ModelConfig(n_classes=alphabet.size, rnn_impl=args.rnn_impl)
    train_cfg = TrainConfig(ctc_impl=args.ctc_impl)
    state = init_train_state(model_cfg, train_cfg, jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    waves = jnp.asarray(rng.randn(B, n).astype(np.float32) * 0.1)
    wave_lengths = jnp.asarray(np.full((B,), n, np.int32))
    label_len = int(args.seconds * 14)
    labels = jnp.asarray(rng.randint(1, alphabet.size, (B, label_len)),
                         dtype=jnp.int32)
    label_lengths = jnp.asarray(np.full((B,), label_len, np.int32))
    valid = jnp.ones((B,), bool)

    t_feat = 1 + n // fe.hop
    t_out = int(conv_out_lengths(t_feat))
    f_out = conv_out_features(fe.n_features, model_cfg.conv_channels)
    h, c = model_cfg.hidden_size, alphabet.size
    print(f"profile: B={B} {args.seconds}s  T_feat={t_feat} T'={t_out} "
          f"rnn_in={f_out} H={h} C={c}", flush=True)

    model = DeepSpeech2(model_cfg)
    loss_impl = ctc_loss_pallas if args.ctc_impl == "pallas" else ctc_loss

    # --- component graphs -------------------------------------------------
    @jax.jit
    def g_frontend(w, wl):
        feats, fl = log_spectrogram(w, wl, fe)
        return jnp.sum(feats.astype(jnp.float32))

    feats, feat_lengths = jax.jit(
        lambda w, wl: log_spectrogram(w, wl, fe))(waves, wave_lengths)
    feats = jax.block_until_ready(feats)

    @jax.jit
    def g_model_fwd(params, batch_stats, f, fl):
        (logits, ol), _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, f, fl,
            train=True, mutable=["batch_stats"])
        return jnp.sum(logits.astype(jnp.float32))

    logits = jax.jit(
        lambda p, bs, f, fl: model.apply(
            {"params": p, "batch_stats": bs}, f, fl, train=True,
            mutable=["batch_stats"])[0][0]
    )(state.params, state.batch_stats, feats, feat_lengths)
    logits = jax.block_until_ready(logits)
    out_lengths = jnp.asarray(np.full((B,), t_out, np.int32))

    @jax.jit
    def g_ctc_fwd(lg):
        return jnp.sum(loss_impl(lg, out_lengths, labels, label_lengths))

    @jax.jit
    def g_ctc_grad(lg):
        f = lambda x: jnp.sum(loss_impl(x, out_lengths, labels,
                                        label_lengths))
        v, g = jax.value_and_grad(f)(lg)
        return v + jnp.sum(g.astype(jnp.float32)) * 0.0

    # one representative mid-stack RNN layer (square H->H, the 4 of 5)
    rnn = BatchRNN(hidden=h, rnn_type=model_cfg.rnn_type,
                   bidirectional=model_cfg.bidirectional, batch_norm=True,
                   compute_dtype=model_cfg.compute_dtype,
                   param_dtype=jnp.float32, impl=model_cfg.rnn_impl)
    x_rnn = jnp.asarray(rng.randn(B, t_out, h).astype(np.float32) * 0.1)
    rnn_vars = rnn.init(jax.random.PRNGKey(1), x_rnn,
                        out_lengths, train=True)

    @jax.jit
    def g_rnn_fwd(params, batch_stats, x):
        out, _ = rnn.apply({"params": params,
                            "batch_stats": batch_stats}, x, out_lengths,
                           train=True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def g_rnn_grad(params, batch_stats, x):
        def f(p, xx):
            out, _ = rnn.apply({"params": p, "batch_stats": batch_stats},
                               xx, out_lengths, train=True,
                               mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32))
        v, g = jax.value_and_grad(f, argnums=(0, 1))(params, x)
        return v + sum(jnp.sum(t.astype(jnp.float32))
                       for t in jax.tree.leaves(g)) * 0.0

    def loss_from_waves(params, batch_stats, w, wl):
        f, fl = log_spectrogram(w, wl, fe)
        (lg, ol), _ = model.apply({"params": params,
                                   "batch_stats": batch_stats}, f, fl,
                                  train=True, mutable=["batch_stats"])
        per = loss_impl(lg, ol, labels, label_lengths)
        return jnp.mean(per)

    g_loss_fwd = jax.jit(loss_from_waves)

    @jax.jit
    def g_loss_grad(params, batch_stats, w, wl):
        v, g = jax.value_and_grad(loss_from_waves)(params, batch_stats,
                                                   w, wl)
        return v + sum(jnp.sum(t.astype(jnp.float32))
                       for t in jax.tree.leaves(g)) * 0.0

    train_step = make_train_step(model_cfg, fe, train_cfg)

    def g_full(i):
        nonlocal state
        state, m = train_step(state, waves, wave_lengths, labels,
                              label_lengths, valid, jnp.float32(3e-4),
                              jax.random.PRNGKey(i))
        return m["loss"]

    # --- measure ----------------------------------------------------------
    print("timings (median of 10, float-sync):", flush=True)
    r = {}
    r["frontend"] = _timed("frontend", g_frontend, waves, wave_lengths)
    r["model_fwd"] = _timed("model fwd (train BN)", g_model_fwd,
                            state.params, state.batch_stats, feats,
                            feat_lengths)
    r["ctc_fwd"] = _timed("ctc fwd", g_ctc_fwd, logits)
    r["ctc_fwd_bwd"] = _timed("ctc fwd+bwd", g_ctc_grad, logits)
    r["rnn_fwd"] = _timed("1 BiRNN layer fwd (HxH)", g_rnn_fwd,
                          rnn_vars["params"], rnn_vars["batch_stats"],
                          x_rnn)
    r["rnn_fwd_bwd"] = _timed("1 BiRNN layer fwd+bwd", g_rnn_grad,
                              rnn_vars["params"], rnn_vars["batch_stats"],
                              x_rnn)
    r["loss_fwd"] = _timed("loss fwd (fe+model+ctc)", g_loss_fwd,
                           state.params, state.batch_stats, waves,
                           wave_lengths)
    r["loss_fwd_bwd"] = _timed("loss fwd+bwd", g_loss_grad, state.params,
                               state.batch_stats, waves, wave_lengths)
    full_ms = _timed("FULL train step", g_full, 0)
    r["full_step"] = full_ms

    # --- report -----------------------------------------------------------
    fwd_flops = forward_flops_per_utt(model_cfg, fe, n) * B
    peak = args.peak_tflops * 1e12
    gates = 3
    rnn_layer_flops = 2 * t_out * gates * 2.0 * (2 * h * h) * B
    bwd_ms = r["loss_fwd_bwd"] - r["loss_fwd"]
    opt_ms = full_ms - r["loss_fwd_bwd"]
    print("\ndecomposition of the full step:")
    print(f"  forward total      {r['loss_fwd']:8.2f} ms "
          f"({100 * r['loss_fwd'] / full_ms:.0f}%)  "
          f"MFU {fwd_flops / (r['loss_fwd'] * 1e-3) / peak:.3f}")
    print(f"    frontend         {r['frontend']:8.2f} ms")
    print(f"    model fwd        {r['model_fwd']:8.2f} ms  "
          f"(~{5 * r['rnn_fwd']:.1f} of it = 5 x RNN layer "
          f"@ MFU {rnn_layer_flops / (r['rnn_fwd'] * 1e-3) / peak:.3f})")
    print(f"    ctc fwd          {r['ctc_fwd']:8.2f} ms")
    print(f"  backward (derived) {bwd_ms:8.2f} ms "
          f"({100 * bwd_ms / full_ms:.0f}%)")
    print(f"  optimizer+misc     {opt_ms:8.2f} ms "
          f"({100 * opt_ms / full_ms:.0f}%)")
    print(f"  FULL STEP          {full_ms:8.2f} ms  "
          f"train MFU {3 * fwd_flops / (full_ms * 1e-3) / peak:.3f}  "
          f"({B / (full_ms * 1e-3):.0f} utt/s)")
    print(json.dumps({k: round(v, 2) for k, v in r.items()}))


if __name__ == "__main__":
    main()
