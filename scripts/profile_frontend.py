"""Decompose the frontend's 32.6 ms (B=128, 5 s utts, item 18) into
its stages and A/B candidate optimizations.

The log-spectrogram frontend (audio/frontend.py) costs ~22% of the
B=128 train step (32.6 of 145.5 ms) yet its arithmetic is ~13 GFLOP
(two (B*T, 320) @ (320, 161) DFT matmuls) + ~400 MB of HBM traffic —
speed-of-light is 1-2 ms. This probe times each stage in isolation
and three candidate fixes:
  * combined cos|sin matmul (one (320, 322) RHS, one pass over frames)
  * precision=HIGH (3-pass bf16) instead of HIGHEST (6-pass)
  * bf16 frames with f32 accumulation (default precision)
printing per-stage medians so the binding stage is a number, not a
guess.

Usage: python scripts/profile_frontend.py [--batch 128] [--seconds 5.0]
"""
import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.tree.map(
        lambda x: float(jnp.asarray(x).ravel()[0].astype(jnp.float32)), out
    )  # materialize through the tunnel (block_until_ready under-reports)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(
            lambda x: float(jnp.asarray(x).ravel()[0].astype(jnp.float32)),
            out,
        )
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts)), float(np.min(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    from tpuasr.audio.frontend import (
        FrontendConfig,
        _dft_mats,
        _window_np,
        frame_signal,
        log_spectrogram,
    )

    cfg = FrontendConfig()
    b = args.batch
    l = int(args.seconds * cfg.sample_rate)
    l -= l % cfg.hop
    rng = np.random.RandomState(0)
    waves = jnp.asarray(rng.randn(b, l).astype(np.float32) * 0.1)
    lengths = jnp.full((b,), l, jnp.int32)
    win = jnp.asarray(_window_np(cfg.window, cfg.n_fft))
    cos_m, sin_m = _dft_mats(cfg.n_fft)
    cos_j, sin_j = jnp.asarray(cos_m), jnp.asarray(sin_m)
    both_j = jnp.asarray(np.concatenate([cos_m, sin_m], axis=1))
    f = cfg.n_features

    stages = {}

    @jax.jit
    def full(w, ln):
        return log_spectrogram(w, ln, cfg)

    stages["FULL frontend"] = timeit(full, waves, lengths, reps=args.reps)

    @jax.jit
    def framing(w, ln):
        return frame_signal(w, ln, cfg.n_fft, cfg.hop)

    stages["framing only"] = timeit(framing, waves, lengths, reps=args.reps)
    frames = framing(waves, lengths)

    def dft(name, **kw):
        @jax.jit
        def g(fr):
            x = fr * win
            re = jnp.dot(x, cos_j, preferred_element_type=jnp.float32, **kw)
            im = jnp.dot(x, sin_j, preferred_element_type=jnp.float32, **kw)
            return jnp.log1p(jnp.sqrt(re * re + im * im + 1e-30))

        stages[name] = timeit(g, frames, reps=args.reps)

    dft("window+2xDFT+log1p HIGHEST",
        precision=jax.lax.Precision.HIGHEST)
    dft("window+2xDFT+log1p HIGH", precision=jax.lax.Precision.HIGH)
    dft("window+2xDFT+log1p default")

    @jax.jit
    def dft_combined(fr):
        x = fr * win
        z = jnp.dot(x, both_j, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        re, im = z[..., :f], z[..., f:]
        return jnp.log1p(jnp.sqrt(re * re + im * im + 1e-30))

    stages["window+combined DFT HIGHEST"] = timeit(
        dft_combined, frames, reps=args.reps)

    @jax.jit
    def dft_bf16(fr):
        x = (fr * win).astype(jnp.bfloat16)
        z = jnp.dot(x, both_j.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        re, im = z[..., :f], z[..., f:]
        return jnp.log1p(jnp.sqrt(re * re + im * im + 1e-30))

    stages["window+combined DFT bf16/f32acc"] = timeit(
        dft_bf16, frames, reps=args.reps)

    feats = jnp.log1p(jnp.abs(jnp.asarray(
        rng.randn(b, frames.shape[1], f).astype(np.float32))))

    @jax.jit
    def norm(x, ln):
        t_max = x.shape[1]
        mask = (jnp.arange(t_max, dtype=jnp.int32)[None, :]
                < ln[:, None])
        m = mask[:, :, None].astype(x.dtype)
        denom = jnp.maximum(ln.astype(x.dtype) * x.shape[-1], 1.0)
        masked = x * m
        mean = jnp.sum(masked, axis=(1, 2)) / denom
        var = jnp.sum(masked * masked, axis=(1, 2)) / denom - mean * mean
        std = jnp.sqrt(jnp.maximum(var, 1e-10))
        return ((x - mean[:, None, None]) / std[:, None, None]) * m

    fl = jnp.full((b,), frames.shape[1], jnp.int32)
    stages["normalize only"] = timeit(norm, feats, fl, reps=args.reps)

    # numerics: candidate vs current on the real composition
    ref = np.asarray(full(waves, lengths)[0], np.float64)
    for name, g in (("HIGH", None), ("bf16/f32acc", dft_bf16)):
        if g is None:
            @jax.jit
            def g(fr):
                x = fr * win
                re = jnp.dot(x, cos_j, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGH)
                im = jnp.dot(x, sin_j, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGH)
                return jnp.log1p(jnp.sqrt(re * re + im * im + 1e-30))
        got = np.asarray(g(frames), np.float64)
        # compare pre-normalization log-magnitudes
        cur = np.asarray(
            jnp.log1p(jnp.sqrt(
                jnp.dot(frames * win, cos_j,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST) ** 2
                + jnp.dot(frames * win, sin_j,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST) ** 2
                + 1e-30)), np.float64)
        d = np.abs(got - cur)
        print(f"numerics {name}: max |dlog| {d.max():.3e} "
              f"mean {d.mean():.3e}")

    print(f"\nB={b} T={frames.shape[1]} n_fft={cfg.n_fft} F={f} "
          f"(median of {args.reps}, float-sync)")
    for k, (med, mn) in stages.items():
        print(f"  {k:38s} {med:8.2f} ms  (min {mn:.2f})")


if __name__ == "__main__":
    main()
