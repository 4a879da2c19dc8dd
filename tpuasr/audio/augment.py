"""On-device training-time augmentation.

Reference parity (SURVEY.md §3.1): the reference augments on HOST in
dataloader workers — ``augment_audio_with_sox`` (random tempo in
[0.85, 1.15] and gain in [-6, 8] dB via a sox subprocess + temp file)
and ``NoiseInjection`` (mix a random slice of a random noise file at a
random level with prob --noise-prob), ref:data/data_loader.py. The
north star moves all of it on device; this module is that replacement:

  * Tempo (default, reference parity): pitch-PRESERVING on-device
    WSOLA-style overlap-add (``wsola_tempo``) — sox "tempo" semantics.
    Frames of unmodified waveform are taken at a rate-scaled analysis
    hop and overlap-added at a fixed synthesis hop with a Hann window;
    with 50% overlap the shifted window halves sum to exactly 1, so
    the overlap-add is a reshape + one-frame roll — no scatter. The
    correlation search of true WSOLA is skipped (fixed hop): at the
    reference's ±15% tempo range the phase-jump artifacts are inaudible
    to a CTC model and the math stays pure VPU work.
  * Speed perturbation (opt-in, ``tempo_mode="resample"`` /
    --speed-perturb): per-utterance random resampling by linear
    interpolation — shifts pitch with rate (Kaldi-style), the standard
    modern ASR alternative.
  * Gain: scalar multiply per utterance ([-6, 8] dB).
  * Noise: a noise bank (all noise WAVs concatenated into one ring
    buffer, uploaded to HBM once) mixed in at a random offset and a
    random SNR-style level in [--noise-min, --noise-max], with
    probability --noise-prob per utterance.
  * SpecAugment (extension over the reference, BASELINE config 5):
    random frequency and time masks applied to the log-spectrogram.

Everything is functional: ``make_augment_fn`` returns a pair of jit-
safe callables driven by an explicit PRNG key — no Python RNG state,
reproducible under pjit.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class AugmentConfig:
    tempo_gain: bool = True
    # "wsola": pitch-preserving overlap-add (sox tempo, the reference's
    # recipe); "resample": linear-interp resampling (pitch shifts with
    # rate — speed perturbation)
    tempo_mode: str = "wsola"
    tempo_low: float = 0.85
    tempo_high: float = 1.15
    gain_db_low: float = -6.0
    gain_db_high: float = 8.0
    noise_dir: str | None = None
    noise_prob: float = 0.4
    noise_min: float = 0.0
    noise_max: float = 0.5
    spec_augment: bool = False
    freq_mask_width: int = 20
    time_mask_frac: float = 0.05
    n_freq_masks: int = 1
    n_time_masks: int = 1
    noise_bank_seconds: float = 120.0


def load_noise_bank(noise_dir: str, sample_rate: int,
                    max_seconds: float = 120.0) -> np.ndarray:
    """Concatenate noise WAVs into one 1-D ring buffer (host, once)."""
    from tpuasr.audio.io import load_audio

    chunks = []
    total = 0
    cap = int(max_seconds * sample_rate)
    for wav in sorted(Path(noise_dir).rglob("*.wav")):
        w = load_audio(str(wav), expected_sample_rate=sample_rate)
        chunks.append(w)
        total += len(w)
        if total >= cap:
            break
    if not chunks:
        raise ValueError(f"no .wav noise files under {noise_dir}")
    bank = np.concatenate(chunks)[:cap]
    return bank.astype(np.float32)


def speed_and_gain(rng, waves, lengths, cfg: AugmentConfig):
    """Per-utterance random speed (resample gather) + gain."""
    b, l_max = waves.shape
    k_rate, k_gain = jax.random.split(rng)
    rates = jax.random.uniform(
        k_rate, (b,), minval=cfg.tempo_low, maxval=cfg.tempo_high
    )
    gains_db = jax.random.uniform(
        k_gain, (b,), minval=cfg.gain_db_low, maxval=cfg.gain_db_high
    )
    # Output sample i reads input position i * rate (linear interp).
    pos = jnp.arange(l_max, dtype=jnp.float32)[None, :] * rates[:, None]
    lo = jnp.floor(pos).astype(jnp.int32)
    frac = pos - lo.astype(jnp.float32)
    hi = jnp.clip(lo + 1, 0, l_max - 1)
    lo = jnp.clip(lo, 0, l_max - 1)
    out = (
        jnp.take_along_axis(waves, lo, axis=1) * (1.0 - frac)
        + jnp.take_along_axis(waves, hi, axis=1) * frac
    )
    new_lengths = jnp.minimum(
        (lengths.astype(jnp.float32) / rates).astype(jnp.int32), l_max
    )
    valid = (
        jnp.arange(l_max, dtype=jnp.int32)[None, :] < new_lengths[:, None]
    )
    gain = 10.0 ** (gains_db / 20.0)
    out = out * gain[:, None] * valid.astype(out.dtype)
    return out, new_lengths


WSOLA_FRAME = 512  # 32 ms at 16 kHz; synthesis hop = half (50% overlap)


def wsola_tempo(rates, waves, lengths, frame: int = WSOLA_FRAME):
    """Pitch-preserving tempo change by rate (duration x 1/rate).

    Correlation-free WSOLA: analysis frames of ``frame`` samples start
    at fractional positions k * hop * rate (linear-interp gather);
    Hann-windowed frames overlap-add at the fixed synthesis hop
    (frame/2). Because shifted periodic-Hann halves sum to 1, the
    overlap-add is frame_k[:hop] + frame_{k-1}[hop:] — a reshape and a
    one-frame roll, no scatter (TPU-friendly; CLAUDE.md masking
    invariants hold: output beyond the new length is zeroed)."""
    b, l_max = waves.shape
    hop = frame // 2
    k_frames = max(l_max // hop, 1)
    k_idx = jnp.arange(k_frames, dtype=jnp.float32)
    starts = k_idx[None, :] * (hop * rates[:, None])  # (B, K)
    i_idx = jnp.arange(frame, dtype=jnp.float32)
    pos = starts[:, :, None] + i_idx[None, None, :]  # (B, K, N)
    lo = jnp.floor(pos).astype(jnp.int32)
    frac = (pos - lo.astype(jnp.float32)).astype(waves.dtype)
    hi = jnp.clip(lo + 1, 0, l_max - 1)
    lo = jnp.clip(lo, 0, l_max - 1)

    def gather(idx):
        flat = jnp.take_along_axis(waves, idx.reshape(b, -1), axis=1)
        return flat.reshape(b, k_frames, frame)

    frames = gather(lo) * (1.0 - frac) + gather(hi) * frac
    # periodic Hann: w[i] + w[i + hop] == 1 exactly
    w = (0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(frame) / frame)
         ).astype(waves.dtype)
    fw = frames * w[None, None, :]
    first = fw[:, :, :hop]  # frame k -> output block k
    second = fw[:, :, hop:]  # frame k -> output block k+1
    second = jnp.concatenate(
        [jnp.zeros_like(second[:, :1]), second[:, :-1]], axis=1
    )
    acc = (first + second).reshape(b, k_frames * hop)
    # block 0 has only one window half; renormalize it (clamped: the
    # very first samples are a deliberate ~hop-sample fade-in)
    wnorm = jnp.concatenate(
        [jnp.maximum(w[:hop], 0.5),
         jnp.ones(((k_frames - 1) * hop,), waves.dtype)]
    )
    out = acc / wnorm[None, :]
    out = jnp.pad(out, ((0, 0), (0, l_max - k_frames * hop)))
    new_lengths = jnp.minimum(
        (lengths.astype(jnp.float32) / rates).astype(jnp.int32), l_max
    )
    valid = (
        jnp.arange(l_max, dtype=jnp.int32)[None, :] < new_lengths[:, None]
    )
    return out * valid.astype(out.dtype), new_lengths


def tempo_and_gain(rng, waves, lengths, cfg: AugmentConfig):
    """Per-utterance random tempo (WSOLA or resample per
    cfg.tempo_mode) + gain — the reference's augment_audio_with_sox."""
    if cfg.tempo_mode == "resample":
        return speed_and_gain(rng, waves, lengths, cfg)
    b = waves.shape[0]
    k_rate, k_gain = jax.random.split(rng)
    rates = jax.random.uniform(
        k_rate, (b,), minval=cfg.tempo_low, maxval=cfg.tempo_high
    )
    gains_db = jax.random.uniform(
        k_gain, (b,), minval=cfg.gain_db_low, maxval=cfg.gain_db_high
    )
    out, new_lengths = wsola_tempo(rates, waves, lengths)
    gain = (10.0 ** (gains_db / 20.0)).astype(out.dtype)
    return out * gain[:, None], new_lengths


def inject_noise(rng, waves, lengths, noise_bank, cfg: AugmentConfig):
    """Mix a random bank slice at a random level with prob noise_prob
    (ref NoiseInjection.inject_noise semantics, vectorized on device)."""
    b, l_max = waves.shape
    n = noise_bank.shape[0]
    k_off, k_lvl, k_on = jax.random.split(rng, 3)
    offsets = jax.random.randint(k_off, (b,), 0, n)
    levels = jax.random.uniform(
        k_lvl, (b,), minval=cfg.noise_min, maxval=cfg.noise_max
    )
    on = jax.random.bernoulli(k_on, cfg.noise_prob, (b,))

    idx = (offsets[:, None] + jnp.arange(l_max, dtype=jnp.int32)[None, :]) % n
    noise = jnp.take(noise_bank, idx)  # (B, L) ring-buffer slices

    t_valid = (
        jnp.arange(l_max, dtype=jnp.int32)[None, :] < lengths[:, None]
    ).astype(waves.dtype)
    denom = jnp.maximum(lengths.astype(waves.dtype), 1.0)
    rms_x = jnp.sqrt(jnp.sum(waves**2 * t_valid, axis=1) / denom + 1e-10)
    rms_n = jnp.sqrt(jnp.sum(noise**2 * t_valid, axis=1) / denom + 1e-10)
    scale = jnp.where(on, levels * rms_x / rms_n, 0.0)
    return waves + scale[:, None] * noise * t_valid


def spec_augment(rng, feats, feat_lengths, cfg: AugmentConfig):
    """Frequency + time masking on (B, T, F) log-spectrograms."""
    b, t_max, f = feats.shape
    keys = jax.random.split(rng, 4)
    out = feats
    for i in range(cfg.n_freq_masks):
        kf = jax.random.fold_in(keys[0], i)
        k1, k2 = jax.random.split(kf)
        width = jax.random.randint(k1, (b,), 0, cfg.freq_mask_width + 1)
        start = jax.random.randint(k2, (b,), 0, jnp.maximum(f - width, 1))
        fr = jnp.arange(f, dtype=jnp.int32)[None, :]
        m = (fr >= start[:, None]) & (fr < (start + width)[:, None])
        out = out * (1.0 - m[:, None, :].astype(out.dtype))
    for i in range(cfg.n_time_masks):
        kt = jax.random.fold_in(keys[1], i)
        k1, k2 = jax.random.split(kt)
        max_w = jnp.maximum(
            (feat_lengths.astype(jnp.float32) * cfg.time_mask_frac).astype(jnp.int32),
            1,
        )
        width = jax.random.randint(k1, (b,), 0, t_max) % (max_w + 1)
        start = jax.random.randint(k2, (b,), 0, t_max) % jnp.maximum(
            feat_lengths - width, 1
        )
        tr = jnp.arange(t_max, dtype=jnp.int32)[None, :]
        m = (tr >= start[:, None]) & (tr < (start + width)[:, None])
        out = out * (1.0 - m[:, :, None].astype(out.dtype))
    return out


class AugmentFn:
    """Jit-safe augmentation pair: ``waves`` runs before the frontend,
    ``feats`` after (SpecAugment). Both are identity when disabled."""

    def __init__(self, cfg: AugmentConfig, sample_rate: int):
        self.cfg = cfg
        self._bank = None
        if cfg.noise_dir:
            self._bank = jnp.asarray(
                load_noise_bank(cfg.noise_dir, sample_rate,
                                cfg.noise_bank_seconds)
            )

    def waves(self, rng, waves, lengths):
        cfg = self.cfg
        k1, k2 = jax.random.split(rng)
        if cfg.tempo_gain:
            waves, lengths = tempo_and_gain(k1, waves, lengths, cfg)
        if self._bank is not None:
            waves = inject_noise(k2, waves, lengths, self._bank, cfg)
        return waves, lengths

    def feats(self, rng, feats, feat_lengths):
        if self.cfg.spec_augment:
            return spec_augment(rng, feats, feat_lengths, self.cfg)
        return feats

    # Back-compat callable form (waves only)
    def __call__(self, rng, waves, lengths):
        return self.waves(rng, waves, lengths)


def make_augment_fn(cfg: AugmentConfig, sample_rate: int = 16000) -> AugmentFn:
    return AugmentFn(cfg, sample_rate)
