"""Noise-injection listen-and-check utility.

Reference parity: ref:noise_inject.py — mix a noise file into an
utterance at a given level and write the result, so a user can audit
what --noise-dir training augmentation does. Runs the SAME on-device
augmentation code used in training (tpuasr.audio.augment.inject_noise)
rather than a separate host implementation.
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.audio.augment import AugmentConfig, inject_noise, load_noise_bank
from tpuasr.audio.io import load_audio, save_audio


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="tpuasr noise injection demo")
    p.add_argument("--input-path", required=True)
    p.add_argument("--noise-path", required=True,
                   help="a noise wav file or a directory of them")
    p.add_argument("--output-path", default="out.wav")
    p.add_argument("--noise-level", type=float, default=0.5)
    p.add_argument("--sample-rate", type=int, default=16000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    wave = load_audio(args.input_path, expected_sample_rate=args.sample_rate)
    import os

    if os.path.isdir(args.noise_path):
        bank = load_noise_bank(args.noise_path, args.sample_rate)
    else:
        bank = load_audio(args.noise_path,
                          expected_sample_rate=args.sample_rate)

    cfg = AugmentConfig(noise_prob=1.0, noise_min=args.noise_level,
                        noise_max=args.noise_level)
    out = inject_noise(
        jax.random.PRNGKey(args.seed),
        jnp.asarray(wave[None, :]),
        jnp.asarray(np.array([len(wave)], np.int32)),
        jnp.asarray(bank),
        cfg,
    )
    save_audio(args.output_path, np.asarray(out)[0], args.sample_rate)
    print(f"wrote {args.output_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
