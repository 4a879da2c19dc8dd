"""Shared CLI flags.

Reference parity: the argparse surface of ref:train.py / ref:test.py /
ref:transcribe.py (SURVEY.md §5.6) — flag names mirrored 1:1 so
reference users can switch without relearning; internally everything
maps onto typed config dataclasses.
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp

from tpuasr.audio.frontend import FrontendConfig
from tpuasr.labels import Alphabet, load_labels
from tpuasr.model.ds2 import ModelConfig


def add_audio_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--sample-rate", type=int, default=16000)
    p.add_argument("--window-size", type=float, default=0.02,
                   help="window size in seconds")
    p.add_argument("--window-stride", type=float, default=0.01,
                   help="window stride in seconds")
    p.add_argument("--window", default="hamming",
                   choices=["hamming", "hann", "blackman", "bartlett", "rect"])


def add_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--hidden-size", type=int, default=800)
    p.add_argument("--hidden-layers", type=int, default=5)
    p.add_argument("--rnn-type", default="gru", choices=["gru", "lstm", "rnn"])
    p.add_argument("--no-bidirectional", dest="bidirectional",
                   action="store_false", default=True)
    p.add_argument("--lookahead-context", type=int, default=20,
                   help="unidirectional models only: Lookahead layer "
                   "context frames (ref:model.py Lookahead; also the "
                   "streaming delay buffer depth)")
    p.add_argument("--labels-path", default=None,
                   help="JSON list of characters; default PT-BR alphabet")
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--rnn-impl", default="scan", choices=["scan", "pallas", "pallas2"],
                   help="recurrent time loop: lax.scan or fused Pallas")
    p.add_argument("--bn-mask-mode", default="masked",
                   choices=["masked", "reference"],
                   help="masked: BN stats/RNN carries see true lengths "
                   "only (default); reference: padding-inclusive "
                   "reference-family semantics for exact finetune "
                   "parity with imported torch checkpoints")


def add_decoder_args(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--decoder", default="greedy",
        choices=["greedy", "beam", "beam-device", "beam-native"],
        help="greedy | beam (host Python, word LM) | beam-device "
        "(on-device, char LM) | beam-native (host C++, word LM)",
    )
    p.add_argument("--lm-path", default=None,
                   help="ARPA or binary n-gram LM for beam shallow fusion")
    p.add_argument("--alpha", type=float, default=0.8, help="LM weight")
    p.add_argument("--beta", type=float, default=1.0, help="word bonus")
    p.add_argument("--beam-width", type=int, default=10)
    p.add_argument("--cutoff-top-n", type=int, default=40)
    p.add_argument("--cutoff-prob", type=float, default=1.0)
    p.add_argument("--lm-workers", type=int, default=1)
    p.add_argument(
        "--device-lm-level", default="word", choices=["word", "char"],
        help="beam-device only: fuse --lm-path as a word n-gram "
        "(ctcdecode semantics, default) or a char n-gram",
    )


def frontend_config_from(args) -> FrontendConfig:
    return FrontendConfig(
        sample_rate=args.sample_rate,
        window_size=args.window_size,
        window_stride=args.window_stride,
        window=args.window,
    )


def model_config_from(args, alphabet: Alphabet,
                      n_features: int) -> ModelConfig:
    return ModelConfig(
        n_classes=alphabet.size,
        n_features=n_features,
        hidden_size=args.hidden_size,
        hidden_layers=args.hidden_layers,
        rnn_type=args.rnn_type,
        bidirectional=args.bidirectional,
        compute_dtype=jnp.bfloat16 if args.compute_dtype == "bfloat16"
        else jnp.float32,
        rnn_impl=getattr(args, "rnn_impl", "scan"),
        bn_mask_mode=getattr(args, "bn_mask_mode", "masked") or "masked",
        lookahead_context=getattr(args, "lookahead_context", 20),
    )


def alphabet_from(args) -> Alphabet:
    return load_labels(args.labels_path)


def add_runtime_args(p: argparse.ArgumentParser) -> None:
    """Flags that override runtime (non-weight) choices stored in a
    checkpoint: kernel implementation selection."""
    p.add_argument("--rnn-impl", default=None, choices=["scan", "pallas", "pallas2"],
                   help="override the checkpoint's RNN implementation")


def apply_runtime_overrides(model_cfg: ModelConfig, args) -> ModelConfig:
    import dataclasses

    if getattr(args, "rnn_impl", None):
        model_cfg = dataclasses.replace(model_cfg, rnn_impl=args.rnn_impl)
    return model_cfg


def build_decoder(args, alphabet: Alphabet):
    kw = dict(
        lm_path=args.lm_path,
        alpha=args.alpha,
        beta=args.beta,
        beam_width=args.beam_width,
        cutoff_top_n=args.cutoff_top_n,
        cutoff_prob=args.cutoff_prob,
    )
    if args.decoder == "beam":
        from tpuasr.decode.beam_host import BeamCTCDecoder

        return BeamCTCDecoder(alphabet, **kw)
    if args.decoder == "beam-native":
        from tpuasr.decode.native import NativeBeamDecoder

        return NativeBeamDecoder(alphabet, num_processes=args.lm_workers,
                                 **kw)
    if args.decoder == "beam-device":
        from tpuasr.decode.beam import DeviceBeamDecoder
        from tpuasr.decode.lm import load_lm

        lm = load_lm(args.lm_path) if args.lm_path else None
        level = getattr(args, "device_lm_level", "word")
        return DeviceBeamDecoder(
            alphabet, beam_width=args.beam_width,
            char_lm=lm if level == "char" else None,
            word_lm=lm if level == "word" else None,
            alpha=args.alpha, beta=args.beta,
            cutoff_top_n=args.cutoff_top_n, cutoff_prob=args.cutoff_prob,
        )
    from tpuasr.decode.greedy import GreedyDecoder

    return GreedyDecoder(alphabet)
