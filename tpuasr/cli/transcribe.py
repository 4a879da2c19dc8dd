"""Transcribe one WAV file.

Reference parity: ref:transcribe.py (SURVEY.md §4.2) — load a
self-describing checkpoint, parse audio with the checkpoint's own
audio config, forward, decode (greedy or beam+LM), print text and
optional per-character frame offsets.

Usage:
  python -m tpuasr.cli.transcribe --model-path m.ckpt --audio-path x.wav
"""

from __future__ import annotations

import argparse
import sys

import jax.numpy as jnp
import numpy as np

from tpuasr.audio.io import load_audio
from tpuasr.cli.opts import (
    add_decoder_args,
    add_runtime_args,
    apply_runtime_overrides,
    build_decoder,
)
from tpuasr.model.ds2 import DeepSpeech2
from tpuasr.train.checkpoint import load_checkpoint
from tpuasr.train.step import make_eval_step


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="tpuasr transcribe")
    p.add_argument("--model-path", required=True)
    p.add_argument("--audio-path", required=True)
    p.add_argument("--offsets", action="store_true",
                   help="print per-character frame offsets")
    p.add_argument("--n-best", type=int, default=1,
                   help="beam decoders: print the top-N hypotheses "
                   "(score<TAB>text per line — ctcdecode returns every "
                   "beam, ref:transcribe.py printed the best)")
    p.add_argument("--chunk-overlap", type=float, default=2.0,
                   help="overlap (s) between chunks for audio longer "
                   "than the bucket ladder")
    p.add_argument("--streaming", action="store_true",
                   help="incremental greedy decoding with carried model "
                   "state (unidirectional checkpoints only); prints "
                   "text fragments as they finalize")
    p.add_argument("--chunk-frames", type=int, default=32,
                   help="streaming: feature frames per step (x10 ms)")
    p.add_argument("--beam-impl", default="auto",
                   choices=["auto", "host", "native", "device"],
                   help="streaming beam engine: fused on-device kernel "
                   "carrying beam state across chunks (device), "
                   "stateful C++ session (native), Python beam_step "
                   "(host), or the first whose preconditions hold "
                   "(auto: device, then native, then host)")
    p.add_argument("--stream-norm-stats", default=None, metavar="MANIFEST",
                   help="streaming + normalize=True checkpoints: prime "
                   "the causal normalization with corpus statistics "
                   "computed from this manifest (shrinks the "
                   "streaming-vs-offline normalization deviation; "
                   "PARITY.md)")
    p.add_argument("--stream-norm-weight", type=float, default=500.0,
                   help="prior weight of --stream-norm-stats in frames")
    add_decoder_args(p)
    add_runtime_args(p)
    args = p.parse_args(argv)

    pkg = load_checkpoint(args.model_path)
    alphabet = pkg.alphabet

    # device_put once: numpy variables re-upload on every dispatch
    # otherwise; blocking so no later traffic interleaves the upload
    # (see train.checkpoint.device_put_blocking)
    from tpuasr.train.checkpoint import device_put_blocking

    variables = device_put_blocking({
        "params": pkg.variables["params"],
        "batch_stats": pkg.variables["batch_stats"],
    })
    model_cfg = apply_runtime_overrides(pkg.model_config, args)
    eval_step = make_eval_step(model_cfg, pkg.frontend_config)
    decoder = build_decoder(args, alphabet)

    wave = load_audio(args.audio_path,
                      expected_sample_rate=pkg.frontend_config.sample_rate)

    if args.streaming:
        # Live-stream simulation: feed the wave in chunk-sized blocks
        # through the stateful streaming step (tpuasr.stream) and print
        # fragments as their lookahead context completes.
        from tpuasr.stream import StreamingTranscriber

        kw = {}
        if args.decoder == "beam":
            from tpuasr.decode.lm import ArpaLM

            kw = dict(
                decoder="beam",
                lm=ArpaLM.load(args.lm_path) if args.lm_path else None,
                alpha=args.alpha, beta=args.beta,
                beam_width=args.beam_width,
                cutoff_top_n=args.cutoff_top_n,
                cutoff_prob=args.cutoff_prob,
                beam_impl=args.beam_impl,
            )
        if args.stream_norm_stats:
            from tpuasr.audio.frontend import corpus_feature_stats

            mean, var = corpus_feature_stats(args.stream_norm_stats,
                                             pkg.frontend_config)
            kw["prime_stats"] = (mean, var, args.stream_norm_weight)
        st = StreamingTranscriber(variables, model_cfg,
                                  pkg.frontend_config, alphabet,
                                  chunk_frames=args.chunk_frames, **kw)
        block = args.chunk_frames * pkg.frontend_config.hop
        w = np.asarray(wave, np.float32)
        for i in range(0, len(w), block):
            frag = st.feed(w[i:i + block])
            if frag:
                print(frag, end="", flush=True)
        print(st.flush())
        if args.offsets:
            print(" ".join(map(str, st.offsets)))
        return 0

    # Static shapes, bounded compiles (SURVEY.md §5.7): pad up to the
    # bucket ladder — one compile per bucket, ever; beyond the ladder,
    # decode overlapping chunks stitched on host (decode/longform.py).
    from tpuasr.data.buckets import BucketSpec
    from tpuasr.decode.longform import (
        pad_to_ladder,
        samples_per_frame,
        transcribe_longform,
    )

    spec = BucketSpec(sample_rate=pkg.frontend_config.sample_rate)
    if len(wave) > spec.bucket_samples(spec.n_buckets - 1):
        text, offsets = transcribe_longform(
            eval_step, variables, wave, alphabet, spec, decoder,
            overlap_seconds=args.chunk_overlap,
            spf=samples_per_frame(pkg.frontend_config),
        )
        print(text)
        if args.offsets:
            print(" ".join(map(str, offsets)))
        return 0

    padded, n = pad_to_ladder(np.asarray(wave, np.float32), spec)
    waves = jnp.asarray(padded[None, :])
    lengths = jnp.asarray(np.array([n], np.int32))
    logits, out_lengths = eval_step(variables, waves, lengths)

    if args.n_best > 1:
        if not hasattr(decoder, "decode_nbest"):
            print("--n-best requires a beam decoder", file=sys.stderr)
            return 2
        for text, score, frames in decoder.decode_nbest(
                logits, out_lengths, n_best=args.n_best)[0]:
            print(f"{score:.4f}\t{text}")
            if args.offsets:
                print("\t" + " ".join(map(str, frames)))
    elif args.offsets:
        texts, offsets = decoder.decode(logits, out_lengths, return_offsets=True)
        print(texts[0])
        print(" ".join(map(str, offsets[0])))
    else:
        texts = decoder.decode(logits, out_lengths)
        print(texts[0])
    return 0


if __name__ == "__main__":
    sys.exit(main())
