"""Batch evaluation over a test manifest.

Reference parity: ref:test.py (SURVEY.md §4.3) — run the model over a
manifest, decode (greedy or beam+KenLM-style LM fusion), and print the
aggregate "Test Summary — Average WER / Average CER"; --save-output
dumps hypotheses/references.

Usage:
  python -m tpuasr.cli.test --model-path m.ckpt --test-manifest val.csv
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from tpuasr.cli.opts import (
    add_decoder_args,
    add_runtime_args,
    apply_runtime_overrides,
    build_decoder,
)
from tpuasr.data.buckets import BucketSpec, make_buckets
from tpuasr.data.loader import AudioBatchLoader
from tpuasr.data.manifest import order_and_prune, read_manifest
from tpuasr.decode.metrics import ErrorRateMeter
from tpuasr.train.checkpoint import load_checkpoint
from tpuasr.train.loop import _device_batch
from tpuasr.train.step import make_eval_step


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="tpuasr test (batch eval)")
    p.add_argument("--model-path", required=True)
    p.add_argument("--test-manifest", required=True)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--num-workers", type=int, default=2,
                   help="host prefetch depth (reference: dataloader workers)")
    p.add_argument("--device-resident-audio", action="store_true",
                   help="pack the eval corpus into HBM once; batches "
                   "assemble by on-device gather (fits-in-HBM sets)")
    p.add_argument("--transfer-dtype", default="int16",
                   choices=["int16", "float32"])
    p.add_argument("--save-output", default=None,
                   help="write per-utterance hyp/ref JSONL here")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--timing", action="store_true",
                   help="print eval wall time and utt/s after the summary")
    p.add_argument("--timing-repeats", type=int, default=1,
                   help="run the eval N times and report the LAST pass "
                   "(first pass pays jit tracing/compile; steady-state "
                   "serving numbers need a warm pass)")
    add_decoder_args(p)
    add_runtime_args(p)
    args = p.parse_args(argv)

    pkg = load_checkpoint(args.model_path)
    alphabet = pkg.alphabet

    # Checkpoints restore as host numpy; device_put ONCE or every
    # eval dispatch re-uploads the full parameter set (measured 4.5 s
    # per call for the flagship's ~245 MB through a tunneled host).
    # BLOCKING: the upload must complete before LM tables / corpus /
    # compile traffic is issued (see device_put_blocking).
    from tpuasr.train.checkpoint import device_put_blocking

    variables = device_put_blocking({
        "params": pkg.variables["params"],
        "batch_stats": pkg.variables["batch_stats"],
    })
    model_cfg = apply_runtime_overrides(pkg.model_config, args)
    eval_step = make_eval_step(model_cfg, pkg.frontend_config)
    decoder = build_decoder(args, alphabet)

    entries = order_and_prune(read_manifest(args.test_manifest))
    plan = make_buckets(
        entries, args.batch_size,
        BucketSpec(sample_rate=pkg.frontend_config.sample_rate),
        shuffle=False,
    )
    if args.device_resident_audio:
        from tpuasr.data.resident import ResidentBatchLoader

        loader = ResidentBatchLoader(
            plan, alphabet, sample_rate=pkg.frontend_config.sample_rate)
    else:
        loader = AudioBatchLoader(plan, alphabet,
                                  sample_rate=pkg.frontend_config.sample_rate,
                                  prefetch=args.num_workers,
                                  transfer_dtype=args.transfer_dtype)

    import time as _time

    meter = ErrorRateMeter()
    t_eval0 = _time.time()
    out_f = open(args.save_output, "w") if args.save_output else None

    def emit_result(hyp: str, ref: str) -> None:
        meter.update(hyp, ref)
        if args.verbose:
            print(f"Ref: {ref}\nHyp: {hyp}\n")
        if out_f:
            out_f.write(json.dumps({"ref": ref, "hyp": hyp},
                                   ensure_ascii=False) + "\n")

    # eval-in-a-scan: whole manifest in one dispatch per bucket (public
    # API, decode/resident_eval.py); decoders whose search cannot run
    # in the fused kernel fall through to the per-batch streaming loop
    resident_epoch = None
    from tpuasr.decode.resident_eval import (
        ResidentEvaluator,
        supports_resident_eval,
    )

    if args.device_resident_audio and supports_resident_eval(
        decoder, model_cfg.n_classes, batch_size=args.batch_size
    ):
        evaluator = ResidentEvaluator(model_cfg, pkg.frontend_config, decoder)

        def resident_epoch():
            for hyp, ref in evaluator.pairs(loader, variables):
                emit_result(hyp, ref)

    if resident_epoch is not None:
        from tpuasr.decode.compile_guard import BeamCompileFallback

        try:
            for rep in range(max(args.timing_repeats, 1)):
                meter = ErrorRateMeter()
                t_eval0 = _time.time()
                resident_epoch()
        except BeamCompileFallback as e:
            # a pathological fused-kernel compile must not wedge the
            # eval: the config is now blocklisted (decode/compile_guard)
            # and the per-batch loop below decodes it via the XLA path
            print(f"tpuasr: WARNING: {e}\n"
                  f"tpuasr: continuing with the per-batch XLA eval loop",
                  file=sys.stderr, flush=True)
        else:
            if out_f:
                out_f.close()
            print(
                f"Test Summary \t"
                f"Average WER {meter.wer:.3f}\t"
                f"Average CER {meter.cer:.3f}"
            )
            if args.timing:
                dt = _time.time() - t_eval0
                print(f"Timing \t{meter.n_utts} utts in {dt:.2f}s "
                      f"= {meter.n_utts / max(dt, 1e-9):.1f} utt/s")
            return 0

    for rep in range(max(args.timing_repeats, 1)):
        meter = ErrorRateMeter()
        t_eval0 = _time.time()
        for batch in loader.epoch(0):
            waves, wave_lengths, labels, label_lengths, valid = _device_batch(
                batch, None
            )
            logits, out_lengths = eval_step(variables, waves, wave_lengths)
            hyps = decoder.decode(logits, out_lengths)
            valid_host = np.asarray(batch.valid)
            for j, (hyp, ref) in enumerate(zip(hyps, batch.texts)):
                if not valid_host[j]:
                    continue
                emit_result(hyp, ref)
    if out_f:
        out_f.close()

    print(
        f"Test Summary \t"
        f"Average WER {meter.wer:.3f}\t"
        f"Average CER {meter.cer:.3f}"
    )
    if args.timing:
        dt = _time.time() - t_eval0
        print(f"Timing \t{meter.n_utts} utts in {dt:.2f}s "
              f"= {meter.n_utts / max(dt, 1e-9):.1f} utt/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
