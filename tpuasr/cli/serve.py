"""tpuasr serve — HTTP batch-transcription server.

Production serving surface (no reference equivalent — SURVEY.md §2
lists no serving layer; this is TPU-rebuild added value): micro-batched
transcription over static bucket shapes (tpuasr.serve).

Usage:
  python -m tpuasr.cli.serve --model-path model.ckpt --port 8080 \
      [--decoder greedy|beam|beam-device|beam-native --lm-path lm.arpa] \
      [--max-batch 32 --batch-window-ms 10]

  curl -X POST --data-binary @utt.wav http://host:8080/transcribe
  -> {"text": "...", "offsets": [...]}
"""

from __future__ import annotations

import argparse

from tpuasr.cli.opts import add_decoder_args, add_runtime_args, build_decoder
from tpuasr.serve import ServeConfig, TranscriptionService, make_http_server


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="tpuasr transcription server")
    p.add_argument("--model-path", required=True)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--max-batch", type=int, default=32)
    p.add_argument("--batch-window-ms", type=float, default=10.0)
    p.add_argument("--warmup-seconds", type=float, nargs="*", default=[],
                   help="compile these request-duration buckets before "
                   "listening (cold TPU compiles take minutes)")
    p.add_argument("--long-audio", default="chunk",
                   choices=["chunk", "reject", "truncate"],
                   help="requests beyond the bucket ladder: chunked "
                   "long-form decode (full transcript), reject, or "
                   "explicit truncation")
    p.add_argument("--chunk-overlap", type=float, default=2.0,
                   help="chunk overlap (s) for long-form decode")
    p.add_argument("--streaming", action="store_true",
                   help="enable live-stream sessions (POST /stream/*; "
                   "needs a unidirectional checkpoint) — many "
                   "concurrent streams share one batched device step")
    p.add_argument("--max-streams", type=int, default=8,
                   help="concurrent live-stream sessions (batch rows)")
    p.add_argument("--stream-chunk-frames", type=int, default=32,
                   help="feature frames per streaming step")
    p.add_argument("--session-timeout", type=float, default=300.0,
                   help="seconds of silence before a live-stream "
                   "session is reaped (slot leak guard)")
    p.add_argument("--stream-norm-stats", default=None, metavar="MANIFEST",
                   help="prime streaming causal normalization with "
                   "corpus statistics from this manifest (PARITY.md "
                   "streaming-normalization row)")
    p.add_argument("--stream-norm-weight", type=float, default=500.0,
                   help="prior weight of --stream-norm-stats in frames")
    p.add_argument("--stream-beam-impl", default="auto",
                   choices=["auto", "host", "native", "device"],
                   help="live-stream beam engine: device = fused "
                   "Pallas kernel carrying per-session beam state "
                   "across ticks on the TPU; native = stateful C++ "
                   "sessions; auto = device, then native, then host")
    add_decoder_args(p)
    add_runtime_args(p)
    args = p.parse_args(argv)

    from tpuasr.train.checkpoint import load_checkpoint

    # one checkpoint load + one device upload, shared by both services
    pkg = load_checkpoint(args.model_path)
    decoder = build_decoder(args, pkg.alphabet)
    service = TranscriptionService(
        args.model_path,
        ServeConfig(max_batch=args.max_batch,
                    batch_window_ms=args.batch_window_ms,
                    warmup_seconds=tuple(args.warmup_seconds),
                    long_audio=args.long_audio,
                    chunk_overlap=args.chunk_overlap),
        decoder=decoder,
        rnn_impl=getattr(args, "rnn_impl", None),
        package=pkg,
    )
    stream_service = None
    if args.streaming:
        from tpuasr.serve import StreamServeConfig, StreamSessionService

        prime = None
        if args.stream_norm_stats:
            from tpuasr.audio.frontend import corpus_feature_stats

            mean, var = corpus_feature_stats(args.stream_norm_stats,
                                             pkg.frontend_config)
            prime = (mean, var, args.stream_norm_weight)
        stream_service = StreamSessionService(
            args.model_path,
            StreamServeConfig(
                max_streams=args.max_streams,
                chunk_frames=args.stream_chunk_frames,
                session_timeout_s=args.session_timeout,
                prime_stats=prime,
                # sessions decode greedy unless the host beam decoder
                # was selected; beam fuses --lm-path per session
                decoder="beam" if args.decoder == "beam" else "greedy",
                beam_impl=args.stream_beam_impl,
                lm_path=args.lm_path, alpha=args.alpha, beta=args.beta,
                beam_width=args.beam_width,
                cutoff_top_n=args.cutoff_top_n,
                cutoff_prob=args.cutoff_prob),
            package=pkg,
            variables=service.variables,
        )
    server = make_http_server(service, args.host, args.port,
                              stream_service=stream_service)
    print(f"tpuasr serving on {args.host}:{args.port} "
          f"(max_batch={args.max_batch}, decoder={args.decoder}"
          f"{', streaming' if stream_service else ''})",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        service.close()
        if stream_service is not None:
            stream_service.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
