"""Training entry point.

Reference parity: ref:train.py's CLI (SURVEY.md §4.1, §5.6) — flag
names mirrored 1:1 (manifests, audio conf, model shape, optimizer,
SortaGrad, augmentation, checkpointing, resume/finetune, logging). The
reference's --cuda becomes a no-op (accepted for drop-in scripts);
--world-size/--rank/--dist-* map onto JAX multi-host initialization
instead of torch.distributed (SURVEY.md §5.8).

Usage:
  python -m tpuasr.cli.train --train-manifest train.csv \
      --val-manifest val.csv --epochs 70 --checkpoint
"""

from __future__ import annotations

import argparse
import sys

import jax

from tpuasr.audio.augment import AugmentConfig, make_augment_fn
from tpuasr.cli.opts import (
    add_audio_args,
    add_model_args,
    alphabet_from,
    frontend_config_from,
    model_config_from,
)
from tpuasr.data.buckets import BucketSpec, make_buckets
from tpuasr.data.loader import AudioBatchLoader
from tpuasr.data.manifest import order_and_prune, read_manifest
from tpuasr.train.loop import LoopConfig, train
from tpuasr.train.mesh import distributed_init
from tpuasr.train.step import TrainConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="tpuasr train")
    p.add_argument("--train-manifest", required=True)
    p.add_argument("--val-manifest", default=None)
    add_audio_args(p)
    add_model_args(p)
    # optimizer (reference defaults)
    p.add_argument("--epochs", type=int, default=70)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--max-norm", type=float, default=400.0)
    p.add_argument("--learning-anneal", type=float, default=1.1)
    p.add_argument("--ctc-impl", default="scan", choices=["scan", "pallas"])
    # curriculum / duration handling
    p.add_argument("--no-shuffle", dest="shuffle", action="store_false",
                   default=True)
    p.add_argument("--no-sortaGrad", "--no-sorta-grad", dest="sorta_grad",
                   action="store_false", default=True)
    p.add_argument("--min-duration", type=float, default=None)
    p.add_argument("--max-duration", type=float, default=None)
    # augmentation
    p.add_argument("--augment", action="store_true",
                   help="on-device pitch-preserving tempo + gain "
                   "perturbation (sox-tempo semantics, WSOLA)")
    p.add_argument("--speed-perturb", action="store_true",
                   help="tempo via resampling instead of WSOLA "
                   "(pitch shifts with rate, Kaldi-style); implies "
                   "--augment")
    p.add_argument("--noise-dir", default=None)
    p.add_argument("--noise-prob", type=float, default=0.4)
    p.add_argument("--noise-min", type=float, default=0.0)
    p.add_argument("--noise-max", type=float, default=0.5)
    p.add_argument("--spec-augment", action="store_true",
                   help="on-device SpecAugment (extension)")
    # checkpointing
    p.add_argument("--checkpoint", action="store_true")
    p.add_argument("--checkpoint-per-batch", type=int, default=0)
    p.add_argument("--save-folder", default="models/")
    p.add_argument("--model-path", default="models/tpuasr_final.ckpt")
    p.add_argument("--continue-from", default=None)
    p.add_argument("--finetune", action="store_true")
    # logging
    p.add_argument("--log-dir", default=None)
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--log-params", action="store_true")
    p.add_argument("--visdom", action="store_true",
                   help="accepted for compatibility; maps to JSONL "
                   "logging — render curves (also mid-run / across "
                   "resumes) with python -m tpuasr.cli.plot_metrics "
                   "<log-dir>")
    p.add_argument("--seed", type=int, default=123456)
    p.add_argument("--profile-dir", default=None,
                   help="capture a JAX device trace of steps 10-15")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--sync-every", type=int, default=10,
                   help="materialize device metrics every N steps (1 = "
                   "reference-style per-iteration readout)")
    p.add_argument("--eval-every", type=int, default=1,
                   help="run validation every N epochs (the final "
                   "epoch always evaluates); 1 = the reference's "
                   "per-epoch eval")
    p.add_argument("--cuda", action="store_true",
                   help="accepted for compatibility (device = TPU/XLA)")
    # distributed (multi-host)
    p.add_argument("--world-size", type=int, default=1)
    p.add_argument("--rank", type=int, default=0)
    p.add_argument("--dist-url", default=None,
                   help="coordinator address for multi-host JAX")
    p.add_argument("--dist-backend", default="ici",
                   help="accepted for compatibility")
    p.add_argument("--mesh-tp", type=int, default=1,
                   help="tensor-parallel degree: >1 builds a 2D "
                   "(data, model) mesh and shards the RNN gate "
                   "matrices over `model` (GSPMD inserts the "
                   "collectives); device count must be divisible")
    p.add_argument("--transfer-dtype", default="int16",
                   choices=["int16", "float32"],
                   help="wave batch dtype for host->device transfer "
                   "(int16 halves the bytes; rescaled on device)")
    p.add_argument("--device-resident-audio", action="store_true",
                   help="pack the whole corpus into HBM once and gather "
                   "batches on device (corpora that fit HBM; per-step "
                   "host->device traffic becomes a (B,) index vector)")
    p.add_argument("--cache-audio", action="store_true",
                   help="keep decoded waves in RAM after first read "
                   "(small corpora / IO-starved hosts)")
    p.add_argument("--num-workers", type=int, default=2,
                   help="host prefetch depth")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.world_size > 1:
        distributed_init(args.dist_url, args.world_size, args.rank)

    alphabet = alphabet_from(args)
    frontend_cfg = frontend_config_from(args)
    model_cfg = model_config_from(args, alphabet, frontend_cfg.n_features)
    # TP x Pallas composition rules (round-4): at tp=2 with a
    # bidirectional fused-kernel model, the RNN kernels stay ON —
    # BiRecurrentCore shard_maps one direction per model shard (zero
    # per-step collectives; train/mesh.py direction-TP). Anything else
    # (tp>2, unidirectional, rnn types without a kernel) downgrades to
    # the GSPMD scan math, which gate-shards but all-gathers hidden
    # state per step. The Pallas CTC loss is batch-parallel and keeps
    # its kernel under ANY tp (shard_map over data; ctc/loss.py).
    direction_tp_ok = (
        args.mesh_tp == 2 and model_cfg.bidirectional
        and ((model_cfg.rnn_impl == "pallas"
              and model_cfg.rnn_type in ("gru", "lstm"))
             or (model_cfg.rnn_impl == "pallas2"
                 and model_cfg.rnn_type == "gru")))
    if args.mesh_tp > 1 and model_cfg.rnn_impl != "scan" \
            and not direction_tp_ok:
        import dataclasses

        model_cfg = dataclasses.replace(model_cfg, rnn_impl="scan")
        print("mesh-tp: rnn impl -> scan (direction-TP needs tp=2 + a "
              "bidirectional gru/lstm kernel config; gate-axis TP runs "
              "the XLA scan math)", flush=True)
    # (round 5: the Pallas CTC kernel no longer downgrades under TP —
    # it is batch-parallel and runs per-data-shard via shard_map when
    # the ambient mesh is set, ctc/loss.py _ambient_batch_mesh)
    train_cfg = TrainConfig(
        lr=args.lr, momentum=args.momentum, max_norm=args.max_norm,
        learning_anneal=args.learning_anneal, ctc_impl=args.ctc_impl,
    )
    loop_cfg = LoopConfig(
        epochs=args.epochs,
        seed=args.seed,
        save_folder=args.save_folder if args.checkpoint else None,
        model_path=args.model_path,
        checkpoint_per_batch=args.checkpoint_per_batch,
        log_dir=args.log_dir,
        tensorboard=args.tensorboard,
        quiet=args.quiet,
        profile_dir=args.profile_dir,
        sync_every=args.sync_every,
        eval_every=args.eval_every,
        mesh_tp=args.mesh_tp,
    )

    spec = BucketSpec(sample_rate=args.sample_rate)
    train_entries = order_and_prune(
        read_manifest(args.train_manifest),
        min_duration=args.min_duration, max_duration=args.max_duration,
    )
    # Per-host data sharding: each JAX process loads its own shard
    # (reference: DistributedBucketingSampler rank split).
    rank, world = jax.process_index(), jax.process_count()
    plan = make_buckets(
        train_entries, args.batch_size, spec,
        seed=args.seed, sorta_grad=args.sorta_grad, shuffle=args.shuffle,
    )
    if args.device_resident_audio:
        from tpuasr.data.resident import ResidentBatchLoader

        train_loader = ResidentBatchLoader(
            plan, alphabet, sample_rate=args.sample_rate, rank=rank,
            world=world,
        )
    else:
        train_loader = AudioBatchLoader(
            plan, alphabet, sample_rate=args.sample_rate,
            prefetch=args.num_workers, rank=rank, world=world,
            cache_audio=args.cache_audio, transfer_dtype=args.transfer_dtype,
        )
    val_loader = None
    if args.val_manifest:
        val_entries = order_and_prune(read_manifest(args.val_manifest))
        val_plan = make_buckets(val_entries, args.batch_size, spec,
                                shuffle=False)
        val_loader = AudioBatchLoader(val_plan, alphabet,
                                      sample_rate=args.sample_rate,
                                      prefetch=args.num_workers)

    augment_fn = None
    if (args.augment or args.speed_perturb or args.noise_dir
            or args.spec_augment):
        aug_cfg = AugmentConfig(
            tempo_gain=args.augment or args.speed_perturb,
            tempo_mode="resample" if args.speed_perturb else "wsola",
            noise_dir=args.noise_dir,
            noise_prob=args.noise_prob,
            noise_min=args.noise_min,
            noise_max=args.noise_max,
            spec_augment=args.spec_augment,
        )
        augment_fn = make_augment_fn(aug_cfg, sample_rate=args.sample_rate)

    train(
        model_cfg, frontend_cfg, train_cfg, loop_cfg,
        train_loader, val_loader, alphabet,
        continue_from=args.continue_from, finetune=args.finetune,
        augment_fn=augment_fn,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
