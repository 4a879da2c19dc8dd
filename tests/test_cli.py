"""CLI wiring smoke tests (flag surface parity, SURVEY.md §5.6)."""

import jax.numpy as jnp
import pytest

from tpuasr.cli.train import build_parser
from tpuasr.cli.opts import (
    alphabet_from,
    apply_runtime_overrides,
    frontend_config_from,
    model_config_from,
)


def test_train_parser_reference_flags():
    p = build_parser()
    args = p.parse_args([
        "--train-manifest", "t.csv", "--val-manifest", "v.csv",
        "--sample-rate", "16000", "--window-size", "0.02",
        "--window-stride", "0.01", "--window", "hamming",
        "--hidden-size", "800", "--hidden-layers", "5",
        "--rnn-type", "gru", "--epochs", "70", "--batch-size", "32",
        "--lr", "3e-4", "--momentum", "0.9", "--max-norm", "400",
        "--learning-anneal", "1.1", "--augment",
        "--noise-dir", "/n", "--noise-prob", "0.4",
        "--noise-min", "0.0", "--noise-max", "0.5",
        "--no-shuffle", "--no-sortaGrad", "--checkpoint",
        "--checkpoint-per-batch", "100", "--continue-from", "x.ckpt",
        "--finetune", "--save-folder", "m/", "--model-path", "m/best.ckpt",
        "--tensorboard", "--log-dir", "logs/", "--log-params", "--visdom",
        "--seed", "1", "--cuda", "--world-size", "2", "--rank", "0",
        "--dist-url", "h:1", "--dist-backend", "ici",
        "--rnn-impl", "pallas", "--ctc-impl", "pallas",
        "--min-duration", "1.0", "--max-duration", "15.0",
        "--spec-augment", "--profile-dir", "/tmp/tr",
    ])
    assert args.hidden_size == 800
    assert args.sorta_grad is False and args.shuffle is False
    assert args.rnn_impl == "pallas"

    alphabet = alphabet_from(args)
    fc = frontend_config_from(args)
    mc = model_config_from(args, alphabet, fc.n_features)
    assert mc.n_classes == alphabet.size
    assert mc.rnn_impl == "pallas"
    assert fc.n_fft == 320 and fc.hop == 160


def test_no_bidirectional_flag():
    p = build_parser()
    args = p.parse_args(["--train-manifest", "t.csv", "--no-bidirectional"])
    assert args.bidirectional is False


def test_runtime_override():
    import argparse

    from tpuasr.model.ds2 import ModelConfig

    cfg = ModelConfig(rnn_impl="pallas")
    ns = argparse.Namespace(rnn_impl="scan")
    out = apply_runtime_overrides(cfg, ns)
    assert out.rnn_impl == "scan"
    ns2 = argparse.Namespace(rnn_impl=None)
    assert apply_runtime_overrides(cfg, ns2).rnn_impl == "pallas"


def test_transcribe_test_parsers():
    from tpuasr.cli.test import main as test_main
    from tpuasr.cli.transcribe import main as tr_main

    with pytest.raises(SystemExit):
        tr_main(["--help"])
    with pytest.raises(SystemExit):
        test_main(["--help"])


def test_train_lm_cli(tmp_path):
    from tpuasr.cli.train_lm import main as lm_main

    txt = tmp_path / "corpus.txt"
    txt.write_text("ola mundo\nbom dia mundo\n")
    out = str(tmp_path / "lm.arpa")
    rc = lm_main(["--text", str(txt), "--order", "2", "--out", out])
    assert rc == 0
    from tpuasr.decode.lm import ArpaLM

    lm = ArpaLM.load(out)
    assert lm.order == 2
    assert "MUNDO" in lm.vocab

    # char-level variant
    out2 = str(tmp_path / "lm_char.arpa")
    rc = lm_main(["--text", str(txt), "--order", "3", "--out", out2,
                  "--char-level"])
    assert rc == 0
    lm2 = ArpaLM.load(out2)
    assert "<sp>" in lm2.vocab and "O" in lm2.vocab


def test_eval_cli_resident_scan_matches_streaming(tmp_path, capsys):
    """cli.test --device-resident-audio (eval-in-a-scan + device greedy)
    prints the same Test Summary as the streaming loop."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuasr.audio.frontend import FrontendConfig
    from tpuasr.audio.io import save_audio
    from tpuasr.cli.test import main as test_main
    from tpuasr.data.manifest import create_manifest
    from tpuasr.labels import Alphabet
    from tpuasr.model.ds2 import ModelConfig
    from tpuasr.train.checkpoint import CheckpointPackage, save_checkpoint
    from tpuasr.train.step import TrainConfig, init_train_state

    rng = np.random.RandomState(0)
    for i, text in enumerate(["ABA", "BOB", "CACO"]):
        n = int(16000 * (0.4 + 0.15 * i))
        save_audio(str(tmp_path / f"u{i}.wav"),
                   (0.1 * rng.randn(n)).astype(np.float32), 16000)
        (tmp_path / f"u{i}.txt").write_text(text)
    man = str(tmp_path / "man.csv")
    create_manifest(str(tmp_path), man)

    mc = ModelConfig(n_classes=Alphabet().size, hidden_size=16,
                     hidden_layers=1, compute_dtype=jnp.float32)
    state = init_train_state(mc, TrainConfig(), jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, CheckpointPackage(
        model_config=mc, frontend_config=FrontendConfig(),
        labels=Alphabet().labels,
        variables={"params": jax.device_get(state.params),
                   "batch_stats": jax.device_get(state.batch_stats)},
    ))

    test_main(["--model-path", ckpt, "--test-manifest", man,
               "--batch-size", "2"])
    streaming = capsys.readouterr().out.strip().splitlines()[-1]
    test_main(["--model-path", ckpt, "--test-manifest", man,
               "--batch-size", "2", "--device-resident-audio"])
    resident = capsys.readouterr().out.strip().splitlines()[-1]
    assert streaming.startswith("Test Summary")
    assert resident == streaming


def test_eval_cli_resident_beam_matches_streaming_beam(tmp_path, capsys):
    """cli.test --device-resident-audio --decoder beam-device (beam
    eval-in-a-scan, fused kernel in interpreter mode) prints the same
    Test Summary as the per-batch beam-device loop."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tpuasr.ops.beam as beam_ops
    from tpuasr.audio.frontend import FrontendConfig
    from tpuasr.audio.io import save_audio
    from tpuasr.cli.test import main as test_main
    from tpuasr.data.manifest import create_manifest
    from tpuasr.labels import Alphabet
    from tpuasr.model.ds2 import ModelConfig
    from tpuasr.train.checkpoint import CheckpointPackage, save_checkpoint
    from tpuasr.train.step import TrainConfig, init_train_state

    rng = np.random.RandomState(1)
    for i, text in enumerate(["ABA", "BOB"]):
        n = int(16000 * (0.3 + 0.1 * i))
        save_audio(str(tmp_path / f"u{i}.wav"),
                   (0.1 * rng.randn(n)).astype(np.float32), 16000)
        (tmp_path / f"u{i}.txt").write_text(text)
    man = str(tmp_path / "man.csv")
    create_manifest(str(tmp_path), man)

    mc = ModelConfig(n_classes=Alphabet().size, hidden_size=16,
                     hidden_layers=1, compute_dtype=jnp.float32)
    state = init_train_state(mc, TrainConfig(), jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, CheckpointPackage(
        model_config=mc, frontend_config=FrontendConfig(),
        labels=Alphabet().labels,
        variables={"params": jax.device_get(state.params),
                   "batch_stats": jax.device_get(state.batch_stats)},
    ))

    beam_ops.INTERPRET = True
    try:
        test_main(["--model-path", ckpt, "--test-manifest", man,
                   "--batch-size", "2", "--decoder", "beam-device",
                   "--beam-width", "4"])
        streaming = capsys.readouterr().out.strip().splitlines()[-1]
        test_main(["--model-path", ckpt, "--test-manifest", man,
                   "--batch-size", "2", "--decoder", "beam-device",
                   "--beam-width", "4", "--device-resident-audio"])
        resident = capsys.readouterr().out.strip().splitlines()[-1]
    finally:
        beam_ops.INTERPRET = False
    assert streaming.startswith("Test Summary")
    assert resident == streaming


def test_eval_cli_resident_beam_char_lm_matches_streaming(tmp_path, capsys):
    """Resident beam eval with in-kernel char-LM fusion == the
    per-batch beam-device char-LM loop."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tpuasr.ops.beam as beam_ops
    from tpuasr.audio.frontend import FrontendConfig
    from tpuasr.audio.io import save_audio
    from tpuasr.cli.test import main as test_main
    from tpuasr.data.manifest import create_manifest
    from tpuasr.decode.lm import train_ngram
    from tpuasr.labels import Alphabet
    from tpuasr.model.ds2 import ModelConfig
    from tpuasr.train.checkpoint import CheckpointPackage, save_checkpoint
    from tpuasr.train.step import TrainConfig, init_train_state

    rng = np.random.RandomState(2)
    for i, text in enumerate(["ABA", "BOB"]):
        save_audio(str(tmp_path / f"u{i}.wav"),
                   (0.1 * rng.randn(5600)).astype(np.float32), 16000)
        (tmp_path / f"u{i}.txt").write_text(text)
    man = str(tmp_path / "man.csv")
    create_manifest(str(tmp_path), man)
    lm = train_ngram([" ".join(list(s)) for s in ["ABA", "BOB", "CACO"]],
                     order=3)
    arpa = str(tmp_path / "char.arpa")
    lm.save(arpa)

    mc = ModelConfig(n_classes=Alphabet().size, hidden_size=16,
                     hidden_layers=1, compute_dtype=jnp.float32)
    state = init_train_state(mc, TrainConfig(), jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, CheckpointPackage(
        model_config=mc, frontend_config=FrontendConfig(),
        labels=Alphabet().labels,
        variables={"params": jax.device_get(state.params),
                   "batch_stats": jax.device_get(state.batch_stats)},
    ))

    common = ["--model-path", ckpt, "--test-manifest", man,
              "--batch-size", "2", "--decoder", "beam-device",
              "--beam-width", "4", "--lm-path", arpa,
              "--device-lm-level", "char", "--alpha", "0.5"]
    beam_ops.INTERPRET = True
    try:
        test_main(common)
        streaming = capsys.readouterr().out.strip().splitlines()[-1]
        test_main(common + ["--device-resident-audio"])
        resident = capsys.readouterr().out.strip().splitlines()[-1]
    finally:
        beam_ops.INTERPRET = False
    assert streaming.startswith("Test Summary")
    assert resident == streaming


def test_eval_cli_resident_beam_word_lm_matches_streaming(tmp_path, capsys):
    """Resident beam eval with in-kernel WORD-LM fusion == the
    per-batch loop (which also runs the kernel for small LMs)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tpuasr.ops.beam as beam_ops
    from tpuasr.audio.frontend import FrontendConfig
    from tpuasr.audio.io import save_audio
    from tpuasr.cli.test import main as test_main
    from tpuasr.data.manifest import create_manifest
    from tpuasr.decode.lm import train_ngram
    from tpuasr.labels import Alphabet
    from tpuasr.model.ds2 import ModelConfig
    from tpuasr.train.checkpoint import CheckpointPackage, save_checkpoint
    from tpuasr.train.step import TrainConfig, init_train_state

    rng = np.random.RandomState(4)
    for i, text in enumerate(["ABA BOB", "BOB CACO"]):
        save_audio(str(tmp_path / f"u{i}.wav"),
                   (0.1 * rng.randn(5600)).astype(np.float32), 16000)
        (tmp_path / f"u{i}.txt").write_text(text)
    man = str(tmp_path / "man.csv")
    create_manifest(str(tmp_path), man)
    lm = train_ngram(["ABA BOB", "BOB CACO", "CACO ABA"], order=2)
    arpa = str(tmp_path / "word.arpa")
    lm.save(arpa)

    mc = ModelConfig(n_classes=Alphabet().size, hidden_size=16,
                     hidden_layers=1, compute_dtype=jnp.float32)
    state = init_train_state(mc, TrainConfig(), jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, CheckpointPackage(
        model_config=mc, frontend_config=FrontendConfig(),
        labels=Alphabet().labels,
        variables={"params": jax.device_get(state.params),
                   "batch_stats": jax.device_get(state.batch_stats)},
    ))
    common = ["--model-path", ckpt, "--test-manifest", man,
              "--batch-size", "2", "--decoder", "beam-device",
              "--beam-width", "4", "--lm-path", arpa, "--alpha", "0.7",
              "--beta", "0.4"]
    beam_ops.INTERPRET = True
    try:
        test_main(common)
        streaming = capsys.readouterr().out.strip().splitlines()[-1]
        test_main(common + ["--device-resident-audio"])
        resident = capsys.readouterr().out.strip().splitlines()[-1]
    finally:
        beam_ops.INTERPRET = False
    assert streaming.startswith("Test Summary")
    assert resident == streaming


def test_plot_metrics_cli(tmp_path):
    """plot_metrics renders loss/WER/CER curves from a metrics.jsonl
    (the --visdom/--tensorboard parity artifact, SURVEY.md §5.5) and
    tolerates torn tail lines from a live writer."""
    import json
    import math

    from tpuasr.cli.plot_metrics import main as plot_main

    log = tmp_path / "metrics.jsonl"
    with open(log, "w") as f:
        for i in range(20):
            f.write(json.dumps({"step": i, "time": float(i),
                                "train/loss": 30 * math.exp(-i / 5)}) + "\n")
        for e in range(3):
            f.write(json.dumps({"step": e, "time": 50.0 + e,
                                "epoch/wer": 100 - 20 * e,
                                "epoch/cer": float("nan")}) + "\n")
        f.write('{"step": 99, "train/l')  # torn live-writer tail
    out = tmp_path / "c.png"
    assert plot_main([str(tmp_path), "--out", str(out)]) == 0
    assert out.exists() and out.stat().st_size > 1000
    # --list enumerates keys
    assert plot_main([str(log), "--list"]) == 0
