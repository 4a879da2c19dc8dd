"""Compile watchdog + blocklist (tpuasr/decode/compile_guard.py).

Round 4 hit two fused-beam configs whose Mosaic compiles ran 46+ min
and wedged CLI evals (bench_runs/r4 items 30/40). The guard must turn
a hung first-time kernel compile into an XLA fallback — in the same
process AND across restarts (on-disk blocklist) — without wedging
cli.test.
"""

import json
import time

import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.decode import compile_guard
from tpuasr.decode.beam import DeviceBeamDecoder
from tpuasr.labels import Alphabet

ABC = Alphabet(labels="_AB C")


@pytest.fixture(autouse=True)
def _clean_guard(monkeypatch):
    """Isolate the module-level blocklist between tests."""
    compile_guard._blocklist.clear()
    compile_guard._loaded_from = None
    monkeypatch.delenv("TPUASR_COMPILE_CACHE", raising=False)
    monkeypatch.delenv("TPUASR_BEAM_COMPILE_TIMEOUT", raising=False)
    yield
    compile_guard._blocklist.clear()
    compile_guard._loaded_from = None


def test_run_guarded_passthrough_and_timeout():
    assert compile_guard.run_guarded(lambda: 41 + 1, "sig-a",
                                     timeout=5.0) == 42
    with pytest.raises(compile_guard.BeamCompileTimeout):
        compile_guard.run_guarded(lambda: time.sleep(30), "sig-b",
                                  timeout=0.2)
    assert compile_guard.blocklisted("sig-b")
    assert not compile_guard.blocklisted("sig-a")
    # fn's own exceptions surface, no blocklisting
    with pytest.raises(ValueError):
        compile_guard.run_guarded(
            lambda: (_ for _ in ()).throw(ValueError("x")), "sig-c",
            timeout=5.0)
    assert not compile_guard.blocklisted("sig-c")


def test_blocklist_persists_on_disk(tmp_path, monkeypatch):
    monkeypatch.setenv("TPUASR_COMPILE_CACHE", str(tmp_path))
    compile_guard.blocklist("family-x")
    path = tmp_path / "beam_compile_blocklist.json"
    assert json.loads(path.read_text())["blocklist"] == ["family-x"]
    # a fresh process (simulated by clearing module state) reloads it
    compile_guard._blocklist.clear()
    compile_guard._loaded_from = None
    assert compile_guard.blocklisted("family-x")
    assert not compile_guard.blocklisted("family-y")


def test_timeout_disabled_by_env(monkeypatch):
    monkeypatch.setenv("TPUASR_BEAM_COMPILE_TIMEOUT", "0")
    assert compile_guard.timeout_seconds() is None
    monkeypatch.setenv("TPUASR_BEAM_COMPILE_TIMEOUT", "123.5")
    assert compile_guard.timeout_seconds() == 123.5


def _hung_kernel(self, n_class):
    def hang(lp, lens):
        time.sleep(30)
        raise AssertionError("unreachable")

    return hang


def test_decoder_falls_back_to_xla_on_hung_compile(monkeypatch):
    """A hanging fused-kernel compile must not wedge decode(): after
    the deadline the config is blocklisted and the SAME call returns
    correct results via the XLA path; future decoders skip the kernel
    outright."""
    monkeypatch.setenv("TPUASR_BEAM_COMPILE_TIMEOUT", "0.3")
    monkeypatch.setattr(DeviceBeamDecoder, "_build_kernel", _hung_kernel)

    rng = np.random.RandomState(5)
    b, t, c = 2, 9, 5
    logits = jnp.asarray(rng.randn(b, t, c).astype(np.float32) * 2)
    lengths = jnp.asarray(np.array([9, 6], np.int32))

    dec = DeviceBeamDecoder(ABC, beam_width=5, impl="pallas")
    t0 = time.monotonic()
    texts = dec.decode(logits, lengths)
    assert time.monotonic() - t0 < 20  # did NOT wait out the hang
    ref = DeviceBeamDecoder(ABC, beam_width=5, impl="xla").decode(
        logits, lengths)
    assert texts == ref
    sig = dec.kernel_sig(c, b)
    assert compile_guard.blocklisted(sig)
    # a fresh decoder on the blocklisted config never tries the kernel
    dec2 = DeviceBeamDecoder(ABC, beam_width=5, impl="pallas")
    t0 = time.monotonic()
    assert dec2.decode(logits, lengths) == ref
    assert time.monotonic() - t0 < 5
    assert all(not is_pallas for _, is_pallas in dec2._cache.values())


def test_eval_cli_survives_hung_kernel_compile(tmp_path, capsys,
                                               monkeypatch):
    """cli.test with a beam-device decoder whose kernel compile hangs
    must still print a Test Summary (the round-4 wedge scenario, items
    30/40 — now: blocklist + XLA fallback instead of an indefinite
    hang)."""
    import jax

    from tpuasr.audio.frontend import FrontendConfig
    from tpuasr.audio.io import save_audio
    from tpuasr.cli.test import main as test_main
    from tpuasr.data.manifest import create_manifest
    from tpuasr.model.ds2 import ModelConfig
    from tpuasr.train.checkpoint import CheckpointPackage, save_checkpoint
    from tpuasr.train.step import TrainConfig, init_train_state

    monkeypatch.setenv("TPUASR_BEAM_COMPILE_TIMEOUT", "0.3")
    monkeypatch.setattr(DeviceBeamDecoder, "_build_kernel", _hung_kernel)
    monkeypatch.setattr(DeviceBeamDecoder, "_use_pallas",
                        lambda self: True)

    rng = np.random.RandomState(2)
    for i, text in enumerate(["ABA", "BOB"]):
        n = int(16000 * (0.3 + 0.1 * i))
        save_audio(str(tmp_path / f"u{i}.wav"),
                   (0.1 * rng.randn(n)).astype(np.float32), 16000)
        (tmp_path / f"u{i}.txt").write_text(text)
    man = str(tmp_path / "man.csv")
    create_manifest(str(tmp_path), man)

    alphabet = Alphabet()
    mc = ModelConfig(n_classes=alphabet.size, hidden_size=16,
                     hidden_layers=1, compute_dtype=jnp.float32)
    state = init_train_state(mc, TrainConfig(), jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "m.ckpt")
    save_checkpoint(ckpt, CheckpointPackage(
        model_config=mc, frontend_config=FrontendConfig(),
        labels=alphabet.labels,
        variables={"params": jax.device_get(state.params),
                   "batch_stats": jax.device_get(state.batch_stats)},
    ))

    t0 = time.monotonic()
    rc = test_main(["--model-path", ckpt, "--test-manifest", man,
                    "--batch-size", "2", "--decoder", "beam-device",
                    "--beam-width", "4"])
    assert rc == 0
    assert time.monotonic() - t0 < 60
    out = capsys.readouterr().out
    assert "Test Summary" in out


def test_compile_error_blocklists_and_maps():
    """A first dispatch that dies with a COMPILE failure (e.g. the
    scoped-VMEM stack OOM hit live at B=128, bench_runs/r5/04) is
    treated like a hang: blocklist + BeamCompileError. Non-compile
    errors pass through untouched (and never blocklist)."""
    def oom():
        raise RuntimeError(
            "INTERNAL: ... Scoped allocation with size 118.98M and "
            "limit 102.69M exceeded scoped vmem limit by 16.29M")

    with pytest.raises(compile_guard.BeamCompileError):
        compile_guard.run_guarded(oom, "sig-oom", timeout=10.0)
    assert compile_guard.blocklisted("sig-oom")
    # also in the guard-disabled (no deadline thread) path
    with pytest.raises(compile_guard.BeamCompileError):
        compile_guard.run_guarded(oom, "sig-oom2", timeout=None)
    assert compile_guard.blocklisted("sig-oom2")


def test_wide_gate_is_batch_aware(monkeypatch):
    """kernel_fits_batch: wide tables that fit at B=32 must be ruled
    OUT at B=128 once tables + B*W*stack exceed the VMEM budget, and
    _run must then build the XLA path (loud notice) instead of the
    kernel."""
    from tpuasr.decode.lm import train_ngram

    monkeypatch.setattr(DeviceBeamDecoder, "MAX_KERNEL_WORD_CAP", 2)
    # calibrate the budget so this tiny LM's wide tables "fit" only
    # with a small batch-stack term
    lm = train_ngram(["AB C AB", "C AB", "AB AB C"], order=2)
    dec = DeviceBeamDecoder(ABC, beam_width=10, word_lm=lm, alpha=0.5,
                            beta=0.3, impl="pallas")
    from tpuasr.decode.beam import wide_tables_bytes

    tbytes = wide_tables_bytes(dec._word_tables)
    monkeypatch.setattr(DeviceBeamDecoder, "WIDE_VMEM_BUDGET",
                        tbytes + 64 * 10 * dec.WIDE_STACK_PER_BW)
    assert dec.kernel_fits_batch(ABC.size, 32)
    assert dec.kernel_fits_batch(ABC.size, 64)
    assert not dec.kernel_fits_batch(ABC.size, 128)

    import tpuasr.ops.beam as beam_ops

    beam_ops.INTERPRET = True
    try:
        rng = np.random.RandomState(3)
        logits = jnp.asarray(rng.randn(128, 6, 5).astype(np.float32))
        lengths = jnp.asarray(np.full((128,), 6, np.int32))
        texts = dec.decode(logits, lengths)
        assert all(not is_pallas for _, is_pallas in dec._cache.values())
        ref = DeviceBeamDecoder(ABC, beam_width=10, word_lm=lm,
                                alpha=0.5, beta=0.3,
                                impl="xla").decode(logits, lengths)
        assert texts == ref
    finally:
        beam_ops.INTERPRET = False


def test_resident_eval_gate_is_batch_aware(monkeypatch):
    """supports_resident_eval must refuse the resident runner when the
    decoder's wide tables cannot fit the kernel at the eval batch."""
    from tpuasr.decode.lm import train_ngram
    from tpuasr.decode.resident_eval import supports_resident_eval

    monkeypatch.setattr(DeviceBeamDecoder, "MAX_KERNEL_WORD_CAP", 2)
    lm = train_ngram(["AB C AB", "C AB"], order=2)
    import tpuasr.ops.beam as beam_ops

    beam_ops.INTERPRET = True
    try:
        dec = DeviceBeamDecoder(ABC, beam_width=6, word_lm=lm,
                                alpha=0.5, beta=0.3, impl="pallas")
        from tpuasr.decode.beam import wide_tables_bytes

        tbytes = wide_tables_bytes(dec._word_tables)
        monkeypatch.setattr(DeviceBeamDecoder, "WIDE_VMEM_BUDGET",
                            tbytes + 48 * 6 * dec.WIDE_STACK_PER_BW)
        assert supports_resident_eval(dec, ABC.size, batch_size=32)
        assert not supports_resident_eval(dec, ABC.size, batch_size=128)
    finally:
        beam_ops.INTERPRET = False
