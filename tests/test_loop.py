"""Training-loop integration tests: learning on a synthetic corpus via
the real train() loop, and resume-equals-continuous-run (SURVEY.md §7)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuasr.audio.frontend import FrontendConfig
from tpuasr.audio.io import save_audio
from tpuasr.data.buckets import BucketSpec, make_buckets
from tpuasr.data.loader import AudioBatchLoader
from tpuasr.data.manifest import create_manifest, read_manifest
from tpuasr.labels import Alphabet
from tpuasr.model.ds2 import ModelConfig
from tpuasr.train.checkpoint import load_checkpoint
from tpuasr.train.loop import LoopConfig, train
from tpuasr.train.step import TrainConfig

MC = ModelConfig(n_classes=len(Alphabet().labels), hidden_size=32,
                 hidden_layers=1, compute_dtype=jnp.float32)


@pytest.fixture
def corpus(tmp_path):
    rng = np.random.RandomState(0)
    texts = ["ABA", "BOB", "CACO", "DADO"]
    for i, text in enumerate(texts):
        n = int(16000 * (0.4 + 0.1 * i))
        t = np.arange(n) / 16000.0
        f0 = 150 + 80 * i
        w = sum(np.sin(2 * np.pi * f0 * k * t) / k for k in range(1, 4))
        w = (w / np.abs(w).max() * 0.7 + 0.02 * rng.randn(n)).astype(np.float32)
        save_audio(str(tmp_path / f"u{i}.wav"), w, 16000)
        (tmp_path / f"u{i}.txt").write_text(text)
    m = str(tmp_path / "man.csv")
    create_manifest(str(tmp_path), m)
    return m


def _loader(manifest, batch_size=4):
    plan = make_buckets(read_manifest(manifest), batch_size, BucketSpec(),
                        seed=1)
    return AudioBatchLoader(plan, Alphabet())


def test_loop_learns_and_checkpoints(corpus, tmp_path):
    tc = TrainConfig(lr=3e-3, learning_anneal=1.0)
    lc = LoopConfig(epochs=6, save_folder=str(tmp_path / "m"),
                    model_path=str(tmp_path / "m" / "best.ckpt"),
                    quiet=True, use_mesh=False)
    pkg = train(MC, FrontendConfig(), tc, lc, _loader(corpus),
                _loader(corpus), Alphabet())
    assert len(pkg.loss_history) == 6
    assert pkg.loss_history[-1] < pkg.loss_history[0]
    assert (tmp_path / "m" / "tpuasr_6.ckpt").exists()
    assert (tmp_path / "m" / "best.ckpt").exists()
    loaded = load_checkpoint(str(tmp_path / "m" / "tpuasr_6.ckpt"))
    assert loaded.epoch == 6
    assert loaded.loss_history == pkg.loss_history


def test_resume_equals_continuous(corpus, tmp_path):
    tc = TrainConfig(lr=1e-3, learning_anneal=1.1)

    lc_full = LoopConfig(epochs=4, save_folder=str(tmp_path / "full"),
                         model_path=None, quiet=True, use_mesh=False)
    pkg_full = train(MC, FrontendConfig(), tc, lc_full, _loader(corpus),
                     None, Alphabet())

    lc_a = LoopConfig(epochs=2, save_folder=str(tmp_path / "half"),
                      model_path=None, quiet=True, use_mesh=False)
    train(MC, FrontendConfig(), tc, lc_a, _loader(corpus), None, Alphabet())
    lc_b = LoopConfig(epochs=4, save_folder=str(tmp_path / "resumed"),
                      model_path=None, quiet=True, use_mesh=False)
    pkg_res = train(MC, FrontendConfig(), tc, lc_b, _loader(corpus), None,
                    Alphabet(),
                    continue_from=str(tmp_path / "half" / "tpuasr_2.ckpt"))

    assert pkg_res.epoch == pkg_full.epoch
    flat_a = jax.tree.leaves(pkg_full.variables["params"])
    flat_b = jax.tree.leaves(pkg_res.variables["params"])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    # histories concatenate correctly
    assert len(pkg_res.loss_history) == 4
    np.testing.assert_allclose(pkg_res.loss_history[:2],
                               pkg_full.loss_history[:2], rtol=1e-5)


def test_finetune_resets_training_state(corpus, tmp_path):
    tc = TrainConfig(lr=1e-3)
    lc = LoopConfig(epochs=2, save_folder=str(tmp_path / "a"),
                    model_path=None, quiet=True, use_mesh=False)
    train(MC, FrontendConfig(), tc, lc, _loader(corpus), None, Alphabet())
    lc2 = LoopConfig(epochs=1, save_folder=None, model_path=None,
                     quiet=True, use_mesh=False)
    pkg = train(MC, FrontendConfig(), tc, lc2, _loader(corpus), None,
                Alphabet(),
                continue_from=str(tmp_path / "a" / "tpuasr_2.ckpt"),
                finetune=True)
    # finetune restarts epochs/history
    assert pkg.epoch == 1
    assert len(pkg.loss_history) == 1


def test_epoch_scan_matches_streaming(corpus, tmp_path):
    """The device-resident epoch-in-a-scan path computes the SAME
    updates as the streaming loop on a single-bucket corpus (no
    augmentation -> steps deterministic, same schedule)."""
    from tpuasr.data.resident import ResidentBatchLoader

    tc = TrainConfig(lr=3e-3, learning_anneal=1.0)

    def make_plan():
        plan = make_buckets(read_manifest(corpus), 4, BucketSpec(), seed=1)
        plan.homogeneous = True  # align streaming schedule with resident
        return plan

    lc = lambda: LoopConfig(epochs=2, quiet=True, use_mesh=False)  # noqa: E731
    pkg_stream = train(MC, FrontendConfig(), tc, lc(),
                       AudioBatchLoader(make_plan(), Alphabet()), None,
                       Alphabet())
    pkg_scan = train(MC, FrontendConfig(), tc, lc(),
                     ResidentBatchLoader(make_plan(), Alphabet()), None,
                     Alphabet())
    np.testing.assert_allclose(pkg_scan.loss_history,
                               pkg_stream.loss_history, rtol=1e-4)
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a, np.float32)
                                  - np.asarray(b, np.float32)).max()),
        pkg_scan.variables["params"], pkg_stream.variables["params"],
    )
    assert max(jax.tree.leaves(diffs)) < 1e-4, diffs


def test_epoch_scan_with_augmentation(corpus):
    """Augmentation composes with the epoch-in-a-scan path (rng folded
    per step inside the scan): training runs, losses stay finite, and
    the model still learns."""
    from tpuasr.audio.augment import AugmentConfig, make_augment_fn
    from tpuasr.data.resident import ResidentBatchLoader

    plan = make_buckets(read_manifest(corpus), 4, BucketSpec(), seed=1)
    loader = ResidentBatchLoader(plan, Alphabet())
    aug = make_augment_fn(AugmentConfig(tempo_gain=True, spec_augment=True))
    tc = TrainConfig(lr=3e-3, learning_anneal=1.0)
    lc = LoopConfig(epochs=3, quiet=True, use_mesh=False)
    pkg = train(MC, FrontendConfig(), tc, lc, loader, None, Alphabet(),
                augment_fn=aug)
    assert all(np.isfinite(x) for x in pkg.loss_history)
    assert pkg.loss_history[-1] < pkg.loss_history[0]


def test_epoch_scan_under_mesh_matches_single_device(corpus):
    """Resident epoch-in-a-scan over an 8-device DP mesh (banks
    replicated, schedule batch-axis sharded, XLA psums grads) produces
    the same params as the single-device scan."""
    from jax.sharding import Mesh
    from tpuasr.data.resident import ResidentBatchLoader

    tc = TrainConfig(lr=3e-3, learning_anneal=1.0)

    def run(mesh):
        plan = make_buckets(read_manifest(corpus), 4, BucketSpec(), seed=1)
        loader = ResidentBatchLoader(plan, Alphabet())
        lc = LoopConfig(epochs=2, quiet=True, use_mesh=mesh is not None)
        return train(MC, FrontendConfig(), tc, lc, loader, None,
                     Alphabet(), mesh=mesh)

    devs = jax.devices("cpu")
    assert len(devs) >= 4
    mesh = Mesh(np.asarray(devs[:4]), ("data",))
    pkg_mesh = run(mesh)
    pkg_one = run(None)
    np.testing.assert_allclose(pkg_mesh.loss_history, pkg_one.loss_history,
                               rtol=1e-4)
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a, np.float32)
                                  - np.asarray(b, np.float32)).max()),
        pkg_mesh.variables["params"], pkg_one.variables["params"],
    )
    assert max(jax.tree.leaves(diffs)) < 1e-4, diffs


def _params_equal(pkg_a, pkg_b, rtol=1e-5, atol=1e-6):
    flat_a = jax.tree.leaves(pkg_a.variables["params"])
    flat_b = jax.tree.leaves(pkg_b.variables["params"])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=rtol, atol=atol)


def test_mid_epoch_resume_exact_epoch_scan(corpus, tmp_path):
    """--checkpoint-per-batch coexists with epoch-in-a-scan (chunks
    capped at N), and resuming from a MID-EPOCH checkpoint reproduces
    the continuous run's params exactly — including the augmentation
    rng stream (iteration-derived, so no fast-forwarding)."""
    from tpuasr.audio.augment import AugmentConfig, make_augment_fn
    from tpuasr.data.resident import ResidentBatchLoader

    tc = TrainConfig(lr=3e-3, learning_anneal=1.0)
    aug = lambda: make_augment_fn(  # noqa: E731
        AugmentConfig(tempo_gain=True, spec_augment=True))

    def loader():
        plan = make_buckets(read_manifest(corpus), 2, BucketSpec(), seed=1)
        return ResidentBatchLoader(plan, Alphabet())

    save = tmp_path / "cont"
    lc = LoopConfig(epochs=2, save_folder=str(save), checkpoint_per_batch=1,
                    checkpoint_per_epoch=False, quiet=True, use_mesh=False)
    pkg_cont = train(MC, FrontendConfig(), tc, lc, loader(), None, Alphabet(),
                     augment_fn=aug())
    # per-batch checkpoints were written on the scan path, mid-epoch
    mid = save / "tpuasr_e0_b1.ckpt"
    assert mid.exists()
    assert load_checkpoint(str(mid)).epoch_batch == 1

    lc2 = LoopConfig(epochs=2, save_folder=None, checkpoint_per_epoch=False,
                     checkpoint_per_batch=1, quiet=True, use_mesh=False)
    pkg_res = train(MC, FrontendConfig(), tc, lc2, loader(), None, Alphabet(),
                    continue_from=str(mid), augment_fn=aug())
    _params_equal(pkg_cont, pkg_res)


def test_mid_epoch_resume_other_cap_exact(corpus, tmp_path):
    """Resuming a mid-chunk checkpoint under a DIFFERENT
    --checkpoint-per-batch cap still reproduces the continuous run
    exactly: per-step augmentation rng is fold_in(base_rng, global
    step), independent of chunk boundaries (round-3 ADVICE #1)."""
    from tpuasr.audio.augment import AugmentConfig, make_augment_fn
    from tpuasr.data.resident import ResidentBatchLoader

    tc = TrainConfig(lr=3e-3, learning_anneal=1.0)
    aug = lambda: make_augment_fn(  # noqa: E731
        AugmentConfig(tempo_gain=True, spec_augment=True))

    def loader():
        plan = make_buckets(read_manifest(corpus), 2, BucketSpec(), seed=1)
        return ResidentBatchLoader(plan, Alphabet())

    save = tmp_path / "cont"
    lc = LoopConfig(epochs=2, save_folder=str(save), checkpoint_per_batch=1,
                    checkpoint_per_epoch=False, quiet=True, use_mesh=False)
    pkg_cont = train(MC, FrontendConfig(), tc, lc, loader(), None, Alphabet(),
                     augment_fn=aug())
    mid = save / "tpuasr_e0_b1.ckpt"
    assert mid.exists()

    # resume with NO cap (one scan per bucket): chunk boundaries differ
    # from both the saving run (cap=1) and any continuous cap — params
    # must still match exactly
    lc2 = LoopConfig(epochs=2, save_folder=None, checkpoint_per_epoch=False,
                     checkpoint_per_batch=0, quiet=True, use_mesh=False)
    pkg_res = train(MC, FrontendConfig(), tc, lc2, loader(), None, Alphabet(),
                    continue_from=str(mid), augment_fn=aug())
    _params_equal(pkg_cont, pkg_res)


def test_epoch_scan_matches_streaming_with_augmentation(corpus):
    """With boundary-independent rng (fold_in(base_rng, global step) on
    BOTH paths), the epoch-scan and streaming loops now produce the
    same trajectory even WITH augmentation."""
    from tpuasr.audio.augment import AugmentConfig, make_augment_fn
    from tpuasr.data.resident import ResidentBatchLoader

    tc = TrainConfig(lr=3e-3, learning_anneal=1.0)
    aug = lambda: make_augment_fn(  # noqa: E731
        AugmentConfig(tempo_gain=True, spec_augment=True))

    def make_plan():
        plan = make_buckets(read_manifest(corpus), 4, BucketSpec(), seed=1)
        plan.homogeneous = True
        return plan

    lc = lambda: LoopConfig(epochs=2, quiet=True, use_mesh=False)  # noqa: E731
    pkg_stream = train(MC, FrontendConfig(), tc, lc(),
                       AudioBatchLoader(make_plan(), Alphabet()), None,
                       Alphabet(), augment_fn=aug())
    pkg_scan = train(MC, FrontendConfig(), tc, lc(),
                     ResidentBatchLoader(make_plan(), Alphabet()), None,
                     Alphabet(), augment_fn=aug())
    np.testing.assert_allclose(pkg_scan.loss_history,
                               pkg_stream.loss_history, rtol=1e-4)
    diffs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a, np.float32)
                                  - np.asarray(b, np.float32)).max()),
        pkg_scan.variables["params"], pkg_stream.variables["params"],
    )
    assert max(jax.tree.leaves(diffs)) < 1e-4, diffs


def test_mid_epoch_resume_exact_streaming(corpus, tmp_path):
    """Same contract on the streaming loader path."""
    from tpuasr.audio.augment import AugmentConfig, make_augment_fn

    tc = TrainConfig(lr=3e-3, learning_anneal=1.0)
    aug = lambda: make_augment_fn(AugmentConfig(tempo_gain=True))  # noqa: E731

    save = tmp_path / "cont"
    lc = LoopConfig(epochs=2, save_folder=str(save), checkpoint_per_batch=1,
                    checkpoint_per_epoch=False, quiet=True, use_mesh=False)
    pkg_cont = train(MC, FrontendConfig(), tc, lc, _loader(corpus, 2), None,
                     Alphabet(), augment_fn=aug())
    mid = save / "tpuasr_e0_b1.ckpt"
    assert mid.exists()

    lc2 = LoopConfig(epochs=2, save_folder=None, checkpoint_per_epoch=False,
                     quiet=True, use_mesh=False)
    pkg_res = train(MC, FrontendConfig(), tc, lc2, _loader(corpus, 2), None,
                    Alphabet(), continue_from=str(mid), augment_fn=aug())
    _params_equal(pkg_cont, pkg_res)


def test_preemption_epoch_scan(corpus, tmp_path):
    """SIGTERM during device-resident epoch-in-a-scan training (the
    flagship configuration) saves a clean preempt checkpoint between
    chunks and --continue-from resumes it (round-2 VERDICT weak #1)."""
    import os
    import signal as _signal
    import threading

    from tpuasr.data.resident import ResidentBatchLoader

    def loader():
        plan = make_buckets(read_manifest(corpus), 2, BucketSpec(), seed=1)
        return ResidentBatchLoader(plan, Alphabet())

    tc = TrainConfig(lr=3e-3, learning_anneal=1.0)
    save = tmp_path / "m"
    lc = LoopConfig(epochs=2000, save_folder=str(save),
                    checkpoint_per_epoch=False, quiet=True, use_mesh=False)

    killer = threading.Timer(4.0, os.kill, (os.getpid(), _signal.SIGTERM))
    killer.start()
    try:
        pkg = train(MC, FrontendConfig(), tc, lc, loader(), None, Alphabet())
    finally:
        killer.cancel()
    assert pkg.epoch < 2000
    ppath = save / "tpuasr_preempt.ckpt"
    assert ppath.exists()

    lc2 = LoopConfig(epochs=pkg.epoch + 2, save_folder=None,
                     checkpoint_per_epoch=False, quiet=True, use_mesh=False)
    pkg2 = train(MC, FrontendConfig(), tc, lc2, loader(), None, Alphabet(),
                 continue_from=str(ppath))
    assert pkg2.epoch == pkg.epoch + 2


def test_preemption_checkpoint_and_resume(corpus, tmp_path):
    """SIGTERM mid-training -> the loop saves tpuasr_preempt.ckpt and
    returns cleanly; --continue-from that checkpoint resumes."""
    import os
    import signal as _signal
    import threading

    tc = TrainConfig(lr=3e-3, learning_anneal=1.0)
    save = tmp_path / "m"
    lc = LoopConfig(epochs=500, save_folder=str(save),
                    checkpoint_per_epoch=False, quiet=True, use_mesh=False)

    killer = threading.Timer(4.0, os.kill, (os.getpid(), _signal.SIGTERM))
    killer.start()
    try:
        pkg = train(MC, FrontendConfig(), tc, lc, _loader(corpus), None,
                    Alphabet())
    finally:
        killer.cancel()
    assert pkg.epoch < 500  # exited early, not a full run
    ppath = save / "tpuasr_preempt.ckpt"
    assert ppath.exists()

    lc2 = LoopConfig(epochs=pkg.epoch + 2, save_folder=None,
                     checkpoint_per_epoch=False, quiet=True, use_mesh=False)
    pkg2 = train(MC, FrontendConfig(), tc, lc2, _loader(corpus), None,
                 Alphabet(), continue_from=str(ppath))
    assert pkg2.epoch == pkg.epoch + 2
