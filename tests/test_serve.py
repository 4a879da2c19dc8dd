"""Serving layer: micro-batched TranscriptionService + HTTP wrapper."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax

from tpuasr.audio.frontend import FrontendConfig
from tpuasr.labels import Alphabet
from tpuasr.model.ds2 import ModelConfig
from tpuasr.serve import ServeConfig, TranscriptionService, make_http_server
from tpuasr.train.checkpoint import CheckpointPackage, save_checkpoint
from tpuasr.train.step import TrainConfig, init_train_state


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    import jax.numpy as jnp

    mc = ModelConfig(n_classes=Alphabet().size, hidden_size=16,
                     hidden_layers=1, compute_dtype=jnp.float32)
    state = init_train_state(mc, TrainConfig(), jax.random.PRNGKey(0))
    pkg = CheckpointPackage(
        model_config=mc, frontend_config=FrontendConfig(),
        labels=Alphabet().labels,
        variables={"params": jax.device_get(state.params),
                   "batch_stats": jax.device_get(state.batch_stats)},
    )
    path = str(tmp / "m.ckpt")
    save_checkpoint(path, pkg)
    return path


def _wav_bytes(seconds=0.3, sr=16000) -> bytes:
    from scipy.io import wavfile

    rng = np.random.RandomState(0)
    w = (0.1 * rng.randn(int(sr * seconds))).astype(np.float32)
    buf = io.BytesIO()
    wavfile.write(buf, sr, (w * 32767).astype(np.int16))
    return buf.getvalue()


def test_service_micro_batches_concurrent_requests(ckpt):
    svc = TranscriptionService(
        ckpt, ServeConfig(max_batch=4, batch_window_ms=50.0)
    )
    try:
        results = [None] * 4
        errors = []

        def call(j):
            try:
                rng = np.random.RandomState(j)
                w = (0.1 * rng.randn(3000 + 500 * j)).astype(np.float32)
                results[j] = svc.transcribe_wave(w, timeout=120)
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=call, args=(j,)) for j in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        assert not errors
        assert all(r is not None for r in results)
        for text, offsets in results:
            assert isinstance(text, str)
            assert isinstance(offsets, list)
    finally:
        svc.close()


def test_http_server_round_trip(ckpt):
    svc = TranscriptionService(ckpt, ServeConfig(max_batch=2,
                                                 batch_window_ms=5.0))
    server = make_http_server(svc, "127.0.0.1", 0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            assert json.loads(r.read())["status"] == "ok"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/transcribe", data=_wav_bytes(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=180) as r:
            out = json.loads(r.read())
        assert "text" in out and "offsets" in out
        # resampling path: a 8 kHz wav is accepted too
        from scipy.io import wavfile

        buf = io.BytesIO()
        wavfile.write(buf, 8000,
                      (np.random.RandomState(1).randn(2400) * 3276)
                      .astype(np.int16))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/transcribe", data=buf.getvalue(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=180) as r:
            assert "text" in json.loads(r.read())
    finally:
        server.shutdown()
        svc.close()


def test_service_warmup_compiles_before_traffic(ckpt):
    # warmup must pre-build the (bucket, batch) graphs: after init, the
    # first request's bucket is already compiled (we can only assert
    # behavior here — it serves promptly and correctly)
    svc = TranscriptionService(
        ckpt, ServeConfig(max_batch=2, batch_window_ms=1.0,
                          warmup_seconds=(0.3,))
    )
    try:
        rng = np.random.RandomState(1)
        text, offsets = svc.transcribe_wave(
            (0.1 * rng.randn(4800)).astype(np.float32), timeout=60
        )
        assert isinstance(text, str)
    finally:
        svc.close()
