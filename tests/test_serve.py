"""Serving layer: micro-batched TranscriptionService + HTTP wrapper."""

import io
import json
import threading
import urllib.error
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


@pytest.fixture(scope="module")
def uni_ckpt(tmp_path_factory):
    """Unidirectional (streaming-capable) checkpoint."""
    tmp = tmp_path_factory.mktemp("serve_stream")
    import jax.numpy as jnp

    mc = ModelConfig(n_classes=Alphabet().size, hidden_size=16,
                     hidden_layers=1, bidirectional=False,
                     lookahead_context=4, compute_dtype=jnp.float32)
    state = init_train_state(mc, TrainConfig(), jax.random.PRNGKey(2))
    pkg = CheckpointPackage(
        model_config=mc, frontend_config=FrontendConfig(),
        labels=Alphabet().labels,
        variables={"params": jax.device_get(state.params),
                   "batch_stats": jax.device_get(state.batch_stats)},
    )
    path = str(tmp / "uni.ckpt")
    save_checkpoint(path, pkg)
    return path


def test_stream_sessions_http(uni_ckpt):
    """Two concurrent live-stream HTTP sessions produce exactly the
    single-stream StreamingTranscriber texts."""
    from tpuasr.serve import StreamServeConfig, StreamSessionService
    from tpuasr.stream import StreamingTranscriber
    from tpuasr.train.checkpoint import load_checkpoint

    pkg = load_checkpoint(uni_ckpt)
    variables = {"params": pkg.variables["params"],
                 "batch_stats": pkg.variables["batch_stats"]}
    rng = np.random.RandomState(7)
    waves = [(0.2 * rng.randn(n)).astype(np.float32)
             for n in (12000, 8000)]
    want = []
    for w in waves:
        st = StreamingTranscriber(variables, pkg.model_config,
                                  pkg.frontend_config, pkg.alphabet,
                                  chunk_frames=16)
        st.feed(w)
        st.flush()
        want.append(st.text)

    svc = StreamSessionService(
        uni_ckpt, StreamServeConfig(max_streams=2, chunk_frames=16))
    server = make_http_server(None, "127.0.0.1", 0, stream_service=svc)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def post(path, data=b"", fmt=None):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", data=data, method="POST")
        if fmt:
            req.add_header("X-Audio-Format", fmt)
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    try:
        sids = [post("/stream/open")["id"] for _ in waves]
        got_parts = ["", ""]
        step = 4000
        for off in range(0, 12000, step):
            for j, w in enumerate(waves):
                if off < len(w):
                    pcm = (np.clip(w[off:off + step], -1, 1)
                           * 32767).astype("<i2").tobytes()
                    got_parts[j] += post(f"/stream/{sids[j]}/feed",
                                         pcm)["text"]
        finals = [post(f"/stream/{sids[j]}/close")["text"]
                  for j in range(2)]
        # int16 quantization of the HTTP body can flip near-tie argmax
        # frames on random logits, so compare against a single-stream
        # run of the SAME quantized audio
        for j, w in enumerate(waves):
            q = (np.clip(w, -1, 1) * 32767).astype(np.int16)
            st = StreamingTranscriber(variables, pkg.model_config,
                                      pkg.frontend_config, pkg.alphabet,
                                      chunk_frames=16)
            st.feed(q.astype(np.float32) / 32768.0)
            st.flush()
            assert finals[j] == st.text, j
            assert finals[j].startswith(got_parts[j]) or got_parts[j] == ""
        # f32 path is exact vs the float single-stream runs
        sid = post("/stream/open")["id"]
        post(f"/stream/{sid}/feed", waves[1].tobytes(), fmt="f32")
        assert post(f"/stream/{sid}/close")["text"] == want[1]
        # unknown stream -> 404
        try:
            post("/stream/99/feed", b"")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()
        svc.close()


def test_stream_sessions_concurrent_threads(uni_ckpt):
    """4 truly concurrent client threads against the shared ticker:
    catches lock races between feed/tick/finish. Each session's final
    text must equal a single-stream run of its own audio."""
    from tpuasr.serve import StreamServeConfig, StreamSessionService
    from tpuasr.stream import StreamingTranscriber
    from tpuasr.train.checkpoint import load_checkpoint

    pkg = load_checkpoint(uni_ckpt)
    variables = {"params": pkg.variables["params"],
                 "batch_stats": pkg.variables["batch_stats"]}
    rng = np.random.RandomState(11)
    waves = [(0.2 * rng.randn(7000 + 2500 * j)).astype(np.float32)
             for j in range(4)]
    want = []
    for w in waves:
        st = StreamingTranscriber(variables, pkg.model_config,
                                  pkg.frontend_config, pkg.alphabet,
                                  chunk_frames=16)
        st.feed(w)
        st.flush()
        want.append(st.text)

    svc = StreamSessionService(
        uni_ckpt, StreamServeConfig(max_streams=4, chunk_frames=16,
                                    idle_sleep_ms=1.0))
    finals = [None] * 4
    errors = []

    def client(j):
        try:
            sid = svc.open()
            for off in range(0, len(waves[j]), 1500):
                svc.feed(sid, waves[j][off:off + 1500])
            finals[j] = svc.finish(sid)[0]
        except Exception as e:  # pragma: no cover
            errors.append((j, repr(e)))

    try:
        threads = [threading.Thread(target=client, args=(j,))
                   for j in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors, errors
        assert finals == want
    finally:
        svc.close()


def test_stream_session_ids_never_recycle(uni_ckpt):
    """A finished/reaped session's id must go 404-stale, never address
    the slot's next occupant (generation-stamped sids)."""
    from tpuasr.serve import StreamServeConfig, StreamSessionService

    svc = StreamSessionService(
        uni_ckpt, StreamServeConfig(max_streams=1, chunk_frames=16))
    try:
        rng = np.random.RandomState(3)
        w = (0.2 * rng.randn(6000)).astype(np.float32)
        a = svc.open()
        svc.feed(a, w)
        svc.finish(a)
        b = svc.open()  # same physical slot, NEW id
        assert b != a
        with pytest.raises(KeyError):
            svc.feed(a, w)  # stale id cannot touch b's session
        with pytest.raises(KeyError):
            svc.finish(a)
        svc.feed(b, w)
        assert isinstance(svc.finish(b)[0], str)
    finally:
        svc.close()


def test_batch_and_stream_services_coexist(uni_ckpt):
    """A TranscriptionService and a StreamSessionService sharing one
    loaded checkpoint (cli.serve --streaming wiring) serve concurrent
    batch calls and live sessions correctly side by side."""
    from tpuasr.serve import StreamServeConfig, StreamSessionService
    from tpuasr.stream import StreamingTranscriber
    from tpuasr.train.checkpoint import load_checkpoint

    pkg = load_checkpoint(uni_ckpt)
    svc = TranscriptionService(
        uni_ckpt, ServeConfig(max_batch=2, batch_window_ms=5.0),
        package=pkg)
    stream_svc = StreamSessionService(
        uni_ckpt, StreamServeConfig(max_streams=2, chunk_frames=16),
        package=pkg, variables=svc.variables)
    rng = np.random.RandomState(21)
    wave = (0.2 * rng.randn(9000)).astype(np.float32)
    st = StreamingTranscriber(
        {"params": pkg.variables["params"],
         "batch_stats": pkg.variables["batch_stats"]},
        pkg.model_config, pkg.frontend_config, pkg.alphabet,
        chunk_frames=16)
    st.feed(wave)
    st.flush()
    want_stream = st.text

    results = {}
    errors = []

    def batch_client():
        try:
            results["batch"] = svc.transcribe_wave(wave, timeout=120)[0]
        except Exception as e:  # pragma: no cover
            errors.append(repr(e))

    def stream_client():
        try:
            sid = stream_svc.open()
            for off in range(0, len(wave), 2000):
                stream_svc.feed(sid, wave[off:off + 2000])
            results["stream"] = stream_svc.finish(sid)[0]
        except Exception as e:  # pragma: no cover
            errors.append(repr(e))

    try:
        threads = [threading.Thread(target=batch_client),
                   threading.Thread(target=stream_client)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        assert not errors, errors
        assert results["stream"] == want_stream
        assert isinstance(results["batch"], str)
    finally:
        stream_svc.close()
        svc.close()
