"""Batch transcription service: micro-batched, bucket-compiled serving.

The reference has no serving layer (SURVEY.md §2: scripts only); this
is the production-deployment surface the TPU rebuild adds. Design:

  * requests (WAV bytes) land in a queue; a single device worker
    drains up to ``max_batch`` of them within ``batch_window_ms`` —
    micro-batching amortizes the per-dispatch latency and rides the
    MXU's batch sweet spot (BASELINE.md: greedy 1449 utt/s @B=32 ->
    3038 @B=128 on v5e).
  * every batch is padded to a static duration bucket
    (tpuasr.data.buckets.BucketSpec), so XLA compiles one graph per
    (bucket, batch) and never again — no shape churn in production.
  * decode: any framework decoder (greedy default; beam-device with
    word-LM fusion for accuracy-critical serving).

HTTP wrapper (tpuasr.cli.serve): POST /transcribe with a WAV body ->
{"text": ..., "offsets": [...]}; GET /healthz.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from dataclasses import dataclass

import numpy as np


@dataclass
class ServeConfig:
    max_batch: int = 32
    batch_window_ms: float = 10.0
    return_offsets: bool = False
    # pad every request up in a fixed bucket ladder -> static shapes
    max_seconds: float = 16.5
    # audio beyond max_seconds: "chunk" decodes it via overlapping
    # ladder-sized chunks stitched on host (decode/longform.py — full
    # transcript, same compiled graphs); "reject" fails the request;
    # "truncate" clamps to max_seconds (the pre-round-3 behavior, now
    # opt-in: silent partial transcripts are a correctness bug)
    long_audio: str = "chunk"
    chunk_overlap: float = 2.0
    # durations (seconds) whose buckets are compiled at startup, BEFORE
    # the service takes traffic: a cold (bucket, batch) graph compiles
    # for minutes on TPU and would blow through request timeouts if the
    # first real request paid it
    warmup_seconds: tuple = ()


class TranscriptionService:
    """Checkpoint -> ready-to-serve transcriber with micro-batching."""

    def __init__(self, model_path: str, cfg: ServeConfig | None = None,
                 decoder=None, rnn_impl: str | None = None, package=None):
        import jax.numpy as jnp

        from tpuasr.data.buckets import BucketSpec
        from tpuasr.decode.greedy import GreedyDecoder
        from tpuasr.train.checkpoint import load_checkpoint
        from tpuasr.train.step import make_eval_step

        self.cfg = cfg or ServeConfig()
        pkg = package if package is not None else load_checkpoint(model_path)
        model_cfg = pkg.model_config
        if rnn_impl:
            import dataclasses

            model_cfg = dataclasses.replace(model_cfg, rnn_impl=rnn_impl)
        self.alphabet = pkg.alphabet
        self.frontend_cfg = pkg.frontend_config
        self._variables = {
            "params": pkg.variables["params"],
            "batch_stats": pkg.variables["batch_stats"],
        }
        self._variables = _tree_device(self._variables)
        self._eval_step = make_eval_step(model_cfg, self.frontend_cfg)
        self.decoder = decoder or GreedyDecoder(self.alphabet)
        self.spec = BucketSpec(sample_rate=self.frontend_cfg.sample_rate)
        self._jnp = jnp

        for sec in self.cfg.warmup_seconds:
            self.warmup(sec)

        self._queue: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._serve_loop, daemon=True)
        self._worker.start()

    def warmup(self, seconds: float) -> None:
        """Compile the (bucket, max_batch) graphs a request of this
        duration would hit — eval forward AND decoder — so production
        traffic never pays a cold compile."""
        jnp = self._jnp
        cap = int(self.cfg.max_seconds * self.spec.sample_rate)
        n = min(int(seconds * self.spec.sample_rate), cap)
        b_idx = self.spec.bucket_of(n / self.spec.sample_rate)
        l_bucket = self.spec.bucket_samples(b_idx)
        arr = np.zeros((self.cfg.max_batch, l_bucket), np.float32)
        lengths = np.full((self.cfg.max_batch,), n, np.int32)
        logits, out_lengths = self._eval_step(
            self._variables, jnp.asarray(arr), jnp.asarray(lengths)
        )
        self.decoder.decode(logits, out_lengths, return_offsets=True)

    # ---------- public API ----------

    @property
    def variables(self):
        """Device-resident {params, batch_stats} (read-only; shareable
        with a StreamSessionService to avoid a second upload)."""
        return self._variables

    def transcribe_wave(self, wave: np.ndarray, timeout: float = 60.0):
        """Blocking single-utterance call (thread-safe): enqueue and
        wait; the worker micro-batches concurrent callers together.
        Audio beyond cfg.max_seconds follows cfg.long_audio
        (chunk / reject / truncate — never silently truncated)."""
        cap = int(self.cfg.max_seconds * self.spec.sample_rate)
        wave = wave.astype(np.float32)
        if len(wave) > cap:
            if self.cfg.long_audio == "reject":
                raise ValueError(
                    f"audio of {len(wave) / self.spec.sample_rate:.1f}s "
                    f"exceeds the {self.cfg.max_seconds}s serving cap "
                    "(long_audio='reject')"
                )
            if self.cfg.long_audio == "truncate":
                wave = wave[:cap]
        done = threading.Event()
        slot: dict = {}
        self._queue.put((wave, slot, done))
        if not done.wait(timeout):
            raise TimeoutError("transcription timed out")
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["text"], slot["offsets"]

    def transcribe_wav_bytes(self, data: bytes, timeout: float = 60.0):
        from scipy.io import wavfile

        from tpuasr.audio.io import resample_poly_host

        sr, wave = wavfile.read(io.BytesIO(data))
        if wave.dtype == np.int16:
            wave = wave.astype(np.float32) / 32768.0
        elif wave.dtype != np.float32:
            wave = wave.astype(np.float32)
        if wave.ndim > 1:
            wave = wave.mean(axis=1)
        if sr != self.frontend_cfg.sample_rate:
            wave = resample_poly_host(wave, sr, self.frontend_cfg.sample_rate)
        return self.transcribe_wave(wave, timeout=timeout)

    def close(self):
        self._stop.set()
        self._worker.join(timeout=5)

    # ---------- worker ----------

    def _collect(self):
        """Block for one request, then drain up to max_batch within the
        batching window."""
        try:
            first = self._queue.get(timeout=0.2)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.time() + self.cfg.batch_window_ms / 1e3
        while len(batch) < self.cfg.max_batch:
            remaining = deadline - time.time()
            if remaining <= 0:
                break
            try:
                batch.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _serve_loop(self):
        jnp = self._jnp
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            cap = int(self.cfg.max_seconds * self.spec.sample_rate)
            short = [r for r in batch if len(r[0]) <= cap]
            long_ = [r for r in batch if len(r[0]) > cap]
            if short:
                try:
                    waves, slots, dones = zip(*short)
                    n_max = max(len(w) for w in waves)
                    b_idx = self.spec.bucket_of(n_max / self.spec.sample_rate)
                    l_bucket = self.spec.bucket_samples(b_idx)
                    bsz = self.cfg.max_batch  # static batch dim
                    arr = np.zeros((bsz, l_bucket), np.float32)
                    lengths = np.zeros((bsz,), np.int32)
                    for j, w in enumerate(waves):
                        arr[j, : len(w)] = w
                        lengths[j] = len(w)
                    logits, out_lengths = self._eval_step(
                        self._variables, jnp.asarray(arr), jnp.asarray(lengths)
                    )
                    texts, offsets = self.decoder.decode(
                        logits, out_lengths, return_offsets=True
                    )
                    for j, (slot, done) in enumerate(zip(slots, dones)):
                        slot["text"] = texts[j]
                        slot["offsets"] = np.asarray(offsets[j]).tolist()
                        done.set()
                except Exception as exc:  # report, never wedge callers
                    for _, slot, done in short:
                        slot["error"] = repr(exc)
                        done.set()
            # long-form requests (cfg.long_audio == "chunk"): overlapping
            # ladder-sized chunks batched through the SAME compiled
            # (max_batch, bucket) graphs, stitched + decoded on host
            for wave, slot, done in long_:
                try:
                    from tpuasr.decode.longform import (
                        samples_per_frame,
                        transcribe_longform,
                    )

                    text, frames = transcribe_longform(
                        self._eval_step, self._variables, wave,
                        self.alphabet, self.spec, self.decoder,
                        overlap_seconds=self.cfg.chunk_overlap,
                        batch_size=self.cfg.max_batch,
                        spf=samples_per_frame(self.frontend_cfg),
                    )
                    slot["text"] = text
                    slot["offsets"] = np.asarray(frames).tolist()
                except Exception as exc:
                    slot["error"] = repr(exc)
                done.set()


def _tree_device(tree):
    from tpuasr.train.checkpoint import device_put_blocking

    return device_put_blocking(tree)


# ---------------------------------------------------------------------------
# Live-stream sessions (unidirectional models): many concurrent streams
# share ONE batched streaming step (tpuasr.stream.MultiStreamTranscriber)
# ---------------------------------------------------------------------------


@dataclass
class StreamServeConfig:
    max_streams: int = 8
    chunk_frames: int = 32
    # ticker cadence when no stream has a full chunk buffered
    idle_sleep_ms: float = 5.0
    # a session silent for this long is force-closed (slot leak guard)
    session_timeout_s: float = 300.0
    # decode: "greedy" or "beam" (incremental prefix-beam per session,
    # optional word-LM shallow fusion via lm_path)
    decoder: str = "greedy"
    # beam engine: "auto" = device-resident kernel, then native C++
    # sessions, then host Python (stream.MultiStreamTranscriber)
    beam_impl: str = "auto"
    lm_path: str | None = None
    alpha: float = 0.8
    beta: float = 1.0
    beam_width: int = 10
    cutoff_top_n: int = 40
    cutoff_prob: float = 1.0
    # optional (mean, var, weight_frames): prime causal normalization
    # with corpus stats (stream._init_carry; PARITY.md)
    prime_stats: tuple | None = None


class StreamSessionService:
    """HTTP-session wrapper around MultiStreamTranscriber.

    A single background ticker thread batches every live session into
    shared device steps (the TPU-native design: one stream underfills
    the MXU; concurrent sessions ride the batch dimension at near the
    cost of one). feed() only buffers + reads back already-finalized
    text, so request latency never includes device work.

    Requires a unidirectional (streaming-capable) checkpoint; decode
    greedy or per-session beam(+LM) (see MultiStreamTranscriber).
    Offline batch requests can be served by a TranscriptionService
    alongside — dispatches interleave safely on one chip; pass its
    ``package=`` so the checkpoint is loaded (and uploaded) once.

    Session ids are generation-stamped (``gen * max_streams + slot``):
    a reaped or finished session's id can never address the slot's next
    occupant, so a stale client's late feed/close gets 404 instead of
    hijacking another session.
    """

    def __init__(self, model_path: str,
                 cfg: StreamServeConfig | None = None, package=None,
                 variables=None):
        # (no rnn_impl knob: the streaming step is its own scan math,
        # independent of the offline model's rnn_impl selection)
        from tpuasr.stream import MultiStreamTranscriber
        from tpuasr.train.checkpoint import load_checkpoint

        self.cfg = cfg or StreamServeConfig()
        pkg = package if package is not None else load_checkpoint(model_path)
        model_cfg = pkg.model_config
        if model_cfg.bidirectional:
            raise ValueError(
                "streaming sessions need a unidirectional checkpoint "
                "(bidirectional=False, e.g. --no-bidirectional training)")
        self.sample_rate = pkg.frontend_config.sample_rate
        if variables is None:  # share a TranscriptionService's copy
            variables = _tree_device({
                "params": pkg.variables["params"],
                "batch_stats": pkg.variables["batch_stats"],
            })
        lm = None
        if self.cfg.decoder == "beam" and self.cfg.lm_path:
            from tpuasr.decode.lm import load_lm

            lm = load_lm(self.cfg.lm_path)
        self._mst = MultiStreamTranscriber(
            variables, model_cfg, pkg.frontend_config, pkg.alphabet,
            max_streams=self.cfg.max_streams,
            chunk_frames=self.cfg.chunk_frames,
            decoder=self.cfg.decoder, lm=lm, alpha=self.cfg.alpha,
            beta=self.cfg.beta, beam_width=self.cfg.beam_width,
            cutoff_top_n=self.cfg.cutoff_top_n,
            cutoff_prob=self.cfg.cutoff_prob,
            beam_impl=self.cfg.beam_impl,
            prime_stats=self.cfg.prime_stats)
        self._lock = threading.Lock()
        self._sessions: dict[int, int] = {}  # public sid -> slot
        self._gen = 0  # generation stamp: sids never repeat
        self._last_seen: dict[int, float] = {}
        self._stop = threading.Event()
        # warm the step graph BEFORE sessions arrive (one compile ever)
        with self._lock:
            sid = self._mst.open()
            self._mst.feed(sid, np.zeros(
                (self.cfg.chunk_frames * pkg.frontend_config.hop + 1,),
                np.float32))
            self._mst.tick()
            self._mst.flush(sid)
            self._mst.close(sid)
        self._ticker = threading.Thread(target=self._tick_loop, daemon=True)
        self._ticker.start()

    # ---- session API ------------------------------------------------------

    def open(self) -> int:
        with self._lock:
            self._reap()
            slot = self._mst.open()
            self._gen += 1
            sid = self._gen * self.cfg.max_streams + slot
            self._sessions[sid] = slot
            self._last_seen[sid] = time.time()
            return sid

    def feed(self, sid: int, samples: np.ndarray) -> str:
        """Buffer samples; return text finalized so far this session
        (decode happens on the shared ticker thread)."""
        with self._lock:
            self._mst.feed(self._slot(sid), samples)
            self._last_seen[sid] = time.time()
            return self._mst.take_text(self._slot(sid))

    def finish(self, sid: int) -> tuple[str, list[int]]:
        """Drain + close the session; returns the FULL final text and
        per-char frame offsets.

        The drain is driven by the shared ticker with the service lock
        RELEASED between ticks (round-3 ADVICE #3): other sessions'
        feed/open never block behind a closing stream's pipeline
        depth. This thread only polls flush_done()."""
        with self._lock:
            slot = self._slot(sid)
            self._mst.begin_flush(slot)
            self._last_seen[sid] = time.time()
        while True:
            with self._lock:
                if sid not in self._sessions:
                    # reaped mid-drain (can only happen after
                    # session_timeout_s of ticker starvation)
                    raise KeyError(f"stream {sid} timed out during drain")
                self._last_seen[sid] = time.time()
                if self._mst.flush_done(slot):
                    text = self._mst.finalize_flush(slot)
                    offs = self._mst.offsets(slot).tolist()
                    self._mst.close(slot)
                    self._sessions.pop(sid, None)
                    self._last_seen.pop(sid, None)
                    return text, offs
            time.sleep(self.cfg.idle_sleep_ms / 1e3)

    def close(self) -> None:
        self._stop.set()
        self._ticker.join(timeout=5)

    # ---- internals --------------------------------------------------------

    def _slot(self, sid: int) -> int:
        """Session id -> live slot; stale/unknown ids get KeyError
        (-> HTTP 404), never another session's slot."""
        if sid not in self._sessions:
            raise KeyError(f"no open stream {sid}")
        return self._sessions[sid]

    def _reap(self) -> None:
        now = time.time()
        for sid, seen in list(self._last_seen.items()):
            if now - seen > self.cfg.session_timeout_s:
                try:
                    self._mst.close(self._sessions[sid])
                except KeyError:
                    pass
                self._sessions.pop(sid, None)
                self._last_seen.pop(sid, None)

    def _tick_loop(self) -> None:
        last_reap = time.time()
        while not self._stop.is_set():
            try:
                with self._lock:
                    stepped = self._mst.tick()
                    # reap abandoned sessions even if no open() ever
                    # arrives again (round-3 ADVICE #2: a timed-out
                    # session must not hold its slot/carry/beam state
                    # forever)
                    if time.time() - last_reap > 5.0:
                        self._reap()
                        last_reap = time.time()
            except Exception as exc:  # never let the shared ticker die
                print(f"stream ticker error (retrying): {exc!r}",
                      flush=True)
                time.sleep(0.2)
                continue
            if not stepped:
                time.sleep(self.cfg.idle_sleep_ms / 1e3)


# ---------------------------------------------------------------------------
# HTTP layer
# ---------------------------------------------------------------------------


def make_http_server(service: TranscriptionService | None, host: str,
                     port: int,
                     stream_service: "StreamSessionService | None" = None):
    """HTTP server over a batch service and/or a live-stream session
    service. Streaming protocol (raw PCM at the model sample rate —
    int16 LE by default, `X-Audio-Format: f32` for float32):

        POST /stream/open            -> {"id": N}
        POST /stream/<id>/feed  PCM  -> {"text": "<newly final text>"}
        POST /stream/<id>/close      -> {"text": "<full final text>"}
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet by default
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload, ensure_ascii=False).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> bytes:
            n = int(self.headers.get("Content-Length", "0"))
            return self.rfile.read(n)

        def _pcm(self, data: bytes) -> np.ndarray:
            if self.headers.get("X-Audio-Format", "i16").lower() == "f32":
                return np.frombuffer(data, np.float32)
            return np.frombuffer(data, np.int16).astype(np.float32) / 32768.0

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok"})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            try:
                if self.path == "/transcribe" and service is not None:
                    text, offsets = service.transcribe_wav_bytes(
                        self._body())
                    self._send(200, {"text": text, "offsets": offsets})
                    return
                if self.path.startswith("/stream"):
                    if stream_service is None:
                        self._send(400, {"error": "streaming disabled "
                                         "(start with --streaming and a "
                                         "unidirectional checkpoint)"})
                        return
                    parts = self.path.strip("/").split("/")
                    if parts == ["stream", "open"]:
                        self._send(200, {"id": stream_service.open()})
                        return
                    if len(parts) == 3 and parts[2] in ("feed", "close"):
                        sid = int(parts[1])
                        if parts[2] == "feed":
                            frag = stream_service.feed(
                                sid, self._pcm(self._body()))
                            self._send(200, {"text": frag})
                        else:
                            text, offs = stream_service.finish(sid)
                            self._send(200, {"text": text,
                                             "offsets": offs})
                        return
                self._send(404, {"error": "not found"})
            except KeyError as exc:
                self._send(404, {"error": f"unknown stream {exc}"})
            except Exception as exc:
                self._send(400, {"error": repr(exc)})

    return ThreadingHTTPServer((host, port), Handler)
