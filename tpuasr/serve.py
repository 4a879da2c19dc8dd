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
from dataclasses import dataclass, field

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
                 decoder=None, rnn_impl: str | None = None):
        import jax.numpy as jnp

        from tpuasr.data.buckets import BucketSpec
        from tpuasr.decode.greedy import GreedyDecoder
        from tpuasr.train.checkpoint import load_checkpoint
        from tpuasr.train.step import make_eval_step

        self.cfg = cfg or ServeConfig()
        pkg = load_checkpoint(model_path)
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
    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, tree)


# ---------------------------------------------------------------------------
# HTTP layer
# ---------------------------------------------------------------------------


def make_http_server(service: TranscriptionService, host: str, port: int):
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

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok"})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/transcribe":
                self._send(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                data = self.rfile.read(n)
                text, offsets = service.transcribe_wav_bytes(data)
                self._send(200, {"text": text, "offsets": offsets})
            except Exception as exc:
                self._send(400, {"error": repr(exc)})

    return ThreadingHTTPServer((host, port), Handler)
