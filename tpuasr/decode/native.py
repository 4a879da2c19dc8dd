"""ctypes bindings for the native host beam decoder (native/ctc_beam.cpp).

Reference parity: the pybind11 binding layer of ctcdecode
(``CTCBeamDecoder``) — here a plain C ABI + ctypes (this image has no
pybind11; SURVEY.md environment notes). Also writes the framework's
binary LM format consumed by the C++ side (``write_lm_binary``), which
plays the role KenLM's binary format played for ctcdecode.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess

import numpy as np

from tpuasr.decode.lm import ArpaLM, HashedNGramLM
from tpuasr.labels import Alphabet

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtpuasr_native.so")

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_NATIVE_DIR, "ctc_beam.cpp")
    stale = os.path.exists(_LIB_PATH) and os.path.exists(src) and (
        os.path.getmtime(_LIB_PATH) < os.path.getmtime(src))
    if not os.path.exists(_LIB_PATH) or stale:
        # a stale .so predating an ABI change (e.g. the beam-session
        # symbols / prune_logp param) must never be dlopened
        subprocess.run(["make", "-C", _NATIVE_DIR, "-B"], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    if not hasattr(lib, "tpuasr_abi_version") or lib.tpuasr_abi_version() != 3:
        raise RuntimeError(
            f"{_LIB_PATH} predates ABI v3 (emission frames + n-best) and "
            "the source is unavailable to rebuild — run `make -C native -B`")
    lib.tpuasr_lm_load.restype = ctypes.c_void_p
    lib.tpuasr_lm_load.argtypes = [ctypes.c_char_p]
    lib.tpuasr_lm_free.argtypes = [ctypes.c_void_p]
    lib.tpuasr_beam_session_new.restype = ctypes.c_void_p
    lib.tpuasr_beam_session_new.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,  # labels C
        ctypes.c_int, ctypes.c_int, ctypes.c_int,  # blank space width
        ctypes.c_void_p,  # lm
        ctypes.c_float, ctypes.c_float,  # alpha beta
        ctypes.c_int, ctypes.c_float,  # cutoff_top_n cutoff_prob
        ctypes.c_float,  # prune_logp
    ]
    lib.tpuasr_beam_session_free.argtypes = [ctypes.c_void_p]
    lib.tpuasr_beam_session_reset.argtypes = [ctypes.c_void_p]
    lib.tpuasr_beam_session_feed.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.tpuasr_beam_session_prefix.restype = ctypes.c_int
    lib.tpuasr_beam_session_prefix.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    lib.tpuasr_beam_session_best.restype = ctypes.c_int
    lib.tpuasr_beam_session_best.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    lib.tpuasr_beam_decode_batch.restype = ctypes.c_int
    lib.tpuasr_beam_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float),  # logprobs
        ctypes.POINTER(ctypes.c_int),  # lengths
        ctypes.c_int, ctypes.c_int, ctypes.c_int,  # B T C
        ctypes.POINTER(ctypes.c_char_p),  # labels
        ctypes.c_int, ctypes.c_int, ctypes.c_int,  # blank space width
        ctypes.c_void_p,  # lm
        ctypes.c_float, ctypes.c_float,  # alpha beta
        ctypes.c_int, ctypes.c_float,  # cutoff_top_n cutoff_prob
        ctypes.c_float,  # prune_logp
        ctypes.c_int,  # num_threads
        ctypes.POINTER(ctypes.c_int),  # out_ids
        ctypes.POINTER(ctypes.c_int),  # out_frames (nullable)
        ctypes.POINTER(ctypes.c_int),  # out_lens
        ctypes.POINTER(ctypes.c_float),  # out_scores
    ]
    lib.tpuasr_beam_decode_batch_nbest.restype = ctypes.c_int
    lib.tpuasr_beam_decode_batch_nbest.argtypes = [
        ctypes.POINTER(ctypes.c_float),  # logprobs
        ctypes.POINTER(ctypes.c_int),  # lengths
        ctypes.c_int, ctypes.c_int, ctypes.c_int,  # B T C
        ctypes.POINTER(ctypes.c_char_p),  # labels
        ctypes.c_int, ctypes.c_int, ctypes.c_int,  # blank space width
        ctypes.c_void_p,  # lm
        ctypes.c_float, ctypes.c_float,  # alpha beta
        ctypes.c_int, ctypes.c_float,  # cutoff_top_n cutoff_prob
        ctypes.c_float,  # prune_logp
        ctypes.c_int,  # num_threads
        ctypes.c_int,  # n_best
        ctypes.POINTER(ctypes.c_int),  # out_ids (B, n, T)
        ctypes.POINTER(ctypes.c_int),  # out_frames (B, n, T)
        ctypes.POINTER(ctypes.c_int),  # out_lens (B, n)
        ctypes.POINTER(ctypes.c_float),  # out_scores (B, n)
    ]
    _lib = lib
    return lib


def write_lm_binary(lm: ArpaLM, path: str) -> None:
    """HashedNGramLM tables -> flat binary the C++ decoder mmaps."""
    hashed = HashedNGramLM.build(lm)
    with open(path, "wb") as f:
        f.write(b"TPUASRLM")
        f.write(struct.pack("<I", hashed.order))
        for k in range(hashed.order):
            keys = np.ascontiguousarray(hashed.keys[k], dtype=np.uint64)
            logps = np.ascontiguousarray(
                hashed.logps[k] * 1.0, dtype=np.float32
            )
            # stored logps are log10*ln10 = natural log already
            backoffs = np.ascontiguousarray(hashed.backoffs[k], np.float32)
            f.write(struct.pack("<Q", keys.shape[0]))
            f.write(keys.tobytes())
            f.write(logps.tobytes())
            f.write(backoffs.tobytes())


class NativeBeamSession:
    """Stateful incremental prefix-beam in C++ for live streams: the
    beam map persists across ``feed(logprob_rows)`` calls; ``prefix()``
    returns the stable common prefix of every live beam (what a stream
    may commit) and ``best()`` the finalized transcript ids. One
    session per stream (tpuasr.stream uses it when the native lib is
    available — same algorithm as the Python beam_step, at C++ speed).

    ``lm`` may be an ArpaLM (converted to the binary hash format in a
    temp file) or None. Capacity for readouts grows automatically.
    """

    def __init__(self, alphabet: Alphabet, lm: ArpaLM | None = None,
                 alpha: float = 0.8, beta: float = 1.0,
                 beam_width: int = 10, cutoff_top_n: int = 40,
                 cutoff_prob: float = 1.0, prune_logp: float = -20.0):
        import tempfile

        lib = _load_lib()
        self._lib = lib
        self.alphabet = alphabet
        self._lm = None
        if lm is not None:
            # one binary conversion per distinct LM object, shared by
            # every session built from it
            if not hasattr(lm, "_tpuasr_native_handle"):
                with tempfile.NamedTemporaryFile(
                        suffix=".tpuasrlm", delete=False) as f:
                    bin_path = f.name
                write_lm_binary(lm, bin_path)
                handle = lib.tpuasr_lm_load(bin_path.encode())
                os.unlink(bin_path)
                if not handle:
                    raise RuntimeError("failed to load LM for native beam")
                lm._tpuasr_native_handle = handle  # leaked on purpose:
                # freed only when the process exits (sessions borrow it)
            self._lm = lm._tpuasr_native_handle
        labels = [c.encode("utf-8") for c in alphabet.labels]
        self._labels_arr = (ctypes.c_char_p * len(labels))(*labels)
        self._handle = lib.tpuasr_beam_session_new(
            self._labels_arr, len(labels), alphabet.blank_id,
            alphabet.space_id, beam_width, self._lm,
            alpha, beta, cutoff_top_n, cutoff_prob, prune_logp)
        self._cap = 256
        self._out = np.zeros((self._cap,), np.int32)
        self._frames = np.zeros((self._cap,), np.int32)

    def feed(self, logprob_rows: np.ndarray) -> None:
        """Advance over (R, C) log-probability rows."""
        rows = np.ascontiguousarray(logprob_rows, dtype=np.float32)
        self._lib.tpuasr_beam_session_feed(
            self._handle,
            rows.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rows.shape[0])

    def _read(self, fn, *extra) -> tuple[np.ndarray, np.ndarray]:
        while True:
            n = fn(self._handle,
                   self._out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                   self._frames.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                   self._cap, *extra)
            if n < self._cap:
                return self._out[:n].copy(), self._frames[:n].copy()
            self._cap *= 2
            self._out = np.zeros((self._cap,), np.int32)
            self._frames = np.zeros((self._cap,), np.int32)

    def prefix(self) -> np.ndarray:
        """ids of the stable common prefix of all live beams."""
        return self._read(self._lib.tpuasr_beam_session_prefix)[0]

    def prefix_with_frames(self) -> tuple[np.ndarray, np.ndarray]:
        """(ids, frames) of the stable common prefix; frames are the
        best beam's per-char emission frames (absolute, counted from
        the first row ever fed)."""
        return self._read(self._lib.tpuasr_beam_session_prefix)

    def best(self) -> tuple[np.ndarray, float]:
        """(ids, score) of the finalized best beam."""
        score = ctypes.c_float(0.0)
        ids, _ = self._read(self._lib.tpuasr_beam_session_best,
                            ctypes.byref(score))
        return ids, float(score.value)

    def best_with_frames(self) -> tuple[np.ndarray, np.ndarray, float]:
        """(ids, frames, score) of the finalized best beam."""
        score = ctypes.c_float(0.0)
        ids, frames = self._read(self._lib.tpuasr_beam_session_best,
                                 ctypes.byref(score))
        return ids, frames, float(score.value)

    def reset(self) -> None:
        self._lib.tpuasr_beam_session_reset(self._handle)

    def __del__(self):
        if getattr(self, "_handle", None):
            try:
                self._lib.tpuasr_beam_session_free(self._handle)
            except Exception:
                pass


class NativeBeamDecoder:
    """Reference-API host decoder backed by C++ (multi-threaded batch),
    mirroring ctcdecode's CTCBeamDecoder(labels, lm_path, alpha, beta,
    cutoff_top_n, cutoff_prob, beam_width, num_processes, blank_index).
    ``lm_path`` here is an ARPA file; it is converted to the binary
    hash format on first use (cached alongside)."""

    def __init__(
        self,
        alphabet: Alphabet,
        lm_path: str | None = None,
        alpha: float = 0.8,
        beta: float = 1.0,
        beam_width: int = 10,
        cutoff_top_n: int = 40,
        cutoff_prob: float = 1.0,
        num_processes: int = 2,
        prune_logp: float = -20.0,
    ):
        self.alphabet = alphabet
        self.alpha = alpha
        self.beta = beta
        self.beam_width = beam_width
        self.cutoff_top_n = cutoff_top_n
        self.cutoff_prob = cutoff_prob
        self.prune_logp = prune_logp
        self.num_threads = num_processes
        lib = _load_lib()
        self._lm = None
        if lm_path:
            with open(lm_path, "rb") as f:
                if f.read(8).startswith(b"mmap lm"):
                    raise ValueError(
                        "the native decoder needs enumerable n-grams to "
                        "build its hash tables; a KenLM probing binary "
                        "stores only opaque hashes — convert to ARPA or "
                        "use --decoder beam (host, reads KenLM binaries)"
                    )
            bin_path = lm_path + ".tpuasrlm"
            if not os.path.exists(bin_path) or (
                os.path.getmtime(bin_path) < os.path.getmtime(lm_path)
            ):
                write_lm_binary(ArpaLM.load(lm_path), bin_path)
            self._lm = lib.tpuasr_lm_load(bin_path.encode())
            if not self._lm:
                raise RuntimeError(f"failed to load LM {bin_path}")
        labels = [c.encode("utf-8") for c in alphabet.labels]
        self._labels_arr = (ctypes.c_char_p * len(labels))(*labels)

    def decode(self, logits, lengths, return_offsets: bool = False):
        import jax.nn
        import jax.numpy as jnp

        logprobs = np.ascontiguousarray(
            np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1)),
            dtype=np.float32,
        )
        lengths = np.ascontiguousarray(np.asarray(lengths), dtype=np.int32)
        b, t, c = logprobs.shape
        out_ids = np.zeros((b, t), np.int32)
        out_frames = np.zeros((b, t), np.int32)
        out_lens = np.zeros((b,), np.int32)
        out_scores = np.zeros((b,), np.float32)
        lib = _load_lib()
        rc = lib.tpuasr_beam_decode_batch(
            logprobs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            b, t, c,
            self._labels_arr,
            self.alphabet.blank_id,
            self.alphabet.space_id,
            self.beam_width,
            self._lm,
            self.alpha, self.beta,
            self.cutoff_top_n, self.cutoff_prob, self.prune_logp,
            self.num_threads,
            out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out_frames.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise RuntimeError(f"native decode failed rc={rc}")
        texts, offsets = [], []
        for i in range(b):
            ids = out_ids[i, : out_lens[i]]
            frames = out_frames[i, : out_lens[i]].astype(np.int64)
            text = self.alphabet.decode(ids)
            # .strip() parity: drop offsets of the stripped chars
            lpad = len(text) - len(text.lstrip())
            rpad = len(text) - len(text.rstrip())
            texts.append(text.strip())
            offsets.append(frames[lpad: len(frames) - rpad]
                           if rpad else frames[lpad:])
        if return_offsets:
            return texts, offsets
        return texts

    def decode_nbest(self, logits, lengths, n_best: int | None = None):
        """Per utterance: [(text, score, offsets)] best-first — the
        full ctcdecode output surface (every beam, its score, and its
        per-char emission frames), mirroring
        DeviceBeamDecoder.decode_nbest."""
        import jax.nn
        import jax.numpy as jnp

        n = n_best or self.beam_width
        logprobs = np.ascontiguousarray(
            np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1)),
            dtype=np.float32,
        )
        lengths = np.ascontiguousarray(np.asarray(lengths), dtype=np.int32)
        b, t, c = logprobs.shape
        out_ids = np.zeros((b, n, t), np.int32)
        out_frames = np.zeros((b, n, t), np.int32)
        out_lens = np.zeros((b, n), np.int32)
        out_scores = np.zeros((b, n), np.float32)
        lib = _load_lib()
        rc = lib.tpuasr_beam_decode_batch_nbest(
            logprobs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            b, t, c,
            self._labels_arr,
            self.alphabet.blank_id,
            self.alphabet.space_id,
            self.beam_width,
            self._lm,
            self.alpha, self.beta,
            self.cutoff_top_n, self.cutoff_prob, self.prune_logp,
            self.num_threads, n,
            out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out_frames.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out_lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise RuntimeError(f"native nbest decode failed rc={rc}")
        results = []
        for i in range(b):
            rows = []
            for j in range(n):
                ln = int(out_lens[i, j])
                if ln == 0 and out_scores[i, j] <= -1e29:
                    continue  # fewer live beams than n
                rows.append((
                    self.alphabet.decode(out_ids[i, j, :ln]),
                    float(out_scores[i, j]),
                    out_frames[i, j, :ln].astype(np.int64),
                ))
            results.append(rows)
        return results

    def __del__(self):
        if getattr(self, "_lm", None):
            try:
                _load_lib().tpuasr_lm_free(self._lm)
            except Exception:
                pass
