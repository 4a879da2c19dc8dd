"""Long-form decoding: bounded compiles via ladder padding + chunked
stitching (round-3 VERDICT item 2; SURVEY.md §4.2 — the reference
transcribed arbitrary-length WAVs)."""

import numpy as np
import pytest

import jax

from tpuasr.audio.frontend import FrontendConfig, log_spectrogram
from tpuasr.data.buckets import BucketSpec
from tpuasr.decode.greedy import GreedyDecoder
from tpuasr.decode.longform import (
    chunk_plan,
    greedy_decode_host,
    host_decode,
    longform_logits,
    pad_to_ladder,
    transcribe_longform,
)
from tpuasr.labels import Alphabet
from tpuasr.model.ds2 import ModelConfig
from tpuasr.train.step import TrainConfig, init_train_state, make_eval_step

SR = 16000
SPEC = BucketSpec(seconds=(0.5, 1.0), sample_rate=SR)  # tiny test ladder


def test_chunk_plan_tiles_exactly():
    for n in (SR + 1, SR * 3, SR * 3 + 137, SR * 10):
        plan = chunk_plan(n, SPEC, overlap_seconds=0.4)
        # kept regions tile [0, n) exactly
        covered = 0
        for s, length, lo, hi in plan:
            assert 0 <= lo < hi <= length
            assert s + lo == covered
            covered = s + hi
        assert covered == n
        # every chunk fits the last bucket
        assert all(length <= SPEC.bucket_samples(1) for _, length, _, _ in plan)


def test_chunk_plan_short_is_single():
    assert chunk_plan(100, SPEC) == [(0, 100, 0, 100)]


def test_pad_to_ladder_never_truncates():
    w = np.ones(int(0.6 * SR), np.float32)
    padded, n = pad_to_ladder(w, SPEC)
    assert n == len(w)
    assert len(padded) == SPEC.bucket_samples(1)
    np.testing.assert_array_equal(padded[:n], w)
    with pytest.raises(ValueError):
        pad_to_ladder(np.ones(SR * 2, np.float32), SPEC)


@pytest.fixture(scope="module")
def tiny_eval():
    import jax.numpy as jnp

    mc = ModelConfig(n_classes=Alphabet().size, hidden_size=24,
                     hidden_layers=1, compute_dtype=jnp.float32)
    state = init_train_state(mc, TrainConfig(), jax.random.PRNGKey(3))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return make_eval_step(mc, FrontendConfig()), variables


def _full_logits(eval_step, variables, wave):
    import jax.numpy as jnp

    logits, out_lengths = eval_step(
        variables, jnp.asarray(wave[None]),
        jnp.asarray(np.array([len(wave)], np.int32)),
    )
    return np.asarray(logits[0, : int(out_lengths[0])], np.float32)


def test_longform_logits_match_full_run(tiny_eval):
    """Stitched chunk logits agree with the one-shot full-length run:
    frame counts within one frame per boundary, and the overwhelming
    majority of frames argmax-identical (each kept frame sees at least
    overlap/2 of true left+right context)."""
    eval_step, variables = tiny_eval
    rng = np.random.RandomState(0)
    t = np.arange(SR * 3) / SR
    wave = (0.5 * np.sin(2 * np.pi * 220 * t)
            + 0.1 * rng.randn(len(t))).astype(np.float32)

    stitched = longform_logits(eval_step, variables, wave, SPEC,
                               overlap_seconds=0.4)
    full = _full_logits(eval_step, variables, wave)
    n_chunks = len(chunk_plan(len(wave), SPEC, 0.4))
    assert abs(stitched.shape[0] - full.shape[0]) <= n_chunks

    m = min(stitched.shape[0], full.shape[0])
    agree = (stitched[:m].argmax(-1) == full[:m].argmax(-1)).mean()
    assert agree > 0.9, f"argmax agreement {agree:.3f}"


def test_transcribe_longform_greedy_close_to_full(tiny_eval):
    eval_step, variables = tiny_eval
    rng = np.random.RandomState(1)
    wave = (0.2 * rng.randn(SR * 4)).astype(np.float32)
    text, frames = transcribe_longform(eval_step, variables, wave,
                                       Alphabet(), SPEC, decoder=None,
                                       overlap_seconds=0.4)
    full = _full_logits(eval_step, variables, wave)
    text_full, _ = greedy_decode_host(full, Alphabet())
    # identical up to boundary wobble: compare via edit distance
    from tpuasr.decode.metrics import cer

    assert cer(text, text_full) < 0.15
    assert len(frames) == len(text)


def test_host_decode_beam_host_path(tiny_eval):
    """host_decode dispatches the host beam decoder on assembled logits
    and agrees with the greedy transcript on an easy (peaked) input."""
    from tpuasr.decode.beam_host import BeamCTCDecoder

    alphabet = Alphabet()
    rng = np.random.RandomState(2)
    t = 40
    logits = rng.randn(t, alphabet.size).astype(np.float32) * 0.1
    # make a clearly peaked sequence: "AB"
    a, b_ = alphabet.encode("A")[0], alphabet.encode("B")[0]
    for i in range(t):
        logits[i, alphabet.blank_id] += 6.0
    for i in (10, 11):
        logits[i, a] += 12.0
    for i in (25, 26):
        logits[i, b_] += 12.0
    text, offs = host_decode(BeamCTCDecoder(alphabet), logits, alphabet)
    text_g, offs_g = greedy_decode_host(logits, alphabet)
    assert text == text_g == "AB"
    # beam offsets (round-3 VERDICT #4): the peaked emissions are at
    # frames 10 and 25 for greedy AND the beam's dominant alignment
    np.testing.assert_array_equal(offs_g, [10, 25])
    np.testing.assert_array_equal(offs, [10, 25])


def test_host_decode_beam_offsets_all_engines(tiny_eval):
    """Every long-form beam flavor (host Python, native C++, device
    fallback) returns per-char offsets that agree with each other."""
    from tpuasr.decode.beam_host import BeamCTCDecoder
    from tpuasr.decode.native import NativeBeamDecoder

    alphabet = Alphabet()
    rng = np.random.RandomState(7)
    t = 60
    logits = (rng.randn(t, alphabet.size) * 1.5).astype(np.float32)
    th, offs_h = host_decode(BeamCTCDecoder(alphabet), logits, alphabet)
    tn, offs_n = host_decode(NativeBeamDecoder(alphabet), logits, alphabet)
    assert th == tn
    assert len(offs_h) == len(th)
    np.testing.assert_array_equal(offs_h, offs_n)
    # offsets are strictly increasing frame indices within [0, T)
    assert np.all(np.diff(offs_h) > 0)
    if len(offs_h):
        assert offs_h[0] >= 0 and offs_h[-1] < t


def test_batched_chunk_eval_matches_b1(tiny_eval):
    """eval_chunks with batch_size>1 groups same-bucket chunks through
    one dispatch and returns the same logits as batch_size=1."""
    eval_step, variables = tiny_eval
    rng = np.random.RandomState(4)
    wave = (0.2 * rng.randn(SR * 3)).astype(np.float32)
    a = longform_logits(eval_step, variables, wave, SPEC, 0.4, batch_size=1)
    b = longform_logits(eval_step, variables, wave, SPEC, 0.4, batch_size=4)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
