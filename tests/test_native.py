"""Native C++ decoder parity vs the Python host oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.decode.beam_host import prefix_beam_search
from tpuasr.decode.lm import train_ngram
from tpuasr.decode.native import NativeBeamDecoder, write_lm_binary
from tpuasr.labels import Alphabet

ABC = Alphabet(labels="_AB C")


@pytest.fixture(scope="module", autouse=True)
def _fresh_native_build():
    """Rebuild the native library from source before these tests: the
    .so is untracked (round-3 repo hygiene), and a stale binary must
    never mask a break of native/ctc_beam.cpp."""
    import os
    import subprocess

    import tpuasr.decode.native as native_mod

    subprocess.run(["make", "-C", native_mod._NATIVE_DIR, "clean"],
                   check=True, capture_output=True)
    assert not os.path.exists(native_mod._LIB_PATH)
    subprocess.run(["make", "-C", native_mod._NATIVE_DIR], check=True,
                   capture_output=True)
    native_mod._lib = None  # force a re-dlopen of the fresh build


def test_native_matches_python_no_lm():
    rng = np.random.RandomState(0)
    b, t, c = 4, 15, 5
    logits = rng.randn(b, t, c).astype(np.float32) * 2
    lengths = np.array([15, 11, 7, 3], np.int32)
    logprobs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))

    dec = NativeBeamDecoder(ABC, beam_width=8, num_processes=2)
    got = dec.decode(jnp.asarray(logits), jnp.asarray(lengths))
    for i in range(b):
        res = prefix_beam_search(logprobs[i, : lengths[i]], ABC, beam_width=8)
        assert got[i] == res[0][0].strip(), (i, got[i], res[0])


def test_native_matches_python_with_lm(tmp_path):
    lm = train_ngram(["AB C AB", "AB AB", "C AB C"], order=2)
    arpa = str(tmp_path / "lm.arpa")
    lm.save(arpa)

    rng = np.random.RandomState(1)
    b, t, c = 3, 12, 5
    logits = rng.randn(b, t, c).astype(np.float32) * 1.5
    lengths = np.array([12, 10, 8], np.int32)
    logprobs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))

    dec = NativeBeamDecoder(ABC, lm_path=arpa, alpha=1.0, beta=0.5,
                            beam_width=8, num_processes=2)
    got = dec.decode(jnp.asarray(logits), jnp.asarray(lengths))
    for i in range(b):
        res = prefix_beam_search(
            logprobs[i, : lengths[i]], ABC, beam_width=8,
            lm=lm, alpha=1.0, beta=0.5,
        )
        assert got[i] == res[0][0].strip(), (i, got[i], res[:2])


def test_native_offsets_match_python(tmp_path):
    """Per-char emission frames (ctcdecode's timesteps): the C++ batch
    decoder and the Python host decoder agree exactly, with and
    without an LM (both implement the device kernel's dominant-
    alignment merge rule)."""
    from tpuasr.decode.beam_host import BeamCTCDecoder

    lm = train_ngram(["AB C AB", "AB AB", "C AB C"], order=2)
    arpa = str(tmp_path / "lm.arpa")
    lm.save(arpa)

    rng = np.random.RandomState(5)
    b, t, c = 4, 18, 5
    logits = rng.randn(b, t, c).astype(np.float32) * 1.5
    lengths = np.array([18, 14, 9, 4], np.int32)

    for kw_n, kw_h in [
        (dict(), dict()),
        (dict(lm_path=arpa, alpha=1.0, beta=0.5),
         dict(lm_path=arpa, alpha=1.0, beta=0.5)),
    ]:
        dec_n = NativeBeamDecoder(ABC, beam_width=8, **kw_n)
        dec_h = BeamCTCDecoder(ABC, beam_width=8, **kw_h)
        tn, on = dec_n.decode(logits, lengths, return_offsets=True)
        th, oh = dec_h.decode(logits, lengths, return_offsets=True)
        assert tn == th
        for i in range(b):
            assert len(on[i]) == len(tn[i]), (i, tn[i], on[i])
            np.testing.assert_array_equal(on[i], oh[i])
            if len(on[i]):
                assert np.all(np.diff(on[i]) > 0)
                assert on[i][0] >= 0 and on[i][-1] < lengths[i]


def test_native_session_frames_match_batch():
    """The incremental session's best_with_frames equals the batch
    decoder's offsets when fed the same rows (in two chunks)."""
    from tpuasr.decode.native import NativeBeamSession

    rng = np.random.RandomState(6)
    t, c = 16, 5
    logits = (rng.randn(t, c) * 2).astype(np.float32)
    logprobs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))

    dec = NativeBeamDecoder(ABC, beam_width=8)
    texts, offs = dec.decode(logits[None], np.array([t], np.int32),
                             return_offsets=True)

    sess = NativeBeamSession(ABC, beam_width=8)
    sess.feed(logprobs[:7])
    sess.feed(logprobs[7:])
    ids, frames, _ = sess.best_with_frames()
    text = ABC.decode([int(x) for x in ids])
    lpad = len(text) - len(text.lstrip())
    rpad = len(text) - len(text.rstrip())
    assert text.strip() == texts[0]
    trimmed = frames[lpad: len(frames) - rpad] if rpad else frames[lpad:]
    np.testing.assert_array_equal(trimmed, offs[0])
    # prefix frames align with the committed ids
    p_ids, p_frames = sess.prefix_with_frames()
    assert len(p_ids) == len(p_frames)


def test_native_lm_shifts_output(tmp_path):
    lm = train_ngram(["AB", "AB AB"], order=2)
    arpa = str(tmp_path / "lm.arpa")
    lm.save(arpa)
    probs = np.full((3, 5), 1e-6)
    probs[0, 1] = 0.49; probs[0, 4] = 0.51
    probs[1, 2] = 1.0
    probs[2, 3] = 1.0
    logits = np.log(probs / probs.sum(-1, keepdims=True)).astype(np.float32)
    lengths = np.array([3], np.int32)
    no_lm = NativeBeamDecoder(ABC, beam_width=8)
    with_lm = NativeBeamDecoder(ABC, lm_path=arpa, alpha=2.0, beta=0.0,
                                beam_width=8)
    assert no_lm.decode(logits[None], lengths)[0].startswith("CB")
    assert with_lm.decode(logits[None], lengths)[0].startswith("AB")


def test_native_nbest_matches_python(tmp_path):
    """decode_nbest (ctcdecode's full output): the C++ batch n-best
    equals the Python host's — same texts best-first, scores to f32
    tolerance, identical emission frames — with and without an LM."""
    from tpuasr.decode.beam_host import BeamCTCDecoder

    lm = train_ngram(["AB C AB", "AB AB", "C AB C"], order=2)
    arpa = str(tmp_path / "lm.arpa")
    lm.save(arpa)

    rng = np.random.RandomState(9)
    b, t, c = 3, 14, 5
    logits = rng.randn(b, t, c).astype(np.float32) * 1.5
    lengths = np.array([14, 10, 6], np.int32)

    for kw in (dict(), dict(lm_path=arpa, alpha=1.0, beta=0.5)):
        dec_n = NativeBeamDecoder(ABC, beam_width=6, **kw)
        dec_h = BeamCTCDecoder(ABC, beam_width=6, **kw)
        got_n = dec_n.decode_nbest(logits, lengths)
        got_h = dec_h.decode_nbest(logits, lengths)
        for i in range(b):
            assert [r[0] for r in got_n[i]] == [r[0] for r in got_h[i]], (
                i, got_n[i], got_h[i])
            for rn, rh in zip(got_n[i], got_h[i]):
                np.testing.assert_allclose(rn[1], rh[1], rtol=2e-5,
                                           atol=2e-5)
                np.testing.assert_array_equal(rn[2], rh[2])
            # best-first ordering and top-1 == decode()
            scores = [r[1] for r in got_n[i]]
            assert scores == sorted(scores, reverse=True)
        top1 = dec_n.decode(logits, lengths)
        for i in range(b):
            assert got_n[i][0][0].strip() == top1[i]
