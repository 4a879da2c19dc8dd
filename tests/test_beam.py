"""Beam search tests: host oracle vs brute force, device vs host,
LM fusion behavior (SURVEY.md §7)."""

import itertools
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.decode.beam import DeviceBeamDecoder
from tpuasr.decode.beam_host import BeamCTCDecoder, prefix_beam_search
from tpuasr.decode.lm import ArpaLM, train_ngram
from tpuasr.labels import Alphabet

ABC = Alphabet(labels="_AB C")  # blank, A, B, space, C


def brute_force_totals(logprobs: np.ndarray, alphabet: Alphabet) -> dict:
    """Exact P(label sequence) by summing over all alignments."""
    t, c = logprobs.shape
    totals = {}
    for path in itertools.product(range(c), repeat=t):
        collapsed = []
        prev = None
        for s in path:
            if s != prev:
                collapsed.append(s)
            prev = s
        key = tuple(s for s in collapsed if s != alphabet.blank_id)
        lp = sum(logprobs[i, s] for i, s in enumerate(path))
        totals[key] = np.logaddexp(totals.get(key, -np.inf), lp)
    return totals


def test_host_beam_matches_brute_force():
    rng = np.random.RandomState(0)
    for trial in range(3):
        logits = rng.randn(5, 5) * 2
        logprobs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
        totals = brute_force_totals(logprobs, ABC)
        want = max(totals, key=totals.get)
        res = prefix_beam_search(logprobs, ABC, beam_width=40)
        got_raw = tuple(ABC.encode(res[0][0]))
        assert got_raw == want, (trial, res[0], ABC.decode(want))
        # score agrees with the exact alignment sum for that sequence
        np.testing.assert_allclose(res[0][1], totals[want], rtol=1e-5)


def test_device_beam_matches_host():
    rng = np.random.RandomState(1)
    b, t, c = 3, 12, 5
    logits = rng.randn(b, t, c).astype(np.float32) * 2
    lengths = np.array([12, 9, 5], np.int32)
    logprobs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))

    dev = DeviceBeamDecoder(ABC, beam_width=8)
    got = dev.decode(jnp.asarray(logits), jnp.asarray(lengths))
    for i in range(b):
        res = prefix_beam_search(logprobs[i, : lengths[i]], ABC, beam_width=8)
        assert got[i].strip() == res[0][0].strip(), (i, got[i], res[:2])


def test_beam_beats_greedy_when_mass_splits():
    """Classic case: greedy picks a path, beam sums over alignments."""
    # two frames: P(a)=0.4,P(blank)=0.6 each frame =>
    # greedy: blank-blank -> ""; but P("a") = 0.4*0.6+0.6*0.4+0.4*0.4=0.64
    lp = np.log(np.array([[0.6, 0.4, 1e-9, 1e-9, 1e-9],
                          [0.6, 0.4, 1e-9, 1e-9, 1e-9]]))
    lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
    res = prefix_beam_search(lp, ABC, beam_width=8)
    assert res[0][0] == "A"


def test_lm_fusion_prefers_lm_words(tmp_path):
    lm = train_ngram(["AB", "AB AB", "AB"], order=2)
    p = str(tmp_path / "lm.arpa")
    lm.save(p)
    loaded = ArpaLM.load(p)
    # ambiguous first char: "AB" vs "CB"; the LM only knows the word AB
    probs = np.full((3, 5), 1e-6)
    probs[0, 1] = 0.49; probs[0, 4] = 0.51  # A vs C (C slightly ahead)
    probs[1, 2] = 1.0  # B
    probs[2, 3] = 1.0  # space triggers word scoring
    lp = np.log(probs / probs.sum(-1, keepdims=True))
    no_lm = prefix_beam_search(lp, ABC, beam_width=8)
    with_lm = prefix_beam_search(lp, ABC, beam_width=8, lm=loaded,
                                 alpha=2.0, beta=0.0)
    assert no_lm[0][0].startswith("CB")
    assert with_lm[0][0].startswith("AB")


def test_arpa_roundtrip(tmp_path):
    lm = train_ngram(["AB C AB", "C C AB"], order=3)
    p = str(tmp_path / "lm.arpa")
    lm.save(p)
    loaded = ArpaLM.load(p)
    for w, ctx in [("AB", ("<s>",)), ("C", ("AB",)), ("AB", ("C", "C"))]:
        np.testing.assert_allclose(
            loaded.score_word(ctx, w), lm.score_word(ctx, w), rtol=1e-5
        )
    # probabilities over seen vocab are sane
    s = sum(10 ** lm.score_word(("<s>",), w) for w in ["AB", "C", "</s>", "<unk>"])
    assert s <= 1.5


def test_beam_ctc_decoder_api():
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(2, 6, 5).astype(np.float32))
    lengths = jnp.asarray(np.array([6, 4], np.int32))
    dec = BeamCTCDecoder(ABC, beam_width=4)
    texts = dec.decode(logits, lengths)
    assert len(texts) == 2
    assert all(isinstance(t, str) for t in texts)


def test_device_beam_with_char_lm():
    """Char-LM fusion disambiguates same-length alternatives: 'AB' vs
    'CB' with C slightly ahead acoustically; the LM only knows A-B."""
    lm = train_ngram([" ".join(list("AB")), " ".join(list("AB"))], order=2)
    probs = np.full((2, 5), 1e-6)
    probs[0, 1] = 0.49; probs[0, 4] = 0.51  # A vs C, C ahead
    probs[1, 2] = 1.0  # B
    lp = np.log(probs / probs.sum(-1, keepdims=True)).astype(np.float32)
    dev_no = DeviceBeamDecoder(ABC, beam_width=6)
    dev_lm = DeviceBeamDecoder(ABC, beam_width=6, char_lm=lm, alpha=0.5)
    out_no = dev_no.decode(jnp.asarray(lp[None]), jnp.asarray([2]))
    out_lm = dev_lm.decode(jnp.asarray(lp[None]), jnp.asarray([2]))
    assert out_no[0] == "CB"
    assert out_lm[0] == "AB"
