"""KenLM binary (probing) format: writer/reader roundtrip, scoring
parity with the ARPA oracle, decoder integration, and clear failures
for unsupported combinations (SURVEY.md §3.2 KenLM row)."""

import numpy as np
import pytest

from tpuasr.decode.lm import ArpaLM, load_lm, train_ngram
from tpuasr.decode.lm_binary import (
    KenlmBinaryLM,
    load_kenlm_binary,
    murmur_hash64a,
    write_kenlm_binary,
)
from tpuasr.labels import Alphabet

ABC = Alphabet(labels="_AB C")

LINES = ["AB C AB", "C AB", "AB AB C", "C C AB B", "B AB C", "AB"]


def test_murmur_known_properties():
    # deterministic, length-sensitive, seed-sensitive
    a = murmur_hash64a(b"hello")
    assert a == murmur_hash64a(b"hello")
    assert a != murmur_hash64a(b"hello!")
    assert a != murmur_hash64a(b"hello", seed=1)
    assert 0 <= a < 2**64


def test_binary_roundtrip_scores_match_arpa(tmp_path):
    lm = train_ngram(LINES, order=3)
    path = str(tmp_path / "lm.binary")
    write_kenlm_binary(lm, path)
    loaded = load_lm(path)  # magic-dispatched
    assert isinstance(loaded, KenlmBinaryLM)
    assert loaded.order == 3

    contexts = [(), ("<s>",), ("AB",), ("C", "AB"), ("<s>", "AB"),
                ("ZZZ",), ("C", "ZZZ")]
    words = ["AB", "C", "B", "ZZZ", "</s>"]
    for ctx in contexts:
        for w in words:
            want = lm.score_word(ctx, w)
            got = loaded.score_word(ctx, w)
            np.testing.assert_allclose(
                got, want, rtol=1e-5, atol=1e-5,
                err_msg=f"ctx={ctx} word={w}",
            )
    # sequence scoring too
    np.testing.assert_allclose(
        loaded.score_sequence(["AB", "C", "AB"]),
        lm.score_sequence(["AB", "C", "AB"]), rtol=1e-5,
    )


def test_binary_lm_in_host_beam(tmp_path):
    """BeamCTCDecoder accepts a binary lm_path (reference users pass
    lm.binary artifacts) and prefers LM words, same as ARPA."""
    from tpuasr.decode.beam_host import BeamCTCDecoder

    import jax.numpy as jnp

    lm = train_ngram(["AB", "AB AB", "AB"], order=2)
    path = str(tmp_path / "lm.binary")
    write_kenlm_binary(lm, path)

    probs = np.full((3, 5), 1e-6)
    probs[0, 1] = 0.49; probs[0, 4] = 0.51  # A vs C (C slightly ahead)
    probs[1, 2] = 1.0  # B
    probs[2, 3] = 1.0  # space
    logits = np.log(probs / probs.sum(-1, keepdims=True)).astype(np.float32)
    dec = BeamCTCDecoder(ABC, lm_path=path, alpha=2.0, beta=0.0,
                         beam_width=8)
    texts = dec.decode(jnp.asarray(logits[None]), jnp.asarray([3]))
    assert texts[0].startswith("AB")


def test_binary_rejected_where_unsupported(tmp_path):
    lm = train_ngram(LINES, order=2)
    path = str(tmp_path / "lm.binary")
    write_kenlm_binary(lm, path)
    loaded = load_kenlm_binary(path)

    from tpuasr.decode.beam import DeviceBeamDecoder

    with pytest.raises(ValueError, match="ARPA"):
        DeviceBeamDecoder(ABC, word_lm=loaded, alpha=1.0)


def test_binary_bad_magic_and_type_errors(tmp_path):
    p = tmp_path / "x.binary"
    p.write_bytes(b"not an lm")
    with pytest.raises(ValueError, match="magic"):
        load_kenlm_binary(str(p))

    lm = train_ngram(LINES, order=2)
    good = str(tmp_path / "lm.binary")
    write_kenlm_binary(lm, good)
    blob = bytearray(open(good, "rb").read())
    blob[88 + 8] = 2  # model_type -> TRIE
    bad = tmp_path / "trie.binary"
    bad.write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="not supported"):
        load_kenlm_binary(str(bad))
