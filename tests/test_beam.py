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


def test_train_ngram_is_normalized():
    """train_ngram is a real lmplz replacement: P(.|h) sums to 1 for
    every context (exact Katz backoff weights), not just 'sane'."""
    lines = ["AB C AB", "C C AB", "AB AB", "C AB C AB", "AB"]
    lm = train_ngram(lines, order=3)
    vocab = sorted(lm.vocab)  # includes <unk> and </s>, not <s>
    assert "<unk>" in vocab and "</s>" in vocab and "<s>" not in vocab
    contexts = [(), ("<s>",), ("AB",), ("C",), ("<unk>",),
                ("<s>", "AB"), ("AB", "C"), ("C", "AB"), ("C", "C"),
                ("ZZZ",), ("AB", "ZZZ")]
    for ctx in contexts:
        s = sum(10 ** lm.score_word(ctx, w) for w in vocab)
        np.testing.assert_allclose(s, 1.0, rtol=1e-6,
                                   err_msg=f"ctx={ctx} sum={s}")


def test_beam_ctc_decoder_api():
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(2, 6, 5).astype(np.float32))
    lengths = jnp.asarray(np.array([6, 4], np.int32))
    dec = BeamCTCDecoder(ABC, beam_width=4)
    texts = dec.decode(logits, lengths)
    assert len(texts) == 2
    assert all(isinstance(t, str) for t in texts)


def test_device_word_lm_matches_host():
    """Word-level shallow fusion on device vs the host oracle: same
    top-1 text AND total score (CTC mass + alpha*LM + beta bonuses,
    including the final partial-word close) on randomized inputs."""
    rng = np.random.RandomState(3)
    corpus = ["AB C AB", "C AB", "AB AB C", "C C AB", "AB"]
    lm = train_ngram(corpus, order=2)

    for trial in range(4):
        t = int(rng.randint(6, 14))
        logits = rng.randn(1, t, 5).astype(np.float32) * 2
        lengths = np.array([t], np.int32)
        logprobs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))

        dev = DeviceBeamDecoder(ABC, beam_width=8, word_lm=lm,
                                alpha=1.2, beta=0.5)
        store, toff, blen, scores = dev._run(jnp.asarray(logits),
                                             jnp.asarray(lengths))
        got_text = ABC.decode(store[0, 0, : blen[0, 0]]).strip()
        # host applies alpha*LN10*score_word(log10); the device packs
        # natural-log values and applies alpha — same effective weight.
        res = prefix_beam_search(logprobs[0], ABC, beam_width=8, lm=lm,
                                 alpha=1.2, beta=0.5)
        assert got_text == res[0][0].strip(), (trial, got_text, res[:3])
        np.testing.assert_allclose(scores[0, 0], res[0][1],
                                   rtol=1e-3, atol=1e-3)


def test_device_cutoffs_match_host():
    """cutoff_top_n / cutoff_prob pruning parity with the host oracle."""
    rng = np.random.RandomState(4)
    for trial in range(4):
        t = int(rng.randint(5, 12))
        logits = rng.randn(1, t, 5).astype(np.float32) * 2.5
        logprobs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
        dev = DeviceBeamDecoder(ABC, beam_width=8, cutoff_top_n=3,
                                cutoff_prob=0.92)
        got = dev.decode(jnp.asarray(logits), jnp.asarray([t]))
        res = prefix_beam_search(logprobs[0], ABC, beam_width=8,
                                 cutoff_top_n=3, cutoff_prob=0.92)
        assert got[0].strip() == res[0][0].strip(), (trial, got, res[:3])


def test_device_nbest_and_offsets():
    """n-best output is deduped/best-first; offsets index the emitting
    frames of the decoded string."""
    probs = np.full((4, 5), 1e-6)
    probs[0, 0] = 1.0  # blank
    probs[1, 1] = 0.9; probs[1, 4] = 0.1  # A (vs C)
    probs[2, 0] = 1.0  # blank
    probs[3, 2] = 1.0  # B
    lp = np.log(probs / probs.sum(-1, keepdims=True)).astype(np.float32)
    dev = DeviceBeamDecoder(ABC, beam_width=4)
    texts, offsets = dev.decode(jnp.asarray(lp[None]), jnp.asarray([4]),
                                return_offsets=True)
    assert texts[0] == "AB"
    assert offsets[0].tolist() == [1, 3]
    nbest = dev.decode_nbest(jnp.asarray(lp[None]), jnp.asarray([4]))
    assert nbest[0][0][0] == "AB"
    assert len({t for t, _, _ in nbest[0]}) == len(nbest[0])
    scores = [s for _, s, _ in nbest[0]]
    assert scores == sorted(scores, reverse=True)
    assert "CB" in [t for t, _, _ in nbest[0]]


def test_char_lm_device_scores_match_arpa():
    """Randomized parity: the hashed device char-LM (backoff chain over
    open-addressed tables) reproduces ArpaLM.score_word for in-vocab
    chars across context lengths 0..order-1."""
    from tpuasr.decode.beam import _char_lm_scores, pack_lm_tables

    lines = ["A B C A B", "B C A", "A B A B C", "C A B", "B B C A"]
    lm = train_ngram(lines, order=3)
    tables = pack_lm_tables(lm, ABC)
    ln10 = math.log(10.0)
    vocab_ids = [1, 2, 4]  # A, B, C
    k_ctx = tables.order - 1
    rng = np.random.RandomState(5)
    ctxs = []
    for n_ctx in [0, 1, 2, 2, 1, 0, 2]:
        real = [int(rng.choice(vocab_ids)) for _ in range(n_ctx)]
        ctxs.append([0] * (k_ctx - n_ctx) + real)  # zero-padded like the beam
    dev = np.asarray(_char_lm_scores(tables, jnp.asarray(ctxs, jnp.int32), 5))
    for w, ctx in enumerate(ctxs):
        host_ctx = tuple(ABC.labels[i] for i in ctx if i != 0)
        for c in vocab_ids:
            want = lm.score_word(host_ctx, ABC.labels[c]) * ln10
            np.testing.assert_allclose(
                dev[w, c], want, rtol=1e-4, atol=1e-4,
                err_msg=f"ctx={host_ctx} char={ABC.labels[c]}"
            )


def test_pack_tables_never_drop():
    """Adversarially dense LMs must pack with zero dropped entries —
    every n-gram findable within the device probe budget."""
    from tpuasr.decode.beam import (
        pack_word_lm_tables, word_token_hash, _np_fold_tokens,
    )

    rng = np.random.RandomState(6)
    words = set()
    while len(words) < 300:
        n = rng.randint(1, 6)
        words.add("".join("ABC"[rng.randint(3)] for _ in range(n)))
    lines = [
        " ".join(rng.choice(sorted(words), size=rng.randint(2, 6)))
        for _ in range(200)
    ]
    lm = train_ngram(lines, order=2)
    tables = pack_word_lm_tables(lm, ABC)
    n_checked = 0
    for k, table in enumerate(lm.ngrams):
        k1 = np.asarray(tables.keys1[k])
        k2 = np.asarray(tables.keys2[k])
        cap = len(k1)
        for toks, _ in table.items():
            pairs = [word_token_hash(t, ABC) for t in toks]
            if any(p is None for p in pairs):
                continue
            h1, h2 = _np_fold_tokens(pairs)
            if h1 == 0 and h2 == 0:
                continue
            from tpuasr.decode.beam import _np_home
            slot = _np_home(h1, cap, tables.salts[k])
            found = False
            for _ in range(tables.n_probes):
                if k1[slot] == h1 and k2[slot] == h2:
                    found = True
                    break
                slot = (slot + 1) % cap
            assert found, (k, toks)
            n_checked += 1
    assert n_checked > 400  # unigrams + bigrams actually exercised


def test_pack_table_matching_beats_greedy():
    """Window placement is a bipartite matching, not greedy insertion
    (round 4): a key placed mid-window can be re-arranged within its
    OWN window to make room, instead of doubling the table. This
    construction defeats greedy — key X (home 4) squats slot 4, then
    8 keys with home 0 need all of [0, 8) — but a perfect matching
    exists at the minimum capacity (16 for 9 keys at load <= 0.8)."""
    from tpuasr.decode.beam import _pack_table

    items = [(np.uint32(16 + 4), np.uint32(1), -1.0, 0.0)]  # home 4
    items += [(np.uint32(16 * (k + 2)), np.uint32(k + 1), -2.0 - k, 0.0)
              for k in range(8)]  # homes 0
    k1, k2, lp, bo, salt = _pack_table(items, n_probes=8)
    cap = int(k1.shape[0])
    assert cap == 16, f"matching failed to place at min cap (cap={cap})"
    assert salt == 0  # solvable at the historical salt-0 homes
    k1, k2 = np.asarray(k1), np.asarray(k2)
    lp = np.asarray(lp)
    for h1, h2, l, _ in items:
        idx = (int(h1) % cap + np.arange(8)) % cap
        hits = (k1[idx] == h1) & (k2[idx] == h2)
        assert hits.sum() == 1, (h1, h2)
        assert lp[idx[hits][0]] == np.float32(l)


def test_pack_table_salted_rescues_low_bit_clusters():
    """9+ keys whose h1 share ALL low bits have the same home at EVERY
    power-of-two capacity under the salt-0 rule (h1 % cap) — doubling
    can never separate them (pre-salt packers looped toward absurd
    capacities). A nonzero salt re-mixes the homes and packs at the
    load-0.8 floor; every key must stay findable within the probe
    window of its SALTED home (the rule _probe / _wprobe_wide apply)."""
    from tpuasr.decode.beam import _np_home, _pack_table

    items = [(np.uint32((k + 1) << 26), np.uint32(k + 1), -1.0 - k, 0.0)
             for k in range(12)]  # homes all 0 at any cap <= 2**26
    k1, k2, lp, bo, salt = _pack_table(items, n_probes=8)
    cap = int(k1.shape[0])
    assert cap == 16, f"salting failed to place at min cap (cap={cap})"
    assert salt != 0
    k1, k2, lp = np.asarray(k1), np.asarray(k2), np.asarray(lp)
    for h1, h2, l, _ in items:
        idx = (_np_home(h1, cap, salt) + np.arange(8)) % cap
        hits = (k1[idx] == h1) & (k2[idx] == h2)
        assert hits.sum() == 1, (h1, h2)
        assert lp[idx[hits][0]] == np.float32(l)


def test_salted_home_sites_bit_identical_and_avalanche():
    """The packer's NumPy home (`_np_home`), the XLA probe's traced
    home (`_home`), and the Pallas kernel's query remix (ops.beam
    imports `_fmix32` from decode.beam) must agree bit for bit, and
    the salted remix must avalanche HIGH key bits into LOW home bits
    (the round-4 one-round remix couldn't — red test at r4 HEAD)."""
    import jax.numpy as jnp

    from tpuasr.decode.beam import _fmix32, _home, _np_fmix32, _np_home

    rng = np.random.RandomState(7)
    keys = np.concatenate([
        rng.randint(0, 2**32, size=256, dtype=np.uint64).astype(np.uint32),
        # high-bit-only cluster: identical low 26 bits
        (np.arange(1, 33, dtype=np.uint32) << 26),
        np.uint32([0, 1, 0x80000000, 0xFFFFFFFF]),
    ])
    for salt in (0, 1, 2, 3, 5, 9):
        for cap in (8, 16, 1 << 12):
            np_homes = np.array(
                [_np_home(k, cap, salt) for k in keys], np.int32)
            tr_homes = np.asarray(_home(jnp.asarray(keys), cap, salt))
            np.testing.assert_array_equal(np_homes, tr_homes)
    # traced fmix32 == numpy fmix32 (the kernel remix is fmix32(q^salt))
    np.testing.assert_array_equal(
        np.array([_np_fmix32(k) for k in keys], np.uint32),
        np.asarray(_fmix32(jnp.asarray(keys))),
    )
    # avalanche: a 32-key cluster differing only in bits >= 26 must
    # spread over a 16-slot table at some small salt (binomial: all-
    # one-slot is ~16^-31 per salt if homes are uniform)
    spreads = [
        len({_np_home(k, 16, s) for k in (np.arange(1, 33) << 26)
             .astype(np.uint32)}) for s in (1, 2, 3, 5, 9)
    ]
    assert max(spreads) >= 8, spreads


def test_pack_table_cap_floors_at_probe_window():
    """cap < n_probes would wrap the probe window onto itself and the
    lookup's masked sum would double-count the hit slot — capacity must
    floor at n_probes even for one-entry tables."""
    from tpuasr.decode.beam import _pack_table

    k1, _, _, _, _ = _pack_table(
        [(np.uint32(3), np.uint32(7), -1.0, 0.0)], n_probes=8)
    assert int(k1.shape[0]) >= 8


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
