"""Fused Pallas beam-search kernel vs the XLA scan implementation.

The kernel (tpuasr/ops/beam.py) must reproduce the XLA device beam
(decode/beam.py) frame-for-frame: same candidates, same exact dedup,
same lax.top_k tie-breaking — so the comparison here is on decoded
text AND scores, across random logits, ragged lengths, and the
ctcdecode cutoff knobs. Interpreter mode (no TPU needed on CI/CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpuasr.ops.beam as beam_ops
from tpuasr.decode.beam import DeviceBeamDecoder
from tpuasr.labels import Alphabet

ABC = Alphabet(labels="_AB C")  # blank, A, B, space, C


@pytest.fixture(autouse=True)
def _interpret():
    beam_ops.INTERPRET = True
    yield
    beam_ops.INTERPRET = False


def _decoders(**kw):
    return (DeviceBeamDecoder(ABC, impl="pallas", **kw),
            DeviceBeamDecoder(ABC, impl="xla", **kw))


def test_kernel_matches_xla_random():
    rng = np.random.RandomState(7)
    b, t, c = 4, 12, 5
    logits = jnp.asarray(rng.randn(b, t, c).astype(np.float32) * 2)
    lengths = jnp.asarray(np.array([12, 9, 5, 1], np.int32))
    pal, xla = _decoders(beam_width=8)
    got_p, sc_p = pal.decode_nbest(logits, lengths), None
    got_x = xla.decode_nbest(logits, lengths)
    for i in range(b):
        # top-1 text and score must agree exactly
        assert got_p[i][0][0] == got_x[i][0][0], (i, got_p[i], got_x[i])
        np.testing.assert_allclose(got_p[i][0][1], got_x[i][0][1],
                                   rtol=1e-5, atol=1e-5)
        # full deduped n-best lists agree (same search, same dedup)
        texts_p = [r[0] for r in got_p[i]]
        texts_x = [r[0] for r in got_x[i]]
        assert texts_p == texts_x, (i, texts_p, texts_x)
        for rp, rx in zip(got_p[i], got_x[i]):
            np.testing.assert_allclose(rp[1], rx[1], rtol=1e-5, atol=1e-5)


def test_kernel_matches_xla_under_cutoffs():
    rng = np.random.RandomState(3)
    b, t, c = 3, 10, 5
    logits = jnp.asarray(rng.randn(b, t, c).astype(np.float32) * 3)
    lengths = jnp.asarray(np.array([10, 7, 4], np.int32))
    for kw in (
        dict(beam_width=6, cutoff_top_n=3),
        dict(beam_width=6, cutoff_prob=0.9),
        dict(beam_width=6, cutoff_top_n=4, cutoff_prob=0.8,
             prune_logp=-3.0),
    ):
        pal, xla = _decoders(**kw)
        tp = pal.decode(logits, lengths)
        tx = xla.decode(logits, lengths)
        assert tp == tx, (kw, tp, tx)


def test_kernel_offsets_match_xla():
    rng = np.random.RandomState(11)
    b, t, c = 2, 9, 5
    logits = jnp.asarray(rng.randn(b, t, c).astype(np.float32) * 2)
    lengths = jnp.asarray(np.array([9, 6], np.int32))
    pal, xla = _decoders(beam_width=5)
    tp, op = pal.decode(logits, lengths, return_offsets=True)
    tx, ox = xla.decode(logits, lengths, return_offsets=True)
    assert tp == tx
    for a, b_ in zip(op, ox):
        np.testing.assert_array_equal(a, b_)


def test_kernel_time_padding_invariance():
    """T not a multiple of the time chunk: padding frames must be inert."""
    rng = np.random.RandomState(5)
    b, t, c = 2, 11, 5  # 11 % 8 != 0
    logits = rng.randn(b, t, c).astype(np.float32)
    lengths = np.array([11, 3], np.int32)
    pal, xla = _decoders(beam_width=4)
    assert pal.decode(jnp.asarray(logits), jnp.asarray(lengths)) == \
        xla.decode(jnp.asarray(logits), jnp.asarray(lengths))


def test_impl_flag_validation():
    with pytest.raises(ValueError):
        DeviceBeamDecoder(ABC, impl="bogus")


def test_kernel_char_lm_matches_xla():
    """In-kernel dense-table char-LM fusion == XLA hashed-probe fusion
    (same scores by construction: the dense table is materialized
    through the same backoff recursion)."""
    from tpuasr.decode.lm import train_ngram

    # char-level LM: single-char tokens (the pack skips multi-char)
    lines = [" ".join(list(s)) for s in
             ["ABACAB", "CABBA", "BACBACABA", "ABCABA"]] * 4
    lm = train_ngram(lines, order=3)
    rng = np.random.RandomState(17)
    b, t, c = 3, 10, 5
    logits = jnp.asarray(rng.randn(b, t, c).astype(np.float32) * 2)
    lengths = jnp.asarray(np.array([10, 7, 4], np.int32))
    pal = DeviceBeamDecoder(ABC, beam_width=6, char_lm=lm, alpha=0.7,
                            beta=0.5, impl="pallas")
    xla = DeviceBeamDecoder(ABC, beam_width=6, char_lm=lm, alpha=0.7,
                            beta=0.5, impl="xla")
    got_p = pal.decode_nbest(logits, lengths)
    got_x = xla.decode_nbest(logits, lengths)
    for i in range(b):
        assert [r[0] for r in got_p[i]] == [r[0] for r in got_x[i]], (
            i, got_p[i], got_x[i])
        for rp, rx in zip(got_p[i], got_x[i]):
            np.testing.assert_allclose(rp[1], rx[1], rtol=1e-5, atol=1e-5)


def test_kernel_char_lm_order2():
    from tpuasr.decode.lm import train_ngram

    lm = train_ngram([" ".join(list(s)) for s in ["ABACAB", "BACABA"]] * 3,
                     order=2)
    rng = np.random.RandomState(18)
    logits = jnp.asarray(rng.randn(2, 8, 5).astype(np.float32) * 2)
    lengths = jnp.asarray(np.array([8, 5], np.int32))
    pal = DeviceBeamDecoder(ABC, beam_width=5, char_lm=lm, alpha=0.4,
                            impl="pallas")
    xla = DeviceBeamDecoder(ABC, beam_width=5, char_lm=lm, alpha=0.4,
                            impl="xla")
    assert pal.decode(logits, lengths) == xla.decode(logits, lengths)


def test_char_lm_order4_falls_back_to_xla():
    from tpuasr.decode.lm import train_ngram

    lm = train_ngram([" ".join(list("ABACABBACABA"))] * 4, order=4)
    dec = DeviceBeamDecoder(ABC, beam_width=4, char_lm=lm, alpha=0.5,
                            impl="auto")
    assert not dec._use_pallas()  # ctx space too big for a dense table


def test_kernel_word_lm_matches_xla():
    """In-kernel word-LM fusion (full-table-compare probes) == XLA
    hashed-probe fusion: same n-best texts and scores, including BOS
    context, OOV-as-<unk> substitution, backoff accumulation, and the
    final partial-word close."""
    from tpuasr.decode.lm import train_ngram

    corpus = ["AB C AB", "C AB", "AB AB C", "C C AB", "AB", "CA AB C"]
    lm = train_ngram(corpus, order=3)
    rng = np.random.RandomState(21)
    b, t, c = 3, 12, 5
    logits = jnp.asarray(rng.randn(b, t, c).astype(np.float32) * 2)
    lengths = jnp.asarray(np.array([12, 8, 5], np.int32))
    pal = DeviceBeamDecoder(ABC, beam_width=6, word_lm=lm, alpha=1.2,
                            beta=0.5, impl="pallas")
    xla = DeviceBeamDecoder(ABC, beam_width=6, word_lm=lm, alpha=1.2,
                            beta=0.5, impl="xla")
    assert pal._use_pallas() and not xla._use_pallas()
    got_p = pal.decode_nbest(logits, lengths)
    got_x = xla.decode_nbest(logits, lengths)
    for i in range(b):
        assert [r[0] for r in got_p[i]] == [r[0] for r in got_x[i]], (
            i, got_p[i], got_x[i])
        for rp, rx in zip(got_p[i], got_x[i]):
            np.testing.assert_allclose(rp[1], rx[1], rtol=1e-5, atol=1e-5)


def test_kernel_word_lm_order2():
    from tpuasr.decode.lm import train_ngram

    lm = train_ngram(["AB C", "C AB AB"] * 2, order=2)
    rng = np.random.RandomState(22)
    logits = jnp.asarray(rng.randn(2, 9, 5).astype(np.float32) * 2)
    lengths = jnp.asarray(np.array([9, 6], np.int32))
    pal = DeviceBeamDecoder(ABC, beam_width=5, word_lm=lm, alpha=0.8,
                            beta=0.3, impl="pallas")
    xla = DeviceBeamDecoder(ABC, beam_width=5, word_lm=lm, alpha=0.8,
                            beta=0.3, impl="xla")
    assert pal.decode(logits, lengths) == xla.decode(logits, lengths)


def test_kernel_word_lm_small_path_rolled_at_b64():
    """B >= 64 rolls the time loop on the SMALL full-compare path too
    (the unrolled B=128 small-path body never finished compiling
    on-chip inside 1 h — bench_runs/r4/40_eval_beam_b128_smallpath.log).
    Rolled must stay exact vs XLA at a batch past the threshold."""
    from tpuasr.decode.lm import train_ngram

    lm = train_ngram(["AB C", "C AB AB", "AB AB"] * 2, order=2)
    rng = np.random.RandomState(40)
    b, t, c = 64, 6, 5
    logits = jnp.asarray(rng.randn(b, t, c).astype(np.float32) * 2)
    lengths = jnp.asarray(rng.randint(2, t + 1, size=b).astype(np.int32))
    pal = DeviceBeamDecoder(ABC, beam_width=4, word_lm=lm, alpha=0.8,
                            beta=0.3, impl="pallas")
    xla = DeviceBeamDecoder(ABC, beam_width=4, word_lm=lm, alpha=0.8,
                            beta=0.3, impl="xla")
    assert pal._use_pallas()
    assert getattr(pal, "_word_wide", None) is None  # small path
    assert pal.decode(logits, lengths) == xla.decode(logits, lengths)


def test_explicit_pallas_with_unfusable_lm_raises():
    from tpuasr.decode.lm import train_ngram

    lm = train_ngram([" ".join(list("ABACABBACABA"))] * 4, order=4)
    dec = DeviceBeamDecoder(ABC, beam_width=4, char_lm=lm, alpha=0.5,
                            impl="pallas")
    with pytest.raises(ValueError, match="cannot fuse"):
        dec._use_pallas()


def test_wide_tables_reconstruct_hashed():
    """build_wide_word_tables: byte planes + hi/mid/lo value splits
    reconstruct every slot of the source HashedTables."""
    from tpuasr.decode.beam import (
        WIDE_LANES,
        WIDE_PLANES,
        build_wide_word_tables,
        pack_word_lm_tables,
    )
    from tpuasr.decode.lm import train_ngram

    lm = train_ngram(["AB C AB", "C AB", "AB AB C", "CA C AB"] * 3, order=3)
    tables = pack_word_lm_tables(lm, ABC)
    wide = build_wide_word_tables(tables)
    assert wide.order == tables.order and wide.n_probes == tables.n_probes
    for k in range(tables.order):
        cap = wide.caps[k]
        k1 = np.asarray(tables.keys1[k]).astype(np.uint32)
        k2 = np.asarray(tables.keys2[k]).astype(np.uint32)
        lp = np.asarray(tables.logps[k], np.float32)
        bo = np.asarray(tables.backoffs[k], np.float32)
        mat = np.asarray(wide.rows[k], np.float32).reshape(
            -1, WIDE_PLANES, WIDE_LANES
        )
        r_real = max(cap // 128, 1)
        assert mat.shape[0] >= 8  # sublane-tile padding (Mosaic concat)
        assert not mat[r_real:].any()  # padded rows are all-zero
        for r in range(r_real):
            for lane in range(WIDE_LANES):
                s = (r * 128 + lane) % cap
                got_k1 = sum(int(mat[r, i, lane]) << (8 * i)
                             for i in range(4))
                got_k2 = sum(int(mat[r, 4 + i, lane]) << (8 * i)
                             for i in range(4))
                assert got_k1 == int(k1[s]) and got_k2 == int(k2[s])
                if k1[s] or k2[s]:  # real entries: values reconstruct
                    np.testing.assert_allclose(
                        mat[r, 8:11, lane].sum(), lp[s], rtol=2e-5,
                        atol=1e-6)
                    np.testing.assert_allclose(
                        mat[r, 11:14, lane].sum(), bo[s], rtol=2e-5,
                        atol=1e-6)


def test_kernel_word_lm_wide_matches_xla(monkeypatch):
    """The block-fetch (large-vocabulary) word-LM path reproduces the
    XLA hashed-probe fusion: same n-best texts, scores to ~1e-4 (the
    3-way bf16 value splits). Forced by dropping the compare-path cap
    so the same LM routes through WideTables."""
    from tpuasr.decode.lm import train_ngram

    monkeypatch.setattr(DeviceBeamDecoder, "MAX_KERNEL_WORD_CAP", 2)
    corpus = ["AB C AB", "C AB", "AB AB C", "C C AB", "AB", "CA AB C"]
    lm = train_ngram(corpus, order=3)
    rng = np.random.RandomState(21)
    b, t, c = 3, 12, 5
    logits = jnp.asarray(rng.randn(b, t, c).astype(np.float32) * 2)
    lengths = jnp.asarray(np.array([12, 8, 5], np.int32))
    pal = DeviceBeamDecoder(ABC, beam_width=6, word_lm=lm, alpha=1.2,
                            beta=0.5, impl="pallas")
    xla = DeviceBeamDecoder(ABC, beam_width=6, word_lm=lm, alpha=1.2,
                            beta=0.5, impl="xla")
    assert pal._use_pallas()
    got_p = pal.decode_nbest(logits, lengths)
    assert pal._word_wide is not None  # the wide path actually ran
    got_x = xla.decode_nbest(logits, lengths)
    for i in range(b):
        assert [r[0] for r in got_p[i]] == [r[0] for r in got_x[i]], (
            i, got_p[i], got_x[i])
        for rp, rx in zip(got_p[i], got_x[i]):
            np.testing.assert_allclose(rp[1], rx[1], rtol=2e-4, atol=2e-4)


def test_kernel_word_lm_wide_salted_matches_xla(monkeypatch):
    """Salted home derivation (round 4: _pack_table re-salts before
    doubling) must stay consistent across the PACKER, the XLA `_probe`,
    and the kernel's `_wprobe_wide` slot math — force every table to a
    nonzero salt and re-run the wide parity scenario on both paths
    (a pack/probe salt mismatch turns every LM lookup into a miss,
    which shows up as text/score divergence here)."""
    import tpuasr.decode.beam as beam_mod
    from tpuasr.decode.lm import train_ngram

    monkeypatch.setattr(beam_mod, "_PACK_SALTS", (5,))
    monkeypatch.setattr(DeviceBeamDecoder, "MAX_KERNEL_WORD_CAP", 2)
    corpus = ["AB C AB", "C AB", "AB AB C", "C C AB", "AB", "CA AB C"]
    lm = train_ngram(corpus, order=3)
    rng = np.random.RandomState(23)
    b, t, c = 3, 11, 5
    logits = jnp.asarray(rng.randn(b, t, c).astype(np.float32) * 2)
    lengths = jnp.asarray(np.array([11, 8, 4], np.int32))
    pal = DeviceBeamDecoder(ABC, beam_width=6, word_lm=lm, alpha=1.2,
                            beta=0.5, impl="pallas")
    xla = DeviceBeamDecoder(ABC, beam_width=6, word_lm=lm, alpha=1.2,
                            beta=0.5, impl="xla")
    assert all(s == 5 for s in pal._word_tables.salts)
    got_p = pal.decode_nbest(logits, lengths)
    assert pal._word_wide is not None and pal._word_wide.salts
    got_x = xla.decode_nbest(logits, lengths)
    # the salted LM must also actually score: at least one utterance's
    # best text must differ from a no-LM decode
    plain = DeviceBeamDecoder(ABC, beam_width=6, impl="xla")
    got_0 = plain.decode_nbest(logits, lengths)
    assert any(got_x[i][0][0] != got_0[i][0][0]
               or abs(got_x[i][0][1] - got_0[i][0][1]) > 1e-6
               for i in range(b))
    for i in range(b):
        assert [r[0] for r in got_p[i]] == [r[0] for r in got_x[i]], (
            i, got_p[i], got_x[i])
        for rp, rx in zip(got_p[i], got_x[i]):
            np.testing.assert_allclose(rp[1], rx[1], rtol=2e-4, atol=2e-4)


def test_kernel_word_lm_wide_order2(monkeypatch):
    from tpuasr.decode.lm import train_ngram

    monkeypatch.setattr(DeviceBeamDecoder, "MAX_KERNEL_WORD_CAP", 2)
    lm = train_ngram(["AB C", "C AB AB"] * 2, order=2)
    rng = np.random.RandomState(22)
    logits = jnp.asarray(rng.randn(2, 9, 5).astype(np.float32) * 2)
    lengths = jnp.asarray(np.array([9, 6], np.int32))
    pal = DeviceBeamDecoder(ABC, beam_width=5, word_lm=lm, alpha=0.8,
                            beta=0.3, impl="pallas")
    xla = DeviceBeamDecoder(ABC, beam_width=5, word_lm=lm, alpha=0.8,
                            beta=0.3, impl="xla")
    assert pal.decode(logits, lengths) == xla.decode(logits, lengths)


def test_wide_bytes_gate():
    """A word LM whose wide tables exceed the VMEM budget falls back
    to the XLA path under impl='auto'."""
    from tpuasr.decode.lm import train_ngram

    lm = train_ngram(["AB C AB", "C AB"] * 2, order=2)
    dec = DeviceBeamDecoder(ABC, beam_width=4, word_lm=lm, alpha=0.5,
                            impl="auto")
    dec.MAX_KERNEL_WORD_CAP = 2
    dec.MAX_WIDE_BYTES = 16  # force the gate
    assert dec._kernel_lm_ineligible() is not None


def test_kernel_word_lm_wide_tiny_caps(monkeypatch):
    """Regression: a tiny word LM forced through the wide path (mixed
    caps — e.g. a real CLI run whose TRIGRAM cap crosses
    MAX_KERNEL_WORD_CAP while the unigram cap is 64, R=1 pre-padding)
    must still match XLA. On-chip, un-padded single-row orders made
    the one-hot compare emit (B, 1) lane-offset vectors whose sublane
    concat Mosaic rejects (bench_runs/r4/14_eval_beam_wide.log);
    build_wide_word_tables now pads every order to >= 8 rows."""
    from tpuasr.decode.beam import build_wide_word_tables
    from tpuasr.decode.lm import train_ngram

    monkeypatch.setattr(DeviceBeamDecoder, "MAX_KERNEL_WORD_CAP", 2)
    lm = train_ngram(["AB C AB", "C AB", "AB"] * 2, order=3)
    rng = np.random.RandomState(41)
    logits = jnp.asarray(rng.randn(2, 10, 5).astype(np.float32) * 2)
    lengths = jnp.asarray(np.array([10, 6], np.int32))
    pal = DeviceBeamDecoder(ABC, beam_width=5, word_lm=lm, alpha=0.9,
                            beta=0.4, impl="pallas")
    xla = DeviceBeamDecoder(ABC, beam_width=5, word_lm=lm, alpha=0.9,
                            beta=0.4, impl="xla")
    assert pal.decode(logits, lengths) == xla.decode(logits, lengths)
    assert all(int(m.shape[0]) >= 8 for m in pal._word_wide.rows)
    # the padding must not change capacity accounting
    wt = build_wide_word_tables(pal._word_tables)
    assert wt.caps == pal._word_wide.caps


def test_wide_multichunk_matches_xla(monkeypatch):
    """Orders whose block-fetch matrix exceeds MAX_WIDE_ROWS_PER_REF
    split into multiple row-chunk kernel inputs (the round-4 path for
    262144-cap tables): the chunked probe must reproduce the XLA
    hashed-probe fusion exactly. Forced by shrinking the per-ref row
    bound so a ~190-word LM (unigram cap 512, R=4) splits 4-ways."""
    import itertools

    from tpuasr.decode.lm import train_ngram

    monkeypatch.setattr(DeviceBeamDecoder, "MAX_KERNEL_WORD_CAP", 2)
    monkeypatch.setattr(beam_ops, "MAX_WIDE_ROWS_PER_REF", 1)
    # ~190 distinct words over {A, B, C} -> unigram table cap 512
    words = ["".join(p) for n in (2, 3, 4, 5)
             for p in itertools.product("ABC", repeat=n)][:190]
    rng = np.random.RandomState(31)
    corpus = [" ".join(rng.choice(words, size=4)) for _ in range(120)]
    lm = train_ngram(corpus, order=2)
    b, t, c = 2, 10, 5
    logits = jnp.asarray(rng.randn(b, t, c).astype(np.float32) * 2)
    lengths = jnp.asarray(np.array([10, 7], np.int32))
    pal = DeviceBeamDecoder(ABC, beam_width=5, word_lm=lm, alpha=1.0,
                            beta=0.4, impl="pallas")
    xla = DeviceBeamDecoder(ABC, beam_width=5, word_lm=lm, alpha=1.0,
                            beta=0.4, impl="xla")
    assert pal._use_pallas()
    got_p = pal.decode_nbest(logits, lengths)
    assert pal._word_wide is not None
    assert any(m.shape[0] > 1 for m in pal._word_wide.rows)  # did split
    got_x = xla.decode_nbest(logits, lengths)
    for i in range(b):
        assert [r[0] for r in got_p[i]] == [r[0] for r in got_x[i]], (
            i, got_p[i], got_x[i])
        for rp, rx in zip(got_p[i], got_x[i]):
            np.testing.assert_allclose(rp[1], rx[1], rtol=2e-4, atol=2e-4)


def test_stateful_chunks_match_batch_no_lm():
    """Streaming state carry: feeding T-frame chunks through stateful
    beam_scan_pallas with the state threaded across calls must emit
    bit-identical backpointers and final scores to ONE batch call over
    the concatenation (the device-resident incremental streaming beam
    rests on this)."""
    from tpuasr.ops.beam import beam_scan_pallas, make_beam_state

    rng = np.random.RandomState(11)
    b, t, c, w = 3, 24, 5, 6
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.randn(b, t, c).astype(np.float32) * 2), axis=-1)
    kw = dict(beam_width=w, blank_id=0, cutoff_top_n=40)
    full_len = jnp.asarray(np.array([24, 24, 24], np.int32))
    p0, c0, s0 = beam_scan_pallas(lp, full_len, **kw)

    state = make_beam_state(b, w)
    ps, cs = [], []
    scores = None
    for t0 in range(0, t, 8):
        pi, ci, scores, state = beam_scan_pallas(
            lp[:, t0:t0 + 8], jnp.asarray(np.full((b,), 8, np.int32)),
            state=state, return_state=True, **kw)
        ps.append(np.asarray(pi))
        cs.append(np.asarray(ci))
    np.testing.assert_array_equal(np.concatenate(ps, 1), np.asarray(p0))
    np.testing.assert_array_equal(np.concatenate(cs, 1), np.asarray(c0))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(s0),
                               rtol=1e-6, atol=1e-6)


def test_stateful_chunks_match_batch_word_lm():
    """Same chunked==batch contract WITH in-kernel word-LM fusion: the
    word state (hash stream, context ring, partial length) must carry
    across chunks, and each chunk's emitted scores must include the
    would-close-now word bonus (so the LAST chunk's scores equal the
    batch kernel's closed scores)."""
    from tpuasr.decode.beam import pack_word_lm_tables
    from tpuasr.decode.lm import train_ngram
    from tpuasr.ops.beam import beam_scan_pallas, make_beam_state

    corpus = ["AB C AB", "C AB", "AB AB C", "C C AB", "AB", "CA AB C"]
    lm = train_ngram(corpus, order=3)
    wt = pack_word_lm_tables(lm, ABC)
    rng = np.random.RandomState(13)
    b, t, c, w = 2, 16, 5, 5
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.randn(b, t, c).astype(np.float32) * 2), axis=-1)
    kw = dict(beam_width=w, blank_id=0, word_tables=wt, alpha=1.2,
              beta=0.5, space_id=ABC.space_id)
    full_len = jnp.asarray(np.array([16, 16], np.int32))
    p0, c0, s0 = beam_scan_pallas(lp, full_len, **kw)

    ring = max(1, wt.order - 1)
    state = make_beam_state(b, w, lm_mode="word", ring_len=ring)
    ps, cs = [], []
    scores = None
    for t0 in range(0, t, 8):
        pi, ci, scores, state = beam_scan_pallas(
            lp[:, t0:t0 + 8], jnp.asarray(np.full((b,), 8, np.int32)),
            state=state, return_state=True, **kw)
        ps.append(np.asarray(pi))
        cs.append(np.asarray(ci))
    np.testing.assert_array_equal(np.concatenate(ps, 1), np.asarray(p0))
    np.testing.assert_array_equal(np.concatenate(cs, 1), np.asarray(c0))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(s0),
                               rtol=1e-5, atol=1e-5)


def test_stateful_frozen_rows_keep_state():
    """A slot with length 0 in a tick (no data ready) must come out of
    the stateful call with its state AND scores untouched — the
    multi-stream engine relies on per-slot freezing."""
    from tpuasr.ops.beam import beam_scan_pallas, make_beam_state

    rng = np.random.RandomState(17)
    b, t, c, w = 2, 8, 5, 4
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.randn(b, t, c).astype(np.float32)), axis=-1)
    kw = dict(beam_width=w, blank_id=0)
    state = make_beam_state(b, w)
    # advance both rows once
    _, _, _, state = beam_scan_pallas(
        lp, jnp.asarray(np.array([8, 8], np.int32)),
        state=state, return_state=True, **kw)
    # row 1 frozen this tick
    lp2 = jax.nn.log_softmax(
        jnp.asarray(rng.randn(b, t, c).astype(np.float32)), axis=-1)
    _, ch, sc, state2 = beam_scan_pallas(
        lp2, jnp.asarray(np.array([8, 0], np.int32)),
        state=state, return_state=True, **kw)
    for f_old, f_new in zip(state, state2):
        np.testing.assert_array_equal(np.asarray(f_old)[1],
                                      np.asarray(f_new)[1])
    assert np.all(np.asarray(ch)[1] == -1)  # no chars emitted
