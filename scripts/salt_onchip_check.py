"""On-chip validation: salted-home wide-table word-LM parity.

Round 5 replaced the salted home remix with the full-avalanche murmur3
fmix32 finalizer (decode/beam.py `_np_home`/`_home`, ops/beam.py query
remix) after round 4 shipped a one-round remix that could not diffuse
high key bits (red test at r4 HEAD). The interpreter-mode test
(tests/test_pallas_beam.py::test_kernel_word_lm_wide_salted_matches_xla)
proves packer/XLA/kernel consistency on CPU; THIS script proves the
compiled Mosaic kernel agrees on real TPU hardware, where bf16 plane
compares and the one-hot MXU fetch actually run.

Forces every table to a nonzero salt (single-entry _PACK_SALTS) and a
tiny MAX_KERNEL_WORD_CAP so the LM routes through WideTables, then
compares n-best texts + scores between impl='pallas' and impl='xla'.

Prints one JSON line {"ok": true/false, ...}; exit 0 iff ok.
"""
from __future__ import annotations

import json
import sys

import numpy as np


def main() -> int:
    import jax.numpy as jnp

    import tpuasr.decode.beam as beam_mod
    from tpuasr.decode.beam import DeviceBeamDecoder
    from tpuasr.decode.lm import train_ngram
    from tpuasr.labels import Alphabet

    beam_mod._PACK_SALTS = (5,)  # force the salted home path
    DeviceBeamDecoder.MAX_KERNEL_WORD_CAP = 2  # force WideTables

    alphabet = Alphabet()
    corpus = ["ALO MUNDO BOM DIA", "TUDO BEM ALO", "BOM DIA MUNDO",
              "ALO ALO MUNDO", "DIA BOM TUDO BEM", "MUNDO BOM"]
    lm = train_ngram(corpus, order=3)
    rng = np.random.RandomState(23)
    b, t, c = 8, 24, alphabet.size  # B multiple of 8 (wide sublane tile)
    logits = jnp.asarray(rng.randn(b, t, c).astype(np.float32) * 2)
    lengths = jnp.asarray(
        np.array([24, 20, 16, 12, 24, 9, 24, 5], np.int32))

    pal = DeviceBeamDecoder(alphabet, beam_width=6, word_lm=lm,
                            alpha=1.2, beta=0.5, impl="pallas")
    xla = DeviceBeamDecoder(alphabet, beam_width=6, word_lm=lm,
                            alpha=1.2, beta=0.5, impl="xla")
    salts = tuple(int(s) for s in pal._word_tables.salts)
    assert all(s == 5 for s in salts), salts

    got_p = pal.decode_nbest(logits, lengths)
    got_x = xla.decode_nbest(logits, lengths)
    assert pal._word_wide is not None and pal._word_wide.salts

    mismatches = []
    max_dscore = 0.0
    for i in range(b):
        tp = [r[0] for r in got_p[i]]
        tx = [r[0] for r in got_x[i]]
        if tp != tx:
            mismatches.append({"utt": i, "pallas": tp, "xla": tx})
        for rp, rx in zip(got_p[i], got_x[i]):
            max_dscore = max(max_dscore, abs(float(rp[1]) - float(rx[1])))
    ok = not mismatches and max_dscore < 2e-3
    print(json.dumps({
        "ok": ok, "salts": salts, "max_score_delta": round(max_dscore, 6),
        "mismatches": mismatches,
        "caps": [int(k.shape[0]) for k in pal._word_tables.keys1],
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
