"""Generate an LM training text whose n-gram tables are WIDE.

The synth eval corpus has a tiny vocabulary, so an LM trained on its
transcripts alone gets small hash tables and the fused beam kernel
takes the cheap full-table-compare path. To exercise the round-4
block-fetch WideTables path (chunked >=262144-cap orders) through the
REAL `tpuasr.cli.train_lm` + `cli.test --decoder beam-device` stack,
this helper emits:

  - every transcript of the given manifest, repeated --repeat times
    (so real corpus n-grams keep dominant probability mass), plus
  - --lines synthetic sentences of 4-7 words drawn from a --vocab-size
    random word list (so unigram AND bigram/trigram entry counts grow
    past 65536/order -> caps 262144 at load 0.5).

Usage:
  python scripts/make_wide_lm_text.py --manifest corpus/train.csv \
      --out lm_text.txt [--vocab-size 50000] [--lines 40000]
"""
from __future__ import annotations

import argparse

import numpy as np

ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--vocab-size", type=int, default=50000)
    ap.add_argument("--lines", type=int, default=40000)
    ap.add_argument("--repeat", type=int, default=20,
                    help="times each real transcript is emitted")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    rng = np.random.RandomState(args.seed)
    real = []
    with open(args.manifest, encoding="utf-8") as f:
        for line in f:
            txt_path = line.rstrip("\n").split(",")[1]
            with open(txt_path, encoding="utf-8") as t:
                real.append(t.read().strip().upper())

    # distinct pronounceable-ish random words, 5-9 chars
    vocab = set()
    while len(vocab) < args.vocab_size:
        n = rng.randint(5, 10)
        vocab.add("".join(ALPHA[i] for i in rng.randint(0, 26, size=n)))
    vocab = sorted(vocab)

    with open(args.out, "w", encoding="utf-8") as f:
        for _ in range(args.repeat):
            f.writelines(s + "\n" for s in real)
        for _ in range(args.lines):
            k = rng.randint(4, 8)
            idx = rng.randint(0, len(vocab), size=k)
            f.write(" ".join(vocab[i] for i in idx) + "\n")
    print(f"wrote {args.out}: {len(real)} real x {args.repeat} + "
          f"{args.lines} synthetic lines, vocab {len(vocab)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
