from tpuasr.labels import Alphabet, PTBR_LABELS
from tpuasr.decode.metrics import ErrorRateMeter, cer, levenshtein, wer


def test_alphabet_roundtrip():
    a = Alphabet()
    assert a.blank_id == 0
    assert a.size == len(PTBR_LABELS)
    ids = a.encode("olá mundo")
    assert a.decode(ids) == "OLÁ MUNDO"
    # unknown chars dropped (reference parse_transcript behavior)
    assert a.decode(a.encode("a@b#c")) == "ABC"


def test_alphabet_json_roundtrip(tmp_path):
    a = Alphabet()
    p = tmp_path / "labels.json"
    p.write_text(a.to_json(), encoding="utf-8")
    b = Alphabet.from_json_file(str(p))
    assert b.labels == a.labels


def test_levenshtein_cases():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "abc") == 0
    assert levenshtein(["a", "b"], ["b"]) == 1


def test_wer_cer():
    assert wer("a b c", "a b c") == 0.0
    assert wer("a x c", "a b c") == 1 / 3
    assert cer("abc", "abd") == 1 / 3


def test_meter_aggregation():
    m = ErrorRateMeter()
    m.update("a b", "a b")
    m.update("x", "a")
    # 0 + 1 word errors over 3 reference words
    assert abs(m.wer - 100.0 / 3) < 1e-9


def test_levenshtein_native_matches_numpy_and_bruteforce():
    """Native C++ path == NumPy accumulate-trick path == brute force."""
    import itertools
    import random

    import tpuasr.decode.metrics as M

    def brute(a, b):
        # classic full-table DP, the obvious oracle
        na, nb = len(a), len(b)
        d = [[0] * (nb + 1) for _ in range(na + 1)]
        for i in range(na + 1):
            d[i][0] = i
        for j in range(nb + 1):
            d[0][j] = j
        for i in range(1, na + 1):
            for j in range(1, nb + 1):
                d[i][j] = min(d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                              d[i - 1][j] + 1, d[i][j - 1] + 1)
        return d[na][nb]

    rng = random.Random(0)
    cases = [("", ""), ("a", ""), ("", "abc"), ("kitten", "sitting"),
             ("ação", "acao")]
    for _ in range(20):
        n1, n2 = rng.randint(0, 12), rng.randint(0, 12)
        cases.append(("".join(rng.choice("abcá ") for _ in range(n1)),
                      "".join(rng.choice("abcá ") for _ in range(n2))))
    native = M._load_native()
    for a, b in cases:
        want = brute(a, b)
        got = M.levenshtein(a, b)
        assert got == want, (a, b, got, want)
        if native:  # force the NumPy fallback and compare
            M._native_dist = False
            assert M.levenshtein(a, b) == want, (a, b)
            M._native_dist = native
    # word-list mode (WER path)
    assert M.levenshtein("ola mundo bom".split(), "ola bom".split()) == 1
    assert M.levenshtein([], "a b".split()) == 2
