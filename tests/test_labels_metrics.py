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
