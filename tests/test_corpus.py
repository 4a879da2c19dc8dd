"""Corpus prep tests on synthetic layouts (no network in this env)."""

import numpy as np

from tpuasr.audio.io import load_audio, save_audio
from tpuasr.data.corpus import (
    normalize_transcript,
    prepare_cetuc,
    prepare_lapsbm,
    prepare_pairs,
    prepare_sid,
    prepare_spoltech,
    prepare_voxforge,
)
from tpuasr.data.manifest import read_manifest


def test_normalize_transcript():
    assert normalize_transcript("Olá, mundo!") == "OLÁ MUNDO"
    assert normalize_transcript("bom-dia;  tudo") == "BOM DIA TUDO"
    assert normalize_transcript("Olá", keep_accents=False) == "OLA"


def test_prepare_pairs_resamples(tmp_path):
    rng = np.random.RandomState(0)
    src = tmp_path / "src" / "spk1"
    src.mkdir(parents=True)
    # 8 kHz source -> must be resampled to 16 kHz
    save_audio(str(src / "a.wav"), rng.randn(8000) * 0.1, 8000)
    (src / "a.txt").write_text("Olá, mundo!")
    save_audio(str(src / "b.wav"), rng.randn(16000) * 0.1, 8000)
    (src / "b.txt").write_text("bom dia")

    out = tmp_path / "out"
    man = str(tmp_path / "man.csv")
    entries = prepare_pairs(str(tmp_path / "src"), str(out), man)
    assert len(entries) == 2
    back = read_manifest(man)
    durs = [e.duration for e in back]
    assert durs == sorted(durs)
    w = load_audio(back[0].wav_path)
    assert abs(len(w) - 16000) < 10  # 1 s at 16 kHz after resample
    assert back[0].read_transcript() == "OLÁ MUNDO"


def test_prepare_voxforge_layout(tmp_path):
    rng = np.random.RandomState(1)
    sess = tmp_path / "src" / "spk-20100101-abc"
    (sess / "wav").mkdir(parents=True)
    (sess / "etc").mkdir()
    save_audio(str(sess / "wav" / "pt-01.wav"), rng.randn(16000) * 0.1, 16000)
    save_audio(str(sess / "wav" / "pt-02.wav"), rng.randn(8000) * 0.1, 16000)
    (sess / "etc" / "PROMPTS").write_text(
        "spk-20100101-abc/mfc/pt-01 ola mundo\n"
        "spk-20100101-abc/mfc/pt-02 tudo bem\n"
        "spk-20100101-abc/mfc/pt-99 missing file\n"
    )
    out = tmp_path / "out"
    man = str(tmp_path / "man.csv")
    entries = prepare_voxforge(str(tmp_path / "src"), str(out), man)
    assert len(entries) == 2
    texts = sorted(e.read_transcript() for e in entries)
    assert texts == ["OLA MUNDO", "TUDO BEM"]


def _wav(path, n=4000, sr=16000, seed=0):
    save_audio(str(path), np.random.RandomState(seed).randn(n) * 0.1, sr)


def test_prepare_lapsbm_speaker_layout(tmp_path):
    # LapsBM1.4: LapsBM-F### / LapsBM-M### speaker dirs, paired wav/txt
    root = tmp_path / "LapsBM1.4"
    for spk, utt, text in [
        ("LapsBM-F004", "LapsBM_0004-01", "uma frase"),
        ("LapsBM-M001", "LapsBM_0001-01", "outra frase"),
    ]:
        d = root / spk
        d.mkdir(parents=True, exist_ok=True)
        _wav(d / f"{utt}.wav")
        (d / f"{utt}.txt").write_text(text)
    # stray unpaired wav must be ignored
    _wav(root / "LapsBM-F004" / "orphan.wav")
    out, man = tmp_path / "out", str(tmp_path / "man.csv")
    entries = prepare_lapsbm(str(root), str(out), man)
    assert len(entries) == 2
    stems = sorted(e.wav_path.split("/")[-1] for e in entries)
    # speaker id is preserved in the output stem
    assert stems == ["LapsBM-F004_LapsBM_0004-01.wav",
                     "LapsBM-M001_LapsBM_0001-01.wav"]


def test_prepare_lapsbm_fallback_to_pairs(tmp_path):
    # no LapsBM-* speaker dirs -> generic pair scan
    d = tmp_path / "flat"
    d.mkdir()
    _wav(d / "x.wav")
    (d / "x.txt").write_text("fala")
    entries = prepare_lapsbm(str(d), str(tmp_path / "out"),
                             str(tmp_path / "m.csv"))
    assert len(entries) == 1
    assert entries[0].read_transcript() == "FALA"


def test_prepare_cetuc_speaker_stems(tmp_path):
    # alcaim/<speaker>/<sentence>.wav|.txt — stem = speaker_sentence
    root = tmp_path / "alcaim"
    for spk in ("Adriano", "Beatriz"):
        d = root / spk
        d.mkdir(parents=True)
        _wav(d / "sent001.wav")
        (d / "sent001.txt").write_text("frase um")
    entries = prepare_cetuc(str(root), str(tmp_path / "out"),
                            str(tmp_path / "m.csv"))
    assert len(entries) == 2
    stems = sorted(e.wav_path.split("/")[-1] for e in entries)
    assert stems == ["Adriano_sent001.wav", "Beatriz_sent001.wav"]


def test_prepare_sid_prompts_layout(tmp_path):
    # Sid: speaker dir with WAVs + one prompts.txt; line N <-> wav *N
    d = tmp_path / "sid" / "M001"
    d.mkdir(parents=True)
    _wav(d / "M001N0001.wav")
    _wav(d / "M001N0002.wav")
    _wav(d / "M001N0007.wav")  # no prompt line 7 -> skipped
    (d / "prompts.txt").write_text(
        "1=primeira frase\n2= segunda frase\n", encoding="utf-8"
    )
    entries = prepare_sid(str(tmp_path / "sid"), str(tmp_path / "out"),
                          str(tmp_path / "m.csv"))
    assert len(entries) == 2
    texts = sorted(e.read_transcript() for e in entries)
    assert texts == ["PRIMEIRA FRASE", "SEGUNDA FRASE"]


def test_prepare_sid_unindexed_prompts_and_pair_fallback(tmp_path):
    # prompts without explicit indices: line order is the index;
    # a second speaker dir without prompts.txt uses paired txt files
    d = tmp_path / "sid" / "F002"
    d.mkdir(parents=True)
    _wav(d / "F002N0001.wav")
    _wav(d / "F002N0002.wav")
    (d / "prompts.txt").write_text("frase a\nfrase b\n")
    p = tmp_path / "sid" / "M003"
    p.mkdir(parents=True)
    _wav(p / "solo1.wav")
    (p / "solo1.txt").write_text("frase c")
    entries = prepare_sid(str(tmp_path / "sid"), str(tmp_path / "out"),
                          str(tmp_path / "m.csv"))
    texts = sorted(e.read_transcript() for e in entries)
    assert texts == ["FRASE A", "FRASE B", "FRASE C"]


def test_prepare_spoltech_latin1_and_empty(tmp_path):
    # CSLU Spoltech: Latin-1 transcripts, uppercase .WAV ext is NOT
    # required but empty transcripts are skipped
    d = tmp_path / "spoltech"
    d.mkdir()
    _wav(d / "u1.wav")
    (d / "u1.txt").write_bytes("não é você".encode("latin-1"))
    _wav(d / "u2.wav")
    (d / "u2.txt").write_text("")  # empty -> skipped
    entries = prepare_spoltech(str(d), str(tmp_path / "out"),
                               str(tmp_path / "m.csv"))
    assert len(entries) == 1
    assert entries[0].read_transcript() == "NÃO É VOCÊ"


def _lapsbm_tree(root):
    for spk, utt, text in [
        ("LapsBM-F004", "LapsBM_0004-01", "uma frase"),
        ("LapsBM-M001", "LapsBM_0001-01", "outra frase"),
    ]:
        d = root / spk
        d.mkdir(parents=True, exist_ok=True)
        _wav(d / f"{utt}.wav")
        (d / f"{utt}.txt").write_text(text)


def test_fetch_corpus_tar_zip_and_file_url(tmp_path):
    """The acquisition layer (the reference's download/unpack step):
    directory pass-through, .tar.gz and .zip extraction (idempotent),
    and file:// URL download — all end in a parseable layout."""
    import tarfile
    import zipfile

    from tpuasr.data.corpus import fetch_corpus

    root = tmp_path / "LapsBM1.4"
    _lapsbm_tree(root)

    # directory: returned as-is
    assert fetch_corpus(str(root), str(tmp_path / "c0")) == str(root)

    # tar.gz archive
    tgz = tmp_path / "laps.tar.gz"
    with tarfile.open(tgz, "w:gz") as t:
        t.add(root, arcname="LapsBM1.4")
    d1 = fetch_corpus(str(tgz), str(tmp_path / "c1"))
    assert (tmp_path / "c1" / "laps" / "LapsBM1.4").is_dir()
    out, man = tmp_path / "o1", str(tmp_path / "m1.csv")
    assert len(prepare_lapsbm(d1, str(out), man)) == 2
    # idempotent: second fetch reuses the extraction marker
    before = (tmp_path / "c1" / "laps" / ".extracted").stat().st_mtime
    assert fetch_corpus(str(tgz), str(tmp_path / "c1")) == d1
    assert (tmp_path / "c1" / "laps" / ".extracted").stat().st_mtime == before

    # zip archive via a file:// URL (exercises the download path too)
    zp = tmp_path / "laps.zip"
    with zipfile.ZipFile(zp, "w") as z:
        for f in sorted(root.rglob("*")):
            if f.is_file():
                z.write(f, f"LapsBM1.4/{f.relative_to(root)}")
    d2 = fetch_corpus(f"file://{zp}", str(tmp_path / "c2"))
    assert (tmp_path / "c2" / "laps.zip").exists()  # downloaded copy
    out2, man2 = tmp_path / "o2", str(tmp_path / "m2.csv")
    assert len(prepare_lapsbm(d2, str(out2), man2)) == 2


def test_fetch_corpus_rejects_traversal(tmp_path):
    import tarfile

    import pytest

    from tpuasr.data.corpus import fetch_corpus

    evil = tmp_path / "evil.tar"
    payload = tmp_path / "x.txt"
    payload.write_text("boom")
    with tarfile.open(evil, "w") as t:
        t.add(payload, arcname="../../escape.txt")
    with pytest.raises(ValueError, match="escapes"):
        fetch_corpus(str(evil), str(tmp_path / "c"))


def test_corpus_cli_from_archive(tmp_path):
    """End-to-end: the corpus CLI takes an ARCHIVE --source, extracts
    it to --cache-dir, and emits a manifest."""
    import tarfile

    from tpuasr.data.corpus import main as corpus_main

    root = tmp_path / "LapsBM1.4"
    _lapsbm_tree(root)
    tgz = tmp_path / "laps.tgz"
    with tarfile.open(tgz, "w:gz") as t:
        t.add(root, arcname="LapsBM1.4")
    man = tmp_path / "man.csv"
    rc = corpus_main([
        "lapsbm", "--source", str(tgz),
        "--out-dir", str(tmp_path / "out"),
        "--manifest", str(man),
    ])
    assert rc == 0
    assert len(read_manifest(str(man))) == 2
