"""Corpus prep tests on synthetic layouts (no network in this env)."""

import numpy as np

from tpuasr.audio.io import load_audio, save_audio
from tpuasr.data.corpus import (
    normalize_transcript,
    prepare_pairs,
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
