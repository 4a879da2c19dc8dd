"""PT-BR corpus preparation.

Reference parity: the per-corpus prep scripts under ref:data/ — the
fork's main delta from upstream deepspeech.pytorch (SURVEY.md §3.1):
download/unpack CETUC, LapsBM, VoxForge-PT (+ Sid, CSLU Spoltech),
resample to 16 kHz mono WAV, write one transcript ``.txt`` per
utterance, and emit duration-sorted manifests.

This environment has no network, so the download step takes a local
archive/directory instead of a URL (``--source``); everything after
(layout parsing, resampling via scipy polyphase instead of the
reference's sox subprocess, transcript normalization, manifest
emission) is implemented and unit-tested on synthetic layouts.

Layouts handled:
  * LapsBM: LapsBM*/LapsBM_####/ *.wav + matching *.txt per utterance.
  * CETUC: speaker dirs with paired wav/txt (one sentence per file).
  * VoxForge: <session>/wav/*.wav + <session>/etc/PROMPTS lines
    ("<path> WORD WORD ...").
  * Sid / CSLU Spoltech: paired wav/txt trees (generic pair scan).
"""

from __future__ import annotations

import os
import re
import unicodedata
from pathlib import Path

from tpuasr.audio.io import load_audio, save_audio
from tpuasr.data.manifest import ManifestEntry, with_durations, write_manifest

TARGET_SR = 16000


def normalize_transcript(text: str, keep_accents: bool = True) -> str:
    """Uppercase, strip punctuation/digit-free normalization used by the
    reference family for PT-BR transcripts."""
    text = text.strip().upper()
    if not keep_accents:
        text = unicodedata.normalize("NFD", text)
        text = "".join(c for c in text if unicodedata.category(c) != "Mn")
    text = re.sub(r"[!?.,;:\"()\[\]{}«»…—–]", " ", text)
    text = text.replace("-", " ")
    text = re.sub(r"\s+", " ", text)
    return text.strip()


def _convert_pair(wav_src: Path, text: str, out_dir: Path, stem: str,
                  sample_rate: int = TARGET_SR) -> ManifestEntry:
    out_dir.mkdir(parents=True, exist_ok=True)
    wav_out = out_dir / f"{stem}.wav"
    txt_out = out_dir / f"{stem}.txt"
    audio = load_audio(str(wav_src), expected_sample_rate=sample_rate)
    save_audio(str(wav_out), audio, sample_rate)
    txt_out.write_text(normalize_transcript(text) + "\n", encoding="utf-8")
    return ManifestEntry(str(wav_out), str(txt_out))


def prepare_pairs(
    source: str, out_dir: str, manifest_path: str,
    wav_suffix: str = ".wav", txt_suffix: str = ".txt",
    sample_rate: int = TARGET_SR,
) -> list[ManifestEntry]:
    """Generic paired wav/txt tree (LapsBM, CETUC, Sid, Spoltech)."""
    src = Path(source)
    entries = []
    for wav in sorted(src.rglob(f"*{wav_suffix}")):
        txt = wav.with_suffix(txt_suffix)
        if not txt.exists():
            continue
        rel = wav.relative_to(src)
        stem = "_".join(rel.with_suffix("").parts)
        entries.append(
            _convert_pair(wav, txt.read_text(encoding="utf-8", errors="replace"),
                          Path(out_dir), stem, sample_rate)
        )
    entries = sorted(with_durations(entries), key=lambda e: e.duration)
    write_manifest(manifest_path, entries)
    return entries


# Named corpus entry points (the reference had one script per corpus).
prepare_lapsbm = prepare_pairs
prepare_cetuc = prepare_pairs
prepare_sid = prepare_pairs
prepare_spoltech = prepare_pairs


def prepare_voxforge(
    source: str, out_dir: str, manifest_path: str,
    sample_rate: int = TARGET_SR,
) -> list[ManifestEntry]:
    """VoxForge session layout: <session>/etc/PROMPTS + <session>/wav/."""
    src = Path(source)
    entries = []
    for prompts in sorted(src.rglob("PROMPTS")):
        session = prompts.parent.parent
        for line in prompts.read_text(encoding="utf-8",
                                      errors="replace").splitlines():
            parts = line.strip().split(None, 1)
            if len(parts) != 2:
                continue
            path_key, text = parts
            utt = path_key.split("/")[-1]
            wav = session / "wav" / f"{utt}.wav"
            if not wav.exists():
                continue
            stem = f"{session.name}_{utt}"
            entries.append(
                _convert_pair(wav, text, Path(out_dir), stem, sample_rate)
            )
    entries = sorted(with_durations(entries), key=lambda e: e.duration)
    write_manifest(manifest_path, entries)
    return entries


CORPORA = {
    "lapsbm": prepare_lapsbm,
    "cetuc": prepare_cetuc,
    "voxforge": prepare_voxforge,
    "sid": prepare_sid,
    "spoltech": prepare_spoltech,
}


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        description="Prepare a PT-BR corpus: resample to 16 kHz mono, "
        "normalize transcripts, emit a duration-sorted manifest."
    )
    p.add_argument("corpus", choices=sorted(CORPORA))
    p.add_argument("--source", required=True,
                   help="unpacked corpus directory (no network here)")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--manifest", required=True)
    p.add_argument("--sample-rate", type=int, default=TARGET_SR)
    args = p.parse_args(argv)
    entries = CORPORA[args.corpus](
        args.source, args.out_dir, args.manifest, sample_rate=args.sample_rate
    )
    print(f"{args.corpus}: {len(entries)} utterances -> {args.manifest}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
