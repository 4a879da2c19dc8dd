"""Alphabet / label handling.

Mirrors the reference's ``labels.json`` + char->id mapping inside
``SpectrogramDataset.parse_transcript`` (ref:data/data_loader.py):
a flat list of characters whose index is the class id, with the CTC
blank as index 0 (conventionally ``_``), unknown characters dropped.

The default alphabet is the Brazilian-Portuguese set used by the
AES-LAC 2018 paper family: A-Z plus the accented vowels and cedilla,
apostrophe and space.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

# Blank first (CTC convention in the reference family), then apostrophe,
# A-Z, PT-BR accented characters, space last.
PTBR_LABELS = "_'ABCDEFGHIJKLMNOPQRSTUVWXYZÀÁÂÃÇÉÊÍÓÔÕÚÜ "

ENGLISH_LABELS = "_'ABCDEFGHIJKLMNOPQRSTUVWXYZ "


@dataclass(frozen=True)
class Alphabet:
    """Immutable char<->id mapping with a CTC blank.

    ``labels[i]`` is the character for class id ``i``. The blank id is
    the index of ``blank_char`` (0 in the reference family).
    """

    labels: str = PTBR_LABELS
    blank_char: str = "_"
    _char_to_id: dict = field(init=False, repr=False, compare=False, default=None)

    def __post_init__(self):
        object.__setattr__(
            self, "_char_to_id", {c: i for i, c in enumerate(self.labels)}
        )
        if self.blank_char not in self._char_to_id:
            raise ValueError(f"blank char {self.blank_char!r} not in labels")

    @property
    def blank_id(self) -> int:
        return self._char_to_id[self.blank_char]

    @property
    def size(self) -> int:
        return len(self.labels)

    @property
    def space_id(self) -> int:
        return self._char_to_id[" "]

    def encode(self, text: str) -> list[int]:
        """Transcript -> class ids; unknown chars are dropped (reference
        behavior: ``parse_transcript`` filters via the labels map)."""
        upper = text.upper()
        return [self._char_to_id[c] for c in upper if c in self._char_to_id]

    def decode(self, ids) -> str:
        return "".join(self.labels[int(i)] for i in ids)

    def to_json(self) -> str:
        return json.dumps(list(self.labels), ensure_ascii=False)

    @classmethod
    def from_json_file(cls, path: str, blank_char: str = "_") -> "Alphabet":
        """Load a reference-style labels.json (a JSON list of chars)."""
        with open(path, "r", encoding="utf-8") as f:
            chars = json.load(f)
        return cls(labels="".join(chars), blank_char=blank_char)


def load_labels(path: str | None) -> Alphabet:
    if path is None:
        return Alphabet()
    return Alphabet.from_json_file(path)
