"""Scoring-time text normalization for Switchboard/eval2000.

Condensed native counterpart of the reference
``recipes/Switchboard/ASR/normalize_util.py``: contraction expansion
and hesitation removal applied to hypotheses and references before WER
scoring (the reference additionally consults the eval2000 GLM file;
pass one to :func:`read_glm` to get those mappings too).
"""

import os
import re

_CONTRACTIONS = [
    (r"\bWON'T\b", "WILL NOT"),
    (r"\bCAN'T\b", "CANNOT"),
    (r"\bLET'S\b", "LET US"),
    (r"\bAIN'T\b", "AM NOT"),
    (r"\bY'ALL\b", "YOU ALL"),
    (r"\b'CAUSE\b", "BECAUSE"),
    (r"\bO'CLOCK\b", "O CLOCK"),
    (r"\bWANNA\b", "WANT TO"),
    (r"\bGONNA\b", "GOING TO"),
    (r"\bGOTTA\b", "GOT TO"),
    (r"(\w+)N'T\b", r"\1 NOT"),
    (r"(\w+)'RE\b", r"\1 ARE"),
    (r"(\w+)'VE\b", r"\1 HAVE"),
    (r"(\w+)'LL\b", r"\1 WILL"),
    (r"(\w+)'D\b", r"\1 WOULD"),
    (r"\bI'M\b", "I AM"),
    (r"\bIT'S\b", "IT IS"),
    (r"\bTHAT'S\b", "THAT IS"),
    (r"\bHE'S\b", "HE IS"),
    (r"\bSHE'S\b", "SHE IS"),
    (r"\bWHAT'S\b", "WHAT IS"),
    (r"\bTHERE'S\b", "THERE IS"),
]

_HESITATIONS = ("UH", "UM", "EH", "MM", "HM", "AH", "HUH", "HA", "ER")


def expand_contractions(text):
    """Expand English contractions (upper-cased text)."""
    text = text.upper()
    for pattern, repl in _CONTRACTIONS:
        text = re.sub(pattern, repl, text)
    return re.sub(r"\s+", " ", text).strip()


def expand_contractions_batch(texts):
    """Expand contractions over a list of word lists or strings."""
    out = []
    for t in texts:
        joined = t if isinstance(t, str) else " ".join(t)
        out.append(expand_contractions(joined).split())
    return out


def remove_hesitations(words):
    """Drop hesitation tokens (stm scoring convention)."""
    return [
        w for w in words
        if w.upper().strip("-") not in _HESITATIONS
        and w not in ("[NOISE]", "[LAUGHTER]")
    ]


def normalize_words(batch_of_words):
    """Full scoring normalization for a batch of word lists."""
    return [
        remove_hesitations(words)
        for words in expand_contractions_batch(batch_of_words)
    ]


def read_glm(glm_file):
    """Parse an eval2000 GLM file into {FROM: TO} mappings."""
    mappings = {}
    if not os.path.exists(glm_file):
        return mappings
    with open(glm_file, encoding="utf-8", errors="replace") as f:
        for line in f:
            line = line.split(";;")[0].strip()
            if "=>" not in line:
                continue
            src, dst = line.split("=>", 1)
            src = src.strip().strip("[]{}").upper()
            dst = dst.split("/")[0].strip().strip("[]{}").upper()
            if src:
                mappings[src] = dst
    return mappings
