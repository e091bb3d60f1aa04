"""LibriSpeech lexicon preparation for G2P training.

Reads the LibriSpeech lexicon (``librispeech-lexicon.txt``: one
``WORD  PH ON EM ES`` entry per line) and writes train/valid/test JSON
manifests of grapheme/phoneme pairs with a seeded split, mirroring the
reference ``recipes/LibriSpeech/G2P`` data flow.

Manifest rows: ``{id: {char: "h e l l o", phn: "HH AH L OW"}}``.
"""

import json
import logging
import os
import random

logger = logging.getLogger(__name__)


def prepare_lexicon(
    data_folder, save_folder, seed=1234,
    valid_fraction=0.05, test_fraction=0.05, skip_prep=False,
):
    """Create the G2P manifests from the lexicon file."""
    if skip_prep:
        return
    os.makedirs(save_folder, exist_ok=True)
    outs = {
        s: os.path.join(save_folder, f"lexicon_{s}.json")
        for s in ("tr", "dev", "test")
    }
    if all(os.path.exists(p) for p in outs.values()):
        logger.info("Skipping preparation, completed in previous run.")
        return
    lexicon_path = os.path.join(data_folder, "librispeech-lexicon.txt")
    rows = []
    seen = set()
    with open(lexicon_path, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) < 2:
                continue
            word, phonemes = parts[0], parts[1:]
            if word in seen or not word.isalpha():
                continue
            seen.add(word)
            rows.append(
                (
                    word.lower(),
                    {
                        "char": " ".join(word.lower()),
                        "phn": " ".join(phonemes),
                    },
                )
            )
    rng = random.Random(seed)
    rng.shuffle(rows)
    n = len(rows)
    n_valid = max(1, int(n * valid_fraction))
    n_test = max(1, int(n * test_fraction))
    splits = {
        "test": rows[:n_test],
        "dev": rows[n_test : n_test + n_valid],
        "tr": rows[n_test + n_valid :],
    }
    for split, split_rows in splits.items():
        with open(outs[split], "w", encoding="utf-8") as f:
            json.dump(dict(split_rows), f, indent=2)
        logger.info("%s: %d entries", outs[split], len(split_rows))
