"""Taigi (Taiwanese Hokkien) speech-translation data preparation.

Builds ``{train,dev,test}.json`` manifests for the Taigi->Mandarin
speech-translation corpus (TAT-derived).  Mirrors the reference
``recipes/Taigi/taigi_prepare.py``: the corpus ships a ``wav/`` folder
and a ``data/text_mandarin`` index with one line per utterance
(``<wav_id> <mandarin translation...>``); utterances are shuffled with
a fixed seed and split 100h/20h/20h by utterance count.

Manifest rows: ``{id: {wav, duration, translation}}``.
"""

import json
import logging
import os
import random

logger = logging.getLogger(__name__)

# Reference split sizes (utterance counts at ~1s resolution):
# 100h train / 20h dev / 20h test.
TRAIN_SPLIT = 360000
DEV_SPLIT = 72000
TEST_SPLIT = 72000


def prepare_taigi(dataset_folder, save_folder, seed=8886, skip_prep=False):
    """Create train/dev/test JSON manifests for Taigi ST.

    Arguments
    ---------
    dataset_folder : str
        Corpus root containing ``wav/`` and ``data/text_mandarin``.
    save_folder : str
        Where the JSON manifests are written.
    seed : int
        Shuffle seed controlling the split assignment.
    skip_prep : bool
        If True, do nothing.
    """
    if skip_prep:
        return
    wav_folder = os.path.join(dataset_folder, "wav")
    data_folder = os.path.join(dataset_folder, "data")
    if not (os.path.exists(wav_folder) and os.path.exists(data_folder)):
        logger.error(
            "the folder wav or data does not exist (it is expected in "
            "the Taigi dataset)"
        )
    os.makedirs(save_folder, exist_ok=True)
    if all(
        os.path.exists(os.path.join(save_folder, s + ".json"))
        for s in ("train", "dev", "test")
    ):
        logger.info("Taigi preparation already done, skipping.")
        return

    data = _extract_data(
        os.path.join(data_folder, "text_mandarin"), wav_folder
    )
    rng = random.Random(seed)
    rng.shuffle(data)
    n_train, n_dev = TRAIN_SPLIT, DEV_SPLIT
    if len(data) < TRAIN_SPLIT + DEV_SPLIT + TEST_SPLIT:
        # Corpus smaller than the published split sizes (e.g. a debug
        # subset): fall back to an 80/10/10 split so dev/test are
        # never empty.
        n_train = max(1, int(len(data) * 0.8))
        n_dev = max(1, int(len(data) * 0.1))
    splits = {
        "train": data[:n_train],
        "dev": data[n_train : n_train + n_dev],
        "test": data[n_train + n_dev :][:TEST_SPLIT],
    }
    for split, rows in splits.items():
        path = os.path.join(save_folder, split + ".json")
        with open(path, "w", encoding="utf-8") as f:
            json.dump(
                {row_id: row for row_id, row in rows},
                f,
                indent=2,
                ensure_ascii=False,
            )
        logger.info("%s: %d utterances", path, len(rows))


def _wav_duration_seconds(path):
    """Duration of a wav file from its header (no sample decode)."""
    import wave

    with wave.open(path, "rb") as w:
        return w.getnframes() / w.getframerate()


def _extract_data(text_path, wav_folder):
    """Parse the text_mandarin index into manifest rows."""
    rows = []
    with open(text_path, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) < 2:
                continue
            wav_id, translation = parts[0], " ".join(parts[1:])
            wav_path = os.path.join(wav_folder, wav_id + ".wav")
            if not os.path.exists(wav_path):
                continue
            duration = _wav_duration_seconds(wav_path)
            rows.append(
                (
                    wav_id,
                    {
                        "wav": wav_path,
                        "duration": duration,
                        "translation": translation,
                    },
                )
            )
    return rows
