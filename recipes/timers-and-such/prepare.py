"""Timers and Such data preparation.

Parses the corpus's per-split CSVs (``{train-synth,train-real,dev-real,
test-real,dev-synth,test-synth}.csv`` with ``path``, ``transcription``
and ``semantics`` columns) into JSON manifests, mirroring the reference
``recipes/timers-and-such/direct/prepare.py``.  The requested train
splits are merged into one ``train.json``.
"""

import csv
import json
import logging
import os

logger = logging.getLogger(__name__)

ALL_SPLITS = (
    "train-synth", "train-real",
    "dev-synth", "dev-real",
    "test-synth", "test-real",
)


def prepare_TAS(data_folder, save_folder, train_splits, skip_prep=False):
    """Create JSON manifests; merge train_splits into train.json."""
    if skip_prep:
        return
    os.makedirs(save_folder, exist_ok=True)
    train_out = os.path.join(save_folder, "train.json")
    if os.path.exists(train_out):
        logger.info("Skipping preparation, completed in previous run.")
        return
    split_rows = {}
    for split in ALL_SPLITS:
        csv_path = os.path.join(data_folder, split + ".csv")
        if not os.path.exists(csv_path):
            logger.warning("%s missing, skipping split", csv_path)
            continue
        rows = {}
        with open(csv_path, newline="", encoding="utf-8") as f:
            for i, row in enumerate(csv.DictReader(f)):
                # The corpus quotes the python-dict semantics string;
                # swap its commas for '|' like the reference so BPE
                # never splits a frame across commas.
                semantics = row["semantics"].replace(",", "|")
                rows[f"{split}_{i}"] = {
                    "wav": os.path.join(data_folder, row["path"]),
                    "semantics": semantics,
                    "transcript": row["transcription"],
                }
        split_rows[split] = rows
        out = os.path.join(save_folder, split + ".json")
        with open(out, "w", encoding="utf-8") as f:
            json.dump(rows, f, indent=2)
        logger.info("%s: %d utterances", out, len(rows))
    train = {}
    for split in train_splits:
        train.update(split_rows.get(split, {}))
    with open(train_out, "w", encoding="utf-8") as f:
        json.dump(train, f, indent=2)
    logger.info("%s: %d utterances", train_out, len(train))
