"""Fluent Speech Commands data preparation.

Parses the corpus's ``data/{train,valid,test}_data.csv`` (columns:
path, transcription, action, object, location) into JSON manifests
whose ``semantics`` field is the serialized frame the direct-SLU model
must emit, mirroring the reference
``recipes/fluent-speech-commands/prepare.py``.
"""

import csv
import json
import logging
import os

logger = logging.getLogger(__name__)


def prepare_FSC(data_folder, save_folder, skip_prep=False):
    """Create train/valid/test JSON manifests for FSC."""
    if skip_prep:
        return
    os.makedirs(save_folder, exist_ok=True)
    outs = {
        s: os.path.join(save_folder, f"{s}.json")
        for s in ("train", "valid", "test")
    }
    if all(os.path.exists(p) for p in outs.values()):
        logger.info("Skipping preparation, completed in previous run.")
        return
    for split, out in outs.items():
        csv_path = os.path.join(
            data_folder, "data", f"{split}_data.csv"
        )
        rows = {}
        with open(csv_path, newline="", encoding="utf-8") as f:
            for i, row in enumerate(csv.DictReader(f)):
                wav = os.path.join(data_folder, row["path"])
                semantics = (
                    "{'action:' '%s'| 'object': '%s'| 'location': '%s'}"
                    % (row["action"], row["object"], row["location"])
                )
                rows[f"{split}_{i}"] = {
                    "wav": wav,
                    "semantics": semantics,
                    "transcript": row["transcription"],
                }
        with open(out, "w", encoding="utf-8") as f:
            json.dump(rows, f, indent=2)
        logger.info("%s: %d utterances", out, len(rows))
