"""DVoice (African low-resource languages) data preparation.

Reads the per-language DVoice layout (``<data_folder>/texts/
{train,dev,test}.csv`` tab-separated with ``wav`` and ``words``
columns; audio under ``<data_folder>/wavs/``) into JSON manifests,
mirroring the reference ``recipes/DVoice/dvoice_prepare.py`` (the
darija path; the ALFFA/multilingual variants re-arrange corpora into
this same layout first).

Manifest rows: ``{id: {wav, duration, words}}``.
"""

import csv
import json
import logging
import os
import wave

logger = logging.getLogger(__name__)


def prepare_dvoice(data_folder, save_folder, skip_prep=False):
    """Create train/dev/test JSON manifests for one DVoice language."""
    if skip_prep:
        return
    os.makedirs(save_folder, exist_ok=True)
    outs = {
        s: os.path.join(save_folder, f"{s}.json")
        for s in ("train", "dev", "test")
    }
    if all(os.path.exists(p) for p in outs.values()):
        logger.info("Skipping preparation, completed in previous run.")
        return
    for split, out in outs.items():
        csv_path = os.path.join(data_folder, "texts", f"{split}.csv")
        rows = {}
        with open(csv_path, newline="", encoding="utf-8") as f:
            for i, row in enumerate(csv.DictReader(f, delimiter="\t")):
                wav = os.path.join(data_folder, "wavs", row["wav"])
                if not os.path.exists(wav):
                    continue
                with wave.open(wav, "rb") as w:
                    duration = w.getnframes() / w.getframerate()
                rows[f"{split}_{i}"] = {
                    "wav": wav,
                    "duration": round(duration, 3),
                    "words": row["words"],
                }
        with open(out, "w", encoding="utf-8") as f:
            json.dump(rows, f, indent=2, ensure_ascii=False)
        logger.info("%s: %d utterances", out, len(rows))
