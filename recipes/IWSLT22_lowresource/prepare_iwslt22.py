"""IWSLT 2022 low-resource (Tamasheq -> French) data preparation.

Parses the released corpus index (per split: a ``<split>.yaml`` of
``{duration: d, offset: o, speaker_id: s, wav: path}`` lines plus a
parallel ``<split>.fra`` of French translations, one per line) into
JSON manifests, mirroring the reference
``recipes/IWSLT22_lowresource/prepare_iwslt22.py``.

Manifest rows: ``{id: {wav, duration, trans}}``.
"""

import json
import logging
import os
import re

logger = logging.getLogger(__name__)


def data_proc(dataset_folder, output_folder):
    """Create {train,valid,test}.json from the corpus index files."""
    os.makedirs(output_folder, exist_ok=True)
    for split in ("train", "valid", "test"):
        out = os.path.join(output_folder, split + ".json")
        if os.path.exists(out):
            continue
        index_path = os.path.join(dataset_folder, split + ".yaml")
        fra_path = os.path.join(dataset_folder, split + ".fra")
        with open(index_path, encoding="utf-8") as f:
            entries = [l for l in f if l.strip()]
        with open(fra_path, encoding="utf-8") as f:
            translations = [l.strip() for l in f if l.strip()]
        assert len(entries) == len(translations), (
            f"{index_path} and {fra_path} disagree in length"
        )
        rows = {}
        for entry, trans in zip(entries, translations):
            wav = entry.split(", wav: ")[1].split("}")[0].strip()
            duration = float(
                re.search(r"duration:\s*([0-9.]+)", entry).group(1)
            )
            utt_id = os.path.splitext(os.path.basename(wav))[0]
            rows[utt_id] = {
                "wav": os.path.join(dataset_folder, wav),
                "duration": duration,
                "trans": trans,
            }
        with open(out, "w", encoding="utf-8") as f:
            json.dump(rows, f, indent=2, ensure_ascii=False)
        logger.info("%s: %d utterances", out, len(rows))
