"""LibriTTS data preparation.

Scans LibriTTS split directories
(``<root>/<split>/<spk>/<chapter>/<utt>.wav`` with optional
``.normalized.txt`` transcripts) into JSON manifests, mirroring the
reference ``recipes/LibriTTS/libritts_prepare.py``.

Manifest rows: ``{id: {wav, duration, spk_id, label_norm?}}``.
"""

import json
import logging
import os
import wave

logger = logging.getLogger(__name__)


def prepare_libritts(
    data_folder,
    save_folder,
    train_splits=("train-clean-100",),
    dev_splits=("dev-clean",),
    test_splits=("test-clean",),
    skip_prep=False,
):
    """Create train/valid/test JSON manifests for LibriTTS."""
    if skip_prep:
        return
    os.makedirs(save_folder, exist_ok=True)
    outs = {
        "train": os.path.join(save_folder, "train.json"),
        "valid": os.path.join(save_folder, "valid.json"),
        "test": os.path.join(save_folder, "test.json"),
    }
    if all(os.path.exists(p) for p in outs.values()):
        logger.info("Skipping preparation, completed in previous run.")
        return
    groups = {
        "train": train_splits, "valid": dev_splits, "test": test_splits,
    }
    for name, splits in groups.items():
        rows = {}
        for split in splits:
            split_dir = os.path.join(data_folder, split)
            if not os.path.isdir(split_dir):
                raise FileNotFoundError(f"Missing split dir: {split_dir}")
            for dirpath, _, files in os.walk(split_dir):
                for fname in sorted(files):
                    if not fname.endswith(".wav"):
                        continue
                    utt_id = os.path.splitext(fname)[0]
                    path = os.path.join(dirpath, fname)
                    with wave.open(path, "rb") as w:
                        duration = w.getnframes() / w.getframerate()
                    row = {
                        "wav": path,
                        "duration": round(duration, 3),
                        "spk_id": utt_id.split("_")[0],
                    }
                    txt = os.path.join(
                        dirpath, utt_id + ".normalized.txt"
                    )
                    if os.path.exists(txt):
                        with open(txt, encoding="utf-8") as f:
                            row["label_norm"] = f.read().strip()
                    rows[utt_id] = row
        with open(outs[name], "w", encoding="utf-8") as f:
            json.dump(rows, f, indent=2)
        logger.info("%s: %d utterances", outs[name], len(rows))
