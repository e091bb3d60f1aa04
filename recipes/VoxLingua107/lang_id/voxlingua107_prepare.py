"""VoxLingua107 (107-language YouTube speech) data preparation.

Builds train/dev JSON manifests from the VoxLingua107 layout: one
directory per ISO language code of wav files
(``<data_folder>/<lang>/**/*.wav``) plus the official ``dev``
directory of evaluation utterances (``<data_folder>/dev/<lang>/*.wav``)
when present — otherwise a per-language holdout is split off the
training data.  (The reference recipe consumes webdataset shards from
the same source audio, ``recipes/VoxLingua107/lang_id``; shards are a
storage format, not a semantic difference.)

Manifest rows: ``{id: {wav, duration, language}}``.
"""

import json
import logging
import os
import wave

logger = logging.getLogger(__name__)


def prepare_voxlingua107(
    data_folder, save_folder, dev_fraction=0.02, skip_prep=False
):
    """Create train/dev JSON manifests for VoxLingua107."""
    if skip_prep:
        return
    os.makedirs(save_folder, exist_ok=True)
    train_out = os.path.join(save_folder, "train.json")
    dev_out = os.path.join(save_folder, "dev.json")
    if os.path.exists(train_out) and os.path.exists(dev_out):
        logger.info("Skipping preparation, completed in previous run.")
        return
    languages = sorted(
        d
        for d in os.listdir(data_folder)
        if os.path.isdir(os.path.join(data_folder, d)) and d != "dev"
    )
    logger.info("%d languages detected!", len(languages))
    train_rows, dev_rows = {}, {}
    official_dev = os.path.join(data_folder, "dev")
    for lang in languages:
        rows = _scan_language(os.path.join(data_folder, lang), lang)
        ids = sorted(rows)
        if os.path.isdir(official_dev):
            train_rows.update(rows)
        else:
            n_dev = max(1, int(len(ids) * dev_fraction))
            for utt_id in ids[:-n_dev]:
                train_rows[utt_id] = rows[utt_id]
            for utt_id in ids[-n_dev:]:
                dev_rows[utt_id] = rows[utt_id]
    if os.path.isdir(official_dev):
        for lang in sorted(os.listdir(official_dev)):
            lang_dir = os.path.join(official_dev, lang)
            if os.path.isdir(lang_dir):
                dev_rows.update(_scan_language(lang_dir, lang))
    for path, rows in ((train_out, train_rows), (dev_out, dev_rows)):
        with open(path, "w", encoding="utf-8") as f:
            json.dump(rows, f, indent=2)
        logger.info("%s: %d utterances", path, len(rows))


def _scan_language(lang_dir, lang):
    rows = {}
    for dirpath, _, files in os.walk(lang_dir):
        for fname in sorted(files):
            if not fname.endswith(".wav"):
                continue
            path = os.path.join(dirpath, fname)
            with wave.open(path, "rb") as w:
                duration = w.getnframes() / w.getframerate()
            rows[f"{lang}_{os.path.splitext(fname)[0]}"] = {
                "wav": path,
                "duration": round(duration, 3),
                "language": lang,
            }
    return rows
