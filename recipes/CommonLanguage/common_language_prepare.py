"""CommonLanguage (45-language CommonVoice subset) data preparation.

Builds train/dev/test JSON manifests from the CommonLanguage layout
(``<data_folder>/<Language>/{train,dev,test}/**/*.wav``), mirroring the
reference ``recipes/CommonLanguage/common_language_prepare.py``: the
language is the top-level directory name and the split assignment is
the corpus's own.

Manifest rows: ``{id: {wav, duration, language}}``.
"""

import json
import logging
import os
import wave

logger = logging.getLogger(__name__)


def prepare_common_language(data_folder, save_folder, skip_prep=False):
    """Create JSON manifests for CommonLanguage.

    Arguments
    ---------
    data_folder : str
        Root with one directory per language, each holding
        train/dev/test subfolders of wav files.
    save_folder : str
        Where the JSON manifests are written.
    skip_prep : bool
        If True, do nothing.
    """
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
    languages = sorted(
        name
        for name in os.listdir(data_folder)
        if os.path.isdir(os.path.join(data_folder, name))
        and {"train", "dev", "test"}.issubset(
            set(os.listdir(os.path.join(data_folder, name)))
        )
    )
    logger.info("%d languages detected!", len(languages))
    for split, out_path in outs.items():
        rows = {}
        for language in languages:
            split_dir = os.path.join(data_folder, language, split)
            for dirpath, _, files in os.walk(split_dir):
                for fname in sorted(files):
                    if not fname.endswith(".wav"):
                        continue
                    path = os.path.join(dirpath, fname)
                    with wave.open(path, "rb") as w:
                        duration = w.getnframes() / w.getframerate()
                    utt_id = f"{language}_{os.path.splitext(fname)[0]}"
                    rows[utt_id] = {
                        "wav": path,
                        "duration": round(duration, 3),
                        "language": language,
                    }
        with open(out_path, "w", encoding="utf-8") as f:
            json.dump(rows, f, indent=2, ensure_ascii=False)
        logger.info("%s: %d utterances", out_path, len(rows))
