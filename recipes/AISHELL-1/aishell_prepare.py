"""AISHELL-1 preparation: transcript table + wav tree -> JSON manifests.

TPU-native counterpart of the reference
``recipes/AISHELL-1/aishell_prepare.py`` (no auto-download; the corpus
must be extracted at ``<data_folder>/data_aishell``).
"""

import glob
import json
import logging
import os

logger = logging.getLogger(__name__)


def prepare_aishell(data_folder, save_folder, skip_prep=False):
    """Write train/dev/test JSON manifests with char transcripts."""
    if skip_prep:
        return
    os.makedirs(save_folder, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import read_audio

    transcript_path = os.path.join(
        data_folder, "data_aishell", "transcript",
        "aishell_transcript_v0.8.txt",
    )
    filename2transcript = {}
    with open(transcript_path, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                filename2transcript[parts[0]] = " ".join(parts[1:])
    for split in ("train", "dev", "test"):
        out = os.path.join(save_folder, f"{split}.json")
        if os.path.exists(out):
            continue
        manifest = {}
        pattern = os.path.join(
            data_folder, "data_aishell", "wav", split, "*", "*.wav"
        )
        for wav in sorted(glob.glob(pattern)):
            utt_id = os.path.splitext(os.path.basename(wav))[0]
            if utt_id not in filename2transcript:
                continue
            manifest[utt_id] = {
                "wav": wav,
                "duration": round(len(read_audio(wav)) / 16000.0, 3),
                "transcript": filename2transcript[utt_id],
            }
        with open(out, "w") as f:
            json.dump(manifest, f, indent=2, ensure_ascii=False)
        logger.info(f"Prepared {out} ({len(manifest)} utterances)")
