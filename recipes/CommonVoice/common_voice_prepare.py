"""CommonVoice preparation: tsv -> JSON manifests with text cleaning.

TPU-native counterpart of the reference
``recipes/CommonVoice/common_voice_prepare.py``: parses the official
``train/dev/test.tsv`` files, normalizes transcripts (punctuation
stripping, optional accent folding), and writes
``{id: {wav, duration, words}}`` manifests.  Audio stays in the clips
directory; mp3 decoding needs ffmpeg (see ``dataio._read_via_ffmpeg``)
— pre-converted wav clips are used as-is.
"""

import csv
import json
import logging
import os
import re
import unicodedata

logger = logging.getLogger(__name__)


def clean_transcript(words, language="en", accented_letters=False):
    """Uppercase, strip punctuation, optionally fold accents
    (reference common_voice_prepare text normalization).

    Example
    -------
    >>> clean_transcript("Hello, world!")
    'HELLO WORLD'
    """
    words = words.upper()
    words = re.sub(r"[^\w\s']", " ", words, flags=re.UNICODE)
    if not accented_letters:
        words = (
            unicodedata.normalize("NFKD", words)
            .encode("ascii", "ignore")
            .decode("ascii")
        )
    return " ".join(words.split())


def prepare_common_voice(
    data_folder,
    save_folder,
    train_tsv_file=None,
    dev_tsv_file=None,
    test_tsv_file=None,
    accented_letters=False,
    language="en",
    skip_prep=False,
    duration_threshold=10.0,
):
    """Write train/dev/test JSON manifests from CommonVoice tsv files."""
    if skip_prep:
        return
    os.makedirs(save_folder, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import read_audio

    jobs = [
        ("train", train_tsv_file or os.path.join(data_folder, "train.tsv")),
        ("dev", dev_tsv_file or os.path.join(data_folder, "dev.tsv")),
        ("test", test_tsv_file or os.path.join(data_folder, "test.tsv")),
    ]
    for split, tsv in jobs:
        out = os.path.join(save_folder, f"{split}.json")
        if os.path.exists(out):
            continue
        manifest = {}
        with open(tsv, newline="", encoding="utf-8") as f:
            reader = csv.DictReader(f, delimiter="\t")
            for row in reader:
                clip = row["path"]
                wav = os.path.join(data_folder, "clips", clip)
                # Prefer a pre-converted wav next to the original clip.
                wav_alt = os.path.splitext(wav)[0] + ".wav"
                if os.path.exists(wav_alt):
                    wav = wav_alt
                elif not os.path.exists(wav):
                    continue
                words = clean_transcript(
                    row.get("sentence", ""), language, accented_letters
                )
                if not words:
                    continue
                try:
                    duration = round(len(read_audio(wav)) / 16000.0, 3)
                except RuntimeError:
                    # Compressed clip without ffmpeg: keep the entry,
                    # estimate duration from file size (mp3 ~16kB/s).
                    duration = round(os.path.getsize(wav) / 16000.0, 3)
                if split == "train" and duration > duration_threshold:
                    continue
                utt_id = os.path.splitext(clip)[0]
                manifest[utt_id] = {
                    "wav": wav,
                    "duration": duration,
                    "words": words,
                }
        with open(out, "w") as f:
            json.dump(manifest, f, indent=2)
        logger.info(f"Prepared {out} ({len(manifest)} utterances)")
