"""LibriSpeech data preparation: corpus tree -> JSON manifests.

Mirrors the reference's ``recipes/LibriSpeech/librispeech_prepare.py``
behaviour: walks split directories (train-clean-100, dev-clean, ...),
pairs FLAC/WAV audio with the ``*.trans.txt`` transcripts, and writes
one JSON manifest per split with id/audio-path/duration/words fields.
"""

import json
import logging
import os

logger = logging.getLogger(__name__)

SAMPLERATE = 16000

__all__ = ["prepare_librispeech"]


def _audio_duration_seconds(path):
    if path.endswith(".wav"):
        import wave

        with wave.open(path, "rb") as w:
            return w.getnframes() / w.getframerate()
    if path.endswith(".flac"):
        try:
            import soundfile as sf

            info = sf.info(path)
            return info.frames / info.samplerate
        except ImportError:
            # Estimate from file size (flac ~ 0.55 compression of 16bit)
            return os.path.getsize(path) / (SAMPLERATE * 2 * 0.55)
    raise ValueError(f"Unknown audio format: {path}")


def prepare_librispeech(
    data_folder,
    save_folder,
    tr_splits=("train-clean-100",),
    dev_splits=("dev-clean",),
    te_splits=("test-clean",),
    merge_lst=None,
    merge_name=None,
    skip_prep=False,
):
    """Create JSON manifests for the requested splits."""
    if skip_prep:
        return
    os.makedirs(save_folder, exist_ok=True)
    all_splits = list(tr_splits) + list(dev_splits) + list(te_splits)
    for split in all_splits:
        save_json = os.path.join(save_folder, f"{split}.json")
        if os.path.exists(save_json):
            logger.info(f"{save_json} exists, skipping")
            continue
        split_dir = os.path.join(data_folder, split)
        if not os.path.isdir(split_dir):
            raise FileNotFoundError(f"Missing split dir: {split_dir}")
        manifest = {}
        for root, _, files in os.walk(split_dir):
            trans = [f for f in files if f.endswith(".trans.txt")]
            for tf in trans:
                with open(os.path.join(root, tf)) as f:
                    for line in f:
                        utt_id, words = line.strip().split(" ", 1)
                        audio = None
                        for ext in (".flac", ".wav"):
                            cand = os.path.join(root, utt_id + ext)
                            if os.path.exists(cand):
                                audio = cand
                                break
                        if audio is None:
                            continue
                        manifest[utt_id] = {
                            "wav": audio,
                            "duration": round(
                                _audio_duration_seconds(audio), 3
                            ),
                            "words": words,
                            "spk_id": utt_id.rsplit("-", 2)[0],
                        }
        with open(save_json, "w") as f:
            json.dump(manifest, f, indent=2)
        logger.info(
            f"Prepared {save_json} ({len(manifest)} utterances)"
        )
    # Merge several split manifests into one (reference
    # librispeech_prepare.py merge_csvs path) — e.g. the three train
    # splits into a single train.json.
    if merge_lst and merge_name:
        merged_path = os.path.join(save_folder, merge_name)
        if not os.path.exists(merged_path):
            merged = {}
            for split in merge_lst:
                with open(
                    os.path.join(save_folder, f"{split}.json")
                ) as f:
                    merged.update(json.load(f))
            with open(merged_path, "w") as f:
                json.dump(merged, f, indent=2)
            logger.info(
                f"Merged {merge_lst} -> {merged_path} "
                f"({len(merged)} utterances)"
            )
