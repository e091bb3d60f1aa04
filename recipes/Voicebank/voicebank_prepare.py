"""VoiceBank-DEMAND preparation: paired noisy/clean JSON manifests.

TPU-native counterpart of the reference
``recipes/Voicebank/voicebank_prepare.py``: pairs
``noisy_trainset_28spk_wav`` with ``clean_trainset_28spk_wav`` (holding
out validation speakers) and the test sets, writing
``{id: {noisy_wav, clean_wav, duration}}`` manifests.
"""

import json
import logging
import os

logger = logging.getLogger(__name__)

# Standard validation speakers (reference valid_spks).
VALID_SPKS = ("p226", "p287")

TRAIN_DIRS = ("noisy_trainset_28spk_wav", "clean_trainset_28spk_wav")
TEST_DIRS = ("noisy_testset_wav", "clean_testset_wav")
TXT_DIRS = {
    "noisy_trainset_28spk_wav": "trainset_28spk_txt",
    "noisy_testset_wav": "testset_txt",
}


def _read_words(data_folder, noisy_dir_name, utt_id):
    """Transcript for ``utt_id`` when the corpus txt dir is present
    (used by the ASR/MTL recipes; enhancement ignores it)."""
    txt_dir = TXT_DIRS.get(noisy_dir_name)
    if txt_dir is None:
        return ""
    path = os.path.join(data_folder, txt_dir, utt_id + ".txt")
    if not os.path.exists(path):
        return ""
    with open(path) as f:
        return " ".join(f.read().split()).upper()


def prepare_voicebank(
    data_folder, save_folder, valid_speaker_count=2, skip_prep=False
):
    """Write train/valid/test JSON manifests under ``save_folder``."""
    if skip_prep:
        return
    os.makedirs(save_folder, exist_ok=True)
    paths = {
        s: os.path.join(save_folder, f"{s}.json")
        for s in ("train", "valid", "test")
    }
    if all(os.path.exists(p) for p in paths.values()):
        logger.info("VoiceBank manifests exist, skipping preparation")
        return
    from speechbrain_tpu.dataio.dataio import read_audio

    def build(noisy_dir, clean_dir, keep):
        manifest = {}
        for fn in sorted(os.listdir(noisy_dir)):
            if not fn.endswith(".wav"):
                continue
            spk = fn.split("_")[0]
            if not keep(spk):
                continue
            noisy = os.path.join(noisy_dir, fn)
            clean = os.path.join(clean_dir, fn)
            if not os.path.exists(clean):
                continue
            utt_id = os.path.splitext(fn)[0]
            manifest[utt_id] = {
                "noisy_wav": noisy,
                "clean_wav": clean,
                "duration": round(len(read_audio(noisy)) / 16000.0, 3),
                "words": _read_words(
                    data_folder, os.path.basename(noisy_dir), utt_id
                ),
            }
        return manifest

    noisy_tr = os.path.join(data_folder, TRAIN_DIRS[0])
    clean_tr = os.path.join(data_folder, TRAIN_DIRS[1])
    valid_spks = set(VALID_SPKS[:valid_speaker_count])
    splits = {
        "train": build(noisy_tr, clean_tr, lambda s: s not in valid_spks),
        "valid": build(noisy_tr, clean_tr, lambda s: s in valid_spks),
        "test": build(
            os.path.join(data_folder, TEST_DIRS[0]),
            os.path.join(data_folder, TEST_DIRS[1]),
            lambda s: True,
        ),
    }
    for split, manifest in splits.items():
        with open(paths[split], "w") as f:
            json.dump(manifest, f, indent=2)
        logger.info(
            f"Prepared {paths[split]} ({len(manifest)} utterances)"
        )
