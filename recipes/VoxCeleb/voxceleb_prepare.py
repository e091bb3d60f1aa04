"""VoxCeleb data preparation: train/valid JSON manifests + trial pairs.

TPU-native counterpart of the reference
``recipes/VoxCeleb/voxceleb_prepare.py``: walks
``<data_folder>/wav/id*/<session>/*.wav``, holds out a fraction of
utterances per speaker for validation, and (optionally) converts a
``veri_test.txt`` verification-trial file into a JSON list.
"""

import json
import logging
import os
import random

logger = logging.getLogger(__name__)


def prepare_voxceleb(
    data_folder,
    save_folder,
    splits=("train", "valid"),
    split_ratio=(90, 10),
    seg_dur=3.0,
    verification_pairs_file=None,
    skip_prep=False,
    seed=1234,
):
    """Write ``train.json`` / ``valid.json`` under ``save_folder``.

    Each entry: ``{"wav": path, "duration": s, "spk_id": "idXXXXX"}``.
    """
    if skip_prep:
        return
    os.makedirs(save_folder, exist_ok=True)
    out_paths = {
        s: os.path.join(save_folder, f"{s}.json") for s in splits
    }
    if all(os.path.exists(p) for p in out_paths.values()):
        logger.info("VoxCeleb manifests exist, skipping preparation")
        return
    from speechbrain_tpu.dataio.dataio import read_audio

    wav_root = os.path.join(data_folder, "wav")
    if not os.path.isdir(wav_root):
        wav_root = data_folder
    by_spk = {}
    for root, _, files in os.walk(wav_root):
        for fn in files:
            if not fn.lower().endswith(".wav"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, wav_root)
            spk = rel.split(os.sep)[0]
            by_spk.setdefault(spk, []).append(path)
    if not by_spk:
        raise FileNotFoundError(f"No wav files under {wav_root}")
    rng = random.Random(seed)
    manifests = {s: {} for s in splits}
    frac_valid = split_ratio[1] / sum(split_ratio)
    for spk, paths in sorted(by_spk.items()):
        paths = sorted(paths)
        rng.shuffle(paths)
        n_valid = max(1, int(round(len(paths) * frac_valid))) if (
            "valid" in splits and len(paths) > 1
        ) else 0
        for i, path in enumerate(paths):
            split = "valid" if i < n_valid and "valid" in splits else "train"
            if split not in manifests:
                continue
            audio = read_audio(path)
            utt_id = (
                spk + "--" + os.path.splitext(
                    os.path.relpath(path, wav_root)
                )[0].replace(os.sep, "--")
            )
            manifests[split][utt_id] = {
                "wav": path,
                "duration": round(len(audio) / 16000.0, 3),
                "spk_id": spk,
            }
    for split, manifest in manifests.items():
        with open(out_paths[split], "w") as f:
            json.dump(manifest, f, indent=2)
        logger.info(
            f"Prepared {out_paths[split]} ({len(manifest)} utterances)"
        )
    if verification_pairs_file:
        prepare_trials(
            verification_pairs_file,
            wav_root,
            os.path.join(save_folder, "trials.json"),
        )


def prepare_trials(pairs_file, wav_root, save_path):
    """Convert ``<label> <enrol> <test>`` lines to a JSON trial list."""
    trials = []
    with open(pairs_file) as f:
        for line in f:
            parts = line.split()
            if len(parts) != 3:
                continue
            label, enrol, test = parts
            trials.append(
                {
                    "label": int(label),
                    "enrol": os.path.join(wav_root, enrol),
                    "test": os.path.join(wav_root, test),
                }
            )
    with open(save_path, "w") as f:
        json.dump(trials, f, indent=2)
    logger.info(f"Prepared {save_path} ({len(trials)} trials)")
