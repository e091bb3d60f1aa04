"""TIMIT data preparation: JSON manifests for train / dev / test.

TPU-native counterpart of the reference ``recipes/TIMIT/timit_prepare.py``:
walks the corpus, skips the SA dialect sentences, splits dev/test by the
standard Halberstadt speaker lists, and reads phone transcripts from the
.PHN files.  Audio stays in NIST SPHERE form on disk — the native
``read_audio`` sphere decoder handles it at load time.
"""

import json
import logging
import os

logger = logging.getLogger(__name__)

# Standard 50-speaker development set (Halberstadt & Glass).
DEV_SPK = {
    "faks0", "fdac1", "fjem0", "mgwt0", "mjar0", "mmdb1", "mmdm2",
    "mpdf0", "fcmh0", "fkms0", "mbdg0", "mbwm0", "mcsh0", "fadg0",
    "fdms0", "fedw0", "mgjf0", "mglb0", "mrtk0", "mtaa0", "mtdt0",
    "mthc0", "mwjg0", "fnmr0", "frew0", "fsem0", "mbns0", "mmjr0",
    "mdls0", "mdlf0", "mdvc0", "mers0", "fmah0", "fdrw0", "mrcs0",
    "mrjm4", "fcal1", "mmwh0", "fjsj0", "majc0", "mjsw0", "mreb0",
    "fgjd0", "fjmg0", "mroa0", "mteb0", "mjfc0", "mrjr0", "fmml0",
    "mrws1",
}

# 24-speaker core test set.
TEST_SPK = {
    "mdab0", "mwbt0", "felc0", "mtas1", "mwew0", "fpas0", "mjmp0",
    "mlnt0", "fpkt0", "mlll0", "mtls0", "fjlm0", "mbpm0", "mklt0",
    "fnlp0", "mcmj0", "mjdh0", "fmgd0", "mgrt0", "mnjm0", "fdhc0",
    "mjln0", "mpam0", "fmld0",
}


def _find_dir(base, name):
    for cand in (name, name.upper(), name.lower()):
        p = os.path.join(base, cand)
        if os.path.isdir(p):
            return p
    raise FileNotFoundError(f"Missing {name} under {base}")


def _read_phn(path):
    """(phones, end-frames) from a .PHN file; ends are 10 ms frame
    indices (end_sample // 160), used by the Alignment recipe."""
    phones, ends = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 3:
                phones.append(parts[2])
                ends.append(int(parts[1]) // 160)
    return phones, ends


def _collect(split_dir, keep_spk=None, drop_spk=None):
    """Yield (utt_id, wav_path, phn_path, spk_id) under a TRAIN/TEST dir."""
    for root, _, files in os.walk(split_dir):
        spk = os.path.basename(root).lower()
        if keep_spk is not None and spk not in keep_spk:
            continue
        if drop_spk is not None and spk in drop_spk:
            continue
        for fn in files:
            stem, ext = os.path.splitext(fn)
            if ext.lower() != ".wav":
                continue
            if stem.lower().startswith("sa"):
                continue  # dialect sentences excluded (reference parity)
            phn = None
            for cand in (stem + ".PHN", stem + ".phn"):
                p = os.path.join(root, cand)
                if os.path.exists(p):
                    phn = p
                    break
            if phn is None:
                continue
            yield f"{spk}_{stem.lower()}", os.path.join(root, fn), phn, spk


def prepare_timit(
    data_folder,
    save_json_train,
    save_json_valid,
    save_json_test,
    phn_set=60,
    skip_prep=False,
):
    """Write train/dev/test JSON manifests for TIMIT.

    ``phn_set``: 60 keeps the raw labels; 48 and 39 apply the standard
    Lee & Hon foldings.
    """
    if skip_prep:
        return
    if all(
        os.path.exists(p)
        for p in (save_json_train, save_json_valid, save_json_test)
    ):
        logger.info("TIMIT manifests exist, skipping preparation")
        return
    from speechbrain_tpu.dataio.dataio import read_audio

    train_dir = _find_dir(data_folder, "train")
    test_dir = _find_dir(data_folder, "test")
    fold = _folding_map(phn_set)
    jobs = [
        (save_json_train, _collect(train_dir)),
        (save_json_valid, _collect(test_dir, keep_spk=DEV_SPK)),
        (save_json_test, _collect(test_dir, keep_spk=TEST_SPK)),
    ]
    for save_path, items in jobs:
        manifest = {}
        for utt_id, wav, phn_path, spk in items:
            audio = read_audio(wav)
            phones, ends = _read_phn(phn_path)
            if fold is not None:
                folded = [
                    (fold.get(p, p), e) for p, e in zip(phones, ends)
                ]
                folded = [(p, e) for p, e in folded if p]  # drop (q)
                phones = [p for p, _ in folded]
                ends = [e for _, e in folded]
            manifest[utt_id] = {
                "wav": wav,
                "duration": round(len(audio) / 16000.0, 3),
                "spk_id": spk,
                "phn": " ".join(phones),
                "phn_ends": " ".join(str(e) for e in ends),
            }
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        with open(save_path, "w") as f:
            json.dump(manifest, f, indent=2)
        logger.info(f"Prepared {save_path} ({len(manifest)} utterances)")


def _folding_map(phn_set):
    if phn_set == 60:
        return None
    fold48 = {
        "ao": "aa", "ax-h": "ax", "axr": "er", "hv": "hh", "ix": "ih",
        "el": "l", "em": "m", "en": "n", "nx": "n", "eng": "ng",
        "zh": "sh", "ux": "uw", "pcl": "cl", "tcl": "cl", "kcl": "cl",
        "qcl": "cl", "bcl": "vcl", "dcl": "vcl", "gcl": "vcl",
        "h#": "sil", "#h": "sil", "pau": "sil", "q": "",
    }
    if phn_set == 48:
        return fold48
    if phn_set == 39:
        fold39 = dict(fold48)
        fold39.update(
            {
                "cl": "sil", "vcl": "sil", "epi": "sil",
                "ax": "ah", "ix": "ih", "el": "l", "en": "n",
                "zh": "sh", "aa": "aa", "ao": "aa",
                "ih": "ih", "ah": "ah", "er": "er", "axr": "er",
                "hh": "hh", "hv": "hh", "sh": "sh", "uw": "uw",
                "ux": "uw", "pcl": "sil", "tcl": "sil", "kcl": "sil",
                "bcl": "sil", "dcl": "sil", "gcl": "sil",
                "h#": "sil", "#h": "sil", "pau": "sil", "q": "",
            }
        )
        return fold39
    raise ValueError(f"phn_set must be 60/48/39, got {phn_set}")
