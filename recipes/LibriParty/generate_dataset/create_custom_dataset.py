#!/usr/bin/env python3
"""Create a custom LibriParty corpus with user-specified parameters.

    python create_custom_dataset.py dataset.yaml \
        --out_folder /data/LibriParty_custom \
        --librispeech_root /data/LibriSpeech \
        --rirs_noises_root /data/RIRS_NOISES

Role counterpart of the reference
``recipes/LibriParty/generate_dataset/create_custom_dataset.py``: walks
LibriSpeech for utterances + transcripts, splits noises/RIRs/
backgrounds into train/dev/eval, generates per-split session metadata
(local.create_mixtures_metadata) and synthesizes the mixtures
(local.create_mixtures_from_metadata) — torch-free, on the native
audio/DSP stack.
"""

import json
import os
import random
import sys
from pathlib import Path

# Corpus synthesis is pure host work: pin JAX to CPU before any backend
# initialization so generation never requires (or grabs) an accelerator.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.utils.data_utils import get_all_files
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from local.create_mixtures_from_metadata import create_mixture  # noqa: E402
from local.create_mixtures_metadata import create_metadata  # noqa: E402


def split_list(array, split_factors):
    """Shuffle + split by fractions (reference :34)."""
    assert round(sum(split_factors), 6) == 1
    np.random.shuffle(array)
    out, indx = [], 0
    for frac in split_factors:
        n = int(len(array) * frac)
        out.append(array[indx : indx + n])
        indx += n
    return out


def parse_libri_folder(libri_folders):
    """speakers: spk_id -> [utt paths]; words: utt_id -> transcript."""
    utterances, txt_files = [], []
    for libri_dir in libri_folders:
        utterances.extend(get_all_files(libri_dir, match_and=[".flac"]))
        txt_files.extend(get_all_files(libri_dir, match_and=["trans.txt"]))
    words_dict = {}
    for trans in txt_files:
        with open(trans) as f:
            for line in f:
                parts = line.split(" ")
                words_dict[parts[0]] = " ".join(parts[1:]).strip("\n")
    speakers = {}
    for u in utterances:
        spk_id = Path(u).parent.parent.stem
        speakers.setdefault(spk_id, []).append(u)
    return speakers, words_dict


def main():
    params_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])
    with open(params_file) as fin:
        params = load_hyperpyyaml(fin, overrides)

    np.random.seed(params["seed"])
    random.seed(params["seed"])

    split_f = params["split_factors"]
    noises = []
    for f in params["noises_folders"]:
        noises.extend(get_all_files(f, match_and=[".wav"]))
    rirs = []
    for f in params["rirs_folders"]:
        rirs.extend(get_all_files(f, match_and=[".wav"]))
    noises = split_list(noises, split_f)
    rirs = split_list(rirs, split_f)
    if params.get("backgrounds_root"):
        backgrounds = get_all_files(
            params["backgrounds_root"], match_and=[".wav"]
        )
        backgrounds = split_list(backgrounds, split_f)
    else:
        backgrounds = [None] * 3

    os.makedirs(
        os.path.join(params["out_folder"], "metadata"), exist_ok=True
    )
    meta_params = dict(params)
    meta_params["out_folder"] = os.path.join(
        params["out_folder"], "metadata"
    )
    for indx, split in enumerate(["train", "dev", "eval"]):
        print(f"Generating metadata for {split} set")
        c_utts, c_words = parse_libri_folder(
            params["librispeech_folders"][split]
        )
        create_metadata(
            split,
            params["n_sessions"][split],
            meta_params,
            c_utts,
            c_words,
            rirs[indx],
            noises[indx],
            backgrounds[indx],
        )

    for split in ["train", "dev", "eval"]:
        with open(
            os.path.join(
                params["out_folder"], "metadata", split + ".json"
            )
        ) as f:
            c_meta = json.load(f)
        print(f"Creating {split} set")
        c_folder = os.path.join(params["out_folder"], split)
        os.makedirs(c_folder, exist_ok=True)
        for sess in c_meta:
            create_mixture(sess, c_folder, params, c_meta[sess])


if __name__ == "__main__":
    main()
