#!/usr/bin/env python3
"""Build the official LibriParty corpus from published metadata.

    python get_dataset_from_metadata.py dataset.yaml \
        --metadata_folder /data/LibriParty_meta --out_folder /data/LibriParty

Role counterpart of the reference
``recipes/LibriParty/generate_dataset/get_dataset_from_metadata.py``:
fetches the official metadata zip (skipped when the json files are
already present) and synthesizes every session with the native
mixture creator — the emitted metadata schema is reference-identical,
so the official files drive this script unchanged.
"""

import json
import os
import sys

# Corpus synthesis is pure host work: pin JAX to CPU before any backend
# initialization so generation never requires (or grabs) an accelerator.
import jax

jax.config.update("jax_platforms", "cpu")

import speechbrain_tpu as sb
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from local.create_mixtures_from_metadata import create_mixture  # noqa: E402

URL_METADATA = (
    "https://www.dropbox.com/s/0u6x6ndyedb4rl7/LibriParty_metadata.zip?dl=1"
)


def main():
    params_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])
    with open(params_file) as fin:
        params = load_hyperpyyaml(fin, overrides)

    metadata_folder = params["metadata_folder"]
    os.makedirs(metadata_folder, exist_ok=True)
    have_all = all(
        os.path.exists(os.path.join(metadata_folder, s + ".json"))
        for s in ["train", "dev", "eval"]
    )
    if not have_all:
        import zipfile

        from speechbrain_tpu.utils.data_utils import download_file

        zip_path = os.path.join(metadata_folder, "meta.zip")
        download_file(URL_METADATA, zip_path)
        with zipfile.ZipFile(zip_path) as zf:
            zf.extractall(metadata_folder)
    for data_split in ["train", "dev", "eval"]:
        with open(
            os.path.join(metadata_folder, data_split + ".json")
        ) as f:
            metadata = json.load(f)
        print(f"Creating data for {data_split} set")
        c_folder = os.path.join(params["out_folder"], data_split)
        os.makedirs(c_folder, exist_ok=True)
        for sess in metadata:
            create_mixture(sess, c_folder, params, metadata[sess])


if __name__ == "__main__":
    main()
