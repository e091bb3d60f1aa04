#!/usr/bin/env python3
"""Train a tokenizer on the Mandarin translations of the Taigi corpus.

    python train.py hparams/tokenizer_char5k.yaml --data_folder /data/taigi

Mirrors the fork-specific reference recipe
``recipes/Taigi/Tokenizer/train.py``: prepare the JSON manifests, then
train the (native) SentencePiece-style tokenizer declared in YAML.
"""

import sys

import speechbrain_tpu as sb
from speechbrain_tpu.utils.distributed import run_on_main
from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

if __name__ == "__main__":
    hparams_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])
    with open(hparams_file) as f:
        hparams = load_hyperpyyaml(f, overrides)
    sb.create_experiment_directory(
        experiment_directory=hparams["output_folder"],
        hyperparams_to_save=hparams_file,
        overrides=overrides,
    )
    sys.path.append("../")
    from recipes.Taigi.taigi_prepare import prepare_taigi

    run_on_main(
        prepare_taigi,
        kwargs={
            "dataset_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
            "seed": hparams["seed"],
        },
    )
    hparams["tokenizer"]()
