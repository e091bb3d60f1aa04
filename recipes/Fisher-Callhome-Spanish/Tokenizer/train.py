#!/usr/bin/env python3
"""Train a subword tokenizer on Fisher-Callhome-Spanish translations.

    python train.py hparams/train_bpe_1k.yaml --data_folder /data/fisher_callhome

Mirrors the reference ``recipes/Fisher-Callhome-Spanish/Tokenizer/train.py``: the
resulting model is shared by the Fisher-Callhome-Spanish task recipes.
"""

import sys

import speechbrain_tpu as sb
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
    # Manifests are produced externally (see ST recipe docstring).
    hparams["tokenizer"]()
