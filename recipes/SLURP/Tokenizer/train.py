#!/usr/bin/env python3
"""Train a subword tokenizer on SLURP semantics strings.

    python train.py hparams/tokenizer_bpe58.yaml --data_folder /data/SLURP

Mirrors the reference ``recipes/SLURP/Tokenizer/train.py``: the
resulting model is shared by the SLURP task recipes.
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
    import os

    sys.path.append(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    )
    from prepare import prepare_SLURP

    run_on_main(
        prepare_SLURP,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
            "train_splits": hparams["train_splits"],
            "skip_prep": hparams["skip_prep"],
        },
    )
    hparams["tokenizer"]()
