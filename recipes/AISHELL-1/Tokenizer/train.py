#!/usr/bin/env python3
"""Train a subword tokenizer on AISHELL-1 transcripts.

    python train.py hparams/tokenizer_bpe5000.yaml --data_folder /data/aishell

Mirrors the reference ``recipes/AISHELL-1/Tokenizer/train.py``: the
resulting model is shared by the AISHELL-1 task recipes.
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
    from aishell_prepare import prepare_aishell

    run_on_main(
        prepare_aishell,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
            "skip_prep": hparams["skip_prep"],
        },
    )
    hparams["tokenizer"]()
