#!/usr/bin/env python3
"""Train a subword tokenizer on fluent-speech-commands semantics strings.

    python train.py hparams/tokenizer_bpe51.yaml --data_folder /data/FSC

Mirrors the reference ``recipes/fluent-speech-commands/Tokenizer/train.py``: the
resulting model is shared by the fluent-speech-commands task recipes.
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
    from prepare import prepare_FSC

    run_on_main(
        prepare_FSC,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
            "skip_prep": hparams["skip_prep"],
        },
    )
    hparams["tokenizer"]()
