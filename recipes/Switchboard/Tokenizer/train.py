#!/usr/bin/env python3
"""Train a subword tokenizer on normalized Switchboard transcripts.

    python train.py hparams/2K_unigram_subword_bpe.yaml \
        --data_folder /data/switchboard

Mirrors the reference recipe ``recipes/Switchboard/Tokenizer/train.py``.
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
    from recipes.Switchboard.switchboard_prepare import prepare_switchboard

    run_on_main(
        prepare_switchboard,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
            "dev_conversations": hparams["dev_conversations"],
            "skip_prep": hparams["skip_prep"],
        },
    )
    hparams["tokenizer"]()
