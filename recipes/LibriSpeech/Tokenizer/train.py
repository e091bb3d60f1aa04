#!/usr/bin/env python3
"""Train a subword tokenizer on LibriSpeech transcripts.

    python train.py hparams/5K_unigram_subword_bpe.yaml \
        --data_folder /data/LibriSpeech

Mirrors the reference ``recipes/LibriSpeech/Tokenizer/train.py``: the
resulting model is shared by the LibriSpeech ASR and LM recipes.
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
    from recipes.LibriSpeech.librispeech_prepare import prepare_librispeech

    run_on_main(
        prepare_librispeech,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
            "tr_splits": hparams["train_splits"],
            "dev_splits": hparams["dev_splits"],
            "te_splits": hparams["test_splits"],
            "merge_lst": hparams["train_splits"],
            "merge_name": "train.json",
            "skip_prep": hparams["skip_prep"],
        },
    )
    hparams["tokenizer"]()
