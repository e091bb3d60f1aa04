#!/usr/bin/env python3
"""Step 1 of the speech-recognition template: train the tokenizer.

    python train.py tokenizer.yaml

Prepares the mini-librispeech manifests (synthesizing a tone-word
corpus when no real data is present) and trains the BPE tokenizer the
LM and ASR steps share (reference
``templates/speech_recognition/Tokenizer/train.py``).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
)
try:
    import speechbrain_tpu as sb
except ModuleNotFoundError:  # running from a source checkout
    sys.path.insert(
        0,
        os.path.dirname(
            os.path.dirname(
                os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__))
                )
            )
        ),
    )
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
    from mini_librispeech_prepare import prepare_mini_librispeech

    run_on_main(
        prepare_mini_librispeech,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_json_train": hparams["train_json"],
            "save_json_valid": hparams["valid_json"],
            "save_json_test": hparams["test_json"],
        },
    )
    hparams["tokenizer"]()
