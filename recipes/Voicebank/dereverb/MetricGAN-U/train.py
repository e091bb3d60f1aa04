#!/usr/bin/env python3
"""MetricGAN-U DEREVERBERATION on VoiceBank+reverb (TPU-native).

    python train.py hparams/train.yaml --data_folder /data/VoiceBankRevb

Mirrors the reference ``recipes/Voicebank/dereverb/MetricGAN-U``:
unsupervised SRMR-adversarial dereverberation — same Brain as the
enhancement MetricGAN-U recipe, trained on the reverberated VoiceBank
(whose ``noisy_*`` directories hold the reverberant audio).
"""

import importlib.util
import os
import sys

import speechbrain_tpu as sb

# yaml-check-extra-script: recipes/Voicebank/enhance/MetricGAN-U/train.py


def _load_enhance_module():
    """Import the sibling enhancement recipe as a module."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)).rsplit(
            "/dereverb/", 1
        )[0],
        "enhance",
        "MetricGAN-U",
        "train.py",
    )
    spec = importlib.util.spec_from_file_location(
        "_enhance_metricgan_u", path
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


if __name__ == "__main__":
    enhance = _load_enhance_module()
    hparams_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])
    from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
    from speechbrain_tpu.utils.checkpoints import Checkpointer
    from speechbrain_tpu.utils.distributed import run_on_main
    from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

    with open(hparams_file) as f:
        hparams = load_hyperpyyaml(f, overrides)
    sb.create_experiment_directory(
        hparams["output_folder"], hparams_file, overrides
    )
    sys.path.insert(0, __file__.rsplit("/dereverb/", 1)[0])
    from voicebank_prepare import prepare_voicebank

    run_on_main(
        prepare_voicebank,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
        },
    )
    datasets = enhance.dataio_prep(hparams)
    brain = enhance.MetricGanUBrain(
        modules=hparams["modules"],
        opt_class=lambda lr: hparams["opt_class"](learning_rate=lr),
        opt_class_d=lambda lr: hparams["opt_class_d"](learning_rate=lr),
        disc_keys=("discriminator",),
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=Checkpointer(hparams["save_folder"]),
    )
    brain.lr_d = hparams["lr_d"]
    brain.fit(
        hparams["epoch_counter"],
        SaveableDataLoader(
            datasets["train"], batch_size=hparams["batch_size"],
            shuffle=True,
        ),
        SaveableDataLoader(
            datasets["valid"], batch_size=hparams["batch_size"]
        ),
    )
    brain.evaluate(
        SaveableDataLoader(
            datasets["test"], batch_size=hparams["batch_size"]
        ),
        max_key="srmr",
    )
