#!/usr/bin/env python3
"""Google Speech Commands keyword classifier (TPU-native xvector).

    python train.py hparams/xvect.yaml --data_folder /data/GSC
"""

import json
import os
import sys

import jax
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import nll_loss
from speechbrain_tpu.utils.metric_stats import AccuracyStats


def prepare_gsc(data_folder, save_folder, n_commands=12):
    """Google Speech Commands dir tree -> JSON manifests."""
    os.makedirs(save_folder, exist_ok=True)
    commands12 = [
        "yes", "no", "up", "down", "left", "right", "on", "off",
        "stop", "go", "_unknown_", "_silence_",
    ]
    known = set(commands12[:10])
    val_list = test_list = set()
    for name, fname in [
        ("valid", "validation_list.txt"),
        ("test", "testing_list.txt"),
    ]:
        p = os.path.join(data_folder, fname)
        if os.path.exists(p):
            with open(p) as f:
                lst = set(l.strip() for l in f)
            if name == "valid":
                val_list = lst
            else:
                test_list = lst
    manifests = {"train": {}, "valid": {}, "test": {}}
    for cmd in os.listdir(data_folder):
        cmd_dir = os.path.join(data_folder, cmd)
        if not os.path.isdir(cmd_dir) or cmd.startswith("_"):
            continue
        label = cmd if cmd in known else "_unknown_"
        for wav in os.listdir(cmd_dir):
            if not wav.endswith(".wav"):
                continue
            rel = f"{cmd}/{wav}"
            split = (
                "valid" if rel in val_list
                else "test" if rel in test_list else "train"
            )
            manifests[split][rel.replace("/", "_")] = {
                "wav": os.path.join(cmd_dir, wav),
                "command": label,
                "command_id": commands12.index(label),
            }
    for split, data in manifests.items():
        with open(os.path.join(save_folder, f"{split}.json"), "w") as f:
            json.dump(data, f)


class SpeakerBrain(sb.Brain):
    def compute_forward(self, batch, stage):
        import jax.numpy as jnp

        wavs, lens = batch["sig"], batch["sig_lens"]
        if stage == Stage.TRAIN and hasattr(self.hparams, "augmentation"):
            wavs, lens = self.hparams.augmentation(
                wavs, lens, self._bound_rngs["augment"]
            )
        feats = self.hparams.compute_features(wavs)
        emb = self.modules.embedding_model(feats, lengths=lens)
        return self.modules.classifier(emb[:, 0])

    def compute_objectives(self, predictions, batch, stage):
        loss = nll_loss(
            predictions, batch["command_id"],
            length=batch["batch_mask"],
        )
        if stage != Stage.TRAIN and hasattr(self, "acc_metric"):
            real = int(np.asarray(batch["batch_mask"]).sum())
            self.acc_metric.append(
                np.asarray(predictions)[:real, None, :],
                np.asarray(batch["command_id"])[:real, None],
            )
        return loss

    def on_stage_start(self, stage, epoch=None):
        if stage != Stage.TRAIN:
            self.acc_metric = AccuracyStats()

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == Stage.TRAIN:
            return
        acc = self.acc_metric.summarize()
        if stage == Stage.VALID:
            _, new_lr = self.hparams.lr_annealing(stage_loss)
            self.lr = new_lr
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": self.lr},
                train_stats={"loss": self.avg_train_loss},
                valid_stats={"loss": stage_loss, "acc": acc},
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"acc": acc}, max_keys=["acc"]
                )


def dataio_prep(hparams):
    from speechbrain_tpu.dataio.dataio import read_audio

    datasets = {}
    for split in ["train", "valid", "test"]:
        ds = DynamicItemDataset.from_json(hparams[f"{split}_json"])
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")
        ds.set_output_keys(["id", "sig", "command_id"])
        datasets[split] = ds
    return datasets


if __name__ == "__main__":
    hparams_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])
    from speechbrain_tpu.utils.distributed import run_on_main
    from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

    with open(hparams_file) as f:
        hparams = load_hyperpyyaml(f, overrides)
    sb.create_experiment_directory(
        hparams["output_folder"], hparams_file, overrides
    )
    run_on_main(
        prepare_gsc,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
        },
    )
    datasets = dataio_prep(hparams)
    from speechbrain_tpu.utils.checkpoints import Checkpointer

    brain = SpeakerBrain(
        modules=hparams["modules"],
        opt_class=lambda lr: hparams["opt_class"](learning_rate=lr),
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=Checkpointer(hparams["save_folder"]),
    )
    brain.fit(
        hparams["epoch_counter"],
        SaveableDataLoader(
            datasets["train"],
            batch_size=hparams["batch_size"],
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
        max_key="acc",
    )
