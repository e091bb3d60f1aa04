#!/usr/bin/env python3
"""UrbanSound8k sound classification with ECAPA-TDNN (TPU-native).

    python train.py hparams/train_ecapa.yaml --data_folder /data/UrbanSound8K

Mirrors the reference ``recipes/UrbanSound8k/SoundClassification``:
predefined-fold splits from ``metadata/UrbanSound8K.csv`` (never
reshuffled — fold leakage breaks comparability), ECAPA embeddings,
AAM-softmax classifier, accuracy tracked off-train.
"""

import csv
import json
import os
import sys

import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset


class UrbanSound8kBrain(sb.Brain):
    """Brain for 10-class sound-event classification."""

    def compute_forward(self, batch, stage):
        """Wav -> Fbank -> ECAPA -> logits."""
        feats = self.hparams.compute_features(batch["sig"])
        feats = self.hparams.normalize(
            feats, batch["sig_lens"], training=False
        )
        emb = self.modules.embedding_model(
            feats, lengths=batch["sig_lens"]
        )
        return self.modules.classifier(emb)

    def compute_objectives(self, predictions, batch, stage):
        """AAM loss + off-train accuracy."""
        loss = self.hparams.compute_cost(
            predictions, batch["class_encoded"]
        )
        if stage != Stage.TRAIN and hasattr(self, "acc_metric"):
            mask = np.asarray(batch["batch_mask"])
            real = int(mask.sum())
            pred = np.asarray(predictions).squeeze(1).argmax(-1)[:real]
            true = np.asarray(batch["class_encoded"])[:real]
            self.acc_metric.append(
                [str(i) for i in range(real)], pred, true
            )
        return loss

    def on_stage_start(self, stage, epoch=None):
        """Accuracy metric off-train."""
        if stage != Stage.TRAIN:
            from speechbrain_tpu.utils.metric_stats import MetricStats

            self.acc_metric = MetricStats(
                metric=lambda p, t: np.asarray(p == t, np.float64)
            )

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Log + checkpoint by accuracy."""
        if stage == Stage.TRAIN:
            return
        acc = self.acc_metric.summarize("average")
        if stage == Stage.VALID:
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": self.lr},
                train_stats={"loss": self.avg_train_loss},
                valid_stats={"loss": stage_loss, "acc": acc},
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"acc": acc}, max_keys=["acc"]
                )
        else:
            self.hparams.train_logger.log_stats(
                {"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats={"loss": stage_loss, "acc": acc},
            )


def prepare_urbansound8k(
    data_folder, save_folder,
    train_fold_nums, valid_fold_nums, test_fold_nums,
):
    """metadata/UrbanSound8K.csv -> fold-respecting JSON manifests."""
    os.makedirs(save_folder, exist_ok=True)
    outs = {
        s: os.path.join(save_folder, f"{s}.json")
        for s in ("train", "valid", "test")
    }
    if all(os.path.exists(p) for p in outs.values()):
        return
    meta = os.path.join(data_folder, "metadata", "UrbanSound8K.csv")
    splits = {"train": {}, "valid": {}, "test": {}}
    with open(meta, newline="") as f:
        for row in csv.DictReader(f):
            fold = int(row["fold"])
            split = (
                "train" if fold in train_fold_nums
                else "valid" if fold in valid_fold_nums
                else "test" if fold in test_fold_nums else None
            )
            if split is None:
                continue
            wav = os.path.join(
                data_folder, "audio", f"fold{fold}",
                row["slice_file_name"],
            )
            if not os.path.exists(wav):
                continue
            utt_id = os.path.splitext(row["slice_file_name"])[0]
            splits[split][utt_id] = {
                "wav": wav,
                "duration": float(row["end"]) - float(row["start"]),
                "class_id": int(row["classID"]),
                "class_name": row["class"],
            }
    for split, manifest in splits.items():
        with open(outs[split], "w") as f:
            json.dump(manifest, f, indent=2)


def dataio_prep(hparams):
    """Datasets yielding fixed-length signals + class ids."""
    from speechbrain_tpu.dataio.dataio import read_audio

    crop = int(hparams["signal_length_s"] * hparams["sample_rate"])
    datasets = {}
    for split in ("train", "valid", "test"):
        ds = DynamicItemDataset.from_json(hparams[f"{split}_json"])

        def audio_pipeline(wav):
            sig = read_audio(wav)
            if sig.ndim > 1:
                sig = sig.mean(axis=-1)
            sig = sig[:crop]
            if len(sig) < crop:
                sig = np.pad(sig, (0, crop - len(sig)))
            return sig.astype(np.float32)

        ds.add_dynamic_item(audio_pipeline, takes="wav", provides="sig")
        ds.add_dynamic_item(
            lambda c: np.int64(c), takes="class_id",
            provides="class_encoded",
        )
        ds.set_output_keys(["id", "sig", "class_encoded"])
        datasets[split] = ds
    return datasets


if __name__ == "__main__":
    hparams_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])
    from speechbrain_tpu.utils.checkpoints import Checkpointer
    from speechbrain_tpu.utils.distributed import run_on_main
    from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

    with open(hparams_file) as f:
        hparams = load_hyperpyyaml(f, overrides)
    sb.create_experiment_directory(
        hparams["output_folder"], hparams_file, overrides
    )
    run_on_main(
        prepare_urbansound8k,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
            "train_fold_nums": hparams["train_fold_nums"],
            "valid_fold_nums": hparams["valid_fold_nums"],
            "test_fold_nums": hparams["test_fold_nums"],
        },
    )
    datasets = dataio_prep(hparams)
    brain = UrbanSound8kBrain(
        modules=hparams["modules"],
        opt_class=lambda lr: hparams["opt_class"](learning_rate=lr),
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=Checkpointer(hparams["save_folder"]),
    )
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
        max_key="acc",
    )
