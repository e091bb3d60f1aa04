#!/usr/bin/env python3
"""TIMIT CRDNN + CTC phoneme recognition.

    python train.py hparams/train.yaml --data_folder /data/TIMIT
"""

import sys

import jax
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.decoders.ctc import ctc_greedy_decode
from speechbrain_tpu.nnet.losses import ctc_loss
from speechbrain_tpu.utils.metric_stats import ErrorRateStats


class CTCBrain(sb.Brain):
    def compute_forward(self, batch, stage):
        feats = self.hparams.compute_features(batch["sig"])
        feats, self._new_extra = self.hparams.normalize(
            feats, batch["sig_lens"],
            state=self._bound_extra["norm"],
            epoch=self.hparams.epoch_counter.current,
            training=stage == Stage.TRAIN,
        )
        self._new_extra = {"norm": self._new_extra}
        out = self.modules.model(feats, lengths=batch["sig_lens"])
        logits = self.modules.output_lin(out)
        return jax.nn.log_softmax(logits, axis=-1)

    def init_extra_state(self, batch):
        from speechbrain_tpu.processing.features import GlobalNormState

        return {
            "norm": GlobalNormState.init(self.hparams.n_mels * 3)
        }

    def compute_objectives(self, predictions, batch, stage):
        mask = batch["batch_mask"]
        loss = ctc_loss(
            predictions,
            batch["phn_encoded"],
            batch["sig_lens"] * mask,
            batch["phn_encoded_lens"] * mask,
            blank_index=self.hparams.blank_index,
        )
        if stage != Stage.TRAIN and hasattr(self, "per_metrics"):
            real = int(np.asarray(mask).sum())
            hyps = ctc_greedy_decode(
                predictions, batch["sig_lens"],
                blank_id=self.hparams.blank_index,
            )[:real]
            self.per_metrics.append(
                [str(i) for i in range(real)],
                hyps,
                np.asarray(batch["phn_encoded"])[:real].tolist(),
                target_len=np.asarray(batch["phn_encoded_lens"])[:real],
                ind2lab=self.label_encoder.decode_ndim,
            )
        return loss

    def on_stage_start(self, stage, epoch=None):
        if stage != Stage.TRAIN:
            self.per_metrics = ErrorRateStats()

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == Stage.TRAIN:
            return
        per = self.per_metrics.summarize("error_rate")
        if stage == Stage.VALID:
            _, self.lr = self.hparams.lr_annealing(per)
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": self.lr},
                train_stats={"loss": self.avg_train_loss},
                valid_stats={"loss": stage_loss, "PER": per},
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"PER": per}, min_keys=["PER"]
                )


def dataio_prep(hparams):
    from speechbrain_tpu.dataio.dataio import read_audio
    from speechbrain_tpu.dataio.encoder import CTCTextEncoder

    label_encoder = CTCTextEncoder()
    datasets = {}
    for split in ["train", "valid", "test"]:
        ds = DynamicItemDataset.from_json(hparams[f"{split}_json"])
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")
        ds.add_dynamic_item(
            lambda p: p.split(), takes="phn", provides="phn_list"
        )
        ds.add_dynamic_item(
            lambda pl: np.asarray(
                label_encoder.encode_sequence(pl), np.int64
            ),
            takes="phn_list",
            provides="phn_encoded",
        )
        ds.set_output_keys(["id", "sig", "phn_encoded"])
        datasets[split] = ds
    label_encoder.load_or_create(
        path=hparams["save_folder"] + "/label_encoder.txt",
        from_didatasets=[datasets["train"]],
        output_key="phn_list",
        sequence_input=True,
        special_labels={"blank_label": "<blank>"},
    )
    return datasets, label_encoder


if __name__ == "__main__":
    hparams_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])
    from speechbrain_tpu.utils.checkpoints import Checkpointer
    from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

    with open(hparams_file) as f:
        hparams = load_hyperpyyaml(f, overrides)
    sb.create_experiment_directory(
        hparams["output_folder"], hparams_file, overrides
    )
    sys.path.insert(0, __file__.rsplit("/ASR/", 1)[0])
    from timit_prepare import prepare_timit

    from speechbrain_tpu.utils.distributed import run_on_main

    run_on_main(
        prepare_timit,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_json_train": hparams["train_json"],
            "save_json_valid": hparams["valid_json"],
            "save_json_test": hparams["test_json"],
            "phn_set": hparams.get("phn_set", 39),
        },
    )
    datasets, label_encoder = dataio_prep(hparams)
    brain = CTCBrain(
        modules=hparams["modules"],
        opt_class=lambda lr: hparams["opt_class"](learning_rate=lr),
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=Checkpointer(hparams["save_folder"]),
    )
    brain.label_encoder = label_encoder
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
        min_key="PER",
    )
