#!/usr/bin/env python3
"""Worked example: speaker-id training under hyperparameter optimization.

    python train.py train.yaml                       # plain single run
    python train.py train.yaml hpopt.yaml \
        --hpopt_mode generic --lr 0.01               # one HPO trial

Template counterpart of the reference's
``templates/hyperparameter_optimization_speaker_id``: the training
script is identical to ``templates/speaker_id`` except it runs inside a
``hyperparameter_optimization`` context, reports the validation error
as the trial objective, and keys the output folder by trial id so
parallel trials don't collide.  An external search driver (e.g. Orion)
repeatedly invokes this script with different ``--lr``-style overrides
and reads the reported objective.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
try:
    import speechbrain_tpu as sb
except ModuleNotFoundError:  # running from a source checkout
    sys.path.insert(
        0,
        os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ),
    )
    import speechbrain_tpu as sb

import numpy as np
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import nll_loss
from speechbrain_tpu.utils import hpopt as hp
from speechbrain_tpu.utils.metric_stats import AccuracyStats


class SpkIdBrain(sb.Brain):
    """Brain for speaker-id training with HPO reporting."""

    def compute_forward(self, batch, stage):
        """Features -> embeddings -> class posteriors."""
        feats = self.hparams.compute_features(batch["sig"])
        emb = self.modules.embedding_model(
            feats, lengths=batch["sig_lens"]
        )
        return self.modules.classifier(emb[:, 0])

    def compute_objectives(self, predictions, batch, stage):
        """Classification loss (+accuracy metric off-train)."""
        loss = nll_loss(
            predictions, batch["spk_id"], length=batch["batch_mask"]
        )
        if stage != Stage.TRAIN and hasattr(self, "acc"):
            real = int(np.asarray(batch["batch_mask"]).sum())
            self.acc.append(
                np.asarray(predictions)[:real, None, :],
                np.asarray(batch["spk_id"])[:real, None],
            )
        return loss

    def on_stage_start(self, stage, epoch=None):
        """Prepare metrics at stage start."""
        if stage != Stage.TRAIN:
            self.acc = AccuracyStats()

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Log stats, report the HPO objective, checkpoint."""
        if stage == Stage.VALID:
            acc = self.acc.summarize()
            stats = {"loss": stage_loss, "error": 1.0 - acc}
            self.hparams.train_logger.log_stats(
                {"epoch": epoch},
                train_stats={"loss": self.avg_train_loss},
                valid_stats=stats,
            )
            # The objective the search driver minimizes (reference
            # template reports at each valid stage end).
            hp.report_result(stats)
            if self.checkpointer is not None and self.hparams.ckpt_enable:
                self.checkpointer.save_and_keep_only(
                    meta={"error": stats["error"]}, min_keys=["error"]
                )


def dataio_prep(hparams):
    """Build datasets from the generated manifests."""
    from speechbrain_tpu.dataio.dataio import read_audio

    datasets = {}
    for split in ["train", "valid"]:
        ds = DynamicItemDataset.from_json(hparams[f"{split}_json"])
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")
        ds.set_output_keys(["id", "sig", "spk_id"])
        datasets[split] = ds
    return datasets


if __name__ == "__main__":
    with hp.hyperparameter_optimization(objective_key="error") as hp_ctx:
        hparams_file, run_opts, overrides = hp_ctx.parse_arguments(
            sys.argv[1:]
        )
        from speechbrain_tpu.utils.checkpoints import Checkpointer
        from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

        with open(hparams_file) as f:
            hparams = load_hyperpyyaml(
                f, overrides, overrides_must_match=False
            )
        sb.create_experiment_directory(
            hparams["output_folder"], hparams_file, overrides
        )
        from mini_data import prepare_mini_data

        prepare_mini_data(hparams["data_folder"])
        datasets = dataio_prep(hparams)
        brain = SpkIdBrain(
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
