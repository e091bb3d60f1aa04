#!/usr/bin/env python3
"""Waveform-mapping enhancement on VoiceBank-DEMAND (TPU-native).

    python train.py hparams/train.yaml --data_folder /data/VoiceBank

Mirrors the reference ``recipes/Voicebank/enhance/waveform_map/train.py``:
a time-domain network maps the noisy waveform directly to clean speech
with an L1 objective; STOI is tracked off-train and enhanced test
audio is written to disk.
"""

import sys

import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import l1_loss
from speechbrain_tpu.nnet.loss.stoi_loss import stoi_loss


class SEBrain(sb.Brain):
    """Brain for waveform-to-waveform enhancement."""

    def compute_forward(self, batch, stage):
        """Noisy wav -> enhanced wav."""
        return self.modules.model(
            batch["noisy_sig"], train=stage == Stage.TRAIN
        )

    def compute_objectives(self, predictions, batch, stage):
        """L1 on waveforms; STOI tracked off-train."""
        lens = batch["clean_sig_lens"] * batch["batch_mask"]
        loss = l1_loss(predictions, batch["clean_sig"], lens)
        if stage != Stage.TRAIN and hasattr(self, "stoi_metric"):
            real = int(np.asarray(batch["batch_mask"]).sum())
            self.stoi_metric.append(
                [str(i) for i in range(real)],
                np.asarray(predictions)[:real],
                np.asarray(batch["clean_sig"])[:real],
                np.asarray(batch["clean_sig_lens"])[:real],
            )
            if stage == Stage.TEST:
                import os

                from speechbrain_tpu.dataio.dataio import write_audio

                os.makedirs(self.hparams.enhanced_folder, exist_ok=True)
                lens_np = np.asarray(batch["clean_sig_lens"])[:real]
                T = predictions.shape[1]
                for i in range(real):
                    n = int(round(float(lens_np[i]) * T))
                    write_audio(
                        os.path.join(
                            self.hparams.enhanced_folder,
                            f"utt_{self._test_wav_count + i}.wav",
                        ),
                        np.asarray(predictions)[i, :n],
                        self.hparams.sample_rate,
                    )
                self._test_wav_count += real
        return loss

    def on_stage_start(self, stage, epoch=None):
        """STOI metric off-train."""
        self._test_wav_count = 0
        if stage != Stage.TRAIN:
            from speechbrain_tpu.utils.metric_stats import MetricStats

            self.stoi_metric = MetricStats(metric=stoi_loss)

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Anneal lr on valid loss, log, checkpoint."""
        if stage == Stage.TRAIN:
            return
        stoi = -self.stoi_metric.summarize("average")
        stats = {"loss": stage_loss, "stoi": stoi}
        if stage == Stage.VALID:
            _, self.lr = self.hparams.lr_annealing(
                self.lr, current_epoch=epoch, current_loss=stage_loss
            )
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": self.lr},
                train_stats={"loss": self.avg_train_loss},
                valid_stats=stats,
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"stoi": stoi}, max_keys=["stoi"]
                )
        else:
            self.hparams.train_logger.log_stats(
                {"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats=stats,
            )


def dataio_prep(hparams):
    """Paired noisy/clean datasets."""
    from speechbrain_tpu.dataio.dataio import read_audio

    datasets = {}
    for split in ("train", "valid", "test"):
        ds = DynamicItemDataset.from_json(hparams[f"{split}_json"])
        ds.add_dynamic_item(
            read_audio, takes="noisy_wav", provides="noisy_sig"
        )
        ds.add_dynamic_item(
            read_audio, takes="clean_wav", provides="clean_sig"
        )
        ds.set_output_keys(["id", "noisy_sig", "clean_sig"])
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
    sys.path.insert(0, __file__.rsplit("/enhance/", 1)[0])
    from voicebank_prepare import prepare_voicebank

    run_on_main(
        prepare_voicebank,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
        },
    )
    datasets = dataio_prep(hparams)
    brain = SEBrain(
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
        max_key="stoi",
    )
