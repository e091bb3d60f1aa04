#!/usr/bin/env python3
"""Worked example: train a spectral-mask speech-enhancement model.

    python train.py train.yaml          # generates synthetic data, trains

Template counterpart of the reference ``templates/enhancement``: a
custom RNN model (see ``custom_model.py``) predicts a sigmoid mask over
log-spectral features; the masked spectrum is compared to the clean
target with MSE, STOI is tracked off-train, and the enhanced waveform
is resynthesized with the noisy phase.
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

import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import mse_loss
from speechbrain_tpu.processing.features import spectral_magnitude
from speechbrain_tpu.processing.signal_processing import resynthesize


class SEBrain(sb.Brain):
    """Brain for spectral-mask enhancement (template recipe)."""

    def compute_feats(self, wavs):
        """log1p compressed magnitude spectra."""
        feats = self.hparams.compute_STFT(wavs)
        feats = spectral_magnitude(feats, power=0.5)
        return jnp.log1p(feats)

    def compute_forward(self, batch, stage):
        """Noisy wav -> (masked spectrum, resynthesized waveform)."""
        noisy_wavs = batch["noisy_sig"]
        noisy_feats = self.compute_feats(noisy_wavs)
        mask = self.modules.model(noisy_feats)
        predict_spec = mask * noisy_feats
        predict_wav = resynthesize(
            jnp.expm1(predict_spec),
            noisy_wavs,
            self.hparams.compute_STFT,
            self.hparams.compute_ISTFT,
        )
        return predict_spec, predict_wav

    def compute_objectives(self, predictions, batch, stage):
        """MSE vs the clean spectrum; STOI tracked off-train."""
        predict_spec, predict_wav = predictions
        clean_wavs = batch["clean_sig"]
        lens = batch["clean_sig_lens"] * batch["batch_mask"]
        clean_spec = self.compute_feats(clean_wavs)
        loss = mse_loss(predict_spec, clean_spec, lens)
        if stage != Stage.TRAIN and hasattr(self, "stoi_metric"):
            real = int(np.asarray(batch["batch_mask"]).sum())
            self.stoi_metric.append(
                [str(i) for i in range(real)],
                np.asarray(predict_wav)[:real],
                np.asarray(clean_wavs)[:real],
                np.asarray(batch["clean_sig_lens"])[:real],
            )
        return loss

    def on_stage_start(self, stage, epoch=None):
        """STOI metric off-train."""
        if stage != Stage.TRAIN:
            from speechbrain_tpu.nnet.loss.stoi_loss import stoi_loss
            from speechbrain_tpu.utils.metric_stats import MetricStats

            self.stoi_metric = MetricStats(
                metric=lambda p, t, lens: stoi_loss(
                    jnp.asarray(p), jnp.asarray(t), jnp.asarray(lens),
                    reduction="batch",
                )
            )

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Log + checkpoint by max STOI (stoi_loss is negated STOI)."""
        if stage == Stage.TRAIN:
            return
        stats = {
            "loss": stage_loss,
            "stoi": -self.stoi_metric.summarize("average"),
        }
        if stage == Stage.VALID:
            self.hparams.train_logger.log_stats(
                {"epoch": epoch},
                train_stats={"loss": self.avg_train_loss},
                valid_stats=stats,
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta=stats, max_keys=["stoi"]
                )
        else:
            self.hparams.train_logger.log_stats(
                {"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats=stats,
            )


def dataio_prep(hparams):
    """Datasets yielding aligned (clean, noisy) waveform pairs."""
    from speechbrain_tpu.dataio.dataio import read_audio

    datasets = {}
    for split in ["train", "valid", "test"]:
        ds = DynamicItemDataset.from_json(hparams[f"{split}_json"])
        ds.add_dynamic_item(
            read_audio, takes="clean_wav", provides="clean_sig"
        )
        ds.add_dynamic_item(
            read_audio, takes="noisy_wav", provides="noisy_sig"
        )
        ds.set_output_keys(["id", "clean_sig", "noisy_sig"])
        datasets[split] = ds
    return datasets


if __name__ == "__main__":
    hparams_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])
    from speechbrain_tpu.utils.checkpoints import Checkpointer
    from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

    with open(hparams_file) as f:
        hparams = load_hyperpyyaml(f, overrides)
    sb.create_experiment_directory(
        hparams["output_folder"], hparams_file, overrides
    )
    from mini_data import prepare_mini_data

    prepare_mini_data(hparams["data_folder"])
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
