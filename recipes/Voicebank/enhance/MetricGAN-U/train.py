#!/usr/bin/env python3
"""MetricGAN-U unsupervised enhancement on VoiceBank-DEMAND (TPU-native).

    python train.py hparams/train.yaml --data_folder /data/VoiceBank

Mirrors the reference ``recipes/Voicebank/enhance/MetricGAN-U/train.py``
(MetricGAN-U, arXiv:2110.05866): no clean reference is used for the
adversarial target — the discriminator learns to predict a
NON-INTRUSIVE quality score of single waveforms, and the generator
maximizes it.  The reference scores with the external SRMR toolbox;
here the native differentiable SRMR surrogate
(``nnet/loss/srmr_loss.py``) is computed inside the fused jitted GAN
step.  Clean references are used only for STOI *reporting* off-train.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.gan import GANBrain
from speechbrain_tpu.nnet.loss.srmr_loss import dnsmos_proxy, srmr
from speechbrain_tpu.nnet.loss.stoi_loss import stoi_loss
from speechbrain_tpu.processing.features import spectral_magnitude
from speechbrain_tpu.processing.signal_processing import resynthesize


class MetricGanUBrain(GANBrain):
    """Brain for unsupervised metric-adversarial enhancement."""

    def compute_feats(self, wavs):
        """Compressed magnitude spectra (power 0.5)."""
        feats = self.hparams.compute_STFT(wavs)
        return spectral_magnitude(feats, power=0.5)

    def compute_forward(self, batch, stage):
        """Noisy wav -> (enhanced magnitude, enhanced waveform)."""
        noisy_wavs = batch["noisy_sig"]
        noisy_mag = self.compute_feats(noisy_wavs)
        mask = self.modules.generator(
            noisy_mag, lengths=batch["noisy_sig_lens"],
            train=stage == Stage.TRAIN,
        )
        mask = jnp.maximum(mask, self.hparams.min_mask)
        enhanced_mag = mask * noisy_mag
        enhanced_wav = resynthesize(
            enhanced_mag,
            noisy_wavs,
            self.hparams.compute_STFT,
            self.hparams.compute_ISTFT,
        )
        return enhanced_mag, enhanced_wav

    def _disc_score(self, mag):
        return self.modules.discriminator(mag[..., None])[:, 0]

    def _target_score(self, wav):
        """Bounded non-intrusive score in [0, 1).

        ``target_metric: srmr`` -> srmr/(srmr+beta);
        ``target_metric: dnsmos`` -> the native DNSMOS proxy
        (srmr + spectral-flatness composite, srmr_loss.dnsmos_proxy).
        """
        if self.hparams.target_metric == "dnsmos":
            return dnsmos_proxy(wav, reduction="batch")
        s = srmr(wav, reduction="batch")
        return s / (s + self.hparams.srmr_beta)

    def compute_disc_loss(self, predictions, batch, stage):
        """D regresses the true SRMR score of enhanced + noisy alone."""
        enhanced_mag, enhanced_wav = predictions
        mask = batch["batch_mask"]
        noisy_mag = self.compute_feats(batch["noisy_sig"])
        enh_mag_sg = jax.lax.stop_gradient(enhanced_mag)
        enh_wav_sg = jax.lax.stop_gradient(enhanced_wav)
        est_enh = self._disc_score(enh_mag_sg)
        est_noisy = self._disc_score(noisy_mag)
        t_enh = jax.lax.stop_gradient(self._target_score(enh_wav_sg))
        t_noisy = jax.lax.stop_gradient(
            self._target_score(batch["noisy_sig"])
        )
        denom = jnp.maximum(mask.sum(), 1)
        return (
            ((est_enh - t_enh) ** 2 * mask).sum()
            + ((est_noisy - t_noisy) ** 2 * mask).sum()
        ) / denom

    def compute_gen_loss(self, predictions, batch, stage):
        """G maximizes the predicted non-intrusive score."""
        enhanced_mag, _ = predictions
        mask = batch["batch_mask"]
        est = self._disc_score(enhanced_mag)
        return ((est - self.hparams.target_score) ** 2 * mask).sum() / (
            jnp.maximum(mask.sum(), 1)
        )

    def on_stage_start(self, stage, epoch=None):
        """STOI (intrusive, reporting only) + SRMR metrics off-train."""
        if stage != Stage.TRAIN:
            from speechbrain_tpu.utils.metric_stats import MetricStats

            self.stoi_metric = MetricStats(metric=stoi_loss)
            self.srmr_scores = []

    def compute_objectives(self, predictions, batch, stage):
        """Eval objective = generator loss (+STOI/SRMR tracking)."""
        loss = self.compute_gen_loss(predictions, batch, stage)
        if stage != Stage.TRAIN and hasattr(self, "stoi_metric"):
            _, enhanced_wav = predictions
            real = int(np.asarray(batch["batch_mask"]).sum())
            self.stoi_metric.append(
                [str(i) for i in range(real)],
                np.asarray(enhanced_wav)[:real],
                np.asarray(batch["clean_sig"])[:real],
                np.asarray(batch["clean_sig_lens"])[:real],
            )
            self.srmr_scores.extend(
                np.asarray(srmr(enhanced_wav, reduction="batch"))[
                    :real
                ].tolist()
            )
        return loss

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Log stats, keep max-srmr checkpoints."""
        if stage == Stage.TRAIN:
            return
        stoi = -self.stoi_metric.summarize("average")
        srmr_avg = float(np.mean(self.srmr_scores))
        stats = {"loss": stage_loss, "stoi": stoi, "srmr": srmr_avg}
        if stage == Stage.VALID:
            self.hparams.train_logger.log_stats(
                {"epoch": epoch},
                train_stats={"loss": self.avg_train_loss},
                valid_stats=stats,
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"srmr": srmr_avg}, max_keys=["srmr"]
                )
        else:
            self.hparams.train_logger.log_stats(
                {"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats=stats,
            )


def dataio_prep(hparams):
    """Noisy (+clean for reporting) datasets."""
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
    brain = MetricGanUBrain(
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
