#!/usr/bin/env python3
"""MetricGAN+ enhancement on VoiceBank-DEMAND (TPU-native).

    python train.py hparams/train.yaml --data_folder /data/VoiceBank

Mirrors the reference ``recipes/Voicebank/enhance/MetricGAN/train.py``:
a BLSTM mask generator is trained against a CNN *metric* discriminator
that learns to predict a perceptual score of (enhanced, clean) pairs;
the generator maximizes the predicted score (MetricGAN+,
arXiv:2104.03538).

TPU-native twist: with ``target_metric: stoi`` the score target is the
native *differentiable* STOI surrogate (``nnet/loss/stoi_loss.py``)
computed inside the jitted step — no host round-trip, no external pesq
process pool (the reference runs PESQ in a multiprocessing pool,
``MetricGAN/train.py:30-35``).  Both optimizer updates run in ONE
fused jitted step (``speechbrain_tpu.gan``) instead of the reference's
alternating D/G epochs with a replay buffer.
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
from speechbrain_tpu.nnet.loss.stoi_loss import stoi_loss
from speechbrain_tpu.processing.features import spectral_magnitude
from speechbrain_tpu.processing.signal_processing import resynthesize


class MetricGanBrain(GANBrain):
    """Brain for metric-adversarial enhancement."""

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

    def _disc_score(self, mag_a, mag_b):
        x = jnp.stack([mag_a, mag_b], axis=-1)
        return self.modules.discriminator(x)[:, 0]

    def _target_score(self, est_wav, clean_wav, lens):
        """Per-utterance metric score in [0, 1] (stoi surrogate)."""
        if self.hparams.target_metric != "stoi":
            raise ValueError(
                "only the native differentiable 'stoi' target is "
                "supported (reference 'pesq' needs the external pesq "
                "process pool)"
            )
        return -stoi_loss(est_wav, clean_wav, lens, reduction="batch")

    def compute_disc_loss(self, predictions, batch, stage):
        """D regresses the true metric of enhanced + clean pairs."""
        enhanced_mag, enhanced_wav = predictions
        clean_wavs = batch["clean_sig"]
        clean_mag = self.compute_feats(clean_wavs)
        mask = batch["batch_mask"]
        lens = batch["clean_sig_lens"]
        enh_mag_sg = jax.lax.stop_gradient(enhanced_mag)
        enh_wav_sg = jax.lax.stop_gradient(enhanced_wav)
        est_enh = self._disc_score(enh_mag_sg, clean_mag)
        est_clean = self._disc_score(clean_mag, clean_mag)
        t_enh = jax.lax.stop_gradient(
            self._target_score(enh_wav_sg, clean_wavs, lens)
        )
        loss_enh = ((est_enh - t_enh) ** 2 * mask).sum() / jnp.maximum(
            mask.sum(), 1
        )
        loss_clean = ((est_clean - 1.0) ** 2 * mask).sum() / jnp.maximum(
            mask.sum(), 1
        )
        return loss_enh + loss_clean

    def compute_gen_loss(self, predictions, batch, stage):
        """G maximizes the predicted metric of its output."""
        enhanced_mag, _ = predictions
        clean_mag = self.compute_feats(batch["clean_sig"])
        mask = batch["batch_mask"]
        est = self._disc_score(enhanced_mag, clean_mag)
        return ((est - self.hparams.target_score) ** 2 * mask).sum() / (
            jnp.maximum(mask.sum(), 1)
        )

    def on_stage_start(self, stage, epoch=None):
        """STOI metric off-train."""
        if stage != Stage.TRAIN:
            from speechbrain_tpu.utils.metric_stats import MetricStats

            self.stoi_metric = MetricStats(metric=stoi_loss)

    def compute_objectives(self, predictions, batch, stage):
        """Eval objective = generator loss (+STOI tracking)."""
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
        return loss

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Log stats, keep max-stoi checkpoints."""
        if stage == Stage.TRAIN:
            return
        stoi = -self.stoi_metric.summarize("average")
        stats = {"loss": stage_loss, "stoi": stoi}
        if stage == Stage.VALID:
            self.hparams.train_logger.log_stats(
                {"epoch": epoch},
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
    brain = MetricGanBrain(
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
        max_key="stoi",
    )
