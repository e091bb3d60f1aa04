#!/usr/bin/env python3
"""HiFiGAN vocoder training on LibriTTS (TPU-native GANBrain).

    python train.py hparams/train.yaml --data_folder /data/LibriTTS

Mirrors the reference ``recipes/LibriTTS/vocoder/hifigan`` (multi-
speaker vocoder): the
generator upsamples mel frames to waveform; multi-period and
multi-scale discriminators drive an LSGAN objective with feature
matching and mel-L1.  Both optimizer updates run in ONE jitted step
(see ``speechbrain_tpu.gan``), replacing the reference's two torch
backward passes.
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

class HifiGanBrain(GANBrain):
    """Brain for adversarial vocoder training."""

    def compute_forward(self, batch, stage):
        """Mel frames -> waveform."""
        return self.modules.generator(batch["mel"])

    def _disc_all(self, wav):
        scores_p, feats_p = self.modules.mpd(wav)
        scores_s, feats_s = self.modules.msd(wav)
        return scores_p + scores_s, feats_p + feats_s

    def compute_disc_loss(self, predictions, batch, stage):
        """LSGAN discriminator loss on real vs generated audio."""
        y = batch["sig"]
        y_hat = jax.lax.stop_gradient(predictions)
        T = min(y.shape[1], y_hat.shape[1])
        real_scores, _ = self._disc_all(y[:, :T])
        fake_scores, _ = self._disc_all(y_hat[:, :T])
        return self.hparams.discriminator_loss(
            real_scores, fake_scores
        )["loss"]

    def compute_gen_loss(self, predictions, batch, stage):
        """Adversarial + feature-matching + mel-L1 generator loss."""
        y = batch["sig"]
        y_hat = predictions
        T = min(y.shape[1], y_hat.shape[1])
        y, y_hat = y[:, :T], y_hat[:, :T]
        fake_scores, fake_feats = self._disc_all(y_hat)
        _, real_feats = self._disc_all(y)
        mel_l1 = jnp.abs(
            self.hparams.compute_features(y_hat)
            - self.hparams.compute_features(y)
        ).mean()
        return self.hparams.generator_loss(
            fake_scores, fake_feats, real_feats, mel_l1
        )["loss"]

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Log + checkpoint on valid."""
        if stage == Stage.VALID:
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": self.lr},
                train_stats={"g_loss": self.avg_train_loss},
                valid_stats={
                    "g_loss": stage_loss,
                    "d_loss": float(self.last_disc_loss),
                },
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"g_loss": stage_loss}, min_keys=["g_loss"]
                )


def dataio_prepare(hparams):
    """Datasets yielding (waveform crop, aligned mel) pairs."""
    from speechbrain_tpu.dataio.dataio import read_audio

    compute_features = hparams["compute_features"]
    seg = int(hparams["segment_samples"])
    rng = np.random.default_rng(hparams["seed"])
    datasets = {}
    for split in ("train", "valid", "test"):
        ds = DynamicItemDataset.from_json(hparams[f"{split}_json"])

        def pipeline(wav):
            sig = read_audio(wav)
            if len(sig) > seg:
                start = int(rng.integers(0, len(sig) - seg))
                sig = sig[start : start + seg]
            else:
                sig = np.pad(sig, (0, seg - len(sig)))
            mel = compute_features(jnp.asarray(sig)[None])[0]
            return sig.astype(np.float32), np.asarray(mel)

        ds.add_dynamic_item(
            pipeline, takes="wav", provides=["sig", "mel"]
        )
        ds.set_output_keys(["id", "sig", "mel"])
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
    import sys as _sys

    _sys.path.insert(0, __file__.rsplit("/vocoder", 1)[0])
    from libritts_prepare import prepare_libritts

    run_on_main(
        prepare_libritts,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
            "train_splits": hparams["train_splits"],
            "dev_splits": hparams["dev_splits"],
            "test_splits": hparams["test_splits"],
        },
    )
    datasets = dataio_prepare(hparams)
    brain = HifiGanBrain(
        modules=hparams["modules"],
        opt_class=lambda lr: hparams["opt_class"](learning_rate=lr),
        opt_class_d=lambda lr: hparams["opt_class_d"](
            learning_rate=lr
        ),
        disc_keys=["mpd", "msd"],
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
        min_key="g_loss",
    )
