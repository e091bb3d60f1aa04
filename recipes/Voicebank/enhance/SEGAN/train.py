#!/usr/bin/env python3
"""SEGAN time-domain enhancement on VoiceBank-DEMAND (TPU-native).

    python train.py hparams/train.yaml --data_folder /data/VoiceBank

Mirrors the reference ``recipes/Voicebank/enhance/SEGAN/train.py``
(SEGAN, arXiv:1703.09452): a U-Net waveform generator with latent
noise enhances fixed-length chunks; an LSGAN discriminator judges
(candidate, noisy) pairs; the generator adds an L1 reconstruction
term.  Both optimizer updates run in ONE fused jitted step
(``speechbrain_tpu.gan``).
"""

import sys

import jax.numpy as jnp
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.gan import GANBrain
from speechbrain_tpu.lobes.models.segan_model import d_loss, g_loss
from speechbrain_tpu.nnet.loss.stoi_loss import stoi_loss


class SeganBrain(GANBrain):
    """Brain for SEGAN adversarial enhancement."""

    def compute_forward(self, batch, stage):
        """Noisy chunk -> enhanced chunk."""
        return self.modules.generator(
            batch["noisy_sig"], train=stage == Stage.TRAIN
        )

    def _disc(self, candidate, noisy):
        x = jnp.stack([candidate, noisy], axis=-1)
        return self.modules.discriminator(x)[:, 0]

    def compute_disc_loss(self, predictions, batch, stage):
        """LSGAN D loss: real (clean, noisy) vs fake (enhanced, noisy)."""
        import jax

        enhanced = jax.lax.stop_gradient(predictions)
        d_real = self._disc(batch["clean_sig"], batch["noisy_sig"])
        d_fake = self._disc(enhanced, batch["noisy_sig"])
        return d_loss(d_real, d_fake)

    def compute_gen_loss(self, predictions, batch, stage):
        """LSGAN G loss + L1 reconstruction."""
        d_fake = self._disc(predictions, batch["noisy_sig"])
        return g_loss(
            d_fake,
            predictions,
            batch["clean_sig"],
            l1_weight=self.hparams.l1_weight,
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
            real = int(np.asarray(batch["batch_mask"]).sum())
            self.stoi_metric.append(
                [str(i) for i in range(real)],
                np.asarray(predictions)[:real],
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
    """Fixed-length paired chunks (SEGAN trains on chunks)."""
    from speechbrain_tpu.dataio.dataio import read_audio

    chunk = hparams["chunk_size"]

    def chunk_pipeline(noisy_wav, clean_wav):
        noisy = read_audio(noisy_wav)
        clean = read_audio(clean_wav)
        n = min(len(noisy), len(clean))
        if n >= chunk:
            start = 0
            noisy, clean = noisy[:chunk], clean[:chunk]
        else:
            noisy = np.pad(np.asarray(noisy), (0, chunk - n))
            clean = np.pad(np.asarray(clean), (0, chunk - n))
        return (
            np.asarray(noisy, np.float32),
            np.asarray(clean, np.float32),
        )

    datasets = {}
    for split in ("train", "valid", "test"):
        ds = DynamicItemDataset.from_json(hparams[f"{split}_json"])
        ds.add_dynamic_item(
            chunk_pipeline,
            takes=["noisy_wav", "clean_wav"],
            provides=["noisy_sig", "clean_sig"],
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
    brain = SeganBrain(
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
