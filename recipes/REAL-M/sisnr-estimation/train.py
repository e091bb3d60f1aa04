#!/usr/bin/env python3
"""Blind SI-SNR estimation for real-world mixtures (REAL-M, TPU-native).

    python train.py hparams/pool_sisnrestimator.yaml --data_folder /data/wsj0-mix

Mirrors the reference ``recipes/REAL-M/sisnr-estimation/train.py``: a
neural estimator consumes (separated estimate, mixture) pairs and
regresses the oracle SI-SNR (compressed to [0, 1]), so separation
quality can be judged on real mixtures with no ground truth.  The
reference draws estimates from a pool of pretrained separators; this
build synthesizes estimates by degrading the oracle sources with
controlled cross-talk and noise, which spans the same SI-SNR range
without requiring hub checkpoints (plug a trained separator into
``estimate_fn`` for the reference behavior).
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import cal_si_snr


class SISNREstimator(sb.Brain):
    """Brain for blind SI-SNR estimation."""

    def _degrade(self, targets, mix, key):
        """Synthetic 'separator outputs': sources + random cross-talk
        + noise, spanning a wide oracle-SI-SNR range."""
        k1, k2 = jax.random.split(key)
        B = targets.shape[0]
        alpha = jax.random.uniform(k1, (B, 1, 1), minval=0.0, maxval=0.8)
        cross = jnp.flip(targets, axis=-1)
        noise = 0.05 * jax.random.normal(k2, targets.shape)
        est = (1 - alpha) * targets + alpha * cross + noise
        return est

    def compute_forward(self, batch, stage):
        """(mix, sources) -> (snr_hat, compressed oracle snr)."""
        mix = batch["mix_sig"]
        targets = jnp.stack(
            [batch["s1_sig"], batch["s2_sig"]], axis=-1
        )
        est = self._degrade(
            targets, mix, self._bound_rngs["augment"]
        )
        # Oracle SI-SNR per (example, source), in dB.  cal_si_snr is
        # reference-layout: (T, B, S) in, negative si-snr (1, B, S) out.
        snr = -cal_si_snr(
            jnp.moveaxis(targets, 1, 0), jnp.moveaxis(est, 1, 0)
        )[0]  # (B, S)
        snr_compressed = jnp.clip(
            (snr - self.hparams.snr_low)
            / (self.hparams.snr_high - self.hparams.snr_low),
            0.0,
            1.0,
        )
        # Estimator input: [estimate; mixture] as 2 channels, sources
        # folded into the batch.
        B, T, S = est.shape
        est_rows = jnp.moveaxis(est, -1, 1).reshape(B * S, T)
        mix_rows = jnp.tile(mix, (S, 1))
        inp = jnp.stack([est_rows, mix_rows], axis=-1)  # (B*S, T, 2)
        emb = self.modules.encoder(inp)
        snr_hat = jax.nn.sigmoid(
            self.modules.encoder_out(emb[:, 0])[:, 0]
        )
        return snr_hat, snr_compressed.T.reshape(-1)

    def compute_objectives(self, predictions, batch, stage):
        """L1 between estimated and oracle compressed SI-SNR."""
        snr_hat, snr_compressed = predictions
        mask = jnp.tile(batch["batch_mask"], (2,))
        err = jnp.abs(snr_hat - snr_compressed) * mask
        loss = err.sum() / jnp.maximum(mask.sum(), 1.0)
        if stage != Stage.TRAIN and hasattr(self, "l1_errors"):
            real = mask.sum()
            self.l1_errors.append(
                (float(err.sum()), float(real))
            )
        return loss

    def on_stage_start(self, stage, epoch=None):
        """L1 accumulator off-train."""
        if stage != Stage.TRAIN:
            self.l1_errors = []

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Log + checkpoint by L1."""
        if stage == Stage.TRAIN:
            return
        tot = sum(e for e, _ in self.l1_errors)
        n = sum(n for _, n in self.l1_errors)
        l1 = tot / max(n, 1.0)
        if stage == Stage.VALID:
            self.hparams.train_logger.log_stats(
                {"epoch": epoch},
                train_stats={"loss": self.avg_train_loss},
                valid_stats={"loss": stage_loss, "si-snr-l1": l1},
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"si-snr-l1": l1}, min_keys=["si-snr-l1"]
                )
        else:
            self.hparams.train_logger.log_stats(
                {"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats={"loss": stage_loss, "si-snr-l1": l1},
            )


def prepare_wsjmix(data_folder, save_folder, num_spks=2):
    """wsj0-mix style manifests (same layout as recipes/WSJ0Mix)."""
    os.makedirs(save_folder, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import read_audio

    for split in ("tr", "cv", "tt"):
        out = os.path.join(save_folder, f"wsj_{split}.json")
        if os.path.exists(out):
            continue
        mix_dir = os.path.join(data_folder, split, "mix")
        if not os.path.isdir(mix_dir):
            raise FileNotFoundError(f"Missing {mix_dir}")
        manifest = {}
        for fn in sorted(os.listdir(mix_dir)):
            if not fn.endswith(".wav"):
                continue
            entry = {
                "mix_wav": os.path.join(mix_dir, fn),
                "duration": round(
                    len(read_audio(os.path.join(mix_dir, fn))) / 8000.0,
                    3,
                ),
            }
            for i in range(1, num_spks + 1):
                entry[f"s{i}_wav"] = os.path.join(
                    data_folder, split, f"s{i}", fn
                )
            manifest[os.path.splitext(fn)[0]] = entry
        with open(out, "w") as f:
            json.dump(manifest, f, indent=2)


def dataio_prep(hparams):
    """Fixed-length (mix, s1, s2) crops."""
    from speechbrain_tpu.dataio.dataio import read_audio

    crop = int(hparams["training_signal_len"])
    rng = np.random.default_rng(hparams["seed"])
    datasets = {}
    for split, path in [
        ("train", hparams["train_data"]),
        ("valid", hparams["valid_data"]),
        ("test", hparams["test_data"]),
    ]:
        ds = DynamicItemDataset.from_json(path)

        def audio_pipeline(mix_wav, s1_wav, s2_wav):
            mix = read_audio(mix_wav)
            s1 = read_audio(s1_wav)
            s2 = read_audio(s2_wav)
            n = min(len(mix), len(s1), len(s2))
            mix, s1, s2 = mix[:n], s1[:n], s2[:n]
            if n > crop:
                start = int(rng.integers(0, n - crop))
                mix = mix[start : start + crop]
                s1 = s1[start : start + crop]
                s2 = s2[start : start + crop]
            else:
                mix = np.pad(mix, (0, crop - n))
                s1 = np.pad(s1, (0, crop - n))
                s2 = np.pad(s2, (0, crop - n))
            return mix, s1, s2

        ds.add_dynamic_item(
            audio_pipeline,
            takes=["mix_wav", "s1_wav", "s2_wav"],
            provides=["mix_sig", "s1_sig", "s2_sig"],
        )
        ds.set_output_keys(["id", "mix_sig", "s1_sig", "s2_sig"])
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
        prepare_wsjmix,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
        },
    )
    datasets = dataio_prep(hparams)
    brain = SISNREstimator(
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
        min_key="si-snr-l1",
    )
