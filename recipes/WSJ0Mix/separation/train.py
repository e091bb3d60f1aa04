#!/usr/bin/env python3
"""SepFormer separation on WSJ0-2mix (PIT SI-SNR, TPU-native).

    python train.py hparams/sepformer.yaml --data_folder /data/wsj0-mix

Mirrors the reference ``recipes/WSJ0Mix/separation/train.py``: learned
conv encoder + dual-path transformer masker, permutation-invariant
SI-SNR objective, fixed-length training crops (static shapes for XLA).
"""

import json
import os
import sys

import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import get_si_snr_with_pitwrapper


class Separation(sb.Brain):
    """Brain for PIT SI-SNR separation training."""

    def compute_forward(self, batch, stage):
        """Mixture -> (B, T, num_spks) source estimates."""
        return self.modules.masknet(batch["mix_sig"])

    def compute_objectives(self, predictions, batch, stage):
        """Permutation-invariant negative SI-SNR, masked over padding
        rows (dummy examples get zero weight)."""
        import jax.numpy as jnp

        targets = jnp.stack(
            [batch["s1_sig"], batch["s2_sig"]], axis=-1
        )
        mask = batch["batch_mask"]
        per_ex = get_si_snr_with_pitwrapper(targets, predictions)
        # Clamp pathological examples (reference loss_upper_lim guard).
        per_ex = jnp.minimum(per_ex, self.hparams.loss_upper_lim)
        return (per_ex * mask).sum() / jnp.maximum(mask.sum(), 1.0)

    def on_fit_batch_end(self, batch, outputs, loss, should_step):
        """No per-batch scheduling (plateau scheduler runs per epoch)."""

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Halve lr on plateau; log + checkpoint on valid."""
        if stage == Stage.VALID:
            _, new_lr = self.hparams.lr_scheduler(
                self.lr, current_epoch=epoch, current_loss=stage_loss
            )
            self.lr = new_lr
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": self.lr},
                train_stats={"si-snr": self.avg_train_loss},
                valid_stats={"si-snr": stage_loss},
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"si-snr": stage_loss}, min_keys=["si-snr"]
                )


def prepare_wsjmix(data_folder, save_folder, num_spks=2):
    """Build JSON manifests from a wsj0-mix tree
    (``<root>/{tr,cv,tt}/mix/*.wav`` with matching ``s1``/``s2`` dirs) —
    the reference's prepare_wsjmix CSV builder, JSON-native.
    """
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
                "mix_wav": os.path.join(data_folder, split, "mix", fn),
                "duration": round(
                    len(read_audio(os.path.join(mix_dir, fn))) / 8000.0, 3
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
    """Datasets yielding fixed-length (mix, s1, s2) training crops."""
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

        def audio_pipeline(mix_wav, s1_wav, s2_wav, split=split):
            mix = read_audio(mix_wav)
            s1 = read_audio(s1_wav)
            s2 = read_audio(s2_wav)
            n = min(len(mix), len(s1), len(s2))
            mix, s1, s2 = mix[:n], s1[:n], s2[:n]
            if split == "train" and hparams["limit_training_signal_len"]:
                if n > crop:
                    start = int(rng.integers(0, n - crop))
                    mix = mix[start : start + crop]
                    s1 = s1[start : start + crop]
                    s2 = s2[start : start + crop]
                else:
                    pad = crop - n
                    mix = np.pad(mix, (0, pad))
                    s1 = np.pad(s1, (0, pad))
                    s2 = np.pad(s2, (0, pad))
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
            "num_spks": hparams["num_spks"],
        },
    )
    datasets = dataio_prep(hparams)
    brain = Separation(
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
    brain.evaluate(
        SaveableDataLoader(
            datasets["test"], batch_size=hparams["batch_size"]
        ),
        min_key="si-snr",
    )
