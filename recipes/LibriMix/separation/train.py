#!/usr/bin/env python3
"""SepFormer separation on LibriMix (Libri2Mix/Libri3Mix, TPU-native).

    python train.py hparams/sepformer.yaml --data_folder /data/Libri2Mix

Mirrors the reference ``recipes/LibriMix/separation/train.py``: learned
conv encoder + dual-path transformer masker, permutation-invariant
SI-SNR, fixed-length training crops.  ``use_wham_noise`` selects the
noisy mixtures (``mix_both``) for noise-robust separation.
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
        """Permutation-invariant negative SI-SNR over real rows."""
        import jax.numpy as jnp

        sources = [
            batch[f"s{i + 1}_sig"]
            for i in range(self.hparams.num_spks)
        ]
        targets = jnp.stack(sources, axis=-1)
        mask = batch["batch_mask"]
        per_ex = get_si_snr_with_pitwrapper(targets, predictions)
        per_ex = jnp.minimum(per_ex, self.hparams.loss_upper_lim)
        return (per_ex * mask).sum() / jnp.maximum(mask.sum(), 1.0)

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
        elif stage == Stage.TEST:
            self.hparams.train_logger.log_stats(
                {"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats={"si-snr": stage_loss},
            )


def prepare_librimix(
    data_folder, save_folder, num_spks=2, use_wham_noise=False,
    sample_rate=8000,
):
    """Build JSON manifests from a LibriMix tree
    (``<root>/wav8k/min/{train-*,dev,test}/{mix_clean,mix_both,s1..}``),
    mirroring the reference's prepare_librimix CSV builder.
    """
    os.makedirs(save_folder, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import read_audio

    rate_dir = "wav8k" if sample_rate == 8000 else "wav16k"
    mix_dir_name = "mix_both" if use_wham_noise else "mix_clean"
    root = os.path.join(data_folder, rate_dir, "min")
    split_names = {"train": None, "dev": "dev", "test": "test"}
    # train split dir is train-100 or train-360, whichever exists
    for cand in ("train-360", "train-100", "train"):
        if os.path.isdir(os.path.join(root, cand)):
            split_names["train"] = cand
            break
    if split_names["train"] is None:
        raise FileNotFoundError(f"No train-* split under {root}")
    for split, dirname in split_names.items():
        out = os.path.join(save_folder, f"libri{num_spks}mix_{split}.json")
        if os.path.exists(out):
            continue
        mix_dir = os.path.join(root, dirname, mix_dir_name)
        if not os.path.isdir(mix_dir):
            raise FileNotFoundError(f"Missing {mix_dir}")
        manifest = {}
        for fn in sorted(os.listdir(mix_dir)):
            if not fn.endswith(".wav"):
                continue
            entry = {
                "mix_wav": os.path.join(mix_dir, fn),
                "duration": round(
                    len(read_audio(os.path.join(mix_dir, fn)))
                    / float(sample_rate),
                    3,
                ),
            }
            for i in range(1, num_spks + 1):
                entry[f"s{i}_wav"] = os.path.join(
                    root, dirname, f"s{i}", fn
                )
            manifest[os.path.splitext(fn)[0]] = entry
        with open(out, "w") as f:
            json.dump(manifest, f, indent=2)


def dataio_prep(hparams):
    """Datasets yielding fixed-length (mix, s1..sN) training crops."""
    from speechbrain_tpu.dataio.dataio import read_audio

    num_spks = hparams["num_spks"]
    crop = int(hparams["training_signal_len"])
    rng = np.random.default_rng(hparams["seed"])
    src_keys = [f"s{i + 1}_wav" for i in range(num_spks)]
    out_keys = [f"s{i + 1}_sig" for i in range(num_spks)]
    datasets = {}
    for split, path in [
        ("train", hparams["train_data"]),
        ("valid", hparams["valid_data"]),
        ("test", hparams["test_data"]),
    ]:
        ds = DynamicItemDataset.from_json(path)

        def audio_pipeline(mix_wav, *src_wavs, split=split):
            sigs = [read_audio(mix_wav)] + [
                read_audio(w) for w in src_wavs
            ]
            n = min(len(s) for s in sigs)
            sigs = [s[:n] for s in sigs]
            if split == "train" and hparams["limit_training_signal_len"]:
                if n > crop:
                    start = int(rng.integers(0, n - crop))
                    sigs = [s[start : start + crop] for s in sigs]
                else:
                    sigs = [np.pad(s, (0, crop - n)) for s in sigs]
            return tuple(sigs)

        ds.add_dynamic_item(
            audio_pipeline,
            takes=["mix_wav"] + src_keys,
            provides=["mix_sig"] + out_keys,
        )
        ds.set_output_keys(["id", "mix_sig"] + out_keys)
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
        prepare_librimix,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
            "num_spks": hparams["num_spks"],
            "use_wham_noise": hparams["use_wham_noise"],
            "sample_rate": hparams["sample_rate"],
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
