#!/usr/bin/env python3
"""Binaural (2-channel) speech separation on binaural-wsj0mix (TPU-native).

    python train.py hparams/convtasnet-independent.yaml \
        --data_folder /data/binaural-wsj0mix/2speakers

Mirrors the reference ``recipes/BinauralWSJ0Mix/separation/train.py``
"independent" configuration: a Conv-TasNet masker is applied to each
ear's channel with shared weights, sources are estimated per channel,
and the PIT SI-SNR permutation is shared across the two ears (channels
are folded into the time axis for the loss, which ties the
permutation).
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
    """Brain for binaural PIT SI-SNR separation."""

    def compute_forward(self, batch, stage):
        """Stereo mixture (B, T, 2) -> estimates (B, T, 2, num_spks)."""
        import jax.numpy as jnp

        mix = batch["mix_sig"]  # (B, T, 2)
        if self.hparams.binaural_model:
            # BinauralConvTasNet consumes the stereo pair jointly
            # (independent/parallel/cross modes).
            return self.modules.masknet(mix)
        B, T, C = mix.shape
        mono = jnp.moveaxis(mix, -1, 1).reshape(B * C, T)
        est = self.modules.masknet(mono)  # (B*C, T, S)
        S = est.shape[-1]
        return jnp.moveaxis(est.reshape(B, C, T, S), 1, 2)

    def compute_objectives(self, predictions, batch, stage):
        """PIT SI-SNR with the permutation shared across ears."""
        import jax.numpy as jnp

        sources = [
            batch[f"s{i + 1}_sig"]  # (B, T, 2)
            for i in range(self.hparams.num_spks)
        ]
        targets = jnp.stack(sources, axis=-1)  # (B, T, 2, S)
        B, T, C, S = targets.shape
        # Fold channels into time: one permutation per example.
        targets = targets.reshape(B, T * C, S)
        est = predictions.reshape(B, T * C, S)
        mask = batch["batch_mask"]
        per_ex = get_si_snr_with_pitwrapper(targets, est)
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


def prepare_binaural_wsjmix(data_folder, save_folder, num_spks=2):
    """Build JSON manifests from a binaural-wsj0mix tree
    (``<root>/{tr,cv,tt}/mix/*.wav`` stereo + matching ``s1``/``s2``).
    """
    os.makedirs(save_folder, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import read_audio_multichannel

    for split in ("tr", "cv", "tt"):
        out = os.path.join(save_folder, f"binaural_{split}.json")
        if os.path.exists(out):
            continue
        mix_dir = os.path.join(data_folder, split, "mix")
        if not os.path.isdir(mix_dir):
            raise FileNotFoundError(f"Missing {mix_dir}")
        manifest = {}
        for fn in sorted(os.listdir(mix_dir)):
            if not fn.endswith(".wav"):
                continue
            sig = read_audio_multichannel(os.path.join(mix_dir, fn))
            entry = {
                "mix_wav": os.path.join(mix_dir, fn),
                "duration": round(sig.shape[0] / 8000.0, 3),
            }
            for i in range(1, num_spks + 1):
                entry[f"s{i}_wav"] = os.path.join(
                    data_folder, split, f"s{i}", fn
                )
            manifest[os.path.splitext(fn)[0]] = entry
        with open(out, "w") as f:
            json.dump(manifest, f, indent=2)


def dataio_prep(hparams):
    """Datasets yielding fixed-length stereo (mix, s1..sN) crops."""
    from speechbrain_tpu.dataio.dataio import read_audio_multichannel

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
            sigs = [np.asarray(read_audio_multichannel(mix_wav))] + [
                np.asarray(read_audio_multichannel(w)) for w in src_wavs
            ]
            n = min(s.shape[0] for s in sigs)
            sigs = [s[:n] for s in sigs]
            if split == "train" and hparams["limit_training_signal_len"]:
                if n > crop:
                    start = int(rng.integers(0, n - crop))
                    sigs = [s[start : start + crop] for s in sigs]
                else:
                    sigs = [
                        np.pad(s, ((0, crop - n), (0, 0))) for s in sigs
                    ]
            return tuple(s.astype(np.float32) for s in sigs)

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
        prepare_binaural_wsjmix,
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
