#!/usr/bin/env python3
"""SepFormer separation on WHAM! / WHAMR! (TPU-native).

    python train.py hparams/sepformer-wham.yaml --data_folder /data/wham

Mirrors the reference ``recipes/WHAMandWHAMR/separation/train.py``:
wsj0-2mix layout with WHAM! noise (``mix_both``; WHAMR! adds reverb —
same manifests, the corpus bakes reverb into the wavs), SepFormer
masker, permutation-invariant SI-SNR, fixed-length crops.  Setting
``num_spks: 1`` with ``sepformer-enhancement.yaml`` turns the same
pipeline into denoising (the reference's enhancement subdir).
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
    """Brain for PIT SI-SNR separation/denoising training."""

    def compute_forward(self, batch, stage):
        """Noisy mixture -> (B, T, num_spks) source estimates."""
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


def prepare_wham(data_folder, save_folder, num_spks=2, sample_rate=8000):
    """Build JSON manifests from a WHAM!/WHAMR! tree
    (``<root>/wav8k/min/{tr,cv,tt}/{mix_both,s1,s2,noise}``) —
    the reference's create_wham_whamr_csv, JSON-native.
    """
    os.makedirs(save_folder, exist_ok=True)
    from speechbrain_tpu.dataio.dataio import read_audio

    rate_dir = "wav8k" if sample_rate == 8000 else "wav16k"
    root = os.path.join(data_folder, rate_dir, "min")
    for split in ("tr", "cv", "tt"):
        out = os.path.join(save_folder, f"wham_{split}.json")
        if os.path.exists(out):
            continue
        mix_dir = os.path.join(root, split, "mix_both")
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
                "noise_wav": os.path.join(root, split, "noise", fn),
            }
            for i in range(1, num_spks + 1):
                entry[f"s{i}_wav"] = os.path.join(
                    root, split, f"s{i}", fn
                )
            manifest[os.path.splitext(fn)[0]] = entry
        with open(out, "w") as f:
            json.dump(manifest, f, indent=2)


def _dynamic_mix_pipeline(hparams, ds, rng, num_spks, crop, src_keys):
    """On-the-fly mixture synthesis (the reference's dynamic mixing,
    ``recipes/WHAMandWHAMR/*/dynamic_mixing.py``): each train access
    draws ``num_spks`` random source utterances + this example's noise,
    applies random gains, crops to fixed length and remixes.  Host-side
    numpy (runs in the prefetch workers), device shapes stay static."""
    from speechbrain_tpu.dataio.dataio import read_audio

    with open(hparams["train_data"]) as f:
        manifest = json.load(f)
    all_sources = [
        e[k] for e in manifest.values() for k in src_keys if k in e
    ]

    def fixed_crop(sig):
        n = len(sig)
        if n > crop:
            start = int(rng.integers(0, n - crop))
            return sig[start : start + crop]
        return np.pad(sig, (0, crop - n))

    def dm_pipeline(noise_wav):
        sources = []
        for _ in range(num_spks):
            s = fixed_crop(read_audio(all_sources[int(rng.integers(len(all_sources)))]))
            gain_db = float(rng.uniform(-5.0, 5.0))
            sources.append(s * (10.0 ** (gain_db / 20.0)))
        noise = fixed_crop(read_audio(noise_wav))
        mix = np.sum(sources, axis=0) + noise
        peak = max(float(np.abs(mix).max()), 1e-6)
        scale = min(1.0, 0.9 / peak)
        mix = (mix * scale).astype(np.float32)
        return tuple([mix] + [(s * scale).astype(np.float32) for s in sources])

    ds.add_dynamic_item(
        dm_pipeline,
        takes=["noise_wav"],
        provides=["mix_sig"] + [f"s{i + 1}_sig" for i in range(num_spks)],
    )


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

        if split == "train" and hparams.get("dynamic_mixing", False):
            _dynamic_mix_pipeline(
                hparams, ds, rng, num_spks, crop, src_keys
            )
            ds.set_output_keys(["id", "mix_sig"] + out_keys)
            datasets[split] = ds
            continue

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
        prepare_wham,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
            "num_spks": hparams["num_spks"],
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
