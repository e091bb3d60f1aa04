#!/usr/bin/env python3
"""Frame-level VAD training on LibriParty (TPU-native).

    python train.py hparams/train.yaml --data_folder /data/LibriParty

Mirrors the reference ``recipes/LibriParty/VAD/train.py``: CRDNN frame
classifier over Fbank features with BCE against binary speech targets
derived from the LibriParty ``speech`` interval annotations.  The
on-the-fly noise/speech augmentation of the reference maps to the
PRNG-explicit augmenters in ``processing.speech_augmentation`` and is
off by default (enable via the ``augmentation`` hparam).
"""

import sys

import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import bce_loss


class VADBrain(sb.Brain):
    """Brain for per-frame speech/non-speech classification."""

    def compute_forward(self, batch, stage):
        """Wav -> Fbank -> CRDNN -> per-frame logits."""
        feats = self.hparams.compute_features(batch["signal"])
        feats = self.hparams.normalize(
            feats, batch["signal_lens"], training=False
        )
        out = self.modules.model(
            feats, lengths=batch["signal_lens"]
        )
        return self.modules.out_lin(out)[..., 0]  # (B, frames)

    def compute_objectives(self, predictions, batch, stage):
        """Frame BCE over valid frames (targets right-padded)."""
        targets = batch["target"]
        T = min(predictions.shape[1], targets.shape[1])
        return bce_loss(
            predictions[:, :T],
            targets[:, :T],
            length=batch["target_lens"] * batch["batch_mask"],
        )

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Log + checkpoint on valid."""
        if stage == Stage.VALID:
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": self.lr},
                train_stats={"loss": self.avg_train_loss},
                valid_stats={"loss": stage_loss},
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"loss": stage_loss}, min_keys=["loss"]
                )


def dataio_prep(hparams):
    """Datasets yielding (chunked signal, frame targets).

    LibriParty metadata: ``{id: {"file": wav, "speech": [[s, e], ...]}}``
    with seconds-valued intervals (the reference's pre-generated
    metadata format).
    """
    from speechbrain_tpu.dataio.dataio import read_audio

    sr = hparams["sample_rate"]
    frame_hop = hparams["hop_length"] / 1000.0
    chunk = int(hparams["example_length"] * sr)
    datasets = {}
    for split in ("train", "valid", "test"):
        ds = DynamicItemDataset.from_json(hparams[f"{split}_json"])

        def pipeline(file, speech):
            sig = read_audio(file)
            sig = sig[:chunk]
            if len(sig) < chunk:
                sig = np.pad(sig, (0, chunk - len(sig)))
            n_frames = int(len(sig) / sr / frame_hop) + 1
            target = np.zeros(n_frames, np.float32)
            for seg in speech:
                s = int(float(seg[0]) / frame_hop)
                e = int(float(seg[1]) / frame_hop) + 1
                target[s:n_frames if e > n_frames else e] = 1.0
            return sig, target

        ds.add_dynamic_item(
            pipeline,
            takes=["file", "speech"],
            provides=["signal", "target"],
        )
        ds.set_output_keys(["id", "signal", "target"])
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
    datasets = dataio_prep(hparams)
    brain = VADBrain(
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
        min_key="loss",
    )
