#!/usr/bin/env python3
"""wav2vec 2.0 self-supervised pretraining on LibriSpeech (TPU-native).

    python train.py hparams/wav2vec2_base.yaml --data_folder /data/LibriSpeech

Mirrors the reference
``recipes/LibriSpeech/self-supervised-learning/wav2vec2/train_sb_wav2vec2.py``
(which drives the native model in ``lobes/models/wav2vec.py``):
convolutional latent extractor, Gumbel-quantized targets, masked
transformer encoder, contrastive loss + diversity penalty.  Random
fixed-length crops give XLA one compiled program.
"""

import sys

import jax.numpy as jnp
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.lobes.models.wav2vec import (
    compute_mask,
    sample_negatives,
)
from speechbrain_tpu.nnet.losses import ContrastiveLoss


class W2VBrain(sb.Brain):
    """Brain for contrastive wav2vec2 pretraining."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.loss_fn = ContrastiveLoss(
            logit_temp=self.hparams.logit_temp
        )

    def compute_forward(self, batch, stage):
        """Wav -> latents -> (masked contextual proj, quantized targets)."""
        latents = self.modules.extractor(batch["sig"])
        B, T, _ = latents.shape
        mask = compute_mask(
            (B, T), [T] * B,
            mask_prob=self.hparams.mask_prob,
            mask_length=self.hparams.mask_length,
            seed=int(self.step),
        )
        targets, meta = self.modules.quantiser(latents)
        enc = self.modules.encoder(
            latents, mask=jnp.asarray(mask)
        )["embeddings"]
        proj = self.modules.proj(enc)
        negatives = sample_negatives(
            targets,
            num_neg=self.hparams.num_negatives,
            key=self._bound_rngs["augment"],
        )
        return proj, targets, negatives, meta

    def compute_objectives(self, predictions, batch, stage):
        """Contrastive + diversity objective."""
        proj, targets, negatives, meta = predictions
        loss = self.loss_fn(proj, targets, negatives)
        return (
            loss
            + self.hparams.diversity_weight * meta["diversity_loss"]
        )

    def on_fit_batch_end(self, batch, outputs, loss, should_step):
        """Noam warmup per optimizer step."""
        if should_step:
            _, self.lr = self.hparams.noam_annealing()

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Log + checkpoint by pretraining loss."""
        if stage != Stage.VALID:
            return
        self.hparams.train_logger.log_stats(
            {"epoch": epoch, "lr": getattr(self, "lr", 0.0)},
            train_stats={"loss": self.avg_train_loss},
            valid_stats={"loss": stage_loss},
        )
        if self.checkpointer is not None:
            self.checkpointer.save_and_keep_only(
                meta={"loss": stage_loss}, min_keys=["loss"]
            )


def dataio_prepare(hparams):
    """Fixed-length random crops of raw audio."""
    from speechbrain_tpu.dataio.dataio import read_audio

    crop = int(hparams["crop_seconds"] * hparams["sample_rate"])
    rng = np.random.default_rng(hparams["seed"])
    datasets = {}
    for split, path in (
        ("train", hparams["train_json"]),
        ("valid", hparams["valid_json"]),
    ):
        ds = DynamicItemDataset.from_json(path)

        def audio_pipeline(wav):
            sig = read_audio(wav)
            if len(sig) > crop:
                start = rng.integers(0, len(sig) - crop)
                sig = sig[start : start + crop]
            else:
                sig = np.pad(sig, (0, crop - len(sig)))
            return sig.astype(np.float32)

        ds.add_dynamic_item(audio_pipeline, takes="wav", provides="sig")
        ds.set_output_keys(["id", "sig"])
        datasets[split] = ds
    return datasets


if __name__ == "__main__":
    hparams_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])
    from speechbrain_tpu.utils.checkpoints import Checkpointer
    from speechbrain_tpu.utils.distributed import ddp_init_group, run_on_main
    from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

    ddp_init_group(run_opts)
    with open(hparams_file) as f:
        hparams = load_hyperpyyaml(f, overrides)
    sb.create_experiment_directory(
        hparams["output_folder"], hparams_file, overrides
    )
    sys.path.append("../../../")
    from recipes.LibriSpeech.librispeech_prepare import (
        prepare_librispeech,
    )

    run_on_main(
        prepare_librispeech,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
            "tr_splits": hparams["train_splits"],
            "dev_splits": hparams["dev_splits"],
            "te_splits": [],
            "merge_lst": hparams["train_splits"],
            "merge_name": "train.json",
        },
    )
    datasets = dataio_prepare(hparams)
    brain = W2VBrain(
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
