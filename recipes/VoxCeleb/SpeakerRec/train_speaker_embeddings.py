#!/usr/bin/env python3
"""VoxCeleb ECAPA-TDNN speaker embedding training (AAM-softmax).

    python train_speaker_embeddings.py hparams/train_ecapa_tdnn.yaml \
        --data_folder /data/VoxCeleb
"""

import sys

import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset


class SpeakerBrain(sb.Brain):
    def compute_forward(self, batch, stage):
        wavs, lens = batch["sig"], batch["sig_lens"]
        if stage == Stage.TRAIN and hasattr(self.hparams, "augmentation"):
            wavs, lens = self.hparams.augmentation(
                wavs, lens, self._bound_rngs["augment"]
            )
        feats = self.hparams.compute_features(wavs)
        feats = self.hparams.normalize(feats, lens)
        emb = self.modules.embedding_model(feats, lengths=lens)
        return self.modules.classifier(emb)

    def compute_objectives(self, predictions, batch, stage):
        return self.hparams.aam_loss(
            predictions, batch["spk_id_encoded"]
        )

    def on_fit_batch_end(self, batch, outputs, loss, should_step):
        if should_step:
            _, self.lr = self.hparams.lr_annealing()

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == Stage.VALID and self.checkpointer is not None:
            self.checkpointer.save_and_keep_only(
                meta={"loss": stage_loss}, min_keys=["loss"]
            )
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": self.lr},
                train_stats={"loss": self.avg_train_loss},
                valid_stats={"loss": stage_loss},
            )


def dataio_prep(hparams):
    from speechbrain_tpu.dataio.dataio import read_audio
    from speechbrain_tpu.dataio.encoder import CategoricalEncoder

    label_encoder = CategoricalEncoder()
    datasets = {}
    crop = int(hparams["sentence_len"] * hparams["sample_rate"])
    rng = np.random.default_rng(hparams["seed"])

    def audio_pipeline(wav):
        sig = read_audio(wav)
        if len(sig) > crop:
            start = rng.integers(0, len(sig) - crop)
            sig = sig[start : start + crop]
        return sig

    for split in ["train", "valid"]:
        ds = DynamicItemDataset.from_json(hparams[f"{split}_json"])
        ds.add_dynamic_item(audio_pipeline, takes="wav", provides="sig")
        ds.add_dynamic_item(
            lambda s: label_encoder.encode_label(s),
            takes="spk_id",
            provides="spk_id_encoded",
        )
        ds.set_output_keys(["id", "sig", "spk_id_encoded"])
        datasets[split] = ds
    label_encoder.update_from_didataset(
        datasets["train"], "spk_id"
    ) if not len(label_encoder) else None
    return datasets, label_encoder


if __name__ == "__main__":
    hparams_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])
    from speechbrain_tpu.utils.checkpoints import Checkpointer
    from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

    with open(hparams_file) as f:
        hparams = load_hyperpyyaml(f, overrides)
    sb.create_experiment_directory(
        hparams["output_folder"], hparams_file, overrides
    )
    sys.path.insert(0, __file__.rsplit("/SpeakerRec/", 1)[0])
    from voxceleb_prepare import prepare_voxceleb

    from speechbrain_tpu.utils.distributed import run_on_main

    run_on_main(
        prepare_voxceleb,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
            "seed": hparams["seed"],
            "verification_pairs_file": hparams.get("verification_file"),
        },
    )
    datasets, label_encoder = dataio_prep(hparams)
    brain = SpeakerBrain(
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
