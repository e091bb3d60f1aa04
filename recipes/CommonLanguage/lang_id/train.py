#!/usr/bin/env python3
"""Spoken language identification on CommonLanguage (TPU-native).

    python train.py hparams/train_ecapa_tdnn.yaml --data_folder /data/common_voice_kpd

Mirrors the reference ``recipes/CommonLanguage/lang_id/train.py``:
ECAPA-TDNN embeddings + AAM-softmax over 45 languages, random 3-second
crops, accuracy and per-class error tracked off-train.
"""

import sys

import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset


class LanguageBrain(sb.Brain):
    """Brain for language-id classification."""

    def compute_forward(self, batch, stage):
        """Wav -> Fbank -> ECAPA -> language logits."""
        feats = self.hparams.compute_features(batch["sig"])
        feats = self.hparams.normalize(
            feats, batch["sig_lens"], training=False
        )
        emb = self.modules.embedding_model(
            feats, lengths=batch["sig_lens"]
        )
        return self.modules.classifier(emb)

    def compute_objectives(self, predictions, batch, stage):
        """AAM loss + off-train accuracy."""
        loss = self.hparams.compute_cost(
            predictions, batch["lang_encoded"]
        )
        if stage != Stage.TRAIN and hasattr(self, "error_metrics"):
            mask = np.asarray(batch["batch_mask"])
            real = int(mask.sum())
            pred = np.asarray(predictions).squeeze(1).argmax(-1)[:real]
            true = np.asarray(batch["lang_encoded"])[:real]
            self.error_metrics.append(
                [str(i) for i in range(real)], pred, true
            )
        return loss

    def on_fit_batch_end(self, batch, outputs, loss, should_step):
        """Step the cyclic lr schedule per optimizer step."""
        if should_step and hasattr(self.hparams, "lr_annealing"):
            _, self.lr = self.hparams.lr_annealing()

    def on_stage_start(self, stage, epoch=None):
        """Accuracy metric off-train."""
        if stage != Stage.TRAIN:
            from speechbrain_tpu.utils.metric_stats import MetricStats

            self.error_metrics = MetricStats(
                metric=lambda p, t: np.asarray(p == t, np.float64)
            )

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Log + checkpoint by accuracy."""
        if stage == Stage.TRAIN:
            return
        acc = self.error_metrics.summarize("average")
        if stage == Stage.VALID:
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": getattr(self, "lr", 0.0)},
                train_stats={"loss": self.avg_train_loss},
                valid_stats={"loss": stage_loss, "acc": acc},
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"acc": acc}, max_keys=["acc"]
                )
        else:
            self.hparams.train_logger.log_stats(
                {"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats={"loss": stage_loss, "acc": acc},
            )


def dataio_prep(hparams):
    """Datasets with random crops + the language label encoder."""
    from speechbrain_tpu.dataio.dataio import read_audio
    from speechbrain_tpu.dataio.encoder import CategoricalEncoder

    label_encoder = CategoricalEncoder()
    crop = int(hparams["sentence_len"] * hparams["sample_rate"])
    rng = np.random.default_rng(hparams["seed"])
    datasets = {}
    for split, path in (
        ("train", hparams["train_json"]),
        ("valid", hparams["valid_json"]),
        ("test", hparams["test_json"]),
    ):
        ds = DynamicItemDataset.from_json(path)

        def audio_pipeline(wav):
            sig = read_audio(wav)
            if sig.ndim > 1:
                sig = sig.mean(axis=-1)
            if len(sig) > crop:
                start = rng.integers(0, len(sig) - crop)
                sig = sig[start : start + crop]
            else:
                sig = np.pad(sig, (0, crop - len(sig)))
            return sig.astype(np.float32)

        ds.add_dynamic_item(audio_pipeline, takes="wav", provides="sig")
        ds.add_dynamic_item(
            lambda lang: label_encoder.encode_label(lang),
            takes="language",
            provides="lang_encoded",
        )
        ds.set_output_keys(["id", "sig", "lang_encoded"])
        datasets[split] = ds
    label_encoder.load_or_create(
        path=hparams["save_folder"] + "/lang_encoder.txt",
        from_didatasets=[datasets["train"]],
        output_key="language",
    )
    return datasets, label_encoder


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
    sys.path.insert(0, __file__.rsplit("/lang_id/", 1)[0])
    from common_language_prepare import prepare_common_language

    run_on_main(
        prepare_common_language,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
        },
    )
    datasets, label_encoder = dataio_prep(hparams)
    brain = LanguageBrain(
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
        max_key="acc",
    )
