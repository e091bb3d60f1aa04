#!/usr/bin/env python3
"""IEMOCAP emotion recognition with ECAPA-TDNN (TPU-native).

    python train_with_wav2vec2.py hparams/train_with_wav2vec2.yaml --data_folder /data/IEMOCAP

Mirrors the reference ``recipes/IEMOCAP/emotion_recognition/train_with_wav2vec2.py`` (native wav2vec stack):
Fbank -> ECAPA embeddings -> AAM classifier over the four-class subset
(anger/happiness/sadness/neutral), leave-one-speaker-out splitting.
"""

import json
import os
import re
import sys

import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset

EMOTIONS = {"ang": 0, "hap": 1, "exc": 1, "sad": 2, "neu": 3}


class EmoIdBrain(sb.Brain):
    """Brain for 4-class emotion recognition."""

    def compute_forward(self, batch, stage):
        """Waveform -> wav2vec2 -> time pooling -> class logits."""
        import jax.numpy as jnp

        latents = self.modules.extractor(batch["sig"])
        enc = self.modules.encoder(latents)["embeddings"]
        emb = self.modules.avg_pool(enc, batch["sig_lens"])
        return self.modules.classifier(emb)

    def compute_objectives(self, predictions, batch, stage):
        """AAM-softmax loss + off-train accuracy."""
        loss = self.hparams.compute_cost(
            predictions, batch["emo_encoded"]
        )
        if stage != Stage.TRAIN and hasattr(self, "error_metrics"):
            mask = np.asarray(batch["batch_mask"])
            real = int(mask.sum())
            pred = np.asarray(predictions).squeeze(1).argmax(-1)[:real]
            true = np.asarray(batch["emo_encoded"])[:real]
            self.error_metrics.append(
                [str(i) for i in range(real)], pred, true
            )
        return loss

    def on_stage_start(self, stage, epoch=None):
        """Classification-error metric off-train."""
        if stage != Stage.TRAIN:
            from speechbrain_tpu.utils.metric_stats import MetricStats

            self.error_metrics = MetricStats(
                metric=lambda p, t: np.asarray(p != t, np.float64)
            )

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Anneal lr, log, checkpoint by error rate."""
        if stage == Stage.TRAIN:
            return
        err = self.error_metrics.summarize("average")
        if stage == Stage.VALID:
            _, self.lr = self.hparams.lr_annealing(epoch)
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": self.lr},
                train_stats={"loss": self.avg_train_loss},
                valid_stats={"loss": stage_loss, "error": err},
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"error": err}, min_keys=["error"]
                )
        else:
            self.hparams.train_logger.log_stats(
                {"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats={"loss": stage_loss, "error": err},
            )


def prepare_iemocap(data_folder, save_folder, test_spk_id=1):
    """Walk IEMOCAP sessions: EmoEvaluation labels -> JSON manifests.

    Leave-one-speaker-out: utterances of speaker ``test_spk_id``
    (1..10 = Ses0xF/Ses0xM) go to test, a neighbor speaker to valid.
    """
    os.makedirs(save_folder, exist_ok=True)
    outs = {
        s: os.path.join(save_folder, f"{s}.json")
        for s in ("train", "valid", "test")
    }
    if all(os.path.exists(p) for p in outs.values()):
        return
    from speechbrain_tpu.dataio.dataio import read_audio

    entries = []  # (utt_id, wav, label, spk_num)
    label_re = re.compile(
        r"\[.*\]\s+(\S+)\s+(\w+)\s+\[.*\]"
    )
    for sess in range(1, 6):
        eval_dir = os.path.join(
            data_folder, f"Session{sess}", "dialog", "EmoEvaluation"
        )
        wav_root = os.path.join(
            data_folder, f"Session{sess}", "sentences", "wav"
        )
        if not os.path.isdir(eval_dir):
            continue
        for fn in sorted(os.listdir(eval_dir)):
            if not fn.endswith(".txt"):
                continue
            with open(fn_path := os.path.join(eval_dir, fn)) as f:
                for line in f:
                    m = label_re.match(line.strip())
                    if not m:
                        continue
                    utt_id, emo = m.group(1), m.group(2).lower()
                    if emo not in EMOTIONS:
                        continue
                    dialog = utt_id.rsplit("_", 1)[0]
                    wav = os.path.join(wav_root, dialog, utt_id + ".wav")
                    if not os.path.exists(wav):
                        continue
                    gender = utt_id.split("_")[-1][0]
                    spk_num = (sess - 1) * 2 + (1 if gender == "F" else 2)
                    entries.append((utt_id, wav, EMOTIONS[emo], spk_num))
    valid_spk = test_spk_id % 10 + 1
    splits = {"train": {}, "valid": {}, "test": {}}
    for utt_id, wav, label, spk in entries:
        split = (
            "test" if spk == test_spk_id
            else "valid" if spk == valid_spk else "train"
        )
        splits[split][utt_id] = {
            "wav": wav,
            "duration": round(len(read_audio(wav)) / 16000.0, 3),
            "emo": label,
        }
    for split, manifest in splits.items():
        with open(outs[split], "w") as f:
            json.dump(manifest, f, indent=2)


def dataio_prep(hparams):
    """Datasets yielding cropped signals + emotion ids."""
    from speechbrain_tpu.dataio.dataio import read_audio

    crop = int(hparams["sentence_len"] * hparams["sample_rate"])
    rng = np.random.default_rng(hparams["seed"])
    datasets = {}
    for split in ("train", "valid", "test"):
        ds = DynamicItemDataset.from_json(hparams[f"{split}_json"])

        def audio_pipeline(wav):
            sig = read_audio(wav)
            if len(sig) > crop:
                start = int(rng.integers(0, len(sig) - crop))
                sig = sig[start : start + crop]
            return sig

        ds.add_dynamic_item(audio_pipeline, takes="wav", provides="sig")
        ds.add_dynamic_item(
            lambda e: np.int64(e), takes="emo", provides="emo_encoded"
        )
        ds.set_output_keys(["id", "sig", "emo_encoded"])
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
        prepare_iemocap,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
            "test_spk_id": hparams["test_spk_id"],
        },
    )
    datasets = dataio_prep(hparams)
    brain = EmoIdBrain(
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
        min_key="error",
    )
