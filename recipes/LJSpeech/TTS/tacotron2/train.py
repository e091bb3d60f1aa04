#!/usr/bin/env python3
"""Tacotron2 text-to-mel training on LJSpeech (TPU-native).

    python train.py hparams/train.yaml --data_folder /data/LJSpeech-1.1

Mirrors the reference ``recipes/LJSpeech/TTS/tacotron2/train.py``:
character inputs, teacher-forced mel decoding, mel MSE + gate BCE.
Mel targets come from the native Fbank front-end at load time.
"""

import json
import os
import string
import sys

import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset

# Character inventory (reference textToSequence symbol set, simplified
# to printable ASCII; index 0 reserved for padding).
_SYMBOLS = list(string.ascii_lowercase + string.digits + " .,!?'-:;()")
CHAR2IDX = {c: i + 1 for i, c in enumerate(_SYMBOLS)}


def text_to_sequence(text):
    """Lowercased character ids (unknown chars dropped)."""
    return [CHAR2IDX[c] for c in text.lower() if c in CHAR2IDX]


class Tacotron2Brain(sb.Brain):
    """Brain for teacher-forced Tacotron2 training."""

    def compute_forward(self, batch, stage):
        """Tokens + target mels -> (mel, mel_postnet, gate, attn)."""
        return self.modules.model(
            batch["tokens"],
            batch["tokens_lens"],
            batch["mel"],
        )

    def compute_objectives(self, predictions, batch, stage):
        """Mel MSE (pre+post) + gate BCE over valid frames."""
        mel_out, mel_post, gate, alignments = predictions
        T = mel_out.shape[1]
        out_lens = batch["mel_lens"] * T * batch["batch_mask"]
        losses = self.hparams.criterion(
            (mel_out, mel_post, gate), (batch["mel"], out_lens)
        )
        if stage == Stage.VALID and getattr(
            self.hparams, "progress_samples", False
        ):
            # Mirror the reference tacotron2 recipe: remember the last
            # batch's spectrograms/alignments for the epoch sample dump.
            logger = self.hparams.progress_sample_logger
            logger.remember(
                target=batch["mel"][0].T,
                output=mel_post[0].T,
                alignments=alignments[0].T,
                raw_batch=logger.get_batch_sample(
                    {
                        "mel_target": batch["mel"],
                        "mel_out": mel_out,
                        "mel_out_postnet": mel_post,
                        "alignments": alignments,
                    }
                ),
            )
        return losses["loss"]

    def on_stage_start(self, stage, epoch=None):
        """Reset the progress-sample collection each valid pass."""
        if stage == Stage.VALID and getattr(
            self.hparams, "progress_samples", False
        ):
            self.hparams.progress_sample_logger.reset()

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Log + checkpoint on valid."""
        if stage == Stage.VALID:
            if getattr(self.hparams, "progress_samples", False) and (
                epoch % self.hparams.progress_samples_interval == 0
            ):
                self.hparams.progress_sample_logger.save(epoch)
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": self.lr},
                train_stats={"loss": self.avg_train_loss},
                valid_stats={"loss": stage_loss},
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"loss": stage_loss}, min_keys=["loss"]
                )


def prepare_ljspeech(data_folder, save_folder, valid_ratio, test_ratio):
    """metadata.csv -> train/valid/test JSON manifests."""
    os.makedirs(save_folder, exist_ok=True)
    outs = {
        s: os.path.join(save_folder, f"{s}.json")
        for s in ("train", "valid", "test")
    }
    if all(os.path.exists(p) for p in outs.values()):
        return
    meta = os.path.join(data_folder, "metadata.csv")
    entries = []
    with open(meta, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split("|")
            if len(parts) < 2:
                continue
            utt_id, text = parts[0], parts[-1]
            wav = os.path.join(data_folder, "wavs", utt_id + ".wav")
            if os.path.exists(wav):
                entries.append((utt_id, wav, text))
    n = len(entries)
    n_valid = max(1, int(n * valid_ratio))
    n_test = max(1, int(n * test_ratio))
    splits = {
        "valid": entries[:n_valid],
        "test": entries[n_valid : n_valid + n_test],
        "train": entries[n_valid + n_test :],
    }
    for split, rows in splits.items():
        manifest = {
            utt_id: {"wav": wav, "label": text}
            for utt_id, wav, text in rows
        }
        with open(outs[split], "w") as f:
            json.dump(manifest, f, indent=2)


def dataio_prepare(hparams):
    """Datasets yielding (tokens, mel) pairs."""
    import jax.numpy as jnp

    from speechbrain_tpu.dataio.dataio import read_audio

    compute_features = hparams["compute_features"]
    datasets = {}
    for split in ("train", "valid", "test"):
        ds = DynamicItemDataset.from_json(hparams[f"{split}_json"])

        def audio_pipeline(wav):
            sig = read_audio(wav)
            mel = compute_features(jnp.asarray(sig)[None])[0]
            return np.asarray(mel)

        ds.add_dynamic_item(audio_pipeline, takes="wav", provides="mel")
        ds.add_dynamic_item(
            lambda label: np.asarray(text_to_sequence(label), np.int64),
            takes="label",
            provides="tokens",
        )
        ds.set_output_keys(["id", "mel", "tokens"])
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
        prepare_ljspeech,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
            "valid_ratio": hparams["valid_ratio"],
            "test_ratio": hparams["test_ratio"],
        },
    )
    datasets = dataio_prepare(hparams)
    brain = Tacotron2Brain(
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
