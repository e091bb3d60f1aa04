#!/usr/bin/env python3
"""LibriSpeech wav2vec2 + char CTC fine-tuning (TPU-native).

    python train_with_wav2vec.py hparams/train_en_with_wav2vec.yaml \
        --data_folder /data/LibriSpeech

Mirrors the reference ``recipes/LibriSpeech/ASR/CTC/train_with_wav2vec.py``
(wav2vec2 encoder + DNN + char CTC, WER 1.90 test-clean per
``recipes/LibriSpeech/ASR/CTC/README.md:19``) with the NATIVE wav2vec
stack (``lobes/models/wav2vec.py``).  To start from a published HF
checkpoint instead, swap the extractor/encoder for
``lobes.models.huggingface_wav2vec.HuggingFaceWav2Vec2`` (Flax weights
from a local path) and freeze it.
"""

import sys

import jax
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.dataio.encoder import CTCTextEncoder
from speechbrain_tpu.nnet.losses import ctc_loss
from speechbrain_tpu.utils.metric_stats import ErrorRateStats


class ASR(sb.Brain):
    """Brain for wav2vec2-CTC fine-tuning."""

    def compute_forward(self, batch, stage):
        """Wav -> latents -> context encoder -> DNN -> CTC log-probs."""
        if getattr(self, "w2v", None) is not None:
            # HF Flax wav2vec2 path (train_hf_wav2vec.yaml); frozen
            # params are closed over as jit constants.
            enc = self.w2v(batch["sig"], batch["sig_lens"])
        else:
            latents = self.modules.extractor(batch["sig"])
            enc = self.modules.encoder(latents)["embeddings"]
        x = self.modules.enc_dnn(enc)
        return jax.nn.log_softmax(self.modules.ctc_lin(x), axis=-1)

    def compute_objectives(self, predictions, batch, stage):
        """CTC loss; WER/CER via greedy decode off-train."""
        mask = batch["batch_mask"]
        loss = ctc_loss(
            predictions,
            batch["tokens"],
            batch["sig_lens"] * mask,
            batch["tokens_lens"] * mask,
            blank_index=self.hparams.blank_index,
        )
        if stage != Stage.TRAIN and hasattr(self, "wer_metric"):
            from speechbrain_tpu.decoders.ctc import ctc_greedy_decode

            real = int(np.asarray(mask).sum())
            hyps = ctc_greedy_decode(
                predictions, batch["sig_lens"],
                blank_id=self.hparams.blank_index,
            )[:real]
            targets = np.asarray(batch["tokens"])[:real].tolist()
            t_lens = np.asarray(batch["tokens_lens"])[:real]
            U = len(targets[0]) if targets else 0
            targets = [
                t[: int(round(l * U))] for t, l in zip(targets, t_lens)
            ]
            ids = [str(i) for i in range(real)]
            self.cer_metric.append(
                ids, hyps, targets,
                ind2lab=self.label_encoder.decode_ndim,
            )
            self.wer_metric.append(
                ids,
                [
                    "".join(self.label_encoder.decode_ndim(h)).split()
                    for h in hyps
                ],
                [
                    "".join(self.label_encoder.decode_ndim(t)).split()
                    for t in targets
                ],
            )
        return loss

    def on_stage_start(self, stage, epoch=None):
        """WER/CER metrics off-train."""
        if stage != Stage.TRAIN:
            self.wer_metric = ErrorRateStats()
            self.cer_metric = ErrorRateStats()

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Anneal lr on valid WER, log, checkpoint."""
        if stage == Stage.TRAIN:
            return
        wer = self.wer_metric.summarize("error_rate")
        cer = self.cer_metric.summarize("error_rate")
        stats = {"loss": stage_loss, "WER": wer, "CER": cer}
        if stage == Stage.VALID:
            _, self.lr = self.hparams.lr_annealing(wer)
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": self.lr},
                train_stats={"loss": self.avg_train_loss},
                valid_stats=stats,
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"WER": wer}, min_keys=["WER"]
                )
        else:
            self.hparams.train_logger.log_stats(
                {"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats=stats,
            )
            with open(self.hparams.wer_file, "w") as f:
                self.wer_metric.write_stats(f)


def dataio_prepare(hparams):
    """Char-level datasets + label encoder."""
    from speechbrain_tpu.dataio.dataio import read_audio

    label_encoder = CTCTextEncoder()
    datasets = {}
    for split, path in (
        ("train", hparams["train_json"]),
        ("valid", hparams["valid_json"]),
        ("test", hparams["test_json"]),
    ):
        ds = DynamicItemDataset.from_json(path)
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")
        ds.add_dynamic_item(
            lambda w: list(w), takes="words", provides="char_list"
        )

        def tokens_pipeline(char_list):
            return np.asarray(
                label_encoder.encode_sequence(char_list), np.int64
            )

        ds.add_dynamic_item(
            tokens_pipeline, takes="char_list", provides="tokens"
        )
        ds.set_output_keys(["id", "sig", "tokens"])
        datasets[split] = ds
    label_encoder.load_or_create(
        path=hparams["save_folder"] + "/label_encoder.txt",
        from_didatasets=[datasets[s] for s in ("train", "valid", "test")],
        output_key="char_list",
        sequence_input=True,
        special_labels={"blank_label": "<blank>"},
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
    from recipes.LibriSpeech.librispeech_prepare import prepare_librispeech

    run_on_main(
        prepare_librispeech,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
            "tr_splits": hparams["train_splits"],
            "dev_splits": hparams["dev_splits"],
            "te_splits": hparams["test_splits"],
            "merge_lst": hparams["train_splits"],
            "merge_name": "train.json",
        },
    )
    datasets, label_encoder = dataio_prepare(hparams)
    w2v = None
    if "wav2vec2" in hparams:
        w2v = hparams["wav2vec2"](source=hparams["wav2vec2_source"])
    brain = ASR(
        modules=hparams["modules"],
        opt_class=lambda lr: hparams["opt_class"](learning_rate=lr),
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=Checkpointer(hparams["save_folder"]),
    )
    brain.label_encoder = label_encoder
    brain.w2v = w2v
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
        min_key="WER",
    )
