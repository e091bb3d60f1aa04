#!/usr/bin/env python3
"""LibriSpeech Whisper fine-tuning with NLL (TPU-native).

    python train_with_whisper.py hparams/train_hf_whisper.yaml \
        --data_folder /data/LibriSpeech

Mirrors the reference
``recipes/LibriSpeech/ASR/transformer/train_with_whisper.py``: the
Whisper encoder-decoder is fine-tuned on next-token NLL over
``[bos, language, task, timestamp] + text`` prompts, validated with
Whisper greedy search and tested with Whisper beam search
(``decoders/seq2seq.py:199,1401``).  The native Whisper lobe
(``lobes/models/whisper.py``) replaces the torch-HF wrapper; its
tokenizer role is played by the native unigram SentencePiece with the
five control tokens appended after the text vocabulary.
"""

import sys

import jax
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.decoders.seq2seq import (
    S2SWhisperBeamSearch,
    S2SWhisperGreedySearch,
)
from speechbrain_tpu.nnet.losses import nll_loss
from speechbrain_tpu.utils.metric_stats import ErrorRateStats


class _BoundWhisper:
    """Adapter giving searchers ``forward_decoder(enc, ids)`` over the
    Brain's bound module (reference passes the torch module itself)."""

    def __init__(self, module):
        self.module = module

    def forward_decoder(self, enc_states, ids):
        return self.module(enc_states, ids, method="forward_decoder")


class ASR(sb.Brain):
    """Brain for Whisper NLL fine-tuning."""

    def compute_forward(self, batch, stage):
        """Wav + prompt tokens -> decoder log-probs."""
        import jax.numpy as jnp

        wavs = batch["sig"]
        bos_tokens = batch["tokens_bos"]
        enc_out, logits, _ = self.modules.whisper(
            wavs, bos_tokens, train=stage == Stage.TRAIN
        )
        log_probs = jax.nn.log_softmax(
            logits.astype(jnp.float32), axis=-1
        )
        return enc_out, log_probs

    def compute_objectives(self, predictions, batch, stage):
        """NLL vs the shifted prompt; WER via whisper search off-train."""
        enc_out, log_probs = predictions
        mask = batch["batch_mask"]
        loss = nll_loss(
            log_probs,
            batch["tokens_eos"],
            length=batch["tokens_eos_lens"] * mask,
        )
        if stage != Stage.TRAIN and hasattr(self, "wer_metric"):
            searcher = (
                self.valid_searcher
                if stage == Stage.VALID
                else self.test_searcher
            )
            searcher.model = _BoundWhisper(self.modules.whisper)
            out = searcher(enc_out, batch["sig_lens"])
            hyps = out[0]
            real = int(np.asarray(mask).sum())
            specials = {
                self.hparams.eos_index,
                self.hparams.bos_token,
                self.hparams.language_token,
                self.hparams.task_token,
                self.hparams.timestamp_token,
            }
            predicted = [
                self.tokenizer(
                    [[t for t in h if t not in specials]],
                    task="decode_from_list",
                )[0]
                for h in hyps[:real]
            ]
            targets = self.tokenizer(
                np.asarray(batch["tokens"])[:real].tolist(),
                np.asarray(batch["tokens_lens"])[:real],
                task="decode",
            )
            ids = [str(i) for i in range(real)]
            self.wer_metric.append(ids, predicted, targets)
            self.cer_metric.append(
                ids,
                [list(" ".join(w)) for w in predicted],
                [list(" ".join(w)) for w in targets],
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


def make_searchers(hparams):
    """Whisper greedy (valid) + beam (test) searchers; the model is
    bound per-batch by the Brain."""
    prompt = [
        hparams["bos_token"],
        hparams["language_token"],
        hparams["task_token"],
        hparams["timestamp_token"],
    ]
    common = dict(
        bos_index=hparams["timestamp_token"],
        eos_index=hparams["eos_index"],
        min_decode_ratio=hparams["min_decode_ratio"],
        max_decode_ratio=hparams["max_decode_ratio"],
    )
    valid = S2SWhisperGreedySearch(None, **common)
    valid.set_decoder_input_tokens(prompt)
    test = S2SWhisperBeamSearch(
        [None],
        beam_size=hparams["test_beam_size"],
        using_eos_threshold=False,
        length_normalization=True,
        **common,
    )
    test.set_decoder_input_tokens(prompt)
    return valid, test


def dataio_prepare(hparams, tokenizer):
    """Datasets with the Whisper prompt token pipeline."""
    from speechbrain_tpu.dataio.dataio import read_audio

    prompt = [
        hparams["bos_token"],
        hparams["language_token"],
        hparams["task_token"],
        hparams["timestamp_token"],
    ]
    datasets = {}
    for split, path in (
        ("train", hparams["train_json"]),
        ("valid", hparams["valid_json"]),
        ("test", hparams["test_json"]),
    ):
        ds = DynamicItemDataset.from_json(path)
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")

        def text_pipeline(words):
            tokens = tokenizer.sp.encode_as_ids(words)
            return (
                np.asarray(tokens, np.int64),
                np.asarray(prompt + tokens, np.int64),
                np.asarray(
                    prompt[1:] + tokens + [hparams["eos_index"]],
                    np.int64,
                ),
            )

        ds.add_dynamic_item(
            text_pipeline,
            takes="words",
            provides=["tokens", "tokens_bos", "tokens_eos"],
        )
        ds.set_output_keys(
            ["id", "sig", "tokens", "tokens_bos", "tokens_eos"]
        )
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
        experiment_directory=hparams["output_folder"],
        hyperparams_to_save=hparams_file,
        overrides=overrides,
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
    from speechbrain_tpu.tokenizers.SentencePiece import SentencePiece

    tokenizer = SentencePiece(
        model_dir=hparams["save_folder"],
        vocab_size=hparams["vocab_size"],
        annotation_train=hparams["train_json"],
        annotation_read="words",
        model_type=hparams["token_type"],
        annotation_format="json",
    )
    datasets = dataio_prepare(hparams, tokenizer)
    brain = ASR(
        modules=hparams["modules"],
        opt_class=lambda lr: hparams["opt_class"](learning_rate=lr),
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=Checkpointer(hparams["save_folder"]),
    )
    brain.tokenizer = tokenizer
    brain.valid_searcher, brain.test_searcher = make_searchers(hparams)
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
