#!/usr/bin/env python3
"""Multistage SLU on Timers and Such (TPU-native).

    python train.py hparams/train.yaml --data_folder /data/timers-and-such

Mirrors the reference ``recipes/timers-and-such/multistage/train.py``:
each minibatch is transcribed ONLINE by an attached ASR and the
transcription feeds the NLU (text encoder + attentional decoder ->
semantics) — at training time too, so the NLU sees real ASR errors.
Point ``asr_source`` at a trained ``EncoderDecoderASR`` bundle; with
``asr_source: null`` gold transcripts are used everywhere (falls back
to the decoupled-oracle behavior, keeping the recipe runnable without
a pretrained model).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.decoders.seq2seq import S2SRNNGreedySearcher
from speechbrain_tpu.nnet.losses import nll_loss


class SLU(sb.Brain):
    """Brain for decoupled (text -> semantics) training."""

    asr = None  # optional pretrained EncoderDecoderASR (test-time)
    in_tokenizer = None

    def _encode_transcripts(self, batch, stage):
        """Token ids of the NLU input: ASR 1-best at EVERY stage when
        an ASR bundle is attached (online transcription), else gold."""
        if self.asr is not None:
            real = int(np.asarray(batch["batch_mask"]).sum())
            texts = self.asr.transcribe_batch(
                batch["sig"][:real], batch["sig_lens"][:real]
            )[0]
            texts = list(texts) + [""] * (
                batch["sig"].shape[0] - real
            )
            T = batch["transcript_tokens"].shape[1]
            ids = np.zeros((len(texts), T), np.int64)
            lens = np.zeros(len(texts), np.float32)
            for i, t in enumerate(texts):
                tok = self.in_tokenizer.sp.encode_as_ids(t)[:T]
                ids[i, : len(tok)] = tok
                lens[i] = len(tok) / T if T else 0.0
            return jnp.asarray(ids), jnp.asarray(lens)
        return batch["transcript_tokens"], batch["transcript_tokens_lens"]

    def compute_forward(self, batch, stage):
        """Transcript tokens -> encoder -> attentional decoder."""
        tokens, tok_lens = self._encode_transcripts(batch, stage)
        emb_in = self.modules.input_emb(tokens)
        enc, _ = self.modules.slu_enc(emb_in)
        emb = self.modules.output_emb(batch["tokens_bos"])
        dec_out, _ = self.modules.dec(emb, enc, tok_lens)
        seq_logp = jax.nn.log_softmax(
            self.modules.seq_lin(dec_out), axis=-1
        )
        return seq_logp, enc, tok_lens

    def compute_objectives(self, predictions, batch, stage):
        """Semantics-token NLL (+exact-match accuracy off-train)."""
        seq_logp, enc, tok_lens = predictions
        loss = nll_loss(
            seq_logp,
            batch["tokens_eos"],
            length=batch["tokens_eos_lens"] * batch["batch_mask"],
        )
        if stage != Stage.TRAIN and hasattr(self, "exact"):
            hyps, _ = self._searcher(enc, tok_lens)
            real = int(np.asarray(batch["batch_mask"]).sum())
            tgt = np.asarray(batch["tokens"])[:real].tolist()
            t_lens = np.asarray(batch["tokens_lens"])[:real]
            U = len(tgt[0]) if tgt else 0
            for hyp, t, l in zip(hyps[:real], tgt, t_lens):
                self.exact.append(
                    hyp == t[: int(round(float(l) * U))]
                )
        return loss

    def on_stage_start(self, stage, epoch=None):
        """Exact-match accumulator + greedy searcher off-train."""
        if stage != Stage.TRAIN:
            self.exact = []
            if not hasattr(self, "_searcher"):
                self._searcher = S2SRNNGreedySearcher(
                    embedding_fn=lambda t: self.modules.output_emb(t),
                    decoder_step_fn=lambda e, hs, c, es, el, ast: (
                        self.modules.dec(
                            e, hs, c, es, el, ast,
                            method="forward_step",
                        )
                    ),
                    linear_fn=lambda d: jax.nn.log_softmax(
                        self.modules.seq_lin(d[:, None])[:, 0], axis=-1
                    ),
                    dec_hidden_size=self.hparams.dec_neurons,
                    attn_init_fn=lambda es: self.modules.dec(
                        es, method="attn_init"
                    ),
                    rnn_init_fn=lambda n, dtype: jnp.zeros(
                        (1, n, self.hparams.dec_neurons), dtype
                    ),
                    bos_index=self.hparams.bos_index,
                    eos_index=self.hparams.eos_index,
                    min_decode_ratio=0.0,
                    max_decode_ratio=self.hparams.max_decode_ratio,
                )

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Log + checkpoint by exact-frame accuracy."""
        if stage == Stage.TRAIN:
            return
        acc = float(np.mean(self.exact)) if self.exact else 0.0
        if stage == Stage.VALID:
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": self.lr},
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


def dataio_prepare(hparams, in_tokenizer, out_tokenizer):
    """Datasets yielding (sig, transcript tokens, semantics tokens)."""
    from speechbrain_tpu.dataio.dataio import read_audio

    datasets = {}
    for split, path in (
        ("train", hparams["train_json"]),
        ("valid", hparams["valid_json"]),
        ("test", hparams["test_json"]),
    ):
        ds = DynamicItemDataset.from_json(path)
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")

        def transcript_pipeline(transcript):
            return np.asarray(
                in_tokenizer.sp.encode_as_ids(transcript), np.int64
            )

        ds.add_dynamic_item(
            transcript_pipeline,
            takes="transcript",
            provides="transcript_tokens",
        )

        def semantics_pipeline(semantics):
            tokens = out_tokenizer.sp.encode_as_ids(semantics)
            return (
                np.asarray(tokens, np.int64),
                np.asarray([hparams["bos_index"]] + tokens, np.int64),
                np.asarray(tokens + [hparams["eos_index"]], np.int64),
            )

        ds.add_dynamic_item(
            semantics_pipeline,
            takes="semantics",
            provides=["tokens", "tokens_bos", "tokens_eos"],
        )
        ds.set_output_keys(
            ["id", "sig", "transcript_tokens", "tokens", "tokens_bos",
             "tokens_eos"]
        )
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
    sys.path.insert(0, __file__.rsplit("/multistage", 1)[0])
    from prepare import prepare_TAS

    run_on_main(
        prepare_TAS,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
            "train_splits": hparams["train_splits"],
        },
    )
    from speechbrain_tpu.tokenizers.SentencePiece import SentencePiece

    in_tokenizer = SentencePiece(
        model_dir=hparams["save_folder"] + "/transcript_tok",
        vocab_size=hparams["asr_vocab_size"],
        annotation_train=hparams["train_json"],
        annotation_read="transcript",
        model_type=hparams["token_type"],
        annotation_format="json",
    )
    out_tokenizer = SentencePiece(
        model_dir=hparams["save_folder"] + "/semantics_tok",
        vocab_size=hparams["vocab_size"],
        annotation_train=hparams["train_json"],
        annotation_read="semantics",
        model_type=hparams["token_type"],
        annotation_format="json",
    )
    datasets = dataio_prepare(hparams, in_tokenizer, out_tokenizer)
    brain = SLU(
        modules=hparams["modules"],
        opt_class=lambda lr: hparams["opt_class"](learning_rate=lr),
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=Checkpointer(hparams["save_folder"]),
    )
    brain.in_tokenizer = in_tokenizer
    if hparams.get("asr_source"):
        from speechbrain_tpu.pretrained.interfaces import (
            EncoderDecoderASR,
        )

        brain.asr = EncoderDecoderASR.from_hparams(
            source=hparams["asr_source"]
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
