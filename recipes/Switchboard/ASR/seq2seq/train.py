#!/usr/bin/env python3
"""Switchboard CRDNN seq2seq ASR with BPE tokens (TPU-native).

    python train.py hparams/train_BPE_1000.yaml --data_folder /data/Switchboard

Mirrors the reference ``recipes/Switchboard/ASR/seq2seq/train.py``
(CRDNN encoder + location-aware attentional GRU decoder, joint
CTC+NLL training, beam search with optional RNNLM shallow fusion;
WER 3.16 test-clean with BPE-1k + RNNLM,
``recipes/Switchboard/ASR/seq2seq/README.md:12``).

To enable LM fusion at test time, train an RNNLM (same tokenizer) and
load its params into ``brain.lm_params`` with the Pretrainer.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.decoders.seq2seq import (
    S2SRNNBeamSearcher,
    S2SRNNBeamSearchLM,
)
from speechbrain_tpu.nnet.losses import ctc_loss, nll_loss
from speechbrain_tpu.utils.metric_stats import ErrorRateStats


class ASR(sb.Brain):
    """Brain for CRDNN seq2seq CTC+NLL training."""

    def compute_forward(self, batch, stage):
        """Wav -> Fbank -> CRDNN -> attentional decoder log-probs."""
        feats = self.hparams.compute_features(batch["sig"])
        feats, self._new_extra = self.hparams.normalize(
            feats, batch["sig_lens"],
            state=self._bound_extra["norm"],
            epoch=self.hparams.epoch_counter.current,
            training=stage == Stage.TRAIN,
        )
        self._new_extra = {"norm": self._new_extra}
        if stage == Stage.TRAIN and hasattr(self.hparams, "augmentation"):
            feats = self.hparams.augmentation(
                feats, self._bound_rngs["augment"]
            )
        enc = self.modules.enc(feats, lengths=batch["sig_lens"])
        emb = self.modules.emb(batch["tokens_bos"])
        dec_out, _ = self.modules.dec(emb, enc, batch["sig_lens"])
        seq_logp = jax.nn.log_softmax(
            self.modules.seq_lin(dec_out), axis=-1
        )
        ctc_logp = jax.nn.log_softmax(
            self.modules.ctc_lin(enc), axis=-1
        )
        return ctc_logp, seq_logp, enc

    def init_extra_state(self, batch):
        """Fresh normalization stats."""
        from speechbrain_tpu.processing.features import GlobalNormState

        return {"norm": GlobalNormState.init(self.hparams.n_mels)}

    def compute_objectives(self, predictions, batch, stage):
        """ctc_weight * CTC + (1-w) * NLL; beam-search WER off-train."""
        ctc_logp, seq_logp, enc = predictions
        mask = batch["batch_mask"]
        loss_seq = nll_loss(
            seq_logp,
            batch["tokens_eos"],
            length=batch["tokens_eos_lens"] * mask,
            label_smoothing=self.hparams.label_smoothing,
        )
        # The reference drops CTC after number_of_ctc_epochs.
        if (
            self.hparams.epoch_counter.current
            <= self.hparams.number_of_ctc_epochs
        ):
            loss_ctc = ctc_loss(
                ctc_logp,
                batch["tokens"],
                batch["sig_lens"] * mask,
                batch["tokens_lens"] * mask,
                blank_index=self.hparams.blank_index,
            )
            loss = (
                self.hparams.ctc_weight * loss_ctc
                + (1 - self.hparams.ctc_weight) * loss_seq
            )
        else:
            loss = loss_seq
        if stage != Stage.TRAIN and hasattr(self, "wer_metric"):
            hyps, _ = self._searcher(enc, batch["sig_lens"])
            real = int(np.asarray(mask).sum())
            predicted = [
                self.tokenizer([h], task="decode_from_list")[0]
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

    def _make_searcher(self, beam_size):
        """Beam searcher over the bound decoder modules, with RNNLM
        shallow fusion when ``self.lm_params`` is loaded."""
        kwargs = dict(
            embedding_fn=lambda t: self.modules.emb(t),
            decoder_step_fn=lambda e, hs, c, es, el, ast: self.modules.dec(
                e, hs, c, es, el, ast, method="forward_step"
            ),
            linear_fn=lambda d: self.modules.seq_lin(d[:, None])[:, 0],
            dec_hidden_size=self.hparams.dec_neurons,
            attn_init_fn=lambda es: self.modules.dec(
                es, method="attn_init"
            ),
            rnn_init_fn=lambda n, dtype: jnp.zeros(
                (1, n, self.hparams.dec_neurons), dtype
            ),
            ctc_linear_fn=lambda e: self.modules.ctc_lin(e),
            bos_index=self.hparams.bos_index,
            eos_index=self.hparams.eos_index,
            blank_index=self.hparams.blank_index,
            min_decode_ratio=self.hparams.min_decode_ratio,
            max_decode_ratio=self.hparams.max_decode_ratio,
            beam_size=beam_size,
            eos_threshold=self.hparams.eos_threshold,
            using_max_attn_shift=self.hparams.using_max_attn_shift,
            max_attn_shift=self.hparams.max_attn_shift,
            coverage_penalty=self.hparams.coverage_penalty,
            ctc_weight=self.hparams.ctc_weight_decode,
            temperature=self.hparams.temperature,
        )
        if getattr(self, "lm_params", None) is not None:

            def lm_step_fn(tokens, lm_mem):
                prefix = jnp.concatenate(
                    [lm_mem, tokens[:, None]], axis=1
                )
                logits = self.hparams.lm_model.apply(
                    self.lm_params, prefix, train=False
                )
                return (
                    jax.nn.log_softmax(logits[:, -1], axis=-1),
                    prefix,
                )

            return S2SRNNBeamSearchLM(
                lm_step_fn=lm_step_fn,
                lm_init_fn=lambda n: jnp.full(
                    (n, 1), self.hparams.bos_index, jnp.int32
                ),
                lm_weight=self.hparams.lm_weight,
                **kwargs,
            )
        return S2SRNNBeamSearcher(**kwargs)

    def on_stage_start(self, stage, epoch=None):
        """Build the stage searcher; WER/CER metrics off-train."""
        if stage != Stage.TRAIN:
            self.wer_metric = ErrorRateStats()
            self.cer_metric = ErrorRateStats()
            beam = (
                self.hparams.valid_beam_size
                if stage == Stage.VALID
                else self.hparams.test_beam_size
            )
            self._searcher = self._make_searcher(beam)

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


def dataio_prepare(hparams, tokenizer):
    """BPE-token datasets."""
    from speechbrain_tpu.dataio.dataio import read_audio

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
                np.asarray([hparams["bos_index"]] + tokens, np.int64),
                np.asarray(tokens + [hparams["eos_index"]], np.int64),
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
    from speechbrain_tpu.utils.distributed import run_on_main
    from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

    with open(hparams_file) as f:
        hparams = load_hyperpyyaml(f, overrides)
    sb.create_experiment_directory(
        hparams["output_folder"], hparams_file, overrides
    )
    from recipes.Switchboard.switchboard_prepare import prepare_switchboard

    run_on_main(
        prepare_switchboard,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
            "dev_conversations": hparams["dev_conversations"],
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
