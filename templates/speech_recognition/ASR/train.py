#!/usr/bin/env python3
"""Step 3 of the speech-recognition template: attention-based ASR.

    python train.py train.yaml

CRDNN encoder + location-aware attentional GRU decoder with joint CTC,
BPE tokens from the step-1 tokenizer, greedy decode during validation
and beam search at test — with RNNLM shallow fusion when the step-2 LM
export is found (reference ``templates/speech_recognition/ASR``).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
_TPL = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _TPL)
sys.path.insert(0, os.path.join(_TPL, "LM"))  # custom_model for the LM
try:
    import speechbrain_tpu as sb
except ModuleNotFoundError:  # running from a source checkout
    sys.path.insert(0, os.path.dirname(os.path.dirname(_TPL)))
    import speechbrain_tpu as sb

import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.decoders.seq2seq import (
    S2SRNNBeamSearcher,
    S2SRNNBeamSearchLM,
    S2SRNNGreedySearcher,
)
from speechbrain_tpu.nnet.losses import ctc_loss, nll_loss
from speechbrain_tpu.utils.distributed import run_on_main
from speechbrain_tpu.utils.metric_stats import ErrorRateStats


class ASR(sb.Brain):
    """Brain for the template's CTC+attention ASR."""

    def compute_forward(self, batch, stage):
        """Wav -> Fbank -> CRDNN -> (CTC log-probs, seq log-probs)."""
        feats = self.hparams.compute_features(batch["sig"])
        feats, self._new_extra = self.hparams.normalize(
            feats, batch["sig_lens"],
            state=self._bound_extra["norm"],
            epoch=self.hparams.epoch_counter.current,
            training=stage == Stage.TRAIN,
        )
        self._new_extra = {"norm": self._new_extra}
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
        """ctc_weight * CTC + (1-w) * NLL; WER via search off-train."""
        ctc_logp, seq_logp, enc = predictions
        mask = batch["batch_mask"]
        loss_ctc = ctc_loss(
            ctc_logp,
            batch["tokens"],
            batch["sig_lens"] * mask,
            batch["tokens_lens"] * mask,
            blank_index=self.hparams.blank_index,
        )
        loss_seq = nll_loss(
            seq_logp,
            batch["tokens_eos"],
            length=batch["tokens_eos_lens"] * mask,
        )
        loss = (
            self.hparams.ctc_weight * loss_ctc
            + (1 - self.hparams.ctc_weight) * loss_seq
        )
        if stage != Stage.TRAIN and hasattr(self, "wer_metric"):
            searcher = (
                self.test_searcher if stage == Stage.TEST
                else self.valid_searcher
            )
            hyps, _ = searcher(enc, batch["sig_lens"] * mask)
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
            self.wer_metric.append(
                [str(i) for i in range(real)], predicted, targets
            )
        return loss

    def _searcher_hooks(self):
        """Shared callable hooks wiring the searchers to the modules."""
        return dict(
            embedding_fn=lambda toks: self.modules.emb(toks),
            decoder_step_fn=lambda e, hs, c, es, el, ast: self.modules.dec(
                e, hs, c, es, el, ast, method="forward_step"
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
            min_decode_ratio=self.hparams.min_decode_ratio,
            max_decode_ratio=self.hparams.max_decode_ratio,
        )

    def make_searchers(self):
        """Greedy for validation; beam (+optional LM fusion) for test."""
        hooks = self._searcher_hooks()
        self.valid_searcher = S2SRNNGreedySearcher(**hooks)
        lm_variables = self._load_lm_variables()
        if lm_variables is not None:

            def lm_step_fn(inp_tokens, mem):
                prefix = jnp.concatenate(
                    [mem["prefix"], inp_tokens[:, None].astype(jnp.int32)],
                    axis=1,
                )
                logits = self.hparams.lm_model.apply(
                    lm_variables, prefix, train=False
                )
                return (
                    jax.nn.log_softmax(logits[:, -1], axis=-1),
                    {"prefix": prefix},
                )

            self.test_searcher = S2SRNNBeamSearchLM(
                lm_step_fn=lm_step_fn,
                lm_init_fn=lambda n: {
                    "prefix": jnp.zeros((n, 0), jnp.int32)
                },
                lm_weight=self.hparams.lm_weight,
                beam_size=self.hparams.test_beam_size,
                length_normalization=True,
                **hooks,
            )
        else:
            self.test_searcher = S2SRNNBeamSearcher(
                beam_size=self.hparams.test_beam_size,
                length_normalization=True,
                **hooks,
            )

    def _load_lm_variables(self):
        """The step-2 LM export, when present on disk."""
        path = getattr(self.hparams, "lm_ckpt", None)
        if not path or not os.path.exists(path):
            return None
        from flax import serialization

        with open(path, "rb") as f:
            variables = serialization.msgpack_restore(f.read())
        print(f"Beam search will fuse the LM from {path}")
        return variables

    def on_stage_start(self, stage, epoch=None):
        """WER metric + searchers off-train."""
        if stage != Stage.TRAIN:
            self.wer_metric = ErrorRateStats()
            if not hasattr(self, "valid_searcher"):
                self.make_searchers()

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Anneal lr on valid WER, log, checkpoint."""
        if stage == Stage.TRAIN:
            return
        wer = self.wer_metric.summarize("error_rate")
        if stage == Stage.VALID:
            _, self.lr = self.hparams.lr_annealing(wer)
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": self.lr},
                train_stats={"loss": self.avg_train_loss},
                valid_stats={"loss": stage_loss, "WER": wer},
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"WER": wer}, min_keys=["WER"]
                )
        else:
            self.hparams.train_logger.log_stats(
                {"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats={"loss": stage_loss, "WER": wer},
            )
            with open(self.hparams.wer_file, "w") as f:
                self.wer_metric.write_stats(f)


def dataio_prepare(hparams, tokenizer):
    """Datasets yielding waveforms + BPE token streams."""
    from speechbrain_tpu.dataio.dataio import read_audio

    datasets = {}
    for split, path in [
        ("train", hparams["train_json"]),
        ("valid", hparams["valid_json"]),
        ("test", hparams["test_json"]),
    ]:
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
    from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

    with open(hparams_file) as f:
        hparams = load_hyperpyyaml(f, overrides)
    sb.create_experiment_directory(
        hparams["output_folder"], hparams_file, overrides
    )
    from mini_librispeech_prepare import prepare_mini_librispeech

    run_on_main(
        prepare_mini_librispeech,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_json_train": hparams["train_json"],
            "save_json_valid": hparams["valid_json"],
            "save_json_test": hparams["test_json"],
        },
    )
    from speechbrain_tpu.tokenizers.SentencePiece import SentencePiece

    tokenizer = SentencePiece(
        model_dir=hparams["tokenizer_dir"],
        vocab_size=hparams["vocab_size"],
        model_type=hparams["token_type"],
        annotation_train=hparams["train_json"],
        annotation_read="words",
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
