#!/usr/bin/env python3
"""Speech translation with TransformerST on Fisher-Callhome (TPU-native).

    python train.py hparams/transformer.yaml --data_folder /data/fisher

Mirrors the reference ``recipes/Fisher-Callhome-Spanish/ST/transformer``:
ST attention loss + auxiliary ASR branch (CTC and/or attention over
source-language transcripts), BLEU scored at test with greedy decode.

Manifests: ``{id: {wav, duration, transcription, translation_0}}`` —
the output of the reference's data prep, JSON-native.
"""

import sys

import jax
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import ctc_loss, kldiv_loss
from speechbrain_tpu.utils.bleu import BLEUStats


class ST(sb.Brain):
    """Brain for multi-task speech translation."""

    def compute_forward(self, batch, stage):
        """Wav -> frontend -> TransformerST (+aux ASR branch)."""
        import jax.numpy as jnp

        feats = self.hparams.compute_features(batch["sig"])
        feats, self._new_extra = self.hparams.normalize(
            feats, batch["sig_lens"],
            state=self._bound_extra["norm"],
            epoch=self.hparams.epoch_counter.current,
            training=stage == Stage.TRAIN,
        )
        self._new_extra = {"norm": self._new_extra}
        src = self.modules.frontend(feats)
        enc, dec = self.modules.transformer(
            src,
            batch["trans_tokens_bos"],
            wav_len=batch["sig_lens"],
            pad_idx=self.hparams.blank_index,
        )
        st_logp = jax.nn.log_softmax(
            self.modules.seq_lin(dec).astype(jnp.float32), axis=-1
        )
        ctc_logp = asr_logp = None
        if self.hparams.ctc_weight > 0:
            ctc_logp = jax.nn.log_softmax(
                self.modules.ctc_lin(enc).astype(jnp.float32), axis=-1
            )
        if self.hparams.asr_weight > 0 and self.hparams.ctc_weight < 1:
            asr_dec = self.modules.transformer(
                enc,
                batch["src_tokens_bos"],
                batch["sig_lens"],
                self.hparams.blank_index,
                method="forward_asr",
            )
            asr_logp = jax.nn.log_softmax(
                self.modules.asr_lin(asr_dec).astype(jnp.float32),
                axis=-1,
            )
        return st_logp, ctc_logp, asr_logp

    def init_extra_state(self, batch):
        """Fresh normalization stats."""
        from speechbrain_tpu.processing.features import GlobalNormState

        return {"norm": GlobalNormState.init(self.hparams.n_mels)}

    def compute_objectives(self, predictions, batch, stage):
        """(1-w_asr)*ST + w_asr*(w_ctc*CTC + (1-w_ctc)*ASR-attn)."""
        st_logp, ctc_logp, asr_logp = predictions
        mask = batch["batch_mask"]
        loss_st = kldiv_loss(
            st_logp,
            batch["trans_tokens_eos"],
            length=batch["trans_tokens_eos_lens"] * mask,
            label_smoothing=self.hparams.label_smoothing,
            reduction="batchmean",
        )
        loss = (1 - self.hparams.asr_weight) * loss_st
        if ctc_logp is not None:
            loss = loss + (
                self.hparams.asr_weight * self.hparams.ctc_weight
            ) * ctc_loss(
                ctc_logp,
                batch["src_tokens"],
                batch["sig_lens"] * mask,
                batch["src_tokens_lens"] * mask,
                blank_index=self.hparams.blank_index,
                        reduction="batchmean",
        )
        if asr_logp is not None:
            loss = loss + (
                self.hparams.asr_weight * (1 - self.hparams.ctc_weight)
            ) * kldiv_loss(
                asr_logp,
                batch["src_tokens_eos"],
                length=batch["src_tokens_eos_lens"] * mask,
                label_smoothing=self.hparams.label_smoothing,
                        reduction="batchmean",
        )
        if stage != Stage.TRAIN and hasattr(self, "bleu_metric"):
            real = int(np.asarray(mask).sum())
            hyp_ids = np.asarray(st_logp).argmax(-1)[:real]
            hyps = [
                self.tokenizer([h.tolist()], task="decode_from_list")[0]
                for h in hyp_ids
            ]
            refs = self.tokenizer(
                np.asarray(batch["trans_tokens"])[:real].tolist(),
                np.asarray(batch["trans_tokens_lens"])[:real],
                task="decode",
            )
            self.bleu_metric.append(
                [str(i) for i in range(real)], hyps, [refs]
            )
        return loss

    def on_fit_batch_end(self, batch, outputs, loss, should_step):
        """Noam lr per optimizer step."""
        if should_step:
            _, self.lr = self.hparams.noam_annealing()

    def on_stage_start(self, stage, epoch=None):
        """BLEU metric off-train."""
        if stage != Stage.TRAIN:
            self.bleu_metric = BLEUStats()

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Log + checkpoint by BLEU."""
        if stage == Stage.TRAIN:
            return
        bleu = self.bleu_metric.summarize("BLEU")
        if stage == Stage.VALID:
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": self.lr},
                train_stats={"loss": self.avg_train_loss},
                valid_stats={"loss": stage_loss, "BLEU": bleu},
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"BLEU": bleu}, max_keys=["BLEU"]
                )
        else:
            self.hparams.train_logger.log_stats(
                {"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats={"loss": stage_loss, "BLEU": bleu},
            )


def dataio_prepare(hparams, tokenizer):
    """Datasets yielding source transcript + target translation tokens."""
    from speechbrain_tpu.dataio.dataio import read_audio

    datasets = {}
    for split in ("train", "valid", "test"):
        ds = DynamicItemDataset.from_json(hparams[f"{split}_json"])
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")

        def trans_pipeline(translation_0):
            tokens = tokenizer.sp.encode_as_ids(translation_0)
            return (
                np.asarray(tokens, np.int64),
                np.asarray([hparams["bos_index"]] + tokens, np.int64),
                np.asarray(tokens + [hparams["eos_index"]], np.int64),
            )

        ds.add_dynamic_item(
            trans_pipeline,
            takes="translation_0",
            provides=[
                "trans_tokens", "trans_tokens_bos", "trans_tokens_eos",
            ],
        )

        def src_pipeline(transcription):
            tokens = tokenizer.sp.encode_as_ids(transcription)
            return (
                np.asarray(tokens, np.int64),
                np.asarray([hparams["bos_index"]] + tokens, np.int64),
                np.asarray(tokens + [hparams["eos_index"]], np.int64),
            )

        ds.add_dynamic_item(
            src_pipeline,
            takes="transcription",
            provides=["src_tokens", "src_tokens_bos", "src_tokens_eos"],
        )
        ds.set_output_keys(
            [
                "id", "sig",
                "trans_tokens", "trans_tokens_bos", "trans_tokens_eos",
                "src_tokens", "src_tokens_bos", "src_tokens_eos",
            ]
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
    from speechbrain_tpu.tokenizers.SentencePiece import SentencePiece

    tokenizer = SentencePiece(
        model_dir=hparams["save_folder"],
        vocab_size=hparams["vocab_size"],
        annotation_train=hparams["train_json"],
        annotation_read="translation_0",
        model_type=hparams["token_type"],
        annotation_format="json",
    )
    datasets = dataio_prepare(hparams, tokenizer)
    brain = ST(
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
        max_key="BLEU",
    )
