#!/usr/bin/env python3
"""Taigi -> Mandarin speech translation over wav2vec 2.0 (TPU-native).

    python train_wav2vec.py hparams/transformer_wav2vec.yaml \
        --data_folder /data/taigi

Mirrors the fork-specific reference recipe
``recipes/Taigi/ST/transformer/train_wav2vec.py`` (wav2vec2-large
features feeding a 2-encoder/6-decoder transformer ST model, attention
(KL label-smoothing) loss only, char-level BLEU + CER with spaces
removed, beam search at test and every ``valid_search_interval``
validation epochs).  The wav2vec2 encoder is the Flax-backed wrapper
(``lobes/models/huggingface_wav2vec.py`` over the from-scratch
``wav2vec2_flax`` module) loaded from a local checkpoint; it is frozen
here (its params are closed over as jit constants), the trainable
parameters are the ST transformer + output projection.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.decoders.seq2seq import S2STransformerBeamSearch
from speechbrain_tpu.nnet.losses import kldiv_loss
from speechbrain_tpu.utils.bleu import BLEUStats
from speechbrain_tpu.utils.metric_stats import ErrorRateStats


class ST(sb.Brain):
    """Brain for wav2vec2-based attention-only speech translation."""

    def compute_forward(self, batch, stage):
        """Wav -> wav2vec2 features -> transformer ST."""
        wavs, wav_lens = batch["sig"], batch["sig_lens"]
        feats = self.w2v(wavs, wav_lens)
        if self.precision == "bf16":
            feats = feats.astype(jnp.bfloat16)
        _, dec = self.modules.transformer(
            feats,
            batch["tokens_bos"],
            wav_len=wav_lens,
            pad_idx=self.hparams.pad_index,
        )
        p_seq = jax.nn.log_softmax(
            self.modules.seq_lin(dec).astype(jnp.float32), axis=-1
        )
        return p_seq

    def compute_objectives(self, predictions, batch, stage):
        """ST attention loss; BLEU/CER on searched hyps off-train."""
        p_seq = predictions
        mask = batch["batch_mask"]
        loss = kldiv_loss(
            p_seq,
            batch["tokens_eos"],
            length=batch["tokens_eos_lens"] * mask,
            label_smoothing=self.hparams.label_smoothing,
            reduction="batchmean",
        )
        if stage == Stage.TRAIN or not hasattr(self, "bleu_metric"):
            return loss
        epoch = self.hparams.epoch_counter.current
        do_search = stage == Stage.TEST or (
            epoch % self.hparams.valid_search_interval == 0
        )
        if do_search:
            hyps, _ = self._beam_search(batch)
            real = int(np.asarray(mask).sum())
            # Char-level scoring, spaces removed (reference
            # remove_spaces=True): "word word" -> "w o r d w o r d".
            predicted = [
                " ".join(
                    "".join(
                        self.tokenizer([h], task="decode_from_list")[0]
                    )
                )
                for h in hyps[:real]
            ]
            targets = [
                " ".join("".join(words))
                for words in self.tokenizer(
                    np.asarray(batch["tokens"])[:real].tolist(),
                    np.asarray(batch["tokens_lens"])[:real],
                    task="decode",
                )
            ]
            ids = [str(i) for i in range(real)]
            self.bleu_metric.append(ids, predicted, [targets])
            self.cer_metric.append(ids, predicted, targets)
        return loss

    def _make_searcher(self):
        return S2STransformerBeamSearch(
            decode_fn=lambda prefix, e, el: self.modules.transformer(
                prefix, e, el, method="decode"
            )[0],
            linear_fn=lambda d: self.modules.seq_lin(d[:, None])[:, 0],
            bos_index=self.hparams.bos_index,
            eos_index=self.hparams.eos_index,
            blank_index=self.hparams.blank_index,
            min_decode_ratio=self.hparams.min_decode_ratio,
            max_decode_ratio=self.hparams.max_decode_ratio,
            beam_size=self.hparams.valid_beam_size,
            ctc_weight=0.0,
            using_eos_threshold=False,
            length_normalization=True,
        )

    def _search_impl(self, params, model_state, extra, sig, sig_lens):
        """Whole decode (wav2vec2 -> encoder -> search) as one traced
        program: a single device dispatch per batch."""
        rngs = self._make_step_rngs(jax.random.PRNGKey(0))
        self._bind(params, model_state, extra, rngs, train=False)
        feats = self.w2v(sig, sig_lens)
        enc = self.modules.transformer(feats, sig_lens, method="encode")
        return self._searcher.search_device(
            enc, sig_lens, early_exit=False
        )

    def _beam_search(self, batch):
        if not hasattr(self, "_searcher"):
            self._searcher = self._make_searcher()
            self._jitted_search = jax.jit(self._search_impl)
        saved = (
            self._bound_params, self._bound_state,
            self._bound_extra, self._bound_rngs, self._bound_train,
        )
        try:
            search_out = self._jitted_search(
                self.train_state["params"],
                self.train_state["model_state"],
                self.train_state["extra"],
                batch["sig"],
                batch["sig_lens"],
            )
        finally:
            (
                self._bound_params, self._bound_state,
                self._bound_extra, self._bound_rngs, self._bound_train,
            ) = saved
        return self._searcher.finalize(*search_out)

    def on_fit_batch_end(self, batch, outputs, loss, should_step):
        """Noam lr per optimizer step."""
        if should_step:
            _, self.lr = self.hparams.noam_annealing()

    def on_stage_start(self, stage, epoch=None):
        """BLEU + CER metrics off-train."""
        if stage != Stage.TRAIN:
            self.bleu_metric = BLEUStats()
            self.cer_metric = ErrorRateStats()

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Log + checkpoint by BLEU."""
        if stage == Stage.TRAIN:
            return
        stats = {"loss": stage_loss}
        if len(self.bleu_metric.ids) > 0:
            stats["BLEU"] = self.bleu_metric.summarize("BLEU")
            stats["CER"] = self.cer_metric.summarize("error_rate")
        if stage == Stage.VALID:
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": getattr(self, "lr", 0.0)},
                train_stats={"loss": self.avg_train_loss},
                valid_stats=stats,
            )
            if self.checkpointer is not None:
                meta = {"BLEU": stats.get("BLEU", 0.0)}
                self.checkpointer.save_and_keep_only(
                    meta=meta, max_keys=["BLEU"]
                )
        else:
            self.hparams.train_logger.log_stats(
                {"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats=stats,
            )
            with open(self.hparams.bleu_file, "w") as f:
                self.bleu_metric.write_stats(f)
            with open(self.hparams.cer_file, "w") as f:
                self.cer_metric.write_stats(f)


def dataio_prepare(hparams, tokenizer):
    """Datasets yielding target-translation token streams."""
    from speechbrain_tpu.dataio.dataio import read_audio

    datasets = {}
    for split, path in (
        ("train", hparams["train_json"]),
        ("valid", hparams["valid_json"]),
        ("test", hparams["test_json"]),
    ):
        ds = DynamicItemDataset.from_json(path)
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")

        def text_pipeline(translation):
            tokens = tokenizer.sp.encode_as_ids(translation)
            return (
                np.asarray(tokens, np.int64),
                np.asarray([hparams["bos_index"]] + tokens, np.int64),
                np.asarray(tokens + [hparams["eos_index"]], np.int64),
            )

        ds.add_dynamic_item(
            text_pipeline,
            takes="translation",
            provides=["tokens", "tokens_bos", "tokens_eos"],
        )
        ds.set_output_keys(
            ["id", "sig", "tokens", "tokens_bos", "tokens_eos"]
        )
        if split == "train" and hparams.get("sorting", "random") in (
            "ascending",
            "descending",
        ):
            ds = ds.filtered_sorted(
                sort_key="duration",
                reverse=hparams["sorting"] == "descending",
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
        hparams["output_folder"], hparams_file, overrides
    )
    sys.path.append("../../")
    from recipes.Taigi.taigi_prepare import prepare_taigi

    run_on_main(
        prepare_taigi,
        kwargs={
            "dataset_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
            "seed": hparams["seed"],
            "skip_prep": hparams.get("skip_prep", False),
        },
    )
    from speechbrain_tpu.tokenizers.SentencePiece import SentencePiece

    tokenizer = SentencePiece(
        model_dir=hparams["save_folder"],
        vocab_size=hparams["vocab_size"],
        annotation_train=hparams["train_json"],
        annotation_read="translation",
        model_type=hparams["token_type"],
        annotation_format="json",
        character_coverage=hparams.get("character_coverage", 1.0),
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
    brain.w2v = hparams["wav2vec2"](
        source=hparams["wav2vec2_source"],
        freeze=hparams["freeze_wav2vec"],
    )
    brain.fit(
        hparams["epoch_counter"],
        SaveableDataLoader(
            datasets["train"],
            batch_size=hparams["batch_size"],
            shuffle=hparams.get("sorting", "random") == "random",
        ),
        SaveableDataLoader(
            datasets["valid"], batch_size=hparams["batch_size"]
        ),
    )
    brain.hparams.valid_beam_size = hparams["test_beam_size"]
    brain.evaluate(
        SaveableDataLoader(
            datasets["test"], batch_size=hparams["batch_size"]
        ),
        max_key="BLEU",
    )
