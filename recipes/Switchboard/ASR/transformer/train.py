#!/usr/bin/env python3
"""Switchboard conformer hybrid CTC/attention ASR (TPU-native).

Run (per host):
    python train.py hparams/transformer.yaml --data_folder /data/switchboard

Mirrors the reference ``recipes/Switchboard/ASR/transformer/train.py``:
joint CTC+KL objectives, Noam lr per optimizer step, dynamic bucketed
batching over conversation segments (stereo SPHERE audio, per-channel
cuts), beam-search evaluation with contraction-normalized WER
(normalize_util), tested on eval2000/Hub5 when prepared.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.batch import BatchShapePolicy
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.dataio.sampler import DynamicBatchSampler
from speechbrain_tpu.decoders.seq2seq import S2STransformerBeamSearch
from speechbrain_tpu.nnet.losses import ctc_loss, kldiv_loss
from speechbrain_tpu.utils.distributed import run_on_main
from speechbrain_tpu.utils.metric_stats import ErrorRateStats


class ASR(sb.Brain):
    def compute_forward(self, batch, stage):
        wavs, wav_lens = batch["sig"], batch["sig_lens"]
        feats = self.hparams.compute_features(wavs)
        feats, self._new_extra = self.hparams.normalize(
            feats,
            wav_lens,
            state=self._bound_extra["norm"],
            epoch=self.hparams.epoch_counter.current,
            training=stage == Stage.TRAIN,
        )
        self._new_extra = {"norm": self._new_extra}
        if stage == Stage.TRAIN and hasattr(self.hparams, "augmentation"):
            feats = self.hparams.augmentation(
                feats, self._bound_rngs["augment"]
            )
        if self.precision == "bf16":
            feats = feats.astype(jnp.bfloat16)
        src = self.modules.frontend(feats)
        enc, dec = self.modules.transformer(
            src,
            batch["tokens_bos"],
            wav_len=wav_lens,
            pad_idx=self.hparams.blank_index,
        )
        ctc_logp = jax.nn.log_softmax(
            self.modules.ctc_lin(enc).astype(jnp.float32), axis=-1
        )
        seq_logp = jax.nn.log_softmax(
            self.modules.seq_lin(dec).astype(jnp.float32), axis=-1
        )
        return ctc_logp, seq_logp

    def init_extra_state(self, batch):
        from speechbrain_tpu.processing.features import GlobalNormState

        return {"norm": GlobalNormState.init(self.hparams.n_mels)}

    def compute_objectives(self, predictions, batch, stage):
        ctc_logp, seq_logp = predictions
        mask = batch["batch_mask"]
        loss_ctc = ctc_loss(
            ctc_logp,
            batch["tokens"],
            batch["sig_lens"] * mask,
            batch["tokens_lens"] * mask,
            blank_index=self.hparams.blank_index,
            reduction="batchmean",
        )
        loss_seq = kldiv_loss(
            seq_logp,
            batch["tokens_eos"],
            length=batch["tokens_eos_lens"] * mask,
            label_smoothing=self.hparams.label_smoothing,
            reduction="batchmean",
        )
        loss = (
            self.hparams.ctc_weight * loss_ctc
            + (1 - self.hparams.ctc_weight) * loss_seq
        )
        if stage != Stage.TRAIN and hasattr(self, "wer_metric"):
            hyps, _ = self._beam_search(batch)
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
            from recipes.Switchboard.normalize_util import (
                normalize_words,
            )

            ids = [str(i) for i in range(real)]
            self.wer_metric.append(
                ids, normalize_words(predicted), normalize_words(targets)
            )
        return loss

    def _make_searcher(self):
        lm_fn = None
        lm_weight = 0.0
        if getattr(self, "lm_params", None) is not None:
            lm_weight = self.hparams.lm_weight
            lm_fn = lambda prefix: self.hparams.lm_model.apply(
                self.lm_params, prefix, train=False
            )
        return S2STransformerBeamSearch(
            lm_fn=lm_fn,
            lm_weight=lm_weight,
            decode_fn=lambda prefix, e, el: self.modules.transformer(
                prefix, e, el, method="decode"
            )[0],
            # KV-cached incremental decoding: O(1) projection/FFN work
            # per step (decode_step), cross K/V precomputed once
            # (decode_cache_init) — the serving fast path.
            cache_init_fn=lambda e, max_steps: self.modules.transformer(
                e, max_steps, method="decode_cache_init"
            ),
            step_fn=lambda tok, cache, pos, el: self.modules.transformer(
                tok, cache, pos, el, method="decode_step"
            ),
            linear_fn=lambda d: self.modules.seq_lin(d[:, None])[:, 0],
            ctc_linear_fn=lambda e: self.modules.ctc_lin(e),
            bos_index=self.hparams.bos_index,
            eos_index=self.hparams.eos_index,
            blank_index=self.hparams.blank_index,
            min_decode_ratio=self.hparams.min_decode_ratio,
            max_decode_ratio=self.hparams.max_decode_ratio,
            beam_size=self.hparams.valid_beam_size,
            ctc_weight=self.hparams.ctc_weight_decode,
            using_eos_threshold=False,
            length_normalization=True,
        )

    def _search_impl(self, params, model_state, extra, sig, sig_lens):
        """Whole decode (features -> encoder -> beam search) as one
        traced program — a single device dispatch per batch."""
        rngs = self._make_step_rngs(jax.random.PRNGKey(0))
        self._bind(params, model_state, extra, rngs, train=False)
        feats = self.hparams.compute_features(sig)
        feats, _ = self.hparams.normalize(
            feats, sig_lens,
            state=self._bound_extra["norm"], training=False,
        )
        src = self.modules.frontend(feats)
        enc = self.modules.transformer(src, sig_lens, method="encode")
        # early_exit=True: the search is a lax.while_loop whose
        # condition stops once every batch row has a full beam of
        # finalized hypotheses — typical utterances stop after ~L_tok
        # steps instead of max_decode_ratio * T_enc.
        return self._searcher.search_device(
            enc, sig_lens, early_exit=True
        )

    def _beam_search(self, batch):
        if not hasattr(self, "_searcher"):
            self._searcher = self._make_searcher()
            from speechbrain_tpu.utils.aot import host_traced_jit

            # host-traced: avoids the remote-dispatch constant-fetch
            # stall at lowering (utils/aot.py)
            self._jitted_search = host_traced_jit(self._search_impl)
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
        if should_step:
            _, new_lr = self.hparams.noam_annealing()
            self.lr = new_lr

    def on_stage_start(self, stage, epoch=None):
        if stage != Stage.TRAIN:
            self.wer_metric = ErrorRateStats()

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == Stage.TRAIN:
            return
        wer = self.wer_metric.summarize("error_rate")
        stats = {"loss": stage_loss, "WER": wer}
        if stage == Stage.VALID:
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": self.lr},
                train_stats={"loss": self.avg_train_loss},
                valid_stats=stats,
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"WER": wer}, min_keys=["WER"]
                )
        elif stage == Stage.TEST:
            self.hparams.train_logger.log_stats(
                {"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats=stats,
            )
            if getattr(self.hparams, "wer_file", None):
                with open(self.hparams.wer_file, "w") as w:
                    self.wer_metric.write_stats(w)


def make_dataset(path, hparams, tokenizer):
    ds = DynamicItemDataset.from_json(path)

    def audio_pipeline(wav, channel):
        from speechbrain_tpu.dataio.dataio import read_audio

        sig = read_audio(wav)
        if sig.ndim > 1:  # stereo conversation: pick this side's channel
            sig = sig[:, int(channel)]
        return sig

    ds.add_dynamic_item(
        audio_pipeline, takes=["wav", "channel"], provides="sig"
    )

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
    return ds


def dataio_prepare(hparams, tokenizer):
    train_ds = make_dataset(hparams["train_json"], hparams, tokenizer)
    valid_ds = make_dataset(hparams["valid_json"], hparams, tokenizer)
    test_sets = {}
    for split in hparams["test_splits"]:
        path = os.path.join(hparams["save_folder"], split + ".json")
        if os.path.exists(path):
            test_sets[split] = make_dataset(path, hparams, tokenizer)
    sampler = DynamicBatchSampler(
        train_ds,
        max_batch_length=hparams["max_batch_length"],
        num_buckets=hparams["num_buckets"],
        shuffle=True,
    )
    sr = hparams["sample_rate"]
    token_buckets = [16, 32, 64, 128, 256, 512]
    policy = BatchShapePolicy(
        time_buckets=[int(b * sr) for b in sampler.bucket_boundaries],
        time_keys=("sig",),
        key_buckets={
            k: token_buckets
            for k in ("tokens", "tokens_bos", "tokens_eos")
        },
        batch_buckets=[2, 4, 8, 16, 32, 64, 128],
    )
    train_loader = SaveableDataLoader(
        train_ds,
        batch_sampler=sampler,
        num_workers=hparams["num_workers"],
        collate_fn=lambda ex: __import__(
            "speechbrain_tpu.dataio.batch", fromlist=["PaddedBatch"]
        ).PaddedBatch(ex, shape_policy=policy),
    )
    valid_loader = SaveableDataLoader(valid_ds, batch_size=8)
    test_loaders = {
        split: SaveableDataLoader(ds, batch_size=8)
        for split, ds in test_sets.items()
    }
    return train_loader, valid_loader, test_loaders


if __name__ == "__main__":
    hparams_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])
    from speechbrain_tpu.utils.distributed import ddp_init_group
    from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

    ddp_init_group(run_opts)
    with open(hparams_file) as f:
        hparams = load_hyperpyyaml(f, overrides)
    sb.create_experiment_directory(
        experiment_directory=hparams["output_folder"],
        hyperparams_to_save=hparams_file,
        overrides=overrides,
    )
    sys.path.append("../../../")
    from recipes.Switchboard.switchboard_prepare import (
        prepare_switchboard,
    )

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
    train_loader, valid_loader, test_loaders = dataio_prepare(
        hparams, tokenizer
    )
    from speechbrain_tpu.utils.checkpoints import Checkpointer

    checkpointer = Checkpointer(hparams["save_folder"])
    # The lr schedule is per-OPTIMIZER-STEP state owned by the recipe
    # (reference convention); without registration a killed run resumes
    # its parameters but restarts the Noam warmup (caught by the
    # round-3 kill/resume dress rehearsal: epoch-5 lr fell back to the
    # epoch-1 value).
    checkpointer.add_recoverable(
        "noam_annealing", hparams["noam_annealing"]
    )
    asr_brain = ASR(
        modules=hparams["modules"],
        opt_class=lambda lr: hparams["opt_class"](learning_rate=lr),
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=checkpointer,
    )
    asr_brain.tokenizer = tokenizer
    asr_brain.fit(
        hparams["epoch_counter"], train_loader, valid_loader
    )
    asr_brain.hparams.valid_beam_size = hparams["test_beam_size"]
    for split, loader in test_loaders.items():
        asr_brain.hparams.wer_file = os.path.join(
            hparams["output_folder"], f"wer_{split}.txt"
        )
        asr_brain.evaluate(loader, min_key="WER")
