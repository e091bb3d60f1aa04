#!/usr/bin/env python3
"""LibriSpeech conformer-transducer training (Pallas RNN-T loss).

    python train.py hparams/conformer_transducer.yaml \
        --data_folder /data/LibriSpeech
"""

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
from speechbrain_tpu.decoders.transducer import TransducerBeamSearcher
from speechbrain_tpu.nnet.losses import transducer_loss
from speechbrain_tpu.utils.distributed import run_on_main
from speechbrain_tpu.utils.metric_stats import ErrorRateStats


class Transducer(sb.Brain):
    def compute_forward(self, batch, stage):
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
        if self.precision == "bf16":
            feats = feats.astype(jnp.bfloat16)
        if "transformer" in self.modules:
            src = self.modules.frontend(feats)
            enc = self.modules.transformer(
                src, batch["sig_lens"], method="encode"
            )
        else:
            # CRDNN encoder (the reference transducer recipe's own
            # encoder, recipes/LibriSpeech/ASR/transducer/train.py:10)
            enc = self.modules.enc(feats, lengths=batch["sig_lens"])
        enc = self.modules.enc_lin(enc)
        emb = self.modules.emb(batch["tokens_blank"])
        pred, _ = self.modules.dec(emb)
        pred = self.modules.dec_lin(pred)
        joint = jnp.tanh(
            enc[:, :, None, :] + pred[:, None, :, :]
        )
        return self.modules.out_lin(joint).astype(jnp.float32), enc

    def init_extra_state(self, batch):
        from speechbrain_tpu.processing.features import GlobalNormState

        return {"norm": GlobalNormState.init(self.hparams.n_mels)}

    def compute_objectives(self, predictions, batch, stage):
        logits, enc = predictions
        mask = batch["batch_mask"]
        loss = transducer_loss(
            logits,
            batch["tokens"],
            batch["sig_lens"] * mask,
            batch["tokens_lens"] * mask,
            blank_index=self.hparams.blank_index,
            use_pallas=True,
        )
        if stage == Stage.TEST and hasattr(self, "wer_metric"):
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
            self.wer_metric.append(
                [str(i) for i in range(real)], predicted, targets
            )
        return loss

    def on_stage_start(self, stage, epoch=None):
        if stage == Stage.TEST:
            self.wer_metric = ErrorRateStats()
            self._searcher = self.transducer_searcher()

    def on_fit_batch_end(self, batch, outputs, loss, should_step):
        if should_step:
            _, self.lr = self.hparams.noam_annealing()

    def transducer_searcher(self):
        """TransducerBeamSearcher over the trained prediction/joint
        nets (test-time decoding; hparams beam_size/state_beam/
        expand_beam)."""

        def pred_step(tokens, state, n):
            import jax.numpy as jnp

            # State is kept BATCH-LEADING ((B, L, H)) because the
            # greedy scan and beam permutation index state leaves by
            # their leading axis; the GRU's hx is (L, B, H).
            if tokens is None:
                # reference semantics: the initial PN input is the
                # BLANK token's embedding (decoders/transducer.py
                # input_PN = blank), which also keeps the lazily
                # initialized GRU input width = embedding_dim
                blank_tok = jnp.full(
                    (n, 1), self.hparams.blank_index, jnp.int32
                )
                emb = self.modules.emb(blank_tok)
                out, hx = self.modules.dec(emb)
            else:
                emb = self.modules.emb(tokens[:, None])
                out, hx = self.modules.dec(
                    emb, hx=jnp.swapaxes(state, 0, 1)
                )
            return (
                self.modules.dec_lin(out[:, 0]),
                jnp.swapaxes(hx, 0, 1),
            )

        def joint(enc, pred):
            import jax.numpy as jnp

            return self.modules.out_lin(jnp.tanh(enc + pred))

        return TransducerBeamSearcher(
            decode_fn=pred_step,
            joint_fn=joint,
            blank_id=self.hparams.blank_index,
            beam_size=self.hparams.beam_size,
            state_beam=self.hparams.state_beam,
            expand_beam=self.hparams.expand_beam,
        )

    def on_stage_end(self, stage, stage_loss, epoch=None):
        if stage == Stage.VALID:
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": self.lr},
                train_stats={"loss": self.avg_train_loss},
                valid_stats={"loss": stage_loss},
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"loss": stage_loss}, min_keys=["loss"]
                )
        elif stage == Stage.TEST:
            wer = self.wer_metric.summarize("error_rate")
            self.hparams.train_logger.log_stats(
                {"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats={"loss": stage_loss, "WER": wer},
            )


def dataio_prepare(hparams, tokenizer):
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
                np.asarray(
                    [hparams["blank_index"]] + tokens, np.int64
                ),
            )

        ds.add_dynamic_item(
            text_pipeline, takes="words",
            provides=["tokens", "tokens_blank"],
        )
        ds.set_output_keys(["id", "sig", "tokens", "tokens_blank"])
        datasets[split] = ds
    sampler = DynamicBatchSampler(
        datasets["train"],
        max_batch_length=hparams["max_batch_length"],
        num_buckets=hparams["num_buckets"],
        shuffle=True,
    )
    sr = hparams["sample_rate"]
    # Scope time buckets to the waveform; token dims get their own
    # small menu (U drives the (B,T,U,V) joint — keep it tight).
    token_buckets = [16, 32, 64, 128, 256]
    policy = BatchShapePolicy(
        time_buckets=[int(b * sr) for b in sampler.bucket_boundaries],
        time_keys=("sig",),
        # tokens_blank = [blank] + tokens must stay exactly one longer
        # than tokens after padding (the U+1 joint axis).
        key_buckets={
            "tokens": token_buckets,
            "tokens_blank": [b + 1 for b in token_buckets],
        },
        batch_buckets=[2, 4, 8, 16, 32, 64, 128],
    )
    from speechbrain_tpu.dataio.batch import PaddedBatch

    train_loader = SaveableDataLoader(
        datasets["train"],
        batch_sampler=sampler,
        num_workers=hparams["num_workers"],
        collate_fn=lambda ex: PaddedBatch(ex, shape_policy=policy),
    )
    valid_loader = SaveableDataLoader(datasets["valid"], batch_size=8)
    test_loader = SaveableDataLoader(datasets["test"], batch_size=8)
    return train_loader, valid_loader, test_loader


if __name__ == "__main__":
    hparams_file, run_opts, overrides = sb.parse_arguments(sys.argv[1:])
    from speechbrain_tpu.utils.checkpoints import Checkpointer
    from speechbrain_tpu.utils.distributed import ddp_init_group
    from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

    ddp_init_group(run_opts)
    with open(hparams_file) as f:
        hparams = load_hyperpyyaml(f, overrides)
    sb.create_experiment_directory(
        hparams["output_folder"], hparams_file, overrides
    )
    sys.path.insert(
        0, __file__.rsplit("/ASR/", 1)[0]
    )
    from librispeech_prepare import prepare_librispeech

    run_on_main(
        prepare_librispeech,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
            "tr_splits": ["train-clean-100"],
            "dev_splits": ["dev-clean"],
            "te_splits": ["test-clean"],
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
    train_loader, valid_loader, test_loader = dataio_prepare(
        hparams, tokenizer
    )
    brain = Transducer(
        modules=hparams["modules"],
        opt_class=lambda lr: hparams["opt_class"](learning_rate=lr),
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=Checkpointer(hparams["save_folder"]),
    )
    brain.tokenizer = tokenizer
    brain.fit(hparams["epoch_counter"], train_loader, valid_loader)
    brain.evaluate(test_loader, min_key="loss")
