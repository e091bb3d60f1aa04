#!/usr/bin/env python3
"""AISHELL-1 Mandarin conformer CTC/attention training (TPU-native).

    python train_with_wav2vect.py hparams/train_ASR_transformer_with_wav2vect.yaml --data_folder /data/aishell

Mirrors the reference ``recipes/AISHELL-1/ASR/transformer/train_with_wav2vect.py`` (wav2vec-frontend transformer):
character-level joint CTC+KL conformer, CER scored with greedy CTC
decode at validation (beam + LM fusion available via the shared
S2STransformerBeamSearch as in the LibriSpeech recipe).
"""

import sys

import jax
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.batch import BatchShapePolicy, PaddedBatch
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.dataio.encoder import CTCTextEncoder
from speechbrain_tpu.dataio.sampler import DynamicBatchSampler
from speechbrain_tpu.nnet.losses import ctc_loss, kldiv_loss
from speechbrain_tpu.utils.metric_stats import ErrorRateStats


class ASR(sb.Brain):
    """Brain for Mandarin char-level conformer training."""

    def compute_forward(self, batch, stage):
        """Wav -> Fbank -> conformer -> (CTC, seq) log-probs."""
        import jax.numpy as jnp

        # wav2vec conv latents replace the fbank+conv frontend
        src = self.modules.extractor(batch["sig"])
        if self.precision == "bf16":
            src = src.astype(jnp.bfloat16)
        enc, dec = self.modules.transformer(
            src,
            batch["tokens_bos"],
            wav_len=batch["sig_lens"],
            pad_idx=self.hparams.blank_index,
        )
        ctc_logp = jax.nn.log_softmax(
            self.modules.ctc_lin(enc).astype(jnp.float32), axis=-1
        )
        seq_logp = jax.nn.log_softmax(
            self.modules.seq_lin(dec).astype(jnp.float32), axis=-1
        )
        return ctc_logp, seq_logp

    def compute_objectives(self, predictions, batch, stage):
        """Joint CTC + label-smoothed KL; CER tracked off-train."""
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
        if stage != Stage.TRAIN and hasattr(self, "cer_metric"):
            from speechbrain_tpu.decoders.ctc import ctc_greedy_decode

            real = int(np.asarray(mask).sum())
            hyps = ctc_greedy_decode(
                ctc_logp, batch["sig_lens"],
                blank_id=self.hparams.blank_index,
            )[:real]
            targets = np.asarray(batch["tokens"])[:real].tolist()
            t_lens = np.asarray(batch["tokens_lens"])[:real]
            U = len(targets[0]) if targets else 0
            targets = [
                t[: int(round(l * U))] for t, l in zip(targets, t_lens)
            ]
            self.cer_metric.append(
                [str(i) for i in range(real)], hyps, targets,
                ind2lab=self.label_encoder.decode_ndim,
            )
        return loss

    def on_fit_batch_end(self, batch, outputs, loss, should_step):
        """Noam lr per optimizer step."""
        if should_step:
            _, self.lr = self.hparams.noam_annealing()

    def on_stage_start(self, stage, epoch=None):
        """CER metric off-train."""
        if stage != Stage.TRAIN:
            self.cer_metric = ErrorRateStats()

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Log + checkpoint by CER."""
        if stage == Stage.TRAIN:
            return
        cer = self.cer_metric.summarize("error_rate")
        if stage == Stage.VALID:
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": self.lr},
                train_stats={"loss": self.avg_train_loss},
                valid_stats={"loss": stage_loss, "CER": cer},
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"CER": cer}, min_keys=["CER"]
                )
        else:
            self.hparams.train_logger.log_stats(
                {"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats={"loss": stage_loss, "CER": cer},
            )


def dataio_prepare(hparams):
    """Char-level datasets + inventory over all splits."""
    from speechbrain_tpu.dataio.dataio import read_audio

    label_encoder = CTCTextEncoder()
    datasets = {}
    for split in ("train", "valid", "test"):
        ds = DynamicItemDataset.from_json(hparams[f"{split}_json"])
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")
        ds.add_dynamic_item(
            lambda t: list(t.replace(" ", "")),
            takes="transcript",
            provides="char_list",
        )

        def tokens_pipeline(char_list):
            tokens = label_encoder.encode_sequence(char_list)
            return (
                np.asarray(tokens, np.int64),
                np.asarray([hparams["bos_index"]] + tokens, np.int64),
                np.asarray(tokens + [hparams["eos_index"]], np.int64),
            )

        ds.add_dynamic_item(
            tokens_pipeline,
            takes="char_list",
            provides=["tokens", "tokens_bos", "tokens_eos"],
        )
        ds.set_output_keys(
            ["id", "sig", "tokens", "tokens_bos", "tokens_eos"]
        )
        datasets[split] = ds
    label_encoder.load_or_create(
        path=hparams["save_folder"] + "/label_encoder.txt",
        from_didatasets=[datasets[s] for s in ("train", "valid", "test")],
        output_key="char_list",
        sequence_input=True,
        special_labels={
            "blank_label": "<blank>",
            "bos_label": "<bos>",
            "eos_label": "<eos>",
        },
    )
    sampler = DynamicBatchSampler(
        datasets["train"],
        max_batch_length=hparams["max_batch_length"],
        num_buckets=hparams["num_buckets"],
        shuffle=True,
    )
    sr = hparams["sample_rate"]
    token_buckets = [16, 32, 64, 128]
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
        datasets["train"],
        batch_sampler=sampler,
        num_workers=hparams["num_workers"],
        collate_fn=lambda ex: PaddedBatch(ex, shape_policy=policy),
    )
    valid_loader = SaveableDataLoader(datasets["valid"], batch_size=8)
    test_loader = SaveableDataLoader(datasets["test"], batch_size=8)
    return train_loader, valid_loader, test_loader, label_encoder


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
    sys.path.insert(0, __file__.rsplit("/ASR/", 1)[0])
    from aishell_prepare import prepare_aishell

    run_on_main(
        prepare_aishell,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
        },
    )
    loaders = dataio_prepare(hparams)
    train_loader, valid_loader, test_loader, label_encoder = loaders
    brain = ASR(
        modules=hparams["modules"],
        opt_class=lambda lr: hparams["opt_class"](learning_rate=lr),
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=Checkpointer(hparams["save_folder"]),
    )
    brain.label_encoder = label_encoder
    brain.fit(hparams["epoch_counter"], train_loader, valid_loader)
    brain.evaluate(test_loader, min_key="CER")
