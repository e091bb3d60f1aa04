#!/usr/bin/env python3
"""AISHELL-1 char-level CTC+attention ASR (TPU-native).

    python train.py hparams/train.yaml --data_folder /data/cv/en

Mirrors the reference ``recipes/AISHELL-1/ASR/seq2seq/train.py``:
CRDNN encoder, location-aware attentional GRU decoder, joint CTC +
NLL objective over characters, greedy decode for validation WER.
"""

import sys

import jax
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.dataio.encoder import CTCTextEncoder
from speechbrain_tpu.nnet.losses import ctc_loss, nll_loss
from speechbrain_tpu.utils.metric_stats import ErrorRateStats


class ASR(sb.Brain):
    """Brain for char-level CTC+attention training."""

    def compute_forward(self, batch, stage):
        """Wav -> Fbank -> CRDNN -> (CTC log-probs, seq log-probs)."""
        import jax.numpy as jnp

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
        return ctc_logp, seq_logp

    def init_extra_state(self, batch):
        """Fresh normalization stats."""
        from speechbrain_tpu.processing.features import GlobalNormState

        return {"norm": GlobalNormState.init(self.hparams.n_mels)}

    def compute_objectives(self, predictions, batch, stage):
        """ctc_weight * CTC + (1-w) * NLL; CER tracked off-train."""
        ctc_logp, seq_logp = predictions
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
                [str(i) for i in range(real)],
                hyps,
                targets,
                ind2lab=self.label_encoder.decode_ndim,
            )
        return loss

    def on_stage_start(self, stage, epoch=None):
        """Char-error metric off-train."""
        if stage != Stage.TRAIN:
            self.cer_metric = ErrorRateStats()

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Anneal lr on valid CER, log, checkpoint."""
        if stage == Stage.TRAIN:
            return
        cer = self.cer_metric.summarize("error_rate")
        if stage == Stage.VALID:
            _, self.lr = self.hparams.lr_annealing(cer)
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
    """Char-level datasets + label encoder."""
    from speechbrain_tpu.dataio.dataio import read_audio

    label_encoder = CTCTextEncoder()
    datasets = {}
    for split in ("train", "valid", "test"):
        ds = DynamicItemDataset.from_json(hparams[f"{split}_json"])
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")
        ds.add_dynamic_item(
            lambda w: [c for c in w if not c.isspace()], takes="transcript", provides="char_list"
        )

        def tokens_pipeline(char_list):
            tokens = label_encoder.encode_sequence(char_list)
            return (
                np.asarray(tokens, np.int64),
                np.asarray(
                    [hparams["bos_index"]] + tokens, np.int64
                ),
                np.asarray(
                    tokens + [hparams["eos_index"]], np.int64
                ),
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
    # Char inventory over ALL splits: dev/test otherwise crash on
    # characters absent from train (chars are a closed set anyway).
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
    sys.path.insert(0, __file__.rsplit("/ASR/", 1)[0])
    from aishell_prepare import prepare_aishell

    run_on_main(
        prepare_aishell,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
        },
    )
    datasets, label_encoder = dataio_prepare(hparams)
    brain = ASR(
        modules=hparams["modules"],
        opt_class=lambda lr: hparams["opt_class"](learning_rate=lr),
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=Checkpointer(hparams["save_folder"]),
    )
    brain.label_encoder = label_encoder
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
        min_key="CER",
    )
