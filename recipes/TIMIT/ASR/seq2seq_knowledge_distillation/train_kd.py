#!/usr/bin/env python3
"""TIMIT knowledge-distillation STUDENT training (TPU-native).

    python train_kd.py hparams/train_kd.yaml --data_folder /data/TIMIT \
        --teacher_posteriors_folder results/save_teachers

Mirrors the reference
``recipes/TIMIT/ASR/seq2seq_knowledge_distillation/train_kd.py``: the
student's CTC/attention losses are blended with distillation terms
against the teacher-ensemble posteriors dumped by
``save_teachers.py`` (ctc_loss_kd / nll_loss_kd,
``nnet/losses.py:1067,1143`` reference semantics).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.decoders.seq2seq import S2SRNNBeamSearcher
from speechbrain_tpu.nnet.losses import (
    ctc_loss,
    ctc_loss_kd,
    nll_loss,
    nll_loss_kd,
)
from speechbrain_tpu.utils.metric_stats import ErrorRateStats


class ASR(sb.Brain):
    """Brain for seq2seq phoneme training."""

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
        enc = self.modules.enc(feats, lengths=batch["sig_lens"])
        emb = self.modules.emb(batch["phn_encoded_bos"])
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

        return {
            "norm": GlobalNormState.init(
                self.hparams.n_mels * (3 if self.hparams.deltas else 1)
            )
        }

    def compute_objectives(self, predictions, batch, stage):
        """ctc_weight * CTC + (1-w) * NLL; beam PER off-train."""
        ctc_logp, seq_logp, enc = predictions
        mask = batch["batch_mask"]
        loss_ctc = ctc_loss(
            ctc_logp,
            batch["phn_encoded"],
            batch["sig_lens"] * mask,
            batch["phn_encoded_lens"] * mask,
            blank_index=self.hparams.blank_index,
        )
        loss_seq = nll_loss(
            seq_logp,
            batch["phn_encoded_eos"],
            length=batch["phn_encoded_eos_lens"] * mask,
        )
        loss_gt = (
            self.hparams.ctc_weight * loss_ctc
            + (1 - self.hparams.ctc_weight) * loss_seq
        )
        # Distillation against the teacher-ensemble posteriors
        tea_ctc = batch["teacher_ctc"]
        tea_seq = batch["teacher_seq"]
        Tc = min(ctc_logp.shape[1], tea_ctc.shape[1])
        loss_ctc_kd = ctc_loss_kd(
            ctc_logp[:, :Tc],
            tea_ctc[:, :Tc],
            batch["sig_lens"] * mask,
            blank_index=self.hparams.blank_index,
        )
        Us = min(seq_logp.shape[1], tea_seq.shape[1])
        loss_seq_kd = nll_loss_kd(
            seq_logp[:, :Us],  # student LOG-probs (reference recipe)
            tea_seq[:, :Us],
            batch["phn_encoded_eos_lens"] * mask,
        )
        loss_kd = (
            self.hparams.ctc_weight * loss_ctc_kd
            + (1 - self.hparams.ctc_weight) * loss_seq_kd
        )
        w = self.hparams.kd_weight
        loss = (1 - w) * loss_gt + w * loss_kd
        if stage != Stage.TRAIN and hasattr(self, "per_metrics"):
            hyps, _ = self._searcher(enc, batch["sig_lens"])
            real = int(np.asarray(mask).sum())
            self.per_metrics.append(
                [str(i) for i in range(real)],
                hyps[:real],
                np.asarray(batch["phn_encoded"])[:real].tolist(),
                target_len=np.asarray(batch["phn_encoded_lens"])[:real],
                ind2lab=self.label_encoder.decode_ndim,
            )
        return loss

    def on_stage_start(self, stage, epoch=None):
        """Build the stage beam searcher; PER metric off-train."""
        if stage != Stage.TRAIN:
            self.per_metrics = ErrorRateStats()
            beam = (
                self.hparams.valid_beam_size
                if stage == Stage.VALID
                else self.hparams.test_beam_size
            )
            self._searcher = S2SRNNBeamSearcher(
                embedding_fn=lambda t: self.modules.emb(t),
                decoder_step_fn=lambda e, hs, c, es, el, ast: (
                    self.modules.dec(
                        e, hs, c, es, el, ast, method="forward_step"
                    )
                ),
                linear_fn=lambda d: self.modules.seq_lin(d[:, None])[
                    :, 0
                ],
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
                beam_size=beam,
                eos_threshold=self.hparams.eos_threshold,
                using_max_attn_shift=self.hparams.using_max_attn_shift,
                max_attn_shift=self.hparams.max_attn_shift,
                coverage_penalty=self.hparams.coverage_penalty,
                ctc_weight=self.hparams.ctc_weight_decode,
            )

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Anneal lr on valid PER, log, checkpoint."""
        if stage == Stage.TRAIN:
            return
        per = self.per_metrics.summarize("error_rate")
        if stage == Stage.VALID:
            _, self.lr = self.hparams.lr_annealing(per)
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": self.lr},
                train_stats={"loss": self.avg_train_loss},
                valid_stats={"loss": stage_loss, "PER": per},
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"PER": per}, min_keys=["PER"]
                )
        else:
            self.hparams.train_logger.log_stats(
                {"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats={"loss": stage_loss, "PER": per},
            )
            with open(self.hparams.per_file, "w") as f:
                self.per_metrics.write_stats(f)


def dataio_prep(hparams):
    """Phoneme datasets with bos/eos variants + label encoder."""
    from speechbrain_tpu.dataio.dataio import read_audio
    from speechbrain_tpu.dataio.encoder import CTCTextEncoder

    label_encoder = CTCTextEncoder()
    datasets = {}
    for split in ["train", "valid", "test"]:
        ds = DynamicItemDataset.from_json(hparams[f"{split}_json"])
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")
        ds.add_dynamic_item(
            lambda p: p.split(), takes="phn", provides="phn_list"
        )

        def phn_pipeline(phn_list):
            tokens = label_encoder.encode_sequence(phn_list)
            return (
                np.asarray(tokens, np.int64),
                np.asarray([hparams["bos_index"]] + tokens, np.int64),
                np.asarray(tokens + [hparams["eos_index"]], np.int64),
            )

        ds.add_dynamic_item(
            phn_pipeline,
            takes="phn_list",
            provides=[
                "phn_encoded", "phn_encoded_bos", "phn_encoded_eos",
            ],
        )
        npz_path = os.path.join(
            hparams["teacher_posteriors_folder"],
            f"ensemble_{split}.npz",
        )
        teacher_store = np.load(npz_path)

        def teacher_pipeline(utt_id, store=teacher_store):
            return (
                store[f"{utt_id}__ctc"].astype(np.float32),
                store[f"{utt_id}__seq"].astype(np.float32),
            )

        ds.add_dynamic_item(
            teacher_pipeline,
            takes="id",
            provides=["teacher_ctc", "teacher_seq"],
        )
        ds.set_output_keys(
            ["id", "sig", "phn_encoded", "phn_encoded_bos",
             "phn_encoded_eos", "teacher_ctc", "teacher_seq"]
        )
        datasets[split] = ds
    label_encoder.load_or_create(
        path=hparams["save_folder"] + "/label_encoder.txt",
        from_didatasets=[datasets["train"]],
        output_key="phn_list",
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
    from timit_prepare import prepare_timit

    run_on_main(
        prepare_timit,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_json_train": hparams["train_json"],
            "save_json_valid": hparams["valid_json"],
            "save_json_test": hparams["test_json"],
            "phn_set": hparams.get("phn_set", 39),
        },
    )
    datasets, label_encoder = dataio_prep(hparams)
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
        min_key="PER",
    )
