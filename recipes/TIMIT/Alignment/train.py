#!/usr/bin/env python3
"""HMM-DNN alignment training on TIMIT (TPU-native).

    python train.py hparams/train.yaml --data_folder /data/TIMIT

Mirrors the reference ``recipes/TIMIT/Alignment/train.py``: an acoustic
model over Fbank frames is trained with the HMM *forward* loss (or
Viterbi NLL / CTC, selected by ``init_training_type``) through the
native ``HMMAligner`` (``alignment/aligner.py``); Viterbi alignments
are stored every batch and alignment accuracy is scored against the
ground-truth phone end frames from the .PHN files.
"""

import sys

import jax
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import ctc_loss, nll_loss
from speechbrain_tpu.utils.metric_stats import MetricStats


class AlignBrain(sb.Brain):
    """Brain for HMM-DNN alignment training."""

    def compute_forward(self, batch, stage):
        """Wav -> Fbank -> RNN -> per-frame state log-probs."""
        feats = self.hparams.compute_features(batch["sig"])
        feats, self._new_extra = self.hparams.normalize(
            feats, batch["sig_lens"],
            state=self._bound_extra["norm"],
            epoch=self.hparams.epoch_counter.current,
            training=stage == Stage.TRAIN,
        )
        self._new_extra = {"norm": self._new_extra}
        out, _ = self.modules.model(feats)
        out = self.modules.output(out)
        out = out - out.mean(axis=1, keepdims=True)
        return jax.nn.log_softmax(out, axis=-1)

    def init_extra_state(self, batch):
        """Fresh normalization stats."""
        from speechbrain_tpu.processing.features import GlobalNormState

        return {"norm": GlobalNormState.init(self.hparams.n_mels)}

    def compute_objectives(self, predictions, batch, stage):
        """Forward/Viterbi/CTC alignment loss + boundary accuracy."""
        pout = predictions
        mask = batch["batch_mask"]
        lens = batch["sig_lens"] * mask
        phns = batch["phn_encoded"]
        phn_lens = batch["phn_encoded_lens"]
        ids = [
            f"{self._batch_tag}_{i}" for i in range(pout.shape[0])
        ]
        aligner = self.hparams.aligner
        if aligner.states_per_phoneme == 1:
            phns_exp, phn_lens_exp = phns, phn_lens
        else:
            phns_exp = aligner.expand_phns_by_states_per_phoneme(
                phns, phn_lens
            )
            U, Ue = phns.shape[1], phns_exp.shape[1]
            phn_lens_exp = (
                phn_lens * U * aligner.states_per_phoneme / Ue
            )
        if self.training_type == "forward":
            scores = aligner(pout, lens, phns_exp, phn_lens_exp, "forward")
            loss = -scores.mean()
        elif self.training_type == "ctc":
            loss = ctc_loss(
                pout, phns, lens, phn_lens * mask,
                blank_index=self.hparams.blank_index,
            )
        elif self.training_type == "viterbi":
            # Traceable Viterbi targets from the current model — runs
            # inside the jitted step (the reference's stored-alignment
            # dict is host-side; refreshing every batch is equivalent
            # once past flat-start).
            prev = jax.lax.stop_gradient(
                aligner.viterbi_targets(
                    pout, lens, phns_exp, phn_lens_exp
                )
            )
            loss = nll_loss(pout, prev, length=lens)
        else:
            raise ValueError(self.training_type)
        if stage != Stage.TRAIN and hasattr(self, "acc"):
            # Host-side Viterbi backtrace (eager eval path only).
            _, alignments = aligner(
                pout, lens, phns_exp, phn_lens_exp, "viterbi"
            )
            aligner.store_alignments(ids, alignments)
            real = int(np.asarray(mask).sum())
            ends_pad = np.asarray(batch["phn_ends_arr"])[:real]
            ends_lens = np.asarray(batch["phn_ends_arr_lens"])[:real]
            E = ends_pad.shape[1] if ends_pad.size else 0
            ends = [
                e[: int(round(float(l) * E))].tolist()
                for e, l in zip(ends_pad, ends_lens)
            ]
            phns_np = np.asarray(phns)[:real].tolist()
            p_lens = np.asarray(phn_lens)[:real]
            U = len(phns_np[0]) if phns_np else 0
            phns_orig = [
                p[: int(round(float(l) * U))]
                for p, l in zip(phns_np, p_lens)
            ]
            self.acc.append(
                aligner.calc_accuracy(
                    alignments[:real], ends, phns_orig
                )
            )
        return loss

    def on_stage_start(self, stage, epoch=None):
        """Select training type; accuracy accumulator off-train."""
        self._batch_tag = f"{stage}"
        self.training_type = self.hparams.init_training_type
        if (
            hasattr(self.hparams, "switch_training_epoch")
            and self.hparams.epoch_counter.current
            >= self.hparams.switch_training_epoch
        ):
            self.training_type = self.hparams.switch_training_type
        if stage != Stage.TRAIN:
            self.acc = []

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Log + checkpoint by alignment accuracy."""
        if stage == Stage.TRAIN:
            return
        acc = float(np.mean(self.acc)) if self.acc else 0.0
        if stage == Stage.VALID:
            _, self.lr = self.hparams.lr_annealing(1.0 - acc)
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": self.lr},
                train_stats={"loss": self.avg_train_loss},
                valid_stats={"loss": stage_loss, "accuracy": acc},
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"accuracy": acc}, max_keys=["accuracy"]
                )
        else:
            self.hparams.train_logger.log_stats(
                {"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats={"loss": stage_loss, "accuracy": acc},
            )


def dataio_prep(hparams):
    """Phoneme datasets with ground-truth end frames."""
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
        ds.add_dynamic_item(
            lambda pl: np.asarray(
                label_encoder.encode_sequence(pl), np.int64
            ),
            takes="phn_list",
            provides="phn_encoded",
        )
        ds.add_dynamic_item(
            lambda e: np.asarray(
                [int(x) for x in e.split()], np.int64
            ),
            takes="phn_ends",
            provides="phn_ends_arr",
        )
        ds.set_output_keys(
            ["id", "sig", "phn_encoded", "phn_ends_arr"]
        )
        datasets[split] = ds
    label_encoder.load_or_create(
        path=hparams["save_folder"] + "/label_encoder.txt",
        from_didatasets=[datasets["train"]],
        output_key="phn_list",
        sequence_input=True,
        special_labels={"blank_label": "<blank>"},
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
    sys.path.insert(0, __file__.rsplit("/Alignment", 1)[0])
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
    brain = AlignBrain(
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
        max_key="accuracy",
    )
