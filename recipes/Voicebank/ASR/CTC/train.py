#!/usr/bin/env python3
"""VoiceBank char CTC ASR (TPU-native).

    python train.py hparams/train.yaml --data_folder /data/VoiceBank

Mirrors the reference ``recipes/Voicebank/ASR/CTC/train.py`` (CRDNN +
char CTC on the clean VoiceBank speech; also usable on enhanced output
for enhancement-ASR evaluation, cf. MTL/ASR_enhance).
"""

import sys

import jax
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.dataio.encoder import CTCTextEncoder
from speechbrain_tpu.decoders.ctc import ctc_greedy_decode
from speechbrain_tpu.nnet.losses import ctc_loss
from speechbrain_tpu.utils.metric_stats import ErrorRateStats


class ASRBrain(sb.Brain):
    """Brain for char-CTC training on clean speech."""

    def compute_forward(self, batch, stage):
        """Wav -> Fbank -> CRDNN -> CTC log-probs."""
        feats = self.hparams.compute_features(batch["clean_sig"])
        feats, self._new_extra = self.hparams.normalize(
            feats, batch["clean_sig_lens"],
            state=self._bound_extra["norm"],
            epoch=self.hparams.epoch_counter.current,
            training=stage == Stage.TRAIN,
        )
        self._new_extra = {"norm": self._new_extra}
        out = self.modules.model(
            feats, lengths=batch["clean_sig_lens"]
        )
        logits = self.modules.output_lin(out)
        return jax.nn.log_softmax(logits, axis=-1)

    def init_extra_state(self, batch):
        """Fresh normalization stats."""
        from speechbrain_tpu.processing.features import GlobalNormState

        return {"norm": GlobalNormState.init(self.hparams.n_mels)}

    def compute_objectives(self, predictions, batch, stage):
        """CTC loss; CER/WER via greedy decode off-train."""
        mask = batch["batch_mask"]
        loss = ctc_loss(
            predictions,
            batch["tokens"],
            batch["clean_sig_lens"] * mask,
            batch["tokens_lens"] * mask,
            blank_index=self.hparams.blank_index,
        )
        if stage != Stage.TRAIN and hasattr(self, "cer_metric"):
            real = int(np.asarray(mask).sum())
            hyps = ctc_greedy_decode(
                predictions, batch["clean_sig_lens"],
                blank_id=self.hparams.blank_index,
            )[:real]
            targets = np.asarray(batch["tokens"])[:real].tolist()
            t_lens = np.asarray(batch["tokens_lens"])[:real]
            U = len(targets[0]) if targets else 0
            targets = [
                t[: int(round(l * U))] for t, l in zip(targets, t_lens)
            ]
            ids = [str(i) for i in range(real)]
            self.cer_metric.append(
                ids, hyps, targets,
                ind2lab=self.label_encoder.decode_ndim,
            )
            self.wer_metric.append(
                ids,
                [
                    "".join(self.label_encoder.decode_ndim(h)).split()
                    for h in hyps
                ],
                [
                    "".join(self.label_encoder.decode_ndim(t)).split()
                    for t in targets
                ],
            )
        return loss

    def on_stage_start(self, stage, epoch=None):
        """CER/WER metrics off-train."""
        if stage != Stage.TRAIN:
            self.cer_metric = ErrorRateStats()
            self.wer_metric = ErrorRateStats()

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


def dataio_prep(hparams):
    """Char-level datasets over the clean waveforms."""
    from speechbrain_tpu.dataio.dataio import read_audio

    label_encoder = CTCTextEncoder()
    datasets = {}
    for split in ("train", "valid", "test"):
        ds = DynamicItemDataset.from_json(hparams[f"{split}_json"])
        ds.add_dynamic_item(
            read_audio, takes="clean_wav", provides="clean_sig"
        )
        ds.add_dynamic_item(
            lambda w: list(w), takes="words", provides="char_list"
        )

        def tokens_pipeline(char_list):
            return np.asarray(
                label_encoder.encode_sequence(char_list), np.int64
            )

        ds.add_dynamic_item(
            tokens_pipeline, takes="char_list", provides="tokens"
        )
        ds.set_output_keys(["id", "clean_sig", "tokens"])
        datasets[split] = ds
    label_encoder.load_or_create(
        path=hparams["save_folder"] + "/label_encoder.txt",
        from_didatasets=[datasets[s] for s in ("train", "valid", "test")],
        output_key="char_list",
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
    sys.path.insert(0, __file__.rsplit("/ASR/", 1)[0])
    from voicebank_prepare import prepare_voicebank

    run_on_main(
        prepare_voicebank,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
        },
    )
    datasets, label_encoder = dataio_prep(hparams)
    brain = ASRBrain(
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
        min_key="WER",
    )
