#!/usr/bin/env python3
"""Grapheme-to-phoneme conversion on the LibriSpeech lexicon (TPU-native).

    python train.py hparams/hparams_g2p_rnn.yaml --data_folder /data/lexicon_dir

Mirrors the reference ``recipes/LibriSpeech/G2P/train.py``: an
attentional seq2seq (or transformer, see the yaml) maps character
sequences to phoneme sequences, trained with NLL and scored with PER
(phoneme error rate) using greedy decoding.
"""

import sys

import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.dataio.encoder import TextEncoder
from speechbrain_tpu.nnet.losses import nll_loss
from speechbrain_tpu.utils.metric_stats import ErrorRateStats


class G2PBrain(sb.Brain):
    """Brain for grapheme-to-phoneme training."""

    def compute_forward(self, batch, stage):
        """Chars -> encoder -> attentional decoder -> phoneme log-probs."""
        out = self.modules.model(
            batch["grapheme_encoded"],
            batch["grapheme_encoded_lens"],
            batch["phn_encoded_bos"],
        )
        if isinstance(out, tuple):  # AttentionSeq2Seq returns (out, attn)
            out = out[0]
        return out

    def compute_objectives(self, predictions, batch, stage):
        """NLL on EOS-suffixed phonemes; PER via argmax off-train."""
        mask = batch["batch_mask"]
        loss = nll_loss(
            predictions,
            batch["phn_encoded_eos"],
            length=batch["phn_encoded_eos_lens"] * mask,
        )
        if stage != Stage.TRAIN and hasattr(self, "per_metrics"):
            real = int(np.asarray(mask).sum())
            hyp_ids = np.asarray(predictions).argmax(-1)[:real]
            hyps = []
            for row in hyp_ids:
                seq = []
                eos = self.phoneme_encoder.get_eos_index()
                for tok in row:
                    if tok == eos:
                        break
                    seq.append(int(tok))
                hyps.append(seq)
            tgt = np.asarray(batch["phn_encoded"])[:real].tolist()
            t_lens = np.asarray(batch["phn_encoded_lens"])[:real]
            U = len(tgt[0]) if tgt else 0
            targets = [
                t[: int(round(float(l) * U))]
                for t, l in zip(tgt, t_lens)
            ]
            self.per_metrics.append(
                [str(i) for i in range(real)],
                hyps,
                targets,
                ind2lab=self.phoneme_encoder.decode_ndim,
            )
        return loss

    def on_stage_start(self, stage, epoch=None):
        """PER metric off-train."""
        if stage != Stage.TRAIN:
            self.per_metrics = ErrorRateStats()

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
            with open(self.hparams.wer_file, "w") as f:
                self.per_metrics.write_stats(f)


def dataio_prep(hparams):
    """Grapheme/phoneme datasets + encoders."""
    grapheme_encoder = TextEncoder()
    phoneme_encoder = TextEncoder()
    datasets = {}
    for split, path in (
        ("train", hparams["train_data"]),
        ("valid", hparams["valid_data"]),
        ("test", hparams["test_data"]),
    ):
        ds = DynamicItemDataset.from_json(path)

        def grapheme_pipeline(char):
            return np.asarray(
                grapheme_encoder.encode_sequence(char.split()), np.int64
            )

        def phoneme_pipeline(phn):
            ids = phoneme_encoder.encode_sequence(phn.split())
            bos = phoneme_encoder.get_bos_index()
            eos = phoneme_encoder.get_eos_index()
            return (
                np.asarray(ids, np.int64),
                np.asarray([bos] + ids, np.int64),
                np.asarray(ids + [eos], np.int64),
            )

        ds.add_dynamic_item(
            grapheme_pipeline, takes="char", provides="grapheme_encoded"
        )
        ds.add_dynamic_item(
            phoneme_pipeline,
            takes="phn",
            provides=[
                "phn_encoded", "phn_encoded_bos", "phn_encoded_eos",
            ],
        )
        ds.set_output_keys(
            [
                "id", "grapheme_encoded",
                "phn_encoded", "phn_encoded_bos", "phn_encoded_eos",
            ]
        )
        datasets[split] = ds
    grapheme_encoder.load_or_create(
        path=hparams["save_folder"] + "/grapheme_encoder.txt",
        from_didatasets=[datasets[s] for s in ("train", "valid", "test")],
        output_key="char",
        sequence_input=True,
        special_labels={
            "bos_label": "<bos>", "eos_label": "<eos>",
            "unk_label": "<unk>",
        },
    )
    phoneme_encoder.load_or_create(
        path=hparams["save_folder"] + "/phoneme_encoder.txt",
        from_didatasets=[datasets[s] for s in ("train", "valid", "test")],
        output_key="phn",
        sequence_input=True,
        special_labels={
            "bos_label": "<bos>", "eos_label": "<eos>",
            "unk_label": "<unk>",
        },
    )
    return datasets, grapheme_encoder, phoneme_encoder


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
    sys.path.insert(0, __file__.rsplit("/train.py", 1)[0])
    from lexicon_prepare import prepare_lexicon

    run_on_main(
        prepare_lexicon,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
            "seed": hparams["seed"],
        },
    )
    datasets, grapheme_encoder, phoneme_encoder = dataio_prep(hparams)
    brain = G2PBrain(
        modules=hparams["modules"],
        opt_class=lambda lr: hparams["opt_class"](learning_rate=lr),
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=Checkpointer(hparams["save_folder"]),
    )
    brain.phoneme_encoder = phoneme_encoder
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
