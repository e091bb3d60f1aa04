#!/usr/bin/env python3
"""Train a phoneme-sequence LM for G2P beam-search fusion (TPU-native).

    python train_lm.py hparams/hparams_lm_rnn.yaml \
        --data_folder /data/LibriSpeech

Mirrors the reference ``recipes/LibriSpeech/G2P/train_lm.py``: an
RNN or Transformer LM over the phoneme side of the lexicon manifests
(built by ``lexicon_prepare.py``), used as shallow fusion for the G2P
seq2seq decoders.
"""

import sys

import jax
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.dataio.encoder import TextEncoder
from speechbrain_tpu.nnet.losses import nll_loss


class LM(sb.Brain):
    """Brain for phoneme-LM training."""

    def compute_forward(self, batch, stage):
        """BOS tokens -> next-token logits."""
        logits = self.modules.model(batch["phn_bos"])
        return jax.nn.log_softmax(logits, axis=-1)

    def compute_objectives(self, predictions, batch, stage):
        """NLL against EOS-shifted targets."""
        return nll_loss(
            predictions,
            batch["phn_eos"],
            length=batch["phn_eos_lens"] * batch["batch_mask"],
        )

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Log + checkpoint on valid."""
        if stage == Stage.VALID:
            _, self.lr = self.hparams.lr_annealing(stage_loss)
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
            self.hparams.train_logger.log_stats(
                {"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats={"loss": stage_loss},
            )


def dataio_prepare(hparams):
    """Phoneme-token datasets + encoder."""
    encoder = TextEncoder()
    datasets = {}
    for split, path in (
        ("train", hparams["train_data"]),
        ("valid", hparams["valid_data"]),
        ("test", hparams["test_data"]),
    ):
        ds = DynamicItemDataset.from_json(path)
        ds.add_dynamic_item(
            lambda p: p.split(), takes="phn", provides="phn_list"
        )

        def tokens_pipeline(phn_list):
            tokens = encoder.encode_sequence(phn_list)
            return (
                np.asarray([hparams["bos_index"]] + tokens, np.int64),
                np.asarray(tokens + [hparams["eos_index"]], np.int64),
            )

        ds.add_dynamic_item(
            tokens_pipeline,
            takes="phn_list",
            provides=["phn_bos", "phn_eos"],
        )
        ds.set_output_keys(["id", "phn_bos", "phn_eos"])
        datasets[split] = ds
    encoder.load_or_create(
        path=hparams["save_folder"] + "/phoneme_encoder.txt",
        from_didatasets=[datasets["train"]],
        output_key="phn_list",
        sequence_input=True,
        special_labels={
            "bos_label": "<bos>",
            "eos_label": "<eos>",
            "unk_label": "<unk>",
        },
    )
    return datasets


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
    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from lexicon_prepare import prepare_lexicon

    run_on_main(
        prepare_lexicon,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
            "seed": hparams["seed"],
        },
    )
    datasets = dataio_prepare(hparams)
    brain = LM(
        modules=hparams["modules"],
        opt_class=lambda lr: hparams["opt_class"](learning_rate=lr),
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=Checkpointer(hparams["save_folder"]),
    )
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
        min_key="loss",
    )
