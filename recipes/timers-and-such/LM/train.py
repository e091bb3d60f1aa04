#!/usr/bin/env python3
"""RNN LM on Timers and Such transcripts (TPU-native).

    python train.py hparams/train.yaml --data_folder /data/timers-and-such

Mirrors the reference ``recipes/timers-and-such/LM/train.py``: an RNN
language model trained on the corpus transcripts with NLL/perplexity,
for fusion in the decoupled/multistage SLU recipes.
"""

import json
import sys

import jax
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import nll_loss


class LM(sb.Brain):
    """Brain for RNN LM training on transcripts."""

    def compute_forward(self, batch, stage):
        """BOS-prefixed tokens -> next-token log-probs."""
        logits = self.modules.model(batch["tokens_bos"])
        return jax.nn.log_softmax(logits, axis=-1)

    def compute_objectives(self, predictions, batch, stage):
        """NLL against EOS-suffixed targets."""
        return nll_loss(
            predictions,
            batch["tokens_eos"],
            length=batch["tokens_eos_lens"] * batch["batch_mask"],
        )

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Report loss + perplexity; checkpoint on valid."""
        ppl = float(np.exp(min(stage_loss, 20.0)))
        if stage == Stage.VALID:
            _, self.lr = self.hparams.lr_annealing(ppl)
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": self.lr},
                train_stats={"loss": self.avg_train_loss},
                valid_stats={"loss": stage_loss, "ppl": ppl},
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"ppl": ppl}, min_keys=["ppl"]
                )
        elif stage == Stage.TEST:
            self.hparams.train_logger.log_stats(
                {"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats={"loss": stage_loss, "ppl": ppl},
            )


def dataio_prepare(hparams, tokenizer):
    """Transcript token datasets from the TAS manifests."""
    datasets = {}
    for split, path in (
        ("train", hparams["train_json"]),
        ("valid", hparams["valid_json"]),
        ("test", hparams["test_json"]),
    ):
        ds = DynamicItemDataset.from_json(path)

        def text_pipeline(transcript):
            tokens = tokenizer.sp.encode_as_ids(transcript)
            return (
                np.asarray(
                    [hparams["bos_index"]] + tokens, np.int64
                ),
                np.asarray(
                    tokens + [hparams["eos_index"]], np.int64
                ),
            )

        ds.add_dynamic_item(
            text_pipeline, takes="transcript",
            provides=["tokens_bos", "tokens_eos"],
        )
        ds.set_output_keys(["id", "tokens_bos", "tokens_eos"])
        datasets[split] = ds
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
    sys.path.insert(0, __file__.rsplit("/LM", 1)[0])
    from prepare import prepare_TAS

    run_on_main(
        prepare_TAS,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
            "train_splits": hparams["train_splits"],
        },
    )
    from speechbrain_tpu.tokenizers.SentencePiece import SentencePiece

    tokenizer = SentencePiece(
        model_dir=hparams["save_folder"],
        vocab_size=hparams["vocab_size"],
        annotation_train=hparams["train_json"],
        annotation_read="transcript",
        model_type=hparams["token_type"],
        annotation_format="json",
    )
    datasets = dataio_prepare(hparams, tokenizer)
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
        min_key="ppl",
    )
