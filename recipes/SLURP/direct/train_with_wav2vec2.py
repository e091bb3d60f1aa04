#!/usr/bin/env python3
"""Direct SLU (speech -> semantics) on SLURP (TPU-native).

    python train_with_wav2vec2.py hparams/train_with_wav2vec2.yaml --data_folder /data/SLURP

Mirrors the reference ``recipes/SLURP/direct/train_with_wav2vec2.py`` (native wav2vec stack): CRDNN encoder
over Fbank features, attentional GRU decoder emitting the serialized
semantics dict as BPE tokens, NLL objective.
"""

import sys

import jax
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import nll_loss


class SLU(sb.Brain):
    """Brain for direct speech-to-semantics training."""

    def compute_forward(self, batch, stage):
        """Wav -> wav2vec2 -> attentional decoder logits."""
        latents = self.modules.extractor(batch["sig"])
        enc = self.modules.encoder(latents)["embeddings"]
        emb = self.modules.emb(batch["tokens_bos"])
        dec_out, _ = self.modules.dec(emb, enc, batch["sig_lens"])
        return jax.nn.log_softmax(
            self.modules.seq_lin(dec_out), axis=-1
        )

    def compute_objectives(self, predictions, batch, stage):
        """Semantics-token NLL."""
        return nll_loss(
            predictions,
            batch["tokens_eos"],
            length=batch["tokens_eos_lens"] * batch["batch_mask"],
        )

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Log + checkpoint on valid; report test loss."""
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
            self.hparams.train_logger.log_stats(
                {"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats={"loss": stage_loss},
            )


def dataio_prepare(hparams, tokenizer):
    """Datasets yielding (sig, semantics token) pairs."""
    from speechbrain_tpu.dataio.dataio import read_audio

    datasets = {}
    for split in ("train", "valid", "test"):
        ds = DynamicItemDataset.from_json(hparams[f"{split}_json"])
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")

        def text_pipeline(semantics):
            tokens = tokenizer.sp.encode_as_ids(semantics)
            return (
                np.asarray(tokens, np.int64),
                np.asarray([hparams["bos_index"]] + tokens, np.int64),
                np.asarray(tokens + [hparams["eos_index"]], np.int64),
            )

        ds.add_dynamic_item(
            text_pipeline,
            takes="semantics",
            provides=["tokens", "tokens_bos", "tokens_eos"],
        )
        ds.set_output_keys(
            ["id", "sig", "tokens", "tokens_bos", "tokens_eos"]
        )
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
    sys.path.insert(0, __file__.rsplit("/direct", 1)[0])
    from prepare import prepare_SLURP

    run_on_main(
        prepare_SLURP,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
        },
    )
    from speechbrain_tpu.tokenizers.SentencePiece import SentencePiece

    tokenizer = SentencePiece(
        model_dir=hparams["save_folder"],
        vocab_size=hparams["vocab_size"],
        annotation_train=hparams["train_json"],
        annotation_read="semantics",
        model_type=hparams["token_type"],
        annotation_format="json",
    )
    datasets = dataio_prepare(hparams, tokenizer)
    brain = SLU(
        modules=hparams["modules"],
        opt_class=lambda lr: hparams["opt_class"](learning_rate=lr),
        hparams=hparams,
        run_opts=run_opts,
        checkpointer=Checkpointer(hparams["save_folder"]),
    )
    brain.tokenizer = tokenizer
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
