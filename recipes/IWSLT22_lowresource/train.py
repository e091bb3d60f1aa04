#!/usr/bin/env python3
"""Low-resource speech translation (Tamasheq -> French, TPU-native).

    python train.py hparams/train_w2v2_st.yaml --data_folder /data/iwslt22_tamasheq

Mirrors the reference ``recipes/IWSLT22_lowresource/train.py``: a
wav2vec 2.0 encoder (native stack — initialize from a
self-supervised-learning checkpoint for the reference's fine-tuning
behavior; the HF Tamasheq model is out of scope for a torch-free
build) feeds a linear projection and a transformer decoder trained
decoder-only with NLL on French BPE tokens; BLEU reported off-train.
"""

import sys

import jax
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import nll_loss
from speechbrain_tpu.utils.bleu import BLEUStats


class ST(sb.Brain):
    """Brain for decoder-only speech translation."""

    def compute_forward(self, batch, stage):
        """Wav -> wav2vec -> linear -> translation decoder."""
        latents = self.modules.extractor(batch["sig"])
        feats = self.modules.encoder(latents)["embeddings"]
        src = self.modules.enc(feats)
        dec_out = self.modules.Transformer(
            src,
            batch["tokens_bos"],
            pad_idx=self.hparams.pad_index,
            method="forward_mt_decoder_only",
        )
        return jax.nn.log_softmax(
            self.modules.seq_lin(dec_out), axis=-1
        )

    def compute_objectives(self, predictions, batch, stage):
        """Translation NLL (+BLEU off-train)."""
        mask = batch["batch_mask"]
        loss = nll_loss(
            predictions,
            batch["tokens_eos"],
            length=batch["tokens_eos_lens"] * mask,
            label_smoothing=self.hparams.label_smoothing,
        )
        if stage != Stage.TRAIN and hasattr(self, "bleu_metric"):
            real = int(np.asarray(mask).sum())
            hyp_ids = np.asarray(predictions).argmax(-1)[:real]
            hyps = [
                " ".join(
                    self.tokenizer([h.tolist()], task="decode_from_list")[0]
                )
                for h in hyp_ids
            ]
            refs = [
                " ".join(words)
                for words in self.tokenizer(
                    np.asarray(batch["tokens"])[:real].tolist(),
                    np.asarray(batch["tokens_lens"])[:real],
                    task="decode",
                )
            ]
            self.bleu_metric.append(
                [str(i) for i in range(real)], hyps, [refs]
            )
        return loss

    def on_fit_batch_end(self, batch, outputs, loss, should_step):
        """Noam lr per optimizer step."""
        if should_step:
            _, self.lr = self.hparams.noam_annealing()

    def on_stage_start(self, stage, epoch=None):
        """BLEU metric off-train."""
        if stage != Stage.TRAIN:
            self.bleu_metric = BLEUStats(lang=self.hparams.lang)

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Log + checkpoint by BLEU."""
        if stage == Stage.TRAIN:
            return
        bleu = self.bleu_metric.summarize("BLEU")
        stats = {"loss": stage_loss, "BLEU": bleu}
        if stage == Stage.VALID:
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": getattr(self, "lr", 0.0)},
                train_stats={"loss": self.avg_train_loss},
                valid_stats=stats,
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"BLEU": bleu}, max_keys=["BLEU"]
                )
        else:
            self.hparams.train_logger.log_stats(
                {"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats=stats,
            )


def dataio_prepare(hparams, tokenizer):
    """Datasets yielding (sig, French token) pairs."""
    from speechbrain_tpu.dataio.dataio import read_audio

    datasets = {}
    for split, path in (
        ("train", hparams["train_json"]),
        ("valid", hparams["valid_json"]),
        ("test", hparams["test_json"]),
    ):
        ds = DynamicItemDataset.from_json(path)
        ds.add_dynamic_item(read_audio, takes="wav", provides="sig")

        def text_pipeline(trans):
            tokens = tokenizer.sp.encode_as_ids(trans)
            return (
                np.asarray(tokens, np.int64),
                np.asarray([hparams["bos_index"]] + tokens, np.int64),
                np.asarray(tokens + [hparams["eos_index"]], np.int64),
            )

        ds.add_dynamic_item(
            text_pipeline,
            takes="trans",
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
    sys.path.insert(0, __file__.rsplit("/train.py", 1)[0])
    from prepare_iwslt22 import data_proc

    run_on_main(
        data_proc,
        kwargs={
            "dataset_folder": hparams["data_folder"],
            "output_folder": hparams["save_folder"],
        },
    )
    from speechbrain_tpu.tokenizers.SentencePiece import SentencePiece

    tokenizer = SentencePiece(
        model_dir=hparams["save_folder"],
        vocab_size=hparams["vocab_size"],
        annotation_train=hparams["train_json"],
        annotation_read="trans",
        model_type=hparams["token_type"],
        annotation_format="json",
        character_coverage=1.0,
    )
    datasets = dataio_prepare(hparams, tokenizer)
    brain = ST(
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
        max_key="BLEU",
    )
