#!/usr/bin/env python3
"""Direct SLU on Timers and Such (TPU-native).

    python train_with_wav2vec2.py hparams/train_with_wav2vec2.yaml --data_folder /data/timers-and-such

Mirrors the reference ``recipes/timers-and-such/direct/train_with_wav2vec2.py`` (native wav2vec stack):
CRDNN encoder + attentional GRU decoder emitting the serialized
command semantics as BPE tokens (synthetic + real train splits merged);
scored by exact-frame accuracy with greedy decoding on test-real.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.decoders.seq2seq import S2SRNNGreedySearcher
from speechbrain_tpu.nnet.losses import nll_loss


class SLU(sb.Brain):
    """Brain for direct speech-to-frame training."""

    def compute_forward(self, batch, stage):
        """Wav -> wav2vec2 -> attentional decoder logits."""
        latents = self.modules.extractor(batch["sig"])
        enc = self.modules.encoder(latents)["embeddings"]
        emb = self.modules.emb(batch["tokens_bos"])
        dec_out, _ = self.modules.dec(emb, enc, batch["sig_lens"])
        seq_logp = jax.nn.log_softmax(
            self.modules.seq_lin(dec_out), axis=-1
        )
        return seq_logp, enc

    def compute_objectives(self, predictions, batch, stage):
        """Frame-token NLL (+exact-match accuracy off-train)."""
        seq_logp, enc = predictions
        loss = nll_loss(
            seq_logp,
            batch["tokens_eos"],
            length=batch["tokens_eos_lens"] * batch["batch_mask"],
        )
        if stage != Stage.TRAIN and hasattr(self, "exact"):
            hyps, _ = self._searcher(enc, batch["sig_lens"])
            real = int(np.asarray(batch["batch_mask"]).sum())
            tgt = np.asarray(batch["tokens"])[:real].tolist()
            t_lens = np.asarray(batch["tokens_lens"])[:real]
            U = len(tgt[0]) if tgt else 0
            for hyp, t, l in zip(hyps[:real], tgt, t_lens):
                self.exact.append(
                    hyp == t[: int(round(float(l) * U))]
                )
        return loss

    def on_stage_start(self, stage, epoch=None):
        """Exact-match accumulator + greedy searcher off-train."""
        if stage != Stage.TRAIN:
            self.exact = []
            if not hasattr(self, "_searcher"):
                self._searcher = S2SRNNGreedySearcher(
                    embedding_fn=lambda t: self.modules.emb(t),
                    decoder_step_fn=lambda e, hs, c, es, el, ast: (
                        self.modules.dec(
                            e, hs, c, es, el, ast,
                            method="forward_step",
                        )
                    ),
                    linear_fn=lambda d: jax.nn.log_softmax(
                        self.modules.seq_lin(d[:, None])[:, 0], axis=-1
                    ),
                    dec_hidden_size=self.hparams.dec_neurons,
                    attn_init_fn=lambda es: self.modules.dec(
                        es, method="attn_init"
                    ),
                    rnn_init_fn=lambda n, dtype: jnp.zeros(
                        (1, n, self.hparams.dec_neurons), dtype
                    ),
                    bos_index=self.hparams.bos_index,
                    eos_index=self.hparams.eos_index,
                    min_decode_ratio=0.0,
                    max_decode_ratio=self.hparams.max_decode_ratio,
                )

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Log + checkpoint by exact-frame accuracy."""
        if stage == Stage.TRAIN:
            return
        acc = float(np.mean(self.exact)) if self.exact else 0.0
        if stage == Stage.VALID:
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": self.lr},
                train_stats={"loss": self.avg_train_loss},
                valid_stats={"loss": stage_loss, "acc": acc},
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"acc": acc}, max_keys=["acc"]
                )
        else:
            self.hparams.train_logger.log_stats(
                {"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats={"loss": stage_loss, "acc": acc},
            )


def dataio_prepare(hparams, tokenizer):
    """Datasets yielding (sig, frame tokens) pairs."""
    from speechbrain_tpu.dataio.dataio import read_audio

    datasets = {}
    for split, path in (
        ("train", hparams["train_json"]),
        ("valid", hparams["valid_json"]),
        ("test", hparams["test_json"]),
    ):
        ds = DynamicItemDataset.from_json(path)
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
        max_key="acc",
    )
