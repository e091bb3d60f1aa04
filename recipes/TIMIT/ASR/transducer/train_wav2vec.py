#!/usr/bin/env python3
"""TIMIT wav2vec2 transducer phoneme recognition (Pallas RNN-T loss).

    python train_wav2vec.py hparams/train_wav2vec.yaml --data_folder /data/TIMIT

Mirrors the reference ``recipes/TIMIT/ASR/transducer/train_wav2vec.py`` (native wav2vec stack) (CRDNN
encoder + GRU prediction network + additive joint, transducer loss,
greedy-decode PER).  The lattice loss runs on the Pallas TPU kernel
(``ops/pallas/transducer.py``).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.decoders.transducer import TransducerBeamSearcher
from speechbrain_tpu.nnet.losses import transducer_loss
from speechbrain_tpu.utils.metric_stats import ErrorRateStats


class Transducer(sb.Brain):
    """Brain for transducer phoneme training."""

    def compute_forward(self, batch, stage):
        """Wav -> wav2vec2 -> joint lattice logits (B, T, U+1, V)."""
        latents = self.modules.extractor(batch["sig"])
        enc = self.modules.encoder(latents)["embeddings"]
        enc = self.modules.enc_lin(enc)
        emb = self.modules.emb(batch["phn_encoded_blank"])
        pred, _ = self.modules.dec(emb)
        pred = self.modules.dec_lin(pred)
        joint = jnp.tanh(enc[:, :, None, :] + pred[:, None, :, :])
        return self.modules.out_lin(joint).astype(jnp.float32), enc

    def compute_objectives(self, predictions, batch, stage):
        """Transducer loss; greedy-decode PER off-train."""
        logits, enc = predictions
        mask = batch["batch_mask"]
        loss = transducer_loss(
            logits,
            batch["phn_encoded"],
            batch["sig_lens"] * mask,
            batch["phn_encoded_lens"] * mask,
            blank_index=self.hparams.blank_index,
            use_pallas=self.hparams.use_pallas,
        )
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

    def _make_searcher(self, beam_size):
        """Transducer searcher over the bound prediction/joint nets."""

        def pred_step(tokens, state, n):
            # State is kept BATCH-LEADING ((B, L, H)) because the
            # greedy scan and beam permutation index state leaves by
            # their leading axis; the GRU's hx is (L, B, H).
            if tokens is None:
                # reference semantics: the initial PN input is the
                # BLANK token's embedding (decoders/transducer.py
                # input_PN = blank), which also keeps the lazily
                # initialized GRU input width = embedding_dim
                blank_tok = jnp.full(
                    (n, 1), self.hparams.blank_index, jnp.int32
                )
                emb = self.modules.emb(blank_tok)
                out, hx = self.modules.dec(emb)
            else:
                emb = self.modules.emb(tokens[:, None])
                out, hx = self.modules.dec(
                    emb, hx=jnp.swapaxes(state, 0, 1)
                )
            return (
                self.modules.dec_lin(out[:, 0]),
                jnp.swapaxes(hx, 0, 1),
            )

        def joint(enc, pred):
            return self.modules.out_lin(jnp.tanh(enc + pred))

        return TransducerBeamSearcher(
            decode_fn=pred_step,
            joint_fn=joint,
            blank_id=self.hparams.blank_index,
            beam_size=beam_size,
            state_beam=self.hparams.state_beam,
            expand_beam=self.hparams.expand_beam,
        )

    def on_stage_start(self, stage, epoch=None):
        """Build the stage searcher; PER metric off-train."""
        if stage != Stage.TRAIN:
            self.per_metrics = ErrorRateStats()
            beam = (
                self.hparams.valid_beam_size
                if stage == Stage.VALID
                else self.hparams.test_beam_size
            )
            self._searcher = self._make_searcher(beam)

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
    """Phoneme datasets (+blank-prefixed) + label encoder."""
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
                np.asarray(
                    [hparams["blank_index"]] + tokens, np.int64
                ),
            )

        ds.add_dynamic_item(
            phn_pipeline,
            takes="phn_list",
            provides=["phn_encoded", "phn_encoded_blank"],
        )
        ds.set_output_keys(
            ["id", "sig", "phn_encoded", "phn_encoded_blank"]
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
    brain = Transducer(
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
