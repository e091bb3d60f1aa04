#!/usr/bin/env python3
"""Multi-task enhancement + ASR on VoiceBank (TPU-native).

    python train.py hparams/enhance_mimic.yaml --data_folder /data/VoiceBank

Mirrors the reference ``recipes/Voicebank/MTL/ASR_enhance/train.py``:
one joint objective combines
- an enhancement loss (masked-spectrum MSE vs the clean features),
- a *mimic* loss (perceptual: the ASR encoder's embedding of the
  enhanced features must match its embedding of the clean features),
- hard ASR losses (CTC + seq2seq NLL over characters).
All terms are weighted in the yaml; any weight can be zeroed to
reproduce the reference's staged configs (enhance_mimic, pretrain_asr,
robust_asr).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.dataio.encoder import CTCTextEncoder
from speechbrain_tpu.nnet.losses import ctc_loss, mse_loss, nll_loss
from speechbrain_tpu.processing.features import spectral_magnitude
from speechbrain_tpu.utils.metric_stats import ErrorRateStats


class MTLBrain(sb.Brain):
    """Brain for joint enhancement + mimic + ASR training."""

    def compute_feats(self, wavs):
        """log1p compressed magnitude spectra."""
        feats = self.hparams.compute_STFT(wavs)
        feats = spectral_magnitude(feats, power=0.5)
        return jnp.log1p(feats)

    def compute_forward(self, batch, stage):
        """Noisy wav -> enhanced spec -> ASR encoder/decoder outputs."""
        noisy_feats = self.compute_feats(batch["noisy_sig"])
        clean_feats = self.compute_feats(batch["clean_sig"])
        mask = self.modules.enhance_model(
            noisy_feats, lengths=batch["noisy_sig_lens"]
        )
        enhanced = mask * noisy_feats
        # Perceptual (mimic) embeddings from the shared ASR encoder.
        enh_embed = self.modules.src_embedding(
            enhanced, lengths=batch["noisy_sig_lens"]
        )
        clean_embed = self.modules.src_embedding(
            clean_feats, lengths=batch["noisy_sig_lens"]
        )
        emb = self.modules.tgt_embedding(batch["tokens_bos"])
        dec_out, _ = self.modules.recognizer(
            emb, enh_embed, batch["noisy_sig_lens"]
        )
        seq_logp = jax.nn.log_softmax(
            self.modules.seq_output(dec_out), axis=-1
        )
        ctc_logp = jax.nn.log_softmax(
            self.modules.ctc_output(enh_embed), axis=-1
        )
        return {
            "enhanced": enhanced,
            "clean_feats": clean_feats,
            "enh_embed": enh_embed,
            "clean_embed": clean_embed,
            "seq_logp": seq_logp,
            "ctc_logp": ctc_logp,
        }

    def compute_objectives(self, predictions, batch, stage):
        """Weighted enhance + mimic + CTC + seq losses; WER off-train."""
        p = predictions
        bmask = batch["batch_mask"]
        lens = batch["noisy_sig_lens"] * bmask
        loss = 0.0
        if self.hparams.enhance_weight > 0:
            loss += self.hparams.enhance_weight * mse_loss(
                p["enhanced"], p["clean_feats"], lens
            )
        if self.hparams.mimic_weight > 0:
            loss += self.hparams.mimic_weight * mse_loss(
                p["enh_embed"],
                jax.lax.stop_gradient(p["clean_embed"]),
                lens,
            )
        if self.hparams.ctc_weight > 0:
            loss += self.hparams.ctc_weight * ctc_loss(
                p["ctc_logp"],
                batch["tokens"],
                lens,
                batch["tokens_lens"] * bmask,
                blank_index=self.hparams.blank_index,
            )
        if self.hparams.seq_weight > 0:
            loss += self.hparams.seq_weight * nll_loss(
                p["seq_logp"],
                batch["tokens_eos"],
                length=batch["tokens_eos_lens"] * bmask,
            )
        if stage != Stage.TRAIN and hasattr(self, "cer_metric"):
            from speechbrain_tpu.decoders.ctc import ctc_greedy_decode

            real = int(np.asarray(bmask).sum())
            hyps = ctc_greedy_decode(
                p["ctc_logp"], batch["noisy_sig_lens"],
                blank_id=self.hparams.blank_index,
            )[:real]
            targets = np.asarray(batch["tokens"])[:real].tolist()
            t_lens = np.asarray(batch["tokens_lens"])[:real]
            U = len(targets[0]) if targets else 0
            targets = [
                t[: int(round(l * U))] for t, l in zip(targets, t_lens)
            ]
            self.cer_metric.append(
                [str(i) for i in range(real)],
                hyps,
                targets,
                ind2lab=self.label_encoder.decode_ndim,
            )
        return loss

    def on_stage_start(self, stage, epoch=None):
        """CER metric off-train."""
        if stage != Stage.TRAIN:
            self.cer_metric = ErrorRateStats()

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Anneal lr on valid CER, log, checkpoint."""
        if stage == Stage.TRAIN:
            return
        cer = self.cer_metric.summarize("error_rate")
        stats = {"loss": stage_loss, "CER": cer}
        if stage == Stage.VALID:
            _, self.lr = self.hparams.lr_annealing(cer)
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": self.lr},
                train_stats={"loss": self.avg_train_loss},
                valid_stats=stats,
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"CER": cer}, min_keys=["CER"]
                )
        else:
            self.hparams.train_logger.log_stats(
                {"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats=stats,
            )


def dataio_prep(hparams):
    """Paired audio + char-token datasets."""
    from speechbrain_tpu.dataio.dataio import read_audio

    label_encoder = CTCTextEncoder()
    datasets = {}
    for split in ("train", "valid", "test"):
        ds = DynamicItemDataset.from_json(hparams[f"{split}_json"])
        ds.add_dynamic_item(
            read_audio, takes="noisy_wav", provides="noisy_sig"
        )
        ds.add_dynamic_item(
            read_audio, takes="clean_wav", provides="clean_sig"
        )
        ds.add_dynamic_item(
            lambda w: list(w), takes="words", provides="char_list"
        )

        def tokens_pipeline(char_list):
            tokens = label_encoder.encode_sequence(char_list)
            return (
                np.asarray(tokens, np.int64),
                np.asarray([hparams["bos_index"]] + tokens, np.int64),
                np.asarray(tokens + [hparams["eos_index"]], np.int64),
            )

        ds.add_dynamic_item(
            tokens_pipeline,
            takes="char_list",
            provides=["tokens", "tokens_bos", "tokens_eos"],
        )
        ds.set_output_keys(
            ["id", "noisy_sig", "clean_sig", "tokens", "tokens_bos",
             "tokens_eos"]
        )
        datasets[split] = ds
    label_encoder.load_or_create(
        path=hparams["save_folder"] + "/label_encoder.txt",
        from_didatasets=[datasets[s] for s in ("train", "valid", "test")],
        output_key="char_list",
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
    sys.path.insert(0, __file__.rsplit("/MTL/", 1)[0])
    from voicebank_prepare import prepare_voicebank

    run_on_main(
        prepare_voicebank,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
        },
    )
    datasets, label_encoder = dataio_prep(hparams)
    brain = MTLBrain(
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
        min_key="CER",
    )
