#!/usr/bin/env python3
"""Spectral-mask enhancement on VoiceBank-DEMAND (TPU-native).

    python train.py hparams/train.yaml --data_folder /data/VoiceBank

Mirrors the reference ``recipes/Voicebank/enhance/spectral_mask``:
log1p-magnitude features, CNNTransformerSE mask with signal
approximation, MSE (or waveform) objective, STOI tracked off-train,
noisy-phase resynthesis for waveform output.
"""

import sys

import jax.numpy as jnp
import numpy as np

import speechbrain_tpu as sb
from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import mse_loss
from speechbrain_tpu.processing.features import spectral_magnitude
from speechbrain_tpu.processing.signal_processing import resynthesize


class SEBrain(sb.Brain):
    """Brain for spectral-mask enhancement."""

    def compute_feats(self, wavs):
        """log1p compressed magnitude spectra."""
        feats = self.hparams.compute_STFT(wavs)
        feats = spectral_magnitude(feats, power=0.5)
        return jnp.log1p(feats)

    def compute_forward(self, batch, stage):
        """Noisy wav -> (masked spectrum, resynthesized waveform)."""
        noisy_wavs = batch["noisy_sig"]
        noisy_feats = self.compute_feats(noisy_wavs)
        mask = self.modules.model(
            noisy_feats, lengths=batch["noisy_sig_lens"]
        )
        predict_spec = mask * noisy_feats
        predict_wav = resynthesize(
            jnp.expm1(predict_spec),
            noisy_wavs,
            self.hparams.compute_STFT,
            self.hparams.compute_ISTFT,
        )
        return predict_spec, predict_wav

    def compute_objectives(self, predictions, batch, stage):
        """Signal-approximation MSE (or waveform target), batch-masked."""
        predict_spec, predict_wav = predictions
        clean_wavs = batch["clean_sig"]
        lens = batch["clean_sig_lens"] * batch["batch_mask"]
        if self.hparams.waveform_target:
            loss = mse_loss(predict_wav, clean_wavs, lens)
        else:
            clean_spec = self.compute_feats(clean_wavs)
            loss = mse_loss(predict_spec, clean_spec, lens)
        if stage != Stage.TRAIN and hasattr(self, "stoi_metric"):
            from speechbrain_tpu.nnet.loss.stoi_loss import stoi_loss

            real = int(np.asarray(batch["batch_mask"]).sum())
            self.stoi_metric.append(
                [str(i) for i in range(real)],
                np.asarray(predict_wav)[:real],
                np.asarray(clean_wavs)[:real],
                np.asarray(batch["clean_sig_lens"])[:real],
            )
            if stage == Stage.TEST:
                # Persist enhanced audio (reference writes test wavs).
                import os

                from speechbrain_tpu.dataio.dataio import write_audio

                os.makedirs(self.hparams.enhanced_folder, exist_ok=True)
                lens = np.asarray(batch["clean_sig_lens"])[:real]
                T = predict_wav.shape[1]
                for i in range(real):
                    n = int(round(float(lens[i]) * T))
                    write_audio(
                        os.path.join(
                            self.hparams.enhanced_folder,
                            f"utt_{self._test_wav_count + i}.wav",
                        ),
                        np.asarray(predict_wav)[i, :n],
                        self.hparams.sample_rate,
                    )
                self._test_wav_count += real
        return loss

    def on_stage_start(self, stage, epoch=None):
        """STOI metric off-train."""
        self._test_wav_count = 0
        if stage != Stage.TRAIN:
            from speechbrain_tpu.nnet.loss.stoi_loss import stoi_loss
            from speechbrain_tpu.utils.metric_stats import MetricStats

            self.stoi_metric = MetricStats(
                metric=lambda p, t, lens: stoi_loss(
                    jnp.asarray(p), jnp.asarray(t), jnp.asarray(lens),
                    reduction="batch",
                )
            )

    def on_stage_end(self, stage, stage_loss, epoch=None):
        """Log + checkpoint on valid; report test stats."""
        if stage == Stage.TRAIN:
            return
        stats = {"loss": stage_loss, "stoi": -self.stoi_metric.summarize("average")}
        if stage == Stage.VALID:
            self.hparams.train_logger.log_stats(
                {"epoch": epoch, "lr": self.lr},
                train_stats={"loss": self.avg_train_loss},
                valid_stats=stats,
            )
            if self.checkpointer is not None:
                self.checkpointer.save_and_keep_only(
                    meta={"loss": stage_loss}, min_keys=["loss"]
                )
        else:
            self.hparams.train_logger.log_stats(
                {"Epoch loaded": self.hparams.epoch_counter.current},
                test_stats=stats,
            )


def dataio_prep(hparams):
    """Datasets yielding paired (noisy, clean) signals."""
    from speechbrain_tpu.dataio.dataio import read_audio

    datasets = {}
    for split in ("train", "valid", "test"):
        ds = DynamicItemDataset.from_json(hparams[f"{split}_json"])
        ds.add_dynamic_item(
            read_audio, takes="noisy_wav", provides="noisy_sig"
        )
        ds.add_dynamic_item(
            read_audio, takes="clean_wav", provides="clean_sig"
        )
        ds.set_output_keys(["id", "noisy_sig", "clean_sig"])
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
    sys.path.insert(0, __file__.rsplit("/enhance/", 1)[0])
    from voicebank_prepare import prepare_voicebank

    run_on_main(
        prepare_voicebank,
        kwargs={
            "data_folder": hparams["data_folder"],
            "save_folder": hparams["save_folder"],
        },
    )
    datasets = dataio_prep(hparams)
    brain = SEBrain(
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
