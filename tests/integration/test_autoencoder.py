"""End-to-end autoencoder slice (mirrors the reference
``tests/integration/autoencoder`` miniature experiment): a bottleneck
MLP reconstructs Fbank features; reconstruction MSE overfits far below
the input variance.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from speechbrain_tpu.core import Brain, Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.lobes.features import Fbank
from speechbrain_tpu.nnet.losses import mse_loss

SR = 8000
N_MELS = 24


def _make_dataset(n_utts=10, seed=17):
    rng = np.random.default_rng(seed)
    data = {}
    for i in range(n_utts):
        freq = 300.0 + 250.0 * (i % 5)
        t = np.arange(int(0.4 * SR)) / SR
        wav = 0.5 * np.sin(2 * np.pi * freq * t)
        wav += 0.01 * rng.normal(size=len(wav))
        data[f"u{i}"] = {"wav_data": wav.astype(np.float32)}
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "wav_data"])
    return ds


class AutoBrain(Brain):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.fbank = Fbank(n_mels=N_MELS, sample_rate=SR, n_fft=256)

    def compute_forward(self, batch, stage):
        feats = self.fbank(batch["wav_data"])
        feats = (feats - feats.mean()) / (feats.std() + 1e-5)
        code = self.modules.encoder(feats)
        recon = self.modules.out(self.modules.decoder(code))
        return recon, feats

    def compute_objectives(self, predictions, batch, stage):
        recon, feats = predictions
        mask = batch["batch_mask"]
        per_utt = mse_loss(
            recon, feats, length=batch["wav_data_lens"], reduction="batch"
        )
        return (per_utt * mask).sum() / jnp.maximum(mask.sum(), 1.0)


@pytest.fixture(scope="module")
def trained():
    import optax

    from speechbrain_tpu.lobes.models.VanillaNN import VanillaNN
    from speechbrain_tpu.nnet.linear import Linear
    from speechbrain_tpu.utils.epoch_loop import EpochCounter

    ds = _make_dataset()
    loader = SaveableDataLoader(ds, batch_size=5, shuffle=True)
    brain = AutoBrain(
        modules={
            "encoder": VanillaNN(dnn_blocks=2, dnn_neurons=8),
            "decoder": VanillaNN(dnn_blocks=2, dnn_neurons=32),
            "out": Linear(n_neurons=N_MELS),
        },
        opt_class=lambda lr: optax.adam(lr),
        hparams={"lr": 5e-3},
        run_opts={"seed": 29},
    )
    brain.fit(EpochCounter(40), loader)
    return brain, ds


def test_autoencoder_overfits(trained):
    brain, _ = trained
    assert brain.train_loss < 0.1


def test_autoencoder_reconstruction(trained):
    brain, ds = trained
    loader = SaveableDataLoader(ds, batch_size=5)
    total, steps = 0.0, 0
    for batch in loader:
        total += brain.evaluate_batch_full(batch, Stage.TEST)
        steps += 1
    assert total / steps < 0.1
