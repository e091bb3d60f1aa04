"""Self-supervised wav2vec2 slice: contrastive pretraining step runs,
loss decreases, quantiser diversity stays healthy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechbrain_tpu.core import Brain, Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.lobes.models.wav2vec import (
    EncoderWrapper,
    W2VLatentExtractor,
    W2VTargetQuantiser,
    compute_mask,
    sample_negatives,
)
from speechbrain_tpu.nnet.losses import ContrastiveLoss

SR = 8000


def _make_dataset(n=8, seed=0):
    rng = np.random.default_rng(seed)
    data = {}
    for i in range(n):
        # structured audio (chirps) so targets are learnable
        t = np.arange(int(1.0 * SR)) / SR
        f0 = rng.uniform(100, 400)
        wav = 0.5 * np.sin(2 * np.pi * (f0 + 400 * t) * t)
        data[f"u{i}"] = {"wav_data": wav.astype(np.float32)}
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "wav_data"])
    return ds


class W2VBrain(Brain):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.loss_fn = ContrastiveLoss(logit_temp=0.1)

    def compute_forward(self, batch, stage):
        latents = self.modules.extractor(batch["wav_data"])
        B, T, C = latents.shape
        mask = compute_mask(
            (B, T), [T] * B, mask_prob=0.5, mask_length=2,
            seed=int(self.step),
        )
        targets, meta = self.modules.quantiser(latents)
        enc = self.modules.encoder(
            latents, mask=jnp.asarray(mask)
        )["embeddings"]
        proj = self.modules.proj(enc)
        negatives = sample_negatives(
            targets, num_neg=8, key=self._bound_rngs["augment"]
        )
        return proj, targets, negatives, meta

    def compute_objectives(self, predictions, batch, stage):
        proj, targets, negatives, meta = predictions
        loss = self.loss_fn(proj, targets, negatives)
        return loss + 0.1 * meta["diversity_loss"]


@pytest.fixture(scope="module")
def trained():
    import optax

    from speechbrain_tpu.nnet.linear import Linear
    from speechbrain_tpu.utils.epoch_loop import EpochCounter

    ds = _make_dataset()
    brain = W2VBrain(
        modules={
            "extractor": W2VLatentExtractor(
                out_channels=(16,) * 7
            ),
            "quantiser": W2VTargetQuantiser(
                in_dim=16, out_dim=16, quantiser_vars=16,
                quantiser_groups=2,
            ),
            "encoder": EncoderWrapper(
                in_dim=16, embedding_dim=32, num_layers=1, nhead=4,
                d_ffn=64, dropout=0.0,
            ),
            "proj": Linear(n_neurons=16),
        },
        opt_class=lambda lr: optax.adam(lr),
        hparams={"lr": 2e-3},
        run_opts={"seed": 4, "loss_sync_interval": 1},
    )
    loader = SaveableDataLoader(ds, batch_size=8, shuffle=True)
    losses = []
    from speechbrain_tpu.utils.epoch_loop import EpochCounter

    for epoch in range(12):
        brain.on_stage_start(Stage.TRAIN, epoch)
        brain._fit_train(loader, epoch, False)
        losses.append(brain.train_loss)
    return brain, losses


def test_ssl_loss_decreases(trained):
    brain, losses = trained
    assert losses[-1] < losses[0]
    assert np.isfinite(losses[-1])
