"""Adversarial training slice: GANBrain trains a toy LSGAN with the
fused generator/discriminator step (mirrors the reference's HiFiGAN /
MetricGAN two-optimizer fit_batch pattern).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechbrain_tpu.core import Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.gan import GANBrain


class Gen(nn.Module):
    @nn.compact
    def __call__(self, z, train=True):
        h = nn.relu(nn.Dense(32)(z))
        return nn.Dense(8)(h)


class Disc(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        h = nn.leaky_relu(nn.Dense(32)(x))
        return nn.Dense(1)(h)[..., 0]


class ToyGAN(GANBrain):
    def compute_forward(self, batch, stage):
        return self.modules.generator(batch["z"])

    def compute_disc_loss(self, predictions, batch, stage):
        fake = jax.lax.stop_gradient(predictions)
        d_real = self.modules.discriminator(batch["real"])
        d_fake = self.modules.discriminator(fake)
        return jnp.mean((d_real - 1) ** 2) + jnp.mean(d_fake**2)

    def compute_gen_loss(self, predictions, batch, stage):
        d_fake = self.modules.discriminator(predictions)
        adv = jnp.mean((d_fake - 1) ** 2)
        l1 = jnp.mean(jnp.abs(predictions - batch["real"]))
        return adv + 10.0 * l1


@pytest.fixture(scope="module")
def trained():
    import optax

    rng = np.random.default_rng(0)
    data = {}
    for i in range(32):
        base = rng.normal()
        real = base * np.linspace(1, 2, 8) + 0.5
        data[f"s{i}"] = {
            "real": real.astype(np.float32),
            "z": rng.normal(size=4).astype(np.float32),
        }
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "real", "z"])
    brain = ToyGAN(
        modules={"generator": Gen(), "discriminator": Disc()},
        opt_class=lambda lr: optax.adam(lr),
        opt_class_d=lambda lr: optax.adam(lr),
        disc_keys=["discriminator"],
        hparams={"lr": 2e-3},
        run_opts={"seed": 0, "loss_sync_interval": 1},
    )
    loader = SaveableDataLoader(ds, batch_size=8, shuffle=True)
    losses = []
    for epoch in range(60):
        brain.on_stage_start(Stage.TRAIN, epoch)
        brain._fit_train(loader, epoch, False)
        losses.append(brain.train_loss)
    return brain, losses


def test_generator_learns(trained):
    brain, losses = trained
    assert losses[-1] < losses[0] * 0.7
    assert np.isfinite(losses[-1])


def test_discriminator_near_equilibrium(trained):
    brain, _ = trained
    # LSGAN d-loss near 0.5 at equilibrium; sanity band.
    d = float(brain.last_disc_loss)
    assert 0.05 < d < 1.5


def test_optimizer_state_split(trained):
    brain, _ = trained
    assert set(brain.train_state["opt_state"].keys()) == {"g", "d"}
    g_params, d_params = brain._split_params(
        brain.train_state["params"]
    )
    assert "generator" in g_params and "discriminator" in d_params
