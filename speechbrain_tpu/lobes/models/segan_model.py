"""SEGAN speech-enhancement GAN (time-domain encoder-decoder).

Parity target: reference ``lobes/models/segan_model.py`` (Generator with
skip connections, Discriminator, loss helpers).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import Conv1d, ConvTranspose1d

__all__ = ["Generator", "Discriminator", "g_loss", "d_loss"]


class Generator(nn.Module):
    """U-Net style waveform enhancer with latent noise injection.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> gen = Generator(kernel_size=16, channels=(8, 16))
    >>> x = jnp.ones((1, 1024))
    >>> v = gen.init({"params": jax.random.PRNGKey(0),
    ...               "noise": jax.random.PRNGKey(1)}, x)
    >>> out = gen.apply(v, x, rngs={"noise": jax.random.PRNGKey(2)})
    >>> out.shape
    (1, 1024)
    """

    kernel_size: int = 32
    channels: tuple = (64, 128, 256)

    @nn.compact
    def __call__(self, x, train=True):
        T = x.shape[1]
        h = x[..., None]
        skips = []
        for i, ch in enumerate(self.channels):
            h = Conv1d(
                out_channels=ch, kernel_size=self.kernel_size,
                stride=2, name=f"enc_{i}",
            )(h)
            h = nn.PReLU()(h)
            skips.append(h)
        # latent noise concat (GAN stochasticity)
        z = jax.random.normal(self.make_rng("noise"), h.shape, h.dtype)
        h = jnp.concatenate([h, z], axis=-1)
        for i, ch in enumerate(reversed(self.channels[:-1])):
            h = ConvTranspose1d(
                out_channels=ch, kernel_size=self.kernel_size,
                stride=2, padding=(self.kernel_size - 2) // 2,
                name=f"dec_{i}",
            )(h)
            h = nn.PReLU()(h)
            skip = skips[-(i + 2)]
            m = min(h.shape[1], skip.shape[1])
            h = jnp.concatenate([h[:, :m], skip[:, :m]], axis=-1)
        h = ConvTranspose1d(
            out_channels=1, kernel_size=self.kernel_size, stride=2,
            padding=(self.kernel_size - 2) // 2, name="dec_out",
        )(h)
        h = jnp.tanh(h)[..., 0]
        if h.shape[1] >= T:
            return h[:, :T]
        return jnp.pad(h, ((0, 0), (0, T - h.shape[1])))


class Discriminator(nn.Module):
    """Conv discriminator over (noisy, candidate-clean) waveform pairs."""

    kernel_size: int = 32
    channels: tuple = (64, 128, 256)

    @nn.compact
    def __call__(self, x, train=True):
        """x: (batch, time, 2) stacked pair."""
        h = x
        for i, ch in enumerate(self.channels):
            h = Conv1d(
                out_channels=ch, kernel_size=self.kernel_size,
                stride=2, name=f"conv_{i}",
            )(h)
            h = nn.LayerNorm(dtype=h.dtype)(h)
            h = jax.nn.leaky_relu(h, 0.3)
        h = h.mean(axis=1)
        return nn.Dense(1, dtype=h.dtype)(h)


def g_loss(d_fake, enhanced, clean, l1_weight=100.0):
    """LSGAN generator objective + L1 reconstruction."""
    adv = ((1.0 - d_fake) ** 2).mean()
    l1 = jnp.abs(enhanced - clean).mean()
    return adv + l1_weight * l1


def d_loss(d_real, d_fake):
    """LSGAN discriminator objective."""
    return ((1.0 - d_real) ** 2).mean() + (d_fake ** 2).mean()


def d1_loss(d_outputs, reduction="mean"):
    """Discriminator loss on clean inputs: push scores → 1 (reference
    ``lobes/models/segan_model.py:195``).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> float(d1_loss(jnp.ones((2, 4))))
    0.0
    """
    output = 0.5 * ((d_outputs - 1) ** 2)
    if reduction == "mean":
        return output.mean()
    if reduction == "batch":
        return output.reshape(output.shape[0], -1).mean(axis=1)
    raise ValueError(f"Unknown reduction {reduction}")


def d2_loss(d_outputs, reduction="mean"):
    """Discriminator loss on enhanced inputs: push scores → 0
    (reference ``lobes/models/segan_model.py:204``)."""
    output = 0.5 * (d_outputs**2)
    if reduction == "mean":
        return output.mean()
    if reduction == "batch":
        return output.reshape(output.shape[0], -1).mean(axis=1)
    raise ValueError(f"Unknown reduction {reduction}")


def g3_loss(
    d_outputs,
    predictions,
    targets,
    length=None,
    l1LossCoeff=100.0,
    klLossCoeff=0.0,
    z_mean=None,
    z_logvar=None,
    reduction="mean",
):
    """Generator loss: LSGAN term + weighted L1 + optional VAE KL
    (reference ``lobes/models/segan_model.py:213``)."""
    discrimloss = 0.5 * ((d_outputs - 1) ** 2)
    l1norm = jnp.abs(predictions - targets)
    if z_mean is not None:
        # KL(N(mu, sigma) || N(0, 1)) in closed form
        var = jnp.exp(z_logvar)
        kl = 0.5 * (var + z_mean**2 - 1.0 - z_logvar)
        kl = kl.sum(axis=1).sum(axis=1).mean()
    else:
        kl = 0.0
    if reduction == "mean":
        return (
            discrimloss.mean()
            + l1LossCoeff * l1norm.mean()
            + klLossCoeff * kl
        )
    if reduction == "batch":
        dloss = discrimloss.reshape(discrimloss.shape[0], -1).mean(axis=1)
        lloss = l1norm.reshape(l1norm.shape[0], -1).mean(axis=1)
        return dloss + l1LossCoeff * lloss + klLossCoeff * kl
    raise ValueError(f"Unknown reduction {reduction}")
