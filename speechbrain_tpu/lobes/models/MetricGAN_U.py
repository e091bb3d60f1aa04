"""Generator and discriminator used in MetricGAN-U (unsupervised).

Parity target: reference ``lobes/models/MetricGAN_U.py:30,105``.
Differences from the supervised MetricGAN lobe: the generator mask is
a plain sigmoid (no 1.2x learnable-slope sigmoid) with a configurable
``lin_dim``, and the discriminator scores a SINGLE spectrogram (one
input channel, batch-norm first) rather than a (noisy, clean) pair —
MetricGAN-U trains against a non-intrusive metric (SRMR/DNSMOS), so no
clean reference enters the network.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.RNN import LSTM

__all__ = ["EnhancementGenerator", "MetricDiscriminator"]


class EnhancementGenerator(nn.Module):
    """BLSTM -> Dense(lin_dim) -> LeakyReLU -> Dense -> sigmoid mask.

    Reference ``lobes/models/MetricGAN_U.py:30-102`` (input_size is
    inferred from the input's last dim, the library's lazy-init idiom).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> gen = EnhancementGenerator(hidden_size=16, num_layers=1)
    >>> x = jnp.ones((2, 10, 40))
    >>> v = gen.init(jax.random.PRNGKey(0), x, train=False)
    >>> out = gen.apply(v, x, train=False)
    >>> out.shape
    (2, 10, 40)
    >>> bool((out <= 1.0).all() and (out >= 0.0).all())
    True
    """

    hidden_size: int = 200
    num_layers: int = 2
    lin_dim: int = 300
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
        out = nn.Dense(self.lin_dim, dtype=out.dtype)(out)
        out = jax.nn.leaky_relu(out, 0.3)
        out = nn.Dense(n_freq, dtype=out.dtype)(out)
        return jax.nn.sigmoid(out)


class MetricDiscriminator(nn.Module):
    """Non-intrusive metric estimator over single spectrograms.

    BatchNorm(1 channel, torch momentum 0.01) -> 4 spectral-normalized
    valid-padding convs -> channel global-average-pool -> 3 linears
    (reference ``lobes/models/MetricGAN_U.py:105-190``).

    Input: (batch, time, freq, 1) magnitude spectrogram.
    ``spec_norm=False`` disables the power-iteration normalization
    (used when loading externally normalized weights).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> d = MetricDiscriminator(base_channels=4)
    >>> x = jnp.ones((2, 20, 33, 1))
    >>> v = d.init(jax.random.PRNGKey(0), x, train=False)
    >>> d.apply(v, x, train=False).shape
    (2, 1)
    """

    kernel_size: tuple = (5, 5)
    base_channels: int = 15
    lin_dim1: int = 50
    lin_dim2: int = 10
    spec_norm: bool = True

    def _sn(self, layer, train):
        if self.spec_norm:
            wrapped = nn.SpectralNorm(layer)
            return lambda x: wrapped(x, update_stats=train)
        return layer

    @nn.compact
    def __call__(self, x, train=True):
        # torch BatchNorm2d momentum 0.01 == flax momentum 0.99
        x = nn.BatchNorm(
            momentum=0.99, use_running_average=not train, dtype=x.dtype
        )(x)
        for i in range(4):
            conv = nn.Conv(
                features=self.base_channels,
                kernel_size=self.kernel_size,
                padding="VALID",
                dtype=x.dtype,
                name=f"conv_{i}",
            )
            x = self._sn(conv, train)(x)
            x = jax.nn.leaky_relu(x, 0.3)
        x = x.mean(axis=(1, 2))  # average over time and freq
        x = self._sn(
            nn.Dense(self.lin_dim1, dtype=x.dtype, name="linear_1"), train
        )(x)
        x = jax.nn.leaky_relu(x, 0.3)
        x = self._sn(
            nn.Dense(self.lin_dim2, dtype=x.dtype, name="linear_2"), train
        )(x)
        x = jax.nn.leaky_relu(x, 0.3)
        return self._sn(
            nn.Dense(1, dtype=x.dtype, name="linear_out"), train
        )(x)
