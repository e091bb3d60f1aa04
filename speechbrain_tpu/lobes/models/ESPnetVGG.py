"""VGG-style subsampling encoder (ESPnet flavour).

Parity target: reference ``lobes/models/ESPnetVGG.py``.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.RNN import LSTM

__all__ = ["ESPnetVGG"]


class ESPnetVGG(nn.Module):
    """2 VGG conv blocks (4x time subsampling) + optional LSTM stack.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = ESPnetVGG(channels=(8, 16), rnn_neurons=32, rnn_layers=1)
    >>> x = jnp.ones((2, 20, 40))
    >>> v = net.init(jax.random.PRNGKey(0), x, train=False)
    >>> out = net.apply(v, x, train=False)
    >>> out.shape
    (2, 5, 32)
    """

    channels: tuple = (64, 128)
    rnn_layers: int = 4
    rnn_neurons: int = 512
    rnn_bidirectional: bool = True
    dropout: float = 0.15

    @nn.compact
    def __call__(self, x, lengths=None, train=True):
        if x.ndim == 3:
            x = x[..., None]
        for i, ch in enumerate(self.channels):
            for j in range(2):
                x = nn.Conv(
                    features=ch, kernel_size=(3, 3), dtype=x.dtype,
                    name=f"conv_{i}_{j}",
                )(x)
                x = jax.nn.relu(x)
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max,
                window_dimensions=(1, 2, 2, 1),
                window_strides=(1, 2, 2, 1),
                padding="VALID",
            )
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        if self.rnn_layers > 0:
            x, _ = LSTM(
                hidden_size=self.rnn_neurons
                // (2 if self.rnn_bidirectional else 1),
                num_layers=self.rnn_layers,
                bidirectional=self.rnn_bidirectional,
                dropout=self.dropout,
            )(x, train=train)
        return x
