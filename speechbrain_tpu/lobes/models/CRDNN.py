"""CRDNN: CNN blocks + (Li)GRU/LSTM + DNN with time pooling.

Parity target: reference ``lobes/models/CRDNN.py:14`` (CRDNN), ``:197``
(CNN_Block), ``:279`` (DNN_Block).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import Conv2d
from speechbrain_tpu.nnet.RNN import GRU, LSTM, LiGRU
from speechbrain_tpu.nnet.normalization import BatchNorm1d, LayerNorm
from speechbrain_tpu.nnet.pooling import Pooling1d, Pooling2d

__all__ = ["CRDNN", "CNN_Block", "DNN_Block"]


class CNN_Block(nn.Module):
    """2x Conv2d + norm + LeakyReLU + dropout, then freq pooling."""

    channels: int
    kernel_size: tuple = (3, 3)
    using_2d_pooling: bool = False
    pooling_size: int = 2
    activation: str = "leaky_relu"
    dropout: float = 0.15
    norm_type: str = "layernorm"

    @nn.compact
    def __call__(self, x, train=True):
        for _ in range(2):
            x = Conv2d(
                out_channels=self.channels, kernel_size=self.kernel_size
            )(x)
            if self.norm_type == "layernorm":
                x = LayerNorm()(x)
            else:
                x = BatchNorm1d()(x, train=train)
            x = jax.nn.leaky_relu(x, negative_slope=0.01)
        if self.using_2d_pooling:
            # 2-d pooling over (time, freq), per channel:
            x = jax.lax.reduce_window(
                x,
                -jnp.inf,
                jax.lax.max,
                window_dimensions=(1, self.pooling_size, self.pooling_size, 1),
                window_strides=(1, self.pooling_size, self.pooling_size, 1),
                padding="VALID",
            )
        else:
            # Pool the frequency axis only (reference default).
            x = jax.lax.reduce_window(
                x,
                -jnp.inf,
                jax.lax.max,
                window_dimensions=(1, 1, self.pooling_size, 1),
                window_strides=(1, 1, self.pooling_size, 1),
                padding="VALID",
            )
        # reference applies ONE channel dropout after pooling
        # (CRDNN.py:275: Dropout2d), not per-conv dropout
        from speechbrain_tpu.nnet.dropout import Dropout2d

        x = Dropout2d(drop_rate=self.dropout)(x, train=train)
        return x


class DNN_Block(nn.Module):
    """Dense + norm + activation + dropout."""

    neurons: int
    activation: str = "leaky_relu"
    dropout: float = 0.15

    @nn.compact
    def __call__(self, x, train=True):
        x = nn.Dense(self.neurons, dtype=x.dtype)(x)
        x = BatchNorm1d()(x, train=train)
        x = jax.nn.leaky_relu(x)
        x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return x


class CRDNN(nn.Module):
    """CNN -> time pooling -> RNN -> DNN encoder.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> model = CRDNN(cnn_channels=(16, 16), rnn_neurons=32,
    ...               dnn_neurons=32, rnn_layers=1)
    >>> x = jnp.ones((2, 40, 40))
    >>> v = model.init(jax.random.PRNGKey(0), x, train=False)
    >>> out = model.apply(v, x, train=False)
    >>> out.shape
    (2, 40, 32)
    """

    cnn_blocks: int = 2
    cnn_channels: tuple = (128, 256)
    cnn_kernelsize: tuple = (3, 3)
    time_pooling: bool = False
    time_pooling_size: int = 2
    freq_pooling_size: int = 2
    rnn_class: str = "ligru"  # reference default (CRDNN.py:93)
    inter_layer_pooling_size: tuple = (2, 2)
    using_2d_pooling: bool = False
    rnn_layers: int = 4
    rnn_neurons: int = 512
    rnn_bidirectional: bool = True
    rnn_re_init: bool = False  # reference default (CRDNN.py:99)
    dnn_blocks: int = 2
    dnn_neurons: int = 512
    dropout: float = 0.15
    projection_dim: int = -1

    @nn.compact
    def __call__(self, x, lengths=None, train=True):
        if x.ndim == 3:
            pass  # (B, T, F)
        for i in range(self.cnn_blocks):
            x = CNN_Block(
                channels=self.cnn_channels[i],
                kernel_size=self.cnn_kernelsize,
                pooling_size=self.inter_layer_pooling_size[i],
                using_2d_pooling=self.using_2d_pooling,
                dropout=self.dropout,
                name=f"cnn_{i}",
            )(x, train=train)
        if self.time_pooling:
            x = jax.lax.reduce_window(
                x,
                -jnp.inf,
                jax.lax.max,
                window_dimensions=(1, self.time_pooling_size) + (1,) * (x.ndim - 2),
                window_strides=(1, self.time_pooling_size) + (1,) * (x.ndim - 2),
                padding="VALID",
            )
        if x.ndim == 4:
            b, t, f, c = x.shape
            x = x.reshape(b, t, f * c)
        if self.projection_dim > 0:
            x = nn.Dense(self.projection_dim, dtype=x.dtype)(x)
        if self.rnn_layers > 0:
            rnn_cls = {"lstm": LSTM, "gru": GRU, "ligru": LiGRU}[
                self.rnn_class
            ]
            x, _ = rnn_cls(
                hidden_size=self.rnn_neurons,
                num_layers=self.rnn_layers,
                bidirectional=self.rnn_bidirectional,
                dropout=self.dropout,
                name="rnn",
            )(x, train=train)
        for i in range(self.dnn_blocks):
            x = DNN_Block(
                neurons=self.dnn_neurons,
                dropout=self.dropout,
                name=f"dnn_{i}",
            )(x, train=train)
        return x
