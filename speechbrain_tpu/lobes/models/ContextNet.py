"""ContextNet encoder (SE conv blocks with residuals).

Parity target: reference ``lobes/models/ContextNet.py:17``.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import DepthwiseSeparableConv1d
from speechbrain_tpu.nnet.normalization import BatchNorm1d

__all__ = ["ContextNet", "ContextNetBlock", "SEmodule"]


class SEmodule(nn.Module):
    """Squeeze-excitation over time-averaged channels."""

    inner_dim: int = 128

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=1)
        s = jax.nn.relu(nn.Dense(self.inner_dim, dtype=x.dtype)(s))
        s = jax.nn.sigmoid(nn.Dense(x.shape[-1], dtype=x.dtype)(s))
        return x * s[:, None, :]


class ContextNetBlock(nn.Module):
    """N depthwise-separable convs + SE + residual."""

    out_channels: int
    kernel_size: int = 5
    num_layers: int = 5
    stride: int = 1
    residual: bool = True

    @nn.compact
    def __call__(self, x, train=True):
        inp = x
        for i in range(self.num_layers):
            stride = self.stride if i == self.num_layers - 1 else 1
            x = DepthwiseSeparableConv1d(
                out_channels=self.out_channels,
                kernel_size=self.kernel_size,
                stride=stride,
            )(x)
            x = BatchNorm1d()(x, train=train)
            x = x * jax.nn.sigmoid(x)  # swish
        x = SEmodule()(x)
        if self.residual:
            res = nn.Conv(
                features=self.out_channels, kernel_size=(1,),
                strides=(self.stride,), dtype=inp.dtype,
            )(inp)
            x = x + res
        return x


class ContextNet(nn.Module):
    """Stack of ContextNet blocks with strided subsampling.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = ContextNet(block_channels=(32, 32), strides=(1, 2),
    ...                  num_layers=2)
    >>> x = jnp.ones((2, 16, 40))
    >>> v = net.init(jax.random.PRNGKey(0), x, train=False)
    >>> net.apply(v, x, train=False).shape
    (2, 8, 32)
    """

    block_channels: tuple = (256,) * 22 + (640,)
    strides: tuple = None
    kernel_size: int = 5
    num_layers: int = 5

    @nn.compact
    def __call__(self, x, lengths=None, train=True):
        strides = self.strides or (1,) * len(self.block_channels)
        for i, (ch, s) in enumerate(zip(self.block_channels, strides)):
            x = ContextNetBlock(
                out_channels=ch,
                kernel_size=self.kernel_size,
                num_layers=self.num_layers,
                stride=s,
                name=f"block_{i}",
            )(x, train=train)
        return x
