"""Convolutional frontend for transformer ASR (time subsampling).

Parity target: reference ``lobes/models/convolution.py``
(ConvolutionFrontEnd: Conv2d blocks with stride subsampling + norm).
"""

import flax.linen as nn
import jax

from speechbrain_tpu.nnet.CNN import Conv2d
from speechbrain_tpu.nnet.normalization import BatchNorm1d

__all__ = ["ConvolutionFrontEnd"]


class ConvolutionFrontEnd(nn.Module):
    """Stack of strided Conv2d blocks over (batch, time, freq).

    Each block halves time (stride 2) — two blocks give the standard
    4x subsampling.  Output is flattened to (batch, time', freq'*ch).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> fe = ConvolutionFrontEnd(num_blocks=2, out_channels=(16, 32))
    >>> x = jnp.ones((2, 100, 80))
    >>> v = fe.init(jax.random.PRNGKey(0), x, train=False)
    >>> fe.apply(v, x, train=False).shape
    (2, 25, 640)
    """

    num_blocks: int = 3
    num_layers_per_block: int = 1
    out_channels: tuple = (128, 256, 512)
    kernel_sizes: tuple = ((3, 3),) * 8
    strides: tuple = (2, 2, 1, 1, 1, 1, 1, 1)
    residuals: tuple = (False,) * 8
    norm_type: str = "batchnorm"

    @nn.compact
    def __call__(self, x, train=True):
        if x.ndim == 3:
            x = x[..., None]  # (B, T, F, 1)
        for b in range(self.num_blocks):
            for layer in range(self.num_layers_per_block):
                stride = self.strides[b] if layer == self.num_layers_per_block - 1 else 1
                x = Conv2d(
                    out_channels=self.out_channels[b],
                    kernel_size=self.kernel_sizes[b],
                    stride=(stride, stride),
                )(x)
                if self.norm_type == "batchnorm":
                    x = BatchNorm1d()(x, train=train)
                elif self.norm_type == "layernorm":
                    x = nn.LayerNorm(dtype=x.dtype)(x)
                x = jax.nn.relu(x)
        b_, t_, f_, c_ = x.shape
        return x.reshape(b_, t_, f_ * c_)


class ConvBlock(nn.Module):
    """One convolution block: ``num_layers`` convs (stride applied on
    the last) + norm + activation, optional residual (reference
    ``lobes/models/convolution.py:87``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> blk = ConvBlock(num_layers=2, out_channels=16)
    >>> x = jnp.ones((8, 30, 10))
    >>> v = blk.init(jax.random.PRNGKey(0), x, train=False)
    >>> blk.apply(v, x, train=False).shape
    (8, 30, 10, 16)
    """

    num_layers: int
    out_channels: int
    kernel_size: tuple = (3, 3)
    stride: tuple = (1, 1)
    dilation: tuple = (1, 1)
    residual: bool = False
    norm_type: str = "batchnorm"
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train=True):
        if x.ndim == 3:
            x = x[..., None]
        inp = x
        for i in range(self.num_layers):
            stride = (
                self.stride if i == self.num_layers - 1 else (1, 1)
            )
            x = Conv2d(
                out_channels=self.out_channels,
                kernel_size=self.kernel_size,
                stride=stride,
                dilation=self.dilation,
                name=f"conv_{i}",
            )(x)
            if self.norm_type == "batchnorm":
                x = BatchNorm1d(name=f"norm_{i}")(x, train=train)
            elif self.norm_type == "layernorm":
                x = nn.LayerNorm(dtype=x.dtype, name=f"norm_{i}")(x)
            x = jax.nn.leaky_relu(x)
            x = nn.Dropout(
                rate=self.dropout, deterministic=not train
            )(x)
        if self.residual and inp.shape == x.shape:
            x = x + inp
        return x
