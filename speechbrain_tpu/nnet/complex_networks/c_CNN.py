"""Complex-valued convolutions.

Parity target: reference ``nnet/complex_networks/c_CNN.py``.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import _pad_1d

__all__ = ["CConv1d", "CConv2d"]


class CConv1d(nn.Module):
    """Complex conv1d on (batch, time, 2*in_complex) channels.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> conv = CConv1d(out_channels=4, kernel_size=3)
    >>> x = jnp.ones((2, 16, 8))
    >>> p = conv.init(jax.random.PRNGKey(0), x)
    >>> conv.apply(p, x).shape
    (2, 16, 8)
    """

    out_channels: int  # complex output channels
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: str = "same"
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        n_in = x.shape[-1] // 2
        xr, xi = x[..., :n_in], x[..., n_in:]
        conv_r = nn.Conv(
            features=self.out_channels,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding="VALID",
            use_bias=False,
            dtype=x.dtype,
            name="conv_real",
        )
        conv_i = nn.Conv(
            features=self.out_channels,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding="VALID",
            use_bias=False,
            dtype=x.dtype,
            name="conv_imag",
        )
        xr = _pad_1d(xr, self.kernel_size, self.dilation, self.stride, self.padding)
        xi = _pad_1d(xi, self.kernel_size, self.dilation, self.stride, self.padding)
        yr = conv_r(xr) - conv_i(xi)
        yi = conv_r(xi) + conv_i(xr)
        out = jnp.concatenate([yr, yi], axis=-1)
        if self.bias:
            b = self.param(
                "bias", nn.initializers.zeros, (2 * self.out_channels,)
            ).astype(x.dtype)
            out = out + b
        return out


class CConv2d(nn.Module):
    """Complex conv2d on (batch, H, W, 2*in_complex)."""

    out_channels: int
    kernel_size: tuple = (3, 3)
    stride: tuple = (1, 1)
    padding: str = "SAME"
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        n_in = x.shape[-1] // 2
        xr, xi = x[..., :n_in], x[..., n_in:]
        conv_r = nn.Conv(
            features=self.out_channels, kernel_size=self.kernel_size,
            strides=self.stride, padding=self.padding, use_bias=False,
            dtype=x.dtype, name="conv_real",
        )
        conv_i = nn.Conv(
            features=self.out_channels, kernel_size=self.kernel_size,
            strides=self.stride, padding=self.padding, use_bias=False,
            dtype=x.dtype, name="conv_imag",
        )
        yr = conv_r(xr) - conv_i(xi)
        yi = conv_r(xi) + conv_i(xr)
        out = jnp.concatenate([yr, yi], axis=-1)
        if self.bias:
            b = self.param(
                "bias", nn.initializers.zeros, (2 * self.out_channels,)
            ).astype(x.dtype)
            out = out + b
        return out
