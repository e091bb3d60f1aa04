"""Quaternion convolutions.

Parity target: reference ``nnet/quaternion_networks/q_CNN.py``.
"""

import flax.linen as nn
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import _pad_1d
from speechbrain_tpu.nnet.quaternion_networks.q_ops import get_component

__all__ = ["QConv1d", "QConv2d"]


class QConv1d(nn.Module):
    """Quaternion conv1d on (batch, time, 4*in_q) channels.

    Four real convs combined by the Hamilton product.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> conv = QConv1d(out_channels=4, kernel_size=3)
    >>> x = jnp.ones((2, 16, 16))
    >>> p = conv.init(jax.random.PRNGKey(0), x)
    >>> conv.apply(p, x).shape
    (2, 16, 16)
    """

    out_channels: int  # quaternion output channels
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: str = "same"
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        convs = {
            name: nn.Conv(
                features=self.out_channels,
                kernel_size=(self.kernel_size,),
                strides=(self.stride,),
                kernel_dilation=(self.dilation,),
                padding="VALID",
                use_bias=False,
                dtype=x.dtype,
                name=f"conv_{name}",
            )
            for name in ("r", "i", "j", "k")
        }
        xr, xi, xj, xk = (
            _pad_1d(
                get_component(x, n),
                self.kernel_size,
                self.dilation,
                self.stride,
                self.padding,
            )
            for n in range(4)
        )
        cr, ci, cj, ck = (convs[n] for n in ("r", "i", "j", "k"))
        yr = cr(xr) - ci(xi) - cj(xj) - ck(xk)
        yi = ci(xr) + cr(xi) - ck(xj) + cj(xk)
        yj = cj(xr) + ck(xi) + cr(xj) - ci(xk)
        yk = ck(xr) - cj(xi) + ci(xj) + cr(xk)
        out = jnp.concatenate([yr, yi, yj, yk], axis=-1)
        if self.bias:
            b = self.param(
                "bias", nn.initializers.zeros, (4 * self.out_channels,)
            ).astype(x.dtype)
            out = out + b
        return out


class QConv2d(nn.Module):
    """Quaternion conv2d on (batch, H, W, 4*in_q)."""

    out_channels: int
    kernel_size: tuple = (3, 3)
    stride: tuple = (1, 1)
    padding: str = "SAME"
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        convs = {
            name: nn.Conv(
                features=self.out_channels,
                kernel_size=self.kernel_size,
                strides=self.stride,
                padding=self.padding,
                use_bias=False,
                dtype=x.dtype,
                name=f"conv_{name}",
            )
            for name in ("r", "i", "j", "k")
        }
        xr, xi, xj, xk = (get_component(x, n) for n in range(4))
        cr, ci, cj, ck = (convs[n] for n in ("r", "i", "j", "k"))
        yr = cr(xr) - ci(xi) - cj(xj) - ck(xk)
        yi = ci(xr) + cr(xi) - ck(xj) + cj(xk)
        yj = cj(xr) + ck(xi) + cr(xj) - ci(xk)
        yk = ck(xr) - cj(xi) + ci(xj) + cr(xk)
        out = jnp.concatenate([yr, yi, yj, yk], axis=-1)
        if self.bias:
            b = self.param(
                "bias", nn.initializers.zeros, (4 * self.out_channels,)
            ).astype(x.dtype)
            out = out + b
        return out
