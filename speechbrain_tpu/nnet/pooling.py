"""Pooling layers: max/avg windows, statistics pooling, adaptive pooling.

Parity targets: reference ``nnet/pooling.py`` (Pooling1d/2d,
StatisticsPooling:243, AdaptivePool, GaussianLowpassPooling:395).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Pooling1d",
    "Pooling2d",
    "StatisticsPooling",
    "AdaptivePool",
    "GaussianLowpassPooling",
]


class Pooling1d(nn.Module):
    """Max or average pooling along time for (batch, time, channels).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> pool = Pooling1d("max", kernel_size=2)
    >>> pool(jnp.arange(8.0).reshape(1, 8, 1)).shape
    (1, 4, 1)
    """

    pool_type: str = "max"
    kernel_size: int = 2
    stride: int | None = None
    padding: int = 0
    ceil_mode: bool = False

    def __call__(self, x):
        stride = self.stride or self.kernel_size
        pads = [(0, 0), (self.padding, self.padding), (0, 0)]
        if self.ceil_mode:
            t = x.shape[1] + 2 * self.padding
            remainder = (t - self.kernel_size) % stride
            if remainder:
                pads[1] = (self.padding, self.padding + stride - remainder)
        if self.pool_type == "max":
            init = -jnp.inf
            op = jax.lax.max
            x = jnp.pad(
                x, pads, mode="constant", constant_values=-np.inf
            )
        elif self.pool_type == "avg":
            init = 0.0
            op = jax.lax.add
            x = jnp.pad(x, pads)
        else:
            raise ValueError(f"Unknown pool_type {self.pool_type}")
        out = jax.lax.reduce_window(
            x,
            init,
            op,
            window_dimensions=(1, self.kernel_size, 1),
            window_strides=(1, stride, 1),
            padding="VALID",
        )
        if self.pool_type == "avg":
            out = out / self.kernel_size
        return out


class Pooling2d(nn.Module):
    """Pooling over (time, features) of a (batch, time, feat[, ch]) input.

    Mirrors the reference's pool over the last two non-batch dims.
    """

    pool_type: str = "max"
    kernel_size: tuple = (2, 2)
    stride: tuple | None = None
    padding: int = 0

    def __call__(self, x):
        had_3d = x.ndim == 3
        if had_3d:
            x = x[..., None]  # (batch, time, feat, 1)
        stride = self.stride or self.kernel_size
        kh, kw = self.kernel_size
        sh, sw = stride if isinstance(stride, (tuple, list)) else (stride, stride)
        if self.pool_type == "max":
            init = -jnp.inf
            op = jax.lax.max
        else:
            init = 0.0
            op = jax.lax.add
        out = jax.lax.reduce_window(
            x,
            init,
            op,
            window_dimensions=(1, kh, kw, 1),
            window_strides=(1, sh, sw, 1),
            padding="VALID"
            if self.padding == 0
            else [(0, 0), (self.padding,) * 2, (self.padding,) * 2, (0, 0)],
        )
        if self.pool_type == "avg":
            out = out / (kh * kw)
        if had_3d:
            out = out[..., 0]
        return out


class StatisticsPooling(nn.Module):
    """Concatenate masked mean and std over time: (B, T, C) -> (B, 1, 2C).

    Gaussian noise is added to the mean during training in the reference
    (``nnet/pooling.py:243``); here controlled by an optional rng.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> sp = StatisticsPooling()
    >>> sp(jnp.ones((2, 10, 4))).shape
    (2, 1, 8)
    """

    return_mean: bool = True
    return_std: bool = True
    eps: float = 1e-5

    def __call__(self, x, lengths=None, rng=None):
        # NaN-grad guard: sqrt'(0) = inf, and bucketed dummy rows are
        # constant signals with exactly-zero variance; the max() floor
        # changes the forward value by <=1e-10 and zeroes the gradient
        # there instead (torch has the same hazard but no dummy rows).
        tiny = 1e-20
        if lengths is None:
            mean = x.mean(axis=1)
            # torch.std: Bessel-corrected
            var = ((x - mean[:, None, :]) ** 2).sum(axis=1) / max(
                x.shape[1] - 1, 1
            )
            std = jnp.sqrt(jnp.maximum(var, tiny))
        else:
            T = x.shape[1]
            n = jnp.round(jnp.asarray(lengths) * T)
            mask = (
                jnp.arange(T)[None, :] < n[:, None]
            ).astype(x.dtype)[..., None]
            denom = jnp.maximum(n, 1.0)[:, None]
            mean = (x * mask).sum(axis=1) / denom
            ss = ((x - mean[:, None, :]) ** 2 * mask).sum(axis=1)
            std = jnp.sqrt(
                jnp.maximum(ss, tiny) / jnp.maximum(n - 1.0, 1.0)[:, None]
            )
        outs = []
        if self.return_mean:
            if rng is not None:
                # reference adds [eps, 9*eps] min-max-normalized noise
                # to the mean (nnet/pooling.py:309,327-340)
                g = jax.random.normal(rng, mean.shape, mean.dtype)
                g = g - g.min()
                g = g / jnp.maximum(g.max(), 1e-20)
                mean = mean + self.eps * ((1 - 9) * g + 9)
            outs.append(mean)
        if self.return_std:
            std = std + self.eps
            outs.append(std)
        return jnp.concatenate(outs, axis=-1)[:, None, :]


class AdaptivePool(nn.Module):
    """Adaptive average pooling to a fixed output time size."""

    output_size: int = 1

    def __call__(self, x):
        """(batch, time, channels) -> (batch, output_size, channels)."""
        b, t, c = x.shape
        if self.output_size == 1:
            return x.mean(axis=1, keepdims=True)
        # Split time into output_size roughly equal bins.
        bins = np.linspace(0, t, self.output_size + 1).astype(int)
        outs = [
            x[:, bins[i] : max(bins[i + 1], bins[i] + 1)].mean(
                axis=1, keepdims=True
            )
            for i in range(self.output_size)
        ]
        return jnp.concatenate(outs, axis=1)


class GaussianLowpassPooling(nn.Module):
    """Learnable Gaussian lowpass pooling (LEAF frontend).

    Each channel has a learnable bandwidth; pooling is a depthwise conv
    with a Gaussian kernel.
    """

    in_channels: int
    kernel_size: int
    stride: int = 1
    initialization_constant: float = 0.4

    @nn.compact
    def __call__(self, x):
        """(batch, time, channels) -> strided smoothed output."""
        weights = self.param(
            "weights",
            lambda key, s: jnp.full(s, self.initialization_constant, jnp.float32),
            (self.in_channels,),
        )
        w = jnp.clip(weights, 2.0 / self.kernel_size, 0.5).astype(x.dtype)
        t = jnp.arange(self.kernel_size, dtype=x.dtype)
        numerator = t - 0.5 * (self.kernel_size - 1)
        denominator = w * 0.5 * (self.kernel_size - 1)
        kernel = jnp.exp(-0.5 * (numerator[:, None] / denominator[None, :]) ** 2)
        kernel = kernel / jnp.maximum(
            kernel.sum(axis=0, keepdims=True), 1e-8
        )  # (K, C)
        pad = self.kernel_size // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
        out = jax.lax.conv_general_dilated(
            xp,
            kernel[:, None, :],  # (K, 1, C) HIO for depthwise
            window_strides=(self.stride,),
            padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.in_channels,
        )
        return out
