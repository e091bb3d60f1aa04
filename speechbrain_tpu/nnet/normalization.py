"""Normalization layers (channels-last).

BatchNorm carries running statistics in the linen "batch_stats"
collection; under data parallelism pass ``axis_name="data"`` so batch
statistics psum across replicas — the TPU-native SyncBatchNorm
(reference wraps modules in torch SyncBatchNorm, ``core.py:1245``).

Parity targets: reference ``nnet/normalization.py:12-433`` +
``ExponentialMovingAverage``/``PCEN`` (:434,513).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "BatchNorm1d",
    "BatchNorm2d",
    "LayerNorm",
    "InstanceNorm1d",
    "InstanceNorm2d",
    "GroupNorm",
    "ExponentialMovingAverage",
    "PCEN",
]


class BatchNorm1d(nn.Module):
    """BatchNorm over (batch, time, channels) or (batch, channels).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> bn = BatchNorm1d()
    >>> x = jnp.ones((4, 10, 8))
    >>> vars_ = bn.init(jax.random.PRNGKey(0), x, train=False)
    >>> y, _ = bn.apply(vars_, x, train=True, mutable=["batch_stats"])
    >>> y.shape
    (4, 10, 8)
    """

    eps: float = 1e-5
    momentum: float = 0.1
    affine: bool = True
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train=True):
        bn = nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.momentum,
            epsilon=self.eps,
            use_bias=self.affine,
            use_scale=self.affine,
            axis_name=self.axis_name,
            dtype=x.dtype,
        )
        return bn(x)


class BatchNorm2d(BatchNorm1d):
    """BatchNorm over (batch, H, W, channels)."""


class LayerNorm(nn.Module):
    """LayerNorm over ALL dims after (batch, time) — reference semantics
    (``nnet/normalization.py:206``: normalized_shape = input_shape[2:]),
    so 4-d (B, T, F, C) inputs normalize jointly over (F, C) with
    affine params of shape (F, C)."""

    eps: float = 1e-5
    elementwise_affine: bool = True

    @nn.compact
    def __call__(self, x):
        axes = tuple(range(2, x.ndim)) if x.ndim > 2 else (-1,)
        return nn.LayerNorm(
            epsilon=self.eps,
            use_bias=self.elementwise_affine,
            use_scale=self.elementwise_affine,
            reduction_axes=axes,
            feature_axes=axes,
            dtype=x.dtype,
        )(x)


class InstanceNorm1d(nn.Module):
    """Per-example, per-channel normalization over time."""

    eps: float = 1e-5
    affine: bool = False

    @nn.compact
    def __call__(self, x, train=True):
        mean = x.mean(axis=1, keepdims=True)
        var = x.var(axis=1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param(
                "scale", nn.initializers.ones, (x.shape[-1],)
            )
            bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
            y = y * scale + bias
        return y


class GroupNorm(nn.Module):
    """Group normalization over channels."""

    num_groups: int = 32
    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=self.num_groups,
            epsilon=self.eps,
            use_bias=self.affine,
            use_scale=self.affine,
            dtype=x.dtype,
        )(x)


class ExponentialMovingAverage(nn.Module):
    """Learnable-coefficient EMA smoother along time (for PCEN).

    A first-order IIR implemented with lax.scan over time.
    """

    input_size: int
    coeff_init: float = 0.04
    per_channel: bool = False
    trainable: bool = True

    @nn.compact
    def __call__(self, x):
        """x: (batch, time, channels)."""
        shape = (self.input_size,) if self.per_channel else (1,)
        weights = self.param(
            "ema_coeff",
            lambda key, s: jnp.full(s, self.coeff_init, jnp.float32),
            shape,
        )
        w = jnp.clip(weights, 0.0, 1.0).astype(x.dtype)

        def step(carry, xt):
            new = w * xt + (1.0 - w) * carry
            return new, new

        x_t = jnp.swapaxes(x, 0, 1)  # (time, batch, ch)
        _, out = jax.lax.scan(step, x_t[0], x_t)
        return jnp.swapaxes(out, 0, 1)


class PCEN(nn.Module):
    """Per-channel energy normalization (learnable), LEAF frontend.

    out = (x / (eps + EMA(x))**alpha + delta)**r - delta**r
    """

    input_size: int
    alpha: float = 0.96
    smooth_coef: float = 0.04
    delta: float = 2.0
    root: float = 2.0
    floor: float = 1e-12
    trainable: bool = True
    per_channel_smooth_coef: bool = True

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha",
            lambda key, s: jnp.full(s, self.alpha, jnp.float32),
            (self.input_size,),
        )
        delta = self.param(
            "delta",
            lambda key, s: jnp.full(s, self.delta, jnp.float32),
            (self.input_size,),
        )
        root = self.param(
            "root",
            lambda key, s: jnp.full(s, self.root, jnp.float32),
            (self.input_size,),
        )
        ema = ExponentialMovingAverage(
            input_size=self.input_size,
            coeff_init=self.smooth_coef,
            per_channel=self.per_channel_smooth_coef,
            trainable=self.trainable,
        )
        alpha = jnp.minimum(alpha, 1.0).astype(x.dtype)
        root = jnp.maximum(root, 1.0).astype(x.dtype)
        delta = delta.astype(x.dtype)
        ema_smoother = ema(x)
        one_over_root = 1.0 / root
        out = (
            x / (self.floor + ema_smoother) ** alpha + delta
        ) ** one_over_root - delta ** one_over_root
        return out


class InstanceNorm2d(nn.Module):
    """Per-example normalization of (batch, time, ch1, ch2) over the
    (time, ch1) axes, per ch2 channel (reference
    ``nnet/normalization.py:297``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> norm = InstanceNorm2d()
    >>> x = jnp.ones((10, 20, 4, 2))
    >>> v = norm.init(jax.random.PRNGKey(0), x)
    >>> norm.apply(v, x).shape
    (10, 20, 4, 2)
    """

    eps: float = 1e-5
    affine: bool = False

    @nn.compact
    def __call__(self, x, train=True):
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param(
                "scale", nn.initializers.ones, (x.shape[-1],)
            )
            bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
            y = y * scale + bias
        return y
