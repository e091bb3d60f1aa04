"""ResNet-style spectral-mask enhancement model.

Parity target: reference ``lobes/models/EnhanceResnet.py``.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.normalization import BatchNorm1d

__all__ = ["EnhanceResnet", "ResBlock"]


class SEblock(nn.Module):
    """Channel squeeze-excitation."""

    channels: int

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2))
        s = jax.nn.relu(nn.Dense(self.channels, dtype=x.dtype)(s))
        s = jax.nn.sigmoid(nn.Dense(self.channels, dtype=x.dtype)(s))
        return x * s[:, None, None, :]


class ResBlock(nn.Module):
    """Conv-BN-GELU x2 + SE + residual, with optional downsample."""

    channels: int
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train=True):
        stride = (2, 2) if self.downsample else (1, 1)
        residual = x
        y = nn.Conv(
            features=self.channels, kernel_size=(3, 3), strides=stride,
            dtype=x.dtype,
        )(x)
        y = BatchNorm1d()(y, train=train)
        y = jax.nn.gelu(y)
        y = nn.Conv(features=self.channels, kernel_size=(3, 3), dtype=x.dtype)(y)
        y = BatchNorm1d()(y, train=train)
        y = jax.nn.gelu(y)
        y = SEblock(channels=self.channels)(y)
        if self.downsample or residual.shape[-1] != self.channels:
            residual = nn.Conv(
                features=self.channels, kernel_size=(1, 1), strides=stride,
                dtype=x.dtype,
            )(residual)
        return y + residual


class EnhanceResnet(nn.Module):
    """Spectral masking enhancement: conv resnet -> sigmoid mask.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = EnhanceResnet(channel_counts=(8, 8), dense_count=1,
    ...                     dense_nodes=32)
    >>> x = jnp.ones((2, 20, 256))
    >>> v = net.init(jax.random.PRNGKey(0), x, train=False)
    >>> net.apply(v, x, train=False).shape
    (2, 20, 256)
    """

    channel_counts: tuple = (128, 128, 256, 256, 512, 512)
    dense_count: int = 2
    dense_nodes: int = 1024
    dropout: float = 0.1
    mask_weight: float = 0.99

    @nn.compact
    def __call__(self, x, lengths=None, train=True):
        n_freq = x.shape[-1]
        feats = x[..., None]
        for i, ch in enumerate(self.channel_counts):
            feats = ResBlock(
                channels=ch, downsample=True, name=f"block_{i}"
            )(feats, train=train)
        b, t, f, c = feats.shape
        out = feats.reshape(b, t, f * c)
        for _ in range(self.dense_count):
            out = nn.Dense(self.dense_nodes, dtype=out.dtype)(out)
            out = jax.nn.gelu(out)
            out = nn.Dropout(rate=self.dropout, deterministic=not train)(out)
        # Upsample time back via repetition to input frames
        reps = -(-x.shape[1] // out.shape[1])
        out = jnp.repeat(out, reps, axis=1)[:, : x.shape[1]]
        mask = jax.nn.sigmoid(nn.Dense(n_freq, dtype=out.dtype)(out))
        return self.mask_weight * mask * x + (1 - self.mask_weight) * x


class ConvBlock(nn.Module):
    """Conv + norm + gated activation block (reference
    ``lobes/models/EnhanceResnet.py`` ConvBlock).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> blk = ConvBlock(channels=8)
    >>> x = jnp.ones((2, 20, 16, 4))
    >>> v = blk.init(jax.random.PRNGKey(0), x, train=False)
    >>> blk.apply(v, x, train=False).shape
    (2, 20, 8, 8)
    """

    channels: int
    kernel_size: tuple = (3, 3)

    @nn.compact
    def __call__(self, x, train=True):
        y = nn.Conv(
            features=self.channels,
            kernel_size=self.kernel_size,
            strides=(1, 2),
            padding="SAME",
            dtype=x.dtype,
        )(x)
        y = nn.LayerNorm(dtype=y.dtype)(y)
        y = jax.nn.leaky_relu(y, 0.2)
        y = ResBlock(channels=self.channels, name="res")(y, train=train)
        return y
