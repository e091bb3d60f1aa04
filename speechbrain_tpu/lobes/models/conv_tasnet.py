"""Conv-TasNet source separation (encoder/masker/decoder).

Parity target: reference ``lobes/models/conv_tasnet.py`` (MaskNet :173).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import Conv1d, ConvTranspose1d

__all__ = ["Encoder", "Decoder", "TemporalBlock", "MaskNet", "ConvTasNet"]


class Encoder(nn.Module):
    """Waveform -> latent frames via strided conv."""

    L: int = 16  # kernel
    N: int = 512  # latent channels

    @nn.compact
    def __call__(self, x):
        if x.ndim == 2:
            x = x[..., None]
        return jax.nn.relu(
            Conv1d(
                out_channels=self.N,
                kernel_size=self.L,
                stride=self.L // 2,
                padding="valid",
                bias=False,
            )(x)
        )


class Decoder(nn.Module):
    """Latent frames -> waveform via transposed conv."""

    L: int = 16
    N: int = 512

    @nn.compact
    def __call__(self, x):
        y = ConvTranspose1d(
            out_channels=1,
            kernel_size=self.L,
            stride=self.L // 2,
            bias=False,
        )(x)
        return y[..., 0]


class TemporalBlock(nn.Module):
    """1x1 conv -> PReLU -> norm -> depthwise dilated conv -> 1x1."""

    out_channels: int
    hid_channels: int
    kernel_size: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        residual = x
        y = Conv1d(out_channels=self.hid_channels, kernel_size=1)(x)
        y = nn.PReLU()(y)
        y = nn.LayerNorm(dtype=y.dtype)(y)
        y = Conv1d(
            out_channels=self.hid_channels,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
            groups=self.hid_channels,
        )(y)
        y = nn.PReLU()(y)
        y = nn.LayerNorm(dtype=y.dtype)(y)
        y = Conv1d(out_channels=self.out_channels, kernel_size=1)(y)
        return y + residual


class MaskNet(nn.Module):
    """TCN mask estimation: X blocks x R repeats of dilated conv stacks.

    Returns masks (n_src, batch, time, N).
    """

    N: int = 512
    B: int = 128
    H: int = 512
    P: int = 3
    X: int = 8
    R: int = 3
    C: int = 2
    norm_type: str = "gLN"
    causal: bool = False
    mask_nonlinear: str = "relu"

    @nn.compact
    def __call__(self, mixture_w):
        y = nn.LayerNorm(dtype=mixture_w.dtype)(mixture_w)
        y = Conv1d(out_channels=self.B, kernel_size=1)(y)
        for r in range(self.R):
            for x in range(self.X):
                y = TemporalBlock(
                    out_channels=self.B,
                    hid_channels=self.H,
                    kernel_size=self.P,
                    dilation=2 ** x,
                    name=f"tcn_{r}_{x}",
                )(y)
        score = Conv1d(
            out_channels=self.C * self.N, kernel_size=1
        )(y)
        b, t, _ = score.shape
        score = score.reshape(b, t, self.C, self.N)
        score = jnp.moveaxis(score, 2, 0)  # (C, B, T, N)
        if self.mask_nonlinear == "softmax":
            return jax.nn.softmax(score, axis=0)
        return jax.nn.relu(score)


class ConvTasNet(nn.Module):
    """Full encoder-masker-decoder separation model.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> model = ConvTasNet(N=16, B=8, H=16, X=2, R=1, C=2, L=8)
    >>> x = jnp.ones((1, 256))
    >>> v = model.init(jax.random.PRNGKey(0), x)
    >>> model.apply(v, x).shape
    (1, 256, 2)
    """

    N: int = 512
    B: int = 128
    H: int = 512
    P: int = 3
    X: int = 8
    R: int = 3
    C: int = 2
    L: int = 16

    @nn.compact
    def __call__(self, mixture):
        T_orig = mixture.shape[1]
        w = Encoder(L=self.L, N=self.N)(mixture)
        masks = MaskNet(
            N=self.N, B=self.B, H=self.H, P=self.P,
            X=self.X, R=self.R, C=self.C,
        )(w)
        decoder = Decoder(L=self.L, N=self.N)
        outs = []
        for c in range(self.C):
            y = decoder(w * masks[c])
            if y.shape[1] >= T_orig:
                y = y[:, :T_orig]
            else:
                y = jnp.pad(y, ((0, 0), (0, T_orig - y.shape[1])))
            outs.append(y)
        return jnp.stack(outs, axis=-1)


class ChannelwiseLayerNorm(nn.Module):
    """Channel-wise layer norm (cLN): normalize over the channel axis
    per time step (reference ``lobes/models/conv_tasnet.py:514``;
    channels-last here).  ``channel_size`` is accepted for reference
    API compatibility (the shape is inferred).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> norm = ChannelwiseLayerNorm()
    >>> x = jnp.ones((2, 20, 8))
    >>> v = norm.init(jax.random.PRNGKey(0), x)
    >>> norm.apply(v, x).shape
    (2, 20, 8)
    """

    channel_size: int | None = None
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        mean = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        gamma = self.param("gamma", nn.initializers.ones, (x.shape[-1],))
        beta = self.param("beta", nn.initializers.zeros, (x.shape[-1],))
        return (
            gamma * (x - mean) / jnp.sqrt(var + self.eps) + beta
        )


class GlobalLayerNorm(nn.Module):
    """Global layer norm (gLN): normalize over time AND channels
    (reference ``lobes/models/conv_tasnet.py:555``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> norm = GlobalLayerNorm()
    >>> x = jnp.ones((2, 20, 8))
    >>> v = norm.init(jax.random.PRNGKey(0), x)
    >>> norm.apply(v, x).shape
    (2, 20, 8)
    """

    channel_size: int | None = None
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = ((x - mean) ** 2).mean(axis=(1, 2), keepdims=True)
        gamma = self.param("gamma", nn.initializers.ones, (x.shape[-1],))
        beta = self.param("beta", nn.initializers.zeros, (x.shape[-1],))
        return gamma * (x - mean) / jnp.sqrt(var + self.eps) + beta


def choose_norm(norm_type, channel_size=None):
    """Return the normalization module for ``norm_type`` ∈
    {"gLN", "cLN", "ln"} (reference
    ``lobes/models/conv_tasnet.py:490``)."""
    if norm_type == "gLN":
        return GlobalLayerNorm()
    if norm_type == "cLN":
        return ChannelwiseLayerNorm()
    return nn.LayerNorm()


class Chomp1d(nn.Module):
    """Remove trailing frames added by causal padding (reference
    ``lobes/models/conv_tasnet.py``, channels-last).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> Chomp1d(chomp_size=3)(jnp.ones((2, 23, 8))).shape
    (2, 20, 8)
    """

    chomp_size: int

    def __call__(self, x):
        return x[:, : x.shape[1] - self.chomp_size]


class DepthwiseSeparableConv(nn.Module):
    """Depthwise + pointwise conv with norm and PReLU-style activation
    (reference ``lobes/models/conv_tasnet.py``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> conv = DepthwiseSeparableConv(out_channels=8, kernel_size=3)
    >>> x = jnp.ones((2, 20, 16))
    >>> v = conv.init(jax.random.PRNGKey(0), x)
    >>> conv.apply(v, x).shape
    (2, 20, 8)
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    causal: bool = False
    norm_type: str = "gLN"

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        y = Conv1d(
            out_channels=in_ch,
            kernel_size=self.kernel_size,
            stride=self.stride,
            dilation=self.dilation,
            padding="causal" if self.causal else "same",
            groups=in_ch,
            name="depthwise",
        )(x)
        y = jax.nn.leaky_relu(y, 0.01)
        y = choose_norm(self.norm_type)(y)
        y = Conv1d(
            out_channels=self.out_channels, kernel_size=1,
            name="pointwise",
        )(y)
        return y


class TemporalBlocksSequential(nn.Module):
    """Stack of dilated TemporalBlocks: R repeats × X layers with
    exponentially growing dilation (reference
    ``lobes/models/conv_tasnet.py``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> seq = TemporalBlocksSequential(H=16, P=3, R=1, X=2)
    >>> x = jnp.ones((2, 40, 8))
    >>> v = seq.init(jax.random.PRNGKey(0), x, train=False)
    >>> seq.apply(v, x, train=False).shape
    (2, 40, 8)
    """

    H: int
    P: int
    R: int
    X: int
    norm_type: str = "gLN"
    causal: bool = False

    @nn.compact
    def __call__(self, x, train=True):
        del train  # interface compatibility
        for r in range(self.R):
            for i in range(self.X):
                x = TemporalBlock(
                    out_channels=x.shape[-1],
                    hid_channels=self.H,
                    kernel_size=self.P,
                    dilation=2**i,
                    name=f"block_{r}_{i}",
                )(x)
        return x
