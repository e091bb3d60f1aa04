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
