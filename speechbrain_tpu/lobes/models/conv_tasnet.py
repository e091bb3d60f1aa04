"""Conv-TasNet source separation (encoder/masker/decoder).

Parity target: reference ``lobes/models/conv_tasnet.py`` (Encoder :13,
Decoder :62, TemporalBlocksSequential :122, MaskNet :173,
TemporalBlock :284, DepthwiseSeparableConv :375, Chomp1d :452,
choose_norm :490, ChannelwiseLayerNorm :514, GlobalLayerNorm :555).

Layout note: the reference composes ``dual_path.Encoder`` (channel-first
[M, N, K]) with ``conv_tasnet.MaskNet``; this build is channels-last
throughout — ``MaskNet`` takes (batch, time, N) and returns
(n_src, batch, time, N) — which is the same math in the TPU-native
(batch, time, channel) convention.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import Conv1d
from speechbrain_tpu.nnet.linear import Linear
from speechbrain_tpu.processing.signal_processing import overlap_and_add

__all__ = ["Encoder", "Decoder", "TemporalBlock", "MaskNet", "ConvTasNet"]

EPS = 1e-8


class Encoder(nn.Module):
    """Waveform -> latent frames via strided conv + ReLU (reference
    ``conv_tasnet.py:13``: Conv1d(N, L, stride=L//2, bias=False) with
    the library's default "same" padding).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> enc = Encoder(L=8, N=6)
    >>> x = jnp.ones((2, 64))
    >>> v = enc.init(jax.random.PRNGKey(0), x)
    >>> enc.apply(v, x).shape
    (2, 17, 6)
    """

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
                bias=False,
                name="conv1d_U",
            )(x)
        )


class Decoder(nn.Module):
    """Masked latent frames -> waveforms: per-source basis projection
    (Linear N->L, bias=False) + overlap-add with hop L//2 (reference
    ``conv_tasnet.py:62``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> dec = Decoder(L=8, N=6)
    >>> w = jnp.ones((2, 17, 6))
    >>> m = jnp.ones((2, 17, 2, 6))
    >>> v = dec.init(jax.random.PRNGKey(0), w, m)
    >>> dec.apply(v, w, m).shape
    (2, 72, 2)
    """

    L: int = 16
    N: int = 512

    @nn.compact
    def __call__(self, mixture_w, est_mask):
        # mixture_w: (M, K, N); est_mask: (M, K, C, N)
        source_w = mixture_w[:, :, None, :] * est_mask  # (M, K, C, N)
        source_w = jnp.moveaxis(source_w, 2, 1)  # (M, C, K, N)
        est_source = Linear(
            n_neurons=self.L, bias=False, name="basis_signals"
        )(source_w)  # (M, C, K, L)
        est_source = overlap_and_add(est_source, self.L // 2)  # (M, C, T)
        return jnp.moveaxis(est_source, 1, 2)  # (M, T, C)


class ChannelwiseLayerNorm(nn.Module):
    """Channel-wise layer norm (cLN): normalize over the channel axis
    per time step with biased variance and eps=1e-8 (reference
    ``conv_tasnet.py:514``; channels-last here).  ``channel_size`` is
    accepted for reference API compatibility (the shape is inferred).

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
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        mean = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        gamma = self.param("gamma", nn.initializers.ones, (x.shape[-1],))
        beta = self.param("beta", nn.initializers.zeros, (x.shape[-1],))
        return gamma * (x - mean) / jnp.sqrt(var + self.eps) + beta


class GlobalLayerNorm(nn.Module):
    """Global layer norm (gLN): normalize over time AND channels with
    biased variance and eps=1e-8 (reference ``conv_tasnet.py:555``).

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
    eps: float = EPS

    @nn.compact
    def __call__(self, x):
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = ((x - mean) ** 2).mean(axis=(1, 2), keepdims=True)
        gamma = self.param("gamma", nn.initializers.ones, (x.shape[-1],))
        beta = self.param("beta", nn.initializers.zeros, (x.shape[-1],))
        return gamma * (x - mean) / jnp.sqrt(var + self.eps) + beta


def choose_norm(norm_type, channel_size=None, name=None):
    """Return the normalization module for ``norm_type`` ∈
    {"gLN", "cLN", ...} (reference ``conv_tasnet.py:490``; the
    reference's fallback is BatchNorm1d — unused by any recipe — here a
    plain LayerNorm keeps the module stateless)."""
    if norm_type == "gLN":
        return GlobalLayerNorm(name=name)
    if norm_type == "cLN":
        return ChannelwiseLayerNorm(name=name)
    return nn.LayerNorm(name=name)


class Chomp1d(nn.Module):
    """Remove trailing frames added by causal padding (reference
    ``conv_tasnet.py:452``, channels-last).

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
    """Depthwise dilated conv -> PReLU -> norm -> pointwise 1x1, all
    bias-free (reference ``conv_tasnet.py:375``).

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
            bias=False,
            name="conv_0",
        )(x)
        y = nn.PReLU(negative_slope_init=0.25, name="act")(y)
        y = choose_norm(self.norm_type, name="norm")(y)
        y = Conv1d(
            out_channels=self.out_channels,
            kernel_size=1,
            bias=False,
            name="conv_1",
        )(y)
        return y


class TemporalBlock(nn.Module):
    """1x1 conv (bias-free) -> PReLU -> norm -> depthwise-separable
    dilated conv, with a residual connection (reference
    ``conv_tasnet.py:284``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> blk = TemporalBlock(out_channels=5, kernel_size=3, dilation=2)
    >>> x = jnp.ones((2, 20, 8))
    >>> v = blk.init(jax.random.PRNGKey(0), x)
    >>> blk.apply(v, x).shape
    (2, 20, 8)
    """

    out_channels: int  # H: hidden width of the block
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    norm_type: str = "gLN"
    causal: bool = False
    # alias kept for older call sites
    hid_channels: int | None = None

    @nn.compact
    def __call__(self, x):
        hid = (
            self.hid_channels
            if self.hid_channels is not None
            else self.out_channels
        )
        residual = x
        y = Conv1d(
            out_channels=hid, kernel_size=1, bias=False, name="conv"
        )(x)
        y = nn.PReLU(negative_slope_init=0.25, name="act")(y)
        y = choose_norm(self.norm_type, name="norm")(y)
        y = DepthwiseSeparableConv(
            out_channels=x.shape[-1],
            kernel_size=self.kernel_size,
            stride=self.stride,
            dilation=self.dilation,
            causal=self.causal,
            norm_type=self.norm_type,
            name="DSconv",
        )(y)
        return y + residual


class TemporalBlocksSequential(nn.Module):
    """Stack of dilated TemporalBlocks: R repeats × X layers with
    exponentially growing dilation (reference ``conv_tasnet.py:122``).

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
                    out_channels=self.H,
                    kernel_size=self.P,
                    stride=1,
                    dilation=2**i,
                    norm_type=self.norm_type,
                    causal=self.causal,
                    name=f"temporalblock_{r}_{i}",
                )(x)
        return x


class MaskNet(nn.Module):
    """TCN mask estimation: cLN -> bias-free bottleneck 1x1 -> R×X
    dilated temporal blocks -> bias-free mask 1x1 (reference
    ``conv_tasnet.py:173``).

    Takes latent frames (batch, time, N); returns masks
    (n_src, batch, time, N).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = MaskNet(N=6, B=4, H=5, P=3, X=2, R=1, C=2)
    >>> w = jnp.ones((2, 17, 6))
    >>> v = net.init(jax.random.PRNGKey(0), w)
    >>> net.apply(v, w).shape
    (2, 2, 17, 6)
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
        M, K, _ = mixture_w.shape
        y = ChannelwiseLayerNorm(name="layer_norm")(mixture_w)
        y = Conv1d(
            out_channels=self.B,
            kernel_size=1,
            bias=False,
            name="bottleneck_conv1x1",
        )(y)
        y = TemporalBlocksSequential(
            H=self.H,
            P=self.P,
            R=self.R,
            X=self.X,
            norm_type=self.norm_type,
            causal=self.causal,
            name="temporal_conv_net",
        )(y, train=False)
        score = Conv1d(
            out_channels=self.C * self.N,
            kernel_size=1,
            bias=False,
            name="mask_conv1x1",
        )(y)
        score = score.reshape(M, K, self.C, self.N)
        score = jnp.moveaxis(score, 2, 0)  # (C, M, K, N)
        if self.mask_nonlinear == "softmax":
            # The reference applies softmax over the channel axis N
            # (conv_tasnet.py:277, dim=2 of [C, M, N, K]); mirrored.
            return jax.nn.softmax(score, axis=-1)
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
    norm_type: str = "gLN"
    causal: bool = False
    mask_nonlinear: str = "relu"

    @nn.compact
    def __call__(self, mixture):
        T_orig = mixture.shape[1]
        w = Encoder(L=self.L, N=self.N)(mixture)
        masks = MaskNet(
            N=self.N,
            B=self.B,
            H=self.H,
            P=self.P,
            X=self.X,
            R=self.R,
            C=self.C,
            norm_type=self.norm_type,
            causal=self.causal,
            mask_nonlinear=self.mask_nonlinear,
        )(w)  # (C, M, K, N)
        est_mask = jnp.moveaxis(masks, 0, 2)  # (M, K, C, N)
        y = Decoder(L=self.L, N=self.N)(w, est_mask)  # (M, T, C)
        if y.shape[1] >= T_orig:
            y = y[:, :T_orig]
        else:
            y = jnp.pad(y, ((0, 0), (0, T_orig - y.shape[1]), (0, 0)))
        return y


class BinauralConvTasNet(nn.Module):
    """Binaural (2-ear) Conv-TasNet with the reference's three wiring
    modes (``recipes/BinauralWSJ0Mix/separation/train.py:87-159``):

    - ``independent``: per-ear encoder/masker/decoder, no interaction.
    - ``parallel``: each masker sees BOTH ears' encoder features
      (concatenated); its 2N-channel mask is chunked and applied to
      each ear's representation, summed per ear.
    - ``cross``: interaural level differences (ILD, 10*log10 of the
      ears' STFT magnitude ratio) are upsampled to the encoder frame
      rate, projected with a learned 1x1 conv and concatenated with
      each ear's features (sign-flipped for the right ear).

    Input (batch, time, 2) -> estimates (batch, time, 2, num_spks).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = BinauralConvTasNet(mode="parallel", N=16, B=8, H=16,
    ...                          X=2, R=1, C=2, L=8)
    >>> x = jnp.ones((1, 256, 2))
    >>> v = net.init(jax.random.PRNGKey(0), x)
    >>> net.apply(v, x).shape
    (1, 256, 2, 2)
    """

    mode: str = "parallel"
    N: int = 256
    B: int = 128
    H: int = 256
    P: int = 3
    X: int = 6
    R: int = 2
    C: int = 2
    L: int = 16
    norm_type: str = "gLN"
    causal: bool = False
    mask_nonlinear: str = "relu"
    sample_rate: int = 8000

    def _masknet(self, n_in, name):
        return MaskNet(
            N=n_in,
            B=self.B,
            H=self.H,
            P=self.P,
            X=self.X,
            R=self.R,
            C=self.C,
            norm_type=self.norm_type,
            causal=self.causal,
            mask_nonlinear=self.mask_nonlinear,
            name=name,
        )

    @nn.compact
    def __call__(self, mix, train=True):
        T_orig = mix.shape[1]
        xl, xr = mix[:, :, 0], mix[:, :, 1]
        enc_l = Encoder(L=self.L, N=self.N, name="encoder_l")
        enc_r = Encoder(L=self.L, N=self.N, name="encoder_r")
        dec_l = Decoder(L=self.L, N=self.N, name="decoder_l")
        dec_r = Decoder(L=self.L, N=self.N, name="decoder_r")
        wl = enc_l(xl)
        wr = enc_r(xr)
        Nc = self.N

        if self.mode == "independent":
            ml = self._masknet(Nc, "masknet_l")(wl)
            mr = self._masknet(Nc, "masknet_r")(wr)
            sep_l = wl[None] * ml  # (C, B, K, N)
            sep_r = wr[None] * mr
        elif self.mode == "parallel":
            # masker L sees (encL(left) || encR(right))
            cat_l = jnp.concatenate([wl, wr], axis=-1)
            masks_l = self._masknet(2 * Nc, "masknet_l")(cat_l)
            sep_hl1 = wl[None] * masks_l[..., :Nc]
            sep_hr2 = wr[None] * masks_l[..., Nc:]
            # masker R sees the cross pairing (encR(left) || encL(right))
            wl2 = enc_r(xl)
            wr1 = enc_l(xr)
            cat_r = jnp.concatenate([wl2, wr1], axis=-1)
            masks_r = self._masknet(2 * Nc, "masknet_r")(cat_r)
            sep_hl2 = wl2[None] * masks_r[..., :Nc]
            sep_hr1 = wr1[None] * masks_r[..., Nc:]
            sep_l = sep_hl1 + sep_hr2
            sep_r = sep_hl2 + sep_hr1
        elif self.mode == "cross":
            from speechbrain_tpu.processing.features import (
                STFT,
                spectral_magnitude,
            )

            eps = 1e-8
            stft = STFT(
                sample_rate=self.sample_rate,
                win_length=256 * 1000.0 / self.sample_rate,
                hop_length=128 * 1000.0 / self.sample_rate,
                n_fft=256,
            )
            mag_l = spectral_magnitude(stft(xl), power=0.5)
            mag_r = spectral_magnitude(stft(xr), power=0.5)
            ild = 10.0 * jnp.log10(mag_l / (mag_r + eps) + eps)
            K = wl.shape[1]
            ild = jax.image.resize(
                ild, (ild.shape[0], K, ild.shape[2]), method="linear"
            )
            ild_cat = nn.Dense(Nc, name="ild_proj")(ild)
            masks_l = self._masknet(2 * Nc, "masknet_l")(
                jnp.concatenate([wl, ild_cat], axis=-1)
            )
            masks_r = self._masknet(2 * Nc, "masknet_r")(
                jnp.concatenate([wr, -ild_cat], axis=-1)
            )
            sep_l = wl[None] * masks_l[..., :Nc]
            sep_r = wr[None] * masks_r[..., :Nc]
        else:
            raise ValueError(f"unknown binaural mode {self.mode}")

        outs = []
        for dec, sep in ((dec_l, sep_l), (dec_r, sep_r)):
            # `sep` is already the masked representation (C, B, K, N);
            # the Decoder's internal w*mask product is made a no-op by
            # passing ones as the mixture representation.
            y = dec(jnp.ones_like(wl), jnp.moveaxis(sep, 0, 2))
            outs.append(y)
        est = jnp.stack(outs, axis=2)  # (B, T', 2, C)
        if est.shape[1] >= T_orig:
            est = est[:, :T_orig]
        else:
            est = jnp.pad(
                est, ((0, 0), (0, T_orig - est.shape[1]), (0, 0), (0, 0))
            )
        return est
