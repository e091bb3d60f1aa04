"""Convolutions (channels-last) with same/causal/valid padding semantics.

Convs lower to XLA convolution ops that map onto the MXU; keep channel
counts multiples of 128 where possible for full tiling.

Parity targets: reference ``nnet/CNN.py:28`` (SincConv), ``:309,504``
(Conv1d/2d), ``:789`` (ConvTranspose1d), ``:1002,1082`` (depthwise
separable), ``:1177`` (GaborConv1d).
"""

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Conv1d",
    "Conv2d",
    "ConvTranspose1d",
    "DepthwiseSeparableConv1d",
    "SincConv",
    "GaborConv1d",
    "Conv2dWithConstraint",
    "DepthwiseSeparableConv2d",
    "get_padding_elem",
    "get_padding_elem_transposed",
]


def _pad_1d(x, kernel_size, dilation, stride, padding, padding_mode="reflect"):
    """Apply reference-exact padding to (batch, time, ch).

    "same" pads symmetrically by ``get_padding_elem`` (reference
    ``nnet/CNN.py:279,1459``: floor(d*(k-1)/2) each side for stride 1,
    floor(k/2) for stride > 1) in ``padding_mode`` — the reference
    default is REFLECT, not zeros.  "causal" zero-pads on the left.
    """
    if padding == "same":
        left, right = get_padding_elem(
            x.shape[1], stride, kernel_size, dilation
        )
        mode = "reflect" if padding_mode == "reflect" else "constant"
        return jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode=mode)
    if padding == "causal":
        left = (kernel_size - 1) * dilation
        return jnp.pad(x, ((0, 0), (left, 0), (0, 0)))
    if padding == "valid":
        return x
    raise ValueError(f"Unknown padding {padding}")


class Conv1d(nn.Module):
    """1-d convolution over (batch, time, channels).

    Arguments
    ---------
    out_channels : int
    kernel_size : int
    stride, dilation : int
    padding : "same" | "causal" | "valid"
    groups : int
    bias : bool

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> conv = Conv1d(out_channels=8, kernel_size=3)
    >>> x = jnp.ones((2, 40, 16))
    >>> p = conv.init(jax.random.PRNGKey(0), x)
    >>> conv.apply(p, x).shape
    (2, 40, 8)
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: str = "same"
    groups: int = 1
    bias: bool = True
    weight_norm: bool = False
    padding_mode: str = "reflect"

    @nn.compact
    def __call__(self, x):
        unsqueezed = x.ndim == 2
        if unsqueezed:
            x = x[..., None]
        x = _pad_1d(
            x, self.kernel_size, self.dilation, self.stride,
            self.padding, self.padding_mode,
        )
        y = nn.Conv(
            features=self.out_channels,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding="VALID",
            feature_group_count=self.groups,
            use_bias=self.bias,
            dtype=x.dtype,
        )(x)
        return y


class Conv2d(nn.Module):
    """2-d convolution over (batch, time, feature, channels).

    A 3-d input (batch, time, feature) is treated as single-channel.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> conv = Conv2d(out_channels=4, kernel_size=(3, 3))
    >>> x = jnp.ones((2, 20, 40))
    >>> p = conv.init(jax.random.PRNGKey(0), x)
    >>> conv.apply(p, x).shape
    (2, 20, 40, 4)
    """

    out_channels: int
    kernel_size: tuple = (3, 3)
    stride: tuple = (1, 1)
    dilation: tuple = (1, 1)
    padding: str = "same"
    bias: bool = True
    groups: int = 1
    padding_mode: str = "reflect"

    @nn.compact
    def __call__(self, x):
        unsqueezed = x.ndim == 3
        if unsqueezed:
            x = x[..., None]
        # Reference behavior quirk (nnet/CNN.py:419: x.transpose(1, -1)
        # puts spatial dims as (freq, time)): kernel_size[0] / stride[0]
        # / dilation[0] act on the FREQUENCY axis and index 1 on TIME —
        # despite the docstring saying "time and frequency".  Our input
        # stays (B, T, F, C), so swap when lowering to the XLA conv.
        kw, kh = self.kernel_size
        sw, sh = (
            self.stride
            if isinstance(self.stride, (tuple, list))
            else (self.stride, self.stride)
        )
        dw, dh = (
            self.dilation
            if isinstance(self.dilation, (tuple, list))
            else (self.dilation, self.dilation)
        )
        if self.padding == "same":
            x = _pad2d_same(x, kh, kw, sh, sw, dh, dw, self.padding_mode)
            pad = "VALID"
        elif self.padding == "causal":
            left = (kh - 1) * dh
            x = jnp.pad(x, ((0, 0), (left, 0), (0, 0), (0, 0)))
            pad = "VALID"
        else:
            pad = "VALID"
        y = nn.Conv(
            features=self.out_channels,
            kernel_size=(kh, kw),
            strides=(sh, sw),
            kernel_dilation=(dh, dw),
            padding=pad,
            use_bias=self.bias,
            feature_group_count=self.groups,
            dtype=x.dtype,
        )(x)
        return y


def _pad2d_same(x, kh, kw, sh, sw, dh, dw, padding_mode="reflect"):
    """Reference-exact 2d "same": symmetric get_padding_elem amounts per
    axis, reflect by default (reference ``nnet/CNN.py:658-690``)."""
    ph = get_padding_elem(x.shape[1], sh, kh, dh)
    pw = get_padding_elem(x.shape[2], sw, kw, dw)
    mode = "reflect" if padding_mode == "reflect" else "constant"
    return jnp.pad(
        x,
        (
            (0, 0),
            (ph[0], ph[1]),
            (pw[0], pw[1]),
            (0, 0),
        ),
        mode=mode,
    )


class ConvTranspose1d(nn.Module):
    """Transposed 1-d convolution (upsampling), channels-last.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> up = ConvTranspose1d(out_channels=4, kernel_size=4, stride=2, padding=1)
    >>> x = jnp.ones((1, 10, 8))
    >>> p = up.init(jax.random.PRNGKey(0), x)
    >>> up.apply(p, x).shape
    (1, 20, 4)
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        unsqueezed = x.ndim == 2
        if unsqueezed:
            x = x[..., None]
        y = nn.ConvTranspose(
            features=self.out_channels,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding="VALID",
            use_bias=self.bias,
            dtype=x.dtype,
        )(x)
        # torch semantics: out = (in-1)*stride - 2*pad + kernel + output_pad
        target = (
            (x.shape[1] - 1) * self.stride
            - 2 * self.padding
            + self.kernel_size
            + self.output_padding
        )
        start = self.padding
        y = y[:, start : start + target]
        return y


class DepthwiseSeparableConv1d(nn.Module):
    """Depthwise (per-channel) then pointwise 1x1 convolution."""

    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: str = "same"
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        y = Conv1d(
            out_channels=in_ch,
            kernel_size=self.kernel_size,
            stride=self.stride,
            dilation=self.dilation,
            padding=self.padding,
            groups=in_ch,
            bias=self.bias,
        )(x)
        y = Conv1d(out_channels=self.out_channels, kernel_size=1, bias=self.bias)(y)
        return y


class SincConv(nn.Module):
    """Parametrized sinc band-pass filters (SincNet) on raw waveforms.

    Learnable low/high cutoffs per filter; the kernel is synthesized at
    each call (cheap: (kernel, filters) elementwise) and applied as a
    regular convolution (MXU).  Reference: ``nnet/CNN.py:28``.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> conv = SincConv(out_channels=8, kernel_size=65)
    >>> x = jnp.ones((2, 1600))
    >>> p = conv.init(jax.random.PRNGKey(0), x)
    >>> conv.apply(p, x).shape
    (2, 1600, 8)
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: str = "same"
    sample_rate: int = 16000
    min_low_hz: float = 50.0
    min_band_hz: float = 50.0
    padding_mode: str = "reflect"

    @nn.compact
    def __call__(self, x):
        if self.kernel_size % 2 == 0:
            raise ValueError("SincConv kernel_size must be odd")
        unsqueezed = x.ndim == 2
        if unsqueezed:
            x = x[..., None]
        in_ch = x.shape[-1]

        def init_cutoffs(key, shape):
            low_hz = 30
            high_hz = self.sample_rate / 2 - (self.min_low_hz + self.min_band_hz)
            mel = np.linspace(
                2595 * np.log10(1 + low_hz / 700),
                2595 * np.log10(1 + high_hz / 700),
                self.out_channels + 1,
            )
            hz = 700 * (10 ** (mel / 2595) - 1)
            return jnp.asarray(hz[: self.out_channels], jnp.float32).reshape(-1, 1)

        def init_band(key, shape):
            low_hz = 30
            high_hz = self.sample_rate / 2 - (self.min_low_hz + self.min_band_hz)
            mel = np.linspace(
                2595 * np.log10(1 + low_hz / 700),
                2595 * np.log10(1 + high_hz / 700),
                self.out_channels + 1,
            )
            hz = 700 * (10 ** (mel / 2595) - 1)
            return jnp.asarray(np.diff(hz), jnp.float32).reshape(-1, 1)

        low_hz_ = self.param("low_hz_", init_cutoffs, (self.out_channels, 1))
        band_hz_ = self.param("band_hz_", init_band, (self.out_channels, 1))

        low = self.min_low_hz + jnp.abs(low_hz_)
        high = jnp.clip(
            low + self.min_band_hz + jnp.abs(band_hz_),
            self.min_low_hz,
            self.sample_rate / 2,
        )
        band = (high - low)[:, 0]
        n = (self.kernel_size - 1) / 2.0
        n_ = (
            2
            * math.pi
            * jnp.arange(-n, 0).reshape(1, -1)
            / self.sample_rate
        )
        window_ = 0.54 - 0.46 * jnp.cos(
            2 * math.pi * jnp.arange(-n, 0).reshape(1, -1) / self.kernel_size
        )
        f_times_t_low = low @ n_.reshape(1, -1)
        f_times_t_high = high @ n_.reshape(1, -1)
        band_pass_left = (
            (jnp.sin(f_times_t_high) - jnp.sin(f_times_t_low))
            / (n_ / 2)
        ) * window_
        band_pass_center = 2 * band.reshape(-1, 1)
        band_pass_right = jnp.flip(band_pass_left, axis=1)
        band_pass = jnp.concatenate(
            [band_pass_left, band_pass_center, band_pass_right], axis=1
        )
        band_pass = band_pass / (2 * band[:, None])
        filters = band_pass.T[:, None, :]  # (K, 1, out) HIO
        filters = jnp.broadcast_to(
            filters, (self.kernel_size, in_ch, self.out_channels)
        ).astype(x.dtype)
        x = _pad_1d(
            x, self.kernel_size, self.dilation, self.stride,
            self.padding, self.padding_mode,
        )
        return jax.lax.conv_general_dilated(
            x,
            filters,
            window_strides=(self.stride,),
            padding="VALID",
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )


class GaborConv1d(nn.Module):
    """Learnable Gabor filters (LEAF frontend, reference ``CNN.py:1177``).

    Each of out_channels//2 filters has learnable center freq and
    bandwidth; real and imaginary parts form channel pairs.
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: str = "same"
    sample_rate: int = 16000
    min_freq: float = 60.0
    max_freq: float | None = None
    sort_filters: bool = False
    padding_mode: str = "constant"  # reference GaborConv1d default

    @nn.compact
    def __call__(self, x):
        unsqueezed = x.ndim == 2
        if unsqueezed:
            x = x[..., None]
        n_filters = self.out_channels // 2
        max_freq = self.max_freq or self.sample_rate / 2

        def init_gabor(key, shape):
            # Mel-spaced center freqs and matched FWHM bandwidths.
            mel_lo = 2595 * np.log10(1 + self.min_freq / 700)
            mel_hi = 2595 * np.log10(1 + max_freq / 700)
            mels = np.linspace(mel_lo, mel_hi, n_filters + 2)[1:-1]
            hz = 700 * (10 ** (mels / 2595) - 1)
            eta = hz * 2 * np.pi / self.sample_rate
            # bandwidth ~ distance between neighbours
            spread = np.diff(
                700 * (10 ** (np.linspace(mel_lo, mel_hi, n_filters + 2) / 2595) - 1)
            )[:n_filters]
            sigma = self.sample_rate / (2 * np.pi * np.maximum(spread, 1.0))
            return jnp.asarray(
                np.stack([eta, sigma], axis=1), jnp.float32
            )

        kernel = self.param("gabor_params", init_gabor, (n_filters, 2))
        if self.sort_filters:
            order = jnp.argsort(kernel[:, 0])
            kernel = kernel[order]
        eta = kernel[:, 0:1]
        sigma = jnp.clip(
            kernel[:, 1:2], 4 * jnp.sqrt(2 * jnp.log(2.0)) / jnp.pi,
            self.kernel_size * jnp.sqrt(2 * jnp.log(2.0)) / jnp.pi,
        )
        t = jnp.arange(-(self.kernel_size // 2), (self.kernel_size + 1) // 2, dtype=jnp.float32)
        gauss = jnp.exp(-0.5 * (t[None, :] / sigma) ** 2) / (
            jnp.sqrt(2 * jnp.pi) * sigma
        )
        real = gauss * jnp.cos(eta * t[None, :])
        imag = gauss * jnp.sin(eta * t[None, :])
        filters = jnp.stack([real, imag], axis=1).reshape(
            self.out_channels if self.out_channels % 2 == 0 else 2 * n_filters,
            self.kernel_size,
        )
        hio = filters.T[:, None, :].astype(x.dtype)  # (K, 1, out)
        in_ch = x.shape[-1]
        hio = jnp.broadcast_to(hio, (self.kernel_size, in_ch, hio.shape[-1]))
        x = _pad_1d(
            x, self.kernel_size, 1, self.stride,
            self.padding, self.padding_mode,
        )
        return jax.lax.conv_general_dilated(
            x,
            hio,
            window_strides=(self.stride,),
            padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
        )


def get_padding_elem(L_in, stride, kernel_size, dilation):
    """Number of elements to add for zero-padding (reference
    ``nnet/CNN.py:1459``).

    Example
    -------
    >>> get_padding_elem(100, 1, 3, 1)
    [1, 1]
    """
    if stride > 1:
        return [kernel_size // 2, kernel_size // 2]
    L_out = (L_in - dilation * (kernel_size - 1) - 1) // stride + 1
    return [(L_in - L_out) // 2, (L_in - L_out) // 2]


def get_padding_elem_transposed(
    L_out, L_in, stride, kernel_size, dilation, output_padding
):
    """Required padding for a transposed convolution to reach ``L_out``
    (reference ``nnet/CNN.py:1483``).

    Example
    -------
    >>> get_padding_elem_transposed(100, 50, 2, 4, 1, 0)
    1
    """
    padding = -0.5 * (
        L_out
        - (L_in - 1) * stride
        - dilation * (kernel_size - 1)
        - output_padding
        - 1
    )
    return int(padding)


def _max_norm(kernel, max_norm, axes):
    """Project a kernel onto the L2 max-norm ball along ``axes`` (the
    functional analogue of torch's ``renorm`` applied each forward)."""
    norm = jnp.sqrt(jnp.sum(kernel**2, axis=axes, keepdims=True))
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return kernel * scale


class Conv2dWithConstraint(nn.Module):
    """2d convolution whose kernel is max-norm constrained per output
    channel (EEG models; reference ``nnet/CNN.py:723``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> conv = Conv2dWithConstraint(out_channels=5, kernel_size=(7, 3),
    ...                             max_norm=1.0)
    >>> x = jnp.ones((10, 40, 16, 8))
    >>> p = conv.init(jax.random.PRNGKey(0), x)
    >>> conv.apply(p, x).shape
    (10, 40, 16, 5)
    """

    out_channels: int
    kernel_size: tuple = (3, 3)
    stride: tuple = (1, 1)
    dilation: tuple = (1, 1)
    padding: str = "same"
    padding_mode: str = "reflect"
    bias: bool = True
    max_norm: float = 1.0

    @nn.compact
    def __call__(self, x):
        # Same axis quirk as Conv2d (reference nnet/CNN.py:633-686):
        # kernel_size[0]/stride[0]/dilation[0] act on the FREQUENCY axis.
        kw, kh = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, in_ch, self.out_channels),
        )
        kernel = _max_norm(kernel, self.max_norm, axes=(0, 1, 2))
        sw, sh = self.stride
        dw, dh = self.dilation
        if self.padding == "same":
            y = _pad2d_same(x, kh, kw, sh, sw, dh, dw, self.padding_mode)
            pad = "VALID"
        elif self.padding == "valid":
            y, pad = x, "VALID"
        else:
            raise ValueError(f"Unsupported padding {self.padding}")
        y = jax.lax.conv_general_dilated(
            y,
            kernel.astype(x.dtype),
            window_strides=(sh, sw),
            padding=pad,
            rhs_dilation=(dh, dw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.out_channels,)
            )
            y = y + b.astype(y.dtype)
        return y


class DepthwiseSeparableConv2d(nn.Module):
    """Depthwise 2d conv then pointwise 1x1 (reference
    ``nnet/CNN.py:1082``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> conv = DepthwiseSeparableConv2d(out_channels=8, kernel_size=(3, 3))
    >>> x = jnp.ones((2, 10, 12, 4))
    >>> p = conv.init(jax.random.PRNGKey(0), x)
    >>> conv.apply(p, x).shape
    (2, 10, 12, 8)
    """

    out_channels: int
    kernel_size: tuple = (3, 3)
    stride: tuple = (1, 1)
    dilation: tuple = (1, 1)
    padding: str = "same"
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        y = Conv2d(
            out_channels=in_ch,
            kernel_size=self.kernel_size,
            stride=self.stride,
            dilation=self.dilation,
            padding=self.padding,
            groups=in_ch,
            bias=self.bias,
            name="depthwise",
        )(x)
        y = Conv2d(
            out_channels=self.out_channels,
            kernel_size=(1, 1),
            bias=self.bias,
            name="pointwise",
        )(y)
        return y
