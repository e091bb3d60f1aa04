"""ECAPA-TDNN speaker embedding model.

Res2Net dilated TDNN blocks + squeeze-excitation + attentive statistics
pooling.  Parity targets: reference ``lobes/models/ECAPA_TDNN.py:32``
(TDNNBlock), ``:84`` (Res2NetBlock), ``:147`` (SEBlock), ``:198``
(AttentiveStatisticsPooling), ``:369`` (ECAPA_TDNN), ``:508``
(Classifier).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import Conv1d
from speechbrain_tpu.nnet.normalization import BatchNorm1d

__all__ = [
    "TDNNBlock",
    "Res2NetBlock",
    "SEBlock",
    "AttentiveStatisticsPooling",
    "ECAPA_TDNN",
    "Classifier",
]


class TDNNBlock(nn.Module):
    """Conv1d + ReLU + BatchNorm."""

    out_channels: int
    kernel_size: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train=True):
        x = Conv1d(
            out_channels=self.out_channels,
            kernel_size=self.kernel_size,
            dilation=self.dilation,
        )(x)
        x = jax.nn.relu(x)
        return BatchNorm1d()(x, train=train)


class Res2NetBlock(nn.Module):
    """Multi-scale residual: split channels into `scale` groups with
    hierarchical 3x3 convs."""

    out_channels: int
    scale: int = 8
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train=True):
        in_channel = x.shape[-1] // self.scale
        hidden_channel = self.out_channels // self.scale
        chunks = jnp.split(x, self.scale, axis=-1)
        outputs = []
        y_i = None
        for i, x_i in enumerate(chunks):
            if i == 0:
                y_i = x_i
            elif i == 1:
                y_i = TDNNBlock(
                    out_channels=hidden_channel,
                    kernel_size=self.kernel_size,
                    dilation=self.dilation,
                    name=f"block_{i}",
                )(x_i, train=train)
            else:
                y_i = TDNNBlock(
                    out_channels=hidden_channel,
                    kernel_size=self.kernel_size,
                    dilation=self.dilation,
                    name=f"block_{i}",
                )(x_i + y_i, train=train)
            outputs.append(y_i)
        return jnp.concatenate(outputs, axis=-1)


class SEBlock(nn.Module):
    """Squeeze-excitation channel gating with masked time average."""

    se_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x, lengths=None, train=True):
        if lengths is not None:
            T = x.shape[1]
            mask = (
                jnp.arange(T)[None, :] < (jnp.asarray(lengths) * T)[:, None]
            ).astype(x.dtype)[..., None]
            s = (x * mask).sum(axis=1, keepdims=True) / jnp.maximum(
                mask.sum(axis=1, keepdims=True), 1.0
            )
        else:
            s = x.mean(axis=1, keepdims=True)
        s = jax.nn.relu(
            Conv1d(out_channels=self.se_channels, kernel_size=1)(s)
        )
        s = jax.nn.sigmoid(
            Conv1d(out_channels=self.out_channels, kernel_size=1)(s)
        )
        return x * s


class AttentiveStatisticsPooling(nn.Module):
    """Attention-weighted mean+std pooling with global-context features."""

    attention_channels: int = 128
    global_context: bool = True
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x, lengths=None, train=True):
        B, T, C = x.shape
        if lengths is None:
            lengths = jnp.ones(B)
        mask = (
            jnp.arange(T)[None, :] < (jnp.asarray(lengths) * T)[:, None]
        ).astype(x.dtype)[..., None]

        def masked_stats(t, m):
            denom = jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)
            mean = (t * m).sum(axis=1, keepdims=True) / denom
            std = jnp.sqrt(
                ((t - mean) ** 2 * m).sum(axis=1, keepdims=True) / denom
                + self.eps
            )
            return mean, std

        if self.global_context:
            mean, std = masked_stats(x, mask)
            attn_in = jnp.concatenate(
                [
                    x,
                    jnp.broadcast_to(mean, x.shape),
                    jnp.broadcast_to(std, x.shape),
                ],
                axis=-1,
            )
        else:
            attn_in = x
        attn = TDNNBlock(
            out_channels=self.attention_channels, kernel_size=1
        )(attn_in, train=train)
        attn = jnp.tanh(attn)
        attn = Conv1d(out_channels=C, kernel_size=1)(attn)
        attn = jnp.where(mask > 0, attn, -1e20)
        attn = jax.nn.softmax(attn, axis=1)
        mean = (attn * x).sum(axis=1)
        std = jnp.sqrt(
            (attn * (x - mean[:, None, :]) ** 2).sum(axis=1) + self.eps
        )
        return jnp.concatenate([mean, std], axis=-1)[:, None, :]


class ECAPA_TDNN(nn.Module):
    """Full ECAPA-TDNN embedding extractor.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> model = ECAPA_TDNN(channels=(64, 64, 64, 64, 192),
    ...                    lin_neurons=48)
    >>> x = jnp.ones((2, 60, 40))
    >>> v = model.init(jax.random.PRNGKey(0), x, train=False)
    >>> model.apply(v, x, train=False).shape
    (2, 1, 48)
    """

    lin_neurons: int = 192
    channels: tuple = (512, 512, 512, 512, 1536)
    kernel_sizes: tuple = (5, 3, 3, 3, 1)
    dilations: tuple = (1, 2, 3, 4, 1)
    attention_channels: int = 128
    res2net_scale: int = 8
    se_channels: int = 128
    global_context: bool = True

    @nn.compact
    def __call__(self, x, lengths=None, train=True):
        xl = []
        x = TDNNBlock(
            out_channels=self.channels[0],
            kernel_size=self.kernel_sizes[0],
            dilation=self.dilations[0],
            name="block_0",
        )(x, train=train)
        xl.append(x)
        for i in range(1, len(self.channels) - 1):
            residual = x
            y = TDNNBlock(
                out_channels=self.channels[i],
                kernel_size=1,
                dilation=1,
                name=f"serez_{i}_in",
            )(x, train=train)
            y = Res2NetBlock(
                out_channels=self.channels[i],
                scale=self.res2net_scale,
                kernel_size=self.kernel_sizes[i],
                dilation=self.dilations[i],
                name=f"serez_{i}_res2",
            )(y, train=train)
            y = TDNNBlock(
                out_channels=self.channels[i],
                kernel_size=1,
                dilation=1,
                name=f"serez_{i}_out",
            )(y, train=train)
            y = SEBlock(
                se_channels=self.se_channels,
                out_channels=self.channels[i],
                name=f"serez_{i}_se",
            )(y, lengths=lengths, train=train)
            x = y + residual
            xl.append(x)
        # Multi-layer feature aggregation
        x = jnp.concatenate(xl[1:], axis=-1)
        x = TDNNBlock(
            out_channels=self.channels[-1],
            kernel_size=self.kernel_sizes[-1],
            dilation=self.dilations[-1],
            name="mfa",
        )(x, train=train)
        x = AttentiveStatisticsPooling(
            attention_channels=self.attention_channels,
            global_context=self.global_context,
            name="asp",
        )(x, lengths=lengths, train=train)
        x = BatchNorm1d(name="asp_bn")(x, train=train)
        x = Conv1d(out_channels=self.lin_neurons, kernel_size=1, name="fc")(x)
        return x


class Classifier(nn.Module):
    """Cosine-similarity classifier head for AAM-softmax training.

    Reference ``ECAPA_TDNN.py:508``.
    """

    out_neurons: int
    lin_blocks: int = 0
    lin_neurons: int = 192

    @nn.compact
    def __call__(self, x, train=True):
        if x.ndim == 3:
            x = x[:, 0, :]
        for i in range(self.lin_blocks):
            x = nn.Dense(self.lin_neurons, dtype=x.dtype)(x)
            x = BatchNorm1d()(x, train=train)
        w = self.param(
            "weight",
            nn.initializers.lecun_normal(),
            (self.lin_neurons, self.out_neurons),
        ).astype(x.dtype)
        x_norm = x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8
        )
        w_norm = w / jnp.maximum(
            jnp.linalg.norm(w, axis=0, keepdims=True), 1e-8
        )
        return (x_norm @ w_norm)[:, None, :]


class SERes2NetBlock(nn.Module):
    """TDNN → Res2Net → TDNN → SE with residual shortcut (reference
    ``lobes/models/ECAPA_TDNN.py:285``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> blk = SERes2NetBlock(out_channels=64, res2net_scale=4)
    >>> x = jnp.ones((8, 120, 64))
    >>> v = blk.init(jax.random.PRNGKey(0), x, train=False)
    >>> blk.apply(v, x, train=False).shape
    (8, 120, 64)
    """

    out_channels: int
    res2net_scale: int = 8
    se_channels: int = 128
    kernel_size: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, lengths=None, train=True):
        residual = x
        if x.shape[-1] != self.out_channels:
            residual = nn.Conv(
                features=self.out_channels, kernel_size=(1,),
                dtype=x.dtype, name="shortcut",
            )(x)
        y = TDNNBlock(
            out_channels=self.out_channels, kernel_size=1, dilation=1,
            name="tdnn1",
        )(x, train=train)
        y = Res2NetBlock(
            out_channels=self.out_channels, scale=self.res2net_scale,
            kernel_size=self.kernel_size, dilation=self.dilation,
            name="res2net",
        )(y, train=train)
        y = TDNNBlock(
            out_channels=self.out_channels, kernel_size=1, dilation=1,
            name="tdnn2",
        )(y, train=train)
        y = SEBlock(
            se_channels=self.se_channels,
            out_channels=self.out_channels,
            name="se",
        )(y, lengths=lengths)
        return y + residual
