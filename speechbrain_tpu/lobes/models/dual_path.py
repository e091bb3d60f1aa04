"""Dual-path separation models: DPRNN and SepFormer.

Chunked intra/inter processing over latent frames.  Parity targets:
reference ``lobes/models/dual_path.py:893`` (Dual_Path_Model), ``:1154``
(SepformerWrapper), SBTransformerBlock.
"""

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.lobes.models.transformer.Transformer import (
    PositionalEncoding,
    TransformerEncoder,
)
from speechbrain_tpu.nnet.CNN import Conv1d, ConvTranspose1d
from speechbrain_tpu.nnet.RNN import LSTM

__all__ = [
    "Encoder",
    "Decoder",
    "SBTransformerBlock",
    "SBRNNBlock",
    "Dual_Path_Model",
    "SepformerWrapper",
]


class Encoder(nn.Module):
    """Waveform -> latent (B, T', N)."""

    kernel_size: int = 16
    out_channels: int = 256

    @nn.compact
    def __call__(self, x):
        if x.ndim == 2:
            x = x[..., None]
        return jax.nn.relu(
            Conv1d(
                out_channels=self.out_channels,
                kernel_size=self.kernel_size,
                stride=self.kernel_size // 2,
                padding="valid",
                bias=False,
            )(x)
        )


class Decoder(nn.Module):
    """Latent -> waveform."""

    kernel_size: int = 16
    in_channels: int = 256

    @nn.compact
    def __call__(self, x):
        y = ConvTranspose1d(
            out_channels=1,
            kernel_size=self.kernel_size,
            stride=self.kernel_size // 2,
            bias=False,
        )(x)
        return y[..., 0]


class SBTransformerBlock(nn.Module):
    """Transformer encoder block for intra/inter processing."""

    num_layers: int = 2
    d_model: int = 256
    nhead: int = 8
    d_ffn: int = 1024
    dropout: float = 0.0
    use_positional_encoding: bool = True

    @nn.compact
    def __call__(self, x, train=True):
        if self.use_positional_encoding:
            x = x + PositionalEncoding(input_size=self.d_model)(x)
        out, _ = TransformerEncoder(
            num_layers=self.num_layers,
            nhead=self.nhead,
            d_ffn=self.d_ffn,
            d_model=self.d_model,
            dropout=self.dropout,
            normalize_before=True,
        )(x, train=train)
        return out


class SBRNNBlock(nn.Module):
    """BiLSTM block for DPRNN."""

    hidden_channels: int = 128
    num_layers: int = 1

    @nn.compact
    def __call__(self, x, train=True):
        out, _ = LSTM(
            hidden_size=self.hidden_channels,
            num_layers=self.num_layers,
            bidirectional=True,
        )(x, train=train)
        return out


class Dual_Path_Model(nn.Module):
    """Chunk -> intra-chunk model -> inter-chunk model -> masks.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> model = Dual_Path_Model(
    ...     in_channels=16, out_channels=16, num_layers=1, K=10,
    ...     num_spks=2, intra_numlayers=1, inter_numlayers=1,
    ...     intra_nhead=4, inter_nhead=4, intra_dffn=32, inter_dffn=32)
    >>> x = jnp.ones((1, 50, 16))
    >>> v = model.init(jax.random.PRNGKey(0), x, train=False)
    >>> model.apply(v, x, train=False).shape
    (2, 1, 50, 16)
    """

    in_channels: int = 256
    out_channels: int = 256
    num_layers: int = 2
    K: int = 250
    num_spks: int = 2
    intra_numlayers: int = 2
    inter_numlayers: int = 2
    intra_nhead: int = 8
    inter_nhead: int = 8
    intra_dffn: int = 1024
    inter_dffn: int = 1024
    use_rnn: bool = False

    @nn.compact
    def __call__(self, x, train=True):
        B, T, N = x.shape
        x = nn.LayerNorm(dtype=x.dtype)(x)
        x = Conv1d(out_channels=self.out_channels, kernel_size=1, bias=False)(x)
        K = self.K
        # Chunk with 50% overlap: pad then fold into (B, S, K, N)
        P = K // 2
        gap = K - (P + T % K) % K
        pad_total = gap + 2 * P
        xp = jnp.pad(x, ((0, 0), (P, gap + P), (0, 0)))
        Tp = xp.shape[1]
        S = (Tp - K) // P + 1
        starts = jnp.arange(S) * P
        idx = starts[:, None] + jnp.arange(K)[None, :]
        chunks = xp[:, idx, :]  # (B, S, K, N)
        for layer in range(self.num_layers):
            # Intra: over K within each chunk
            intra_in = chunks.reshape(B * S, K, self.out_channels)
            if self.use_rnn:
                intra = SBRNNBlock(
                    hidden_channels=self.out_channels // 2,
                    name=f"intra_{layer}",
                )(intra_in, train=train)
            else:
                intra = SBTransformerBlock(
                    num_layers=self.intra_numlayers,
                    d_model=self.out_channels,
                    nhead=self.intra_nhead,
                    d_ffn=self.intra_dffn,
                    name=f"intra_{layer}",
                )(intra_in, train=train)
            intra = nn.LayerNorm(dtype=intra.dtype)(intra)
            chunks = chunks + intra.reshape(B, S, K, self.out_channels)
            # Inter: over S across chunks
            inter_in = jnp.swapaxes(chunks, 1, 2).reshape(
                B * K, S, self.out_channels
            )
            if self.use_rnn:
                inter = SBRNNBlock(
                    hidden_channels=self.out_channels // 2,
                    name=f"inter_{layer}",
                )(inter_in, train=train)
            else:
                inter = SBTransformerBlock(
                    num_layers=self.inter_numlayers,
                    d_model=self.out_channels,
                    nhead=self.inter_nhead,
                    d_ffn=self.inter_dffn,
                    name=f"inter_{layer}",
                )(inter_in, train=train)
            inter = nn.LayerNorm(dtype=inter.dtype)(inter)
            inter = jnp.swapaxes(
                inter.reshape(B, K, S, self.out_channels), 1, 2
            )
            chunks = chunks + inter
        # Mask generation
        out = nn.PReLU()(chunks)
        out = Conv1d(
            out_channels=self.out_channels * self.num_spks, kernel_size=1
        )(out.reshape(B, S * K, self.out_channels)).reshape(
            B, S, K, self.out_channels * self.num_spks
        )
        # Overlap-add chunks back to time
        out = out.reshape(B, S, K, self.num_spks, self.out_channels)
        ola = jnp.zeros(
            (B, Tp, self.num_spks, self.out_channels), out.dtype
        )
        flat_idx = idx.reshape(-1)
        ola = ola.at[:, flat_idx].add(
            out.reshape(B, S * K, self.num_spks, self.out_channels)
        )
        counts = jnp.zeros((Tp,)).at[flat_idx].add(1.0)
        ola = ola / jnp.maximum(counts[None, :, None, None], 1.0)
        masks = ola[:, P : P + T]  # (B, T, spks, N)
        masks = jax.nn.relu(masks)
        return jnp.moveaxis(masks, 2, 0)  # (spks, B, T, N)


class SepformerWrapper(nn.Module):
    """Encoder + dual-path masker + decoder (the SepFormer).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> model = SepformerWrapper(
    ...     encoder_out_nchannels=16, masknet_chunksize=10,
    ...     masknet_numlayers=1, intra_numlayers=1, inter_numlayers=1,
    ...     intra_nhead=4, inter_nhead=4, intra_dffn=32, inter_dffn=32,
    ...     encoder_kernel_size=8)
    >>> x = jnp.ones((1, 400))
    >>> v = model.init(jax.random.PRNGKey(0), x, train=False)
    >>> model.apply(v, x, train=False).shape
    (1, 400, 2)
    """

    encoder_kernel_size: int = 16
    encoder_in_nchannels: int = 1
    encoder_out_nchannels: int = 256
    masknet_chunksize: int = 250
    masknet_numlayers: int = 2
    masknet_numspks: int = 2
    intra_numlayers: int = 8
    inter_numlayers: int = 8
    intra_nhead: int = 8
    inter_nhead: int = 8
    intra_dffn: int = 1024
    inter_dffn: int = 1024
    use_rnn: bool = False

    @nn.compact
    def __call__(self, mix, train=True):
        T_orig = mix.shape[1]
        w = Encoder(
            kernel_size=self.encoder_kernel_size,
            out_channels=self.encoder_out_nchannels,
        )(mix)
        masks = Dual_Path_Model(
            in_channels=self.encoder_out_nchannels,
            out_channels=self.encoder_out_nchannels,
            num_layers=self.masknet_numlayers,
            K=self.masknet_chunksize,
            num_spks=self.masknet_numspks,
            intra_numlayers=self.intra_numlayers,
            inter_numlayers=self.inter_numlayers,
            intra_nhead=self.intra_nhead,
            inter_nhead=self.inter_nhead,
            intra_dffn=self.intra_dffn,
            inter_dffn=self.inter_dffn,
            use_rnn=self.use_rnn,
        )(w, train=train)
        decoder = Decoder(
            kernel_size=self.encoder_kernel_size,
            in_channels=self.encoder_out_nchannels,
        )
        outs = []
        for s in range(self.masknet_numspks):
            y = decoder(w * masks[s])
            if y.shape[1] >= T_orig:
                y = y[:, :T_orig]
            else:
                y = jnp.pad(y, ((0, 0), (0, T_orig - y.shape[1])))
            outs.append(y)
        return jnp.stack(outs, axis=-1)


class GlobalLayerNorm(nn.Module):
    """Global layer norm over (time, channels) with learnable per-
    channel affine (reference ``lobes/models/dual_path.py:28``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> norm = GlobalLayerNorm()
    >>> x = jnp.ones((2, 20, 8))
    >>> v = norm.init(jax.random.PRNGKey(0), x)
    >>> norm.apply(v, x).shape
    (2, 20, 8)
    """

    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        mean = x.mean(axis=tuple(range(1, x.ndim)), keepdims=True)
        var = ((x - mean) ** 2).mean(
            axis=tuple(range(1, x.ndim)), keepdims=True
        )
        gamma = self.param("gamma", nn.initializers.ones, (x.shape[-1],))
        beta = self.param("beta", nn.initializers.zeros, (x.shape[-1],))
        return gamma * (x - mean) / jnp.sqrt(var + self.eps) + beta


class CumulativeLayerNorm(nn.Module):
    """Cumulative (streaming-friendly) layer norm: at each step,
    normalize by the statistics of everything seen so far (reference
    ``lobes/models/dual_path.py:102``; implemented with cumulative
    sums, channels-last).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> norm = CumulativeLayerNorm()
    >>> x = jnp.ones((2, 20, 8))
    >>> v = norm.init(jax.random.PRNGKey(0), x)
    >>> norm.apply(v, x).shape
    (2, 20, 8)
    """

    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape[0], x.shape[1], x.shape[-1]
        flat = x.reshape(B, T, -1)
        n = flat.shape[-1]
        step_sum = flat.sum(axis=-1)  # (B, T)
        step_sq = (flat**2).sum(axis=-1)
        cum_sum = jnp.cumsum(step_sum, axis=1)
        cum_sq = jnp.cumsum(step_sq, axis=1)
        counts = jnp.arange(1, T + 1, dtype=x.dtype)[None, :] * n
        cum_mean = cum_sum / counts
        cum_var = cum_sq / counts - cum_mean**2
        cum_mean = cum_mean[..., None]
        cum_std = jnp.sqrt(jnp.maximum(cum_var, self.eps))[..., None]
        y = (flat - cum_mean) / cum_std
        gamma = self.param("gamma", nn.initializers.ones, (C,))
        beta = self.param("beta", nn.initializers.zeros, (C,))
        return y.reshape(x.shape) * gamma + beta


def select_norm(norm, dim=None, shape=None, eps=1e-8):
    """Normalization factory: "gln" | "cln" | anything-else → groupnorm-
    style layer norm (reference ``lobes/models/dual_path.py:149``)."""
    if norm == "gln":
        return GlobalLayerNorm(eps=eps)
    if norm == "cln":
        return CumulativeLayerNorm(eps=eps)
    return nn.LayerNorm(epsilon=eps)
