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
    # block family for intra/inter models: "transformer" (SepFormer),
    # "rnn" (DPRNN), or "conformer" (reference
    # sepformer-conformerintra.yaml, SBConformerEncoderBlock)
    intra_block: str = "transformer"
    inter_block: str = "transformer"
    conformer_kernel_size: int = 31

    def _block(self, kind, numlayers, nhead, dffn, name):
        if kind == "rnn":
            return SBRNNBlock(
                hidden_channels=self.out_channels // 2, name=name
            )
        if kind == "conformer":
            return SBConformerEncoderBlock(
                num_layers=numlayers,
                d_model=self.out_channels,
                nhead=nhead,
                d_ffn=dffn,
                kernel_size=self.conformer_kernel_size,
                name=name,
            )
        return SBTransformerBlock(
            num_layers=numlayers,
            d_model=self.out_channels,
            nhead=nhead,
            d_ffn=dffn,
            name=name,
        )

    @nn.compact
    def __call__(self, x, train=True):
        intra_kind = "rnn" if self.use_rnn else self.intra_block
        inter_kind = "rnn" if self.use_rnn else self.inter_block
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
            intra = self._block(
                intra_kind, self.intra_numlayers, self.intra_nhead,
                self.intra_dffn, f"intra_{layer}",
            )(intra_in, train=train)
            intra = nn.LayerNorm(dtype=intra.dtype)(intra)
            chunks = chunks + intra.reshape(B, S, K, self.out_channels)
            # Inter: over S across chunks
            inter_in = jnp.swapaxes(chunks, 1, 2).reshape(
                B * K, S, self.out_channels
            )
            inter = self._block(
                inter_kind, self.inter_numlayers, self.inter_nhead,
                self.inter_dffn, f"inter_{layer}",
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
    intra_block: str = "transformer"
    inter_block: str = "transformer"
    conformer_kernel_size: int = 31

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
            intra_block=self.intra_block,
            inter_block=self.inter_block,
            conformer_kernel_size=self.conformer_kernel_size,
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
    """Per-step channel layer norm.  Despite its name, the reference's
    CumulativeLayerNorm subclasses torch.nn.LayerNorm and normalizes
    each frame over the CHANNEL dim only — nothing is cumulative
    (``lobes/models/dual_path.py:102-148``: permute, super().forward,
    permute back).  Replicated exactly, channels-last.

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
        return nn.LayerNorm(epsilon=self.eps, dtype=x.dtype)(x)


def select_norm(norm, dim=None, shape=None, eps=1e-8):
    """Normalization factory: "gln" | "cln" | anything-else → groupnorm-
    style layer norm (reference ``lobes/models/dual_path.py:149``)."""
    if norm == "gln":
        return GlobalLayerNorm(eps=eps)
    if norm == "cln":
        return CumulativeLayerNorm(eps=eps)
    return nn.LayerNorm(epsilon=eps)


class IdentityBlock:
    """Identity intra/inter model (reference
    ``lobes/models/dual_path.py`` IdentityBlock).

    Example
    -------
    >>> IdentityBlock()([1, 2, 3])
    [1, 2, 3]
    """

    def __init__(self, **kwargs):
        del kwargs

    def __call__(self, x, *args, **kwargs):
        return x


class PyTorchPositionalEncoding(nn.Module):
    """Sinusoidal positional encoding added with dropout — the
    "torch tutorial" variant used by PytorchTransformerBlock
    (reference ``lobes/models/dual_path.py``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> pe = PyTorchPositionalEncoding(d_model=16)
    >>> x = jnp.ones((2, 10, 16))
    >>> v = pe.init(jax.random.PRNGKey(0), x, train=False)
    >>> pe.apply(v, x, train=False).shape
    (2, 10, 16)
    """

    d_model: int
    dropout: float = 0.1
    max_len: int = 5000

    @nn.compact
    def __call__(self, x, train=True):
        import math as _math

        T = x.shape[1]
        pos = jnp.arange(T, dtype=jnp.float32)[:, None]
        div = jnp.exp(
            jnp.arange(0, self.d_model, 2, dtype=jnp.float32)
            * (-_math.log(10000.0) / self.d_model)
        )
        pe = jnp.zeros((T, self.d_model))
        pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
        pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
        y = x + pe[None].astype(x.dtype)
        return nn.Dropout(
            rate=self.dropout, deterministic=not train
        )(y)


class PytorchTransformerBlock(nn.Module):
    """Vanilla (norm-after) transformer encoder stack as a dual-path
    intra/inter model (reference ``lobes/models/dual_path.py``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> blk = PytorchTransformerBlock(out_channels=16, num_layers=1,
    ...                               nhead=4, d_ffn=32)
    >>> x = jnp.ones((2, 10, 16))
    >>> v = blk.init(jax.random.PRNGKey(0), x, train=False)
    >>> blk.apply(v, x, train=False).shape
    (2, 10, 16)
    """

    out_channels: int
    num_layers: int = 6
    nhead: int = 8
    d_ffn: int = 2048
    dropout: float = 0.1
    use_positional_encoding: bool = True

    @nn.compact
    def __call__(self, x, train=True):
        from speechbrain_tpu.lobes.models.transformer.Transformer import (
            TransformerEncoder,
        )

        if self.use_positional_encoding:
            x = PyTorchPositionalEncoding(
                d_model=self.out_channels, dropout=self.dropout,
                name="pos",
            )(x, train=train)
        out, _ = TransformerEncoder(
            num_layers=self.num_layers,
            nhead=self.nhead,
            d_ffn=self.d_ffn,
            d_model=self.out_channels,
            dropout=self.dropout,
            normalize_before=False,
            name="encoder",
        )(x, train=train)
        return out


class DPTNetBlock(nn.Module):
    """DPTNet layer: self-attention + an RNN-based (GRU) feed-forward
    instead of the positionwise MLP (reference
    ``lobes/models/dual_path.py`` DPTNetBlock).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> blk = DPTNetBlock(d_model=16, nhead=4)
    >>> x = jnp.ones((2, 10, 16))
    >>> v = blk.init(jax.random.PRNGKey(0), x, train=False)
    >>> blk.apply(v, x, train=False).shape
    (2, 10, 16)
    """

    d_model: int
    nhead: int
    dim_feedforward: int = 256
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train=True):
        from speechbrain_tpu.nnet.attention import MultiheadAttention
        from speechbrain_tpu.nnet.RNN import GRU

        attn_out = MultiheadAttention(
            nhead=self.nhead, d_model=self.d_model,
            dropout=self.dropout, name="mha",
        )(x, x, x, train=train, return_attn_weights=False)
        x = nn.LayerNorm(dtype=x.dtype, name="norm1")(
            x + nn.Dropout(
                rate=self.dropout, deterministic=not train
            )(attn_out)
        )
        rnn_out, _ = GRU(
            hidden_size=self.dim_feedforward // 2,
            bidirectional=True,
            name="rnn_ffn",
        )(x, train=train)
        y = nn.Dense(self.d_model, dtype=x.dtype, name="ffn_out")(
            jax.nn.relu(rnn_out)
        )
        return nn.LayerNorm(dtype=x.dtype, name="norm2")(
            x + nn.Dropout(
                rate=self.dropout, deterministic=not train
            )(y)
        )


class SBConformerEncoderBlock(nn.Module):
    """Conformer encoder as a dual-path intra/inter model (reference
    ``lobes/models/dual_path.py`` SBConformerEncoderBlock).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> blk = SBConformerEncoderBlock(num_layers=1, d_model=16, nhead=4,
    ...                               d_ffn=32, kernel_size=3)
    >>> x = jnp.ones((2, 10, 16))
    >>> v = blk.init(jax.random.PRNGKey(0), x, train=False)
    >>> blk.apply(v, x, train=False).shape
    (2, 10, 16)
    """

    num_layers: int
    d_model: int
    nhead: int
    d_ffn: int = 1024
    kernel_size: int = 31
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train=True):
        from speechbrain_tpu.lobes.models.transformer.Conformer import (
            ConformerEncoder,
        )
        from speechbrain_tpu.nnet.attention import RelPosEncXL

        pos = RelPosEncXL(emb_dim=self.d_model)(x)
        out, _ = ConformerEncoder(
            num_layers=self.num_layers,
            d_model=self.d_model,
            d_ffn=self.d_ffn,
            nhead=self.nhead,
            kernel_size=self.kernel_size,
            dropout=self.dropout,
            name="encoder",
        )(x, pos_embs=pos, train=train)
        return out


class FastTransformerBlock:
    """Reference-compat stub: the reference's FastTransformerBlock
    wraps the optional ``fast_transformers`` package (linear
    attention).  Not available in a torch-free build — use
    ``SBTransformerBlock`` or ``PytorchTransformerBlock`` instead."""

    def __init__(self, *args, **kwargs):
        raise ImportError(
            "FastTransformerBlock requires the fast_transformers "
            "package (optional in the reference); use "
            "SBTransformerBlock instead."
        )


class Dual_Computation_Block(nn.Module):
    """One dual-path computation block: intra-chunk model + inter-chunk
    model with optional norm and skip connections (reference
    ``lobes/models/dual_path.py`` Dual_Computation_Block).  Operates on
    (B, S, K, N) chunked input.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> blk = Dual_Computation_Block(out_channels=16, nhead=4, d_ffn=32)
    >>> x = jnp.ones((2, 5, 10, 16))
    >>> v = blk.init(jax.random.PRNGKey(0), x, train=False)
    >>> blk.apply(v, x, train=False).shape
    (2, 5, 10, 16)
    """

    out_channels: int
    nhead: int = 8
    d_ffn: int = 1024
    intra_numlayers: int = 1
    inter_numlayers: int = 1
    norm: str = "ln"
    skip_around_intra: bool = True
    linear_layer_after_inter_intra: bool = False

    @nn.compact
    def __call__(self, x, train=True):
        B, S, K, N = x.shape
        intra = SBTransformerBlock(
            num_layers=self.intra_numlayers,
            d_model=N,
            nhead=self.nhead,
            d_ffn=self.d_ffn,
            name="intra_mdl",
        )(x.reshape(B * S, K, N), train=train)
        if self.linear_layer_after_inter_intra:
            intra = nn.Dense(N, dtype=intra.dtype, name="intra_lin")(intra)
        intra = intra.reshape(B, S, K, N)
        if self.norm is not None:
            intra = nn.LayerNorm(dtype=intra.dtype, name="intra_norm")(
                intra
            )
        if self.skip_around_intra:
            intra = intra + x
        inter_in = jnp.swapaxes(intra, 1, 2).reshape(B * K, S, N)
        inter = SBTransformerBlock(
            num_layers=self.inter_numlayers,
            d_model=N,
            nhead=self.nhead,
            d_ffn=self.d_ffn,
            name="inter_mdl",
        )(inter_in, train=train)
        if self.linear_layer_after_inter_intra:
            inter = nn.Dense(N, dtype=inter.dtype, name="inter_lin")(inter)
        inter = jnp.swapaxes(inter.reshape(B, K, S, N), 1, 2)
        if self.norm is not None:
            inter = nn.LayerNorm(dtype=inter.dtype, name="inter_norm")(
                inter
            )
        return inter + intra
