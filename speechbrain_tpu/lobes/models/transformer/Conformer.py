"""Conformer encoder/decoder (macaron FFN + RelPosMHAXL + conv module).

Parity targets: reference ``lobes/models/transformer/Conformer.py:24``
(ConvolutionModule), ``:118`` (ConformerEncoderLayer), ``:263``
(ConformerEncoder), ``:386`` (ConformerDecoderLayer), ``:545``
(ConformerDecoder).
"""

import warnings

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.attention import (
    MultiheadAttention,
    PositionalwiseFeedForward,
    RelPosMHAXL,
)

__all__ = [
    "ConvolutionModule",
    "ConformerEncoderLayer",
    "ConformerEncoder",
    "ConformerDecoderLayer",
    "ConformerDecoder",
]


class ConvolutionModule(nn.Module):
    """LN -> pointwise(2x, GLU) -> depthwise -> LN -> swish -> pointwise.

    ``causal`` left-pads the depthwise conv for streaming masking.
    """

    input_size: int
    kernel_size: int = 31
    bias: bool = True
    causal: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, train=True):
        d = self.input_size
        y = nn.LayerNorm(dtype=x.dtype)(x)
        y = nn.Dense(2 * d, use_bias=self.bias, dtype=x.dtype)(y)
        y = nn.glu(y, axis=-1)
        from speechbrain_tpu.ops.pallas.depthwise_conv import (
            depthwise_conv1d,
        )

        # Same init distribution as nn.Conv's depthwise kernel
        # (lecun_normal over (K, 1, C): fan_in = K).
        w = self.param(
            "depthwise_kernel",
            lambda key, shape: nn.initializers.lecun_normal()(
                key, (shape[0], 1, shape[1])
            )[:, 0, :],
            (self.kernel_size, d),
        )
        conv_bias = (
            self.param("depthwise_bias", nn.initializers.zeros, (d,))
            if self.bias
            else None
        )
        y = depthwise_conv1d(
            y, w.astype(x.dtype), conv_bias, causal=self.causal
        )
        y = nn.LayerNorm(dtype=x.dtype)(y)
        y = y * jax.nn.sigmoid(y)  # swish
        y = nn.Dense(d, use_bias=self.bias, dtype=x.dtype)(y)
        y = nn.Dropout(rate=self.dropout, deterministic=not train)(y)
        if mask is not None:
            # reference masks the module OUTPUT only (Conformer.py:113:
            # out.masked_fill_(mask, 0.0)); padded frames still leak
            # into boundary frames through the depthwise conv
            y = jnp.where(mask[..., None], 0.0, y)
        return y


class ConformerEncoderLayer(nn.Module):
    """Macaron: 0.5*FFN -> MHA -> conv -> 0.5*FFN -> LN."""

    d_model: int
    d_ffn: int
    nhead: int
    kernel_size: int = 31
    causal: bool = False
    dropout: float = 0.0
    activation: str = "swish"
    use_flash: bool = False  # pallas flash attention for long T (see RelPosMHAXL.use_flash)

    @nn.compact
    def __call__(
        self,
        x,
        src_mask=None,
        src_key_padding_mask=None,
        pos_embs=None,
        train=True,
    ):
        drop = nn.Dropout(rate=self.dropout, deterministic=not train)
        # First macaron FFN (half residual)
        ff1 = PositionalwiseFeedForward(
            d_ffn=self.d_ffn, dropout=self.dropout, activation=self.activation,
            name="ffn1",
        )
        x = x + 0.5 * drop(ff1(nn.LayerNorm(dtype=x.dtype)(x), train=train))
        # Multi-head self-attention with relative positions
        attn_in = nn.LayerNorm(dtype=x.dtype)(x)
        attn_out, attn_w = RelPosMHAXL(
            embed_dim=self.d_model,
            num_heads=self.nhead,
            dropout=self.dropout,
            use_flash=self.use_flash,
            name="mha",
        )(
            attn_in, attn_in, attn_in, pos_embs,
            key_padding_mask=src_key_padding_mask,
            attn_mask=src_mask,
            train=train,
        )
        x = x + drop(attn_out)
        # Convolution module
        x = x + ConvolutionModule(
            input_size=self.d_model,
            kernel_size=self.kernel_size,
            causal=self.causal,
            dropout=self.dropout,
            name="conv",
        )(x, mask=src_key_padding_mask, train=train)
        # Second macaron FFN (half residual)
        ff2 = PositionalwiseFeedForward(
            d_ffn=self.d_ffn, dropout=self.dropout, activation=self.activation,
            name="ffn2",
        )
        x = x + 0.5 * drop(ff2(nn.LayerNorm(dtype=x.dtype)(x), train=train))
        x = nn.LayerNorm(dtype=x.dtype)(x)
        return x, attn_w


class ConformerEncoder(nn.Module):
    """Stack of conformer layers."""

    num_layers: int
    d_model: int
    d_ffn: int
    nhead: int
    kernel_size: int = 31
    causal: bool = False
    dropout: float = 0.0
    activation: str = "swish"
    # rematerialize each layer in the backward pass: saves only the
    # matmul outputs (dots_with_no_batch_dims_saveable) and recomputes
    # elementwise chains, trading FLOPs for HBM traffic
    remat: bool = False
    use_flash: bool = False

    @nn.compact
    def __call__(
        self,
        src,
        src_mask=None,
        src_key_padding_mask=None,
        pos_embs=None,
        train=True,
    ):
        layer_cls = ConformerEncoderLayer
        if self.remat:
            import jax as _jax

            layer_cls = nn.remat(
                ConformerEncoderLayer,
                policy=_jax.checkpoint_policies
                .dots_with_no_batch_dims_saveable,
                static_argnums=(5,),
            )
        output = src
        attns = []
        for i in range(self.num_layers):
            output, attn = layer_cls(
                d_model=self.d_model,
                d_ffn=self.d_ffn,
                nhead=self.nhead,
                kernel_size=self.kernel_size,
                causal=self.causal,
                dropout=self.dropout,
                activation=self.activation,
                use_flash=self.use_flash,
                name=f"layer_{i}",
            )(
                output,
                src_mask,
                src_key_padding_mask,
                pos_embs,
                train,
            )
            attns.append(attn)
        # final encoder LayerNorm (reference Conformer.py:78,119 —
        # eps 1e-6, applied after the layer stack)
        output = nn.LayerNorm(
            epsilon=1e-6, dtype=output.dtype, name="norm_out"
        )(output)
        return output, attns


class ConformerDecoderLayer(nn.Module):
    """Conformer decoder layer (reference ``Conformer.py:386``).

    Macaron half-FFN, then ONE attention block attending to the encoder
    ``memory`` (the reference decoder layer has no separate self-attn),
    then the (causal) convolution module, then the second half-FFN.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> layer = ConformerDecoderLayer(
    ...     d_model=16, d_ffn=32, nhead=4, kernel_size=3,
    ...     attention_type="regularMHA")
    >>> tgt = jnp.ones((2, 5, 16))
    >>> mem = jnp.ones((2, 7, 16))
    >>> v = layer.init(jax.random.PRNGKey(0), tgt, mem, train=False)
    >>> out, self_attn, attn = layer.apply(v, tgt, mem, train=False)
    >>> out.shape
    (2, 5, 16)
    """

    d_model: int
    d_ffn: int
    nhead: int
    kernel_size: int = 31
    bias: bool = True
    causal: bool = True
    dropout: float = 0.0
    activation: str = "swish"
    attention_type: str = "RelPosMHAXL"

    @nn.compact
    def __call__(
        self,
        tgt,
        memory,
        tgt_mask=None,
        memory_mask=None,
        tgt_key_padding_mask=None,
        memory_key_padding_mask=None,
        pos_embs_tgt=None,
        pos_embs_src=None,
        train=True,
    ):
        if not self.causal:
            warnings.warn(
                "Decoder is not causal; in most applications it should "
                "be causal, you have been warned!"
            )
        drop = nn.Dropout(rate=self.dropout, deterministic=not train)
        ff1 = PositionalwiseFeedForward(
            d_ffn=self.d_ffn, dropout=self.dropout,
            activation=self.activation, name="ffn1",
        )
        tgt = tgt + 0.5 * drop(
            ff1(nn.LayerNorm(dtype=tgt.dtype)(tgt), train=train)
        )
        skip = tgt
        x = nn.LayerNorm(dtype=tgt.dtype, name="norm1")(tgt)
        if self.attention_type == "regularMHA":
            x, attn = MultiheadAttention(
                nhead=self.nhead, d_model=self.d_model,
                dropout=self.dropout, name="mha",
            )(
                x, memory, memory,
                key_padding_mask=memory_key_padding_mask,
                attn_mask=memory_mask,
                train=train,
            )
        else:
            x, attn = RelPosMHAXL(
                embed_dim=self.d_model, num_heads=self.nhead,
                dropout=self.dropout, mask_pos_future=self.causal,
                name="mha",
            )(
                x, memory, memory, pos_embs_src,
                key_padding_mask=memory_key_padding_mask,
                attn_mask=memory_mask,
                train=train,
            )
        x = x + skip
        x = x + ConvolutionModule(
            input_size=self.d_model, kernel_size=self.kernel_size,
            bias=self.bias, causal=self.causal, dropout=self.dropout,
            name="conv",
        )(x, train=train)
        ff2 = PositionalwiseFeedForward(
            d_ffn=self.d_ffn, dropout=self.dropout,
            activation=self.activation, name="ffn2",
        )
        x = nn.LayerNorm(dtype=tgt.dtype, name="norm2")(
            x + 0.5 * drop(ff2(nn.LayerNorm(dtype=x.dtype)(x), train=train))
        )
        return x, attn, attn


class ConformerDecoder(nn.Module):
    """Stack of conformer decoder layers + final LN (reference
    ``Conformer.py:545``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> dec = ConformerDecoder(
    ...     num_layers=2, d_model=16, d_ffn=32, nhead=4, kernel_size=3,
    ...     attention_type="regularMHA")
    >>> tgt = jnp.ones((2, 5, 16))
    >>> mem = jnp.ones((2, 7, 16))
    >>> v = dec.init(jax.random.PRNGKey(0), tgt, mem, train=False)
    >>> out, self_attns, attns = dec.apply(v, tgt, mem, train=False)
    >>> out.shape
    (2, 5, 16)
    >>> len(attns)
    2
    """

    num_layers: int
    d_model: int
    d_ffn: int
    nhead: int
    kernel_size: int = 31
    bias: bool = True
    causal: bool = True
    dropout: float = 0.0
    activation: str = "swish"
    attention_type: str = "RelPosMHAXL"

    @nn.compact
    def __call__(
        self,
        tgt,
        memory,
        tgt_mask=None,
        memory_mask=None,
        tgt_key_padding_mask=None,
        memory_key_padding_mask=None,
        pos_embs_tgt=None,
        pos_embs_src=None,
        train=True,
    ):
        output = tgt
        self_attns, attns = [], []
        for i in range(self.num_layers):
            output, sa, a = ConformerDecoderLayer(
                d_model=self.d_model,
                d_ffn=self.d_ffn,
                nhead=self.nhead,
                kernel_size=self.kernel_size,
                bias=self.bias,
                causal=self.causal,
                dropout=self.dropout,
                activation=self.activation,
                attention_type=self.attention_type,
                name=f"layer_{i}",
            )(
                output, memory,
                tgt_mask=tgt_mask,
                memory_mask=memory_mask,
                tgt_key_padding_mask=tgt_key_padding_mask,
                memory_key_padding_mask=memory_key_padding_mask,
                pos_embs_tgt=pos_embs_tgt,
                pos_embs_src=pos_embs_src,
                train=train,
            )
            self_attns.append(sa)
            attns.append(a)
        output = nn.LayerNorm(dtype=output.dtype, name="norm")(output)
        return output, self_attns, attns
            
