"""CNN-Transformer for speech enhancement.

Parity target: reference
``lobes/models/transformer/TransformerSE.py`` (CNNTransformerSE) —
an encoder-only (optionally causal) transformer over enhancement
features with a linear+activation mask head.
"""

import flax.linen as nn
import jax.numpy as jnp

from speechbrain_tpu.lobes.models.transformer.Transformer import (
    TransformerEncoder,
    get_key_padding_mask,
    get_lookahead_mask,
)

__all__ = ["CNNTransformerSE"]


class CNNTransformerSE(nn.Module):
    """Transformer encoder with optional CNN pre-encoder for SE.

    Arguments
    ---------
    d_model : int
        Encoder feature size.
    output_size : int
        Output (e.g. mask) dimension.
    output_activation : str
        'relu' | 'sigmoid' | 'softplus' | 'linear' head activation.
    nhead, num_layers, d_ffn, dropout, activation, normalize_before :
        Standard encoder hyperparameters.
    causal : bool
        Forbid attention to future frames (streaming enhancement).
    custom_emb_module : nn.Module | None
        Optional module applied to the input before the encoder.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = CNNTransformerSE(d_model=32, output_size=33, num_layers=2,
    ...     nhead=4, d_ffn=64)
    >>> x = jnp.ones((2, 12, 32))
    >>> v = net.init(jax.random.PRNGKey(0), x, train=False)
    >>> net.apply(v, x, train=False).shape
    (2, 12, 33)
    """

    d_model: int
    output_size: int
    output_activation: str = "relu"
    nhead: int = 8
    num_layers: int = 8
    d_ffn: int = 512
    dropout: float = 0.1
    activation: str = "leaky_relu"
    causal: bool = True
    custom_emb_module: nn.Module | None = None
    normalize_before: bool = False

    @nn.compact
    def __call__(self, x, lengths=None, train=True):
        attn_mask = (
            get_lookahead_mask(x.shape[1]) if self.causal else None
        )
        src_key_padding_mask = None
        if lengths is not None:
            src_key_padding_mask = get_key_padding_mask(
                lengths, x.shape[1]
            )
        if self.custom_emb_module is not None:
            x = self.custom_emb_module(x)
        if x.shape[-1] != self.d_model:
            # Default input projection onto d_model (the reference
            # relies on custom_emb_module for this; a Dense keeps the
            # module usable standalone).
            x = nn.Dense(self.d_model, name="in_proj")(x)
        enc_out, _ = TransformerEncoder(
            num_layers=self.num_layers,
            nhead=self.nhead,
            d_ffn=self.d_ffn,
            d_model=self.d_model,
            dropout=self.dropout,
            activation=self.activation,
            normalize_before=self.normalize_before,
        )(
            x,
            src_mask=attn_mask,
            src_key_padding_mask=src_key_padding_mask,
            train=train,
        )
        out = nn.Dense(self.output_size, use_bias=False)(enc_out)
        if self.output_activation == "relu":
            return nn.relu(out)
        if self.output_activation == "sigmoid":
            return nn.sigmoid(out)
        if self.output_activation == "softplus":
            return nn.softplus(out)
        return out
