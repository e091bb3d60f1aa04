"""Transformer language model.

Parity target: reference ``lobes/models/transformer/TransformerLM.py:23``.
"""

import flax.linen as nn
import jax.numpy as jnp

from speechbrain_tpu.lobes.models.transformer.Transformer import (
    NormalizedEmbedding,
    PositionalEncoding,
    TransformerEncoder,
    get_key_padding_mask,
    get_lookahead_mask,
)

__all__ = ["TransformerLM"]


class TransformerLM(nn.Module):
    """Causal transformer LM: tokens -> logits.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lm = TransformerLM(vocab=50, d_model=32, nhead=4,
    ...                    num_encoder_layers=2, d_ffn=64)
    >>> tokens = jnp.zeros((2, 7), jnp.int32)
    >>> v = lm.init(jax.random.PRNGKey(0), tokens, train=False)
    >>> lm.apply(v, tokens, train=False).shape
    (2, 7, 50)
    """

    vocab: int
    d_model: int = 768
    nhead: int = 12
    num_encoder_layers: int = 12
    d_ffn: int = 3072
    dropout: float = 0.0
    activation: str = "gelu"
    normalize_before: bool = False
    d_embedding: int | None = None

    @nn.compact
    def __call__(self, src, hx=None, train=True):
        src = jnp.asarray(src, jnp.int32)
        src_mask = get_lookahead_mask(src.shape[1])
        emb = NormalizedEmbedding(
            d_model=self.d_embedding or self.d_model, vocab=self.vocab
        )(src)
        if self.d_embedding is not None and self.d_embedding != self.d_model:
            emb = nn.Dense(self.d_model, dtype=emb.dtype)(emb)
        x = emb + PositionalEncoding(input_size=self.d_model)(emb)
        x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        x, _ = TransformerEncoder(
            num_layers=self.num_encoder_layers,
            nhead=self.nhead,
            d_ffn=self.d_ffn,
            d_model=self.d_model,
            dropout=self.dropout,
            activation=self.activation,
            normalize_before=self.normalize_before,
        )(x, src_mask=src_mask, train=train)
        logits = nn.Dense(self.vocab, dtype=x.dtype)(x)
        return logits
