"""RNN language model.

Parity target: reference ``lobes/models/RNNLM.py:15``.
"""

import flax.linen as nn
import jax

from speechbrain_tpu.nnet.RNN import LSTM
from speechbrain_tpu.nnet.embedding import Embedding
from speechbrain_tpu.nnet.normalization import LayerNorm

__all__ = ["RNNLM"]


class RNNLM(nn.Module):
    """Embedding -> LSTM -> DNN -> logits.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lm = RNNLM(output_neurons=40, embedding_dim=16, rnn_neurons=32,
    ...            dnn_neurons=32)
    >>> tokens = jnp.zeros((2, 7), jnp.int32)
    >>> v = lm.init(jax.random.PRNGKey(0), tokens, train=False)
    >>> lm.apply(v, tokens, train=False).shape
    (2, 7, 40)
    """

    output_neurons: int
    embedding_dim: int = 128
    activation: str = "leaky_relu"
    dropout: float = 0.15
    rnn_class: str = "lstm"
    rnn_layers: int = 2
    rnn_neurons: int = 1024
    rnn_re_init: bool = False
    return_hidden: bool = False
    dnn_blocks: int = 1
    dnn_neurons: int = 512

    @nn.compact
    def __call__(self, x, hx=None, train=True):
        emb = Embedding(
            num_embeddings=self.output_neurons,
            embedding_dim=self.embedding_dim,
        )(x)
        out, hidden = LSTM(
            hidden_size=self.rnn_neurons,
            num_layers=self.rnn_layers,
            dropout=self.dropout,
        )(emb, train=train)
        for _ in range(self.dnn_blocks):
            out = nn.Dense(self.dnn_neurons, dtype=out.dtype)(out)
            out = LayerNorm()(out)
            out = jax.nn.leaky_relu(out)
            out = nn.Dropout(rate=self.dropout, deterministic=not train)(out)
        logits = nn.Dense(self.output_neurons, dtype=out.dtype)(out)
        if self.return_hidden:
            return logits, hidden
        return logits
