"""A custom RNN language model, written from scratch.

Template counterpart of the reference
``templates/speech_recognition/LM/custom_model.py``: any Flax module
mapping token ids (B, L) to logits (B, L, vocab) plugs into the LM
recipe — and, via shallow fusion, into the ASR beam search.
"""

import flax.linen as nn
import jax

from speechbrain_tpu.nnet.RNN import LSTM
from speechbrain_tpu.nnet.embedding import Embedding


class CustomLM(nn.Module):
    """Embedding -> LSTM -> dense head.

    Arguments
    ---------
    vocab_size : int
        Output vocabulary (tokenizer vocab).
    embedding_dim : int
        Token embedding width.
    rnn_size : int
        LSTM hidden size.
    layers : int
        Number of LSTM layers.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lm = CustomLM(vocab_size=64, embedding_dim=16, rnn_size=32)
    >>> tokens = jnp.zeros((2, 7), jnp.int32)
    >>> params = lm.init(jax.random.PRNGKey(0), tokens, train=False)
    >>> lm.apply(params, tokens, train=False).shape
    (2, 7, 64)
    """

    vocab_size: int
    embedding_dim: int = 64
    rnn_size: int = 128
    layers: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, train=True):
        emb = Embedding(
            num_embeddings=self.vocab_size,
            embedding_dim=self.embedding_dim,
        )(x)
        out, _ = LSTM(
            hidden_size=self.rnn_size,
            num_layers=self.layers,
            dropout=self.dropout,
        )(emb, train=train)
        out = nn.Dropout(rate=self.dropout, deterministic=not train)(out)
        return nn.Dense(self.vocab_size, dtype=out.dtype)(out)
