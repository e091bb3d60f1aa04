"""Grapheme-to-phoneme models: attention seq2seq and transformer.

Parity targets: reference ``lobes/models/g2p/model.py:20``
(AttentionSeq2Seq), ``:216`` (TransformerG2P).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.lobes.models.transformer.TransformerASR import (
    TransformerASR,
)
from speechbrain_tpu.nnet.RNN import GRU, AttentionalRNNDecoder
from speechbrain_tpu.nnet.embedding import Embedding

__all__ = ["AttentionSeq2Seq", "TransformerG2P"]


class AttentionSeq2Seq(nn.Module):
    """Grapheme encoder (biGRU) + attentional phoneme decoder.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> model = AttentionSeq2Seq(
    ...     grapheme_vocab=28, phoneme_vocab=44, emb_dim=16,
    ...     enc_neurons=16, dec_neurons=16)
    >>> g = jnp.zeros((2, 6), jnp.int32)
    >>> p_bos = jnp.zeros((2, 4), jnp.int32)
    >>> v = model.init(jax.random.PRNGKey(0), g, jnp.ones(2), p_bos,
    ...                train=False)
    >>> out, attn = model.apply(v, g, jnp.ones(2), p_bos, train=False)
    >>> out.shape
    (2, 4, 44)
    """

    grapheme_vocab: int
    phoneme_vocab: int
    emb_dim: int = 128
    enc_neurons: int = 256
    dec_neurons: int = 256
    enc_layers: int = 2
    dec_layers: int = 1

    def setup(self):
        """Flax setup: declare submodules/params."""
        self.grapheme_emb = Embedding(
            num_embeddings=self.grapheme_vocab,
            embedding_dim=self.emb_dim,
        )
        self.encoder = GRU(
            hidden_size=self.enc_neurons,
            num_layers=self.enc_layers,
            bidirectional=True,
        )
        self.phoneme_emb = Embedding(
            num_embeddings=self.phoneme_vocab,
            embedding_dim=self.emb_dim,
        )
        self.decoder = AttentionalRNNDecoder(
            rnn_type="gru",
            attn_type="content",
            hidden_size=self.dec_neurons,
            attn_dim=self.dec_neurons,
            num_layers=self.dec_layers,
        )
        self.out = nn.Dense(self.phoneme_vocab)

    def __call__(self, grapheme_encoded, grapheme_lens, phn_encoded_bos, train=True):
        emb = self.grapheme_emb(grapheme_encoded)
        enc, _ = self.encoder(emb, train=train)
        dec_emb = self.phoneme_emb(phn_encoded_bos)
        dec_out, attn = self.decoder(
            dec_emb, enc, grapheme_lens, train=train
        )
        logits = self.out(dec_out)
        return jax.nn.log_softmax(logits, axis=-1), attn


class TransformerG2P(nn.Module):
    """Transformer encoder-decoder G2P (reference ``model.py:216``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> model = TransformerG2P(grapheme_vocab=28, phoneme_vocab=44,
    ...     d_model=32, nhead=4, num_encoder_layers=2,
    ...     num_decoder_layers=1, d_ffn=64)
    >>> g = jnp.zeros((2, 6), jnp.int32)
    >>> p_bos = jnp.zeros((2, 4), jnp.int32)
    >>> v = model.init(jax.random.PRNGKey(0), g, jnp.ones(2), p_bos,
    ...                train=False)
    >>> out = model.apply(v, g, jnp.ones(2), p_bos, train=False)
    >>> out.shape
    (2, 4, 44)
    """

    grapheme_vocab: int
    phoneme_vocab: int
    d_model: int = 256
    nhead: int = 4
    num_encoder_layers: int = 3
    num_decoder_layers: int = 3
    d_ffn: int = 1024
    dropout: float = 0.1

    def setup(self):
        """Flax setup: declare submodules/params."""
        self.grapheme_emb = Embedding(
            num_embeddings=self.grapheme_vocab,
            embedding_dim=self.d_model,
        )
        self.transformer = TransformerASR(
            tgt_vocab=self.phoneme_vocab,
            input_size=self.d_model,
            d_model=self.d_model,
            nhead=self.nhead,
            num_encoder_layers=self.num_encoder_layers,
            num_decoder_layers=self.num_decoder_layers,
            d_ffn=self.d_ffn,
            dropout=self.dropout,
        )
        self.out = nn.Dense(self.phoneme_vocab)

    def __call__(self, grapheme_encoded, grapheme_lens, phn_encoded_bos, train=True):
        emb = self.grapheme_emb(grapheme_encoded)
        enc, dec = self.transformer(
            emb, phn_encoded_bos, wav_len=grapheme_lens, train=train
        )
        logits = self.out(dec)
        return jax.nn.log_softmax(logits, axis=-1)
