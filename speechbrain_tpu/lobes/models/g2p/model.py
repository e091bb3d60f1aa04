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


class WordEmbeddingEncoder(nn.Module):
    """Normalizes + projects word embeddings to a smaller dimension
    with tanh (reference ``lobes/models/g2p/model.py:145``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> enc = WordEmbeddingEncoder(word_emb_enc_dim=8)
    >>> x = jnp.ones((2, 5, 16))
    >>> v = enc.init(jax.random.PRNGKey(0), x)
    >>> enc.apply(v, x).shape
    (2, 5, 8)
    """

    word_emb_enc_dim: int
    norm_type: str = "layer"

    @nn.compact
    def __call__(self, emb):
        x = emb
        if self.norm_type == "layer":
            x = nn.LayerNorm(dtype=x.dtype)(x)
        elif self.norm_type == "batch":
            from speechbrain_tpu.nnet.normalization import BatchNorm1d

            x = BatchNorm1d()(x, train=False)
        elif self.norm_type == "instance":
            from speechbrain_tpu.nnet.normalization import InstanceNorm1d

            x = InstanceNorm1d()(x)
        x = nn.Dense(self.word_emb_enc_dim, dtype=x.dtype)(x)
        return jnp.tanh(x)


def input_dim(use_word_emb, embedding_dim, word_emb_enc_dim):
    """Model input dimension with/without word embeddings; for hparams
    files (reference ``lobes/models/g2p/model.py:531``).

    Example
    -------
    >>> input_dim(True, 128, 32)
    160
    """
    return embedding_dim + use_word_emb * word_emb_enc_dim


def get_dummy_phonemes(batch_size, device=None):
    """A (batch, 1) all-zeros phoneme sequence to seed decoding
    (reference ``lobes/models/g2p/model.py:580``).

    Example
    -------
    >>> get_dummy_phonemes(2).tolist()
    [[0], [0]]
    """
    del device
    return jnp.zeros((batch_size, 1), jnp.int32)
