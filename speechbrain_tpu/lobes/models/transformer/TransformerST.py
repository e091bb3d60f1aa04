"""Transformer for speech translation (ST) with auxiliary ASR/MT heads.

Parity target: reference ``lobes/models/transformer/TransformerST.py``
(TransformerST): an ASR-style encoder-decoder whose encoder output can
additionally feed (a) an auxiliary ASR transformer decoder and (b) an
auxiliary MT path with its own source-text encoder.  The multi-task
loss weighting (ctc/asr/mt) lives in the recipe, as in the reference.
"""

import flax.linen as nn
import jax.numpy as jnp

from speechbrain_tpu.lobes.models.transformer.Transformer import (
    NormalizedEmbedding,
    PositionalEncoding,
    TransformerDecoder,
    TransformerEncoder,
    get_key_padding_mask,
    get_lookahead_mask,
)
from speechbrain_tpu.lobes.models.transformer.TransformerASR import (
    TransformerASR,
)

__all__ = ["TransformerST"]


class TransformerST(nn.Module):
    """Speech translation transformer (ST + optional ASR/MT branches).

    Call modes:
    - ``__call__(src, tgt, wav_len, pad_idx)`` -> (enc, dec): the ST
      path (speech encoder + translation decoder).
    - ``encode(src, wav_len)`` -> enc.
    - ``decode(tgt, encoder_out, enc_lens)`` -> (dec, cross_attn).
    - ``forward_asr(encoder_out, tgt, wav_len, pad_idx)``: auxiliary
      ASR decoder over the shared speech encoder output.
    - ``forward_mt(src_tokens, tgt, pad_idx)``: text-to-text MT branch.
    - ``forward_mt_decoder_only(src_feats, tgt, pad_idx)``: decoder
      over externally encoded features (e.g. wav2vec).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = TransformerST(tgt_vocab=40, input_size=16, d_model=32,
    ...     nhead=4, num_encoder_layers=1, num_decoder_layers=1,
    ...     d_ffn=64, asr_weight=0.3, ctc_weight=0.5, asr_tgt_vocab=30)
    >>> src = jnp.ones((2, 12, 16))
    >>> tgt = jnp.zeros((2, 5), jnp.int32)
    >>> v = net.init(jax.random.PRNGKey(0), src, tgt, jnp.ones(2), train=False)
    >>> enc, dec = net.apply(v, src, tgt, jnp.ones(2), train=False)
    >>> enc.shape, dec.shape
    ((2, 12, 32), (2, 5, 32))
    """

    tgt_vocab: int
    input_size: int
    d_model: int = 512
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    d_ffn: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    positional_encoding: str = "fixed_abs_sine"
    normalize_before: bool = False
    kernel_size: int = 31
    encoder_module: str = "transformer"
    attention_type: str = "regularMHA"
    max_length: int = 2500
    causal: bool = False
    ctc_weight: float = 0.0
    asr_weight: float = 0.0
    mt_weight: float = 0.0
    asr_tgt_vocab: int = 0
    mt_src_vocab: int = 0

    def setup(self):
        """Flax setup: declare submodules/params."""
        self.st = TransformerASR(
            tgt_vocab=self.tgt_vocab,
            input_size=self.input_size,
            d_model=self.d_model,
            nhead=self.nhead,
            num_encoder_layers=self.num_encoder_layers,
            num_decoder_layers=self.num_decoder_layers,
            d_ffn=self.d_ffn,
            dropout=self.dropout,
            activation=self.activation,
            positional_encoding=self.positional_encoding,
            normalize_before=self.normalize_before,
            kernel_size=self.kernel_size,
            causal=self.causal,
            encoder_module=self.encoder_module,
            attention_type=self.attention_type,
            max_length=self.max_length,
        )
        self.pos_enc = PositionalEncoding(
            input_size=self.d_model, max_len=self.max_length
        )
        if self.ctc_weight < 1 and self.asr_weight > 0:
            self.asr_decoder = TransformerDecoder(
                num_layers=self.num_decoder_layers,
                nhead=self.nhead,
                d_ffn=self.d_ffn,
                d_model=self.d_model,
                dropout=self.dropout,
                activation=self.activation,
                normalize_before=self.normalize_before,
            )
            self.custom_asr_tgt_module = NormalizedEmbedding(
                d_model=self.d_model, vocab=self.asr_tgt_vocab
            )
        if self.mt_weight > 0:
            self.custom_mt_src_module = NormalizedEmbedding(
                d_model=self.d_model, vocab=self.mt_src_vocab
            )
            self.mt_encoder = TransformerEncoder(
                num_layers=self.num_encoder_layers,
                nhead=self.nhead,
                d_ffn=self.d_ffn,
                d_model=self.d_model,
                dropout=self.dropout,
                activation=self.activation,
                normalize_before=self.normalize_before,
            )

    def __call__(self, src, tgt, wav_len=None, pad_idx=0, train=True):
        enc, dec = self.st(
            src, tgt, wav_len=wav_len, pad_idx=pad_idx, train=train
        )
        if self.is_initializing():
            # Trace the auxiliary branches once so a single init
            # creates their params too (flax creates params only for
            # traced submodules).
            if self.ctc_weight < 1 and self.asr_weight > 0:
                self.forward_asr(enc, tgt, wav_len, pad_idx, train=train)
            if self.mt_weight > 0:
                src_tok = jnp.zeros(tgt.shape, jnp.int32)
                self.forward_mt(src_tok, tgt, pad_idx, train=train)
        return enc, dec

    def encode(self, src, wav_len=None, train=False):
        """Speech encoder forward only."""
        return self.st.encode(src, wav_len, train=train)

    def decode(self, tgt, encoder_out, enc_lens=None, train=False):
        """Translation decoder step for beam search."""
        return self.st.decode(tgt, encoder_out, enc_lens, train=train)

    def forward_asr(self, encoder_out, tgt, wav_len=None, pad_idx=0, train=True):
        """Auxiliary ASR decoding over the shared speech encoder output
        (reference TransformerST.forward_asr).
        """
        tgt_key_padding_mask = jnp.asarray(tgt, jnp.int32) == pad_idx
        tgt_mask = get_lookahead_mask(tgt.shape[1])
        memory_key_padding_mask = None
        if wav_len is not None:
            memory_key_padding_mask = get_key_padding_mask(
                wav_len, encoder_out.shape[1]
            )
        transcription = self.custom_asr_tgt_module(tgt)
        transcription = transcription + self.pos_enc(transcription)
        out, _, _ = self.asr_decoder(
            transcription,
            encoder_out,
            tgt_mask=tgt_mask,
            tgt_key_padding_mask=tgt_key_padding_mask,
            memory_key_padding_mask=memory_key_padding_mask,
            train=train,
        )
        return out

    def forward_mt(self, src, tgt, pad_idx=0, train=True):
        """Text-to-text MT branch (reference TransformerST.forward_mt)."""
        src_key_padding_mask = jnp.asarray(src, jnp.int32) == pad_idx
        tgt_key_padding_mask = jnp.asarray(tgt, jnp.int32) == pad_idx
        tgt_mask = get_lookahead_mask(tgt.shape[1])
        x = self.custom_mt_src_module(src)
        x = x + self.pos_enc(x)
        encoder_out, _ = self.mt_encoder(
            x, src_key_padding_mask=src_key_padding_mask, train=train
        )
        y = self.st.custom_tgt_module(tgt)
        y = y + self.pos_enc(y)
        decoder_out, _, _ = self.st.decoder(
            y,
            encoder_out,
            tgt_mask=tgt_mask,
            tgt_key_padding_mask=tgt_key_padding_mask,
            memory_key_padding_mask=src_key_padding_mask,
            train=train,
        )
        return encoder_out, decoder_out

    def forward_mt_decoder_only(self, src, tgt, pad_idx=0, train=True):
        """Translation decoder over externally encoded features
        (reference TransformerST.forward_mt_decoder_only).
        """
        tgt_key_padding_mask = jnp.asarray(tgt, jnp.int32) == pad_idx
        tgt_mask = get_lookahead_mask(tgt.shape[1])
        y = self.st.custom_tgt_module(tgt)
        y = y + self.pos_enc(y)
        decoder_out, _, _ = self.st.decoder(
            y,
            src,
            tgt_mask=tgt_mask,
            tgt_key_padding_mask=tgt_key_padding_mask,
            train=train,
        )
        return decoder_out
