"""Joint CTC/attention transformer ASR model.

Parity target: reference ``lobes/models/transformer/TransformerASR.py:22``
(TransformerASR with ``encode``/``decode``).  Input projection + encoder
(transformer or conformer) + autoregressive decoder; CTC/seq2seq heads
live in the recipe (Linear modules), matching the reference layout.
"""

import flax.linen as nn
import jax.numpy as jnp

from speechbrain_tpu.lobes.models.transformer.Conformer import ConformerEncoder
from speechbrain_tpu.lobes.models.transformer.Transformer import (
    NormalizedEmbedding,
    PositionalEncoding,
    TransformerDecoder,
    TransformerEncoder,
    get_key_padding_mask,
    get_lookahead_mask,
)
from speechbrain_tpu.nnet.attention import RelPosEncXL

__all__ = ["TransformerASR"]


class TransformerASR(nn.Module):
    """Encoder-decoder ASR with transformer or conformer encoder.

    Call modes (reference parity):
    - ``__call__(src, tgt, wav_len, pad_idx)`` -> (enc_out, dec_out)
    - ``encode(src, wav_len)`` -> enc_out  (CTC-only / decoding prep)
    - ``decode(tgt, encoder_out, enc_lens)`` -> (dec_out, cross_attn)

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = TransformerASR(tgt_vocab=40, input_size=80, d_model=32,
    ...     nhead=4, num_encoder_layers=2, num_decoder_layers=1, d_ffn=64)
    >>> src = jnp.ones((2, 16, 80))
    >>> tgt = jnp.zeros((2, 5), jnp.int32)
    >>> v = net.init(jax.random.PRNGKey(0), src, tgt, jnp.ones(2), train=False)
    >>> enc, dec = net.apply(v, src, tgt, jnp.ones(2), train=False)
    >>> enc.shape, dec.shape
    ((2, 16, 32), (2, 5, 32))
    """

    tgt_vocab: int
    input_size: int
    d_model: int = 512
    nhead: int = 8
    num_encoder_layers: int = 12
    num_decoder_layers: int = 6
    d_ffn: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    positional_encoding: str = "fixed_abs_sine"
    normalize_before: bool = False
    kernel_size: int = 31
    causal: bool = False
    # pallas flash attention in the conformer encoder for long-form
    # inputs (auto-guarded; see nnet.attention.RelPosMHAXL.use_flash)
    use_flash: bool = False
    encoder_module: str = "transformer"
    attention_type: str = "regularMHA"
    max_length: int = 2500

    def setup(self):
        """Flax setup: declare submodules/params."""
        self.custom_src_module = nn.Dense(self.d_model)
        self.custom_tgt_module = NormalizedEmbedding(
            d_model=self.d_model, vocab=self.tgt_vocab
        )
        self.positional_encoding_mod = PositionalEncoding(
            input_size=self.d_model, max_len=self.max_length
        )
        if self.attention_type == "RelPosMHAXL":
            self.relpos_enc = RelPosEncXL(emb_dim=self.d_model)
        if self.encoder_module == "conformer":
            self.encoder = ConformerEncoder(
                num_layers=self.num_encoder_layers,
                d_model=self.d_model,
                d_ffn=self.d_ffn,
                nhead=self.nhead,
                kernel_size=self.kernel_size,
                causal=self.causal,
                dropout=self.dropout,
                activation="swish",
                use_flash=self.use_flash,
            )
            if self.attention_type != "RelPosMHAXL":
                raise ValueError(
                    "Conformer encoder requires RelPosMHAXL attention"
                )
        else:
            self.encoder = TransformerEncoder(
                num_layers=self.num_encoder_layers,
                nhead=self.nhead,
                d_ffn=self.d_ffn,
                d_model=self.d_model,
                dropout=self.dropout,
                activation=self.activation,
                normalize_before=self.normalize_before,
                attention_type=self.attention_type,
            )
        if self.num_decoder_layers > 0:
            self.decoder = TransformerDecoder(
                num_layers=self.num_decoder_layers,
                nhead=self.nhead,
                d_ffn=self.d_ffn,
                d_model=self.d_model,
                dropout=self.dropout,
                activation=self.activation,
                # reference passes the interface's flag through
                # (Transformer.py:187), not a hard-coded pre-norm
                normalize_before=self.normalize_before,
            )

    def _encode(self, src, wav_len, train):
        T = src.shape[1]
        src_key_padding_mask = None
        if wav_len is not None:
            src_key_padding_mask = get_key_padding_mask(wav_len, T)
        # Keep the compute dtype of the incoming activations: flax
        # Dense with default dtype promotes bf16 inputs to f32, which
        # silently upcasts the WHOLE encoder (wall-neutral at
        # conformer_small bench shapes, but doubles activation HBM
        # traffic; matters at larger d_model).
        x = self.custom_src_module(src).astype(src.dtype)
        if self.attention_type == "RelPosMHAXL":
            pos_embs = self.relpos_enc(x)
            if self.encoder_module == "transformer":
                enc_out, _ = self.encoder(
                    x,
                    src_key_padding_mask=src_key_padding_mask,
                    pos_embs=pos_embs,
                    train=train,
                )
            else:
                enc_out, _ = self.encoder(
                    x,
                    src_key_padding_mask=src_key_padding_mask,
                    pos_embs=pos_embs,
                    train=train,
                )
        else:
            x = x + self.positional_encoding_mod(x)
            enc_out, _ = self.encoder(
                x,
                src_key_padding_mask=src_key_padding_mask,
                train=train,
            )
        return enc_out, src_key_padding_mask

    def __call__(self, src, tgt, wav_len=None, pad_idx=0, train=True):
        enc_out, src_key_padding_mask = self._encode(src, wav_len, train)
        if self.num_decoder_layers == 0:
            return enc_out, None
        if self.attention_type == "RelPosMHAXL":
            # reference quirk kept for parity (TransformerASR forward,
            # the "FIXME we use pos embs also on enc output" branch):
            # the decoder's fixed abs-sine PE is ALSO added to the
            # encoder output before cross-attention, and the mutated
            # tensor is what forward() returns (the training CTC head
            # sees it; eval-time encode() stays raw).
            enc_out = enc_out + self.positional_encoding_mod(enc_out)
        tgt_key_padding_mask = jnp.asarray(tgt, jnp.int32) == pad_idx
        tgt_mask = get_lookahead_mask(tgt.shape[1])
        tgt_emb = self.custom_tgt_module(tgt).astype(enc_out.dtype)
        tgt_emb = tgt_emb + self.positional_encoding_mod(tgt_emb)
        dec_out, _, _ = self.decoder(
            tgt_emb,
            enc_out,
            tgt_mask=tgt_mask,
            tgt_key_padding_mask=tgt_key_padding_mask,
            memory_key_padding_mask=src_key_padding_mask,
            train=train,
        )
        return enc_out, dec_out

    def encode(self, src, wav_len=None, train=False):
        """Encoder forward only."""
        enc_out, _ = self._encode(src, wav_len, train)
        return enc_out

    def decode_cache_init(self, encoder_out, max_steps):
        """Precompute incremental-decode KV caches: per-layer cross
        K/V from (PE-augmented, see ``decode``) encoder states plus
        zero self caches for ``max_steps`` token slots."""
        if self.attention_type == "RelPosMHAXL":
            encoder_out = encoder_out + self.positional_encoding_mod(
                encoder_out
            )
        return self.decoder(
            None, encoder_out, mode="init_cache", max_steps=max_steps
        )

    def decode_step(self, tgt_t, cache, pos, enc_lens=None, T_enc=None,
                    rows=None):
        """One incremental decoder step at position ``pos``.

        tgt_t : (B,) int32 tokens;  cache : from ``decode_cache_init``.
        ``rows`` : optional (B,) int32 beam-predecessor map — the
        self-cache permutation is fused into the cache update (see
        ``ops.pallas.beam_cache``) instead of a separate gather.
        Returns ``(out (B, d_model), new_cache)`` — numerically the
        position-``pos`` output of ``decode`` over the full prefix,
        at O(1) projection/FFN cost per step (the serving hot path).
        """
        memory_key_padding_mask = None
        if enc_lens is not None:
            T = T_enc if T_enc is not None else cache[0]["ck"].shape[1]
            memory_key_padding_mask = get_key_padding_mask(enc_lens, T)
        tgt_emb = self.custom_tgt_module(tgt_t[:, None])
        tgt_emb = tgt_emb + self.positional_encoding_mod(
            tgt_emb, offset=pos
        )
        out, new_cache = self.decoder(
            tgt_emb,
            None,
            memory_key_padding_mask=memory_key_padding_mask,
            mode="step",
            cache=cache,
            pos=pos,
            rows=rows,
        )
        return out[:, 0], new_cache

    def decode(self, tgt, encoder_out, enc_lens=None, train=False):
        """Decoder forward for beam search; returns (out, last cross-attn)."""
        tgt_mask = get_lookahead_mask(tgt.shape[1])
        memory_key_padding_mask = None
        if enc_lens is not None:
            memory_key_padding_mask = get_key_padding_mask(
                enc_lens, encoder_out.shape[1]
            )
        tgt_emb = self.custom_tgt_module(tgt)
        tgt_emb = tgt_emb + self.positional_encoding_mod(tgt_emb)
        if self.attention_type == "RelPosMHAXL":
            # same reference quirk as forward(): decoder PE added to
            # the encoder states at decode time
            encoder_out = encoder_out + self.positional_encoding_mod(
                encoder_out
            )
        dec_out, _, cross_attns = self.decoder(
            tgt_emb,
            encoder_out,
            tgt_mask=tgt_mask,
            memory_key_padding_mask=memory_key_padding_mask,
            train=train,
        )
        return dec_out, cross_attns[-1]
