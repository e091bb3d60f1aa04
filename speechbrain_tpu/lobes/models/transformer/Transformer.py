"""Transformer encoder/decoder stack (channels-last, bf16-ready).

Parity targets: reference ``lobes/models/transformer/Transformer.py:20``
(TransformerInterface), ``:199`` (PositionalEncoding), ``:246,489``
(encoder/decoder layers), ``:766`` (NormalizedEmbedding), ``:799,832``
(masks).
"""

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.nnet.attention import (
    MultiheadAttention,
    PositionalwiseFeedForward,
    RelPosEncXL,
    RelPosMHAXL,
)

__all__ = [
    "PositionalEncoding",
    "TransformerEncoderLayer",
    "TransformerEncoder",
    "TransformerDecoderLayer",
    "TransformerDecoder",
    "NormalizedEmbedding",
    "get_key_padding_mask",
    "get_lookahead_mask",
    "TransformerInterface",
]


class PositionalEncoding(nn.Module):
    """Absolute sinusoidal positional encoding added to the input."""

    input_size: int
    max_len: int = 2500

    def __call__(self, x, offset=0):
        """PE for ``x.shape[1]`` positions starting at ``offset``
        (traced offsets supported — used by incremental decoding)."""
        T = x.shape[1]
        pos = np.arange(self.max_len)[:, None].astype(np.float32)
        div = np.exp(
            np.arange(0, self.input_size, 2).astype(np.float32)
            * -(math.log(10000.0) / self.input_size)
        )[None, :]
        pe = np.zeros((self.max_len, self.input_size), np.float32)
        pe[:, 0::2] = np.sin(pos * div)
        pe[:, 1::2] = np.cos(pos * div)
        if isinstance(offset, int) and offset == 0:
            return jnp.asarray(pe[None, :T]).astype(x.dtype)
        sl = jax.lax.dynamic_slice_in_dim(
            jnp.asarray(pe), offset, T, axis=0
        )
        return sl[None].astype(x.dtype)


def get_key_padding_mask(padded_input_lens, T):
    """(B,) relative lens -> (B, T) bool, True = PAD (torch convention).

    Lengths are rounded like the reference (``TransformerASR.py:227``:
    ``torch.round(wav_len * T)``) so fractional boundaries resolve to
    the same frame on both sides.
    """
    abs_lens = jnp.round(jnp.asarray(padded_input_lens) * T)
    return jnp.arange(T)[None, :] >= abs_lens[:, None]


def get_lookahead_mask(T):
    """(T, T) bool causal mask, True = disallowed (future)."""
    return jnp.triu(jnp.ones((T, T), bool), k=1)


class NormalizedEmbedding(nn.Module):
    """Embedding scaled by sqrt(d_model) (transformer convention)."""

    d_model: int
    vocab: int

    @nn.compact
    def __call__(self, x):
        emb = nn.Embed(self.vocab, self.d_model)(jnp.asarray(x, jnp.int32))
        return emb * math.sqrt(self.d_model)


class TransformerEncoderLayer(nn.Module):
    """Self-attention + FFN with pre/post-norm residuals."""

    d_ffn: int
    nhead: int
    d_model: int
    dropout: float = 0.0
    activation: str = "relu"
    normalize_before: bool = False
    attention_type: str = "regularMHA"

    @nn.compact
    def __call__(
        self,
        src,
        src_mask=None,
        src_key_padding_mask=None,
        pos_embs=None,
        train=True,
    ):
        if self.attention_type == "RelPosMHAXL":
            attn = RelPosMHAXL(
                embed_dim=self.d_model,
                num_heads=self.nhead,
                dropout=self.dropout,
            )
        else:
            attn = MultiheadAttention(
                nhead=self.nhead, d_model=self.d_model, dropout=self.dropout
            )
        norm1 = nn.LayerNorm(dtype=src.dtype)
        norm2 = nn.LayerNorm(dtype=src.dtype)
        drop = nn.Dropout(rate=self.dropout, deterministic=not train)

        x = src
        residual = x
        if self.normalize_before:
            x = norm1(x)
        if self.attention_type == "RelPosMHAXL":
            out, attn_w = attn(
                x, x, x, pos_embs,
                key_padding_mask=src_key_padding_mask,
                attn_mask=src_mask,
                train=train,
            )
        else:
            out, attn_w = attn(
                x, x, x,
                key_padding_mask=src_key_padding_mask,
                attn_mask=src_mask,
                train=train,
            )
        x = residual + drop(out)
        if not self.normalize_before:
            x = norm1(x)
        residual = x
        if self.normalize_before:
            x = norm2(x)
        out = PositionalwiseFeedForward(
            d_ffn=self.d_ffn, dropout=self.dropout, activation=self.activation
        )(x, train=train)
        x = residual + drop(out)
        if not self.normalize_before:
            x = norm2(x)
        return x, attn_w


class TransformerEncoder(nn.Module):
    """Stack of encoder layers (+ final norm when pre-norm)."""

    num_layers: int
    nhead: int
    d_ffn: int
    d_model: int
    dropout: float = 0.0
    activation: str = "relu"
    normalize_before: bool = False
    attention_type: str = "regularMHA"

    @nn.compact
    def __call__(
        self,
        src,
        src_mask=None,
        src_key_padding_mask=None,
        pos_embs=None,
        train=True,
    ):
        output = src
        attns = []
        for i in range(self.num_layers):
            output, attn = TransformerEncoderLayer(
                d_ffn=self.d_ffn,
                nhead=self.nhead,
                d_model=self.d_model,
                dropout=self.dropout,
                activation=self.activation,
                normalize_before=self.normalize_before,
                attention_type=self.attention_type,
                name=f"layer_{i}",
            )(
                output,
                src_mask=src_mask,
                src_key_padding_mask=src_key_padding_mask,
                pos_embs=pos_embs,
                train=train,
            )
            attns.append(attn)
        # reference applies the final encoder norm UNCONDITIONALLY
        # (Transformer.py:485: output = self.norm(output))
        output = nn.LayerNorm(dtype=output.dtype, name="norm_out")(output)
        return output, attns


class TransformerDecoderLayer(nn.Module):
    """Masked self-attention + cross-attention + FFN."""

    d_ffn: int
    nhead: int
    d_model: int
    dropout: float = 0.0
    activation: str = "relu"
    normalize_before: bool = False

    @nn.compact
    def __call__(
        self,
        tgt,
        memory,
        tgt_mask=None,
        memory_mask=None,
        tgt_key_padding_mask=None,
        memory_key_padding_mask=None,
        train=True,
        mode="full",
        cache=None,
        pos=None,
        rows=None,
    ):
        """``mode="init_cache"``: project ``memory`` into this layer's
        cross-attention KV cache (returns ``{"ck", "cv"}``).
        ``mode="step"``: one-token incremental decode against
        ``cache={"skv","ck","cv"}`` at position ``pos`` — same
        parameters, same numerics as the full path, O(1) projections
        and FFN per step; ``skv`` is the merged time-minor self cache
        (see ``ops.pallas.beam_cache``) and ``rows`` an optional
        beam-predecessor permutation fused into the cache update.
        Default ``"full"`` is the training path."""
        self_attn = MultiheadAttention(
            nhead=self.nhead, d_model=self.d_model, dropout=self.dropout,
            name="self_attn",
        )
        cross_attn = MultiheadAttention(
            nhead=self.nhead, d_model=self.d_model, dropout=self.dropout,
            name="cross_attn",
        )
        if mode == "init_cache":
            ck, cv = cross_attn(None, memory, memory, mode="project_kv")
            return {"ck": ck, "cv": cv}
        norm1 = nn.LayerNorm(dtype=tgt.dtype)
        norm2 = nn.LayerNorm(dtype=tgt.dtype)
        norm3 = nn.LayerNorm(dtype=tgt.dtype)
        drop = nn.Dropout(rate=self.dropout, deterministic=not train)
        if mode == "step":
            x = tgt  # (B, 1, d)
            residual = x
            if self.normalize_before:
                x = norm1(x)
            # Ping-pong self cache: when the cache carries an ``alt``
            # spare buffer (beam search with fused permutation), the
            # updated cache is written IN PLACE into ``alt`` and the
            # two buffers swap roles — the searcher unrolls its loop
            # by 2 so each buffer returns to its own carry slot every
            # body and XLA keeps the whole cache state in place.
            alt = cache.get("alt") if rows is not None else None
            out, _, skv = self_attn(
                x, x, x, mode="step",
                kv_cache=cache["skv"], cache_index=pos, rows=rows,
                kv_dst=alt,
            )
            x = residual + out
            if not self.normalize_before:
                x = norm1(x)
            residual = x
            if self.normalize_before:
                x = norm2(x)
            out, _, _ = cross_attn(
                x, None, None, mode="step",
                kv_cache=(cache["ck"], cache["cv"]),
                key_padding_mask=memory_key_padding_mask,
            )
            x = residual + out
            if not self.normalize_before:
                x = norm2(x)
            residual = x
            if self.normalize_before:
                x = norm3(x)
            out = PositionalwiseFeedForward(
                d_ffn=self.d_ffn, dropout=self.dropout,
                activation=self.activation,
            )(x, train=False)
            x = residual + out
            if not self.normalize_before:
                x = norm3(x)
            new_cache = {
                "skv": skv, "ck": cache["ck"], "cv": cache["cv"],
            }
            if alt is not None:
                # role swap: the buffer just read becomes the spare.
                new_cache["alt"] = cache["skv"]
            elif "alt" in cache:
                # structure stability when the spare is unused
                new_cache["alt"] = cache["alt"]
            return x, new_cache

        x = tgt
        residual = x
        if self.normalize_before:
            x = norm1(x)
        out, self_attn_w = self_attn(
            x, x, x,
            key_padding_mask=tgt_key_padding_mask,
            attn_mask=tgt_mask,
            train=train,
        )
        x = residual + drop(out)
        if not self.normalize_before:
            x = norm1(x)
        residual = x
        if self.normalize_before:
            x = norm2(x)
        out, cross_attn_w = cross_attn(
            x, memory, memory,
            key_padding_mask=memory_key_padding_mask,
            attn_mask=memory_mask,
            train=train,
        )
        x = residual + drop(out)
        if not self.normalize_before:
            x = norm2(x)
        residual = x
        if self.normalize_before:
            x = norm3(x)
        out = PositionalwiseFeedForward(
            d_ffn=self.d_ffn, dropout=self.dropout, activation=self.activation
        )(x, train=train)
        x = residual + drop(out)
        if not self.normalize_before:
            x = norm3(x)
        return x, self_attn_w, cross_attn_w


class TransformerDecoder(nn.Module):
    """Stack of decoder layers."""

    num_layers: int
    nhead: int
    d_ffn: int
    d_model: int
    dropout: float = 0.0
    activation: str = "relu"
    normalize_before: bool = False

    @nn.compact
    def __call__(
        self,
        tgt,
        memory,
        tgt_mask=None,
        memory_mask=None,
        tgt_key_padding_mask=None,
        memory_key_padding_mask=None,
        train=True,
        mode="full",
        cache=None,
        pos=None,
        max_steps=None,
        rows=None,
    ):
        """``mode="init_cache"``: build the per-layer KV caches for
        incremental decoding — cross K/V projected once from
        ``memory``, merged time-minor self caches ``skv``
        (B, d_model, 2*max_steps) zero-allocated.  ``mode="step"``:
        one-token decode at ``pos`` against ``cache`` (a list of
        per-layer dicts), optionally fusing the beam-predecessor
        permutation ``rows`` into every self-cache update; returns
        ``(out (B, 1, d), new_cache)``."""
        def make_layer(i):
            return TransformerDecoderLayer(
                d_ffn=self.d_ffn,
                nhead=self.nhead,
                d_model=self.d_model,
                dropout=self.dropout,
                activation=self.activation,
                normalize_before=self.normalize_before,
                name=f"layer_{i}",
            )

        if mode == "init_cache":
            B = memory.shape[0]
            # Time length padded to a lane tile (128): the K half and
            # the V half of the merged cache then both start at
            # tile-aligned lane offsets (the fused kernel slices them
            # statically); the causal pos-mask guards the pad columns.
            lp = -(-max_steps // 128) * 128
            caches = []
            for i in range(self.num_layers):
                c = make_layer(i)(None, memory, mode="init_cache")
                c["skv"] = jnp.zeros(
                    (B, self.d_model, 2 * lp), memory.dtype
                )
                caches.append(c)
            return caches
        if mode == "step":
            output = tgt
            new_caches = []
            for i in range(self.num_layers):
                output, c = make_layer(i)(
                    output,
                    None,
                    memory_key_padding_mask=memory_key_padding_mask,
                    mode="step",
                    cache=cache[i],
                    pos=pos,
                    rows=rows,
                )
                new_caches.append(c)
            output = nn.LayerNorm(dtype=output.dtype, name="norm_out")(
                output
            )
            return output, new_caches
        output = tgt
        self_attns, cross_attns = [], []
        for i in range(self.num_layers):
            output, sa, ca = make_layer(i)(
                output,
                memory,
                tgt_mask=tgt_mask,
                memory_mask=memory_mask,
                tgt_key_padding_mask=tgt_key_padding_mask,
                memory_key_padding_mask=memory_key_padding_mask,
                train=train,
            )
            self_attns.append(sa)
            cross_attns.append(ca)
        # reference applies the final decoder norm UNCONDITIONALLY
        # (Transformer.py:761: output = self.norm(output))
        output = nn.LayerNorm(dtype=output.dtype, name="norm_out")(output)
        return output, self_attns, cross_attns


class TransformerInterface(nn.Module):
    """Configurable transformer base (reference
    ``lobes/models/transformer/Transformer.py:20``): builds the
    encoder (vanilla transformer or conformer), optional decoder, and
    the positional-encoding machinery from one hyperparameter surface.
    Subclasses (TransformerASR/LM/SE/ST) override ``__call__``; the
    built submodules are ``self.encoder``, ``self.decoder``,
    ``self.positional_encoding_mod`` and (for RelPosMHAXL)
    ``self.relpos_enc``.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> class Tiny(TransformerInterface):
    ...     def __call__(self, x, train=False):
    ...         out, _ = self.encoder(x, train=train)
    ...         return out
    >>> net = Tiny(d_model=16, nhead=4, num_encoder_layers=1,
    ...            num_decoder_layers=0, d_ffn=32)
    >>> x = jnp.ones((2, 8, 16))
    >>> v = net.init(jax.random.PRNGKey(0), x)
    >>> net.apply(v, x).shape
    (2, 8, 16)
    """

    d_model: int = 512
    nhead: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    d_ffn: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    positional_encoding: str = "fixed_abs_sine"
    normalize_before: bool = True
    kernel_size: int = 31
    causal: bool = False
    encoder_module: str = "transformer"
    conformer_activation: str = "swish"
    attention_type: str = "regularMHA"
    max_length: int = 2500

    def setup(self):
        """Builds positional encoding + encoder/decoder submodules."""
        from speechbrain_tpu.nnet.attention import RelPosEncXL

        if self.positional_encoding == "fixed_abs_sine":
            self.positional_encoding_mod = PositionalEncoding(
                input_size=self.d_model, max_len=self.max_length
            )
        if self.attention_type == "RelPosMHAXL":
            self.relpos_enc = RelPosEncXL(emb_dim=self.d_model)
        if self.num_encoder_layers > 0:
            if self.encoder_module == "conformer":
                from speechbrain_tpu.lobes.models.transformer.Conformer import (  # noqa: E501
                    ConformerEncoder,
                )

                if self.attention_type != "RelPosMHAXL":
                    raise ValueError(
                        "Conformer encoder requires RelPosMHAXL attention"
                    )
                self.encoder = ConformerEncoder(
                    num_layers=self.num_encoder_layers,
                    d_model=self.d_model,
                    d_ffn=self.d_ffn,
                    nhead=self.nhead,
                    kernel_size=self.kernel_size,
                    causal=self.causal,
                    dropout=self.dropout,
                    activation=self.conformer_activation,
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
                normalize_before=self.normalize_before,
            )

    def __call__(self, *args, **kwargs):
        raise NotImplementedError(
            "Subclasses of TransformerInterface must implement __call__"
        )
