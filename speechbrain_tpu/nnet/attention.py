"""Attention primitives: content/location attention for RNN decoders,
Transformer-XL relative-position MHA for Conformer, standard MHA, FFN.

All matmul-dominated (MXU); masks use a large negative fill that is
bf16-safe (-65000, mirroring the reference's fp16-aware fill,
``nnet/attention.py:447``).

Parity targets: reference ``nnet/attention.py:23`` (ContentBased),
``:110`` (LocationAware), ``:237`` (KeyValue), ``:312`` (RelPosEncXL),
``:362`` (RelPosMHAXL), ``:642`` (MultiheadAttention wrapper), ``:781``
(PositionalwiseFeedForward).
"""

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas.beam_cache import append_attend, beam_attend_step

__all__ = [
    "ContentBasedAttention",
    "LocationAwareAttention",
    "KeyValueAttention",
    "RelPosEncXL",
    "RelPosMHAXL",
    "MultiheadAttention",
    "PositionalwiseFeedForward",
]

NEG_FILL = -65000.0


def _length_mask(enc_lens, T):
    """(B,) relative lengths -> (B, T) bool mask of valid frames."""
    enc_lens = jnp.asarray(enc_lens)
    abs_lens = enc_lens * T if enc_lens.dtype in (jnp.float32, jnp.bfloat16, jnp.float16) else enc_lens
    return jnp.arange(T)[None, :] < abs_lens[:, None]


class ContentBasedAttention(nn.Module):
    """Additive (Bahdanau) attention with precomputed encoder keys.

    State = {"enc_proj": ..., "mask": ...}; create with ``init_state``.

    Reference ``nnet/attention.py:23``.
    """

    attn_dim: int
    output_dim: int
    scaling: float = 1.0

    def setup(self):
        """Flax setup: declare submodules/params."""
        self.mlp_enc = nn.Dense(self.attn_dim)
        self.mlp_dec = nn.Dense(self.attn_dim)
        self.mlp_attn = nn.Dense(1, use_bias=False)
        self.mlp_out = nn.Dense(self.output_dim)

    def init_state(self, enc_states):
        """Build the initial decoding state."""
        return {"enc_proj": self.mlp_enc(enc_states)}

    def __call__(self, enc_states, enc_lens, dec_states, state=None):
        if state is None:
            state = self.init_state(enc_states)
        enc_proj = state["enc_proj"]
        dec_proj = self.mlp_dec(dec_states)[:, None, :]
        scores = self.mlp_attn(jnp.tanh(enc_proj + dec_proj))[..., 0]
        mask = _length_mask(enc_lens, enc_states.shape[1])
        scores = jnp.where(mask, scores, NEG_FILL)
        w = jax.nn.softmax(scores * self.scaling, axis=-1)
        context = jnp.einsum("bt,btc->bc", w, enc_states)
        context = self.mlp_out(context)
        return context, w, state


class LocationAwareAttention(nn.Module):
    """Content attention + convolutional features of previous weights.

    State carries the previous attention map.  Reference
    ``nnet/attention.py:110``.
    """

    attn_dim: int
    output_dim: int
    conv_channels: int = 10
    kernel_size: int = 100
    scaling: float = 1.0

    def setup(self):
        """Flax setup: declare submodules/params."""
        self.mlp_enc = nn.Dense(self.attn_dim)
        self.mlp_dec = nn.Dense(self.attn_dim)
        self.mlp_loc = nn.Dense(self.attn_dim)
        self.conv_loc = nn.Conv(
            features=self.conv_channels,
            kernel_size=(2 * self.kernel_size + 1,),
            padding="SAME",
            use_bias=False,
        )
        self.mlp_attn = nn.Dense(1, use_bias=False)
        self.mlp_out = nn.Dense(self.output_dim)

    def init_state(self, enc_states):
        """Build the initial decoding state."""
        B, T = enc_states.shape[0], enc_states.shape[1]
        return {
            "enc_proj": self.mlp_enc(enc_states),
            "prev_attn": jnp.zeros((B, T), enc_states.dtype),
        }

    def __call__(self, enc_states, enc_lens, dec_states, state=None):
        if state is None:
            state = self.init_state(enc_states)
        enc_proj = state["enc_proj"]
        prev_attn = state["prev_attn"]
        attn_conv = self.conv_loc(prev_attn[..., None])
        loc_proj = self.mlp_loc(attn_conv)
        dec_proj = self.mlp_dec(dec_states)[:, None, :]
        scores = self.mlp_attn(
            jnp.tanh(enc_proj + dec_proj + loc_proj)
        )[..., 0]
        mask = _length_mask(enc_lens, enc_states.shape[1])
        scores = jnp.where(mask, scores, NEG_FILL)
        w = jax.nn.softmax(scores * self.scaling, axis=-1)
        context = jnp.einsum("bt,btc->bc", w, enc_states)
        context = self.mlp_out(context)
        return context, w, {"enc_proj": enc_proj, "prev_attn": w}


class KeyValueAttention(nn.Module):
    """Scaled dot-product single-head attention with learned K/V/Q maps.

    Reference ``nnet/attention.py:237``.
    """

    attn_dim: int
    output_dim: int

    def setup(self):
        """Flax setup: declare submodules/params."""
        self.key_linear = nn.Dense(self.attn_dim)
        self.query_linear = nn.Dense(self.attn_dim)
        self.value_linear = nn.Dense(self.output_dim)

    def init_state(self, enc_states):
        """Build the initial decoding state."""
        return {
            "keys": self.key_linear(enc_states),
            "values": self.value_linear(enc_states),
        }

    def __call__(self, enc_states, enc_lens, dec_states, state=None):
        if state is None:
            state = self.init_state(enc_states)
        q = self.query_linear(dec_states)[:, None, :]
        scores = jnp.einsum(
            "bqa,bta->bqt", q, state["keys"]
        ) / math.sqrt(self.attn_dim)
        mask = _length_mask(enc_lens, enc_states.shape[1])[:, None, :]
        scores = jnp.where(mask, scores, NEG_FILL)
        w = jax.nn.softmax(scores, axis=-1)
        context = jnp.einsum("bqt,btc->bqc", w, state["values"])[:, 0]
        return context, w[:, 0], state


class RelPosEncXL(nn.Module):
    """Relative sinusoidal encodings: (B, T, C) -> (1, 2T-1, C).

    Index 0 corresponds to relative position T-1 (most positive),
    index 2T-2 to -(T-1) (reference ``nnet/attention.py:312``).
    """

    emb_dim: int

    def __call__(self, x):
        T = x.shape[1]
        # reference quirk (nnet/attention.py:349-353): the FUTURE half
        # reuses sin(+p) ("same for past and future"), so the encoding
        # is symmetric in the relative distance: sin(|r|), cos(|r|)
        pos = jnp.abs(
            jnp.arange(T - 1, -T, -1, dtype=jnp.float32)
        )[:, None]
        div = jnp.exp(
            jnp.arange(0, self.emb_dim, 2, dtype=jnp.float32)
            * -(math.log(10000.0) / self.emb_dim)
        )[None, :]
        pe = jnp.zeros((2 * T - 1, self.emb_dim), jnp.float32)
        pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
        pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
        return pe[None].astype(x.dtype)


def _rel_shift(x):
    """(B, H, T, 2T-1) -> (B, H, T, T): pos_score[i, j] = f(i - j).

    Input last axis indexes relative positions T-1 ... -(T-1) (the
    RelPosEncXL order); output[i, j] picks relative position i-j, i.e.
    ``x[i, T-1-i+j]``.  Implemented as one strided slice of the
    flattened (T, L) plane: ``flat[i*(L-1) + T-1 + j]``.  On TPU this
    measures NEUTRAL vs the classic pad/reshape/slice skew (the (8,128)
    tiled layout forces a materialized copy at the 4D<->3D reshape just
    as the pad did) — kept for the fewer-ops form; the copy is
    bandwidth-bound either way (~0.1 ms/layer at conformer bench
    shapes).
    """
    B, H, T, L = x.shape
    if T == 1:
        return x[..., :1]
    flat = x.reshape(B, H, T * L)
    flat = flat[:, :, T - 1 : T - 1 + T * (L - 1)]
    return flat.reshape(B, H, T, L - 1)[..., :T]


class _BareKernel(nn.Module):
    """Declares a ``kernel`` parameter at the same tree path a
    bias-free ``nn.Dense`` would (``<name>/kernel``) without applying
    it — lets fused projections share parameters (and checkpoints)
    with the unfused formulation."""

    features: int
    init: object

    @nn.compact
    def __call__(self, d_in):
        return self.param("kernel", self.init, (d_in, self.features))


class _BareDense(nn.Module):
    """``kernel`` + ``bias`` at the tree paths an ``nn.Dense`` of the
    same name would create, without applying them — the biased
    counterpart of ``_BareKernel`` for fused projections."""

    features: int

    @nn.compact
    def __call__(self, d_in):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (d_in, self.features),
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,)
        )
        return kernel, bias


class RelPosMHAXL(nn.Module):
    """Transformer-XL multi-head attention with relative positions.

    score(i,j) = (q_i + u)·k_j + (q_i + v)·p_{i-j}, scaled by 1/sqrt(d).
    The conformer workhorse (reference ``nnet/attention.py:362``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> mha = RelPosMHAXL(embed_dim=16, num_heads=4)
    >>> x = jnp.ones((2, 6, 16))
    >>> pe = RelPosEncXL(emb_dim=16)(x)
    >>> p = mha.init(jax.random.PRNGKey(0), x, x, x, pe)
    >>> out, attn = mha.apply(p, x, x, x, pe)
    >>> out.shape
    (2, 6, 16)
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    mask_pos_future: bool = False
    # Opt-in pallas flash attention for LONG sequences: measured on the
    # v5e 1.7-1.9x faster fwd+bwd than XLA attention at T >= 1024 with
    # d_head >= 64 (PERFORMANCE.md round 3), and at parity below that
    # (round-1 rejection at T=256/d_head=36 stands).  The rel-pos bias
    # is materialized either way and folded into flash's `ab` operand;
    # attention WEIGHTS are not available on this path (returned as
    # None).  Auto-guards: only on TPU, T_q == T_k, T % 128 == 0,
    # d_head >= 64, attention dropout 0.
    use_flash: bool = False

    @nn.compact
    def __call__(
        self,
        query,
        key,
        value,
        pos_embs,
        key_padding_mask=None,
        attn_mask=None,
        train=True,
    ):
        d_head = self.embed_dim // self.num_heads
        B, T_q = query.shape[0], query.shape[1]
        T_k = key.shape[1]
        # reference packs q/k/v into one bias-free in_proj (attention.py:426)
        if query is key and key is value:
            # self-attention fast path: ONE fused (d, 3d) matmul
            # instead of three (d, d) ones — same parameters (the
            # kernels are concatenated at trace time), fewer + fatter
            # MXU calls.
            kern = nn.initializers.lecun_normal()
            ks = [
                _BareKernel(
                    features=self.embed_dim, init=kern, name=nm
                )(self.embed_dim)
                for nm in ("q_proj", "k_proj", "v_proj")
            ]
            qkv = query @ jnp.concatenate(ks, axis=1).astype(query.dtype)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = nn.Dense(
                self.embed_dim, use_bias=False, name="q_proj",
                dtype=query.dtype,
            )(query)
            k = nn.Dense(
                self.embed_dim, use_bias=False, name="k_proj",
                dtype=query.dtype,
            )(key)
            v = nn.Dense(
                self.embed_dim, use_bias=False, name="v_proj",
                dtype=query.dtype,
            )(value)
        p = nn.Dense(self.embed_dim, use_bias=False, name="pos_proj", dtype=query.dtype)(
            pos_embs
        )
        pos_bias_u = self.param(
            "pos_bias_u",
            nn.initializers.zeros,
            (self.num_heads, d_head),
        ).astype(query.dtype)
        pos_bias_v = self.param(
            "pos_bias_v",
            nn.initializers.zeros,
            (self.num_heads, d_head),
        ).astype(query.dtype)
        q = q.reshape(B, T_q, self.num_heads, d_head)
        k = k.reshape(B, T_k, self.num_heads, d_head)
        v = v.reshape(B, T_k, self.num_heads, d_head)
        p = p.reshape(p.shape[0], p.shape[1], self.num_heads, d_head)
        # Long sequences: the blocked Pallas kernel with IN-KERNEL
        # rel-pos bias (never materializes (T, 2T-1)/(T, T) tensors).
        # Measured fwd+bwd on v5e (PERFORMANCE.md round 5): 11.5x the
        # XLA path at T=1024, but 0.73x at the conformer's T=256 —
        # where the materialized einsum+rel_shift path is already
        # optimal — hence the T >= 512 guard.
        relpos_pallas_ok = (
            jax.default_backend() == "tpu"
            and T_q == T_k
            and T_q % 128 == 0
            and 512 <= T_q <= 1024
            and attn_mask is None
            and (self.dropout == 0.0 or not train)
        )
        if relpos_pallas_ok:
            from speechbrain_tpu.ops.pallas.relpos_attention import (
                relpos_attention,
            )

            if key_padding_mask is not None:
                madd = jnp.where(
                    key_padding_mask, NEG_FILL, 0.0
                ).astype(jnp.float32)
            else:
                madd = jnp.zeros((B, T_k), jnp.float32)
            out = relpos_attention(
                jnp.swapaxes(q, 1, 2),
                jnp.swapaxes(k, 1, 2),
                jnp.swapaxes(v, 1, 2),
                jnp.swapaxes(p[0], 0, 1),
                pos_bias_u,
                pos_bias_v,
                madd,
                1.0 / math.sqrt(self.embed_dim),
                self.mask_pos_future,
            )
            out = jnp.swapaxes(out, 1, 2).reshape(
                B, T_q, self.embed_dim
            ).astype(query.dtype)
            out = nn.Dense(
                self.embed_dim, name="out_proj", dtype=query.dtype
            )(out)
            return out, None
        # NOTE: a gathered-(T_q, T_k, H, D) position formulation was
        # benchmarked and REGRESSES the backward ~3x (gather/scatter
        # VJP); the (B, H, T, 2T-1) einsum + rel_shift is the fast path
        # on TPU at conformer sequence lengths.
        pos_score = jnp.einsum(
            "bqhd,zlhd->bhql", q + pos_bias_v[None, None], p
        )
        pos_score = _rel_shift(pos_score)
        flash_ok = (
            self.use_flash
            and jax.default_backend() == "tpu"
            and T_q == T_k
            and T_q % 128 == 0
            and d_head >= 64
            and (self.dropout == 0.0 or not train)
        )
        if flash_ok:
            # Fold every mask into flash's additive `ab` bias; flash
            # computes softmax((q k^T + ab) * sm_scale) v in one
            # streaming kernel (no (B, H, T, T) attention matrix in
            # HBM).
            # bf16 bias: halves the (B, H, T, T) HBM traffic; flash
            # upcasts internally for the softmax accumulation
            ab = jnp.asarray(pos_score, jnp.bfloat16)
            if attn_mask is not None:
                ab = jnp.where(attn_mask[None, None], NEG_FILL, ab)
            if key_padding_mask is not None:
                ab = jnp.where(
                    key_padding_mask[:, None, None, :], NEG_FILL, ab
                )
            if self.mask_pos_future:
                causal = (
                    jnp.arange(T_k)[None, :] > jnp.arange(T_q)[:, None]
                )
                ab = jnp.where(causal[None, None], NEG_FILL, ab)
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention,
            )

            out = flash_attention(
                jnp.swapaxes(q + pos_bias_u[None, None], 1, 2),
                jnp.swapaxes(k, 1, 2),
                jnp.swapaxes(v, 1, 2),
                ab=ab,
                sm_scale=1.0 / math.sqrt(self.embed_dim),
            )
            out = jnp.swapaxes(out, 1, 2).reshape(
                B, T_q, self.embed_dim
            )
            out = nn.Dense(
                self.embed_dim, name="out_proj", dtype=query.dtype
            )(out)
            return out, None
        content_score = jnp.einsum(
            "bqhd,bkhd->bhqk", q + pos_bias_u[None, None], k
        )
        # reference scales by 1/sqrt(embed_dim), NOT per-head dim
        # (attention.py:453: self.scale = 1/math.sqrt(self.embed_dim))
        scores = (content_score + pos_score) / math.sqrt(self.embed_dim)
        if attn_mask is not None:
            scores = jnp.where(attn_mask[None, None], NEG_FILL, scores)
        if key_padding_mask is not None:
            # True = PAD (torch convention)
            scores = jnp.where(
                key_padding_mask[:, None, None, :], NEG_FILL, scores
            )
        if self.mask_pos_future:
            causal = (
                jnp.arange(T_k)[None, :] > jnp.arange(T_q)[:, None]
            )
            scores = jnp.where(causal[None, None], NEG_FILL, scores)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = nn.Dropout(rate=self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(B, T_q, self.embed_dim)
        out = nn.Dense(self.embed_dim, name="out_proj", dtype=query.dtype)(out)
        return out, attn


class MultiheadAttention(nn.Module):
    """Standard MHA wrapper (reference ``nnet/attention.py:642``).

    Masks: key_padding_mask (B, T_k) True=pad; attn_mask (T_q, T_k)
    True=disallowed.
    """

    nhead: int
    d_model: int
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        query,
        key,
        value,
        key_padding_mask=None,
        attn_mask=None,
        train=True,
        return_attn_weights=True,
        mode="full",
        kv_cache=None,
        cache_index=None,
        rows=None,
        kv_dst=None,
    ):
        """``mode`` selects the serving-path variants (all share the
        same projection parameters as the ``"full"`` training path):

        - ``"full"``: standard batched attention (default).
        - ``"project_kv"``: return the projected ``(k, v)`` of
          ``key``/``value`` as ``(B, T, nhead, d_head)`` — used once
          per autoregressive search to precompute cross-attention
          caches.
        - ``"step"``: one-token incremental decode at ``cache_index``.

          Self-attention (``key``/``value`` given): ``kv_cache`` is a
          MERGED TIME-MINOR cache ``(B, d_model, 2L)`` — K at lanes
          [0, L), V at [L, 2L) (see ``ops.pallas.beam_cache``); the
          single-token K/V projections are written at column
          ``cache_index`` and later positions are causally masked.
          With ``rows`` (an ``(B,)`` int32 predecessor map from beam
          search), the cache is first permuted so output row i
          descends from cache row ``rows[i]`` — fused with the append
          and the attention read in one Pallas kernel on TPU.
          Returns ``(out, None, new_kv_cache)``.

          Cross-attention (``key``/``value`` None): ``kv_cache=(k, v)``
          of shape ``(B_kv, L, nhead, d_head)``, attended as-is.  May
          be GROUPED: ``B == B_kv * group`` — consecutive groups of
          ``group`` query rows share one KV row (beam search: all
          beams of a batch item attend the same encoder states, so the
          cache is stored once per item instead of once per beam,
          cutting its HBM read traffic ``group``x and turning the
          per-beam matvec into a (group, L) matmul).  Returns
          ``(out, attn_weights, (k, v))``.
        """
        d_head = self.d_model // self.nhead
        if mode == "project_kv":
            B, T_k = key.shape[0], key.shape[1]
            k = nn.Dense(self.d_model, name="k_proj", dtype=key.dtype)(key)
            v = nn.Dense(self.d_model, name="v_proj", dtype=value.dtype)(
                value
            )
            return (
                k.reshape(B, T_k, self.nhead, d_head),
                v.reshape(B, T_k, self.nhead, d_head),
            )
        if mode == "step":
            B = query.shape[0]
            if key is not None:
                if key is not query or (
                    value is not None and value is not query
                ):
                    # The fused-QKV step path projects K/V from `query`;
                    # distinct key/value tensors would be silently
                    # ignored (advisor r4).
                    raise NotImplementedError(
                        "step-mode self-attention requires "
                        "key is query (and value is query); got "
                        "distinct tensors"
                    )
                # Self-attention step over the merged time-minor cache.
                # Fused qkv: ONE (d, 3d) matmul instead of three (d, d)
                # ones — at decode-step shapes each MXU call is
                # latency-bound, so fewer + fatter ops win
                # (PERFORMANCE.md round 3); parameters stay at the
                # q_proj/k_proj/v_proj paths of the unfused path.
                d_in = query.shape[-1]
                kb = [
                    _BareDense(features=self.d_model, name=nm)(d_in)
                    for nm in ("q_proj", "k_proj", "v_proj")
                ]
                w = jnp.concatenate(
                    [x[0] for x in kb], axis=1
                ).astype(query.dtype)
                b = jnp.concatenate([x[1] for x in kb]).astype(
                    query.dtype
                )
                qkv = (query.reshape(B, d_in) @ w) + b  # (B, 3d)
                q_t, k_t, v_t = jnp.split(qkv, 3, axis=-1)
                q_t = q_t * (1.0 / math.sqrt(d_head))
                if rows is not None:
                    # kv_dst (ping-pong decode): write the new cache
                    # in place into a disjoint buffer so the search's
                    # while-carry needs no full-cache copies.
                    out_t, kv_all = beam_attend_step(
                        kv_cache, rows, q_t, k_t, v_t, cache_index,
                        self.nhead, dst=kv_dst,
                    )
                else:
                    out_t, kv_all = append_attend(
                        kv_cache, cache_index,
                        q_t.astype(kv_cache.dtype),
                        k_t.astype(kv_cache.dtype),
                        v_t.astype(kv_cache.dtype),
                        self.nhead,
                    )
                out = nn.Dense(
                    self.d_model, name="out_proj", dtype=query.dtype
                )(out_t.astype(query.dtype).reshape(B, 1, self.d_model))
                return out, None, kv_all
            k_all, v_all = kv_cache
            L = k_all.shape[1]
            q = nn.Dense(
                self.d_model, name="q_proj", dtype=query.dtype
            )(query).reshape(B, 1, self.nhead, d_head)
            B_kv = k_all.shape[0]
            if key is None and B_kv != B:
                # Grouped cross-attention: one KV row per `group`
                # consecutive query rows (see docstring).
                group = B // B_kv
                qg = q.reshape(B_kv, group, self.nhead, d_head)
                scores = jnp.einsum(
                    "bghd,bkhd->bhgk", qg, k_all
                ) / math.sqrt(d_head)
                if key_padding_mask is not None:
                    mg = key_padding_mask.reshape(B_kv, group, L)
                    scores = jnp.where(
                        mg[:, None], NEG_FILL, scores
                    )
                attn = jax.nn.softmax(scores, axis=-1)
                out = jnp.einsum(
                    "bhgk,bkhd->bghd", attn, v_all
                ).reshape(B, 1, self.d_model)
                out = nn.Dense(
                    self.d_model, name="out_proj", dtype=query.dtype
                )(out)
                return (
                    out,
                    attn.mean(axis=1).reshape(B, 1, L),
                    (k_all, v_all),
                )
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k_all
            ) / math.sqrt(d_head)
            if key_padding_mask is not None:
                scores = jnp.where(
                    key_padding_mask[:, None, None, :], NEG_FILL, scores
                )
            attn = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v_all).reshape(
                B, 1, self.d_model
            )
            out = nn.Dense(
                self.d_model, name="out_proj", dtype=query.dtype
            )(out)
            return out, attn.mean(axis=1), (k_all, v_all)
        B, T_q = query.shape[0], query.shape[1]
        T_k = key.shape[1]
        q = nn.Dense(self.d_model, name="q_proj", dtype=query.dtype)(query)
        k = nn.Dense(self.d_model, name="k_proj", dtype=query.dtype)(key)
        v = nn.Dense(self.d_model, name="v_proj", dtype=query.dtype)(value)
        q = q.reshape(B, T_q, self.nhead, d_head)
        k = k.reshape(B, T_k, self.nhead, d_head)
        v = v.reshape(B, T_k, self.nhead, d_head)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d_head)
        if attn_mask is not None:
            scores = jnp.where(attn_mask[None, None], NEG_FILL, scores)
        if key_padding_mask is not None:
            scores = jnp.where(
                key_padding_mask[:, None, None, :], NEG_FILL, scores
            )
        attn = jax.nn.softmax(scores, axis=-1)
        attn = nn.Dropout(rate=self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(
            B, T_q, self.d_model
        )
        out = nn.Dense(self.d_model, name="out_proj", dtype=query.dtype)(out)
        if return_attn_weights:
            return out, attn.mean(axis=1)
        return out


class PositionalwiseFeedForward(nn.Module):
    """Two-layer position-wise FFN (reference ``nnet/attention.py:781``)."""

    d_ffn: int
    dropout: float = 0.0
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, train=True):
        d_model = x.shape[-1]
        h = nn.Dense(self.d_ffn, dtype=x.dtype)(x)
        if self.activation == "relu":
            h = jax.nn.relu(h)
        elif self.activation == "gelu":
            h = jax.nn.gelu(h)
        elif self.activation == "swish":
            h = h * jax.nn.sigmoid(h)
        elif self.activation == "leaky_relu":
            h = jax.nn.leaky_relu(h)
        else:
            raise ValueError(f"Unknown activation {self.activation}")
        h = nn.Dropout(rate=self.dropout, deterministic=not train)(h)
        h = nn.Dense(d_model, dtype=x.dtype)(h)
        return h
