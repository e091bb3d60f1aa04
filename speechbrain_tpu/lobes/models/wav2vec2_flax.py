"""From-scratch Flax wav2vec 2.0 encoder in the HF parameter layout.

Role counterpart of the HF ``FlaxWav2Vec2Model`` forward path (conv
feature encoder -> feature projection -> convolutional-relative-position
transformer encoder), written from scratch against the published
wav2vec 2.0 architecture (Baevski et al., 2020) with parameter names
chosen to match the HF Flax checkpoint tree EXACTLY — so a local
HF-layout directory (``config.json`` + ``flax_model.msgpack``) loads
with zero ``transformers`` dependency:

    model, params = load_hf_wav2vec2("/path/to/model_dir")
    feats = model.apply({"params": params}, wav)

Numerical parity with ``transformers.FlaxWav2Vec2Model`` is pinned by
``tests/unittests/test_huggingface_wav2vec.py`` (the parity test runs
whenever ``transformers`` is importable; the fixture tests run always).

Reference counterpart: ``lobes/models/huggingface_wav2vec.py:56`` wraps
the torch HF implementation; this module removes the external-runtime
requirement for the serving path.
"""

import json
import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Wav2Vec2Config",
    "FlaxWav2Vec2Module",
    "load_hf_wav2vec2",
    "hf_wav2vec2_feat_lengths",
]


class Wav2Vec2Config:
    """Minimal config mirror of the HF ``Wav2Vec2Config`` fields the
    forward path needs; unknown json keys are kept as attributes."""

    DEFAULTS = dict(
        vocab_size=32,
        hidden_size=768,
        num_hidden_layers=12,
        num_attention_heads=12,
        intermediate_size=3072,
        hidden_act="gelu",
        layer_norm_eps=1e-5,
        feat_extract_norm="group",
        feat_extract_activation="gelu",
        conv_dim=(512, 512, 512, 512, 512, 512, 512),
        conv_stride=(5, 2, 2, 2, 2, 2, 2),
        conv_kernel=(10, 3, 3, 3, 3, 3, 3),
        conv_bias=False,
        num_conv_pos_embeddings=128,
        num_conv_pos_embedding_groups=16,
        do_stable_layer_norm=False,
    )

    def __init__(self, **kwargs):
        merged = {**self.DEFAULTS, **kwargs}
        for k, v in merged.items():
            setattr(self, k, v)

    @classmethod
    def from_json(cls, path):
        """Load from an HF-layout ``config.json``."""
        with open(path) as f:
            return cls(**json.load(f))


def _act(name):
    return {
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
        "relu": jax.nn.relu,
        "swish": jax.nn.silu,
        "silu": jax.nn.silu,
    }[name]


class _ConvLayer(nn.Module):
    """One conv block of the feature encoder.

    norm: "group" (GroupNorm, HF first layer of the base config),
    "layer" (per-layer LayerNorm over channels), or "none".
    """

    features: int
    kernel: int
    stride: int
    use_bias: bool
    norm: str
    eps: float
    activation: str

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel,),
            strides=(self.stride,),
            padding="VALID",
            use_bias=self.use_bias,
            name="conv",
        )(x)
        if self.norm == "group":
            x = nn.GroupNorm(
                num_groups=self.features,
                epsilon=self.eps,
                name="layer_norm",
            )(x)
        elif self.norm == "layer":
            x = nn.LayerNorm(epsilon=self.eps, name="layer_norm")(x)
        return _act(self.activation)(x)


class _FeatureEncoder(nn.Module):
    config: Any

    @nn.compact
    def __call__(self, x):
        c = self.config
        x = x[:, :, None]  # (B, samples, 1)
        for i in range(len(c.conv_dim)):
            if c.feat_extract_norm == "group":
                norm = "group" if i == 0 else "none"
            else:
                norm = "layer"
            x = _ConvLayer(
                features=c.conv_dim[i],
                kernel=c.conv_kernel[i],
                stride=c.conv_stride[i],
                use_bias=bool(c.conv_bias),
                norm=norm,
                eps=c.layer_norm_eps,
                activation=c.feat_extract_activation,
                name=f"conv_layers_{i}",
            )(x)
        return x


class _FeatureProjection(nn.Module):
    config: Any

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(
            epsilon=self.config.layer_norm_eps, name="layer_norm"
        )(x)
        x = nn.Dense(self.config.hidden_size, name="projection")(x)
        return x


class _PosConvEmbed(nn.Module):
    """HF nesting shim: ``pos_conv_embed/conv/{weight_v, weight_g,
    bias}``."""

    config: Any

    @nn.compact
    def __call__(self, x):
        return _PosConv(self.config, name="conv")(x)


class _PosConv(nn.Module):
    """Grouped convolutional relative position embedding with
    weight-normalized kernel (stored as ``weight_v``/``weight_g`` like
    the HF Flax checkpoint)."""

    config: Any

    @nn.compact
    def __call__(self, x):
        c = self.config
        d = c.hidden_size
        k = c.num_conv_pos_embeddings
        groups = c.num_conv_pos_embedding_groups
        # HF checkpoint layout: torch weight_norm with dim=2 on the
        # (out, in/groups, K) conv weight — weight_v (d, d/g, K),
        # weight_g (1, 1, K), normalized per kernel POSITION (the
        # wav2vec2 pos-conv quirk), then transposed to flax (K, in/g,
        # out) for the conv.
        weight_v = self.param(
            "weight_v",
            nn.initializers.he_normal(),
            (d, d // groups, k),
        )
        weight_g = self.param(
            "weight_g", nn.initializers.ones, (1, 1, k)
        )
        bias = self.param("bias", nn.initializers.zeros, (d,))
        norm = jnp.sqrt(
            jnp.sum(jnp.square(weight_v), axis=(0, 1), keepdims=True)
        )
        kernel = jnp.transpose(weight_v / norm * weight_g, (2, 1, 0))
        pad = k // 2
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(1,),
            padding=[(pad, pad)],
            feature_group_count=groups,
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        y = y + bias.astype(y.dtype)
        if k % 2 == 0:  # remove the extra frame from even kernels
            y = y[:, :-1]
        return _act(c.feat_extract_activation)(y)


class _Attention(nn.Module):
    config: Any

    @nn.compact
    def __call__(self, x, attention_bias=None):
        c = self.config
        d = c.hidden_size
        h = c.num_attention_heads
        dh = d // h
        B, T = x.shape[0], x.shape[1]
        q = nn.Dense(d, name="q_proj")(x) * (dh**-0.5)
        k = nn.Dense(d, name="k_proj")(x)
        v = nn.Dense(d, name="v_proj")(x)
        q = q.reshape(B, T, h, dh)
        k = k.reshape(B, T, h, dh)
        v = v.reshape(B, T, h, dh)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        if attention_bias is not None:
            scores = scores + attention_bias
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, T, d)
        return nn.Dense(d, name="out_proj")(out)


class _FeedForward(nn.Module):
    config: Any

    @nn.compact
    def __call__(self, x):
        c = self.config
        x = nn.Dense(c.intermediate_size, name="intermediate_dense")(x)
        x = _act(c.hidden_act)(x)
        return nn.Dense(c.hidden_size, name="output_dense")(x)


class _EncoderLayer(nn.Module):
    """Post-norm encoder layer (``do_stable_layer_norm=False``)."""

    config: Any

    @nn.compact
    def __call__(self, x, attention_bias=None):
        eps = self.config.layer_norm_eps
        residual = x
        x = _Attention(self.config, name="attention")(
            x, attention_bias
        )
        x = residual + x
        x = nn.LayerNorm(epsilon=eps, name="layer_norm")(x)
        x = x + _FeedForward(self.config, name="feed_forward")(x)
        return nn.LayerNorm(epsilon=eps, name="final_layer_norm")(x)


class _EncoderLayerStable(nn.Module):
    """Pre-norm encoder layer (``do_stable_layer_norm=True``)."""

    config: Any

    @nn.compact
    def __call__(self, x, attention_bias=None):
        eps = self.config.layer_norm_eps
        residual = x
        x = nn.LayerNorm(epsilon=eps, name="layer_norm")(x)
        x = _Attention(self.config, name="attention")(
            x, attention_bias
        )
        x = residual + x
        residual = x
        x = nn.LayerNorm(epsilon=eps, name="final_layer_norm")(x)
        x = _FeedForward(self.config, name="feed_forward")(x)
        return residual + x


class _Encoder(nn.Module):
    config: Any

    @nn.compact
    def __call__(self, x, attention_mask=None, output_hidden_states=False):
        c = self.config
        stable = bool(c.do_stable_layer_norm)
        if attention_mask is not None:
            x = jnp.where(attention_mask[..., None] > 0, x, 0.0)
            bias = jnp.where(
                attention_mask[:, None, None, :] > 0,
                0.0,
                jnp.finfo(jnp.float32).min,
            )
        else:
            bias = None
        x = x + _PosConvEmbed(c, name="pos_conv_embed")(x)
        if not stable:
            x = nn.LayerNorm(
                epsilon=c.layer_norm_eps, name="layer_norm"
            )(x)
        hiddens = [x]
        layer_cls = _EncoderLayerStable if stable else _EncoderLayer
        for i in range(c.num_hidden_layers):
            x = layer_cls(c, name=f"layers_{i}")(x, bias)
            hiddens.append(x)
        if stable:
            x = nn.LayerNorm(
                epsilon=c.layer_norm_eps, name="layer_norm"
            )(x)
            hiddens[-1] = x
        if output_hidden_states:
            return x, hiddens
        return x, None


class FlaxWav2Vec2Module(nn.Module):
    """HF-layout wav2vec 2.0 forward: wav (B, samples) -> hidden states
    (B, T, hidden_size).  ``output_hidden_states`` returns the per-layer
    stack like the HF model's ``hidden_states`` tuple."""

    config: Any

    @nn.compact
    def __call__(
        self,
        wav,
        attention_mask=None,
        output_hidden_states=False,
        freeze_feature_encoder=False,
    ):
        c = self.config
        feats = _FeatureEncoder(c, name="feature_extractor")(wav)
        if freeze_feature_encoder:
            feats = jax.lax.stop_gradient(feats)
        x = _FeatureProjection(c, name="feature_projection")(feats)
        if attention_mask is not None:
            attention_mask = _downsample_mask(
                c, attention_mask, x.shape[1]
            )
        x, hiddens = _Encoder(c, name="encoder")(
            x,
            attention_mask=attention_mask,
            output_hidden_states=output_hidden_states,
        )
        return x, hiddens


def hf_wav2vec2_feat_lengths(config, sample_lengths):
    """Conv-stack output lengths for given sample counts (the HF
    ``_get_feat_extract_output_lengths`` formula)."""
    lengths = jnp.asarray(sample_lengths)
    for kernel, stride in zip(config.conv_kernel, config.conv_stride):
        lengths = (lengths - kernel) // stride + 1
    return lengths


def _downsample_mask(config, attention_mask, T_out):
    """Sample-level mask (B, samples) -> frame-level mask (B, T_out),
    marking the first ``feat_lengths`` frames valid (HF semantics)."""
    lens = hf_wav2vec2_feat_lengths(
        config, jnp.sum(attention_mask, axis=-1)
    )
    return (
        jnp.arange(T_out)[None, :] < lens[:, None]
    ).astype(attention_mask.dtype)


def _restore_msgpack(path):
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_hf_wav2vec2(source):
    """Load an HF-layout local dir (``config.json`` +
    ``flax_model.msgpack``) with no ``transformers`` import.

    Returns ``(module, params)``; run as
    ``module.apply({"params": params}, wav)``.
    """
    config = Wav2Vec2Config.from_json(
        os.path.join(source, "config.json")
    )
    module = FlaxWav2Vec2Module(config)
    params = _restore_msgpack(
        os.path.join(source, "flax_model.msgpack")
    )
    # some checkpoints nest under "params"
    if "params" in params and "feature_extractor" not in params:
        params = params["params"]
    params = _adapt_param_tree(params)
    return module, params


def _adapt_param_tree(params):
    """Flatten the HF collection nesting into this module's tree.

    The HF Flax tree matches ours except that conv feature layers live
    under ``feature_extractor/conv_layers/<i>`` (ours:
    ``conv_layers_<i>``), encoder layers under ``encoder/layers/<i>``
    (ours: ``layers_<i>``), and the pos-conv under
    ``encoder/pos_conv_embed/conv`` (ours flat name
    ``pos_conv_embed/conv``).  ``masked_spec_embed`` (training-time
    masking) is dropped.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for path, value in flat.items():
        parts = list(path)
        if parts[0] == "masked_spec_embed":
            continue
        if parts[0] == "feature_extractor" and parts[1] == "conv_layers":
            parts = (
                [parts[0], f"conv_layers_{parts[2]}"] + parts[3:]
            )
        if parts[0] == "encoder" and parts[1] == "layers":
            parts = [parts[0], f"layers_{parts[2]}"] + parts[3:]
        out[tuple(parts)] = jnp.asarray(value)
    return flax.traverse_util.unflatten_dict(out)
