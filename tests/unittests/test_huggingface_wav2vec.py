"""HF Flax wav2vec2 wrapper tests.

Parity target: reference ``lobes/models/huggingface_wav2vec.py:56,338``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_w2v2_dir(tmp_path_factory):
    from transformers import Wav2Vec2Config

    cfg = Wav2Vec2Config(
        vocab_size=32,
        hidden_size=32,
        num_hidden_layers=1,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(16, 16),
        conv_stride=(5, 2),
        conv_kernel=(10, 3),
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        num_codevectors_per_group=8,
        num_codevector_groups=2,
        codevector_dim=16,
        proj_codevector_dim=16,
        num_negatives=4,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
    )
    d = tmp_path_factory.mktemp("w2v2")
    cfg.save_pretrained(d)
    return str(d)


def test_wav2vec2_wrapper_features(tiny_w2v2_dir):
    from speechbrain_tpu.lobes.models.huggingface_wav2vec import (
        HuggingFaceWav2Vec2,
    )

    m = HuggingFaceWav2Vec2(tiny_w2v2_dir, config_only=True, output_norm=True)
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 800)), jnp.float32
    )
    out = m(wav, jnp.asarray([1.0, 0.5]))
    assert out.shape == (2, 79, 32)
    # output_norm: per-frame zero mean.
    assert float(jnp.abs(jnp.mean(out, axis=-1)).max()) < 1e-4

    all_h = HuggingFaceWav2Vec2(
        tiny_w2v2_dir, config_only=True, output_all_hiddens=True
    )(wav)
    assert all_h.shape == (2, 2, 79, 32)  # (L+1, B, T, C)


def test_wav2vec2_wrapper_freeze_grads(tiny_w2v2_dir):
    from speechbrain_tpu.lobes.models.huggingface_wav2vec import (
        HuggingFaceWav2Vec2,
    )

    m = HuggingFaceWav2Vec2(tiny_w2v2_dir, config_only=True, freeze=True)
    wav = jnp.zeros((1, 800))

    def loss(p):
        return jnp.sum(m(wav, params=p) ** 2)

    g = jax.grad(loss)(m.params)
    assert all(
        float(jnp.abs(x).max()) == 0.0 for x in jax.tree_util.tree_leaves(g)
    )


def test_wav2vec2_pretrain_wrapper(tiny_w2v2_dir):
    from speechbrain_tpu.lobes.models.huggingface_wav2vec import (
        HuggingFaceWav2Vec2Pretrain,
    )

    p = HuggingFaceWav2Vec2Pretrain(tiny_w2v2_dir, config_only=True)
    wav = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 800)), jnp.float32
    )
    out, mask = p(wav, jnp.asarray([1.0, 0.5]), jax.random.PRNGKey(0))
    assert out.projected_states.shape == (2, 79, 16)
    assert out.projected_quantized_states.shape == (2, 79, 16)
    assert mask.shape == (2, 79) and mask.dtype == bool
    assert bool(mask.any())


def test_hf_wav2vec2_checkpoint_round_trip(tiny_w2v2_dir, tmp_path):
    """Save a tiny Flax wav2vec2 checkpoint WITH weights and reload it
    through the wrapper: parameters and features must survive the disk
    round trip exactly (guards the train_hf_wav2vec.yaml loading path,
    VERDICT round-1 item 10)."""
    import flax
    from transformers import FlaxWav2Vec2Model, Wav2Vec2Config

    from speechbrain_tpu.lobes.models.huggingface_wav2vec import (
        HuggingFaceWav2Vec2,
    )

    cfg = Wav2Vec2Config.from_pretrained(tiny_w2v2_dir)
    hf = FlaxWav2Vec2Model(cfg, seed=7)
    hf.save_pretrained(tmp_path)

    wrapper = HuggingFaceWav2Vec2(str(tmp_path))
    a = flax.traverse_util.flatten_dict(hf.params, sep="/")
    b = flax.traverse_util.flatten_dict(wrapper.model.params, sep="/")
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    wav = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 800)), jnp.float32
    )
    feats = wrapper(wav)
    # the wrapper layer-norms the input wav (do_normalize default);
    # reproduce that for the raw-model comparison
    mean = wav.mean(axis=1, keepdims=True)
    var = wav.var(axis=1, keepdims=True)
    norm_wav = (wav - mean) / jnp.sqrt(var + 1e-5)
    direct = hf(np.asarray(norm_wav)).last_hidden_state
    np.testing.assert_allclose(
        np.asarray(feats), np.asarray(direct), rtol=1e-4, atol=1e-5
    )
