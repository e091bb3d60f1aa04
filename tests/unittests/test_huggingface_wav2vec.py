"""HF Flax wav2vec2 wrapper tests.

Parity target: reference ``lobes/models/huggingface_wav2vec.py:56,338``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _importorskip_transformers():
    """importorskip that also skips on non-ImportError failures: this
    image's transformers can raise ValueError from its dependency
    version checks at import time, which pytest.importorskip does not
    catch."""
    try:
        import transformers  # noqa: F401

        return transformers
    except Exception as e:  # pragma: no cover - env-dependent
        pytest.skip(f"transformers unavailable: {e!r}")

# transformers-dependent tests skip individually (via this fixture);
# the transformers-FREE fixture tests at the bottom always execute.


@pytest.fixture(scope="module")
def tiny_w2v2_dir(tmp_path_factory):
    _importorskip_transformers()
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

    _importorskip_transformers()
    from transformers import FlaxWav2Vec2Model, Wav2Vec2Config

    from speechbrain_tpu.lobes.models.huggingface_wav2vec import (
        HuggingFaceWav2Vec2,
    )

    cfg = Wav2Vec2Config.from_pretrained(tiny_w2v2_dir)
    hf = FlaxWav2Vec2Model(cfg, seed=7)
    hf.save_pretrained(tmp_path)

    wrapper = HuggingFaceWav2Vec2(str(tmp_path))
    # the native backend stores the checkpoint tree in its own module
    # layout; compare through the same adapter it loads with
    from speechbrain_tpu.lobes.models.wav2vec2_flax import (
        _adapt_param_tree,
    )

    a = flax.traverse_util.flatten_dict(
        _adapt_param_tree(dict(hf.params)), sep="/"
    )
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


# ---------------------------------------------------------------------------
# transformers-free HF-layout loading (speechbrain_tpu.lobes.models
# .wav2vec2_flax): these tests run with or without transformers.
# ---------------------------------------------------------------------------


def _tiny_cfg_dict():
    return dict(
        vocab_size=32,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=[16, 16],
        conv_stride=[5, 2],
        conv_kernel=[10, 3],
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
    )


def test_wav2vec2_fixture_loads_without_transformers(tmp_path):
    """HF-layout fixture (config.json + flax msgpack) built with flax
    alone drives the from-scratch loader end to end — no transformers
    import anywhere on this path."""
    import json as _json

    from flax import serialization

    from speechbrain_tpu.lobes.models.wav2vec2_flax import (
        FlaxWav2Vec2Module,
        Wav2Vec2Config,
        hf_wav2vec2_feat_lengths,
        load_hf_wav2vec2,
    )

    cfg = Wav2Vec2Config(**_tiny_cfg_dict())
    module = FlaxWav2Vec2Module(cfg)
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 800)), jnp.float32
    )
    params = module.init(jax.random.PRNGKey(0), wav)["params"]
    d = tmp_path / "w2v2"
    d.mkdir()
    (d / "config.json").write_text(_json.dumps(_tiny_cfg_dict()))
    (d / "flax_model.msgpack").write_bytes(
        serialization.msgpack_serialize(
            jax.tree_util.tree_map(np.asarray, dict(params))
        )
    )
    model, loaded = load_hf_wav2vec2(str(d))
    out, _ = model.apply({"params": loaded}, wav)
    T = int(hf_wav2vec2_feat_lengths(cfg, 800))
    assert out.shape == (2, T, 32)
    ref_out, _ = module.apply({"params": params}, wav)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref_out), rtol=1e-6, atol=1e-6
    )


def test_wav2vec2_flax_matches_transformers(tmp_path):
    """The from-scratch module must numerically match
    transformers.FlaxWav2Vec2Model on a save_pretrained checkpoint
    (loaded back via the transformers-free loader).  HF's Flax port
    only implements the ``do_stable_layer_norm=True`` (lv60) layout, so
    parity is pinned there; the post-norm (base) layout is covered by
    the fixture round-trip test above."""
    transformers = _importorskip_transformers()
    from transformers import FlaxWav2Vec2Model, Wav2Vec2Config as HFCfg

    from speechbrain_tpu.lobes.models.wav2vec2_flax import (
        load_hf_wav2vec2,
    )

    stable = True
    cfg = HFCfg(**{**_tiny_cfg_dict(), "do_stable_layer_norm": stable,
                   "feat_extract_norm": "layer" if stable else "group"})
    hf = FlaxWav2Vec2Model(cfg, seed=0)
    d = tmp_path / f"w2v2_{stable}"
    hf.save_pretrained(str(d))
    wav = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 1200)), jnp.float32
    )
    mask = jnp.asarray([[1] * 1200, [1] * 900 + [0] * 300], jnp.int32)
    ours_mod, ours_params = load_hf_wav2vec2(str(d))
    ours, ours_hidden = ours_mod.apply(
        {"params": ours_params},
        wav,
        attention_mask=mask,
        output_hidden_states=True,
    )
    theirs = hf(
        wav, attention_mask=mask, output_hidden_states=True, train=False
    )
    np.testing.assert_allclose(
        np.asarray(ours),
        np.asarray(theirs.last_hidden_state),
        rtol=2e-4,
        atol=2e-5,
    )
    assert len(ours_hidden) == len(theirs.hidden_states)
    for o, t in zip(ours_hidden, theirs.hidden_states):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(t), rtol=2e-4, atol=2e-5
        )


def test_wav2vec2_wrapper_native_backend(tmp_path, monkeypatch):
    """HuggingFaceWav2Vec2 must work end to end when transformers is
    NOT importable: the native backend loads the HF-layout fixture."""
    import json as _json
    import sys

    from flax import serialization

    from speechbrain_tpu.lobes.models.wav2vec2_flax import (
        FlaxWav2Vec2Module,
        Wav2Vec2Config,
    )

    cfg = Wav2Vec2Config(**_tiny_cfg_dict())
    module = FlaxWav2Vec2Module(cfg)
    wav = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 800)), jnp.float32
    )
    params = module.init(jax.random.PRNGKey(0), wav)["params"]
    d = tmp_path / "w2v2"
    d.mkdir()
    (d / "config.json").write_text(_json.dumps(_tiny_cfg_dict()))
    (d / "preprocessor_config.json").write_text(
        _json.dumps({"do_normalize": True})
    )
    (d / "flax_model.msgpack").write_bytes(
        serialization.msgpack_serialize(
            jax.tree_util.tree_map(np.asarray, dict(params))
        )
    )
    # make `import transformers` fail inside the wrapper
    monkeypatch.setitem(sys.modules, "transformers", None)

    from speechbrain_tpu.lobes.models.huggingface_wav2vec import (
        HuggingFaceWav2Vec2,
    )

    m = HuggingFaceWav2Vec2(str(d), output_norm=True)
    out = m(wav, jnp.asarray([1.0, 0.5]))
    assert out.shape[0] == 2 and out.shape[-1] == 32
    assert float(jnp.abs(jnp.mean(out, axis=-1)).max()) < 1e-4
    all_h = HuggingFaceWav2Vec2(str(d), output_all_hiddens=True)(wav)
    assert all_h.shape[0] == cfg.num_hidden_layers + 1
