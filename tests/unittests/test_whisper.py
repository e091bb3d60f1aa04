"""Whisper lobe + searcher tests.

Parity targets: reference ``lobes/models/huggingface_whisper.py`` (mel
frontend, encoder/decoder API) and ``decoders/seq2seq.py:199,1401``
(Whisper greedy/beam searchers).
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

from speechbrain_tpu.lobes.models.whisper import (
    Whisper,
    log_mel_spectrogram,
    mel_filters_slaney,
    pad_or_trim,
)


def _tiny_whisper(vocab=32, **over):
    kwargs = dict(
        vocab_size=vocab,
        d_model=16,
        nhead=4,
        encoder_layers=1,
        decoder_layers=1,
        d_ffn=32,
        n_samples=1600,
        max_source_positions=5,
        max_target_positions=64,
    )
    kwargs.update(over)
    return Whisper(**kwargs)


def test_mel_filters_match_transformers():
    transformers = _importorskip_transformers()
    from transformers.audio_utils import mel_filter_bank

    ref = mel_filter_bank(
        num_frequency_bins=201,
        num_mel_filters=80,
        min_frequency=0.0,
        max_frequency=8000.0,
        sampling_rate=16000,
        norm="slaney",
        mel_scale="slaney",
    ).T
    ours = mel_filters_slaney(80)
    assert np.abs(ref - ours).max() < 1e-6


def test_log_mel_matches_whisper_feature_extractor():
    transformers = _importorskip_transformers()
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor()
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(16000).astype(np.float32) * 0.1
    ref = fe(wav, sampling_rate=16000, return_tensors="np").input_features[0]
    ours = log_mel_spectrogram(
        pad_or_trim(wav[None, :]), mel_filters_slaney(80)
    )[0]
    # ref is (n_mels, T); ours (T, n_mels)
    assert np.abs(ref.T - np.asarray(ours)).max() < 1e-3


def test_pad_or_trim():
    x = jnp.ones((2, 10))
    assert pad_or_trim(x, 16).shape == (2, 16)
    assert pad_or_trim(x, 4).shape == (2, 4)
    assert float(pad_or_trim(x, 16)[0, -1]) == 0.0


def test_whisper_forward_and_freeze_grads():
    model = _tiny_whisper()
    wav = jnp.zeros((2, 1600))
    ids = jnp.zeros((2, 3), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), wav, ids, train=False)
    enc, logits, attn = model.apply(params, wav, ids, train=False)
    assert enc.shape == (2, 5, 16)
    assert logits.shape == (2, 3, 32)

    frozen = _tiny_whisper(freeze=True)

    def loss(p):
        _, lg, _ = frozen.apply(p, wav, ids, train=False)
        return jnp.sum(lg**2)

    g = jax.grad(loss)(params)
    assert all(
        float(jnp.abs(x).max()) == 0.0 for x in jax.tree_util.tree_leaves(g)
    )


def test_whisper_encoder_only():
    model = _tiny_whisper(encoder_only=True)
    wav = jnp.zeros((1, 1600))
    params = model.init(jax.random.PRNGKey(0), wav, train=False)
    enc = model.apply(params, wav, train=False)
    assert enc.shape == (1, 5, 16)


class _BoundWhisper:
    """Bind a flax Whisper to params, exposing forward_decoder."""

    def __init__(self, model, params):
        self.model = model
        self.params = params

    def forward_decoder(self, enc_states, ids):
        return self.model.apply(
            self.params,
            enc_states,
            ids,
            train=False,
            method=self.model.forward_decoder,
        )


def test_whisper_greedy_and_beam_search():
    from speechbrain_tpu.decoders.seq2seq import (
        S2SWhisperBeamSearch,
        S2SWhisperGreedySearch,
    )

    vocab = 32
    model = _tiny_whisper(vocab)
    wav = jnp.zeros((2, 1600))
    ids = jnp.zeros((2, 3), jnp.int32)
    params = model.init(jax.random.PRNGKey(3), wav, ids, train=False)
    bound = _BoundWhisper(model, params)
    enc = model.apply(params, wav, train=False, method=model.forward_encoder)

    common = dict(
        bos_index=0,
        eos_index=1,
        min_decode_ratio=0.0,
        max_decode_ratio=1.0,
        language_token=2,
        bos_token=3,
        task_token=4,
        timestamp_token=5,
    )
    greedy = S2SWhisperGreedySearch(bound, **common)
    greedy.set_decoder_input_tokens([3, 2, 4, 5])
    assert greedy.bos_index == 5
    hyps, scores = greedy(enc, jnp.ones(2))
    assert len(hyps) == 2
    assert all(1 not in h for h in hyps)

    beam = S2SWhisperBeamSearch(
        [bound], beam_size=3, using_eos_threshold=False, **common
    )
    beam.set_decoder_input_tokens([3, 2, 4, 5])
    bhyps, bscores = beam(enc, jnp.ones(2))
    assert len(bhyps) == 2
    assert np.all(np.isfinite(np.asarray(bscores)))
    assert all(isinstance(h, list) for h in bhyps)
    # With beam_size 1 and no eos gating, beam must agree with greedy.
    beam1 = S2SWhisperBeamSearch(
        [bound],
        beam_size=1,
        using_eos_threshold=False,
        length_normalization=False,
        **common,
    )
    beam1.set_decoder_input_tokens([3, 2, 4, 5])
    b1hyps, _ = beam1(enc, jnp.ones(2))
    assert b1hyps == hyps


def test_hf_whisper_wrapper_offline(tmp_path):
    transformers = _importorskip_transformers()
    from transformers import WhisperConfig

    from speechbrain_tpu.lobes.models.whisper import HuggingFaceWhisper

    cfg = WhisperConfig(
        vocab_size=64,
        num_mel_bins=80,
        d_model=16,
        encoder_layers=1,
        decoder_layers=1,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=32,
        decoder_ffn_dim=32,
        max_source_positions=1500,
        max_target_positions=448,
    )
    cfg.save_pretrained(tmp_path)
    m = HuggingFaceWhisper(str(tmp_path), config_only=True)
    wav = jnp.zeros((1, 16000))
    ids = jnp.zeros((1, 2), jnp.int32)
    enc, logits, attn = m(wav, ids)
    assert enc.shape == (1, 1500, 16)
    assert logits.shape == (1, 2, 64)


def test_hf_checkpoint_round_trip_to_native(tmp_path):
    """Save a tiny Flax HF whisper checkpoint (with weights), reload it
    via HuggingFaceWhisper, transplant into the native Whisper, and
    check encoder/decoder logits parity — the advertised fine-tuning
    path (VERDICT round-1 item 10)."""
    transformers = _importorskip_transformers()
    from transformers import WhisperConfig, FlaxWhisperModel

    from speechbrain_tpu.lobes.models.whisper import (
        HuggingFaceWhisper,
        Whisper,
        load_whisper_hf_params,
    )

    cfg = WhisperConfig(
        vocab_size=64,
        num_mel_bins=80,
        d_model=16,
        encoder_layers=2,
        decoder_layers=2,
        encoder_attention_heads=4,
        decoder_attention_heads=4,
        encoder_ffn_dim=32,
        decoder_ffn_dim=32,
        max_source_positions=10,
        max_target_positions=8,
    )
    hf = FlaxWhisperModel(cfg, seed=3)
    hf.save_pretrained(tmp_path)

    # disk round trip through the wrapper
    wrapper = HuggingFaceWhisper(str(tmp_path))
    import flax

    a = flax.traverse_util.flatten_dict(hf.params, sep="/")
    b = flax.traverse_util.flatten_dict(wrapper.model.params, sep="/")
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    # transplant into the native module; compare outputs on the same
    # mel/enc inputs (drive encoder+decoder through the HF model too)
    native = Whisper(
        vocab_size=64,
        d_model=16,
        nhead=4,
        encoder_layers=2,
        decoder_layers=2,
        d_ffn=32,
        n_samples=3200,
        max_source_positions=10,
        max_target_positions=8,
    )
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((1, 3000)), jnp.float32)
    ids = jnp.asarray([[1, 5, 9]], jnp.int32)
    variables = native.init(
        jax.random.PRNGKey(0), wav, ids, train=False
    )
    variables = load_whisper_hf_params(variables, wrapper.model.params)
    enc_n, logits_n, _ = native.apply(variables, wav, ids, train=False)

    # HF forward over the native frontend's mel features
    from speechbrain_tpu.lobes.models.whisper import (
        log_mel_spectrogram,
        mel_filters_slaney,
        pad_or_trim,
    )

    mel = log_mel_spectrogram(
        pad_or_trim(wav, 3200), mel_filters_slaney(80)
    )
    out = wrapper.model(
        input_features=np.asarray(mel).transpose(0, 2, 1),
        decoder_input_ids=np.asarray(ids),
    )
    enc_hf = out.encoder_last_hidden_state
    dec_hf = out.last_hidden_state
    emb = variables["params"]["decoder"]["embed_tokens"]["embedding"]
    logits_hf = np.asarray(dec_hf) @ np.asarray(emb).T
    np.testing.assert_allclose(
        np.asarray(enc_n), np.asarray(enc_hf), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(logits_n), logits_hf, rtol=1e-3, atol=1e-4
    )
