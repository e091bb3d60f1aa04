"""HuggingFace wav2vec 2.0 wrappers (Flax-backed, torch-free).

Parity target: reference ``lobes/models/huggingface_wav2vec.py:56,338``
(``HuggingFaceWav2Vec2`` fine-tuning wrapper and
``HuggingFaceWav2Vec2Pretrain``).  The reference wraps the torch HF
implementation; here the **Flax** HF implementation is wrapped so
published wav2vec2 checkpoints can be loaded from a local path and
fine-tuned inside jitted train steps.  Hubert/WavLM have no Flax port
in ``transformers``; for from-scratch self-supervised pretraining the
native stack (``lobes/models/wav2vec.py``) is the first-class path.

No network fetch happens here: ``source`` must be a local directory
(e.g. produced by ``save_pretrained``), matching the zero-egress
deployment model.
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["HuggingFaceWav2Vec2", "HuggingFaceWav2Vec2Pretrain"]


def _layer_norm(x, axes):
    """Non-affine layer norm over trailing ``axes`` dims (torch
    ``F.layer_norm`` with no weight/bias)."""
    dims = tuple(range(x.ndim - axes, x.ndim))
    mean = jnp.mean(x, axis=dims, keepdims=True)
    var = jnp.var(x, axis=dims, keepdims=True)
    return (x - mean) / jnp.sqrt(var + 1e-5)


class _HFOutput:
    """Duck-typed stand-in for the transformers model output."""

    def __init__(self, last_hidden_state, hidden_states=None):
        self.last_hidden_state = last_hidden_state
        self.hidden_states = hidden_states


class _NativeHFBackend:
    """transformers-free backend with the ``FlaxWav2Vec2Model`` calling
    convention, over ``lobes/models/wav2vec2_flax.py``."""

    def __init__(self, source, config_only=False, seed=0):
        import os

        import jax as _jax

        from speechbrain_tpu.lobes.models.wav2vec2_flax import (
            FlaxWav2Vec2Module,
            Wav2Vec2Config,
            load_hf_wav2vec2,
        )

        if config_only:
            self.config = Wav2Vec2Config.from_json(
                os.path.join(source, "config.json")
            )
            self.module = FlaxWav2Vec2Module(self.config)
            dummy = jnp.zeros((1, 2048), jnp.float32)
            self.params = self.module.init(
                _jax.random.PRNGKey(seed), dummy
            )["params"]
        else:
            self.module, self.params = load_hf_wav2vec2(source)
            self.config = self.module.config

    def __call__(
        self,
        wav,
        attention_mask=None,
        params=None,
        train=False,
        output_hidden_states=False,
        freeze_feature_encoder=False,
    ):
        out, hiddens = self.module.apply(
            {"params": params if params is not None else self.params},
            wav,
            attention_mask=attention_mask,
            output_hidden_states=output_hidden_states,
            freeze_feature_encoder=freeze_feature_encoder,
        )
        return _HFOutput(out, hiddens)


class HuggingFaceWav2Vec2:
    """wav2vec2 feature-extraction / fine-tuning wrapper
    (reference ``huggingface_wav2vec.py:56``).

    Arguments
    ---------
    source : str
        Local directory with a Flax wav2vec2 model (or just its config
        when ``config_only=True``).
    save_path : str, optional
        Unused (kept for reference signature compatibility: the
        reference uses it as the HF download cache).
    output_norm : bool
        Apply a non-affine layer norm to the output.
    freeze : bool
        Stop gradients through the whole model.
    freeze_feature_extractor : bool
        Stop gradients through the conv feature encoder only (the HF
        ``freeze_feature_encoder`` flag).
    apply_spec_augment : bool
        Enable the model's internal masking during training.
    output_all_hiddens : bool
        Return all transformer layers stacked: (L+1, B, T, C).
    config_only : bool
        Random-init from the config (offline testing).
    """

    def __init__(
        self,
        source,
        save_path=None,
        output_norm=False,
        freeze=False,
        freeze_feature_extractor=False,
        apply_spec_augment=False,
        output_all_hiddens=False,
        config_only=False,
        seed=0,
    ):
        self.output_norm = output_norm
        self.freeze = freeze
        self.freeze_feature_extractor = freeze_feature_extractor
        self.output_all_hiddens = output_all_hiddens
        # Primary backend: the from-scratch HF-layout module
        # (lobes/models/wav2vec2_flax.py) loads config.json +
        # flax_model.msgpack with no transformers dependency — and,
        # unlike transformers' Flax port, supports the post-norm (base)
        # layout.  Numerical parity between the two backends is pinned
        # by tests/unittests/test_huggingface_wav2vec.py.  transformers
        # remains the fallback for checkpoints the native loader cannot
        # read (e.g. torch-only weight files, via from_pt).
        try:
            self.model = _NativeHFBackend(
                source, config_only=config_only, seed=seed
            )
        except Exception as native_err:
            try:
                from transformers import (
                    FlaxWav2Vec2Model,
                    Wav2Vec2Config,
                )
            except ImportError:
                raise native_err
            if config_only:
                config = Wav2Vec2Config.from_pretrained(source)
                config.apply_spec_augment = apply_spec_augment
                self.model = FlaxWav2Vec2Model(config, seed=seed)
            else:
                self.model = FlaxWav2Vec2Model.from_pretrained(
                    source, local_files_only=True
                )
                self.model.config.apply_spec_augment = apply_spec_augment
        self.normalize_wav = self._do_normalize(source)
        if freeze:
            logger.warning("HuggingFaceWav2Vec2 - wav2vec 2.0 is frozen.")

    @staticmethod
    def _do_normalize(source):
        """Read ``do_normalize`` from the saved feature extractor when
        present (reference ``huggingface_wav2vec.py:117-140``)."""
        try:
            from transformers import Wav2Vec2FeatureExtractor

            fe = Wav2Vec2FeatureExtractor.from_pretrained(
                source, local_files_only=True
            )
            return bool(fe.do_normalize)
        except Exception:
            import json
            import os

            try:
                with open(
                    os.path.join(source, "preprocessor_config.json")
                ) as f:
                    return bool(json.load(f).get("do_normalize", True))
            except Exception:
                return True

    @property
    def params(self):
        """The HF Flax parameter pytree (trainable leaves)."""
        return self.model.params

    def __call__(self, wav, wav_lens=None, params=None, train=False):
        out = self.extract_features(
            wav, wav_lens, params=params, train=train
        )
        if self.freeze:
            out = jax.lax.stop_gradient(out)
        return out

    def extract_features(self, wav, wav_lens=None, params=None, train=False):
        """Waveform (B, samples) -> features (B, T, C), or (L+1, B, T, C)
        with ``output_all_hiddens``."""
        attention_mask = self.make_masks(wav, wav_lens)
        if self.normalize_wav:
            wav = _layer_norm(wav, 1)
        out = self.model(
            wav,
            attention_mask=attention_mask,
            params=params or self.model.params,
            train=train,
            output_hidden_states=self.output_all_hiddens,
            freeze_feature_encoder=self.freeze_feature_extractor,
        )
        if self.output_all_hiddens:
            feats = jnp.stack(list(out.hidden_states), axis=0)
            norm_axes = 3
        else:
            feats = out.last_hidden_state
            norm_axes = 2
        if self.output_norm:
            feats = _layer_norm(feats, norm_axes)
        return feats

    def make_masks(self, src, wav_len=None):
        """Sample-level attention mask (1 = valid) from relative lens
        (reference ``huggingface_wav2vec.py:319``: torch uses True=valid
        here, unlike the encoder padding convention)."""
        if wav_len is None:
            return None
        abs_len = jnp.round(jnp.asarray(wav_len) * src.shape[1])
        return (
            jnp.arange(src.shape[1])[None, :] < abs_len[:, None]
        ).astype(jnp.int32)


class HuggingFaceWav2Vec2Pretrain:
    """wav2vec2 contrastive pretraining wrapper (reference
    ``huggingface_wav2vec.py:338``), over
    ``FlaxWav2Vec2ForPreTraining``.

    ``__call__(wav, wav_lens, rng)`` returns the HF pretraining output
    (projected states, quantized targets, codevector perplexity) plus
    the boolean mask-time indices, matching the reference's
    ``(model_output, mask_time_indices)`` contract.
    """

    def __init__(
        self,
        source,
        save_path=None,
        mask_prob=0.65,
        mask_length=10,
        normalize_wav=True,
        config_only=False,
        seed=0,
    ):
        try:
            from transformers import (
                FlaxWav2Vec2ForPreTraining,
                Wav2Vec2Config,
            )
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "transformers (with Flax) is required for "
                "HuggingFaceWav2Vec2Pretrain"
            ) from e
        self.mask_prob = mask_prob
        self.mask_length = mask_length
        self.normalize_wav = normalize_wav
        if config_only:
            config = Wav2Vec2Config.from_pretrained(source)
            self.model = FlaxWav2Vec2ForPreTraining(config, seed=seed)
        else:
            self.model = FlaxWav2Vec2ForPreTraining.from_pretrained(
                source, local_files_only=True
            )
        self.config = self.model.config

    @property
    def params(self):
        """The HF Flax parameter pytree (trainable leaves)."""
        return self.model.params

    def _feat_lengths(self, samples):
        length = samples
        for k, s in zip(self.config.conv_kernel, self.config.conv_stride):
            length = (length - k) // s + 1
        return length

    def __call__(self, wav, wav_lens=None, rng=None, params=None):
        B, samples = wav.shape
        T = int(self._feat_lengths(samples))
        if self.normalize_wav:
            wav = _layer_norm(wav, 2)
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        # Mask spans sampled host-side like HF's _compute_mask_indices
        # (random values, static shapes).
        num_spans = max(1, int(self.mask_prob * T / self.mask_length))
        starts = jax.random.randint(
            rng, (B, num_spans), 0, max(1, T - self.mask_length)
        )
        span = starts[..., None] + jnp.arange(self.mask_length)
        mask = jnp.zeros((B, T), bool)
        mask = mask.at[
            jnp.arange(B)[:, None, None], span
        ].set(True)
        attention_mask = None
        if wav_lens is not None:
            abs_len = jnp.round(jnp.asarray(wav_lens) * samples)
            attention_mask = (
                jnp.arange(samples)[None, :] < abs_len[:, None]
            ).astype(jnp.int32)
        gumbel_rng, rng = jax.random.split(rng)
        out = self.model(
            wav,
            attention_mask=attention_mask,
            mask_time_indices=np.asarray(mask),
            gumbel_rng=gumbel_rng,
            params=params or self.model.params,
            train=True,
            dropout_rng=rng,
        )
        return out, mask
