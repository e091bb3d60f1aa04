"""Task-oriented inference interfaces over pretrained checkpoints.

Parity target: reference ``pretrained/interfaces.py`` — the ``Pretrained``
base (:135) with ``from_hparams``, and the task interfaces (:414 ff.).

Checkpoint format: one flax-msgpack variables file per module
(``<name>.ckpt``, written by ``pretrained.training.save_for_pretrained``)
plus a ``hyperparams.yaml`` declaring a ``modules`` dict of flax module
definitions (and any task hyperparameters).
"""

import logging
from types import SimpleNamespace

import numpy as np

from speechbrain_tpu.dataio.dataio import read_audio
from speechbrain_tpu.dataio.preprocess import AudioNormalizer
from speechbrain_tpu.pretrained.fetching import fetch

logger = logging.getLogger(__name__)

__all__ = [
    "Pretrained",
    "EncodeDecodePipelineMixin",
    "EncoderDecoderASR",
    "EncoderASR",
    "EncoderClassifier",
    "SpeakerRecognition",
    "VAD",
    "SepformerSeparation",
    "SpectralMaskEnhancement",
    "foreign_class",
]


def foreign_class(
    source,
    hparams_file="hyperparams.yaml",
    pymodule_file="custom_interface.py",
    classname="CustomInterface",
    savedir=None,
    **kwargs,
):
    """Fetch and instantiate a custom interface class from a model repo."""
    from speechbrain_tpu.utils.superpowers import import_from_path

    savedir = savedir or f"./pretrained_models/{str(source).replace('/', '_')}"
    pymodule_path = fetch(pymodule_file, source, savedir)
    module = import_from_path(pymodule_path)
    cls = getattr(module, classname)
    return cls.from_hparams(
        source=source, hparams_file=hparams_file, savedir=savedir, **kwargs
    )


class Pretrained:
    """Base: loads hyperparams + per-module variables, runs inference.

    Subclasses declare HPARAMS_NEEDED / MODULES_NEEDED and implement
    task methods using ``self._apply(name, *args, **kwargs)``.
    """

    HPARAMS_NEEDED = []
    MODULES_NEEDED = []

    def __init__(self, modules=None, hparams=None, params=None):
        self.mods = dict(modules or {})
        self.params = dict(params or {})
        self.hparams = SimpleNamespace(**(hparams or {}))
        sr = getattr(self.hparams, "sample_rate", 16000)
        self.sample_rate = sr
        self.audio_normalizer = getattr(
            self.hparams, "audio_normalizer", AudioNormalizer(sr)
        )
        for mod in self.MODULES_NEEDED:
            if mod not in self.mods:
                raise ValueError(f"Need modules['{mod}']")
        for hp in self.HPARAMS_NEEDED:
            if not hasattr(self.hparams, hp):
                raise ValueError(f"Need hparams['{hp}']")

    # -- loading -----------------------------------------------------------

    @classmethod
    def from_hparams(
        cls,
        source,
        hparams_file="hyperparams.yaml",
        savedir=None,
        overrides={},
        download_only=False,
        **kwargs,
    ):
        """Fetch hyperparams + checkpoints and build the interface."""
        from flax import serialization

        from speechbrain_tpu.utils.hyperyaml import load_hyperpyyaml

        if savedir is None:
            savedir = f"./pretrained_models/{str(source).replace('/', '_')}"
        hparams_path = fetch(hparams_file, source, savedir)
        with open(hparams_path) as f:
            hparams = load_hyperpyyaml(f, overrides)
        modules = hparams.get("modules", {})
        params = {}
        for name in modules:
            ckpt_path = fetch(f"{name}.ckpt", source, savedir)
            with open(ckpt_path, "rb") as f:
                params[name] = serialization.msgpack_restore(f.read())
        if download_only:
            return None
        return cls(modules=modules, hparams=hparams, params=params)

    # -- running -----------------------------------------------------------

    def _apply(self, name, *args, method=None, **kwargs):
        """module.apply with this interface's loaded variables."""
        import inspect

        module = self.mods[name]
        call_fn = (
            getattr(type(module), method) if method else type(module).__call__
        )
        try:
            if "train" in inspect.signature(call_fn).parameters:
                kwargs.setdefault("train", False)
        except (TypeError, ValueError):
            pass
        if method is not None:
            kwargs["method"] = method
        return module.apply(self.params[name], *args, **kwargs)

    def load_audio(self, path, savedir="."):
        """Read + resample/downmix an audio file to the model's rate."""
        from speechbrain_tpu.dataio.dataio import _load_audio_any

        audio, sr = _load_audio_any(str(path))
        return self.audio_normalizer(audio, sr)


class EncoderDecoderASR(Pretrained):
    """ASR with an encoder + beam-search decoder.

    hparams needed: ``make_decoder`` — callable(interface) returning a
    searcher over encoded states (built in YAML with !name:), and
    ``make_encoder`` or a module named "encoder" taking (wav, lens).
    ``tokenizer`` decodes token sequences to text.
    """

    HPARAMS_NEEDED = ["tokenizer", "make_decoder"]

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.tokenizer = self.hparams.tokenizer
        self.decoder = self.hparams.make_decoder(self)

    def encode_batch(self, wavs, wav_lens):
        """Encode a batch of waveforms into embeddings/features."""
        import jax.numpy as jnp

        wavs = jnp.asarray(wavs)
        if hasattr(self.hparams, "compute_features"):
            feats = self.hparams.compute_features(wavs)
        else:
            feats = wavs
        return self._apply("encoder", feats, wav_lens)

    def transcribe_batch(self, wavs, wav_lens):
        """Transcribe a batch of waveforms."""
        enc = self.encode_batch(wavs, wav_lens)
        hyps, scores = self.decoder(enc, wav_lens)[:2]
        texts = [
            self.tokenizer(
                [hyp], task="decode_from_list"
            )[0]
            for hyp in hyps
        ]
        return texts, hyps

    def transcribe_file(self, path):
        """Transcribe a single audio file."""
        import jax.numpy as jnp

        audio = self.load_audio(path)
        wavs = jnp.asarray(audio)[None]
        texts, _ = self.transcribe_batch(
            wavs, jnp.ones(1)
        )
        return " ".join(texts[0]) if isinstance(texts[0], list) else texts[0]


class EncoderASR(Pretrained):
    """CTC-only ASR: encoder + greedy CTC decoding."""

    HPARAMS_NEEDED = ["tokenizer", "blank_index"]

    def encode_batch(self, wavs, wav_lens):
        """Encode a batch of waveforms into embeddings/features."""
        import jax.numpy as jnp

        wavs = jnp.asarray(wavs)
        if hasattr(self.hparams, "compute_features"):
            feats = self.hparams.compute_features(wavs)
        else:
            feats = wavs
        return self._apply("encoder", feats, wav_lens)

    def transcribe_batch(self, wavs, wav_lens):
        """Transcribe a batch of waveforms."""
        from speechbrain_tpu.decoders.ctc import ctc_greedy_decode

        logp = self.encode_batch(wavs, wav_lens)
        hyps = ctc_greedy_decode(
            logp, wav_lens, blank_id=self.hparams.blank_index
        )
        texts = [
            self.tokenizer([hyp], task="decode_from_list")[0]
            for hyp in hyps
        ]
        return texts, hyps

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.tokenizer = self.hparams.tokenizer

    def transcribe_file(self, path):
        """Transcribe a single audio file."""
        import jax.numpy as jnp

        audio = self.load_audio(path)
        texts, _ = self.transcribe_batch(
            jnp.asarray(audio)[None], jnp.ones(1)
        )
        return " ".join(texts[0]) if isinstance(texts[0], list) else texts[0]


class EncoderClassifier(Pretrained):
    """Embedding + classification (speaker-id, language-id, keywords)."""

    MODULES_NEEDED = ["embedding_model", "classifier"]

    def encode_batch(self, wavs, wav_lens=None, normalize=False):
        """Encode a batch of waveforms into embeddings/features."""
        import jax.numpy as jnp

        wavs = jnp.asarray(wavs)
        if wav_lens is None:
            wav_lens = jnp.ones(wavs.shape[0])
        if hasattr(self.hparams, "compute_features"):
            feats = self.hparams.compute_features(wavs)
        else:
            feats = wavs
        emb = self._apply(
            "embedding_model", feats, lengths=wav_lens
        )
        if normalize:
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8
            )
        return emb

    def classify_batch(self, wavs, wav_lens=None):
        """Posteriors + best class for a batch of waveforms."""
        import jax.numpy as jnp

        emb = self.encode_batch(wavs, wav_lens)
        out = self._apply("classifier", emb[:, 0] if emb.ndim == 3 else emb)
        out_probs = out if out.ndim == 2 else out[:, 0]
        score = out_probs.max(axis=-1)
        index = out_probs.argmax(axis=-1)
        text_lab = None
        if hasattr(self.hparams, "label_encoder"):
            text_lab = self.hparams.label_encoder.decode_ndim(index)
        return out_probs, score, index, text_lab

    def classify_file(self, path):
        """Posteriors + best class for one audio file."""
        import jax.numpy as jnp

        audio = self.load_audio(path)
        return self.classify_batch(jnp.asarray(audio)[None])


class SpeakerRecognition(EncoderClassifier):
    """Speaker verification by embedding cosine similarity.

    Only the embedding model is required (no classifier head)."""

    MODULES_NEEDED = ["embedding_model"]

    def verify_batch(self, wavs1, wavs2, wav1_lens=None, wav2_lens=None, threshold=0.25):
        """Speaker verification scores + decisions for wav pairs."""
        import jax.numpy as jnp

        emb1 = self.encode_batch(wavs1, wav1_lens, normalize=True)
        emb2 = self.encode_batch(wavs2, wav2_lens, normalize=True)
        e1 = emb1.reshape(emb1.shape[0], -1)
        e2 = emb2.reshape(emb2.shape[0], -1)
        score = (e1 * e2).sum(-1) / jnp.maximum(
            jnp.linalg.norm(e1, axis=-1) * jnp.linalg.norm(e2, axis=-1),
            1e-8,
        )
        return score, score > threshold

    def verify_files(self, path1, path2, threshold=0.25):
        """Speaker verification between two audio files."""
        import jax.numpy as jnp

        w1 = jnp.asarray(self.load_audio(path1))[None]
        w2 = jnp.asarray(self.load_audio(path2))[None]
        score, decision = self.verify_batch(w1, w2, threshold=threshold)
        return float(score[0]), bool(decision[0])


class VAD(Pretrained):
    """Voice activity detection over arbitrarily long recordings.

    Chunked double-windowing inference (reference
    ``interfaces.py:1120-2053``): the file is processed in large chunks
    with small-chunk granularity, probabilities are thresholded into
    boundaries, with optional energy-based refinement.
    """

    MODULES_NEEDED = ["model"]

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.sample_rate = getattr(self.hparams, "sample_rate", 16000)
        self.time_resolution = getattr(
            self.hparams, "time_resolution", 0.01
        )

    def get_speech_prob_chunk(self, wavs, wav_lens=None):
        """Frame-level speech probabilities for waveform chunks."""
        import jax.numpy as jnp

        wavs = jnp.asarray(wavs)
        if wav_lens is None:
            wav_lens = jnp.ones(wavs.shape[0])
        if hasattr(self.hparams, "compute_features"):
            feats = self.hparams.compute_features(wavs)
        else:
            feats = wavs
        out = self._apply("model", feats, lengths=wav_lens)
        import jax

        return jax.nn.sigmoid(out)

    def get_speech_prob_file(
        self, audio_file, large_chunk_size=30, small_chunk_size=10, overlap_small_chunk=False
    ):
        """Frame-level speech probabilities for a whole file."""
        import jax.numpy as jnp

        audio = np.asarray(self.load_audio(audio_file))
        sr = self.sample_rate
        large = int(large_chunk_size * sr)
        small = int(small_chunk_size * sr)
        probs = []
        for start in range(0, len(audio), large):
            chunk = audio[start : start + large]
            # split into small chunks (pad last)
            n_small = -(-len(chunk) // small)
            pad = n_small * small - len(chunk)
            chunk = np.pad(chunk, (0, pad))
            smalls = chunk.reshape(n_small, small)
            p = self.get_speech_prob_chunk(jnp.asarray(smalls))
            probs.append(np.asarray(p).reshape(-1, p.shape[-1]))
        return np.concatenate(probs, axis=0)

    def apply_threshold(
        self, vad_prob, activation_th=0.5, deactivation_th=0.25
    ):
        """Hysteresis thresholding of frame probabilities."""
        vad_prob = np.asarray(vad_prob).reshape(-1)
        vad = np.zeros_like(vad_prob, dtype=bool)
        active = False
        for i, p in enumerate(vad_prob):
            if not active and p >= activation_th:
                active = True
            elif active and p < deactivation_th:
                active = False
            vad[i] = active
        return vad

    def get_boundaries(self, vad, output_value="seconds"):
        """Binary frame decisions -> (N, 2) start/end boundaries."""
        vad = np.asarray(vad).reshape(-1)
        bounds = []
        in_seg = False
        for i, v in enumerate(vad):
            if v and not in_seg:
                in_seg = True
                start = i
            elif not v and in_seg:
                in_seg = False
                bounds.append((start, i))
        if in_seg:
            bounds.append((start, len(vad)))
        bounds = np.asarray(bounds, dtype=np.float64).reshape(-1, 2)
        if output_value == "seconds":
            bounds = bounds * self.time_resolution
        return bounds

    def energy_VAD(
        self, audio_file, boundaries, activation_th=0.5, deactivation_th=0.0, eps=1e-6
    ):
        """Refine boundaries with frame energies inside each segment."""
        audio = np.asarray(self.load_audio(audio_file))
        sr = self.sample_rate
        frame = int(self.time_resolution * sr)
        new_bounds = []
        for beg, end in boundaries:
            s, e = int(beg * sr), int(end * sr)
            seg = audio[s:e]
            if len(seg) < frame:
                continue
            n = len(seg) // frame
            frames = seg[: n * frame].reshape(n, frame)
            energy = 10 * np.log10((frames ** 2).mean(axis=1) + eps)
            # normalize to 0..1 within segment
            rng_e = energy.max() - energy.min() + eps
            norm_e = (energy - energy.min()) / rng_e
            vad = self.apply_threshold(
                norm_e, activation_th, deactivation_th
            )
            for bs, be in self.get_boundaries(vad, output_value="frames"):
                new_bounds.append(
                    (
                        beg + bs * self.time_resolution,
                        beg + be * self.time_resolution,
                    )
                )
        return np.asarray(new_bounds).reshape(-1, 2)

    def merge_close_segments(self, boundaries, close_th=0.25):
        """Merge segments separated by < close_th seconds."""
        if len(boundaries) == 0:
            return boundaries
        merged = [list(boundaries[0])]
        for beg, end in boundaries[1:]:
            if beg - merged[-1][1] < close_th:
                merged[-1][1] = end
            else:
                merged.append([beg, end])
        return np.asarray(merged)

    def remove_short_segments(self, boundaries, len_th=0.25):
        """Drop segments shorter than len_th seconds."""
        return np.asarray(
            [b for b in boundaries if b[1] - b[0] >= len_th]
        ).reshape(-1, 2)

    def get_speech_segments(
        self,
        audio_file,
        large_chunk_size=30,
        small_chunk_size=10,
        activation_th=0.5,
        deactivation_th=0.25,
        apply_energy_VAD=False,
        close_th=0.25,
        len_th=0.25,
    ):
        """Full pipeline: file -> speech segment boundaries (seconds)."""
        probs = self.get_speech_prob_file(
            audio_file, large_chunk_size, small_chunk_size
        )
        vad = self.apply_threshold(
            probs, activation_th, deactivation_th
        )
        boundaries = self.get_boundaries(vad)
        if apply_energy_VAD:
            boundaries = self.energy_VAD(audio_file, boundaries)
        boundaries = self.merge_close_segments(boundaries, close_th)
        boundaries = self.remove_short_segments(boundaries, len_th)
        return boundaries


class WaveformEncoder(Pretrained):
    """Generic waveform -> representation frontend (e.g. SSL features)."""

    MODULES_NEEDED = ["encoder"]

    def encode_batch(self, wavs, wav_lens=None):
        """Encode a batch of waveforms into embeddings/features."""
        import jax.numpy as jnp

        wavs = jnp.asarray(wavs)
        if wav_lens is None:
            wav_lens = jnp.ones(wavs.shape[0])
        return self._apply("encoder", wavs, lengths=wav_lens)

    def encode_file(self, path):
        """Encode a single audio file."""
        import jax.numpy as jnp

        audio = self.load_audio(path)
        return self.encode_batch(jnp.asarray(audio)[None])[0]


class EndToEndSLU(Pretrained):
    """Spoken language understanding: audio -> semantic string.

    Uses an ASR-style encoder + seq2seq decoder over semantics tokens;
    ``hparams.tokenizer`` decodes, ``hparams.make_decoder`` builds the
    searcher (same pattern as EncoderDecoderASR).
    """

    HPARAMS_NEEDED = ["tokenizer", "make_decoder"]

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.tokenizer = self.hparams.tokenizer
        self.decoder = self.hparams.make_decoder(self)

    def encode_batch(self, wavs, wav_lens):
        """Encode a batch of waveforms into embeddings/features."""
        import jax.numpy as jnp

        wavs = jnp.asarray(wavs)
        if hasattr(self.hparams, "compute_features"):
            feats = self.hparams.compute_features(wavs)
        else:
            feats = wavs
        return self._apply("slu_enc", feats, lengths=wav_lens)

    def decode_batch(self, wavs, wav_lens):
        """Decode a batch into hypotheses/waveforms."""
        enc = self.encode_batch(wavs, wav_lens)
        hyps, scores = self.decoder(enc, wav_lens)[:2]
        texts = [
            self.tokenizer([h], task="decode_from_list")[0] for h in hyps
        ]
        return texts, hyps

    def decode_file(self, path):
        """Transcribe a single audio file."""
        import jax.numpy as jnp

        audio = self.load_audio(path)
        texts, _ = self.decode_batch(
            jnp.asarray(audio)[None], jnp.ones(1)
        )
        return " ".join(texts[0]) if isinstance(texts[0], list) else texts[0]


class SNREstimator(Pretrained):
    """Estimate the SNR of separated sources given the mixture."""

    MODULES_NEEDED = ["encoder", "encoder_out"]

    def estimate_batch(self, mix, predictions):
        """Estimate SNR for a batch of (mix, predictions)."""
        import jax.numpy as jnp

        mix = jnp.asarray(mix)
        predictions = jnp.asarray(predictions)
        # Stack mixture with each predicted source
        inp = jnp.concatenate(
            [mix[..., None], predictions], axis=-1
        )
        enc = self._apply("encoder", inp)
        out = self._apply(
            "encoder_out", enc.mean(axis=1) if enc.ndim == 3 else enc
        )
        return out

    def __call__(self, mix, predictions):
        return self.estimate_batch(mix, predictions)


class GraphemeToPhoneme(Pretrained):
    """Text -> phonemes via a trained G2P model."""

    HPARAMS_NEEDED = ["grapheme_encoder", "phoneme_decoder_fn"]

    def g2p(self, text):
        """One string (or list of strings) -> phoneme list(s)."""
        single = isinstance(text, str)
        texts = [text] if single else list(text)
        import numpy as np

        encoded = [
            self.hparams.grapheme_encoder.encode_sequence(list(t))
            for t in texts
        ]
        max_len = max(len(e) for e in encoded)
        graphemes = np.zeros((len(encoded), max_len), np.int64)
        lens = np.zeros(len(encoded), np.float32)
        for i, e in enumerate(encoded):
            graphemes[i, : len(e)] = e
            lens[i] = len(e) / max_len
        phonemes = self.hparams.phoneme_decoder_fn(
            self, graphemes, lens
        )
        return phonemes[0] if single else phonemes

    def __call__(self, text):
        return self.g2p(text)


class WaveformEnhancement(Pretrained):
    """Time-domain waveform enhancement."""

    MODULES_NEEDED = ["enhance_model"]

    def enhance_batch(self, noisy, lengths=None):
        """Enhance a batch of noisy waveforms."""
        import jax.numpy as jnp

        return self._apply(
            "enhance_model", jnp.asarray(noisy), lengths=lengths
        )

    def enhance_file(self, path, output_path=None):
        """Enhance a single audio file (optionally saving it)."""
        import jax.numpy as jnp
        import numpy as np

        audio = self.load_audio(path)
        enhanced = self.enhance_batch(jnp.asarray(audio)[None])
        if output_path is not None:
            from speechbrain_tpu.dataio.dataio import write_audio

            write_audio(
                output_path, np.asarray(enhanced[0]), self.sample_rate
            )
        return enhanced[0]


class Tacotron2TTS(Pretrained):
    """Text -> mel spectrogram with a trained Tacotron2."""

    MODULES_NEEDED = ["model"]
    HPARAMS_NEEDED = ["text_to_sequence"]

    def encode_text(self, texts):
        """Synthesize mel spectrograms from input texts."""
        import jax.numpy as jnp
        import numpy as np

        if isinstance(texts, str):
            texts = [texts]
        seqs = [self.hparams.text_to_sequence(t) for t in texts]
        max_len = max(len(s) for s in seqs)
        tokens = np.zeros((len(seqs), max_len), np.int64)
        lens = np.zeros(len(seqs), np.float32)
        for i, s in enumerate(seqs):
            tokens[i, : len(s)] = s
            lens[i] = len(s) / max_len
        module = self.mods["model"]
        mel_out, mel_post, gates = module.apply(
            self.params["model"],
            jnp.asarray(tokens),
            jnp.asarray(lens),
            method="infer",
            rngs={"dropout": __import__("jax").random.PRNGKey(0)},
        )
        mel_lens = (
            np.asarray(
                __import__("jax").nn.sigmoid(gates) > 0.5
            ).argmax(axis=1)
        )
        mel_lens[mel_lens == 0] = mel_post.shape[1]
        return mel_post, mel_lens, None

    def __call__(self, texts):
        return self.encode_text(texts)


class HIFIGAN(Pretrained):
    """Mel spectrogram -> waveform with a trained HiFiGAN generator."""

    MODULES_NEEDED = ["generator"]

    def decode_batch(self, spectrogram):
        """Decode a batch into hypotheses/waveforms."""
        import jax.numpy as jnp

        return self._apply("generator", jnp.asarray(spectrogram))

    def decode_spectrogram(self, spectrogram):
        """Vocode a single spectrogram to a waveform."""
        return self.decode_batch(spectrogram[None])[0]

    def __call__(self, spectrogram):
        return self.decode_batch(spectrogram)


class SepformerSeparation(Pretrained):
    """Source separation with a masking model."""

    MODULES_NEEDED = ["masknet"]

    def separate_batch(self, mix):
        """Separate a batch of mixtures into sources."""
        import jax.numpy as jnp

        return self._apply("masknet", jnp.asarray(mix))

    def separate_file(self, path):
        """Separate a single mixture file into sources."""
        import jax.numpy as jnp

        audio = self.load_audio(path)
        return self.separate_batch(jnp.asarray(audio)[None])


class SpectralMaskEnhancement(Pretrained):
    """Spectral-domain mask enhancement."""

    MODULES_NEEDED = ["enhance_model"]
    HPARAMS_NEEDED = ["compute_stft", "compute_istft"]

    def compute_features(self, wavs):
        """Feature extraction for the loaded model."""
        import jax.numpy as jnp

        from speechbrain_tpu.processing.features import spectral_magnitude

        stft = self.hparams.compute_stft(wavs)
        return jnp.log1p(spectral_magnitude(stft, power=0.5))

    def enhance_batch(self, noisy, lengths=None):
        """Enhance a batch of noisy waveforms."""
        import jax.numpy as jnp

        from speechbrain_tpu.processing.features import spectral_magnitude

        noisy = jnp.asarray(noisy)
        stft = self.hparams.compute_stft(noisy)
        mag = spectral_magnitude(stft, power=0.5)
        feats = jnp.log1p(mag)
        mask = self._apply("enhance_model", feats, lengths=lengths)
        masked = stft * mask[..., None]
        return self.hparams.compute_istft(
            masked, sig_length=noisy.shape[1]
        )

    def enhance_file(self, path, output_path=None):
        """Enhance a single audio file (optionally saving it)."""
        import jax.numpy as jnp

        audio = self.load_audio(path)
        enhanced = self.enhance_batch(jnp.asarray(audio)[None])
        if output_path is not None:
            from speechbrain_tpu.dataio.dataio import write_audio

            write_audio(
                output_path, np.asarray(enhanced[0]), self.sample_rate
            )
        return enhanced[0]


class EncodeDecodePipelineMixin:
    """Mixin for pretrained models that declare their pre/post
    processing as hparams-defined encode/decode ``DataPipeline``s
    (reference ``pretrained/interfaces.py:2249``).

    The hparams file provides ``encode_pipeline`` / ``decode_pipeline``
    dicts with ``steps`` (dynamic items), ``output_keys``, optional
    ``init`` steps and ``batch``/``use_padded_data`` flags, plus
    ``model_output_keys``.
    """

    INPUT_STATIC_KEYS = ()
    OUTPUT_KEYS = ()

    def create_pipelines(self):
        """Initializes the encode and decode pipelines from hparams."""
        from speechbrain_tpu.utils.data_pipeline import DataPipeline

        self._run_init_steps(self.hparams.encode_pipeline)
        self._run_init_steps(self.hparams.decode_pipeline)
        self.encode_pipeline = DataPipeline(
            static_data_keys=self.INPUT_STATIC_KEYS,
            dynamic_items=self.hparams.encode_pipeline["steps"],
            output_keys=self.hparams.encode_pipeline["output_keys"],
        )
        self.decode_pipeline = DataPipeline(
            static_data_keys=self.hparams.model_output_keys,
            dynamic_items=self.hparams.decode_pipeline["steps"],
            output_keys=self.OUTPUT_KEYS,
        )

    def _run_init_steps(self, pipeline_definition):
        """Run optional pipeline ``init`` steps (e.g. filling text
        encoders with tokens)."""
        for step in pipeline_definition.get("init", []):
            step_func = step.get("func")
            if not step_func or not callable(step_func):
                raise ValueError("Invalid pipeline init definition")
            step_func()

    def _run_pipeline(self, pipeline, input, batch):
        if batch:
            return pipeline(input)
        return [pipeline(item) for item in input]

    def _get_encode_pipeline_input(self, input):
        return input if self.batch_inputs else self._itemize(input)

    def _get_decode_pipeline_input(self, model_output):
        model_output_keys = getattr(self.hparams, "model_output_keys", None)
        pipeline_input = model_output
        if model_output_keys and len(model_output_keys) == 1:
            pipeline_input = (pipeline_input,)
        if model_output_keys:
            pipeline_input = dict(zip(model_output_keys, pipeline_input))
        if not self.batch_outputs:
            pipeline_input = self._itemize(pipeline_input)
        return pipeline_input

    def _itemize(self, pipeline_input):
        first_item = next(iter(pipeline_input.values()))
        keys, values = pipeline_input.keys(), pipeline_input.values()
        batch_length = len(first_item)
        return [
            dict(zip(keys, [value[idx] for value in values]))
            for idx in range(batch_length)
        ]

    def to_dict(self, data):
        """Convert a PaddedBatch to a plain dict (leaves other types)."""
        from speechbrain_tpu.dataio.batch import PaddedBatch

        if isinstance(data, PaddedBatch):
            data = {
                key: self._get_value(data, key)
                for key in self.hparams.encode_pipeline["output_keys"]
            }
        return data

    def _get_value(self, data, key):
        from speechbrain_tpu.dataio.batch import PaddedData

        value = getattr(data, key)
        if not self.input_use_padded_data and isinstance(value, PaddedData):
            value = value.data
        return value

    @property
    def batch_inputs(self):
        """True when the encode pipeline operates on whole batches."""
        return self.hparams.encode_pipeline.get("batch", True)

    @property
    def input_use_padded_data(self):
        """True to hand raw PaddedData (with lengths) to the model."""
        return self.hparams.encode_pipeline.get("use_padded_data", False)

    @property
    def batch_outputs(self):
        """True when the decode pipeline operates on whole batches."""
        return self.hparams.decode_pipeline.get("batch", True)

    def _collate(self, data):
        from speechbrain_tpu.dataio.batch import PaddedBatch

        if not self.batch_inputs:
            collate_fn = getattr(self.hparams, "collate_fn", PaddedBatch)
            data = collate_fn(data)
        return data

    def encode_input(self, input):
        """Run the encode pipeline over raw inputs → model inputs."""
        pipeline_input = self._get_encode_pipeline_input(input)
        model_input = self._run_pipeline(
            pipeline=self.encode_pipeline,
            input=pipeline_input,
            batch=self.batch_inputs,
        )
        model_input = self._collate(model_input)
        return self.to_dict(model_input)

    def decode_output(self, output):
        """Run the decode pipeline over raw model outputs."""
        pipeline_input = self._get_decode_pipeline_input(output)
        return self._run_pipeline(
            pipeline=self.decode_pipeline,
            input=pipeline_input,
            batch=self.batch_outputs,
        )
