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
    "Tacotron2",
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
        # Serving params are frozen, so the searcher may cache its
        # jitted program across calls (one compile per shape bucket).
        if hasattr(self.decoder, "jit_call"):
            self.decoder.jit_call = True

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
        """Transcribe a batch of waveforms (one tokenizer call for the
        whole batch, reference ``interfaces.py:617-637``)."""
        enc = self.encode_batch(wavs, wav_lens)
        hyps, scores = self.decoder(enc, wav_lens)[:2]
        texts = self.tokenizer(list(hyps), task="decode_from_list")
        return texts, hyps

    def forward(self, wavs, wav_lens):
        """Runs full transcription (reference interfaces.py:642)."""
        return self.transcribe_batch(wavs, wav_lens)

    def transcribe_file(
        self, path, chunk_size_s=None, chunk_overlap_s=0.5
    ):
        """Transcribe a single audio file.

        ``chunk_size_s`` enables long-form transcription: the waveform
        is split into fixed windows (with ``chunk_overlap_s`` seconds
        of left context prepended to each window after the first, to
        avoid word truncation at the cut), every window is decoded as
        one batch row, and the texts are joined.  None (default)
        decodes the whole file in one pass like the reference.

        Note: attention decoding is not frame-synchronous, so the
        left-context audio cannot be trimmed from the hypothesis —
        words spoken inside the overlap region may appear twice at a
        seam.  Use a small ``chunk_overlap_s`` (or the CTC-based
        ``EncoderASR``, which trims the overlap exactly) when seam
        duplication matters.
        """
        import jax.numpy as jnp
        import numpy as np

        audio = np.asarray(self.load_audio(path), np.float32)
        if audio.ndim > 1:
            audio = audio.mean(axis=-1)
        sr = getattr(self.hparams, "sample_rate", 16000)
        if chunk_size_s is None or len(audio) <= int(chunk_size_s * sr):
            texts, _ = self.transcribe_batch(
                jnp.asarray(audio)[None], jnp.ones(1)
            )
            text = texts[0]
            return " ".join(text) if isinstance(text, list) else text
        # long-form: overlapped fixed windows, decoded as ONE padded
        # batch (static shapes, single beam-search dispatch)
        win = int(chunk_size_s * sr)
        ctx = int(chunk_overlap_s * sr)
        starts = list(range(0, len(audio), win))
        chunks = []
        for s0 in starts:
            beg = max(0, s0 - (ctx if s0 > 0 else 0))
            chunks.append(audio[beg : s0 + win])
        T = max(len(c) for c in chunks)
        batch = np.zeros((len(chunks), T), np.float32)
        lens = np.zeros(len(chunks), np.float32)
        for i, c in enumerate(chunks):
            batch[i, : len(c)] = c
            lens[i] = len(c) / T
        texts, _ = self.transcribe_batch(
            jnp.asarray(batch), jnp.asarray(lens)
        )
        parts = [
            " ".join(t) if isinstance(t, list) else t for t in texts
        ]
        return " ".join(p for p in parts if p).strip()


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
        """Transcribe a batch of waveforms (one tokenizer call for the
        whole batch, matching EncoderDecoderASR's batched
        detokenization)."""
        from speechbrain_tpu.decoders.ctc import ctc_greedy_decode

        logp = self.encode_batch(wavs, wav_lens)
        hyps = ctc_greedy_decode(
            logp, wav_lens, blank_id=self.hparams.blank_index
        )
        texts = self.tokenizer(list(hyps), task="decode_from_list")
        return texts, hyps

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.tokenizer = self.hparams.tokenizer

    def forward(self, wavs, wav_lens):
        """Runs full transcription (reference interfaces.py:854)."""
        return self.transcribe_batch(wavs, wav_lens)

    def transcribe_file(
        self, path, chunk_size_s=None, chunk_overlap_s=0.5
    ):
        """Transcribe a single audio file.

        ``chunk_size_s`` enables long-form transcription, same scheme
        as ``EncoderDecoderASR.transcribe_file``: fixed windows with
        ``chunk_overlap_s`` seconds of left context, decoded as one
        padded batch (static shapes, single dispatch), texts joined.

        Unlike the attention decoder, CTC is frame-synchronous, so the
        encoder frames that correspond to each window's left-context
        audio are forced to blank before greedy decoding — every frame
        of audio is decoded exactly once and overlap-region words are
        not duplicated at seams (a token whose audio genuinely spans
        the cut may still surface in both windows).
        """
        import jax.numpy as jnp
        import numpy as np

        from speechbrain_tpu.decoders.ctc import ctc_greedy_decode

        audio = np.asarray(self.load_audio(path), np.float32)
        if audio.ndim > 1:
            audio = audio.mean(axis=-1)
        sr = getattr(self.hparams, "sample_rate", 16000)
        if chunk_size_s is None or len(audio) <= int(chunk_size_s * sr):
            texts, _ = self.transcribe_batch(
                jnp.asarray(audio)[None], jnp.ones(1)
            )
            text = texts[0]
            return " ".join(text) if isinstance(text, list) else text
        win = int(chunk_size_s * sr)
        ctx = int(chunk_overlap_s * sr)
        starts = list(range(0, len(audio), win))
        chunks = []
        for s0 in starts:
            beg = max(0, s0 - (ctx if s0 > 0 else 0))
            chunks.append(audio[beg : s0 + win])
        T = max(len(c) for c in chunks)
        batch = np.zeros((len(chunks), T), np.float32)
        lens = np.zeros(len(chunks), np.float32)
        for i, c in enumerate(chunks):
            batch[i, : len(c)] = c
            lens[i] = len(c) / T
        logp = np.array(
            self.encode_batch(jnp.asarray(batch), jnp.asarray(lens))
        )
        # Trim the left-context region exactly: the encoder frame rate
        # is uniform (n_frames / T samples), so the frames covered by
        # the ctx_i prepended samples are forced to emit blank.
        n_frames = logp.shape[1]
        blank = self.hparams.blank_index
        for i, s0 in enumerate(starts):
            ctx_i = min(ctx, s0)
            ctx_frames = int(np.floor(n_frames * ctx_i / T))
            if ctx_frames:
                logp[i, :ctx_frames, :] = -1e9
                logp[i, :ctx_frames, blank] = 0.0
        hyps = ctc_greedy_decode(
            jnp.asarray(logp), jnp.asarray(lens), blank_id=blank
        )
        texts = self.tokenizer(list(hyps), task="decode_from_list")
        parts = [
            " ".join(t) if isinstance(t, list) else t for t in texts
        ]
        return " ".join(p for p in parts if p).strip()


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

    def forward(self, wavs, wav_lens=None):
        """Runs the classification (reference interfaces.py:1016)."""
        return self.classify_batch(wavs, wav_lens)

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
    ``pretrained/interfaces.py:1120-2053``): the file is read in large
    sequential chunks; each is split into small chunks processed in
    parallel (optionally 50%-overlapped with hamming-window averaging),
    probabilities are thresholded into boundaries, with optional
    energy-based refinement and neural double-checking.

    All boundary math follows the reference exactly: frame-level
    arrays are shaped ``(batch, frames, 1)``, segment end times are the
    *last speech frame* times ``time_resolution``
    (``interfaces.py:1438-1443``), and energies are log-sum-abs
    normalized to mean 0.5 / half-std 0.5 (``interfaces.py:1674-1684``).
    """

    MODULES_NEEDED = ["model"]

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.sample_rate = getattr(self.hparams, "sample_rate", 16000)
        self.time_resolution = getattr(
            self.hparams, "time_resolution", 0.01
        )

    # -- neural posteriors -------------------------------------------------

    def get_speech_prob_chunk(self, wavs, wav_lens=None):
        """Frame-level speech probabilities for waveform chunks.

        Returns a ``(batch, frames, 1)`` array of sigmoided posteriors
        (reference ``interfaces.py:1308-1357``).
        """
        import jax
        import jax.numpy as jnp

        wavs = jnp.asarray(wavs)
        if wavs.ndim == 1:
            wavs = wavs[None]
        if wav_lens is None:
            wav_lens = jnp.ones(wavs.shape[0])
        if hasattr(self.hparams, "compute_features"):
            feats = self.hparams.compute_features(wavs)
        else:
            feats = wavs
        if hasattr(self.hparams, "mean_var_norm"):
            feats = self.hparams.mean_var_norm(feats, wav_lens)
        out = self._apply("model", feats, lengths=wav_lens)
        return jax.nn.sigmoid(out)

    def get_speech_prob_file(
        self,
        audio_file,
        large_chunk_size=30,
        small_chunk_size=10,
        overlap_small_chunk=False,
    ):
        """Frame-level speech probability over a whole file.

        Double-windowing (reference ``interfaces.py:1149-1280``):
        sequential non-overlapping large chunks, each split into small
        chunks scored in parallel.  With ``overlap_small_chunk`` the
        small chunks use a 50% step and their probabilities are
        combined with hamming windows via overlap-add (the reference's
        unfold/fold pair).
        """
        sample_rate, audio_len = self._get_audio_info(audio_file)
        if sample_rate != self.sample_rate:
            raise ValueError(
                "The detected sample rate is different from that set "
                "in the hparam file"
            )

        long_chunk_len = int(sample_rate * large_chunk_size)
        small_chunk_len = int(sample_rate * small_chunk_size)
        small_chunk_step = small_chunk_size
        if overlap_small_chunk:
            small_chunk_step = small_chunk_size / 2
        small_chunk_len_step = int(sample_rate * small_chunk_step)

        prob_chunks = []
        last_chunk = False
        begin_sample = 0
        while True:
            large_chunk = self._read_segment(
                audio_file, begin_sample, long_chunk_len
            )
            if last_chunk or large_chunk.shape[-1] < small_chunk_len:
                large_chunk = np.concatenate(
                    [large_chunk, np.zeros(small_chunk_len, np.float32)]
                )

            # unfold: (n_windows, small_chunk_len), 50%-step capable
            n_win = (
                len(large_chunk) - small_chunk_len
            ) // small_chunk_len_step + 1
            idx = (
                np.arange(small_chunk_len)[None, :]
                + np.arange(n_win)[:, None] * small_chunk_len_step
            )
            small_chunks = large_chunk[idx]

            small_chunks_prob = np.asarray(
                self.get_speech_prob_chunk(small_chunks)
            )
            if small_chunks_prob.ndim == 2:
                small_chunks_prob = small_chunks_prob[:, :, None]

            out_len = int(
                large_chunk.shape[-1]
                / (sample_rate * self.time_resolution)
            )
            kernel_len = int(small_chunk_size / self.time_resolution)
            step_len = int(small_chunk_step / self.time_resolution)

            # drop trailing frame so each window is exactly
            # kernel_len frames (reference interfaces.py:1235; models
            # that already emit kernel_len frames are used as-is)
            if small_chunks_prob.shape[1] > kernel_len:
                small_chunks_prob = small_chunks_prob[:, :-1, :]

            if overlap_small_chunk:
                small_chunks_prob = self._manage_overlapped_chunks(
                    small_chunks_prob
                )

            # fold: overlap-add the per-window frame probabilities
            folded = np.zeros((out_len, 1), np.float32)
            for w in range(small_chunks_prob.shape[0]):
                beg = w * step_len
                folded[beg : beg + kernel_len] += small_chunks_prob[
                    w, :kernel_len
                ]
            prob_chunks.append(folded[None])

            if last_chunk:
                break
            begin_sample = begin_sample + long_chunk_len
            if begin_sample + long_chunk_len > audio_len:
                last_chunk = True

        prob_vad = np.concatenate(prob_chunks, axis=1)
        last_elem = int(audio_len / (self.time_resolution * sample_rate))
        return prob_vad[:, 0:last_elem, :]

    def _manage_overlapped_chunks(self, small_chunks_prob):
        """Hamming-weight 50%-overlapped small-chunk probabilities
        (reference ``interfaces.py:1282-1306``); first/last half
        windows keep unit weight at the unoverlapped edges."""
        n = small_chunks_prob.shape[1]
        # torch.hamming_window is periodic: 0.54 - 0.46 cos(2 pi k / n)
        hamming = (
            0.54 - 0.46 * np.cos(2.0 * np.pi * np.arange(n) / n)
        ).astype(small_chunks_prob.dtype)
        half_point = int(n / 2)
        small_chunks_prob = small_chunks_prob.copy()
        small_chunks_prob[0, half_point:] *= hamming[half_point:, None]
        small_chunks_prob[-1, 0:half_point] *= hamming[0:half_point, None]
        small_chunks_prob[1:-1] *= hamming[None, :, None]
        return small_chunks_prob

    # -- thresholding & boundaries -----------------------------------------

    def apply_threshold(
        self, vad_prob, activation_th=0.5, deactivation_th=0.25
    ):
        """Hysteresis thresholding: speech starts when the posterior
        exceeds ``activation_th`` and ends when it drops below
        ``deactivation_th`` (reference ``interfaces.py:1358-1396``).

        Accepts/returns ``(batch, frames, 1)`` (frame vectors are
        promoted); returns int 0/1 decisions of the same shape.
        """
        vad_prob = np.asarray(vad_prob, np.float32)
        squeeze = vad_prob.ndim == 1
        if squeeze:
            vad_prob = vad_prob[None, :, None]
        elif vad_prob.ndim == 2:
            vad_prob = vad_prob[:, :, None]
        active = vad_prob >= deactivation_th
        starting = vad_prob >= activation_th
        B, T, _ = vad_prob.shape
        t_idx = np.arange(T)[None, :, None]
        # speech at t iff inside an `active` run containing an earlier
        # (or equal) `starting` frame: compare the most recent start
        # against the most recent inactive frame (vectorized form of
        # the reference's sequential 2->1 promotion loop).
        last_inactive = np.maximum.accumulate(
            np.where(~active, t_idx, -1), axis=1
        )
        last_start = np.maximum.accumulate(
            np.where(starting, t_idx, -1), axis=1
        )
        vad_th = (active & (last_start > last_inactive)).astype(np.int32)
        return vad_th[0, :, 0] if squeeze else vad_th

    def get_boundaries(self, prob_th, output_value="seconds"):
        """Binary frame decisions -> (N, 2) begin/end boundaries.

        The end value is the *last speech frame* (reference subtracts
        one before scaling, ``interfaces.py:1438-1443``); seconds =
        frame * time_resolution, samples = round(sr * seconds).
        """
        prob_th = np.asarray(prob_th).astype(np.float32)
        if prob_th.ndim == 1:
            prob_th = prob_th[None, :, None]
        elif prob_th.ndim == 2:
            prob_th = prob_th[:, :, None]
        prob_th = prob_th.copy()
        shifted = np.roll(prob_th, shift=1, axis=1)
        shifted[:, 0, :] = 0
        prob_th = prob_th + shifted
        prob_th[:, 0, :] = (prob_th[:, 0, :] >= 1).astype(np.float32)
        prob_th[:, -1, :] = (prob_th[:, -1, :] >= 1).astype(np.float32)

        flat = prob_th[0, :, 0]
        change_idx = np.nonzero(flat == 1)[0]
        if len(change_idx) % 2 == 1:
            # speech started in the last frame: close it there
            change_idx = np.concatenate([change_idx, [len(flat)]])
        indexes = change_idx.reshape(-1, 2).astype(np.int64)
        indexes[:, -1] = indexes[:, -1] - 1

        seconds = (indexes * self.time_resolution).astype(np.float32)
        if output_value == "seconds":
            return seconds
        return np.round(self.sample_rate * seconds).astype(np.int64)

    def merge_close_segments(self, boundaries, close_th=0.250):
        """Merge segments whose gap is <= ``close_th`` seconds
        (reference ``interfaces.py:1452-1497``)."""
        boundaries = np.asarray(boundaries, np.float32).reshape(-1, 2)
        if boundaries.shape[0] == 0:
            return boundaries
        merged = [[float(boundaries[0, 0]), float(boundaries[0, 1])]]
        for beg, end in boundaries[1:]:
            if beg - merged[-1][1] <= close_th:
                merged[-1][1] = float(end)
            else:
                merged.append([float(beg), float(end)])
        return np.asarray(merged, np.float32)

    def remove_short_segments(self, boundaries, len_th=0.250):
        """Drop segments with duration <= ``len_th`` seconds
        (reference ``interfaces.py:1499-1528`` keeps strictly longer)."""
        boundaries = np.asarray(boundaries, np.float32).reshape(-1, 2)
        keep = (boundaries[:, 1] - boundaries[:, 0]) > len_th
        return boundaries[keep].reshape(-1, 2)

    def save_boundaries(
        self,
        boundaries,
        save_path=None,
        print_boundaries=True,
        audio_file=None,
    ):
        """Write/print speech and non-speech intervals in the
        reference's readable segment format
        (``interfaces.py:1530-1603``)."""
        boundaries = np.asarray(boundaries).reshape(-1, 2)
        f = None
        if save_path is not None:
            f = open(save_path, mode="w", encoding="utf-8")
        audio_len = None
        if audio_file is not None:
            sample_rate, audio_len = self._get_audio_info(audio_file)
            audio_len = audio_len / sample_rate
        if np.issubdtype(boundaries.dtype, np.integer):
            value_format = "% i"
        else:
            value_format = "% .2f "

        def emit(cnt, a, b, label):
            print_str = (
                "segment_%03d " + value_format + value_format + label
            )
            line = print_str % (cnt, a, b)
            if print_boundaries:
                print(line)
            if f is not None:
                f.write(line + "\n")

        last_end = 0
        cnt_seg = 0
        end_value = 0
        for i in range(boundaries.shape[0]):
            begin_value = boundaries[i, 0]
            end_value = boundaries[i, 1]
            if last_end != begin_value:
                cnt_seg += 1
                emit(cnt_seg, last_end, begin_value, "NON_SPEECH")
            cnt_seg += 1
            emit(cnt_seg, begin_value, end_value, "SPEECH")
            last_end = end_value
        if audio_file is not None and last_end < audio_len:
            cnt_seg += 1
            emit(cnt_seg, end_value, audio_len, "NON_SPEECH")
        if f is not None:
            f.close()

    # -- energy refinement ---------------------------------------------------

    def energy_VAD(
        self,
        audio_file,
        boundaries,
        activation_th=0.5,
        deactivation_th=0.0,
        eps=1e-6,
    ):
        """Fine-grained energy VAD inside each detected speech segment
        (reference ``interfaces.py:1605-1705``): log-sum-abs chunk
        energies normalized to mean 0.5 / half-std 0.5, then the same
        hysteresis thresholding."""
        sample_rate, audio_len = self._get_audio_info(audio_file)
        if sample_rate != self.sample_rate:
            raise ValueError(
                "The detected sample rate is different from that set "
                "in the hparam file"
            )
        chunk_len = int(self.time_resolution * sample_rate)
        new_boundaries = []
        boundaries = np.asarray(boundaries, np.float32).reshape(-1, 2)
        for i in range(boundaries.shape[0]):
            begin_sample = int(boundaries[i, 0] * sample_rate)
            end_sample = int(boundaries[i, 1] * sample_rate)
            seg_len = end_sample - begin_sample
            segment = self._read_segment(audio_file, begin_sample, seg_len)
            segment_chunks = self.create_chunks(
                segment[None], chunk_size=chunk_len, chunk_stride=chunk_len
            )
            energy_chunks = np.abs(segment_chunks).sum(-1) + eps
            energy_chunks = np.log(energy_chunks)
            energy_chunks = (
                (energy_chunks - energy_chunks.mean())
                / (2 * energy_chunks.std(ddof=1))
            ) + 0.5
            energy_vad = self.apply_threshold(
                energy_chunks[None, :, None],
                activation_th=activation_th,
                deactivation_th=deactivation_th,
            )
            energy_boundaries = self.get_boundaries(
                energy_vad, output_value="seconds"
            )
            for j in range(energy_boundaries.shape[0]):
                start_en = boundaries[i, 0] + energy_boundaries[j, 0]
                end_en = boundaries[i, 0] + energy_boundaries[j, 1]
                new_boundaries.append([start_en, end_en])
        return np.asarray(new_boundaries, np.float32).reshape(-1, 2)

    # -- chunk/file helpers ----------------------------------------------------

    def create_chunks(self, x, chunk_size=16384, chunk_stride=16384):
        """Split (batch, time) signals into strided chunks concatenated
        over the batch axis (reference ``interfaces.py:1707-1730``)."""
        x = np.asarray(x)
        if x.ndim == 1:
            x = x[None]
        n_win = max(0, (x.shape[1] - chunk_size) // chunk_stride + 1)
        idx = (
            np.arange(chunk_size)[None, :]
            + np.arange(n_win)[:, None] * chunk_stride
        )
        return x[:, idx].reshape(x.shape[0] * n_win, -1)

    def _get_audio_info(self, audio_file):
        """(sample_rate, num_frames) of the input audio file."""
        from speechbrain_tpu.dataio.dataio import audio_info

        return audio_info(str(audio_file))

    def _read_segment(self, audio_file, frame_offset, num_frames):
        """Read ``num_frames`` samples starting at ``frame_offset``
        (mono float32) — the torchaudio.load(frame_offset, num_frames)
        role in the reference."""
        from speechbrain_tpu.dataio.dataio import _load_audio_any

        audio, _ = _load_audio_any(
            str(audio_file), int(frame_offset),
            int(frame_offset) + int(num_frames),
        )
        audio = np.asarray(audio, np.float32)
        if audio.ndim > 1:
            audio = audio.mean(axis=-1)
        return audio

    # -- visualization / verification helpers ------------------------------

    def upsample_VAD(self, vad_out, audio_file, time_resolution=0.01):
        """Upsample frame decisions to sample rate for visualization
        (reference ``interfaces.py:1741-1785``)."""
        sample_rate, sig_len = self._get_audio_info(audio_file)
        if sample_rate != self.sample_rate:
            raise ValueError(
                "The detected sample rate is different from that set "
                "in the hparam file"
            )
        vad_out = np.asarray(vad_out)
        if vad_out.ndim == 1:
            vad_out = vad_out[None, :, None]
        beg_samp = 0
        step_size = int(time_resolution * sample_rate)
        end_samp = step_size
        index = 0
        vad_signal = np.zeros((1, sig_len), np.float32)
        while end_samp < sig_len:
            vad_signal[0, beg_samp:end_samp] = vad_out[0, index, 0]
            index += 1
            beg_samp += step_size
            end_samp = beg_samp + step_size
        return vad_signal

    def upsample_boundaries(self, boundaries, audio_file):
        """Boundaries -> sample-rate 0/1 signal (reference
        ``interfaces.py:1787-1822``)."""
        sample_rate, sig_len = self._get_audio_info(audio_file)
        if sample_rate != self.sample_rate:
            raise ValueError(
                "The detected sample rate is different from that set "
                "in the hparam file"
            )
        boundaries = np.asarray(boundaries).reshape(-1, 2)
        vad_signal = np.zeros((1, sig_len), np.float32)
        for i in range(boundaries.shape[0]):
            beg_sample = int(boundaries[i, 0] * sample_rate)
            end_sample = int(boundaries[i, 1] * sample_rate)
            vad_signal[0, beg_sample:end_sample] = 1.0
        return vad_signal

    def double_check_speech_segments(
        self, boundaries, audio_file, speech_th=0.5
    ):
        """Re-score each candidate segment with the neural VAD and keep
        those whose mean posterior exceeds ``speech_th`` (reference
        ``interfaces.py:1824-1868``)."""
        self._get_audio_info(audio_file)
        boundaries = np.asarray(boundaries, np.float32).reshape(-1, 2)
        sample_rate = self.sample_rate
        new_boundaries = []
        for i in range(boundaries.shape[0]):
            beg_sample = int(boundaries[i, 0] * sample_rate)
            end_sample = int(boundaries[i, 1] * sample_rate)
            segment = self._read_segment(
                audio_file, beg_sample, end_sample - beg_sample
            )
            speech_prob = self.get_speech_prob_chunk(segment[None])
            if float(np.asarray(speech_prob).mean()) > speech_th:
                new_boundaries.append(
                    [boundaries[i, 0], boundaries[i, 1]]
                )
        return np.asarray(new_boundaries, np.float32).reshape(-1, 2)

    def get_segments(
        self, boundaries, audio_file, before_margin=0.1, after_margin=0.1
    ):
        """Extract the detected speech waveform segments, with margins
        (reference ``interfaces.py:1870-1913``)."""
        sample_rate, sig_len = self._get_audio_info(audio_file)
        if sample_rate != self.sample_rate:
            raise ValueError(
                "The detected sample rate is different from that set "
                "in the hparam file"
            )
        boundaries = np.asarray(boundaries, np.float32).reshape(-1, 2)
        segments = []
        for i in range(boundaries.shape[0]):
            beg_sample = boundaries[i, 0] * sample_rate
            end_sample = boundaries[i, 1] * sample_rate
            beg_sample = int(
                max(0, beg_sample - before_margin * sample_rate)
            )
            end_sample = int(
                min(sig_len, end_sample + after_margin * sample_rate)
            )
            segments.append(
                self._read_segment(
                    audio_file, beg_sample, end_sample - beg_sample
                )[None]
            )
        return segments

    # -- full pipeline ----------------------------------------------------

    def get_speech_segments(
        self,
        audio_file,
        large_chunk_size=30,
        small_chunk_size=10,
        overlap_small_chunk=False,
        apply_energy_VAD=False,
        double_check=True,
        close_th=0.250,
        len_th=0.250,
        activation_th=0.5,
        deactivation_th=0.25,
        en_activation_th=0.5,
        en_deactivation_th=0.0,
        speech_th=0.50,
    ):
        """Full pipeline: posteriors -> threshold -> boundaries ->
        (energy VAD) -> merge -> remove-short -> (double check)
        (reference ``interfaces.py:1915-2047``)."""
        prob_chunks = self.get_speech_prob_file(
            audio_file,
            large_chunk_size=large_chunk_size,
            small_chunk_size=small_chunk_size,
            overlap_small_chunk=overlap_small_chunk,
        )
        prob_th = self.apply_threshold(
            prob_chunks,
            activation_th=activation_th,
            deactivation_th=deactivation_th,
        ).astype(np.float32)
        boundaries = self.get_boundaries(prob_th, output_value="seconds")
        if apply_energy_VAD:
            boundaries = self.energy_VAD(
                audio_file,
                boundaries,
                activation_th=en_activation_th,
                deactivation_th=en_deactivation_th,
            )
        boundaries = self.merge_close_segments(
            boundaries, close_th=close_th
        )
        boundaries = self.remove_short_segments(boundaries, len_th=len_th)
        if double_check:
            boundaries = self.double_check_speech_segments(
                boundaries, audio_file, speech_th=speech_th
            )
        return boundaries

    def forward(self, wavs, wav_lens=None):
        """Frame-level speech-activity predictions."""
        return self.get_speech_prob_chunk(wavs, wav_lens)


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

    def forward(self, wavs, wav_lens=None):
        """Runs the encoder (reference interfaces.py:719)."""
        return self.encode_batch(wavs, wav_lens)

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
        # Serving params are frozen, so the searcher may cache its
        # jitted program across calls (one compile per shape bucket).
        if hasattr(self.decoder, "jit_call"):
            self.decoder.jit_call = True

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

    def forward(self, wavs, wav_lens):
        """Runs full decoding (reference interfaces.py:523)."""
        return self.decode_batch(wavs, wav_lens)

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

    def gettrue_snrrange(self, inp):
        """0-1 range -> true SNR range via hparams snrmin/snrmax
        (reference ``pretrained/interfaces.py:2692``)."""
        rnge = self.hparams.snrmax - self.hparams.snrmin
        return inp * rnge + self.hparams.snrmin

    def forward(self, mix, predictions):
        """Just run the batch estimate."""
        return self.estimate_batch(mix, predictions)

    def __call__(self, mix, predictions):
        return self.estimate_batch(mix, predictions)


class GraphemeToPhoneme(Pretrained):
    """Text -> phonemes via a trained G2P model."""

    HPARAMS_NEEDED = ["grapheme_encoder", "phoneme_decoder_fn"]

    @property
    def phonemes(self):
        """The available phonemes (reference interfaces.py:2478)."""
        return self.hparams.phonemes

    @property
    def language(self):
        """The language this model serves (reference :2483)."""
        return self.hparams.language

    def load_dependencies(self):
        """Load any relevant model dependencies declared as a
        ``deps_pretrainer`` in hparams (reference :2524)."""
        deps_pretrainer = getattr(self.hparams, "deps_pretrainer", None)
        if deps_pretrainer:
            deps_pretrainer.collect_files()
            deps_pretrainer.load_collected()

    def _update_graphemes(self, model_inputs):
        """Route the configured grapheme_sequence_mode's encoding to the
        canonical ``grapheme_encoded`` key (reference :2515)."""
        mode = getattr(self.hparams, "grapheme_sequence_mode", None)
        if mode and mode != "raw":
            key = f"grapheme_encoded_{mode}"
            if key in model_inputs:
                model_inputs["grapheme_encoded"] = model_inputs[key]

    def forward(self, text):
        """Runs the G2P conversion."""
        return self.g2p(text)

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

    def forward(self, noisy, lengths=None):
        """Runs enhancement on the noisy input (reference interfaces.py:2548)."""
        return self.enhance_batch(noisy, lengths)

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
    """Text -> mel spectrogram with a trained Tacotron2.

    Exported as ``Tacotron2`` too, matching the reference interface
    name (``pretrained/interfaces.py:2700``)."""

    MODULES_NEEDED = ["model"]
    HPARAMS_NEEDED = ["text_to_sequence"]

    def text_to_seq(self, txt):
        """Raw text -> (token id sequence, length) with the bundle's
        text_to_sequence fn (reference interfaces.py:2740)."""
        sequence = self.hparams.text_to_sequence(txt)
        return sequence, len(sequence)

    def encode_batch(self, texts):
        """Mel spectrograms for a list of texts, which must be sorted
        by decreasing length (reference interfaces.py:2746)."""
        lens = [self.text_to_seq(t)[1] for t in texts]
        assert lens == sorted(
            lens, reverse=True
        ), "input lengths must be sorted in decreasing order"
        return self._encode_texts(texts)

    def forward(self, texts):
        """Encodes the input texts."""
        return self.encode_batch(texts)

    def encode_text(self, texts):
        """Synthesize mel spectrograms from input texts."""
        return self._encode_texts(texts)

    def _encode_texts(self, texts):
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


# Reference-named alias (reference interfaces.py:2700).
Tacotron2 = Tacotron2TTS


class HIFIGAN(Pretrained):
    """Mel spectrogram -> waveform with a trained HiFiGAN generator."""

    MODULES_NEEDED = ["generator"]

    def decode_batch(self, spectrogram):
        """Decode a batch into hypotheses/waveforms."""
        import jax.numpy as jnp

        return self._apply("generator", jnp.asarray(spectrogram))

    def forward(self, spectrogram):
        """Decodes the input spectrograms (reference interfaces.py:2871)."""
        return self.decode_batch(spectrogram)

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

    def forward(self, mix):
        """Runs separation on the input mix (reference interfaces.py:2153)."""
        return self.separate_batch(mix)

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

    def forward(self, noisy, lengths=None):
        """Runs enhancement on the noisy input (reference interfaces.py:2616)."""
        return self.enhance_batch(noisy, lengths)

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
