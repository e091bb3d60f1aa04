"""Whisper speech model (encoder-decoder), TPU-native.

Parity target: reference ``lobes/models/huggingface_whisper.py:30``
(``HuggingFaceWhisper``).  The reference is a thin wrapper around the
torch HuggingFace implementation plus OpenAI's log-mel frontend
(``huggingface_whisper.py:209-244``); here the architecture itself is
implemented on this framework's transformer blocks so it runs as one
XLA program:

- log-mel frontend: hann/400-fft/160-hop STFT -> power -> slaney-mel ->
  log10 with the Whisper max-8dB floor and (x+4)/4 scaling
  (``huggingface_whisper.py:209-244``), with the 30-second pad-or-trim
  (``huggingface_whisper.py:246-280``);
- encoder: two GELU convs (stride 1, 2) + fixed sinusoidal positions +
  pre-LN transformer stack with a final LayerNorm;
- decoder: learned positional embeddings + pre-LN cross-attention stack;
  logits are tied to the token embedding
  (``huggingface_whisper.py:308-315``).

``HuggingFaceWhisper`` below keeps the reference's checkpoint-loading
role by wrapping the *Flax* HF implementation (no torch): weights load
from a local path, so published Whisper checkpoints can be fine-tuned.
"""

import logging
import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.lobes.models.transformer.Transformer import (
    TransformerDecoder,
    TransformerEncoder,
    get_lookahead_mask,
)

logger = logging.getLogger(__name__)

__all__ = [
    "mel_filters_slaney",
    "log_mel_spectrogram",
    "pad_or_trim",
    "Whisper",
    "HuggingFaceWhisper",
]

# Whisper frontend constants (OpenAI audio.py).
N_FFT = 400
HOP_LENGTH = 160
N_SAMPLES = 480000  # 30 s at 16 kHz


def mel_filters_slaney(n_mels=80, n_fft=N_FFT, sample_rate=16000):
    """Slaney-normalized triangular mel filterbank, (n_mels, n_fft//2+1).

    Matches librosa ``filters.mel(sr, n_fft, n_mels)`` defaults (the
    matrix the reference registers as ``_mel_filters``,
    ``huggingface_whisper.py:95-97``): slaney mel scale (linear below
    1 kHz, log above) and slaney area normalization.

    Example
    -------
    >>> fb = mel_filters_slaney(n_mels=80)
    >>> fb.shape
    (80, 201)
    """
    n_freqs = n_fft // 2 + 1
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = 3.0 * f / 200.0
        min_log_hz = 1000.0
        min_log_mel = 15.0
        logstep = np.log(6.4) / 27.0
        return np.where(
            f >= min_log_hz,
            min_log_mel + np.log(np.maximum(f, min_log_hz) / min_log_hz) / logstep,
            mel,
        )

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = 200.0 * m / 3.0
        min_log_mel = 15.0
        logstep = np.log(6.4) / 27.0
        return np.where(
            m >= min_log_mel,
            1000.0 * np.exp(logstep * (np.maximum(m, min_log_mel) - min_log_mel)),
            f,
        )

    max_mel = hz_to_mel(sample_rate / 2.0)
    mels = np.linspace(0.0, float(max_mel), n_mels + 2)
    hz_pts = mel_to_hz(mels)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def pad_or_trim(wav, length=N_SAMPLES):
    """Pad with zeros or trim the last axis to ``length`` samples
    (reference ``huggingface_whisper.py:246-280``)."""
    wav = jnp.asarray(wav)
    T = wav.shape[-1]
    if T > length:
        return wav[..., :length]
    if T < length:
        pad = [(0, 0)] * (wav.ndim - 1) + [(0, length - T)]
        return jnp.pad(wav, pad)
    return wav


def log_mel_spectrogram(audio, mel_fb):
    """Whisper log-mel features, (B, n_frames, n_mels).

    Mirrors ``huggingface_whisper.py:209-244``: hann-window centered
    STFT, power spectrum with the final frame dropped, mel projection,
    log10 clamped at 1e-10, floored at per-utterance max - 8, then
    ``(x + 4) / 4``.

    Arguments
    ---------
    audio : (B, samples) at 16 kHz, already pad-or-trimmed.
    mel_fb : (n_mels, n_fft//2 + 1) filter matrix.
    """
    audio = jnp.asarray(audio, jnp.float32)
    window = jnp.asarray(np.hanning(N_FFT + 1)[:-1], jnp.float32)
    x = jnp.pad(audio, [(0, 0), (N_FFT // 2, N_FFT // 2)], mode="reflect")
    n_frames = 1 + (x.shape[-1] - N_FFT) // HOP_LENGTH
    idx = (
        jnp.arange(n_frames)[:, None] * HOP_LENGTH + jnp.arange(N_FFT)[None, :]
    )
    frames = x[:, idx] * window  # (B, n_frames, N_FFT)
    spec = jnp.fft.rfft(frames, axis=-1)
    magnitudes = jnp.abs(spec[:, :-1, :]) ** 2  # drop last frame
    mel = jnp.einsum(
        "mf,btf->btm", jnp.asarray(mel_fb, jnp.float32), magnitudes
    )
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    floor = jnp.max(log_spec.reshape(log_spec.shape[0], -1), axis=-1) - 8.0
    log_spec = jnp.maximum(log_spec, floor[:, None, None])
    return (log_spec + 4.0) / 4.0


def _sinusoids(length, channels, max_timescale=10000):
    """Whisper's fixed sinusoidal position table, (length, channels)."""
    log_inc = math.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return jnp.asarray(
        np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1), jnp.float32
    )


class WhisperEncoder(nn.Module):
    """Conv stem + sinusoidal positions + pre-LN transformer stack."""

    d_model: int = 384
    nhead: int = 6
    num_layers: int = 4
    d_ffn: int = 1536
    dropout: float = 0.0
    max_source_positions: int = 1500

    @nn.compact
    def __call__(self, mel, train=True):
        # mel: (B, T, n_mels); conv over time, channels-last.
        x = nn.Conv(self.d_model, (3,), padding=1, name="conv1")(mel)
        x = jax.nn.gelu(x)
        x = nn.Conv(
            self.d_model, (3,), strides=(2,), padding=1, name="conv2"
        )(x)
        x = jax.nn.gelu(x)
        T = x.shape[1]
        x = x + _sinusoids(self.max_source_positions, self.d_model)[:T]
        out, _ = TransformerEncoder(
            num_layers=self.num_layers,
            nhead=self.nhead,
            d_ffn=self.d_ffn,
            d_model=self.d_model,
            dropout=self.dropout,
            activation="gelu",
            normalize_before=True,
            name="blocks",
        )(x, train=train)
        return out


class WhisperDecoder(nn.Module):
    """Token + learned-position embeddings, pre-LN cross-attn stack,
    tied-embedding logits (``huggingface_whisper.py:308-315``)."""

    vocab_size: int = 51865
    d_model: int = 384
    nhead: int = 6
    num_layers: int = 4
    d_ffn: int = 1536
    dropout: float = 0.0
    max_target_positions: int = 448

    @nn.compact
    def __call__(self, tokens, enc_states, train=True):
        embed = nn.Embed(
            self.vocab_size, self.d_model, name="embed_tokens",
            dtype=jnp.float32,
        )
        pos = self.param(
            "embed_positions",
            nn.initializers.normal(0.02),
            (self.max_target_positions, self.d_model),
        )
        L = tokens.shape[1]
        x = embed(tokens) + pos[:L]
        out, _, cross_attns = TransformerDecoder(
            num_layers=self.num_layers,
            nhead=self.nhead,
            d_ffn=self.d_ffn,
            d_model=self.d_model,
            dropout=self.dropout,
            activation="gelu",
            normalize_before=True,
            name="blocks",
        )(x, enc_states, tgt_mask=get_lookahead_mask(L), train=train)
        logits = out @ embed.embedding.T
        return logits, cross_attns[-1]


class Whisper(nn.Module):
    """Native Whisper encoder-decoder (reference API:
    ``huggingface_whisper.py:117-164``).

    ``__call__(wav, decoder_input_ids)`` -> (enc_out, logits, attn);
    with ``encoder_only=True`` it returns enc_out alone.  The log-mel
    frontend runs inside the module, so the whole model is one jittable
    function of the waveform.  ``freeze`` / ``freeze_encoder`` apply
    ``stop_gradient`` (the functional equivalent of
    ``requires_grad=False``, ``huggingface_whisper.py:101-115``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> model = Whisper(vocab_size=64, d_model=32, nhead=4,
    ...     encoder_layers=1, decoder_layers=1, d_ffn=64,
    ...     n_samples=3200, max_source_positions=10)
    >>> wav = jnp.zeros((1, 3000))
    >>> ids = jnp.zeros((1, 2), jnp.int32)
    >>> v = model.init(jax.random.PRNGKey(0), wav, ids, train=False)
    >>> enc, logits, attn = model.apply(v, wav, ids, train=False)
    >>> enc.shape, logits.shape
    ((1, 10, 32), (1, 2, 64))
    """

    vocab_size: int = 51865
    n_mels: int = 80
    d_model: int = 384
    nhead: int = 6
    encoder_layers: int = 4
    decoder_layers: int = 4
    d_ffn: int = 1536
    dropout: float = 0.0
    max_source_positions: int = 1500
    max_target_positions: int = 448
    n_samples: int = N_SAMPLES
    encoder_only: bool = False
    freeze: bool = False
    freeze_encoder: bool = False
    sampling_rate: int = 16000

    def setup(self):
        """Build encoder/decoder submodules and the mel filterbank."""
        self.encoder = WhisperEncoder(
            d_model=self.d_model,
            nhead=self.nhead,
            num_layers=self.encoder_layers,
            d_ffn=self.d_ffn,
            dropout=self.dropout,
            max_source_positions=self.max_source_positions,
        )
        if not self.encoder_only:
            self.decoder = WhisperDecoder(
                vocab_size=self.vocab_size,
                d_model=self.d_model,
                nhead=self.nhead,
                num_layers=self.decoder_layers,
                d_ffn=self.d_ffn,
                dropout=self.dropout,
                max_target_positions=self.max_target_positions,
            )
        # numpy, not jnp: module-held device arrays get captured by
        # jitted consumers (see STFT._dft_re, processing/features.py).
        self._mel_fb = np.asarray(
            mel_filters_slaney(self.n_mels, N_FFT, self.sampling_rate)
        )

    def __call__(self, wav, decoder_input_ids=None, train=True):
        enc_out = self.forward_encoder(wav, train=train)
        if self.encoder_only:
            return enc_out
        logits, attn = self.forward_decoder(
            enc_out, decoder_input_ids, train=train
        )
        return enc_out, logits, attn

    def forward_encoder(self, wav, train=True):
        """Waveform -> encoder states (B, T_enc, d_model)."""
        mel = log_mel_spectrogram(
            pad_or_trim(wav, self.n_samples), self._mel_fb
        )
        out = self.encoder(mel, train=train and not self.freeze)
        if self.freeze or self.freeze_encoder:
            out = jax.lax.stop_gradient(out)
        return out

    def forward_decoder(self, enc_states, decoder_input_ids, train=True):
        """One decoder pass: (logits (B, L, V), last cross-attn)."""
        logits, attn = self.decoder(
            decoder_input_ids, enc_states, train=train and not self.freeze
        )
        if self.freeze:
            logits = jax.lax.stop_gradient(logits)
            attn = jax.lax.stop_gradient(attn)
        return logits, attn


class HuggingFaceWhisper:
    """Wrapper over the HF **Flax** Whisper for loading published
    checkpoints (reference ``huggingface_whisper.py:30`` role, torch-free).

    Arguments
    ---------
    source : str
        Local path of a saved Flax Whisper model/config (no network
        fetch — pass a directory produced by ``save_pretrained``).
    sampling_rate : int
    encoder_only, freeze, freeze_encoder : bool
        Same semantics as the native ``Whisper``.
    config_only : bool
        Initialize randomly from the config at ``source`` instead of
        loading weights (offline testing).
    """

    def __init__(
        self,
        source,
        save_path=None,
        sampling_rate=16000,
        encoder_only=False,
        freeze=False,
        freeze_encoder=False,
        config_only=False,
        seed=0,
    ):
        try:
            from transformers import FlaxWhisperModel, WhisperConfig
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "transformers (with Flax) is required for HuggingFaceWhisper"
            ) from e
        self.sampling_rate = sampling_rate
        self.encoder_only = encoder_only
        self.freeze = freeze
        self.freeze_encoder = freeze_encoder
        if config_only:
            config = WhisperConfig.from_pretrained(source)
            self.model = FlaxWhisperModel(config, seed=seed)
        else:
            self.model = FlaxWhisperModel.from_pretrained(
                source, local_files_only=True
            )
        cfg = self.model.config
        # numpy, not jnp (see note above).
        self._mel_fb = np.asarray(
            mel_filters_slaney(cfg.num_mel_bins, N_FFT, sampling_rate)
        )
        if freeze:
            logger.warning("HuggingFaceWhisper - encoder-decoder is frozen.")
        elif freeze_encoder:
            logger.warning("HuggingFaceWhisper - encoder is frozen.")

    @property
    def params(self):
        """The HF Flax parameter pytree (trainable leaves)."""
        return self.model.params

    def __call__(self, wav, decoder_input_ids=None, params=None):
        enc = self.forward_encoder(wav, params=params)
        if self.encoder_only:
            return enc
        logits, attn = self.forward_decoder(
            enc, decoder_input_ids, params=params
        )
        return enc, logits, attn

    def forward_encoder(self, wav, params=None):
        """Waveform -> encoder last hidden state."""
        mel = log_mel_spectrogram(pad_or_trim(wav), self._mel_fb)
        # HF expects (B, n_mels, T).
        out = self.model.encode(
            input_features=jnp.swapaxes(mel, 1, 2),
            params=params or self.model.params,
        ).last_hidden_state
        if self.freeze or self.freeze_encoder:
            out = jax.lax.stop_gradient(out)
        return out

    def forward_decoder(self, enc_states, decoder_input_ids, params=None):
        """(logits via tied embedding, last cross-attention)."""
        params = params or self.model.params
        out = self.model.decode(
            decoder_input_ids=decoder_input_ids,
            encoder_outputs=(enc_states,),
            params=params,
            output_attentions=True,
        )
        embed = params["decoder"]["embed_tokens"]["embedding"]
        logits = out.last_hidden_state @ embed.T
        attn = out.cross_attentions[-1]
        attn = attn.reshape(-1, *attn.shape[2:])
        if self.freeze:
            logits = jax.lax.stop_gradient(logits)
        return logits, attn


def load_whisper_hf_params(variables, hf_params):
    """Transplant a HuggingFace ``FlaxWhisperModel`` parameter tree into
    the native :class:`Whisper` module's variables.

    The fine-tuning path advertised by the recipe docs
    (``recipes/LibriSpeech/ASR/transformer/hparams/train_hf_whisper.yaml``):
    load a local HF Flax checkpoint, transplant, continue training the
    native module.  HF whisper's k projections carry no bias (the
    OpenAI convention); the native module's k bias is zeroed.

    Arguments
    ---------
    variables : dict
        Output of ``Whisper(...).init(...)`` (shapes must match the HF
        config: d_model, layers, heads, ffn, vocab).
    hf_params : dict
        ``FlaxWhisperModel(...).params``.

    Returns
    -------
    dict
        New variables with ``params`` replaced by the transplant.
    """
    import flax

    hf = flax.traverse_util.flatten_dict(hf_params, sep="/")
    flat = dict(
        flax.traverse_util.flatten_dict(variables["params"], sep="/")
    )

    def put(dst, src_kernel=None, value=None):
        assert dst in flat, dst
        v = value if value is not None else hf[src_kernel]
        assert flat[dst].shape == v.shape, (
            dst, flat[dst].shape, v.shape,
        )
        flat[dst] = v

    put("encoder/conv1/kernel", "encoder/conv1/kernel")
    put("encoder/conv1/bias", "encoder/conv1/bias")
    put("encoder/conv2/kernel", "encoder/conv2/kernel")
    put("encoder/conv2/bias", "encoder/conv2/bias")
    put("encoder/blocks/norm_out/scale", "encoder/layer_norm/scale")
    put("encoder/blocks/norm_out/bias", "encoder/layer_norm/bias")
    put("decoder/blocks/norm_out/scale", "decoder/layer_norm/scale")
    put("decoder/blocks/norm_out/bias", "decoder/layer_norm/bias")
    put(
        "decoder/embed_tokens/embedding",
        "decoder/embed_tokens/embedding",
    )
    n_pos = flat["decoder/embed_positions"].shape[0]
    put(
        "decoder/embed_positions",
        value=hf["decoder/embed_positions/embedding"][:n_pos],
    )

    def attn(dst_prefix, src_prefix):
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            put(
                f"{dst_prefix}/{proj}/kernel",
                f"{src_prefix}/{proj}/kernel",
            )
            src_bias = f"{src_prefix}/{proj}/bias"
            if src_bias in hf:
                put(f"{dst_prefix}/{proj}/bias", src_bias)
            else:  # HF whisper k_proj has no bias
                put(
                    f"{dst_prefix}/{proj}/bias",
                    value=jnp.zeros_like(
                        flat[f"{dst_prefix}/{proj}/bias"]
                    ),
                )

    n_enc = len(
        {k.split("/")[2] for k in hf if k.startswith("encoder/layers/")}
    )
    for i in range(n_enc):
        d = f"encoder/blocks/layer_{i}"
        s = f"encoder/layers/{i}"
        attn(f"{d}/MultiheadAttention_0", f"{s}/self_attn")
        put(f"{d}/LayerNorm_0/scale", f"{s}/self_attn_layer_norm/scale")
        put(f"{d}/LayerNorm_0/bias", f"{s}/self_attn_layer_norm/bias")
        put(f"{d}/LayerNorm_1/scale", f"{s}/final_layer_norm/scale")
        put(f"{d}/LayerNorm_1/bias", f"{s}/final_layer_norm/bias")
        put(
            f"{d}/PositionalwiseFeedForward_0/Dense_0/kernel",
            f"{s}/fc1/kernel",
        )
        put(
            f"{d}/PositionalwiseFeedForward_0/Dense_0/bias",
            f"{s}/fc1/bias",
        )
        put(
            f"{d}/PositionalwiseFeedForward_0/Dense_1/kernel",
            f"{s}/fc2/kernel",
        )
        put(
            f"{d}/PositionalwiseFeedForward_0/Dense_1/bias",
            f"{s}/fc2/bias",
        )

    n_dec = len(
        {k.split("/")[2] for k in hf if k.startswith("decoder/layers/")}
    )
    for i in range(n_dec):
        d = f"decoder/blocks/layer_{i}"
        s = f"decoder/layers/{i}"
        attn(f"{d}/self_attn", f"{s}/self_attn")
        attn(f"{d}/cross_attn", f"{s}/encoder_attn")
        put(f"{d}/LayerNorm_0/scale", f"{s}/self_attn_layer_norm/scale")
        put(f"{d}/LayerNorm_0/bias", f"{s}/self_attn_layer_norm/bias")
        put(
            f"{d}/LayerNorm_1/scale",
            f"{s}/encoder_attn_layer_norm/scale",
        )
        put(
            f"{d}/LayerNorm_1/bias", f"{s}/encoder_attn_layer_norm/bias"
        )
        put(f"{d}/LayerNorm_2/scale", f"{s}/final_layer_norm/scale")
        put(f"{d}/LayerNorm_2/bias", f"{s}/final_layer_norm/bias")
        put(
            f"{d}/PositionalwiseFeedForward_0/Dense_0/kernel",
            f"{s}/fc1/kernel",
        )
        put(
            f"{d}/PositionalwiseFeedForward_0/Dense_0/bias",
            f"{s}/fc1/bias",
        )
        put(
            f"{d}/PositionalwiseFeedForward_0/Dense_1/kernel",
            f"{s}/fc2/kernel",
        )
        put(
            f"{d}/PositionalwiseFeedForward_0/Dense_1/bias",
            f"{s}/fc2/bias",
        )

    out = dict(variables)
    out["params"] = flax.traverse_util.unflatten_dict(flat, sep="/")
    return out
