"""Tacotron2 text-to-speech (encoder/attention/decoder/postnet).

Parity target: reference ``lobes/models/Tacotron2.py:1228`` (Tacotron2),
``:1578`` (Loss), ``:1736`` (TextMelCollate).  Teacher-forced training
runs the decoder as an nn.scan over mel frames; inference is a host
loop with a stop-gate.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Tacotron2",
    "Loss",
    "LocationSensitiveAttention",
    "TextMelCollate",
]


class TextMelCollate:
    """Collate (text_ids, mel) examples, length-sorted and padded.

    Parity target: reference ``Tacotron2.py:1736``.  Returns numpy
    arrays ready for the Brain: text, text_lens (absolute), mels,
    mel_lens (absolute), plus the sort order for id bookkeeping.

    Example
    -------
    >>> collate = TextMelCollate(n_mel=4)
    >>> batch = [
    ...     {"text_ids": np.array([1, 2]), "mel": np.zeros((5, 4))},
    ...     {"text_ids": np.array([3]), "mel": np.zeros((3, 4))},
    ... ]
    >>> out = collate(batch)
    >>> out["text"].shape, out["mel"].shape
    ((2, 2), (2, 5, 4))
    """

    def __init__(self, n_mel=80, n_frames_per_step=1):
        self.n_mel = n_mel
        self.n_frames_per_step = n_frames_per_step

    def __call__(self, batch):
        order = sorted(
            range(len(batch)),
            key=lambda i: len(batch[i]["text_ids"]),
            reverse=True,
        )
        batch = [batch[i] for i in order]
        max_text = max(len(ex["text_ids"]) for ex in batch)
        max_mel = max(ex["mel"].shape[0] for ex in batch)
        rem = max_mel % self.n_frames_per_step
        if rem:
            max_mel += self.n_frames_per_step - rem
        B = len(batch)
        text = np.zeros((B, max_text), np.int64)
        text_lens = np.zeros(B, np.int64)
        mels = np.zeros((B, max_mel, self.n_mel), np.float32)
        mel_lens = np.zeros(B, np.int64)
        gate = np.zeros((B, max_mel), np.float32)
        for i, ex in enumerate(batch):
            t = np.asarray(ex["text_ids"])
            m = np.asarray(ex["mel"])
            text[i, : len(t)] = t
            text_lens[i] = len(t)
            mels[i, : m.shape[0]] = m
            mel_lens[i] = m.shape[0]
            gate[i, m.shape[0] - 1 :] = 1.0
        return {
            "text": text,
            "text_lens": text_lens,
            "mel": mels,
            "mel_lens": mel_lens,
            "gate": gate,
            "order": order,
        }


class Prenet(nn.Module):
    """Tacotron2 decoder prenet (bottleneck MLP with always-on dropout)."""
    sizes: tuple = (256, 256)
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train=True):
        # Tacotron2 keeps prenet dropout ON at inference (regularizing
        # the autoregressive loop) — the reference does the same.
        for s in self.sizes:
            x = jax.nn.relu(nn.Dense(s, use_bias=False, dtype=x.dtype)(x))
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1 - self.dropout, x.shape)
            x = jnp.where(keep, x / (1 - self.dropout), 0.0)
        return x


class LocationSensitiveAttention(nn.Module):
    """Content + location (conv over cumulative weights) attention."""

    attn_dim: int = 128
    location_filters: int = 32
    location_kernel: int = 31

    @nn.compact
    def __call__(self, query, memory, processed_memory, attn_state, mask):
        """query (B, H); attn_state: (prev_attn, cum_attn) (B, T)."""
        prev_attn, cum_attn = attn_state
        loc = jnp.stack([prev_attn, cum_attn], axis=-1)
        loc = nn.Conv(
            features=self.location_filters,
            kernel_size=(self.location_kernel,),
            padding="SAME",
            use_bias=False,
            dtype=query.dtype,
        )(loc)
        loc = nn.Dense(self.attn_dim, use_bias=False, dtype=query.dtype)(loc)
        q = nn.Dense(self.attn_dim, use_bias=False, dtype=query.dtype)(
            query
        )[:, None, :]
        energies = nn.Dense(1, use_bias=False, dtype=query.dtype)(
            jnp.tanh(q + loc + processed_memory)
        )[..., 0]
        energies = jnp.where(mask, energies, -1e20)
        attn = jax.nn.softmax(energies, axis=-1)
        context = jnp.einsum("bt,btc->bc", attn, memory)
        return context, attn, (attn, cum_attn + attn)


class Postnet(nn.Module):
    """Tacotron2 conv postnet refining the coarse mel output."""
    n_mel: int = 80
    channels: int = 512
    kernel: int = 5
    n_convs: int = 5

    @nn.compact
    def __call__(self, x, train=True):
        for i in range(self.n_convs):
            last = i == self.n_convs - 1
            x = nn.Conv(
                features=self.n_mel if last else self.channels,
                kernel_size=(self.kernel,),
                padding="SAME",
                dtype=x.dtype,
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, dtype=x.dtype
            )(x)
            if not last:
                x = jnp.tanh(x)
            x = nn.Dropout(rate=0.5, deterministic=not train)(x)
        return x


class Encoder(nn.Module):
    """Tacotron2 text encoder (convs + BiLSTM)."""
    emb_dim: int = 512
    n_convs: int = 3
    kernel: int = 5

    @nn.compact
    def __call__(self, x, train=True):
        from speechbrain_tpu.nnet.RNN import LSTM

        for i in range(self.n_convs):
            x = nn.Conv(
                features=self.emb_dim, kernel_size=(self.kernel,),
                padding="SAME", dtype=x.dtype,
            )(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=x.dtype)(x)
            x = jax.nn.relu(x)
            x = nn.Dropout(rate=0.5, deterministic=not train)(x)
        out, _ = LSTM(
            hidden_size=self.emb_dim // 2, bidirectional=True
        )(x, train=train)
        return out


class Tacotron2(nn.Module):
    """Full Tacotron2: tokens -> (mel_outputs, mel_postnet, gate, attn).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> model = Tacotron2(n_symbols=20, symbol_emb=16, enc_dim=16,
    ...     attn_dim=8, dec_rnn_dim=16, prenet_sizes=(8, 8), n_mel=10)
    >>> tokens = jnp.zeros((2, 7), jnp.int32)
    >>> mels = jnp.zeros((2, 12, 10))
    >>> v = model.init({"params": jax.random.PRNGKey(0),
    ...                 "dropout": jax.random.PRNGKey(1)},
    ...                tokens, jnp.ones(2), mels, train=False)
    >>> out, post, gate, attn = model.apply(
    ...     v, tokens, jnp.ones(2), mels, train=False,
    ...     rngs={"dropout": jax.random.PRNGKey(2)})
    >>> out.shape, gate.shape
    ((2, 12, 10), (2, 12))
    """

    n_symbols: int = 148
    symbol_emb: int = 512
    enc_dim: int = 512
    attn_dim: int = 128
    dec_rnn_dim: int = 1024
    prenet_sizes: tuple = (256, 256)
    n_mel: int = 80
    gate_threshold: float = 0.5
    max_decoder_steps: int = 1000

    def setup(self):
        """Flax setup: declare submodules/params."""
        from speechbrain_tpu.nnet.RNN import LSTMCell

        self.embedding = nn.Embed(self.n_symbols, self.symbol_emb)
        self.encoder = Encoder(emb_dim=self.enc_dim)
        self.memory_proj = nn.Dense(self.attn_dim, use_bias=False)
        self.prenet = Prenet(sizes=self.prenet_sizes)
        self.attn = LocationSensitiveAttention(attn_dim=self.attn_dim)
        self.attention_rnn = LSTMCell(hidden_size=self.dec_rnn_dim)
        self.decoder_rnn = LSTMCell(hidden_size=self.dec_rnn_dim)
        self.mel_proj = nn.Dense(self.n_mel)
        self.gate_proj = nn.Dense(1)
        self.postnet = Postnet(n_mel=self.n_mel)

    def _decode_step(self, mel_prev, carry, memory, processed_memory, mask, train):
        (attn_h, dec_h, context, attn_state) = carry
        pre = self.prenet(mel_prev, train=train)
        cell_in = jnp.concatenate([pre, context], axis=-1)
        attn_out, attn_h = self.attention_rnn(cell_in, attn_h, train=train)
        context, attn_w, attn_state = self.attn(
            attn_out, memory, processed_memory, attn_state, mask
        )
        dec_in = jnp.concatenate([attn_out, context], axis=-1)
        dec_out, dec_h = self.decoder_rnn(dec_in, dec_h, train=train)
        proj_in = jnp.concatenate([dec_out, context], axis=-1)
        mel = self.mel_proj(proj_in)
        gate = self.gate_proj(proj_in)[..., 0]
        return mel, gate, attn_w, (attn_h, dec_h, context, attn_state)

    def __call__(self, tokens, token_lens, mels, train=True):
        """Teacher-forced training pass; mels (B, T_mel, n_mel)."""
        B = tokens.shape[0]
        T_text = tokens.shape[1]
        emb = self.embedding(jnp.asarray(tokens, jnp.int32))
        memory = self.encoder(emb, train=train)
        processed_memory = self.memory_proj(memory)
        mask = (
            jnp.arange(T_text)[None, :]
            < (jnp.asarray(token_lens) * T_text)[:, None]
        )
        zeros = jnp.zeros((1, B, self.dec_rnn_dim), memory.dtype)
        carry0 = (
            (zeros, zeros),
            (zeros, zeros),
            jnp.zeros((B, memory.shape[-1]), memory.dtype),
            (
                jnp.zeros((B, T_text), memory.dtype),
                jnp.zeros((B, T_text), memory.dtype),
            ),
        )
        # Teacher forcing: inputs are shifted mels (go-frame = zeros).
        mel_in = jnp.concatenate(
            [jnp.zeros((B, 1, self.n_mel), mels.dtype), mels[:, :-1]],
            axis=1,
        )

        def body(mdl, carry, mel_prev):
            mel, gate, attn_w, carry = mdl._decode_step(
                mel_prev, carry, memory, processed_memory, mask, train
            )
            return carry, (mel, gate, attn_w)

        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1,
            out_axes=1,
        )
        _, (mel_out, gate_out, attn_ws) = scan(self, carry0, mel_in)
        mel_post = mel_out + self.postnet(mel_out, train=train)
        return mel_out, mel_post, gate_out, attn_ws

    def infer(self, tokens, token_lens, max_steps=None):
        """Autoregressive inference (host loop with gate stopping)."""
        max_steps = max_steps or self.max_decoder_steps
        B = tokens.shape[0]
        T_text = tokens.shape[1]
        emb = self.embedding(jnp.asarray(tokens, jnp.int32))
        memory = self.encoder(emb, train=False)
        processed_memory = self.memory_proj(memory)
        mask = (
            jnp.arange(T_text)[None, :]
            < (jnp.asarray(token_lens) * T_text)[:, None]
        )
        zeros = jnp.zeros((1, B, self.dec_rnn_dim), memory.dtype)
        carry = (
            (zeros, zeros),
            (zeros, zeros),
            jnp.zeros((B, memory.shape[-1]), memory.dtype),
            (
                jnp.zeros((B, T_text), memory.dtype),
                jnp.zeros((B, T_text), memory.dtype),
            ),
        )
        mel_prev = jnp.zeros((B, self.n_mel), memory.dtype)
        mels, gates = [], []
        for _ in range(max_steps):
            mel, gate, attn_w, carry = self._decode_step(
                mel_prev, carry, memory, processed_memory, mask, False
            )
            mels.append(mel)
            gates.append(gate)
            mel_prev = mel
            if bool(
                jnp.all(jax.nn.sigmoid(gate) > self.gate_threshold)
            ):
                break
        mel_out = jnp.stack(mels, axis=1)
        mel_post = mel_out + self.postnet(mel_out, train=False)
        return mel_out, mel_post, jnp.stack(gates, axis=1)


class Loss:
    """Tacotron2 loss: mel MSE (pre+post) + gate BCE.

    Example
    -------
    >>> import jax.numpy as jnp
    >>> loss_fn = Loss()
    >>> mels = jnp.zeros((1, 5, 4))
    >>> gates = jnp.zeros((1, 5))
    >>> out = loss_fn((mels, mels, gates), (mels, jnp.array([4])))
    >>> bool(out["loss"] < 1.0)
    True
    """

    def __init__(self, gate_pos_weight=1.0):
        self.gate_pos_weight = gate_pos_weight

    def __call__(self, model_output, targets):
        mel_out, mel_post, gate_out = model_output
        mel_target, output_lengths = targets
        T = mel_out.shape[1]
        mask = (
            jnp.arange(T)[None, :]
            < jnp.asarray(output_lengths)[:, None]
        ).astype(mel_out.dtype)
        m3 = mask[..., None]
        denom = jnp.maximum(m3.sum(), 1.0)
        mel_loss = (
            ((mel_out - mel_target) ** 2 * m3).sum() / denom
            + ((mel_post - mel_target) ** 2 * m3).sum() / denom
        )
        # Gate target: 1 at the last valid frame onwards.
        gate_target = (
            jnp.arange(T)[None, :]
            >= (jnp.asarray(output_lengths) - 1)[:, None]
        ).astype(mel_out.dtype)
        log_p = jax.nn.log_sigmoid(gate_out)
        log_np = jax.nn.log_sigmoid(-gate_out)
        gate_loss = -(
            self.gate_pos_weight * gate_target * log_p
            + (1 - gate_target) * log_np
        ).mean()
        return {
            "loss": mel_loss + gate_loss,
            "mel_loss": mel_loss,
            "gate_loss": gate_loss,
        }


def get_mask_from_lengths(lengths, max_len=None):
    """Boolean mask (True inside the sequence) from absolute lengths
    (reference ``lobes/models/Tacotron2.py``, helper used by the
    decoder masking).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> get_mask_from_lengths(jnp.array([2, 3])).tolist()
    [[True, True, False], [True, True, True]]
    """
    if max_len is None:
        max_len = int(jnp.max(lengths))
    ids = jnp.arange(max_len)
    return ids[None, :] < lengths[:, None]


def dynamic_range_compression(x, C=1, clip_val=1e-5):
    """log-compression used on mel targets (reference
    ``lobes/models/Tacotron2.py:44``-style helper)."""
    return jnp.log(jnp.maximum(x, clip_val) * C)


def mel_spectogram(
    sample_rate,
    hop_length,
    win_length,
    n_fft,
    n_mels,
    f_min,
    f_max,
    power,
    normalized,
    norm,
    mel_scale,
    compression,
    audio,
):
    """Mel spectrogram for TTS targets; same semantics as the HiFiGAN
    module's helper (single shared implementation)."""
    from speechbrain_tpu.lobes.models.HifiGAN import (
        mel_spectogram as _mel,
    )

    return _mel(
        sample_rate, hop_length, win_length, n_fft, n_mels, f_min,
        f_max, power, normalized, norm, mel_scale, compression, audio,
    )


class LinearNorm(nn.Module):
    """Xavier-initialized Dense layer (reference Tacotron2
    ``LinearNorm``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lin = LinearNorm(out_dim=4)
    >>> v = lin.init(jax.random.PRNGKey(0), jnp.ones((2, 3)))
    >>> lin.apply(v, jnp.ones((2, 3))).shape
    (2, 4)
    """

    out_dim: int
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.out_dim,
            use_bias=self.bias,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=x.dtype,
        )(x)


class ConvNorm(nn.Module):
    """Xavier-initialized 1-d convolution, channels-last (reference
    Tacotron2 ``ConvNorm``).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> conv = ConvNorm(out_channels=4, kernel_size=5)
    >>> v = conv.init(jax.random.PRNGKey(0), jnp.ones((2, 10, 3)))
    >>> conv.apply(v, jnp.ones((2, 10, 3))).shape
    (2, 10, 4)
    """

    out_channels: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            features=self.out_channels,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            padding="SAME",
            use_bias=self.bias,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=x.dtype,
        )(x)


# Reference-name aliases: the reference's ``Attention`` is the
# location-sensitive attention; ``LocationLayer`` is its conv+linear
# feature extractor (folded into LocationSensitiveAttention here).
Attention = LocationSensitiveAttention
LocationLayer = LocationSensitiveAttention
