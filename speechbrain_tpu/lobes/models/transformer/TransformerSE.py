"""CNN-Transformer for speech enhancement.

Parity target: reference
``lobes/models/transformer/TransformerSE.py`` (CNNTransformerSE) —
an encoder-only (optionally causal) transformer over enhancement
features with a linear+activation mask head.
"""

import flax.linen as nn
import jax.numpy as jnp

from speechbrain_tpu.lobes.models.transformer.Transformer import (
    TransformerEncoder,
    get_key_padding_mask,
    get_lookahead_mask,
)

__all__ = ["CNNTransformerSE"]


class CNNTransformerSE(nn.Module):
    """Transformer encoder with optional CNN pre-encoder for SE.

    Arguments
    ---------
    d_model : int
        Encoder feature size.
    output_size : int
        Output (e.g. mask) dimension.
    output_activation : str
        'relu' | 'sigmoid' | 'softplus' | 'linear' head activation.
    nhead, num_layers, d_ffn, dropout, activation, normalize_before :
        Standard encoder hyperparameters.
    causal : bool
        Forbid attention to future frames (streaming enhancement).
    custom_emb_module : nn.Module | None
        Optional module applied to the input before the encoder.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = CNNTransformerSE(d_model=32, output_size=33, num_layers=2,
    ...     nhead=4, d_ffn=64)
    >>> x = jnp.ones((2, 12, 32))
    >>> v = net.init(jax.random.PRNGKey(0), x, train=False)
    >>> net.apply(v, x, train=False).shape
    (2, 12, 33)
    """

    d_model: int
    output_size: int
    output_activation: str = "relu"
    nhead: int = 8
    num_layers: int = 8
    d_ffn: int = 512
    dropout: float = 0.1
    activation: str = "leaky_relu"
    causal: bool = True
    custom_emb_module: nn.Module | None = None
    normalize_before: bool = False

    @nn.compact
    def __call__(self, x, lengths=None, train=True):
        attn_mask = (
            get_lookahead_mask(x.shape[1]) if self.causal else None
        )
        src_key_padding_mask = None
        if lengths is not None:
            src_key_padding_mask = get_key_padding_mask(
                lengths, x.shape[1]
            )
        if self.custom_emb_module is not None:
            x = self.custom_emb_module(x)
        if x.shape[-1] != self.d_model:
            # Default input projection onto d_model (the reference
            # relies on custom_emb_module for this; a Dense keeps the
            # module usable standalone).
            x = nn.Dense(self.d_model, name="in_proj")(x)
        enc_out, _ = TransformerEncoder(
            num_layers=self.num_layers,
            nhead=self.nhead,
            d_ffn=self.d_ffn,
            d_model=self.d_model,
            dropout=self.dropout,
            activation=self.activation,
            normalize_before=self.normalize_before,
        )(
            x,
            src_mask=attn_mask,
            src_key_padding_mask=src_key_padding_mask,
            train=train,
        )
        out = nn.Dense(self.output_size, use_bias=False)(enc_out)
        if self.output_activation == "relu":
            return nn.relu(out)
        if self.output_activation == "sigmoid":
            return nn.sigmoid(out)
        if self.output_activation == "softplus":
            return nn.softplus(out)
        return out


class SpectralMaskWrapper(nn.Module):
    """Waveform-in/waveform-out spectral-mask enhancement wrapper.

    STFT -> compressed magnitude -> ``masker`` (e.g.
    ``CNNTransformerSE``) -> mask x magnitude -> iSTFT with the noisy
    phase.  Gives spectral-domain maskers the same (B, T) ->
    (B, T, 1) contract as the time-domain separation models, so the
    reference's STFT-encoder enhancement configs
    (``recipes/WHAMandWHAMR/enhancement/hparams/cnntransformer-*.yaml``)
    plug into the shared separation/enhancement Brain unchanged.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> net = SpectralMaskWrapper(
    ...     masker=CNNTransformerSE(d_model=16, output_size=129,
    ...                             num_layers=1, nhead=4, d_ffn=32),
    ...     n_fft=256)
    >>> x = jnp.ones((1, 2000))
    >>> v = net.init(jax.random.PRNGKey(0), x, train=False)
    >>> net.apply(v, x, train=False).shape
    (1, 2000, 1)
    """

    masker: nn.Module = None
    sample_rate: int = 8000
    win_length: int = 32.0  # ms
    hop_length: int = 16.0  # ms
    n_fft: int = 512
    mag_power: float = 0.5

    @nn.compact
    def __call__(self, wav, train=True):
        from speechbrain_tpu.processing.features import (
            ISTFT,
            STFT,
            spectral_magnitude,
        )
        from speechbrain_tpu.processing.signal_processing import (
            resynthesize,
        )

        stft = STFT(
            sample_rate=self.sample_rate,
            win_length=self.win_length,
            hop_length=self.hop_length,
            n_fft=self.n_fft,
        )
        istft = ISTFT(
            sample_rate=self.sample_rate,
            win_length=self.win_length,
            hop_length=self.hop_length,
            n_fft=self.n_fft,
        )
        feats = stft(wav)
        mag = spectral_magnitude(feats, power=self.mag_power)
        mask = self.masker(mag, train=train)
        enhanced_mag = (jnp.maximum(mask, 0.0) * mag) ** (
            1.0 / self.mag_power
        )
        out = resynthesize(enhanced_mag, wav, stft, istft)
        T_orig = wav.shape[1]
        if out.shape[1] >= T_orig:
            out = out[:, :T_orig]
        else:
            out = jnp.pad(out, ((0, 0), (0, T_orig - out.shape[1])))
        return out[..., None]
