"""Feature-extraction frontends: Fbank, MFCC, Leaf.

Pure functions of static config — they inline into the jitted train
step, so the whole frontend fuses with the first encoder layers in XLA
(no separate "feature extraction" pass or host roundtrip).

Parity targets: reference ``lobes/features.py:22`` (Fbank), ``:150``
(MFCC), ``:284`` (Leaf).
"""

import flax.linen as nn
import jax.numpy as jnp

from speechbrain_tpu.processing.features import (
    DCT,
    STFT,
    ContextWindow,
    Deltas,
    Filterbank,
    spectral_magnitude,
)

__all__ = ["Fbank", "MFCC", "Leaf"]


class Fbank:
    """waveform (B, T) -> log-mel features (B, frames, n_mels[*k]).

    Example
    -------
    >>> import numpy as np
    >>> fbank = Fbank(n_mels=40)
    >>> fbank(np.zeros((1, 16000), dtype=np.float32)).shape
    (1, 101, 40)
    """

    def __init__(
        self,
        deltas=False,
        context=False,
        requires_grad=False,
        sample_rate=16000,
        f_min=0,
        f_max=None,
        n_fft=400,
        n_mels=40,
        filter_shape="triangular",
        win_length=25,
        hop_length=10,
        left_frames=5,
        right_frames=5,
        mxu_dtype=None,
    ):
        self.deltas = deltas
        self.context = context
        if f_max is None:
            f_max = sample_rate / 2
        self.compute_STFT = STFT(
            sample_rate=sample_rate,
            n_fft=n_fft,
            win_length=win_length,
            hop_length=hop_length,
            mxu_dtype=mxu_dtype,
        )
        self.compute_fbanks = Filterbank(
            sample_rate=sample_rate,
            n_fft=n_fft,
            n_mels=n_mels,
            f_min=f_min,
            f_max=f_max,
            filter_shape=filter_shape,
        )
        self.compute_deltas = Deltas()
        self.context_window = ContextWindow(
            left_frames=left_frames, right_frames=right_frames
        )

    def __call__(self, wav):
        stft = self.compute_STFT(wav)
        mag = spectral_magnitude(stft, power=1)
        fbanks = self.compute_fbanks(mag)
        if self.deltas:
            delta1 = self.compute_deltas(fbanks)
            delta2 = self.compute_deltas(delta1)
            fbanks = jnp.concatenate([fbanks, delta1, delta2], axis=-1)
        if self.context:
            fbanks = self.context_window(fbanks)
        return fbanks


class MFCC:
    """waveform -> MFCCs (DCT of log-mels) with optional deltas/context.

    Example
    -------
    >>> import numpy as np
    >>> mfcc = MFCC(n_mfcc=20, deltas=False, context=False)
    >>> mfcc(np.zeros((1, 16000), dtype=np.float32)).shape
    (1, 101, 20)
    """

    def __init__(
        self,
        deltas=True,
        context=True,
        requires_grad=False,
        sample_rate=16000,
        f_min=0,
        f_max=None,
        n_fft=400,
        n_mels=23,
        n_mfcc=20,
        filter_shape="triangular",
        win_length=25,
        hop_length=10,
        left_frames=5,
        right_frames=5,
    ):
        self.deltas = deltas
        self.context = context
        self.fbank = Fbank(
            deltas=False,
            context=False,
            sample_rate=sample_rate,
            f_min=f_min,
            f_max=f_max,
            n_fft=n_fft,
            n_mels=n_mels,
            filter_shape=filter_shape,
            win_length=win_length,
            hop_length=hop_length,
        )
        self.compute_dct = DCT(input_size=n_mels, n_out=n_mfcc)
        self.compute_deltas = Deltas()
        self.context_window = ContextWindow(
            left_frames=left_frames, right_frames=right_frames
        )

    def __call__(self, wav):
        fbanks = self.fbank(wav)
        mfccs = self.compute_dct(fbanks)
        if self.deltas:
            delta1 = self.compute_deltas(mfccs)
            delta2 = self.compute_deltas(delta1)
            mfccs = jnp.concatenate([mfccs, delta1, delta2], axis=-1)
        if self.context:
            mfccs = self.context_window(mfccs)
        return mfccs


class Leaf(nn.Module):
    """Learnable frontend: GaborConv1d -> squared modulus ->
    GaussianLowpassPooling -> PCEN (reference ``lobes/features.py:284``).
    """

    out_channels: int = 40
    window_len: float = 25.0
    window_stride: float = 10.0
    sample_rate: int = 16000
    min_freq: float = 60.0
    max_freq: float | None = None
    use_pcen: bool = True
    learnable_pcen: bool = True

    @nn.compact
    def __call__(self, wav):
        from speechbrain_tpu.nnet.CNN import GaborConv1d
        from speechbrain_tpu.nnet.normalization import PCEN
        from speechbrain_tpu.nnet.pooling import GaussianLowpassPooling

        window_size = int(self.sample_rate * self.window_len / 1000) + 1
        window_stride = int(self.sample_rate * self.window_stride / 1000)
        if wav.ndim == 2:
            wav = wav[..., None]
        outputs = GaborConv1d(
            out_channels=2 * self.out_channels,
            kernel_size=window_size,
            stride=1,
            padding="same",
            sample_rate=self.sample_rate,
            min_freq=self.min_freq,
            max_freq=self.max_freq,
        )(wav)
        # squared modulus of (real, imag) channel pairs
        real = outputs[..., 0::2]
        imag = outputs[..., 1::2]
        sq = real ** 2 + imag ** 2
        pooled = GaussianLowpassPooling(
            in_channels=self.out_channels,
            kernel_size=window_size,
            stride=window_stride,
        )(sq)
        pooled = jnp.maximum(pooled, 1e-11)
        if self.use_pcen:
            pooled = PCEN(
                input_size=self.out_channels,
                trainable=self.learnable_pcen,
            )(pooled)
        return pooled
