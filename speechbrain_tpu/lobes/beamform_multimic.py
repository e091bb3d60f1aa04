"""Multi-mic delay-and-sum beamforming lobe.

Parity target: reference ``lobes/beamform_multimic.py:19``
(DelaySum_Beamformer): STFT -> covariance -> GCC-PHAT TDOA -> delay-sum
-> ISTFT, as a single callable used in front of ASR models.
"""

import jax.numpy as jnp

from speechbrain_tpu.processing.features import ISTFT, STFT
from speechbrain_tpu.processing.multi_mic import Covariance, DelaySum, GccPhat

__all__ = ["DelaySum_Beamformer"]


class DelaySum_Beamformer:
    """Beamform multichannel waveforms to mono.

    Example
    -------
    >>> import numpy as np
    >>> bf = DelaySum_Beamformer(sampling_rate=16000)
    >>> wavs = np.random.default_rng(0).normal(
    ...     size=(1, 8000, 4)).astype(np.float32)
    >>> bf(wavs).shape
    (1, 8000)
    """

    def __init__(self, sampling_rate=16000, n_fft=400, win_length=25, hop_length=10):
        self.stft = STFT(
            sampling_rate, win_length=win_length,
            hop_length=hop_length, n_fft=n_fft,
        )
        self.istft = ISTFT(
            sampling_rate, win_length=win_length,
            hop_length=hop_length, n_fft=n_fft,
        )
        self.cov = Covariance(average=True)
        self.gcc = GccPhat()
        self.delay_sum = DelaySum()

    def __call__(self, wavs):
        """(batch, time, channels) -> (batch, time) beamformed."""
        wavs = jnp.asarray(wavs)
        T = wavs.shape[1]
        X = self.stft(wavs)  # (B, frames, F, 2, C)
        XX = self.cov(X)
        tdoas = self.gcc(XX)
        Y = self.delay_sum(X, tdoas)  # (B, frames, F, 2, 1)
        return self.istft(Y[..., 0], sig_length=T)
