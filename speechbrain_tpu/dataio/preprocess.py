"""Waveform-level preprocessing at load time.

Parity target: reference ``dataio/preprocess.py:7`` (AudioNormalizer).
"""

import numpy as np

__all__ = ["AudioNormalizer"]


class AudioNormalizer:
    """Resample to a standard rate and downmix to mono (host side).

    Example
    -------
    >>> normalizer = AudioNormalizer(sample_rate=16000)
    >>> stereo = np.ones((160, 2), dtype=np.float32)
    >>> normalizer(stereo, 16000).shape
    (160,)
    """

    def __init__(self, sample_rate=16000, mix="avg-to-mono"):
        self.sample_rate = sample_rate
        if mix not in ["avg-to-mono", "keep"]:
            raise ValueError(f"Unexpected mixing configuration {mix}")
        self.mix = mix

    def __call__(self, audio, sample_rate):
        audio = np.asarray(audio, dtype=np.float32)
        if sample_rate != self.sample_rate:
            audio = _resample_poly(audio, sample_rate, self.sample_rate)
        return self._mix(audio)

    def _mix(self, audio):
        if audio.ndim == 1 or self.mix == "keep":
            return audio
        if self.mix == "avg-to-mono":
            return audio.mean(axis=1)
        return audio


def _resample_poly(audio, orig_freq, new_freq):
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(int(orig_freq), int(new_freq))
    up = int(new_freq) // g
    down = int(orig_freq) // g
    return resample_poly(audio, up, down, axis=0).astype(np.float32)
