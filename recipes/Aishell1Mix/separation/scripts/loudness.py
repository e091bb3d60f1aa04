"""ITU-R BS.1770 integrated loudness + normalization (native).

The reference Aishell1Mix scripts use ``pyloudnorm`` for LUFS
measurement and gain setting; this is a compact numpy implementation
of the same algorithm (K-weighting: shelving + high-pass biquads at
the measurement rate, 400 ms blocks with 75% overlap, absolute -70
LUFS and relative -10 LU gating) so corpus generation needs no extra
dependency.
"""

import numpy as np

__all__ = ["integrated_loudness", "normalize_loudness"]


def _k_weighting_coeffs(fs):
    """Shelving + high-pass biquad coefficients per BS.1770-4."""
    # stage 1: high-shelf
    db = 3.999843853973347
    f0 = 1681.974450955533
    Q = 0.7071752369554196
    K = np.tan(np.pi * f0 / fs)
    Vh = 10 ** (db / 20.0)
    Vb = Vh ** 0.4996667741545416
    a0 = 1.0 + K / Q + K * K
    b_shelf = np.array(
        [
            (Vh + Vb * K / Q + K * K) / a0,
            2.0 * (K * K - Vh) / a0,
            (Vh - Vb * K / Q + K * K) / a0,
        ]
    )
    a_shelf = np.array(
        [1.0, 2.0 * (K * K - 1.0) / a0, (1.0 - K / Q + K * K) / a0]
    )
    # stage 2: high-pass
    f0 = 38.13547087602444
    Q = 0.5003270373238773
    K = np.tan(np.pi * f0 / fs)
    den = 1.0 + K / Q + K * K
    b_hp = np.array([1.0, -2.0, 1.0])
    a_hp = np.array(
        [1.0, 2.0 * (K * K - 1.0) / den, (1.0 - K / Q + K * K) / den]
    )
    return (b_shelf, a_shelf), (b_hp, a_hp)


def _biquad(x, b, a):
    from scipy.signal import lfilter

    return lfilter(b, a, x)


def integrated_loudness(audio, fs):
    """Gated integrated loudness (LUFS) of a mono signal."""
    audio = np.asarray(audio, np.float64)
    (bs, as_), (bh, ah) = _k_weighting_coeffs(fs)
    y = _biquad(_biquad(audio, bs, as_), bh, ah)
    block = int(0.400 * fs)
    hop = int(0.100 * fs)
    if len(y) < block:
        ms = np.mean(y**2) + 1e-12
        return -0.691 + 10.0 * np.log10(ms)
    n_blocks = 1 + (len(y) - block) // hop
    idx = np.arange(block)[None, :] + hop * np.arange(n_blocks)[:, None]
    ms = np.mean(y[idx] ** 2, axis=1) + 1e-12
    lk = -0.691 + 10.0 * np.log10(ms)
    # absolute gate
    keep = lk > -70.0
    if not keep.any():
        return -70.0
    # relative gate
    rel = (
        -0.691 + 10.0 * np.log10(np.mean(ms[keep])) - 10.0
    )
    keep &= lk > rel
    if not keep.any():
        return -70.0
    return -0.691 + 10.0 * np.log10(np.mean(ms[keep]))


def normalize_loudness(audio, fs, target_lufs):
    """Scale ``audio`` to the target integrated loudness; returns
    (scaled audio, applied linear gain)."""
    current = integrated_loudness(audio, fs)
    gain = 10.0 ** ((target_lufs - current) / 20.0)
    return np.asarray(audio) * gain, gain
