"""Differentiable (negative) STOI loss for enhancement training.

Parity target: reference ``nnet/loss/stoi_loss.py:130``.  Implements the
standard short-time objective intelligibility surrogate: one-third-octave
band energies over 384 ms analysis windows, clipped normalized
correlation, averaged; returned negated so lower = better.
"""

import jax.numpy as jnp
import numpy as np

from speechbrain_tpu.processing.features import STFT

__all__ = ["stoi_loss"]


def _thirdoct(fs, n_fft, num_bands, min_freq):
    """One-third-octave band matrix (num_bands, n_fft//2+1), numpy."""
    f = np.linspace(0, fs / 2, n_fft // 2 + 1)
    k = np.arange(num_bands)
    cf = 2.0 ** (k / 3.0) * min_freq
    lo = cf * 2 ** (-1.0 / 6)
    hi = cf * 2 ** (1.0 / 6)
    A = np.zeros((num_bands, len(f)))
    for i in range(num_bands):
        A[i, (f >= lo[i]) & (f < hi[i])] = 1.0
    return A.astype(np.float32)


def stoi_loss(y_pred_batch, y_true_batch, lens=None, reduction="mean"):
    """Negative STOI surrogate on time-domain signals (B, T) @ 16 kHz.

    Example
    -------
    >>> import numpy as np, jax.numpy as jnp
    >>> rng = np.random.default_rng(0)
    >>> clean = jnp.asarray(rng.normal(size=(1, 8000)).astype(np.float32))
    >>> worse = clean + 1.0 * jnp.asarray(
    ...     rng.normal(size=(1, 8000)).astype(np.float32))
    >>> bool(stoi_loss(clean, clean) < stoi_loss(worse, clean))
    True
    """
    fs = 10000  # STOI operates at 10 kHz in the original; use 16k frames
    y_pred_batch = jnp.asarray(y_pred_batch)
    y_true_batch = jnp.asarray(y_true_batch)
    stft = STFT(
        sample_rate=16000, win_length=16, hop_length=8, n_fft=512,
        window_type="hann",
    )
    def bands(x):
        spec = stft(x)
        mag2 = (spec ** 2).sum(-1)
        A = jnp.asarray(_thirdoct(16000, 512, 15, 150))
        return jnp.sqrt(
            jnp.maximum(mag2 @ A.T, 1e-10)
        )  # (B, frames, bands)

    Xp = bands(y_pred_batch)
    Xt = bands(y_true_batch)
    N = 30  # analysis length in frames (~240ms at 8ms hop)
    B, T, Q = Xp.shape
    if T < N:
        N = T
    # sliding windows (stride 1) via gather
    starts = jnp.arange(T - N + 1)
    idx = starts[:, None] + jnp.arange(N)[None, :]
    Wp = Xp[:, idx, :]  # (B, S, N, Q)
    Wt = Xt[:, idx, :]
    # normalization + clipping per (segment, band)
    alpha = jnp.sqrt(
        (Wt ** 2).sum(axis=2, keepdims=True)
        / jnp.maximum((Wp ** 2).sum(axis=2, keepdims=True), 1e-10)
    )
    Wp_n = Wp * alpha
    beta = 10 ** (-15 / 20)  # clip at -15 dB SDR
    Wp_n = jnp.minimum(Wp_n, Wt * (1 + beta))
    mp = Wp_n - Wp_n.mean(axis=2, keepdims=True)
    mt = Wt - Wt.mean(axis=2, keepdims=True)
    corr = (mp * mt).sum(axis=2) / jnp.maximum(
        jnp.sqrt((mp ** 2).sum(axis=2) * (mt ** 2).sum(axis=2)), 1e-10
    )
    stoi = corr.mean(axis=(1, 2))  # (B,)
    loss = -stoi
    if reduction == "mean":
        return loss.mean()
    return loss


def thirdoct(fs, nfft, num_bands, min_freq):
    """Public one-third-octave band matrix (reference
    ``nnet/loss/stoi_loss.py:14``): returns (obm, center_freqs).

    Example
    -------
    >>> obm, cf = thirdoct(10000, 512, 15, 150)
    >>> obm.shape
    (15, 257)
    """
    obm = _thirdoct(fs, nfft, num_bands, min_freq)
    k = np.arange(num_bands)
    cf = 2.0 ** (k / 3.0) * min_freq
    return obm, cf


def removeSilentFrames(x, y, dyn_range=40, N=256, K=128):
    """Drop frames whose clean-signal energy is more than ``dyn_range``
    dB below the loudest frame, then overlap-add back (reference
    ``nnet/loss/stoi_loss.py:30``).  Host-side numpy (data prep).

    Example
    -------
    >>> import numpy as np
    >>> x = np.concatenate([np.zeros(512), np.ones(512)])
    >>> xs, ys = removeSilentFrames(x, x.copy())
    >>> len(xs) < len(x)
    True
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    w = np.hanning(N + 2)[1:-1]
    n_frames = (len(x) - N) // K + 1
    frames = np.stack(
        [x[i * K : i * K + N] * w for i in range(max(n_frames, 0))]
    )
    energies = 20 * np.log10(
        np.linalg.norm(frames, axis=1) / np.sqrt(N) + 1e-20
    )
    keep = energies > (energies.max() - dyn_range)
    xs = np.zeros_like(x)
    ys = np.zeros_like(y)
    norm = np.zeros_like(x)
    pos = 0
    for i in range(len(keep)):
        if not keep[i]:
            continue
        xs[pos : pos + N] += x[i * K : i * K + N] * w
        ys[pos : pos + N] += y[i * K : i * K + N] * w
        norm[pos : pos + N] += w**2
        pos += K
    end = pos + N - K
    norm = np.maximum(norm, 1e-10)
    return (xs / norm)[:end], (ys / norm)[:end]
