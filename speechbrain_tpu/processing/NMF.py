"""Non-negative matrix factorization source separation.

Parity target: reference ``processing/NMF.py:31``
(NMF_separate_spectra).
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["spectral_phase", "NMF_separate_spectra"]


def spectral_phase(stft):
    """Phase of a (batch, time, freq, 2) STFT."""
    stft = jnp.asarray(stft)
    return jnp.arctan2(stft[..., 1], stft[..., 0])


def NMF_separate_spectra(Whats, Xmix, n_iter=100, eps=1e-20):
    """Separate a mixture magnitude spectrum with trained NMF templates.

    Arguments
    ---------
    Whats : [W1, W2] template matrices (freq, K) for the two sources
    Xmix : (batch, time, freq) magnitude spectra of the mixture

    Returns (X1hat, X2hat) separated magnitude estimates.
    """
    W1, W2 = [np.asarray(w, np.float64) for w in Whats]
    X = np.asarray(Xmix, np.float64)
    B, T, F = X.shape
    W = np.concatenate([W1, W2], axis=1)  # (F, K1+K2)
    K1 = W1.shape[1]
    X1s, X2s = [], []
    rng = np.random.default_rng(0)
    for b in range(B):
        V = np.maximum(np.asarray(Xmix[b]).T, eps)  # (F, T)
        H = rng.uniform(0.1, 1.0, size=(W.shape[1], V.shape[1]))
        for _ in range(n_iter):
            WH = np.maximum(W @ H, eps)
            H = H * (W.T @ (V / WH)) / np.maximum(
                W.T @ np.ones_like(V), eps
            )
        WH = np.maximum(W @ H, eps)
        V1 = (W[:, :K1] @ H[:K1]) / WH * V
        V2 = (W[:, K1:] @ H[K1:]) / WH * V
        X1s.append(V1.T)
        X2s.append(V2.T)
    return np.stack(X1s), np.stack(X2s)


def reconstruct_results(
    X1hat, X2hat, X_stft, sample_rate, win_length, hop_length
):
    """Reconstruct separated spectra into waveforms via Wiener-style
    masking of the mixture STFT + ISTFT (reference
    ``processing/NMF.py:102``).

    ``X1hat``/``X2hat``: (BS, n_fft/2+1, T) magnitude estimates;
    ``X_stft``: (BS, n_fft/2+1, T, 2) mixture real/imag parts.
    Returns two lists of waveforms.
    """
    from speechbrain_tpu.processing.features import ISTFT

    istft = ISTFT(
        sample_rate=sample_rate,
        win_length=win_length,
        hop_length=hop_length,
    )
    phase_mix = jnp.arctan2(X_stft[..., 1], X_stft[..., 0])
    mag_mix = jnp.sqrt(X_stft[..., 0] ** 2 + X_stft[..., 1] ** 2)
    x1hats, x2hats = [], []
    eps = 1e-25
    for i in range(X1hat.shape[0]):
        X1 = X1hat[i]
        X2 = X2hat[i]
        total = X1 + X2 + eps
        X1_m = (X1 / total) * mag_mix[i]
        X2_m = (X2 / total) * mag_mix[i]
        for Xm, out in ((X1_m, x1hats), (X2_m, x2hats)):
            # (F, T) -> (1, T, F, 2) reference STFT layout
            re = (Xm * jnp.cos(phase_mix[i])).T[None, ..., None]
            im = (Xm * jnp.sin(phase_mix[i])).T[None, ..., None]
            shat = istft(jnp.concatenate([re, im], axis=-1))
            out.append(shat[0])
    return x1hats, x2hats
