"""Multi-microphone processing: covariance, TDOA, beamforming, DOA.

All jnp on the STFT-domain representation (batch, frames, freq, channels,
2) used by the feature layer.  Parity targets: reference
``processing/multi_mic.py:85`` (Covariance), ``:198`` (DelaySum), ``:336``
(Mvdr), ``:513`` (Gev), ``:643`` (GccPhat), ``:838`` (SrpPhat), ``:1025``
(Music), ``:1317,1383`` (steering / sphere).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Covariance",
    "GccPhat",
    "DelaySum",
    "Mvdr",
    "Gev",
    "SrpPhat",
    "Music",
    "steering",
    "sphere",
    "doas2taus",
]


def _to_complex(xs):
    """(…, 2) real-imag -> complex."""
    return xs[..., 0] + 1j * xs[..., 1]


def _from_complex(z):
    return jnp.stack([z.real, z.imag], axis=-1)


class Covariance:
    """Spatial covariance per (frame, freq): (B, T, F, C, C) complex as
    upper-triangular vector (reference layout) or full matrix.

    Example
    -------
    >>> import numpy as np
    >>> xs = np.ones((1, 10, 33, 4, 2), np.float32)
    >>> Covariance(average=True)(xs).shape
    (1, 1, 33, 4, 4, 2)
    """

    def __init__(self, average=True):
        self.average = average

    def __call__(self, Xs):
        X = _to_complex(jnp.asarray(Xs))  # (B, T, F, C)
        XX = jnp.einsum("btfc,btfd->btfcd", X, jnp.conj(X))
        if self.average:
            XX = XX.mean(axis=1, keepdims=True)
        return _from_complex(XX)


class GccPhat:
    """GCC-PHAT time-difference-of-arrival estimation.

    Takes covariance (B, T', F, C, C, 2); returns TDOAs (B, T', C, C)
    in samples with quadratic peak interpolation (see unit test for a
    worked two-mic delay-recovery example).
    """

    def __init__(self, tdoa_max=None, eps=1e-20):
        self.tdoa_max = tdoa_max
        self.eps = eps

    def __call__(self, XXs):
        XX = _to_complex(jnp.asarray(XXs))  # (B, T, F, C, C)
        B, T, F, C, _ = XX.shape
        n_fft = 2 * (F - 1)
        phat = XX / jnp.maximum(jnp.abs(XX), self.eps)
        # Cross-correlation via inverse rfft over freq.
        xcorr = jnp.fft.irfft(
            jnp.moveaxis(phat, 2, -1), n=n_fft, axis=-1
        )  # (B, T, C, C, n_fft)
        tdoa_max = self.tdoa_max or n_fft // 2
        # circular: lags [0..tdoa_max] and negative tail
        pos = xcorr[..., : tdoa_max + 1]
        neg = xcorr[..., -tdoa_max:]
        cc = jnp.concatenate([neg, pos], axis=-1)
        lags = jnp.arange(-tdoa_max, tdoa_max + 1)
        idx = jnp.argmax(cc, axis=-1)
        # Quadratic interpolation around the peak.
        i0 = jnp.clip(idx, 1, cc.shape[-1] - 2)
        ym1 = jnp.take_along_axis(cc, (i0 - 1)[..., None], -1)[..., 0]
        y0 = jnp.take_along_axis(cc, i0[..., None], -1)[..., 0]
        yp1 = jnp.take_along_axis(cc, (i0 + 1)[..., None], -1)[..., 0]
        denom = ym1 - 2 * y0 + yp1
        delta = jnp.where(
            jnp.abs(denom) > 1e-10, 0.5 * (ym1 - yp1) / denom, 0.0
        )
        return lags[i0] + delta


class DelaySum:
    """Delay-and-sum beamforming in the frequency domain.

    Applies steering from TDOAs and sums channels.
    """

    def __call__(self, Xs, tdoas):
        X = _to_complex(jnp.asarray(Xs))  # (B, T, F, C)
        B, T, F, C = X.shape
        n_fft = 2 * (F - 1)
        # tdoas relative to mic 0: (B, T', C) -> broadcast over T
        taus = jnp.asarray(tdoas)
        if taus.ndim == 4:  # (B, T', C, C): take row 0
            taus = taus[:, :, 0, :]
        omega = (
            2 * math.pi * jnp.arange(F) / n_fft
        )  # (F,)
        # taus row-0 convention: taus_c = tau_0 - tau_c; aligning x_c
        # (= s delayed by tau_c) needs e^{+j w tau_c} = e^{-j w taus_c}.
        steer = jnp.exp(
            -1j * omega[None, None, :, None] * taus[:, :, None, :]
        )  # (B, T', F, C)
        if steer.shape[1] == 1:
            steer = jnp.broadcast_to(steer, (B, T, F, C))
        Y = (X * steer).sum(axis=-1, keepdims=True) / C
        return _from_complex(Y)


class Mvdr:
    """Minimum-variance distortionless-response beamforming.

    Weights w = (Phi_nn^-1 d) / (d^H Phi_nn^-1 d).
    """

    def __init__(self, eps=1e-6):
        self.eps = eps

    def __call__(self, Xs, NNs, tdoas):
        X = _to_complex(jnp.asarray(Xs))  # (B, T, F, C)
        NN = _to_complex(jnp.asarray(NNs))  # (B, 1|T, F, C, C)
        B, T, F, C = X.shape
        n_fft = 2 * (F - 1)
        taus = jnp.asarray(tdoas)
        if taus.ndim == 4:
            taus = taus[:, :, 0, :]
        omega = 2 * math.pi * jnp.arange(F) / n_fft
        d = jnp.exp(
            1j * omega[None, None, :, None] * taus[:, :, None, :]
        )  # (B, T', F, C) steering vector
        NN_reg = NN + self.eps * jnp.eye(C)[None, None, None]
        NN_inv = jnp.linalg.inv(NN_reg)  # (B, T', F, C, C)
        Nd = jnp.einsum("btfcd,btfd->btfc", NN_inv, d)
        denom = jnp.einsum("btfc,btfc->btf", jnp.conj(d), Nd)
        w = Nd / (denom[..., None] + self.eps)
        if w.shape[1] == 1:
            w = jnp.broadcast_to(w, (B, T, F, C))
        Y = jnp.einsum("btfc,btfc->btf", jnp.conj(w), X)[..., None]
        return _from_complex(Y)


class Gev:
    """Generalized eigenvalue (max-SNR) beamforming.

    w = principal generalized eigenvector of (Phi_ss, Phi_nn).
    """

    def __init__(self, eps=1e-6):
        self.eps = eps

    def __call__(self, Xs, SSs, NNs):
        X = _to_complex(jnp.asarray(Xs))
        SS = _to_complex(jnp.asarray(SSs))
        NN = _to_complex(jnp.asarray(NNs))
        C = X.shape[-1]
        NN_reg = NN + self.eps * jnp.eye(C)[None, None, None]
        # Solve via Cholesky whitening: L L^H = NN; M = L^-1 SS L^-H
        L = jnp.linalg.cholesky(NN_reg)
        Linv = jnp.linalg.inv(L)
        M = Linv @ SS @ jnp.conj(jnp.swapaxes(Linv, -1, -2))
        M = 0.5 * (M + jnp.conj(jnp.swapaxes(M, -1, -2)))
        vals, vecs = jnp.linalg.eigh(M)
        u = vecs[..., -1]  # principal
        w = jnp.einsum(
            "...dc,...c->...d",
            jnp.conj(jnp.swapaxes(Linv, -1, -2)),
            u,
        )
        if w.shape[1] == 1:
            w = jnp.broadcast_to(
                w, (X.shape[0], X.shape[1]) + w.shape[2:]
            )
        Y = jnp.einsum("btfc,btfc->btf", jnp.conj(w), X)[..., None]
        return _from_complex(Y)


def sphere(levels_count=4):
    """Quasi-uniform unit-sphere sampling (icosphere subdivision approx).

    Returns (N, 3) numpy points.  Used as DOA candidate grid.
    """
    # Fibonacci sphere — simple and uniform enough for DOA scanning.
    n = 20 * (4 ** levels_count) // 4
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    golden = math.pi * (1 + 5 ** 0.5)
    theta = golden * i
    pts = np.stack(
        [
            np.cos(theta) * np.sin(phi),
            np.sin(theta) * np.sin(phi),
            np.cos(phi),
        ],
        axis=1,
    )
    return pts.astype(np.float32)


def doas2taus(doas, mics, fs, c=343.0):
    """Directions of arrival -> per-mic delays in samples."""
    return (fs / c) * np.asarray(doas) @ np.asarray(mics).T


def steering(taus, n_fft):
    """Delays (…, C) -> steering vectors (…, F, C, 2)."""
    F = n_fft // 2 + 1
    omega = 2 * math.pi * jnp.arange(F) / n_fft
    A = jnp.exp(
        -1j * omega[..., :, None] * jnp.asarray(taus)[..., None, :]
    )
    return _from_complex(A)


class SrpPhat:
    """Steered-response-power PHAT DOA estimation over a candidate grid."""

    def __init__(self, mics, sample_rate=16000, speed_sound=343.0, eps=1e-20):
        self.mics = np.asarray(mics)
        self.fs = sample_rate
        self.c = speed_sound
        self.eps = eps
        self.doas = sphere(3)
        self.taus = doas2taus(self.doas, self.mics, self.fs, self.c)

    def __call__(self, XXs):
        XX = _to_complex(jnp.asarray(XXs))  # (B, T', F, C, C)
        B, T, F, C, _ = XX.shape
        n_fft = 2 * (F - 1)
        phat = XX / jnp.maximum(jnp.abs(XX), self.eps)
        omega = 2 * math.pi * jnp.arange(F) / n_fft
        # energy for each candidate q: sum_f sum_cd phat * e^{j w (tau_c - tau_d)}
        taus = jnp.asarray(self.taus)  # (Q, C)
        dt = taus[:, None, :] - taus[:, :, None]  # (Q, C, C)
        steer = jnp.exp(
            1j * omega[None, :, None, None] * dt[:, None, :, :]
        )  # (Q, F, C, C)
        power = jnp.einsum(
            "btfcd,qfcd->btq", phat, jnp.conj(steer)
        ).real
        best = jnp.argmax(power, axis=-1)  # (B, T)
        return jnp.asarray(self.doas)[best]


class Music:
    """MUSIC DOA estimation from spatial covariance."""

    def __init__(self, mics, sample_rate=16000, speed_sound=343.0, n_sig=1):
        self.mics = np.asarray(mics)
        self.fs = sample_rate
        self.c = speed_sound
        self.n_sig = n_sig
        self.doas = sphere(3)
        self.taus = doas2taus(self.doas, self.mics, self.fs, self.c)

    def __call__(self, XXs):
        XX = _to_complex(jnp.asarray(XXs))  # (B, T', F, C, C)
        B, T, F, C, _ = XX.shape
        n_fft = 2 * (F - 1)
        XXh = 0.5 * (XX + jnp.conj(jnp.swapaxes(XX, -1, -2)))
        vals, vecs = jnp.linalg.eigh(XXh)
        # Noise subspace: all but n_sig largest.
        En = vecs[..., : C - self.n_sig]  # (B, T, F, C, C-n_sig)
        omega = 2 * math.pi * jnp.arange(F) / n_fft
        taus = jnp.asarray(self.taus)  # (Q, C)
        steer = jnp.exp(
            -1j * omega[None, :, None] * taus[:, None, :]
        )  # (Q, F, C)
        # P(q) = 1 / sum_f ||En^H a||^2
        proj = jnp.einsum(
            "btfcn,qfc->btqfn", jnp.conj(En), steer
        )
        denom = (jnp.abs(proj) ** 2).sum(axis=(-1, -2))  # (B, T, Q)
        power = 1.0 / jnp.maximum(denom, 1e-10)
        best = jnp.argmax(power, axis=-1)
        return jnp.asarray(self.doas)[best]


def tdoas2taus(tdoas):
    """Select the per-channel delays from a TDOA tensor:
    (..., n_mics + n_pairs) → (..., n_mics) (reference
    ``processing/multi_mic.py:1272``).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> tdoas2taus(jnp.zeros((2, 5, 6))).shape
    (2, 5, 3)
    """
    n_pairs = tdoas.shape[-1]
    n_channels = int(((1 + 8 * n_pairs) ** 0.5 - 1) / 2)
    return tdoas[..., :n_channels]
