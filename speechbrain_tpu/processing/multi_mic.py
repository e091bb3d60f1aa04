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
    """(…, 2, C) or (…, 2) real-imag -> complex, moving the re/im axis
    last internally."""
    return xs[..., 0] + 1j * xs[..., 1]


def _from_complex(z):
    return jnp.stack([z.real, z.imag], axis=-1)


def _n_mics_from_pairs(n_pairs):
    return int(((1 + 8 * n_pairs) ** 0.5 - 1) / 2)


def _triu_pairs(n_mics):
    rows, cols = np.triu_indices(n_mics)
    return rows, cols


def _triu_to_full(XXs):
    """(B, T, F, 2, P) reference triu layout -> complex (B, T, F, C, C)
    hermitian covariance."""
    XXs = jnp.asarray(XXs)
    P = XXs.shape[-1]
    C = _n_mics_from_pairs(P)
    Z = XXs[..., 0, :] + 1j * XXs[..., 1, :]  # (B, T, F, P)
    rows, cols = _triu_pairs(C)
    full = jnp.zeros(Z.shape[:-1] + (C, C), Z.dtype)
    full = full.at[..., rows, cols].set(Z)
    lower = jnp.conj(jnp.swapaxes(full, -1, -2))
    diag_mask = jnp.eye(C, dtype=bool)
    return jnp.where(diag_mask, full, full + lower)


class Covariance:
    """Spatial covariance in the reference's triu-vectorized layout:
    (B, T, F, 2, n_mics + n_pairs), pair order = ``np.triu_indices``
    (reference ``processing/multi_mic.py:85``).  ``average=True`` means
    the covariance is averaged over time and repeated back to T frames.

    Example
    -------
    >>> import numpy as np
    >>> xs = np.ones((1, 10, 33, 2, 4), np.float32)
    >>> Covariance(average=True)(xs).shape
    (1, 10, 33, 2, 10)
    """

    def __init__(self, average=True):
        self.average = average

    def __call__(self, Xs):
        Xs = jnp.asarray(Xs)  # (B, T, F, 2, C)
        X = Xs[..., 0, :] + 1j * Xs[..., 1, :]  # (B, T, F, C)
        C = X.shape[-1]
        rows, cols = _triu_pairs(C)
        # reference algebra (multi_mic.py:173-180): Rxx_re = ReReT+ImImT,
        # Rxx_im = ReImT-ImReT, i.e. entry (c,d) = conj(X_c) * X_d
        XX = jnp.conj(X[..., rows]) * X[..., cols]  # (B, T, F, P)
        XXs = jnp.stack([XX.real, XX.imag], axis=-2)  # (B, T, F, 2, P)
        if self.average:
            T = XXs.shape[1]
            XXs = jnp.broadcast_to(
                XXs.mean(axis=1, keepdims=True), XXs.shape[:1] + (T,) + XXs.shape[2:]
            )
        return XXs


class GccPhat:
    """GCC-PHAT time-difference-of-arrival estimation (reference
    ``processing/multi_mic.py:643``).

    Input: covariance (B, T, F, 2, n_mics+n_pairs); output TDOAs in
    samples, (B, T, n_mics+n_pairs), quadratically interpolated.
    """

    def __init__(self, tdoa_max=None, eps=1e-20):
        self.tdoa_max = tdoa_max
        self.eps = eps

    def __call__(self, XXs):
        XXs = jnp.asarray(XXs)  # (B, T, F, 2, P)
        n_fft = (XXs.shape[2] - 1) * 2
        Z = XXs[..., 0, :] + 1j * XXs[..., 1, :]  # (B, T, F, P)
        phat = Z / (jnp.abs(Z) + self.eps)
        xxs = jnp.fft.irfft(
            jnp.moveaxis(phat, 2, -1), n=n_fft, axis=-1
        )  # (B, T, P, n_fft)
        xxs = jnp.moveaxis(xxs, -1, 2)  # (B, T, n_fft, P)
        tdoa_max = self.tdoa_max or n_fft // 2
        # reference slicing: [0:tdoa_max] and [-tdoa_max:]
        sl1 = xxs[..., 0:tdoa_max, :]
        sl2 = xxs[..., -tdoa_max:, :]
        sliced = jnp.concatenate([sl1, sl2], axis=2)
        delays = jnp.argmax(sliced, axis=2)  # (B, T, P)
        offset = n_fft - sliced.shape[2]
        wrapped = delays >= sl1.shape[2]
        delays = jnp.where(wrapped, delays + offset - n_fft, delays)
        # quadratic interpolation with circular neighbor gather
        def grab(d):
            idx = jnp.mod(d + n_fft, n_fft)[..., None, :]
            return jnp.take_along_axis(xxs, idx, axis=2)[..., 0, :]

        y1 = grab(delays - 1)
        y2 = grab(delays)
        y3 = grab(delays + 1)
        return delays + (y1 - y3) / (2 * y1 - 4 * y2 + 2 * y3)


class DelaySum:
    """Delay-and-sum beamforming (reference ``multi_mic.py:198``):
    steering from TDOAs (or DOAs with ``doa_mode=True``), output
    (B, T, F, 2, 1)."""

    def __call__(
        self, Xs, localization_tensor, doa_mode=False, mics=None,
        fs=None, c=343.0,
    ):
        Xs = jnp.asarray(Xs)  # (B, T, F, 2, C)
        n_fft = Xs.shape[2]
        if doa_mode:
            taus = doas2taus(localization_tensor, mics=mics, fs=fs, c=c)
        else:
            taus = tdoas2taus(jnp.asarray(localization_tensor))
        As = steering(jnp.asarray(taus), n_fft)  # (..., F, 2, C)
        n_mics = Xs.shape[-1]
        Ws_re = As[..., 0, :] / n_mics
        Ws_im = -As[..., 1, :] / n_mics
        Xs_re = Xs[..., 0, :]
        Xs_im = Xs[..., 1, :]
        Ys_re = (Ws_re * Xs_re - Ws_im * Xs_im).sum(axis=3, keepdims=True)
        Ys_im = (Ws_re * Xs_im + Ws_im * Xs_re).sum(axis=3, keepdims=True)
        return jnp.stack([Ys_re, Ys_im], axis=3)


class Mvdr:
    """Minimum-variance distortionless-response beamforming.

    Weights w = (Phi_nn^-1 d) / (d^H Phi_nn^-1 d).
    """

    def __init__(self, eps=1e-6):
        self.eps = eps

    def __call__(self, Xs, NNs, tdoas):
        Xs = jnp.asarray(Xs)  # (B, T, F, 2, C)
        X = Xs[..., 0, :] + 1j * Xs[..., 1, :]  # (B, T, F, C)
        NN = _triu_to_full(jnp.asarray(NNs))  # (B, T, F, C, C)
        B, T, F, C = X.shape
        n_fft = F
        taus = tdoas2taus(jnp.asarray(tdoas))  # (B, T', C)
        As = steering(taus, n_fft)  # (B, T', F, 2, C)
        d = As[..., 0, :] + 1j * As[..., 1, :]  # (B, T', F, C)
        NN_reg = NN + self.eps * jnp.eye(C)[None, None, None]
        NN_inv = jnp.linalg.inv(NN_reg)  # (B, T', F, C, C)
        Nd = jnp.einsum("btfcd,btfd->btfc", NN_inv, d)
        denom = jnp.einsum("btfc,btfc->btf", jnp.conj(d), Nd)
        w = Nd / (denom[..., None] + self.eps)
        if w.shape[1] == 1:
            w = jnp.broadcast_to(w, (B, T, F, C))
        Y = jnp.einsum("btfc,btfc->btf", jnp.conj(w), X)
        return jnp.stack([Y.real, Y.imag], axis=-1)[..., None, :].swapaxes(-1, -2)


class Gev:
    """Generalized eigenvalue (max-SNR) beamforming.

    w = principal generalized eigenvector of (Phi_ss, Phi_nn).
    """

    def __init__(self, eps=1e-6):
        self.eps = eps

    def __call__(self, Xs, SSs, NNs):
        Xs = jnp.asarray(Xs)  # (B, T, F, 2, C)
        X = Xs[..., 0, :] + 1j * Xs[..., 1, :]
        SS = _triu_to_full(jnp.asarray(SSs))
        NN = _triu_to_full(jnp.asarray(NNs))
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
        Y = jnp.einsum("btfc,btfc->btf", jnp.conj(w), X)
        return jnp.stack([Y.real, Y.imag], axis=-1)[..., None, :].swapaxes(-1, -2)


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
    """Delays (…, C) -> steering vectors (…, n_fft, 2, C), reference
    layout (``multi_mic.py:1317``): a = e^{-j w tau} with ``n_fft``
    already the number of rfft bins and frame_size = (n_fft-1)*2."""
    frame_size = int((n_fft - 1) * 2)
    omega = 2 * math.pi * jnp.arange(n_fft) / frame_size
    A = jnp.exp(-1j * omega[:, None] * jnp.asarray(taus)[..., None, :])
    return jnp.stack([A.real, A.imag], axis=-2)  # (..., F, 2, C)


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
        XX = _triu_to_full(jnp.asarray(XXs))  # (B, T, F, C, C)
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
        XX = _triu_to_full(jnp.asarray(XXs))  # (B, T, F, C, C)
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
