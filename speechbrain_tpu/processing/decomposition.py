"""Matrix decomposition helpers for beamforming (GEVD, SVD-lifted).

Parity target: reference ``processing/decomposition.py:16`` (gevd),
svdl.  jnp implementations over the framework's (…, C, C, 2) real-imag
covariance layout.
"""

import jax.numpy as jnp
import numpy as np

__all__ = ["gevd", "svdl", "pos_def", "inv"]


def _to_c(x):
    return x[..., 0] + 1j * x[..., 1]


def _from_c(z):
    return jnp.stack([z.real, z.imag], axis=-1)


def pos_def(ws, alpha=0.001, eps=1e-20):
    """Diagonal-load a covariance to ensure positive definiteness."""
    W = _to_c(jnp.asarray(ws))
    C = W.shape[-1]
    trace = jnp.trace(W, axis1=-2, axis2=-1).real[..., None, None]
    return _from_c(W + (alpha * trace / C + eps) * jnp.eye(C))


def inv(x):
    """Inverse of a (…, C, C, 2) complex matrix stack."""
    return _from_c(jnp.linalg.inv(_to_c(jnp.asarray(x))))


def gevd(a, b=None):
    """Generalized eigendecomposition of (a, b) hermitian pairs.

    Returns (eigenvectors, eigenvalues-as-diagonal), both (…, C, C, 2),
    ascending eigenvalue order (numpy.eigh convention).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> eye = jnp.stack([jnp.eye(3), jnp.zeros((3, 3))], axis=-1)
    >>> V, D = gevd(eye)
    >>> V.shape
    (3, 3, 2)
    """
    A = _to_c(jnp.asarray(a))
    if b is None:
        vals, vecs = jnp.linalg.eigh(A)
        D = jnp.zeros_like(A).at[
            ..., jnp.arange(A.shape[-1]), jnp.arange(A.shape[-1])
        ].set(vals.astype(A.dtype))
        return _from_c(vecs), _from_c(D)
    B = _to_c(jnp.asarray(b))
    L = jnp.linalg.cholesky(B)
    Linv = jnp.linalg.inv(L)
    M = Linv @ A @ jnp.conj(jnp.swapaxes(Linv, -1, -2))
    M = 0.5 * (M + jnp.conj(jnp.swapaxes(M, -1, -2)))
    vals, vecs = jnp.linalg.eigh(M)
    V = jnp.conj(jnp.swapaxes(Linv, -1, -2)) @ vecs
    D = jnp.zeros_like(A).at[
        ..., jnp.arange(A.shape[-1]), jnp.arange(A.shape[-1])
    ].set(vals.astype(A.dtype))
    return _from_c(V), _from_c(D)


def svdl(a):
    """SVD of the left channel pair representation (…, C, C, 2)."""
    A = _to_c(jnp.asarray(a))
    U, S, Vh = jnp.linalg.svd(A)
    D = jnp.zeros_like(A).at[
        ..., jnp.arange(A.shape[-1]), jnp.arange(A.shape[-1])
    ].set(S.astype(A.dtype))
    return _from_c(U), _from_c(D), _from_c(Vh)


def f(ws):
    """Transform 1: complex Hermitian matrix given by its upper
    triangle (*, 2, P) → block-matrix form (*, 2C, 2C) (reference
    ``processing/decomposition.py:190``-family)."""
    P = ws.shape[-1]
    C = int(round(((1 + 8 * P) ** 0.5 - 1) / 2))
    iu = np.triu_indices(C)
    full_r = np.zeros(ws.shape[:-2] + (C, C), dtype=np.float64)
    # build full complex matrix then block-expand
    wr = np.asarray(ws[..., 0, :])
    wi = np.asarray(ws[..., 1, :])
    out_r = np.zeros(ws.shape[:-2] + (C, C))
    out_i = np.zeros(ws.shape[:-2] + (C, C))
    out_r[..., iu[0], iu[1]] = wr
    out_r[..., iu[1], iu[0]] = wr
    out_i[..., iu[0], iu[1]] = -wi
    out_i[..., iu[1], iu[0]] = wi
    del full_r
    return g(np.stack([out_r, out_i], axis=-1))


def finv(wsh):
    """Inverse transform 1: block Hermitian (*, 2C, 2C) → upper-
    triangle representation (*, 2, P) (reference
    ``processing/decomposition.py:223``).

    Example
    -------
    >>> import numpy as np
    >>> wsh = np.eye(4)[None]
    >>> finv(wsh).shape
    (1, 2, 3)
    """
    wsh = np.asarray(wsh)
    C = wsh.shape[-1] // 2
    iu = np.triu_indices(C)
    ws_r = wsh[..., iu[0] * 2, iu[1] * 2]
    ws_i = -wsh[..., iu[0] * 2, iu[1] * 2 + 1]
    return np.stack([ws_r, ws_i], axis=-2)


def g(ws):
    """Transform 2: full complex matrix (*, C, C, 2) → block matrix
    (*, 2C, 2C) (reference ``processing/decomposition.py:254``).

    Example
    -------
    >>> import numpy as np
    >>> ws = np.zeros((1, 2, 2, 2)); ws[..., 0] = np.eye(2)
    >>> g(ws).shape
    (1, 4, 4)
    """
    ws = np.asarray(ws)
    C = ws.shape[-2]
    out = np.zeros(ws.shape[:-3] + (2 * C, 2 * C), dtype=ws.dtype)
    out[..., 0::2, 0::2] = ws[..., 0]
    out[..., 1::2, 1::2] = ws[..., 0]
    out[..., 0::2, 1::2] = -ws[..., 1]
    out[..., 1::2, 0::2] = ws[..., 1]
    return out


def ginv(wsh):
    """Inverse transform 2: block matrix (*, 2C, 2C) → full complex
    (*, C, C, 2) (reference ``processing/decomposition.py:286``).

    Example
    -------
    >>> import numpy as np
    >>> ginv(np.eye(4)[None]).shape
    (1, 2, 2, 2)
    """
    wsh = np.asarray(wsh)
    C = wsh.shape[-1] // 2
    ws_r = wsh[..., 0::2, 0::2]
    ws_i = wsh[..., 1::2, 0::2]
    return np.stack([ws_r, ws_i], axis=-1)
