"""Matrix decomposition helpers for beamforming (GEVD, SVD-lifted).

Parity target: reference ``processing/decomposition.py:16`` (gevd),
svdl.  jnp implementations over the framework's (…, C, C, 2) real-imag
covariance layout.
"""

import jax.numpy as jnp

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
