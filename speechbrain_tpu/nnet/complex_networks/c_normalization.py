"""Complex batch/layer normalization (split whitening).

Parity target: reference ``nnet/complex_networks/c_normalization.py``.
Full complex BN whitens each complex channel with the inverse sqrt of
the 2x2 real/imag covariance (Trabelsi et al.).
"""

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["CBatchNorm", "CLayerNorm"]


def _whiten(xr, xi, eps):
    """Whiten (…, C) real/imag pairs with per-channel 2x2 covariance."""
    axes = tuple(range(xr.ndim - 1))
    mr = xr.mean(axis=axes)
    mi = xi.mean(axis=axes)
    xr_c = xr - mr
    xi_c = xi - mi
    vrr = (xr_c ** 2).mean(axis=axes) + eps
    vii = (xi_c ** 2).mean(axis=axes) + eps
    vri = (xr_c * xi_c).mean(axis=axes)
    # inverse sqrt of [[vrr, vri], [vri, vii]]
    tau = vrr + vii
    delta = vrr * vii - vri ** 2
    s = jnp.sqrt(jnp.maximum(delta, 1e-12))
    t = jnp.sqrt(tau + 2 * s)
    inv_st = 1.0 / jnp.maximum(s * t, 1e-12)
    wrr = (vii + s) * inv_st
    wii = (vrr + s) * inv_st
    wri = -vri * inv_st
    yr = wrr * xr_c + wri * xi_c
    yi = wri * xr_c + wii * xi_c
    return yr, yi


class CBatchNorm(nn.Module):
    """Complex batch norm (whitening over batch+time per channel).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> bn = CBatchNorm()
    >>> x = jax.random.normal(jax.random.PRNGKey(0), (4, 10, 8))
    >>> p = bn.init(jax.random.PRNGKey(1), x, train=True)
    >>> bn.apply(p, x, train=True).shape
    (4, 10, 8)
    """

    eps: float = 1e-4
    affine: bool = True

    @nn.compact
    def __call__(self, x, train=True):
        n = x.shape[-1] // 2
        xr, xi = x[..., :n], x[..., n:]
        yr, yi = _whiten(xr, xi, self.eps)
        if self.affine:
            grr = self.param(
                "gamma_rr",
                lambda k, s: jnp.full(s, 1.0 / jnp.sqrt(2.0)), (n,)
            )
            gii = self.param(
                "gamma_ii",
                lambda k, s: jnp.full(s, 1.0 / jnp.sqrt(2.0)), (n,)
            )
            gri = self.param("gamma_ri", nn.initializers.zeros, (n,))
            br = self.param("beta_r", nn.initializers.zeros, (n,))
            bi = self.param("beta_i", nn.initializers.zeros, (n,))
            zr = grr * yr + gri * yi + br
            zi = gri * yr + gii * yi + bi
            yr, yi = zr, zi
        return jnp.concatenate([yr, yi], axis=-1)


class CLayerNorm(CBatchNorm):
    """Same whitening applied per example (layer-norm style)."""

    @nn.compact
    def __call__(self, x, train=True):
        n = x.shape[-1] // 2
        xr, xi = x[..., :n], x[..., n:]
        # whiten per example: fold batch into channels via vmap-like trick
        import jax

        yr, yi = jax.vmap(lambda a, b: _whiten(a, b, self.eps))(xr, xi)
        return jnp.concatenate([yr, yi], axis=-1)


def c_norm(x, eps=1e-5):
    """Whitening-based complex normalization of split real/imag input
    (reference ``nnet/complex_networks/c_normalization.py:c_norm``).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> c_norm(jnp.ones((2, 4, 8))).shape
    (2, 4, 8)
    """
    C = x.shape[-1] // 2
    xr, xi = x[..., :C], x[..., C:]
    xr, xi = _whiten(xr, xi, eps)
    return jnp.concatenate([xr, xi], axis=-1)


def c_standardization(x, eps=1e-5):
    """Alias of :func:`c_norm` (reference name)."""
    return c_norm(x, eps)
