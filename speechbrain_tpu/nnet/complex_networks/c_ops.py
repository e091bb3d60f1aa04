"""Complex-valued tensor ops on [real | imag] split channels.

Parity target: reference ``nnet/complex_networks/c_ops.py``.
A complex feature vector of dim N is stored as a real vector of dim 2N:
first half real parts, second half imaginary parts.
"""

import jax.numpy as jnp
import numpy as np

__all__ = [
    "get_real",
    "get_imag",
    "complex_linear_op",
    "complex_init",
    "unitary_init",
]


def get_real(x, input_type="linear"):
    """First half of the channel axis."""
    n = x.shape[-1] // 2
    return x[..., :n]


def get_imag(x, input_type="linear"):
    """Second half of the channel axis."""
    n = x.shape[-1] // 2
    return x[..., n:]


def complex_linear_op(x, real_weight, imag_weight, bias=None):
    """Complex matmul on split representation.

    x: (..., 2*in); weights: (in, out).  Returns (..., 2*out) with
    (xr + i xi)(Wr + i Wi) = (xr Wr - xi Wi) + i(xr Wi + xi Wr).
    """
    xr, xi = get_real(x), get_imag(x)
    yr = xr @ real_weight - xi @ imag_weight
    yi = xr @ imag_weight + xi @ real_weight
    out = jnp.concatenate([yr, yi], axis=-1)
    if bias is not None:
        out = out + bias
    return out


def unitary_init(key, in_features, out_features, criterion="glorot"):
    """Unitary-ish initialization of (real, imag) weight pair (traceable)."""
    import jax

    k1, k2 = jax.random.split(key)
    M = jax.random.normal(
        k1, (in_features, out_features)
    ) + 1j * jax.random.normal(k2, (in_features, out_features))
    U, _, Vh = jnp.linalg.svd(M, full_matrices=False)
    W = U @ Vh
    return W.real.astype(jnp.float32), W.imag.astype(jnp.float32)


def complex_init(key, in_features, out_features, criterion="glorot"):
    """Rayleigh-modulus complex init (Trabelsi et al.), traceable."""
    import jax

    if criterion == "glorot":
        s = 1.0 / np.sqrt(in_features + out_features)
    else:
        s = 1.0 / np.sqrt(in_features)
    k1, k2 = jax.random.split(key)
    # Rayleigh via inverse-cdf of uniform
    u = jax.random.uniform(
        k1, (in_features, out_features), minval=1e-7, maxval=1.0
    )
    modulus = s * jnp.sqrt(-2.0 * jnp.log(u))
    phase = jax.random.uniform(
        k2, (in_features, out_features), minval=-np.pi, maxval=np.pi
    )
    return (
        (modulus * jnp.cos(phase)).astype(jnp.float32),
        (modulus * jnp.sin(phase)).astype(jnp.float32),
    )
