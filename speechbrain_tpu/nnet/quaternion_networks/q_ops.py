"""Quaternion tensor ops on [r | i | j | k] split channels.

Parity target: reference ``nnet/quaternion_networks/q_ops.py`` (which
implements a custom autograd for memory; JAX autodiff of the Hamilton
product is already memory-reasonable, so the op is plain jnp).
"""

import jax.numpy as jnp
import numpy as np

__all__ = ["quaternion_linear_op", "quaternion_init", "get_component"]


def get_component(x, idx):
    """Component idx (0=r,1=i,2=j,3=k) of the split channel axis."""
    n = x.shape[-1] // 4
    return x[..., idx * n : (idx + 1) * n]


def quaternion_linear_op(x, r_w, i_w, j_w, k_w, bias=None):
    """Hamilton-product linear map.

    x: (..., 4*in); weights (in, out).  Implements x ⊗ W with
    W = r + i·i + j·j + k·k.
    """
    xr, xi, xj, xk = (get_component(x, n) for n in range(4))
    yr = xr @ r_w - xi @ i_w - xj @ j_w - xk @ k_w
    yi = xr @ i_w + xi @ r_w + xj @ k_w - xk @ j_w
    yj = xr @ j_w - xi @ k_w + xj @ r_w + xk @ i_w
    yk = xr @ k_w + xi @ j_w - xj @ i_w + xk @ r_w
    out = jnp.concatenate([yr, yi, yj, yk], axis=-1)
    if bias is not None:
        out = out + bias
    return out


def quaternion_init(key, in_features, out_features, criterion="glorot"):
    """Polar-form quaternion init (Parcollet et al.), traceable."""
    import jax

    if criterion == "glorot":
        s = 1.0 / np.sqrt(2 * (in_features + out_features))
    else:
        s = 1.0 / np.sqrt(2 * in_features)
    k1, k2, k3 = jax.random.split(key, 3)
    u = jax.random.uniform(
        k1, (in_features, out_features), minval=1e-7, maxval=1.0
    )
    modulus = s * jnp.sqrt(-2.0 * jnp.log(u))
    angle = jax.random.uniform(
        k2, (in_features, out_features), minval=-np.pi, maxval=np.pi
    )
    v = jax.random.normal(k3, (3, in_features, out_features))
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=0), 1e-8)
    r = modulus * jnp.cos(angle)
    i = modulus * v[0] * jnp.sin(angle)
    j = modulus * v[1] * jnp.sin(angle)
    k = modulus * v[2] * jnp.sin(angle)
    return tuple(w.astype(jnp.float32) for w in (r, i, j, k))
