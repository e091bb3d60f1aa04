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


def check_quaternion_input(input_shape):
    """Validate the channel axis is divisible by 4 (r, i, j, k parts)
    (reference ``nnet/quaternion_networks/q_ops.py``).

    Example
    -------
    >>> check_quaternion_input((2, 10, 8))
    """
    if input_shape[-1] % 4 != 0:
        raise ValueError(
            "Quaternion tensors need a channel dim divisible by 4, got "
            f"{input_shape[-1]}"
        )


def quaternion_conv_op(x, r_w, i_w, j_w, k_w, bias=None, stride=1,
                       dilation=1, padding="same"):
    """Quaternion 1-d convolution via the Hamilton product matrix as
    four grouped real convolutions (reference
    ``nnet/quaternion_networks/q_ops.py:quaternion_conv_op``).

    x: (B, T, 4*C_in); kernels: (K, C_in, C_out).
    """
    import jax

    C = x.shape[-1] // 4
    r, i, j, k = (x[..., n * C : (n + 1) * C] for n in range(4))

    def conv(sig, ker):
        return jax.lax.conv_general_dilated(
            sig, ker,
            window_strides=(stride,),
            padding=padding.upper() if padding != "causal" else "SAME",
            rhs_dilation=(dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )

    yr = conv(r, r_w) - conv(i, i_w) - conv(j, j_w) - conv(k, k_w)
    yi = conv(r, i_w) + conv(i, r_w) + conv(j, k_w) - conv(k, j_w)
    yj = conv(r, j_w) - conv(i, k_w) + conv(j, r_w) + conv(k, i_w)
    yk = conv(r, k_w) + conv(i, j_w) - conv(j, i_w) + conv(k, r_w)
    y = jnp.concatenate([yr, yi, yj, yk], axis=-1)
    if bias is not None:
        y = y + bias
    return y


def quaternion_linear_rotation_op(x, r_w, i_w, j_w, k_w, bias=None,
                                  scale=None):
    """Rotation-form quaternion linear op: conjugation q·x·q* with a
    unit-normalized weight quaternion (reference
    ``nnet/quaternion_networks/q_ops.py:quaternion_linear_rotation_op``).

    x: (..., 4*C_in); weights: (C_in, C_out).
    """
    C = x.shape[-1] // 4
    xr, xi, xj, xk = (x[..., n * C : (n + 1) * C] for n in range(4))
    norm = jnp.sqrt(r_w**2 + i_w**2 + j_w**2 + k_w**2) + 1e-10
    rn, in_, jn, kn = r_w / norm, i_w / norm, j_w / norm, k_w / norm
    # Rotation matrix rows from the unit quaternion (applied per
    # input-output channel pair, then summed over input channels).
    def rot(a, b, c):
        return xi @ a + xj @ b + xk @ c

    yi = rot(
        1 - 2 * (jn**2 + kn**2), 2 * (in_ * jn - kn * rn),
        2 * (in_ * kn + jn * rn),
    )
    yj = rot(
        2 * (in_ * jn + kn * rn), 1 - 2 * (in_**2 + kn**2),
        2 * (jn * kn - in_ * rn),
    )
    yk = rot(
        2 * (in_ * kn - jn * rn), 2 * (jn * kn + in_ * rn),
        1 - 2 * (in_**2 + jn**2),
    )
    if scale is not None:
        yi, yj, yk = yi * scale, yj * scale, yk * scale
    # Rotations only affect the vector part; the real output part is
    # the zero kernel (reference q_ops.py:265-269).
    yr = jnp.zeros_like(yi)
    y = jnp.concatenate([yr, yi, yj, yk], axis=-1)
    if bias is not None:
        y = y + bias
    return y


def quaternion_conv_rotation_op(x, r_w, i_w, j_w, k_w, bias=None,
                                scale=None, stride=1, dilation=1,
                                padding="same"):
    """Rotation-form quaternion convolution: normalize the weight
    quaternion and convolve with the induced rotation matrix
    (reference
    ``nnet/quaternion_networks/q_ops.py:quaternion_conv_rotation_op``)."""
    import jax

    C = x.shape[-1] // 4
    xr, xi, xj, xk = (x[..., n * C : (n + 1) * C] for n in range(4))
    norm = jnp.sqrt(r_w**2 + i_w**2 + j_w**2 + k_w**2) + 1e-10
    rn, in_, jn, kn = r_w / norm, i_w / norm, j_w / norm, k_w / norm

    def conv(sig, ker):
        return jax.lax.conv_general_dilated(
            sig, ker,
            window_strides=(stride,),
            padding=padding.upper() if padding != "causal" else "SAME",
            rhs_dilation=(dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )

    yi = (
        conv(xi, 1 - 2 * (jn**2 + kn**2))
        + conv(xj, 2 * (in_ * jn - kn * rn))
        + conv(xk, 2 * (in_ * kn + jn * rn))
    )
    yj = (
        conv(xi, 2 * (in_ * jn + kn * rn))
        + conv(xj, 1 - 2 * (in_**2 + kn**2))
        + conv(xk, 2 * (jn * kn - in_ * rn))
    )
    yk = (
        conv(xi, 2 * (in_ * kn - jn * rn))
        + conv(xj, 2 * (jn * kn + in_ * rn))
        + conv(xk, 1 - 2 * (in_**2 + jn**2))
    )
    if scale is not None:
        yi, yj, yk = yi * scale, yj * scale, yk * scale
    yr = jnp.zeros_like(yi)
    y = jnp.concatenate([yr, yi, yj, yk], axis=-1)
    if bias is not None:
        y = y + bias
    return y


def affect_init(r_w, i_w, j_w, k_w, init_func, key, criterion="glorot"):
    """Fresh quaternion weights of the given shapes (pure-JAX analogue
    of the reference's in-place ``affect_init``)."""
    return init_func(key, r_w.shape[0], r_w.shape[1], criterion)


def affect_conv_init(r_k, i_k, j_k, k_k, kernel_size, init_func, key,
                     criterion="glorot"):
    """Conv analogue of :func:`affect_init`."""
    fan_in = int(np.prod(r_k.shape[:-1]))
    fan_out = r_k.shape[-1]
    ws = init_func(key, fan_in, fan_out, criterion)
    return tuple(w.reshape(r_k.shape) for w in ws)


class QuaternionLinearCustomBackward:
    """Reference-name placeholder: the memory-saving custom backward of
    the torch implementation is unnecessary under XLA (rematerialization
    via ``jax.checkpoint`` covers it); use ``quaternion_linear_op``
    wrapped in ``jax.checkpoint`` for the same memory profile."""

    @staticmethod
    def apply(x, r_w, i_w, j_w, k_w, bias=None):
        """Rematerialized quaternion linear op (memory-saving backward)."""
        import jax

        return jax.checkpoint(
            lambda *a: quaternion_linear_op(*a)
        )(x, r_w, i_w, j_w, k_w, bias)
