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


def check_complex_input(input_shape):
    """Validate that the channel axis is even (real+imag halves)
    (reference ``nnet/complex_networks/c_ops.py``).

    Example
    -------
    >>> check_complex_input((2, 10, 8))
    """
    if input_shape[-1] % 2 != 0:
        raise ValueError(
            "Complex tensors must have an even channel dimension, got "
            f"{input_shape[-1]}"
        )


def get_conjugate(x, input_type="linear"):
    """Complex conjugate in split real/imag layout (reference
    ``nnet/complex_networks/c_ops.py``).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> get_conjugate(jnp.array([[1., 2., 3., 4.]])).tolist()
    [[1.0, 2.0, -3.0, -4.0]]
    """
    real = get_real(x, input_type)
    imag = get_imag(x, input_type)
    return jnp.concatenate([real, -imag], axis=-1)


def complex_conv_op(x, real_kernel, imag_kernel, bias=None, stride=1,
                    dilation=1, padding="same"):
    """Complex 1-d convolution over split real/imag channels
    (reference ``nnet/complex_networks/c_ops.py``): applies the
    complex product [[K_r, -K_i], [K_i, K_r]] as one grouped real
    convolution.

    x: (B, T, 2*C_in); kernels: (K, C_in, C_out).
    """
    import jax

    xr = get_real(x)
    xi = get_imag(x)

    def conv(sig, ker):
        return jax.lax.conv_general_dilated(
            sig, ker,
            window_strides=(stride,),
            padding=padding.upper() if padding != "causal" else "SAME",
            rhs_dilation=(dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )

    yr = conv(xr, real_kernel) - conv(xi, imag_kernel)
    yi = conv(xr, imag_kernel) + conv(xi, real_kernel)
    y = jnp.concatenate([yr, yi], axis=-1)
    if bias is not None:
        y = y + bias
    return y


def affect_init(real_weight, imag_weight, init_func, key, criterion="glorot"):
    """Reference-compat initializer application: returns freshly
    initialized (real, imag) weights of the same shapes (pure JAX —
    no in-place mutation) (reference
    ``nnet/complex_networks/c_ops.py:affect_init``)."""
    r, i = init_func(
        key, real_weight.shape[0], real_weight.shape[1], criterion
    )
    return r, i


def affect_conv_init(
    real_kernel, imag_kernel, kernel_size, init_func, key, criterion="glorot"
):
    """Conv analogue of :func:`affect_init` (reference
    ``nnet/complex_networks/c_ops.py:affect_conv_init``)."""
    fan_in = int(np.prod(real_kernel.shape[:-1]))
    fan_out = real_kernel.shape[-1]
    r, i = init_func(key, fan_in, fan_out, criterion)
    return (
        r.reshape(real_kernel.shape),
        i.reshape(imag_kernel.shape),
    )


def multi_mean(x, axes, keepdim=False):
    """Mean over several axes (reference
    ``nnet/complex_networks/c_ops.py:multi_mean``).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> multi_mean(jnp.ones((2, 3, 4)), (0, 1)).shape
    (4,)
    """
    return jnp.mean(x, axis=tuple(axes), keepdims=keepdim)
