"""Linear transformation (lazy input-size inference via linen).

Parity target: reference ``nnet/linear.py`` (Linear with optional
combine_dims).  Data layout is channels-last (batch, time, channels) —
the TPU lane dimension is the feature axis.
"""

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["Linear", "LinearWithConstraint"]


class Linear(nn.Module):
    """y = xW + b over the last axis.

    Arguments
    ---------
    n_neurons : int
        Output feature count.
    bias : bool
    combine_dims : bool
        If input is 4-d (batch, time, ch1, ch2), fold ch1*ch2 first.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lin = Linear(n_neurons=4)
    >>> x = jnp.ones((2, 10, 8))
    >>> params = lin.init(jax.random.PRNGKey(0), x)
    >>> lin.apply(params, x).shape
    (2, 10, 4)
    """

    n_neurons: int
    bias: bool = True
    combine_dims: bool = False

    @nn.compact
    def __call__(self, x):
        if x.ndim == 4 and self.combine_dims:
            x = x.reshape(x.shape[0], x.shape[1], x.shape[2] * x.shape[3])
        return nn.Dense(self.n_neurons, use_bias=self.bias, dtype=x.dtype)(x)


class LinearWithConstraint(nn.Module):
    """Linear layer with a kernel max-norm constraint (reference
    ``nnet/linear.py:79``): the weight is projected onto the L2 ball of
    radius ``max_norm`` (per output) at every application.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lin = LinearWithConstraint(n_neurons=2, max_norm=1.0)
    >>> x = jnp.ones((3, 8))
    >>> p = lin.init(jax.random.PRNGKey(0), x)
    >>> lin.apply(p, x).shape
    (3, 2)
    """

    n_neurons: int
    bias: bool = True
    combine_dims: bool = False
    max_norm: float = 1.0

    @nn.compact
    def __call__(self, x):
        if x.ndim == 4 and self.combine_dims:
            x = x.reshape(x.shape[0], x.shape[1], x.shape[2] * x.shape[3])
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.n_neurons),
        )
        norm = jnp.sqrt(jnp.sum(kernel**2, axis=0, keepdims=True))
        kernel = kernel * jnp.minimum(
            1.0, self.max_norm / jnp.maximum(norm, 1e-12)
        )
        y = x @ kernel.astype(x.dtype)
        if self.bias:
            b = self.param("bias", nn.initializers.zeros, (self.n_neurons,))
            y = y + b.astype(y.dtype)
        return y
