"""Linear transformation (lazy input-size inference via linen).

Parity target: reference ``nnet/linear.py`` (Linear with optional
combine_dims).  Data layout is channels-last (batch, time, channels) —
the TPU lane dimension is the feature axis.
"""

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["Linear"]


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
