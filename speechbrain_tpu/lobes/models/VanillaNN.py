"""Simple dense encoder (for enhancement/templates).

Parity target: reference ``lobes/models/VanillaNN.py``.
"""

import flax.linen as nn
import jax

__all__ = ["VanillaNN"]


class VanillaNN(nn.Module):
    """Stack of Dense + activation blocks.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> model = VanillaNN(dnn_blocks=2, dnn_neurons=32)
    >>> x = jnp.ones((2, 10, 16))
    >>> v = model.init(jax.random.PRNGKey(0), x)
    >>> model.apply(v, x).shape
    (2, 10, 32)
    """

    dnn_blocks: int = 2
    dnn_neurons: int = 512
    activation: str = "leaky_relu"

    @nn.compact
    def __call__(self, x, train=True):
        for _ in range(self.dnn_blocks):
            x = nn.Dense(self.dnn_neurons, dtype=x.dtype)(x)
            x = jax.nn.leaky_relu(x)
        return x
