"""Dropout variants.

Parity target: reference ``nnet/dropout.py`` (Dropout2d drops entire
channels).
"""

import flax.linen as nn
import jax

__all__ = ["Dropout", "Dropout2d"]


class Dropout(nn.Module):
    """Standard dropout; needs an rng stream named "dropout"."""

    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train=True):
        return nn.Dropout(rate=self.drop_rate, deterministic=not train)(x)


class Dropout2d(nn.Module):
    """Channel dropout for (batch, time, channels): whole channels drop.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> drop = Dropout2d(drop_rate=0.5)
    >>> x = jnp.ones((2, 5, 8))
    >>> y = drop.apply({}, x, train=True,
    ...                rngs={"dropout": jax.random.PRNGKey(0)})
    >>> y.shape
    (2, 5, 8)
    """

    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train=True):
        if not train or self.drop_rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
        keep = jax.random.bernoulli(rng, 1.0 - self.drop_rate, shape=shape)
        return x * keep / (1.0 - self.drop_rate)
