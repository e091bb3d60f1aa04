"""Activation functions.

Parity target: reference ``nnet/activations.py`` (Softmax, GumbelSoftmax,
Swish).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["Softmax", "GumbelSoftmax", "Swish", "swish"]


def swish(x, beta=1.0):
    """x * sigmoid(beta x) (a.k.a. SiLU for beta=1)."""
    return x * jax.nn.sigmoid(beta * x)


class Swish(nn.Module):
    """Swish activation module (Conformer convention).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> float(Swish()(jnp.array([0.0]))[0])
    0.0
    """

    beta: float = 1.0

    def __call__(self, x):
        return swish(x, self.beta)


class Softmax(nn.Module):
    """Softmax / log-softmax over a configurable axis."""

    apply_log: bool = False
    axis: int = -1

    def __call__(self, x):
        if self.apply_log:
            return jax.nn.log_softmax(x, axis=self.axis)
        return jax.nn.softmax(x, axis=self.axis)


class GumbelSoftmax(nn.Module):
    """Gumbel-softmax sampling with optional straight-through estimator.

    Needs an rng stream named "gumbel" at apply time.
    """

    tau: float = 1.0
    hard: bool = False
    apply_log: bool = False

    @nn.compact
    def __call__(self, x):
        rng = self.make_rng("gumbel")
        gumbels = -jnp.log(
            -jnp.log(jax.random.uniform(rng, x.shape) + 1e-20) + 1e-20
        )
        y_soft = jax.nn.softmax((x + gumbels) / self.tau, axis=-1)
        if self.hard:
            index = y_soft.argmax(-1)
            y_hard = jax.nn.one_hot(index, x.shape[-1], dtype=x.dtype)
            y = y_hard + jax.lax.stop_gradient(y_soft) - y_soft
            # straight-through: forward hard, backward soft
            y = jax.lax.stop_gradient(y_hard - y_soft) + y_soft
        else:
            y = y_soft
        if self.apply_log:
            return jnp.log(y + 1e-20)
        return y
