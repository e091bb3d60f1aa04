"""Module containers: Sequential with argument-aware forwarding.

The reference's Sequential infers layer shapes at construction
(``nnet/containers.py:18``); in linen, laziness comes from init-time
shape inference, so the containers focus on the other reference
behaviour: forwarding ``lengths``/``train`` only to layers that accept
them (LengthsCapableSequential, ``containers.py:151``).
"""

import inspect

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["Sequential", "LengthsCapableSequential", "ConnectBlocks"]


def _call_layer(layer, x, lengths, train):
    """Call a layer with whichever of (lengths, train) it accepts."""
    fn = layer.__call__ if not inspect.isfunction(layer) else layer
    try:
        sig = inspect.signature(fn)
        params = sig.parameters
    except (TypeError, ValueError):
        return layer(x)
    kwargs = {}
    if "lengths" in params and lengths is not None:
        kwargs["lengths"] = lengths
    if "train" in params:
        kwargs["train"] = train
    return layer(x, **kwargs)


class Sequential(nn.Module):
    """Apply layers in order; dicts of layers keep insertion order.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> from speechbrain_tpu.nnet.linear import Linear
    >>> model = Sequential(layers=(Linear(n_neurons=8), Linear(n_neurons=4)))
    >>> x = jnp.ones((2, 10, 16))
    >>> p = model.init(jax.random.PRNGKey(0), x)
    >>> model.apply(p, x).shape
    (2, 10, 4)
    """

    layers: tuple

    @nn.compact
    def __call__(self, x, lengths=None, train=True):
        for layer in self.layers:
            x = _call_layer(layer, x, lengths, train)
        return x


class LengthsCapableSequential(Sequential):
    """Alias emphasising lengths forwarding (same behaviour)."""


class ConnectBlocks(nn.Module):
    """Wire a sequence of blocks with skip/residual/dense connections.

    shortcut_type: "residual" (x = f(x) + proj(x_prev)),
    "dense" (input is concat of all previous outputs),
    "skip" (outputs concat at the end).
    """

    layers: tuple
    shortcut_type: str = "residual"
    shortcut_projection: bool = False

    @nn.compact
    def __call__(self, x, lengths=None, train=True):
        if self.shortcut_type not in ("residual", "dense", "skip"):
            raise ValueError(f"Unknown shortcut_type {self.shortcut_type}")
        outputs = []
        current = x
        for i, layer in enumerate(self.layers):
            y = _call_layer(layer, current, lengths, train)
            if self.shortcut_type == "residual":
                shortcut = current
                if shortcut.shape[-1] != y.shape[-1] or self.shortcut_projection:
                    shortcut = nn.Dense(y.shape[-1], dtype=y.dtype)(shortcut)
                current = y + shortcut
            elif self.shortcut_type == "dense":
                outputs.append(y)
                current = jnp.concatenate(outputs, axis=-1)
            else:  # skip
                outputs.append(y)
                current = y
        if self.shortcut_type == "skip":
            return jnp.concatenate(outputs, axis=-1)
        return current


class ModuleList(nn.Module):
    """Sequentially apply a tuple of modules (reference
    ``nnet/containers.py`` ModuleList: a thin wrapper used to replace
    a Sequential while keeping parameter-name structure).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> from speechbrain_tpu.nnet.linear import Linear
    >>> ml = ModuleList(layers=(Linear(n_neurons=4), Linear(n_neurons=2)))
    >>> x = jnp.ones((2, 8))
    >>> v = ml.init(jax.random.PRNGKey(0), x)
    >>> ml.apply(v, x).shape
    (2, 2)
    """

    layers: tuple

    @nn.compact
    def __call__(self, x, lengths=None, train=True):
        for layer in self.layers:
            x = _call_layer(layer, x, lengths, train)
            if isinstance(x, tuple):
                x = x[0]
        return x

    def append(self, module):
        """Immutable flax modules can't append; raise with guidance."""
        raise TypeError(
            "ModuleList is immutable once constructed; build it with "
            "the full tuple of layers instead."
        )
