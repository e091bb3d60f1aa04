"""Transducer joint network (sum / concat joiners).

Parity target: reference ``nnet/transducer/transducer_joint.py:14``.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["Transducer_joint"]


class Transducer_joint(nn.Module):
    """Join encoder frames and prediction-net states over the lattice.

    joint="sum": broadcast add (dims must match);
    joint="concat": concatenate + Dense(joint_dim).

    Inputs: enc (B, T, H1), pred (B, U, H2) ->
    output (B, T, U, H) with nonlinearity applied.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> joiner = Transducer_joint(joint="concat", joint_dim=8)
    >>> enc = jnp.ones((2, 5, 4))
    >>> pred = jnp.ones((2, 3, 6))
    >>> v = joiner.init(jax.random.PRNGKey(0), enc, pred)
    >>> joiner.apply(v, enc, pred).shape
    (2, 5, 3, 8)
    """

    joint: str = "sum"
    joint_dim: int = 512
    nonlinearity: str = "tanh"

    @nn.compact
    def __call__(self, input_TN, input_PN):
        act = {
            "tanh": jnp.tanh,
            "relu": jax.nn.relu,
            "leaky_relu": jax.nn.leaky_relu,
        }[self.nonlinearity]
        if input_TN.ndim == 3 and input_PN.ndim == 3:
            enc = input_TN[:, :, None, :]
            pred = input_PN[:, None, :, :]
        else:
            enc, pred = input_TN, input_PN
        if self.joint == "sum":
            if enc.shape[-1] != pred.shape[-1]:
                raise ValueError(
                    "sum joiner needs matching feature dims"
                )
            return act(enc + pred)
        if self.joint == "concat":
            T, U = enc.shape[1], pred.shape[2]
            joined = jnp.concatenate(
                [
                    jnp.broadcast_to(
                        enc, enc.shape[:2] + (U,) + enc.shape[3:]
                    ),
                    jnp.broadcast_to(
                        pred, (pred.shape[0], T) + pred.shape[2:]
                    ),
                ],
                axis=-1,
            )
            return act(
                nn.Dense(self.joint_dim, dtype=joined.dtype)(joined)
            )
        raise ValueError(f"Unknown joint {self.joint}")
