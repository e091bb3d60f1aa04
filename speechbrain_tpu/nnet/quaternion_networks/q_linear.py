"""Quaternion linear layer.

Parity target: reference ``nnet/quaternion_networks/q_linear.py``.
"""

import flax.linen as nn
import jax.numpy as jnp

from speechbrain_tpu.nnet.quaternion_networks.q_ops import (
    quaternion_init,
    quaternion_linear_op,
)

__all__ = ["QLinear"]


class QLinear(nn.Module):
    """Hamilton-product linear layer: (…, 4*in) -> (…, 4*n_neurons).

    Quaternion weight sharing gives 4x parameter reduction vs a real
    layer of equal width.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lin = QLinear(n_neurons=4)
    >>> x = jnp.ones((2, 10, 16))  # 4 quaternion dims
    >>> p = lin.init(jax.random.PRNGKey(0), x)
    >>> lin.apply(p, x).shape
    (2, 10, 16)
    """

    n_neurons: int
    bias: bool = True
    init_criterion: str = "glorot"

    @nn.compact
    def __call__(self, x):
        in_q = x.shape[-1] // 4

        def make_init(idx):
            def init(key, shape):
                ws = quaternion_init(
                    key, in_q, self.n_neurons, self.init_criterion
                )
                return ws[idx]

            return init

        names = ["r_weight", "i_weight", "j_weight", "k_weight"]
        ws = [
            self.param(
                nm, make_init(i), (in_q, self.n_neurons)
            ).astype(x.dtype)
            for i, nm in enumerate(names)
        ]
        b = None
        if self.bias:
            b = self.param(
                "bias", nn.initializers.zeros, (4 * self.n_neurons,)
            ).astype(x.dtype)
        return quaternion_linear_op(x, *ws, bias=b)
