"""Complex-valued linear layer.

Parity target: reference ``nnet/complex_networks/c_linear.py``.
"""

import flax.linen as nn
import jax.numpy as jnp

from speechbrain_tpu.nnet.complex_networks.c_ops import (
    complex_init,
    complex_linear_op,
    unitary_init,
)

__all__ = ["CLinear"]


class CLinear(nn.Module):
    """y = x W over complex numbers in split representation.

    n_neurons counts COMPLEX units: input (…, 2*in) -> output (…,
    2*n_neurons).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lin = CLinear(n_neurons=4)
    >>> x = jnp.ones((2, 10, 16))  # 8 complex dims
    >>> p = lin.init(jax.random.PRNGKey(0), x)
    >>> lin.apply(p, x).shape
    (2, 10, 8)
    """

    n_neurons: int
    bias: bool = True
    init_criterion: str = "glorot"
    weight_init: str = "complex"

    @nn.compact
    def __call__(self, x):
        in_complex = x.shape[-1] // 2
        init_fn = (
            unitary_init if self.weight_init == "unitary" else complex_init
        )

        def make_init(part):
            def init(key, shape):
                wr, wi = init_fn(
                    key, in_complex, self.n_neurons, self.init_criterion
                )
                return wr if part == "real" else wi

            return init

        wr = self.param(
            "real_weight", make_init("real"), (in_complex, self.n_neurons)
        ).astype(x.dtype)
        wi = self.param(
            "imag_weight", make_init("imag"), (in_complex, self.n_neurons)
        ).astype(x.dtype)
        b = None
        if self.bias:
            b = self.param(
                "bias", nn.initializers.zeros, (2 * self.n_neurons,)
            ).astype(x.dtype)
        return complex_linear_op(x, wr, wi, b)
