"""X-vector speaker embedding model (TDNN + statistics pooling).

Parity targets: reference ``lobes/models/Xvector.py:18`` (Xvector),
``:108`` (Classifier), ``:176`` (Discriminator).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from speechbrain_tpu.nnet.CNN import Conv1d
from speechbrain_tpu.nnet.normalization import BatchNorm1d
from speechbrain_tpu.nnet.pooling import StatisticsPooling

__all__ = ["Xvector", "Classifier", "Discriminator"]


class Xvector(nn.Module):
    """TDNN stack -> statistics pooling -> embedding.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> model = Xvector(tdnn_channels=(64,) * 5, lin_neurons=32)
    >>> x = jnp.ones((2, 40, 24))
    >>> v = model.init(jax.random.PRNGKey(0), x, train=False)
    >>> out, _ = model.apply(v, x, train=True, mutable=["batch_stats"])
    >>> out.shape
    (2, 1, 32)
    """

    tdnn_blocks: int = 5
    tdnn_channels: tuple = (512, 512, 512, 512, 1500)
    tdnn_kernel_sizes: tuple = (5, 3, 3, 1, 1)
    tdnn_dilations: tuple = (1, 2, 3, 1, 1)
    lin_neurons: int = 512

    @nn.compact
    def __call__(self, x, lengths=None, train=True):
        for block_index in range(self.tdnn_blocks):
            x = Conv1d(
                out_channels=self.tdnn_channels[block_index],
                kernel_size=self.tdnn_kernel_sizes[block_index],
                dilation=self.tdnn_dilations[block_index],
            )(x)
            x = jax.nn.leaky_relu(x)
            x = BatchNorm1d()(x, train=train)
        x = StatisticsPooling()(x, lengths)
        x = nn.Dense(self.lin_neurons, dtype=x.dtype)(x)
        return x


class Classifier(nn.Module):
    """MLP + cosine-logit classification head over embeddings.

    The final layer computes cosine similarity against class centroids
    (for AAM-softmax margins, reference ``Xvector.py:108``).
    """

    out_neurons: int
    lin_blocks: int = 1
    lin_neurons: int = 512
    cosine: bool = False

    @nn.compact
    def __call__(self, x, train=True):
        for _ in range(self.lin_blocks):
            x = nn.Dense(self.lin_neurons, dtype=x.dtype)(x)
            x = jax.nn.leaky_relu(x)
            x = BatchNorm1d()(x, train=train)
        if self.cosine:
            w = self.param(
                "centroids",
                nn.initializers.lecun_normal(),
                (self.lin_neurons, self.out_neurons),
            ).astype(x.dtype)
            x_norm = x / jnp.maximum(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8
            )
            w_norm = w / jnp.maximum(
                jnp.linalg.norm(w, axis=0, keepdims=True), 1e-8
            )
            return x_norm @ w_norm
        x = nn.Dense(self.out_neurons, dtype=x.dtype)(x)
        return jax.nn.log_softmax(x, axis=-1)


class Discriminator(nn.Module):
    """Binary discriminator over embeddings (adversarial training)."""

    lin_blocks: int = 1
    lin_neurons: int = 512

    @nn.compact
    def __call__(self, x, train=True):
        for _ in range(self.lin_blocks):
            x = nn.Dense(self.lin_neurons, dtype=x.dtype)(x)
            x = jax.nn.leaky_relu(x)
            x = BatchNorm1d()(x, train=train)
        return nn.Dense(1, dtype=x.dtype)(x)
