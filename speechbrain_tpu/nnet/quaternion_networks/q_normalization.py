"""Quaternion-valued batch normalization.

Parity target: reference ``nnet/quaternion_networks/q_normalization.py``
(QBatchNorm, the whole-quaternion norm of Qilin Y. et al.).  One shared
variance is computed across the four quaternion components of each
feature, so the quaternion's direction is preserved while its magnitude
is standardized.

Divergence note: the reference's eval branch divides by the raw running
variance (no sqrt) and its train branch skips the mean subtraction its
own comment describes; here both paths use the standard
``(x - mu) / sqrt(var + eps)`` so train and eval agree.
"""

import flax.linen as nn
import jax.numpy as jnp


class QBatchNorm(nn.Module):
    """Quaternion batchnorm: shared sigma across the r,i,j,k components.

    Input layout matches the quaternion layers: the normalized axis
    holds ``4 * num_features`` values as four contiguous blocks
    ``[r..., i..., j..., k...]``.

    Arguments
    ---------
    input_size : int
        Size of the normalized axis (must be divisible by 4).
    dim : int
        Axis to normalize (default -1, the channel axis).
    gamma_init : float
        Initial per-feature scale.
    beta_param : bool
        Whether to apply the learned offset.
    momentum : float
        Running-stat update rate (reference semantics: new stats get
        weight ``momentum``).
    eps : float
        Variance floor.
    track_running_stats : bool
        When False, batch statistics are always used.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> qbn = QBatchNorm(input_size=8)
    >>> x = jnp.ones((10, 8))
    >>> vars_ = qbn.init(jax.random.PRNGKey(0), x, train=False)
    >>> y, _ = qbn.apply(vars_, x, train=True, mutable=["batch_stats"])
    >>> y.shape
    (10, 8)
    """

    input_size: int = 0
    dim: int = -1
    gamma_init: float = 1.0
    beta_param: bool = True
    momentum: float = 0.1
    eps: float = 1e-4
    track_running_stats: bool = True

    @nn.compact
    def __call__(self, x, train=True):
        num_features = self.input_size // 4
        gamma = self.param(
            "gamma",
            lambda k, s: jnp.full(s, self.gamma_init),
            (num_features,),
        )
        beta = self.param(
            "beta", nn.initializers.zeros, (num_features * 4,)
        )
        # Move the normalized axis last for uniform handling.
        axis = self.dim % x.ndim
        perm = x.ndim - 1
        moved = jnp.moveaxis(x, axis, perm)
        reduce_axes = tuple(range(moved.ndim - 1))

        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros(num_features * 4),
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(num_features)
        )

        use_batch_stats = train or not self.track_running_stats
        if use_batch_stats:
            mu = jnp.mean(moved, axis=reduce_axes)
            delta = moved - mu
            dr, di, dj, dk = jnp.split(delta, 4, axis=-1)
            quat_var = jnp.mean(
                dr**2 + di**2 + dj**2 + dk**2, axis=reduce_axes
            )
            if train and self.track_running_stats and not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mu
                ra_var.value = (1 - m) * ra_var.value + m * quat_var
        else:
            mu = ra_mean.value
            quat_var = ra_var.value
        denom = jnp.sqrt(quat_var + self.eps)
        out = (moved - mu) / jnp.tile(denom, 4)
        q_gamma = jnp.tile(gamma, 4)
        out = q_gamma * out
        if self.beta_param:
            out = out + beta
        return jnp.moveaxis(out, perm, axis).astype(x.dtype)
