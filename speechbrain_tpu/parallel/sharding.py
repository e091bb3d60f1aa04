"""Sharding placement helpers.

Data-parallel contract of the training engine:

- batch arrays: sharded on dim 0 over the ``data`` mesh axis
- params / optimizer state: replicated (P()), letting XLA turn the
  gradient reduction into an all-reduce over ICI; swap in partition
  rules here for tensor-parallel layouts later.
"""

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from speechbrain_tpu.parallel.mesh import DATA_AXIS

__all__ = [
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate_tree",
]


def batch_sharding(mesh, ndim=None):
    """NamedSharding splitting dim 0 over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh):
    """NamedSharding replicating a tree on every device."""
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch):
    """device_put a pytree of host arrays with dim-0 data sharding.

    Batch dim must be divisible by the data-axis size (the bucketed
    batch policy guarantees this via pad_batch_to).
    """
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate_tree(mesh, tree):
    """device_put a pytree replicated across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )
