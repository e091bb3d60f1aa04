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
    "tp_leaf_spec",
    "place_state",
]


def batch_sharding(mesh, ndim=None):
    """NamedSharding splitting dim 0 over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh):
    """NamedSharding replicating a tree on every device."""
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch):
    """device_put a pytree of host arrays with dim-0 data sharding.

    Batch dim must be divisible by the LOCAL data-axis size (the
    bucketed batch policy guarantees this via pad_batch_to).

    Single process: the leaves are the global batch; a plain
    ``device_put`` splits dim 0 over the data axis.

    Multi-process (``jax.distributed``): each process passes its OWN
    per-host shard (the rows its ``DistributedSamplerWrapper`` yielded
    — the reference's per-rank DDP loading, ``dataio/sampler.py:707``)
    and the global batch is assembled across processes with
    ``jax.make_array_from_process_local_data`` — dim 0 of the global
    array is ``process_count * local_rows``.
    """
    sharding = batch_sharding(mesh)
    multiprocess = jax.process_count() > 1

    def _put(x):
        # Already-placed leaves skip device_put entirely: even a no-op
        # put costs a host round trip on high-latency dispatch links.
        if isinstance(x, jax.Array) and getattr(x, "sharding", None) is not None:
            if x.sharding.is_equivalent_to(sharding, x.ndim):
                return x
        if multiprocess:
            import numpy as np

            local = np.asarray(x)
            global_shape = (
                jax.process_count() * local.shape[0],
            ) + local.shape[1:]
            return jax.make_array_from_process_local_data(
                sharding, local, global_shape
            )
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(_put, batch)


def replicate_tree(mesh, tree):
    """device_put a pytree replicated across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def tp_leaf_spec(shape, mp):
    """Tensor-parallel PartitionSpec for one parameter by shape.

    The scaling-book recipe: annotate weight shardings, let GSPMD
    propagate activation shardings and insert the collectives.  Matmul
    kernels (ndim >= 2) shard their output dim over the ``model`` axis
    when divisible (megatron column-parallel); otherwise the input dim
    (row-parallel); 1-D / indivisible leaves replicate.

    Example
    -------
    >>> tp_leaf_spec((64, 128), 2)
    PartitionSpec(None, 'model')
    >>> tp_leaf_spec((33, 7), 2)
    PartitionSpec()
    """
    from speechbrain_tpu.parallel.mesh import MODEL_AXIS

    if mp <= 1 or len(shape) < 2:
        return P()
    if shape[-1] % mp == 0:
        return P(*([None] * (len(shape) - 1)), MODEL_AXIS)
    if shape[-2] % mp == 0:
        return P(*([None] * (len(shape) - 2)), MODEL_AXIS, None)
    return P()


def place_state(mesh, tree):
    """device_put a train-state pytree onto the mesh.

    Pure data parallelism (model axis = 1) replicates every leaf; with
    tensor parallelism, weight matrices shard over the model axis by
    :func:`tp_leaf_spec` (optimizer moments follow automatically —
    same shapes, same rule).
    """
    from speechbrain_tpu.parallel.mesh import MODEL_AXIS

    mp = dict(zip(mesh.axis_names, mesh.devices.shape)).get(MODEL_AXIS, 1)
    if mp <= 1:
        return replicate_tree(mesh, tree)

    def put(x):
        shape = getattr(x, "shape", ())
        return jax.device_put(
            x, NamedSharding(mesh, tp_leaf_spec(shape, mp))
        )

    return jax.tree_util.tree_map(put, tree)
