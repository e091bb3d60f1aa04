"""Device mesh construction.

The reference's distributed model is NCCL/Gloo process groups with DDP
gradient hooks (``utils/distributed.py:107``, ``core.py:1238``).  The
TPU-native equivalent is a ``jax.sharding.Mesh`` over all chips: data
parallelism shards the batch axis; gradient all-reduce is inserted by
XLA (riding ICI within a slice, DCN across slices).  The mesh axes also
reserve tensor/pipeline axes so models can shard further without
changing the training engine.
"""

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "data_axis", "DATA_AXIS", "MODEL_AXIS"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices=None, model_parallel=1):
    """A (data, model) mesh; model_parallel=1 = pure data parallelism.

    Example
    -------
    >>> mesh = make_mesh()
    >>> DATA_AXIS in mesh.axis_names
    True
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    n = devices.size
    if n % model_parallel != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallel={model_parallel}"
        )
    grid = devices.reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_axis(mesh):
    """Number of data-parallel shards of the mesh."""
    return mesh.shape[DATA_AXIS]
