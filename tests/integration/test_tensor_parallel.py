"""Tensor parallelism: a dp x tp mesh must reproduce the pure-DP loss.

Weight matrices shard over the ``model`` axis (``tp_leaf_spec``); GSPMD
propagates activation shardings and inserts the collectives.  The
computation is identical math, so train/eval losses must match the
data-parallel placement to float tolerance.
"""

import jax
import numpy as np
import pytest

from speechbrain_tpu.parallel.mesh import make_mesh
from speechbrain_tpu.parallel.sharding import tp_leaf_spec


def _brain_and_batch(mp):
    import __graft_entry__ as ge

    brain = ge._conformer_brain(d_model=32, layers=1)
    brain.mesh = make_mesh(jax.devices()[:8], model_parallel=mp)
    batch = ge._synthetic_batch(B=8, seconds=0.5, U=6, seed=0)
    return brain, batch


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_tp_matches_dp_loss():
    from speechbrain_tpu.core import Stage

    losses = {}
    for mp in (1, 2):
        brain, batch = _brain_and_batch(mp)
        losses[mp] = brain.evaluate_batch(batch, Stage.VALID)
    assert np.isfinite(losses[1]) and np.isfinite(losses[2])
    assert abs(losses[1] - losses[2]) < 1e-3, losses


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_fit_batches_on_dp_tp_mesh():
    # The fused scan path compiles + runs under a dp x tp mesh and the
    # losses stay finite (GSPMD shardings propagate through lax.scan).
    import __graft_entry__ as ge

    brain, _ = _brain_and_batch(2)
    batches = [
        ge._synthetic_batch(B=8, seconds=0.5, U=6, seed=i) for i in range(3)
    ]
    brain.step = len(batches)
    losses = np.asarray(brain.fit_batches(batches))
    assert losses.shape == (3,)
    assert np.all(np.isfinite(losses)), losses


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_tp_params_actually_sharded():
    brain, batch = _brain_and_batch(2)
    brain._ensure_initialized(brain.prepare_batch(batch))
    specs = {
        str(s.spec)
        for s in (
            leaf.sharding
            for leaf in jax.tree_util.tree_leaves(
                brain.train_state["params"]
            )
            if hasattr(leaf, "sharding")
        )
    }
    # at least one weight matrix rides the model axis
    assert any("model" in s for s in specs), specs


def test_tp_leaf_spec_rules():
    assert str(tp_leaf_spec((64, 128), 2)) == "PartitionSpec(None, 'model')"
    assert str(tp_leaf_spec((64, 127), 2)) == "PartitionSpec('model', None)"
    assert str(tp_leaf_spec((63, 127), 2)) == "PartitionSpec()"
    assert str(tp_leaf_spec((128,), 2)) == "PartitionSpec()"
    assert str(tp_leaf_spec((3, 4, 8), 2)) == (
        "PartitionSpec(None, None, 'model')"
    )
    assert str(tp_leaf_spec((64, 128), 1)) == "PartitionSpec()"
