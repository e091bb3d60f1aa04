"""Brain engine unit tests: grad accumulation, lr injection, debug mode,
nonfinite patience, checkpoint integration."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from speechbrain_tpu.core import Brain, Stage
from speechbrain_tpu.nnet.linear import Linear


class TinyBrain(Brain):
    def compute_forward(self, batch, stage):
        return self.modules.lin(batch["x"])

    def compute_objectives(self, predictions, batch, stage):
        return ((predictions - batch["y"]) ** 2).mean()


def _batch(B=8, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, 4, 8)).astype(np.float32)
    return {"x": x, "y": (x * 2.0).sum(-1, keepdims=True).repeat(2, -1)}


def _make_brain(**run_opts):
    defaults = {"seed": 0, "loss_sync_interval": 1}
    defaults.update(run_opts)
    return TinyBrain(
        modules={"lin": Linear(n_neurons=2)},
        opt_class=lambda lr: optax.sgd(lr),
        hparams={"lr": 0.05},
        run_opts=defaults,
    )


def test_training_reduces_loss():
    brain = _make_brain()
    batch = _batch()
    losses = []
    for i in range(20):
        brain.step = i + 1
        losses.append(brain.fit_batch(batch))
    assert losses[-1] < losses[0] * 0.5


def test_lr_injection_changes_updates():
    brain = _make_brain()
    batch = _batch()
    brain.step = 1
    brain.fit_batch(batch)
    p0 = jax.tree_util.tree_leaves(brain.train_state["params"])[0].copy()
    brain.lr = 0.0  # freeze
    brain.step = 2
    brain.fit_batch(batch)
    p1 = jax.tree_util.tree_leaves(brain.train_state["params"])[0]
    assert np.allclose(np.asarray(p0), np.asarray(p1))


def test_grad_accumulation_matches_big_batch():
    # Two half-batches with accumulation == one full batch step (SGD).
    full = _batch(B=8)
    halves = [
        {k: v[:4] for k, v in full.items()},
        {k: v[4:] for k, v in full.items()},
    ]
    b1 = _make_brain()
    b1.step = 1
    b1.fit_batch(full)
    b2 = _make_brain(grad_accumulation_factor=2)
    for i, h in enumerate(halves):
        b2.step = i + 1
        b2.fit_batch(h)
    p1 = np.asarray(jax.tree_util.tree_leaves(b1.train_state["params"])[0])
    p2 = np.asarray(jax.tree_util.tree_leaves(b2.train_state["params"])[0])
    # mean-of-means == full-batch mean here (equal halves)
    assert np.allclose(p1, p2, atol=1e-5)


def test_fit_batches_matches_sequential():
    # K fused scan steps == K per-batch dispatches (params + losses).
    batches = [_batch(seed=i) for i in range(4)]
    b1 = _make_brain()
    seq_losses = []
    for i, bt in enumerate(batches):
        b1.step = i + 1
        seq_losses.append(float(b1.fit_batch(bt)))
    b2 = _make_brain()
    fused_losses = np.asarray(b2.fit_batches(batches))
    np.testing.assert_allclose(fused_losses, seq_losses, rtol=2e-5)
    p1 = np.asarray(jax.tree_util.tree_leaves(b1.train_state["params"])[0])
    p2 = np.asarray(jax.tree_util.tree_leaves(b2.train_state["params"])[0])
    np.testing.assert_allclose(p1, p2, atol=1e-6)
    assert b2.optimizer_step == 4


def test_fit_with_steps_per_execute():
    # The fused window path in fit() trains and counts steps correctly.
    from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
    from speechbrain_tpu.dataio.dataset import DynamicItemDataset
    from speechbrain_tpu.utils.epoch_loop import EpochCounter

    rng = np.random.default_rng(0)
    data = {
        f"u{i}": {
            "x": rng.normal(size=(4, 8)).astype(np.float32),
            "y": rng.normal(size=(4, 2)).astype(np.float32),
        }
        for i in range(16)
    }
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "x", "y"])
    brain = _make_brain(steps_per_execute=3)
    loader = SaveableDataLoader(ds, batch_size=4)
    brain.fit(EpochCounter(1), loader)
    # 16 examples / batch 4 = 4 batches -> windows of 3 + 1
    assert brain.optimizer_step == 4
    assert brain.avg_train_loss > 0


def test_nonfinite_patience_raises():
    class NanBrain(TinyBrain):
        def compute_objectives(self, predictions, batch, stage):
            return jnp.float32(np.nan) * predictions.sum()

    brain = NanBrain(
        modules={"lin": Linear(n_neurons=2)},
        opt_class=lambda lr: optax.sgd(lr),
        hparams={"lr": 0.1},
        run_opts={
            "seed": 0,
            "nonfinite_patience": 2,
            "loss_sync_interval": 1,
        },
    )
    batch = _batch()
    with pytest.raises(ValueError):
        for i in range(10):
            brain.step = i + 1
            brain.fit_batch(batch)


def test_debug_mode_truncates():
    from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
    from speechbrain_tpu.dataio.dataset import DynamicItemDataset
    from speechbrain_tpu.utils.epoch_loop import EpochCounter

    rng = np.random.default_rng(0)
    data = {
        f"u{i}": {
            "x": rng.normal(size=(4, 8)).astype(np.float32),
            "y": rng.normal(size=(4, 2)).astype(np.float32),
        }
        for i in range(32)
    }
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "x", "y"])
    brain = _make_brain(debug=True, debug_batches=2, debug_epochs=1)
    loader = SaveableDataLoader(ds, batch_size=4)
    brain.fit(EpochCounter(10), loader)
    # only debug_batches steps ran in the single debug epoch
    assert brain.optimizer_step <= 4


def test_lazy_loss_sync_interval():
    brain = _make_brain(loss_sync_interval=5)
    batch = _batch()
    returns = []
    for i in range(10):
        brain.step = i + 1
        returns.append(brain.fit_batch(batch))
    floats = [r for r in returns if isinstance(r, float)]
    # synced every 5th step -> 2 float returns
    assert len(floats) == 2
    assert brain.avg_train_loss > 0


def test_fit_resume_recovers_epoch_counter(tmp_path):
    """A killed-and-restarted fit must resume at the NEXT epoch, not
    epoch 1 (round-3 dress-rehearsal regression: parameters recovered
    but the epoch counter restarted, silently retraining from epoch 1).
    fit() now auto-registers the counter with the checkpointer."""
    import optax

    from speechbrain_tpu.core import Brain
    from speechbrain_tpu.utils.checkpoints import Checkpointer
    from speechbrain_tpu.utils.epoch_loop import EpochCounter

    class Tiny(Brain):
        def compute_forward(self, batch, stage):
            return self.modules.lin(batch["x"])

        def compute_objectives(self, pred, batch, stage):
            import jax.numpy as jnp

            return jnp.mean((pred - batch["y"]) ** 2)

        def on_stage_end(self, stage, loss, epoch=None):
            if stage.name == "TRAIN" and self.checkpointer:
                self.checkpointer.save_and_keep_only(
                    meta={"loss": float(loss)}
                )

    import numpy as np

    from speechbrain_tpu.nnet.linear import Linear

    def make_brain():
        return Tiny(
            modules={"lin": Linear(n_neurons=2)},
            opt_class=lambda lr: optax.sgd(lr),
            hparams={"lr": 0.1},
            run_opts={"seed": 0},
            checkpointer=Checkpointer(tmp_path),
        )

    from speechbrain_tpu.dataio.dataloader import SaveableDataLoader

    def make_loader():
        return SaveableDataLoader(
            [
                {
                    "x": np.ones((2, 3), np.float32),
                    "y": np.zeros((2, 2), np.float32),
                }
            ],
            batch_size=1,
            collate_fn=lambda exs: exs[0],
        )

    batches = make_loader()
    b1 = make_brain()
    c1 = EpochCounter(2)
    b1.fit(c1, batches)
    assert c1.current == 2

    # fresh process: same target -> nothing left to do
    b2 = make_brain()
    c2 = EpochCounter(2)
    epochs_run = []
    orig = b2._fit_train

    def spy(train_set, epoch, progressbar):
        epochs_run.append(epoch)
        return orig(train_set, epoch, progressbar)

    b2._fit_train = spy
    b2.fit(c2, make_loader())
    assert c2.current == 2
    assert epochs_run == [], epochs_run

    # fresh process with a HIGHER target resumes at epoch 3
    b3 = make_brain()
    c3 = EpochCounter(4)
    epochs_run3 = []
    orig3 = b3._fit_train

    def spy3(train_set, epoch, progressbar):
        epochs_run3.append(epoch)
        return orig3(train_set, epoch, progressbar)

    b3._fit_train = spy3
    b3.fit(c3, make_loader())
    assert epochs_run3 == [3, 4], epochs_run3


def test_fresh_process_resume_recovers_train_state(tmp_path):
    """A FRESH process resuming a checkpointed fit must continue from
    the trained parameters, not re-initialize them (round-3 dress
    rehearsal: the train state is a lazily-registered recoverable, so
    fit-start recovery used to skip it and resumed runs silently
    trained from scratch with recovered counters)."""
    import numpy as np
    import optax

    from speechbrain_tpu.core import Brain
    from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
    from speechbrain_tpu.nnet.linear import Linear
    from speechbrain_tpu.utils.checkpoints import Checkpointer
    from speechbrain_tpu.utils.epoch_loop import EpochCounter

    losses = []

    class Tiny(Brain):
        def compute_forward(self, batch, stage):
            return self.modules.lin(batch["x"])

        def compute_objectives(self, pred, batch, stage):
            import jax.numpy as jnp

            loss = jnp.mean((pred - batch["y"]) ** 2)
            return loss

        def on_stage_end(self, stage, loss, epoch=None):
            if stage.name == "TRAIN":
                losses.append(float(loss))
                if self.checkpointer:
                    self.checkpointer.save_and_keep_only(
                        meta={"loss": float(loss)}
                    )

    def make_brain():
        b = Tiny(
            modules={"lin": Linear(n_neurons=2)},
            opt_class=lambda lr: optax.sgd(lr),
            hparams={"lr": 0.2},
            run_opts={"seed": 0},
            checkpointer=Checkpointer(tmp_path),
        )
        b.loss_sync_interval = 1
        return b

    rng = np.random.default_rng(0)
    data = {
        "x": rng.standard_normal((4, 3)).astype(np.float32),
        "y": np.zeros((4, 2), np.float32),
    }

    def make_loader():
        return SaveableDataLoader(
            [data], batch_size=1, collate_fn=lambda exs: exs[0]
        )

    b1 = make_brain()
    b1.fit(EpochCounter(6), make_loader())
    scratch_loss, trained_loss = losses[0], losses[-1]
    assert trained_loss < 0.5 * scratch_loss  # it actually learned

    # fresh process resumes and continues DOWN from the trained loss
    losses.clear()
    b2 = make_brain()
    b2.fit(EpochCounter(8), make_loader())
    assert len(losses) == 2  # epochs 7, 8 only
    assert losses[0] <= trained_loss * 1.05, (
        f"resumed loss {losses[0]} vs trained {trained_loss} "
        f"(scratch was {scratch_loss}) — train state not recovered"
    )


def test_staged_fit_matches_sync():
    # Overlapped device staging (staging_depth > 0, the reference
    # pin_memory role) must be a pure scheduling change: identical
    # batches in identical order -> bit-identical training losses.
    from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
    from speechbrain_tpu.dataio.dataset import DynamicItemDataset
    from speechbrain_tpu.utils.epoch_loop import EpochCounter

    rng = np.random.default_rng(3)
    data = {
        f"u{i}": {
            "x": rng.normal(size=(4, 8)).astype(np.float32),
            "y": rng.normal(size=(4, 2)).astype(np.float32),
        }
        for i in range(12)
    }

    def run(depth, spe=1):
        ds = DynamicItemDataset(data)
        ds.set_output_keys(["id", "x", "y"])
        brain = _make_brain(staging_depth=depth, steps_per_execute=spe)
        loader = SaveableDataLoader(ds, batch_size=4)
        losses = []
        orig = brain.on_fit_batch_end
        brain.on_fit_batch_end = lambda b, o, l, s: (
            losses.append(float(np.ravel(np.asarray(l))[-1])),
            orig(b, o, l, s),
        )[1]
        brain.fit(EpochCounter(2), loader)
        return losses

    sync = run(0)
    staged = run(2)
    assert sync == staged and len(sync) > 0
    # fused-window path under staging too
    sync_f = run(0, spe=2)
    staged_f = run(3, spe=2)
    assert sync_f == staged_f and len(sync_f) > 0


def test_staged_position_reflects_consumption(tmp_path):
    # A staging thread runs the loader up to staging_depth ahead; the
    # checkpointed position must be the CONSUMED batch count, not the
    # prefetched one (else mid-epoch resume skips untrained batches).
    from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
    from speechbrain_tpu.dataio.dataset import DynamicItemDataset

    rng = np.random.default_rng(5)
    data = {
        f"u{i}": {
            "x": rng.normal(size=(4, 8)).astype(np.float32),
            "y": rng.normal(size=(4, 2)).astype(np.float32),
        }
        for i in range(12)
    }
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "x", "y"])
    brain = _make_brain(staging_depth=4)
    loader = SaveableDataLoader(ds, batch_size=2)  # 6 batches
    loader._speechbrain_iterator_position = 0
    staged = brain._staged_iter(iter(loader), loader)
    import time as _time

    consumed = 0
    for device_batch, host_batch in staged:
        consumed += 1
        if consumed == 2:
            _time.sleep(0.3)  # let the stager run well ahead
            p = tmp_path / "pos.txt"
            loader._save(str(p))
            assert int(p.read_text()) == consumed, (
                int(p.read_text()),
                consumed,
                loader._speechbrain_iterator_position,
            )
            break
    staged.close()
    # after the staged iterator closes, the raw position is used again
    assert loader._speechbrain_staged_position is None
