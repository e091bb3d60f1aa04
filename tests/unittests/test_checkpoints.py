import jax.numpy as jnp
import pytest

from speechbrain_tpu.utils.checkpoints import (
    Checkpointer,
    Recoverable,
    average_checkpoints,
    mark_as_loader,
    mark_as_saver,
    register_checkpoint_hooks,
)


def test_save_recover_pytree(tmp_path):
    params = Recoverable({"w": jnp.ones((2, 2)), "b": jnp.zeros(3)})
    ckptr = Checkpointer(tmp_path, {"params": params})
    ckptr.save_checkpoint(meta={"loss": 1.0})
    params.value = {"w": jnp.zeros((2, 2)), "b": jnp.ones(3)}
    ckpt = ckptr.recover_if_possible()
    assert ckpt is not None
    assert float(params.value["w"].sum()) == 4.0
    assert float(params.value["b"].sum()) == 0.0


def test_custom_hooks(tmp_path):
    @register_checkpoint_hooks
    class Counter:
        def __init__(self):
            self.n = 0

        @mark_as_saver
        def _save(self, path):
            with open(path, "w") as f:
                f.write(str(self.n))

        @mark_as_loader
        def _load(self, path, end_of_epoch=True):
            with open(path) as f:
                self.n = int(f.read())

    c = Counter()
    c.n = 7
    ckptr = Checkpointer(tmp_path, {"counter": c})
    ckptr.save_checkpoint()
    c.n = 0
    ckptr.recover_if_possible()
    assert c.n == 7


def test_keep_best(tmp_path):
    obj = Recoverable({"x": jnp.zeros(1)})
    ckptr = Checkpointer(tmp_path, {"obj": obj})
    ckptr.save_and_keep_only(meta={"WER": 10.0}, min_keys=["WER"], keep_recent=False)
    ckptr.save_and_keep_only(meta={"WER": 5.0}, min_keys=["WER"], keep_recent=False)
    ckptr.save_and_keep_only(meta={"WER": 8.0}, min_keys=["WER"], keep_recent=False)
    ckpts = ckptr.list_checkpoints()
    assert len(ckpts) == 1
    assert ckpts[0].meta["WER"] == 5.0


def test_find_by_key(tmp_path):
    obj = Recoverable({"x": jnp.zeros(1)})
    ckptr = Checkpointer(tmp_path, {"obj": obj})
    ckptr.save_checkpoint(meta={"acc": 0.5})
    ckptr.save_checkpoint(meta={"acc": 0.9})
    ckptr.save_checkpoint(meta={"acc": 0.7})
    best = ckptr.find_checkpoint(max_key="acc")
    assert best.meta["acc"] == 0.9


def test_partial_load_disallowed(tmp_path):
    obj = Recoverable({"x": jnp.zeros(1)})
    ckptr = Checkpointer(tmp_path, {"obj": obj})
    ckptr.save_checkpoint()
    ckptr.add_recoverable("extra", Recoverable({"y": jnp.ones(1)}))
    with pytest.raises(RuntimeError):
        ckptr.recover_if_possible()


def test_average_checkpoints(tmp_path):
    obj = Recoverable({"w": jnp.ones(2) * 1.0})
    ckptr = Checkpointer(tmp_path, {"model": obj})
    ckptr.save_checkpoint(name="one")
    obj.value = {"w": jnp.ones(2) * 3.0}
    ckptr.save_checkpoint(name="two")
    avg = average_checkpoints(
        ckptr.list_checkpoints(), "model", template_value=obj.value
    )
    assert float(avg["w"][0]) == 2.0


def test_end_of_epoch_flag(tmp_path):
    from speechbrain_tpu.utils.epoch_loop import EpochCounter

    counter = EpochCounter(10)
    next(counter)
    next(counter)  # current == 2
    ckptr = Checkpointer(tmp_path, {"epoch": counter})
    ckptr.save_checkpoint(end_of_epoch=False)  # mid-epoch save
    counter.current = 0
    ckptr.recover_if_possible()
    # Mid-epoch: epoch 2 didn't finish, resume counts it again.
    assert counter.current == 1
