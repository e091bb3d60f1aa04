"""Streaming source -> make_dataloader -> Brain.fit (the reference's
webdataset route, ``dataio/dataloader.py:52-66``): a generator corpus
flows through dynamic bucketing and trains end-to-end, with the
SaveableDataLoader position semantics preserved."""

import numpy as np
import optax
import pytest

from speechbrain_tpu.core import Brain
from speechbrain_tpu.dataio.dataloader import (
    SaveableStreamLoader,
    make_dataloader,
)
from speechbrain_tpu.utils.epoch_loop import EpochCounter


def corpus(n=12, seed=0):
    rng = np.random.default_rng(seed)
    for i in range(n):
        T = int(rng.integers(8, 20))
        yield {
            "id": f"utt{i}",
            "sig": rng.standard_normal(T).astype(np.float32),
            "target": np.float32(i % 2),
        }


def test_make_dataloader_streams_generator():
    loader = make_dataloader(corpus, batch_size=4)
    batches = list(loader)
    assert isinstance(loader, SaveableStreamLoader)
    assert sum(len(b["id"]) for b in batches) == 12
    # re-iterable: a fresh generator per epoch
    assert sum(len(b["id"]) for b in loader) == 12


def test_make_dataloader_streaming_dynamic_bucketing():
    loader = make_dataloader(
        corpus,
        dynamic_batching_kwargs=dict(
            len_key="sig", target_batch_numel=64, buffersize=6
        ),
    )
    batches = list(loader)
    assert sum(len(b["id"]) for b in batches) == 12
    for b in batches:
        sig = np.asarray(b["sig"].data)
        # pivot bucketing caps padded numel near the target
        assert sig.shape[0] * sig.shape[1] <= 2 * 64


def test_stream_loader_position_recovery(tmp_path):
    loader = SaveableStreamLoader(corpus, batch_size=4)
    it = iter(loader)
    next(it)
    next(it)
    path = tmp_path / "pos.txt"
    loader._save(str(path))
    # a fresh loader recovering mid-epoch skips the trained batches
    loader2 = SaveableStreamLoader(corpus, batch_size=4)
    loader2._recover(str(path), end_of_epoch=False)
    remaining = list(loader2)
    assert len(remaining) == 1
    assert remaining[0]["id"] == ["utt8", "utt9", "utt10", "utt11"]


class TinyBrain(Brain):
    def compute_forward(self, batch, stage):
        import jax.numpy as jnp

        x = batch["sig"]
        return jnp.tanh(self.modules.lin(x.mean(axis=1, keepdims=True)))

    def compute_objectives(self, predictions, batch, stage):
        import jax.numpy as jnp

        target = batch["target"]
        return jnp.mean((predictions[:, 0] - target) ** 2)


def test_brain_fit_over_stream():
    import flax.linen as nn

    brain = TinyBrain(
        modules={"lin": nn.Dense(1)},
        opt_class=lambda lr: optax.adam(lr),
        hparams={"lr": 0.05},
        run_opts={"seed": 0},
    )
    brain.fit(
        EpochCounter(3),
        corpus,
        train_loader_kwargs=dict(
            dynamic_batching_kwargs=dict(
                len_key="sig", target_batch_numel=64, buffersize=6
            )
        ),
    )
    assert np.isfinite(brain.avg_train_loss)
