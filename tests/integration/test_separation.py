"""Separation slice: SepFormer-tiny overfits a 2-source mixture with
PIT SI-SNR (mirrors reference ``tests/integration/separation``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechbrain_tpu.core import Brain, Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import (
    PitWrapper,
    cal_si_snr,
    get_si_snr_with_pitwrapper,
)

SR = 8000


def _make_dataset(n=6, seed=0):
    rng = np.random.default_rng(seed)
    data = {}
    t = np.arange(int(0.25 * SR)) / SR
    for i in range(n):
        f1, f2 = rng.uniform(200, 600), rng.uniform(1200, 2400)
        s1 = 0.5 * np.sin(2 * np.pi * f1 * t).astype(np.float32)
        s2 = 0.5 * np.sin(2 * np.pi * f2 * t).astype(np.float32)
        data[f"mix{i}"] = {
            "mix": (s1 + s2).astype(np.float32),
            "s1": s1,
            "s2": s2,
        }
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "mix", "s1", "s2"])
    return ds


class SepBrain(Brain):
    def compute_forward(self, batch, stage):
        return self.modules.masknet(batch["mix"])

    def compute_objectives(self, predictions, batch, stage):
        targets = jnp.stack([batch["s1"], batch["s2"]], axis=-1)
        per_example = get_si_snr_with_pitwrapper(targets, predictions)
        mask = batch["batch_mask"]  # zero out dummy rows
        return (per_example * mask).sum() / jnp.maximum(mask.sum(), 1.0)


@pytest.fixture(scope="module")
def trained():
    import optax

    from speechbrain_tpu.lobes.models.dual_path import SepformerWrapper
    from speechbrain_tpu.utils.epoch_loop import EpochCounter

    ds = _make_dataset()
    loader = SaveableDataLoader(ds, batch_size=3, shuffle=True)
    brain = SepBrain(
        modules={
            "masknet": SepformerWrapper(
                encoder_out_nchannels=32,
                encoder_kernel_size=8,
                masknet_chunksize=20,
                masknet_numlayers=1,
                intra_numlayers=1,
                inter_numlayers=1,
                intra_nhead=4,
                inter_nhead=4,
                intra_dffn=64,
                inter_dffn=64,
            )
        },
        opt_class=lambda lr: optax.adam(lr),
        hparams={"lr": 1e-3},
        run_opts={"seed": 2},
    )
    brain.fit(EpochCounter(50), loader)
    return brain, ds


def test_separation_overfits(trained):
    brain, ds = trained
    # loss is negative SI-SNR; separation better than 5 dB on train set
    assert brain.train_loss < -5.0


def test_separated_sources_match(trained):
    brain, ds = trained
    batch = next(iter(SaveableDataLoader(ds, batch_size=3)))
    db = brain.prepare_batch(batch)
    rngs = brain._make_step_rngs(brain._next_rng())
    brain._bind(
        brain.train_state["params"],
        brain.train_state["model_state"],
        brain.train_state["extra"],
        rngs,
        train=False,
    )
    est = brain.compute_forward(db, Stage.TEST)
    targets = jnp.stack([db["s1"], db["s2"]], axis=-1)
    loss = get_si_snr_with_pitwrapper(targets[: len(batch)], est[: len(batch)])
    assert float(loss.mean()) < -5.0
