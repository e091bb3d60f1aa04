"""Minimal end-to-end slice: tone classification with Fbank + Xvector.

Mirrors the reference's integration-test strategy (tiny corpus, assert
overfit: ``tests/integration/.../example_asr_ctc_experiment.py:141``).
Exercises dataio + DSP + nnet + Brain + checkpointer with no decoder.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from speechbrain_tpu.core import Brain, Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.lobes.features import Fbank
from speechbrain_tpu.lobes.models.Xvector import Classifier, Xvector
from speechbrain_tpu.nnet.losses import nll_loss

SR = 16000
N_CLASSES = 3
FREQS = [220.0, 880.0, 3520.0]


def _make_dataset(n_per_class=6, seed=0):
    rng = np.random.default_rng(seed)
    data = {}
    for c, freq in enumerate(FREQS):
        for i in range(n_per_class):
            t = np.arange(int(0.3 * SR)) / SR
            phase = rng.uniform(0, np.pi)
            wav = 0.5 * np.sin(2 * np.pi * freq * t + phase)
            wav += 0.01 * rng.normal(size=len(t))
            data[f"c{c}_i{i}"] = {
                "wav_data": wav.astype(np.float32),
                "spk_id": c,
            }
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "wav_data", "spk_id"])
    return ds


class SpeakerBrain(Brain):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.fbank = Fbank(n_mels=24)

    def compute_forward(self, batch, stage):
        feats = self.fbank(batch["wav_data"])
        emb = self.modules.embedding_model(
            feats, lengths=batch["wav_data_lens"]
        )
        return self.modules.classifier(emb[:, 0])

    def compute_objectives(self, predictions, batch, stage):
        # batch_mask masks dummy rows added for data-parallel divisibility
        return nll_loss(
            predictions, batch["spk_id"], length=batch["batch_mask"]
        )


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    import optax

    from speechbrain_tpu.utils.checkpoints import Checkpointer
    from speechbrain_tpu.utils.epoch_loop import EpochCounter

    tmp_path = tmp_path_factory.mktemp("spkid")
    ds = _make_dataset()
    loader = SaveableDataLoader(ds, batch_size=6, shuffle=True)
    ckptr = Checkpointer(tmp_path)
    brain = SpeakerBrain(
        modules={
            "embedding_model": Xvector(
                tdnn_channels=(32, 32, 32, 32, 64),
                lin_neurons=32,
            ),
            "classifier": Classifier(
                out_neurons=N_CLASSES, lin_neurons=32
            ),
        },
        opt_class=lambda lr: __import__("optax").adam(lr),
        hparams={"lr": 5e-3},
        run_opts={"seed": 7},
        checkpointer=ckptr,
    )
    brain.fit(EpochCounter(8), loader)
    return brain, ds, ckptr, tmp_path


def test_overfits(trained):
    brain, ds, ckptr, _ = trained
    assert brain.train_loss < 0.3


def test_eval_accuracy(trained):
    brain, ds, _, _ = trained
    loader = SaveableDataLoader(ds, batch_size=6)
    correct = total = 0
    for batch in loader:
        device_batch = brain.prepare_batch(batch)
        rngs = brain._make_step_rngs(brain._next_rng())
        brain._bind(
            brain.train_state["params"],
            brain.train_state["model_state"],
            brain.train_state["extra"],
            rngs,
            train=False,
        )
        preds = brain.compute_forward(device_batch, Stage.TEST)
        real_n = len(batch)  # dummy rows (batch_mask==0) trail the batch
        pred_cls = np.asarray(preds.argmax(-1)).reshape(-1)[:real_n]
        correct += int((pred_cls == np.asarray(batch.spk_id)).sum())
        total += real_n
    assert correct / total > 0.9


def test_checkpoint_roundtrip(trained):
    brain, ds, ckptr, tmp_path = trained
    ckptr.save_checkpoint(meta={"loss": brain.train_loss})
    saved_params = jnp.asarray(
        np.asarray(
            next(
                iter(
                    jnp.ravel(leaf)
                    for leaf in __import__("jax").tree_util.tree_leaves(
                        brain.train_state["params"]
                    )
                )
            )
        )
    )
    # Perturb, then recover: parameters must be restored exactly.
    import jax

    brain.train_state["params"] = jax.tree_util.tree_map(
        lambda x: x * 0.0, brain.train_state["params"]
    )
    ckptr.recover_if_possible()
    restored = jnp.ravel(
        jax.tree_util.tree_leaves(brain.train_state["params"])[0]
    )
    assert float(jnp.abs(restored).sum()) > 0.0
