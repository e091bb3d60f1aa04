"""End-to-end RNN language-model slice (mirrors the reference
``tests/integration/LM_RNN`` miniature experiment): an RNNLM overfits
a tiny token corpus; perplexity on the training data drops far below
the uniform-vocab ceiling.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from speechbrain_tpu.core import Brain, Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.lobes.models.RNNLM import RNNLM
from speechbrain_tpu.nnet.losses import nll_loss

VOCAB = 20  # 0=bos, 1=eos, 2..19 content


def _make_dataset(n_sents=16, seed=7):
    rng = np.random.default_rng(seed)
    data = {}
    for i in range(n_sents):
        # Deterministic arithmetic sequences: fully learnable.
        start = int(rng.integers(2, 8))
        step = int(rng.integers(1, 3))
        length = int(rng.integers(4, 8))
        toks = [(start + step * k - 2) % (VOCAB - 2) + 2 for k in range(length)]
        data[f"s{i}"] = {
            "tokens_bos": np.asarray([0] + toks, np.int64),
            "tokens_eos": np.asarray(toks + [1], np.int64),
        }
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "tokens_bos", "tokens_eos"])
    return ds


class LMBrain(Brain):
    def compute_forward(self, batch, stage):
        import jax

        logits = self.modules.model(batch["tokens_bos"])
        return jax.nn.log_softmax(logits, axis=-1)

    def compute_objectives(self, predictions, batch, stage):
        mask = batch["batch_mask"]
        per_sent = nll_loss(
            predictions,
            batch["tokens_eos"],
            length=batch["tokens_eos_lens"],
            reduction="batch",
        )
        return (per_sent * mask).sum() / jnp.maximum(mask.sum(), 1.0)


@pytest.fixture(scope="module")
def trained():
    import optax

    from speechbrain_tpu.utils.epoch_loop import EpochCounter

    ds = _make_dataset()
    loader = SaveableDataLoader(ds, batch_size=8, shuffle=True)
    brain = LMBrain(
        modules={
            "model": RNNLM(
                output_neurons=VOCAB,
                embedding_dim=24,
                rnn_layers=1,
                rnn_neurons=64,
                dnn_blocks=1,
                dnn_neurons=48,
                dropout=0.0,
            )
        },
        opt_class=lambda lr: optax.adam(lr),
        hparams={"lr": 5e-3},
        run_opts={"seed": 13},
    )
    brain.fit(EpochCounter(30), loader)
    return brain, ds


def test_lm_overfits(trained):
    brain, _ = trained
    # Arithmetic continuations are deterministic given two tokens:
    # train NLL far below uniform ln(20) = 3.0.
    assert brain.train_loss < 1.0


def test_lm_perplexity(trained):
    brain, ds = trained
    loader = SaveableDataLoader(ds, batch_size=8)
    total, steps = 0.0, 0
    for batch in loader:
        total += brain.evaluate_batch_full(batch, Stage.TEST)
        steps += 1
    ppl = math.exp(total / steps)
    assert ppl < math.exp(1.0) < VOCAB - 2
