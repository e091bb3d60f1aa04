"""End-to-end G2P slice (mirrors the reference
``tests/integration/G2P`` miniature experiment): the attentional
seq2seq G2P model learns a deterministic letter->phone mapping.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from speechbrain_tpu.core import Brain, Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.lobes.models.g2p.model import AttentionSeq2Seq
from speechbrain_tpu.nnet.losses import nll_loss

G_VOCAB = 12  # graphemes 2..11 (0 pad, 1 unused)
P_VOCAB = 14  # 0=bos, 1=eos, phones 2..13


def _g2p_rule(g):
    """Deterministic grapheme id -> phone id."""
    return 2 + ((g * 3) % (P_VOCAB - 2))


def _make_dataset(n_words=14, seed=21):
    rng = np.random.default_rng(seed)
    data = {}
    for i in range(n_words):
        length = int(rng.integers(3, 7))
        gs = rng.integers(2, G_VOCAB, size=length)
        ps = [_g2p_rule(int(g)) for g in gs]
        data[f"w{i}"] = {
            "graphemes": np.asarray(gs, np.int64),
            "phn_bos": np.asarray([0] + ps, np.int64),
            "phn_eos": np.asarray(ps + [1], np.int64),
        }
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "graphemes", "phn_bos", "phn_eos"])
    return ds


class G2PBrain(Brain):
    def compute_forward(self, batch, stage):
        logp, attn = self.modules.model(
            batch["graphemes"],
            batch["graphemes_lens"],
            batch["phn_bos"],
        )
        return logp

    def compute_objectives(self, predictions, batch, stage):
        mask = batch["batch_mask"]
        per_word = nll_loss(
            predictions,
            batch["phn_eos"],
            length=batch["phn_eos_lens"],
            reduction="batch",
        )
        if stage != Stage.TRAIN and hasattr(self, "seq_hits"):
            real = int(np.asarray(mask).sum())
            hyps = np.asarray(predictions).argmax(-1)
            tgts = np.asarray(batch["phn_eos"])
            lens = np.round(
                np.asarray(batch["phn_eos_lens"]) * tgts.shape[1]
            ).astype(int)
            for b in range(real):
                self.seq_hits.append(
                    bool((hyps[b, : lens[b]] == tgts[b, : lens[b]]).all())
                )
        return (per_word * mask).sum() / jnp.maximum(mask.sum(), 1.0)


@pytest.fixture(scope="module")
def trained():
    import optax

    from speechbrain_tpu.utils.epoch_loop import EpochCounter

    ds = _make_dataset()
    loader = SaveableDataLoader(ds, batch_size=7, shuffle=True)
    brain = G2PBrain(
        modules={
            "model": AttentionSeq2Seq(
                grapheme_vocab=G_VOCAB,
                phoneme_vocab=P_VOCAB,
                emb_dim=24,
                enc_neurons=32,
                dec_neurons=32,
                enc_layers=1,
                dec_layers=1,
            )
        },
        opt_class=lambda lr: optax.adam(lr),
        hparams={"lr": 5e-3},
        run_opts={"seed": 23},
    )
    brain.fit(EpochCounter(40), loader)
    return brain, ds


def test_g2p_overfits(trained):
    brain, _ = trained
    assert brain.train_loss < 0.5


def test_g2p_teacher_forced_accuracy(trained):
    brain, ds = trained
    loader = SaveableDataLoader(ds, batch_size=7)
    brain.seq_hits = []
    for batch in loader:
        brain.evaluate_batch_full(batch, Stage.TEST)
    assert np.mean(brain.seq_hits) >= 0.8
