"""End-to-end HMM alignment slice: tone segments -> phone states.

Mirrors the reference ``tests/integration/ASR_alignment_forward`` and
``ASR_alignment_viterbi`` miniature experiments: an acoustic model over
Fbank frames is trained with (a) the HMM forward likelihood and (b) the
Viterbi NLL (via the traceable ``viterbi_targets`` path), then Viterbi
alignments are scored against the known segment boundaries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechbrain_tpu.alignment.aligner import HMMAligner
from speechbrain_tpu.core import Brain, Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.lobes.features import Fbank
from speechbrain_tpu.nnet.losses import nll_loss

SR = 8000
TONE_FREQS = [300.0, 900.0, 2000.0, 3400.0]
SEG_DUR = 0.1  # seconds per phone segment


def _make_dataset(n_utts=10, seed=3):
    rng = np.random.default_rng(seed)
    data = {}
    for i in range(n_utts):
        n_seg = int(rng.integers(3, 6))
        labels = [int(rng.integers(0, len(TONE_FREQS)))]
        while len(labels) < n_seg:
            nxt = int(rng.integers(0, len(TONE_FREQS)))
            if nxt != labels[-1]:
                labels.append(nxt)
        segs = []
        for lab in labels:
            t = np.arange(int(SEG_DUR * SR)) / SR
            segs.append(0.5 * np.sin(2 * np.pi * TONE_FREQS[lab] * t))
        wav = np.concatenate(segs).astype(np.float32)
        wav += 0.01 * rng.normal(size=len(wav)).astype(np.float32)
        data[f"u{i}"] = {
            "wav_data": wav,
            "phns_data": np.asarray(labels, np.int64),
        }
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "wav_data", "phns_data"])
    return ds


class AlignBrain(Brain):
    training_type = "forward"

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.fbank = Fbank(n_mels=24, sample_rate=SR, n_fft=256)
        self.aligner = HMMAligner()

    def compute_forward(self, batch, stage):
        feats = self.fbank(batch["wav_data"])
        enc, _ = self.modules.model(feats)
        return jax.nn.log_softmax(self.modules.lin(enc), axis=-1)

    def compute_objectives(self, predictions, batch, stage):
        mask = batch["batch_mask"]
        lens = batch["wav_data_lens"]
        phns = batch["phns_data"]
        phn_lens = batch["phns_data_lens"]
        T = predictions.shape[1]
        abs_T = jnp.maximum(jnp.round(lens * T), 1.0)
        if self.training_type == "forward":
            ll = self.aligner(predictions, lens, phns, phn_lens)
            per_frame = -ll / abs_T
        else:  # viterbi NLL via the traceable targets path
            targets = self.aligner.viterbi_targets(
                predictions, lens, phns, phn_lens
            )
            per_frame = nll_loss(
                predictions, targets, length=lens, reduction="batch"
            )
        if stage == Stage.TEST and hasattr(self, "ali_results"):
            # Eager path (evaluate_batch_full): list-returning Viterbi.
            real = int(np.asarray(mask).sum())
            _, alignments = self.aligner(
                predictions, lens, phns, phn_lens, dp="viterbi"
            )
            phns_np = np.asarray(phns)
            phn_lens_np = np.asarray(phn_lens)
            for b in range(real):
                n_seg = int(np.round(phn_lens_np[b] * phns_np.shape[1]))
                dedup = [alignments[b][0]]
                for s in alignments[b][1:]:
                    if s != dedup[-1]:
                        dedup.append(s)
                self.ali_results.append(
                    (dedup, phns_np[b, :n_seg].tolist())
                )
        return (per_frame * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def _run(training_type, epochs=25, lr=5e-3):
    import optax

    from speechbrain_tpu.nnet.linear import Linear
    from speechbrain_tpu.nnet.RNN import GRU
    from speechbrain_tpu.utils.epoch_loop import EpochCounter

    ds = _make_dataset()
    loader = SaveableDataLoader(ds, batch_size=5, shuffle=True)
    brain = AlignBrain(
        modules={
            "model": GRU(hidden_size=48, num_layers=1, bidirectional=True),
            "lin": Linear(n_neurons=len(TONE_FREQS)),
        },
        opt_class=lambda lr: optax.adam(lr),
        hparams={"lr": lr},
        run_opts={"seed": 5},
    )
    brain.training_type = training_type
    brain.fit(EpochCounter(epochs), loader)
    return brain, ds


@pytest.fixture(scope="module")
def forward_trained():
    return _run("forward")


def test_forward_loss_overfits(forward_trained):
    brain, _ = forward_trained
    # -log p per frame below ln(4) = chance over 4 states.
    assert brain.train_loss < 1.2


def test_viterbi_alignments_accurate(forward_trained):
    brain, ds = forward_trained
    loader = SaveableDataLoader(ds, batch_size=5)
    brain.ali_results = []
    for batch in loader:
        brain.evaluate_batch_full(batch, Stage.TEST)
    # Each deduped Viterbi path must visit exactly the phone sequence.
    correct = sum(1 for dedup, labels in brain.ali_results if dedup == labels)
    assert correct / len(brain.ali_results) >= 0.8


def test_viterbi_nll_overfits():
    brain, ds = _run("viterbi", epochs=15)
    assert brain.train_loss < 1.2
