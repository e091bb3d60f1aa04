"""End-to-end CTC ASR slice: tone sequences -> label sequences.

Adds CTC loss, CRDNN/LiGRU encoder, greedy decode and ErrorRateStats to
the covered path (mirrors reference ``tests/integration/ASR_CTC``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from speechbrain_tpu.core import Brain, Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.decoders.ctc import ctc_greedy_decode
from speechbrain_tpu.lobes.features import Fbank
from speechbrain_tpu.lobes.models.CRDNN import CRDNN
from speechbrain_tpu.nnet.losses import ctc_loss
from speechbrain_tpu.utils.metric_stats import ErrorRateStats

SR = 8000
TONE_FREQS = [300.0, 800.0, 1800.0, 3000.0]  # 4 "phonemes"
BLANK = 0  # labels are 1..4


def _make_dataset(n_utts=12, seed=0):
    rng = np.random.default_rng(seed)
    data = {}
    for i in range(n_utts):
        n_tones = int(rng.integers(2, 5))
        # no adjacent repeats: repeated labels need a learned blank
        # separator, which small overfit runs get wrong occasionally
        labels = [int(rng.integers(0, len(TONE_FREQS)))]
        while len(labels) < n_tones:
            nxt = int(rng.integers(0, len(TONE_FREQS)))
            if nxt != labels[-1]:
                labels.append(nxt)
        labels = np.asarray(labels)
        segs = []
        for lab in labels:
            dur = 0.12
            t = np.arange(int(dur * SR)) / SR
            segs.append(
                0.5 * np.sin(2 * np.pi * TONE_FREQS[lab] * t)
            )
        wav = np.concatenate(segs).astype(np.float32)
        wav += 0.01 * rng.normal(size=len(wav)).astype(np.float32)
        data[f"u{i}"] = {
            "wav_data": wav,
            "tokens_data": (labels + 1).astype(np.int64),  # 0 is blank
        }
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "wav_data", "tokens_data"])
    return ds


class CTCBrain(Brain):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.fbank = Fbank(n_mels=24, sample_rate=SR, n_fft=256)

    def compute_forward(self, batch, stage):
        import jax

        feats = self.fbank(batch["wav_data"])
        enc = self.modules.model(feats, lengths=batch["wav_data_lens"])
        logits = self.modules.lin(enc)
        return jax.nn.log_softmax(logits, axis=-1)

    def compute_objectives(self, predictions, batch, stage):
        loss = ctc_loss(
            predictions,
            batch["tokens_data"],
            batch["wav_data_lens"] * batch["batch_mask"],
            batch["tokens_data_lens"] * batch["batch_mask"],
            blank_index=BLANK,
        )
        if stage != Stage.TRAIN and hasattr(self, "per_metrics"):
            real = int(np.asarray(batch["batch_mask"]).sum())
            hyps = ctc_greedy_decode(
                predictions, batch["wav_data_lens"], blank_id=BLANK
            )[:real]
            self.per_metrics.append(
                ids=[str(i) for i in range(real)],
                predict=hyps,
                target=np.asarray(batch["tokens_data"])[:real].tolist(),
                target_len=np.asarray(batch["tokens_data_lens"])[:real],
            )
        return loss


@pytest.fixture(scope="module")
def trained():
    import optax

    from speechbrain_tpu.nnet.linear import Linear
    from speechbrain_tpu.utils.epoch_loop import EpochCounter

    ds = _make_dataset()
    loader = SaveableDataLoader(ds, batch_size=4, shuffle=True)
    brain = CTCBrain(
        modules={
            "model": CRDNN(
                cnn_blocks=1,
                cnn_channels=(16,),
                inter_layer_pooling_size=(2,),
                rnn_class="ligru",
                rnn_layers=1,
                rnn_neurons=64,
                dnn_blocks=1,
                dnn_neurons=64,
                dropout=0.0,
            ),
            "lin": Linear(n_neurons=len(TONE_FREQS) + 1),
        },
        opt_class=lambda lr: optax.adam(lr),
        hparams={"lr": 3e-3},
        run_opts={"seed": 11},
    )
    brain.fit(EpochCounter(30), loader)
    return brain, ds


def test_ctc_overfits(trained):
    brain, ds = trained
    assert brain.train_loss < 1.0


def test_greedy_decode_per(trained):
    brain, ds = trained
    loader = SaveableDataLoader(ds, batch_size=4)
    brain.per_metrics = ErrorRateStats()
    total = 0.0
    steps = 0
    for batch in loader:
        loss = brain.evaluate_batch_full(batch, Stage.VALID)
        total += loss
        steps += 1
    per = brain.per_metrics.summarize("error_rate")
    assert per < 25.0
