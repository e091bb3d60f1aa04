"""Flagship slice: conformer encoder, joint CTC/attention training,
transformer beam search decoding with CTC joint scoring.

Mirrors the LibriSpeech conformer recipe structure (SURVEY.md §8.7) at
toy scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechbrain_tpu.core import Brain, Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.decoders.seq2seq import S2STransformerBeamSearch
from speechbrain_tpu.lobes.features import Fbank
from speechbrain_tpu.nnet.losses import ctc_loss, kldiv_loss

SR = 8000
TONE_FREQS = [300.0, 800.0, 1800.0, 3000.0]
# tokens: 0=blank, 1=bos/eos, labels 2..5
BLANK, BOSEOS = 0, 1
VOCAB = 2 + len(TONE_FREQS)
CTC_WEIGHT = 0.3


def _make_dataset(n_utts=12, seed=7):
    rng = np.random.default_rng(seed)
    data = {}
    for i in range(n_utts):
        n_tones = int(rng.integers(2, 4))
        labels = [int(rng.integers(0, len(TONE_FREQS)))]
        while len(labels) < n_tones:
            nxt = int(rng.integers(0, len(TONE_FREQS)))
            if nxt != labels[-1]:
                labels.append(nxt)
        labels = np.asarray(labels)
        segs = []
        for lab in labels:
            t = np.arange(int(0.12 * SR)) / SR
            segs.append(0.5 * np.sin(2 * np.pi * TONE_FREQS[lab] * t))
        wav = np.concatenate(segs).astype(np.float32)
        wav += 0.01 * rng.normal(size=len(wav)).astype(np.float32)
        tokens = labels + 2
        data[f"u{i}"] = {
            "wav_data": wav,
            "tokens_data": tokens.astype(np.int64),
            "tokens_bos": np.concatenate([[BOSEOS], tokens]).astype(np.int64),
            "tokens_eos": np.concatenate([tokens, [BOSEOS]]).astype(np.int64),
        }
    ds = DynamicItemDataset(data)
    ds.set_output_keys(
        ["id", "wav_data", "tokens_data", "tokens_bos", "tokens_eos"]
    )
    return ds


class ConformerBrain(Brain):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.fbank = Fbank(n_mels=24, sample_rate=SR, n_fft=256)

    def compute_forward(self, batch, stage):
        feats = self.fbank(batch["wav_data"])
        enc, dec = self.modules.transformer(
            feats, batch["tokens_bos"], wav_len=batch["wav_data_lens"],
            pad_idx=BLANK,
        )
        ctc_logp = jax.nn.log_softmax(self.modules.ctc_lin(enc), axis=-1)
        seq_logp = jax.nn.log_softmax(self.modules.seq_lin(dec), axis=-1)
        return ctc_logp, seq_logp

    def compute_objectives(self, predictions, batch, stage):
        ctc_logp, seq_logp = predictions
        mask = batch["batch_mask"]
        loss_ctc = ctc_loss(
            ctc_logp,
            batch["tokens_data"],
            batch["wav_data_lens"] * mask,
            batch["tokens_data_lens"] * mask,
            blank_index=BLANK,
        )
        loss_seq = kldiv_loss(
            seq_logp,
            batch["tokens_eos"],
            length=batch["tokens_eos_lens"] * mask,
        )
        return CTC_WEIGHT * loss_ctc + (1 - CTC_WEIGHT) * loss_seq


@pytest.fixture(scope="module")
def trained():
    import optax

    from speechbrain_tpu.lobes.models.transformer.TransformerASR import (
        TransformerASR,
    )
    from speechbrain_tpu.nnet.linear import Linear
    from speechbrain_tpu.utils.epoch_loop import EpochCounter

    ds = _make_dataset()
    loader = SaveableDataLoader(ds, batch_size=4, shuffle=True)
    brain = ConformerBrain(
        modules={
            "transformer": TransformerASR(
                tgt_vocab=VOCAB, input_size=24, d_model=32, nhead=4,
                num_encoder_layers=2, num_decoder_layers=1, d_ffn=64,
                dropout=0.0, encoder_module="conformer",
                attention_type="RelPosMHAXL", kernel_size=7,
            ),
            "ctc_lin": Linear(n_neurons=VOCAB),
            "seq_lin": Linear(n_neurons=VOCAB),
        },
        opt_class=lambda lr: optax.adam(lr),
        hparams={"lr": 3e-3},
        run_opts={"seed": 3},
    )
    brain.fit(EpochCounter(60), loader)
    return brain, ds


def test_conformer_overfits(trained):
    brain, ds = trained
    assert brain.train_loss < 1.0


def test_transformer_beam_search(trained):
    brain, ds = trained
    loader = SaveableDataLoader(ds, batch_size=4)
    correct = total = 0
    for batch in loader:
        db = brain.prepare_batch(batch)
        rngs = brain._make_step_rngs(brain._next_rng())
        brain._bind(
            brain.train_state["params"],
            brain.train_state["model_state"],
            brain.train_state["extra"],
            rngs,
            train=False,
        )
        feats = brain.fbank(db["wav_data"])
        enc = brain.modules.transformer(
            feats, db["wav_data_lens"], method="encode"
        )

        searcher = S2STransformerBeamSearch(
            decode_fn=lambda prefix, e, el: brain.modules.transformer(
                prefix, e, el, method="decode"
            )[0],
            linear_fn=lambda d: brain.modules.seq_lin(d[:, None])[:, 0],
            ctc_linear_fn=lambda e: brain.modules.ctc_lin(e),
            bos_index=BOSEOS,
            eos_index=BOSEOS,
            min_decode_ratio=0.0,
            max_decode_ratio=0.3,
            beam_size=4,
            using_eos_threshold=False,
            length_normalization=True,
            ctc_weight=0.4,
            blank_index=BLANK,
        )
        hyps, scores = searcher(enc, db["wav_data_lens"])
        real = len(batch)
        for hyp, tgt, tlen in zip(
            hyps[:real],
            np.asarray(batch.tokens_data.data),
            np.asarray(batch.tokens_data.lengths),
        ):
            tgt_seq = tgt[: int(round(tlen * tgt.shape[0]))].tolist()
            total += 1
            correct += int(hyp == tgt_seq)
    assert correct / total > 0.7
