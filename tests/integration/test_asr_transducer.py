"""End-to-end transducer slice: encoder + prediction net + joint +
RNN-T loss (associative-scan backend) + vectorized greedy decode.

Mirrors reference ``tests/integration/ASR_Transducer``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechbrain_tpu.core import Brain, Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.decoders.transducer import TransducerBeamSearcher
from speechbrain_tpu.lobes.features import Fbank
from speechbrain_tpu.nnet.losses import transducer_loss

SR = 8000
TONE_FREQS = [300.0, 800.0, 1800.0, 3000.0]
BLANK = 0
VOCAB = 1 + len(TONE_FREQS)


def _make_dataset(n_utts=10, seed=5):
    rng = np.random.default_rng(seed)
    data = {}
    for i in range(n_utts):
        n_tones = int(rng.integers(2, 4))
        labels = rng.integers(0, len(TONE_FREQS), size=n_tones)
        segs = []
        for lab in labels:
            t = np.arange(int(0.12 * SR)) / SR
            segs.append(0.5 * np.sin(2 * np.pi * TONE_FREQS[lab] * t))
        wav = np.concatenate(segs).astype(np.float32)
        wav += 0.01 * rng.normal(size=len(wav)).astype(np.float32)
        tokens = (labels + 1).astype(np.int64)
        data[f"u{i}"] = {
            "wav_data": wav,
            "tokens_data": tokens,
            # prediction-network input: blank-prepended tokens
            "tokens_blank": np.concatenate([[BLANK], tokens]).astype(
                np.int64
            ),
        }
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "wav_data", "tokens_data", "tokens_blank"])
    return ds


class TransducerBrain(Brain):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.fbank = Fbank(n_mels=24, sample_rate=SR, n_fft=256)

    def compute_forward(self, batch, stage):
        feats = self.fbank(batch["wav_data"])
        enc = self.modules.enc(feats, lengths=batch["wav_data_lens"])
        enc = self.modules.enc_lin(enc)
        emb = self.modules.emb(batch["tokens_blank"])
        pred, _ = self.modules.dec(emb)
        pred = self.modules.dec_lin(pred)
        # Joint: broadcast sum -> (B, T, U+1, H) -> vocab logits
        joint = jnp.tanh(enc[:, :, None, :] + pred[:, None, :, :])
        return self.modules.out_lin(joint)

    def compute_objectives(self, predictions, batch, stage):
        return transducer_loss(
            predictions,
            batch["tokens_data"],
            batch["wav_data_lens"] * batch["batch_mask"],
            batch["tokens_data_lens"] * batch["batch_mask"],
            blank_index=BLANK,
            use_pallas=False,
        )


@pytest.fixture(scope="module")
def trained():
    import optax

    from speechbrain_tpu.lobes.models.CRDNN import CRDNN
    from speechbrain_tpu.nnet.RNN import GRU
    from speechbrain_tpu.nnet.embedding import Embedding
    from speechbrain_tpu.nnet.linear import Linear
    from speechbrain_tpu.utils.epoch_loop import EpochCounter

    ds = _make_dataset()
    loader = SaveableDataLoader(ds, batch_size=5, shuffle=True)
    brain = TransducerBrain(
        modules={
            "enc": CRDNN(
                cnn_blocks=1, cnn_channels=(8,),
                inter_layer_pooling_size=(2,), rnn_class="gru",
                rnn_layers=1, rnn_neurons=32, dnn_blocks=1,
                dnn_neurons=32, dropout=0.0,
            ),
            "enc_lin": Linear(n_neurons=32),
            "emb": Embedding(num_embeddings=VOCAB, embedding_dim=8),
            "dec": GRU(hidden_size=32, num_layers=1),
            "dec_lin": Linear(n_neurons=32),
            "out_lin": Linear(n_neurons=VOCAB),
        },
        opt_class=lambda lr: __import__("optax").adam(lr),
        hparams={"lr": 8e-3},
        run_opts={"seed": 13},
    )
    brain.fit(EpochCounter(80), loader)
    return brain, ds


def test_transducer_overfits(trained):
    brain, ds = trained
    assert brain.train_loss < 2.0


def test_transducer_greedy_decode(trained):
    brain, ds = trained
    loader = SaveableDataLoader(ds, batch_size=5)
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
        enc = brain.modules.enc(feats, lengths=db["wav_data_lens"])
        enc = brain.modules.enc_lin(enc)

        # Single-step prediction net with a FIXED-SIZE history buffer
        # (static shapes for the greedy lax.scan): re-runs the GRU over
        # the buffer and reads the output at the current position.
        U_MAX = 8

        def pred_step_hist(tokens, state, batch_n):
            if state is None or tokens is None:
                hist = jnp.full((batch_n, U_MAX), BLANK, jnp.int32)
                n = jnp.zeros((batch_n,), jnp.int32)
            else:
                hist, n = state["hist"], state["n"]
                # hist[0] is the training-time blank prefix; emission k
                # goes to position k+1 and we read the output at n+1.
                hist = jnp.where(
                    (jnp.arange(U_MAX)[None, :] == (n + 1)[:, None]),
                    tokens[:, None],
                    hist,
                )
                n = jnp.minimum(n + 1, U_MAX - 1)
            emb = brain.modules.emb(hist)
            out, _ = brain.modules.dec(emb)
            out = brain.modules.dec_lin(out)
            cur = jnp.take_along_axis(
                out, n[:, None, None], axis=1
            )[:, 0]
            return cur, {"hist": hist, "n": n}

        def joint(enc_t, pred_out):
            j = jnp.tanh(enc_t + pred_out)
            return brain.modules.out_lin(j[:, None])[:, 0]

        searcher = TransducerBeamSearcher(
            decode_fn=pred_step_hist, joint_fn=joint, blank_id=BLANK,
            beam_size=1,
        )
        hyps, _ = searcher(enc, db["wav_data_lens"])
        real = len(batch)
        for hyp, tgt, tlen in zip(
            hyps[:real],
            np.asarray(batch.tokens_data.data),
            np.asarray(batch.tokens_data.lengths),
        ):
            tgt_seq = tgt[: int(round(tlen * tgt.shape[0]))].tolist()
            total += 1
            correct += int(hyp == tgt_seq)
    assert correct / total >= 0.6
