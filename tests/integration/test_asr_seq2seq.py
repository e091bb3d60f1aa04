"""End-to-end attention seq2seq slice: CRDNN encoder + attentional GRU
decoder + joint NLL training, greedy decode at eval.

Mirrors reference ``tests/integration/ASR_seq2seq``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechbrain_tpu.core import Brain, Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.decoders.seq2seq import S2SRNNGreedySearcher
from speechbrain_tpu.lobes.features import Fbank
from speechbrain_tpu.nnet.losses import nll_loss

SR = 8000
TONE_FREQS = [300.0, 800.0, 1800.0, 3000.0]
# tokens: 0=bos, 1=eos, labels are 2..5
BOS, EOS = 0, 1
VOCAB = 2 + len(TONE_FREQS)


def _make_dataset(n_utts=12, seed=3):
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
        tokens = labels + 2
        data[f"u{i}"] = {
            "wav_data": wav,
            # teacher-forcing input: bos + tokens; target: tokens + eos
            "tokens_bos": np.concatenate([[BOS], tokens]).astype(np.int64),
            "tokens_eos": np.concatenate([tokens, [EOS]]).astype(np.int64),
        }
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "wav_data", "tokens_bos", "tokens_eos"])
    return ds


class Seq2SeqBrain(Brain):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.fbank = Fbank(n_mels=24, sample_rate=SR, n_fft=256)

    def compute_forward(self, batch, stage):
        feats = self.fbank(batch["wav_data"])
        enc = self.modules.enc(feats, lengths=batch["wav_data_lens"])
        emb = self.modules.emb(batch["tokens_bos"])
        dec_out, attn = self.modules.dec(
            emb, enc, batch["wav_data_lens"]
        )
        logits = self.modules.seq_lin(dec_out)
        return jax.nn.log_softmax(logits, axis=-1), enc

    def compute_objectives(self, predictions, batch, stage):
        log_probs, enc = predictions
        return nll_loss(
            log_probs,
            batch["tokens_eos"],
            length=batch["tokens_eos_lens"] * batch["batch_mask"],
        )


@pytest.fixture(scope="module")
def trained():
    import optax

    from speechbrain_tpu.lobes.models.CRDNN import CRDNN
    from speechbrain_tpu.nnet.RNN import AttentionalRNNDecoder
    from speechbrain_tpu.nnet.embedding import Embedding
    from speechbrain_tpu.nnet.linear import Linear
    from speechbrain_tpu.utils.epoch_loop import EpochCounter

    ds = _make_dataset()
    loader = SaveableDataLoader(ds, batch_size=4, shuffle=True)
    brain = Seq2SeqBrain(
        modules={
            "enc": CRDNN(
                cnn_blocks=1, cnn_channels=(8,),
                inter_layer_pooling_size=(2,), rnn_class="gru",
                rnn_layers=1, rnn_neurons=32, dnn_blocks=1,
                dnn_neurons=32, dropout=0.0,
            ),
            "emb": Embedding(num_embeddings=VOCAB, embedding_dim=16),
            "dec": AttentionalRNNDecoder(
                rnn_type="gru", attn_type="content", hidden_size=32,
                attn_dim=32, num_layers=1,
            ),
            "seq_lin": Linear(n_neurons=VOCAB),
        },
        opt_class=lambda lr: __import__("optax").adam(lr),
        hparams={"lr": 5e-3},
        run_opts={"seed": 5},
    )
    brain.fit(EpochCounter(40), loader)
    return brain, ds


def test_seq2seq_overfits(trained):
    brain, ds = trained
    assert brain.train_loss < 0.5


def test_greedy_search_decodes(trained):
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
        enc = brain.modules.enc(feats, lengths=db["wav_data_lens"])

        searcher = S2SRNNGreedySearcher(
            embedding_fn=lambda toks: brain.modules.emb(toks),
            decoder_step_fn=lambda e, hs, c, es, el, ast: brain.modules.dec(
                e, hs, c, es, el, ast, method="forward_step"
            ),
            linear_fn=lambda d: jax.nn.log_softmax(
                brain.modules.seq_lin(d[:, None])[:, 0], axis=-1
            ),
            dec_hidden_size=32,
            attn_init_fn=lambda es: brain.modules.dec(
                es, method="attn_init"
            ),
            rnn_init_fn=lambda n, dtype: jnp.zeros((1, n, 32), dtype),
            bos_index=BOS,
            eos_index=EOS,
            min_decode_ratio=0.0,
            max_decode_ratio=0.5,
        )
        hyps, scores = searcher(enc, db["wav_data_lens"])
        real = len(batch)
        for hyp, tgt, tlen in zip(
            hyps[:real],
            np.asarray(batch.tokens_eos.data),
            np.asarray(batch.tokens_eos.lengths),
        ):
            tgt_seq = tgt[: int(round(tlen * tgt.shape[0]))][:-1].tolist()
            total += 1
            correct += int(hyp == tgt_seq)
    assert correct / total > 0.6
