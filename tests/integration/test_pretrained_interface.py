"""Train -> save_for_pretrained -> from_hparams -> classify roundtrip.

Covers the inference layer (Pretrained base, fetching, yaml registry)
end to end on the speaker-id slice.
"""

import numpy as np
import pytest

from speechbrain_tpu.pretrained.interfaces import EncoderClassifier
from speechbrain_tpu.pretrained.training import save_for_pretrained

from .test_speaker_id import FREQS, SR, SpeakerBrain, _make_dataset


@pytest.fixture(scope="module")
def saved_model(tmp_path_factory):
    import optax

    from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
    from speechbrain_tpu.lobes.models.Xvector import Classifier, Xvector
    from speechbrain_tpu.utils.epoch_loop import EpochCounter

    savedir = tmp_path_factory.mktemp("pretrained_spkid")
    ds = _make_dataset()
    loader = SaveableDataLoader(ds, batch_size=6, shuffle=True)
    brain = SpeakerBrain(
        modules={
            "embedding_model": Xvector(
                tdnn_channels=(32, 32, 32, 32, 64), lin_neurons=32
            ),
            "classifier": Classifier(out_neurons=3, lin_neurons=32),
        },
        opt_class=lambda lr: optax.adam(lr),
        hparams={"lr": 5e-3},
        run_opts={"seed": 7},
    )
    brain.fit(EpochCounter(8), loader)
    save_for_pretrained(brain, str(savedir))
    # Write a hyperparams.yaml declaring the module graph.
    (savedir / "hyperparams.yaml").write_text(
        """
sample_rate: 16000
compute_features: !new:speechbrain_tpu.lobes.features.Fbank
    n_mels: 24
modules:
    embedding_model: !new:speechbrain_tpu.lobes.models.Xvector.Xvector
        tdnn_channels: !tuple [32, 32, 32, 32, 64]
        lin_neurons: 32
    classifier: !new:speechbrain_tpu.lobes.models.Xvector.Classifier
        out_neurons: 3
        lin_neurons: 32
"""
    )
    return brain, ds, str(savedir)


def test_pretrained_classify(saved_model, tmp_path):
    import jax.numpy as jnp

    brain, ds, savedir = saved_model
    clf = EncoderClassifier.from_hparams(
        source=savedir, savedir=str(tmp_path / "fetched")
    )
    correct = total = 0
    for i in range(len(ds)):
        ex = ds[i]
        wav = jnp.asarray(ex["wav_data"])[None]
        out_probs, score, index, _ = clf.classify_batch(wav)
        total += 1
        correct += int(int(index[0]) == ex["spk_id"])
    assert correct / total > 0.9


def test_pretrained_classify_file(saved_model, tmp_path):
    from speechbrain_tpu.dataio.dataio import write_audio

    brain, ds, savedir = saved_model
    clf = EncoderClassifier.from_hparams(
        source=savedir, savedir=str(tmp_path / "fetched2")
    )
    ex = ds[0]
    wav_path = str(tmp_path / "test.wav")
    write_audio(wav_path, ex["wav_data"], SR)
    out_probs, score, index, _ = clf.classify_file(wav_path)
    assert int(index[0]) == ex["spk_id"]


def test_encoder_decoder_asr_longform(tmp_path):
    """EncoderDecoderASR: batch detokenization + long-form chunked
    transcribe_file (overlapped fixed windows, one padded batch)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.dataio.dataio import write_audio
    from speechbrain_tpu.pretrained.interfaces import EncoderDecoderASR

    class Enc(nn.Module):
        @nn.compact
        def __call__(self, x, lens=None, train=False):
            if x.ndim == 2:
                x = x[..., None]
            return nn.Dense(4)(x[:, ::1600])

    class FakeTokenizer:
        def __call__(self, batch, task="encode"):
            assert task == "decode_from_list"
            return [" ".join(f"w{int(t)}" for t in row) for row in batch]

    class FakeSearcher:
        def __call__(self, enc, lens):
            B = enc.shape[0]
            hyps = [[i + 1, i + 2] for i in range(B)]
            return hyps, np.zeros(B)

    enc = Enc()
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 16000)))
    asr = EncoderDecoderASR(
        modules={"encoder": enc},
        params={"encoder": params},
        hparams={
            "tokenizer": FakeTokenizer(),
            "make_decoder": lambda iface: FakeSearcher(),
            "sample_rate": 16000,
        },
    )
    wav = 0.1 * np.sin(np.arange(16000 * 5) / 30.0).astype(np.float32)
    path = str(tmp_path / "long.wav")
    write_audio(path, wav, 16000)

    # single pass
    text = asr.transcribe_file(path)
    assert text == "w1 w2"
    # long form: 5 s at 2 s windows -> 3 chunks, one batch, joined
    text = asr.transcribe_file(path, chunk_size_s=2.0)
    assert text == "w1 w2 w2 w3 w3 w4"


def test_encoder_asr_longform(tmp_path):
    """EncoderASR (CTC): batched detokenization + long-form chunked
    transcribe_file, mirroring the EncoderDecoderASR scheme."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from speechbrain_tpu.dataio.dataio import write_audio
    from speechbrain_tpu.pretrained.interfaces import EncoderASR

    V = 5  # blank=0 plus tokens 1..4

    class Enc(nn.Module):
        """Alternating tokens per frame: even frames t1, odd frames t2.

        With 1600-sample frames, every audio frame emits exactly one
        non-blank token, so the long-form path's exact context
        trimming is observable as "total tokens == total frames"."""

        @nn.compact
        def __call__(self, x, lens=None, train=False):
            if x.ndim == 2:
                x = x[..., None]
            frames = x[:, ::1600, 0]  # (B, T')
            Tf = frames.shape[1]
            logits = jnp.full(frames.shape + (V,), -10.0)
            tok = 1 + (jnp.arange(Tf) % 2)  # t1, t2, t1, ...
            logits = logits.at[
                :, jnp.arange(Tf), tok
            ].set(10.0)
            return jax.nn.log_softmax(logits, -1)

    class FakeTokenizer:
        def __init__(self):
            self.calls = 0

        def __call__(self, batch, task="encode"):
            assert task == "decode_from_list"
            self.calls += 1
            return [" ".join(f"t{int(t)}" for t in row) for row in batch]

    enc = Enc()
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 16000)))
    tok = FakeTokenizer()
    asr = EncoderASR(
        modules={"encoder": enc},
        params={"encoder": params},
        hparams={
            "tokenizer": tok,
            "blank_index": 0,
            "sample_rate": 16000,
        },
    )
    wav = 0.1 * np.sin(np.arange(16000 * 5) / 30.0).astype(np.float32)
    path = str(tmp_path / "long.wav")
    write_audio(path, wav, 16000)

    # single pass: 50 frames, alternating t1/t2 (repeats never merge)
    text = asr.transcribe_file(path)
    assert text == " ".join(f"t{1 + (f % 2)}" for f in range(50))
    assert tok.calls == 1  # ONE detokenizer call for the whole batch
    # long form: 5 s at 2 s windows, 0.5 s left context -> 3 chunks,
    # one padded batch (T=40000 -> 25 frames/row).  The CTC path trims
    # the context frames exactly, so every audio frame is decoded once:
    # chunk windows (ctx_frames, valid_frames) = (0,20), (5,25), (5,15)
    # and total tokens == 50 == total frames, no seam duplication.
    text = asr.transcribe_file(path, chunk_size_s=2.0)
    expected = []
    for ctx_f, valid_f in [(0, 20), (5, 25), (5, 15)]:
        expected += [f"t{1 + (f % 2)}" for f in range(ctx_f, valid_f)]
    assert text == " ".join(expected)
    assert len(text.split()) == 50
    assert tok.calls == 2
