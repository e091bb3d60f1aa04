"""VAD slice: train a frame classifier on synthetic speech/silence and
run the chunked-inference interface pipeline (mirrors reference
``tests/integration/VAD``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechbrain_tpu.core import Brain, Stage
from speechbrain_tpu.dataio.dataloader import SaveableDataLoader
from speechbrain_tpu.dataio.dataset import DynamicItemDataset
from speechbrain_tpu.nnet.losses import bce_loss

SR = 8000
CHUNK = int(0.4 * SR)  # training chunks: 0.4 s


def _make_dataset(n=16, seed=0):
    """Half the chunks are tone+noise ("speech"), half pure low noise."""
    rng = np.random.default_rng(seed)
    data = {}
    t = np.arange(CHUNK) / SR
    for i in range(n):
        speech = i % 2 == 0
        if speech:
            f = rng.uniform(200, 2000)
            wav = 0.4 * np.sin(2 * np.pi * f * t) + 0.02 * rng.normal(
                size=CHUNK
            )
        else:
            wav = 0.02 * rng.normal(size=CHUNK)
        data[f"c{i}"] = {
            "wav_data": wav.astype(np.float32),
            "label": float(speech),
        }
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id", "wav_data", "label"])
    return ds


class VADBrain(Brain):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        from speechbrain_tpu.lobes.features import Fbank

        self.fbank = Fbank(n_mels=24, sample_rate=SR, n_fft=256)

    def compute_forward(self, batch, stage):
        feats = self.fbank(batch["wav_data"])
        out = self.modules.model(feats, lengths=batch["wav_data_lens"])
        return self.modules.out_lin(out).mean(axis=1)[:, 0]  # chunk logit

    def compute_objectives(self, predictions, batch, stage):
        return bce_loss(
            predictions[:, None],
            batch["label"][:, None],
            length=batch["batch_mask"],
        )


@pytest.fixture(scope="module")
def trained():
    import optax

    from speechbrain_tpu.lobes.models.CRDNN import CRDNN
    from speechbrain_tpu.nnet.linear import Linear
    from speechbrain_tpu.utils.epoch_loop import EpochCounter

    ds = _make_dataset()
    brain = VADBrain(
        modules={
            "model": CRDNN(
                cnn_blocks=1, cnn_channels=(8,),
                inter_layer_pooling_size=(2,), rnn_class="gru",
                rnn_layers=1, rnn_neurons=16, dnn_blocks=1,
                dnn_neurons=16, dropout=0.0,
            ),
            "out_lin": Linear(n_neurons=1),
        },
        opt_class=lambda lr: optax.adam(lr),
        hparams={"lr": 5e-3},
        run_opts={"seed": 3},
    )
    brain.fit(
        EpochCounter(15),
        SaveableDataLoader(ds, batch_size=8, shuffle=True),
    )
    return brain, ds


def test_vad_overfits(trained):
    brain, ds = trained
    assert brain.train_loss < 0.3


def test_vad_interface_pipeline(trained, tmp_path):
    """End-to-end: long file -> speech segments via the VAD interface."""
    from speechbrain_tpu.dataio.dataio import write_audio
    from speechbrain_tpu.pretrained.interfaces import VAD
    from speechbrain_tpu.pretrained.training import save_for_pretrained

    brain, ds = trained
    savedir = tmp_path / "vad_model"
    save_for_pretrained(brain, str(savedir))
    # Long audio: silence | speech | silence | speech | silence
    rng = np.random.default_rng(1)
    sec = lambda s: int(s * SR)  # noqa: E731
    t1 = np.arange(sec(1.0)) / SR
    speech1 = 0.4 * np.sin(2 * np.pi * 500 * t1)
    speech2 = 0.4 * np.sin(2 * np.pi * 1200 * t1)
    sil = 0.02 * rng.normal(size=sec(1.0))
    audio = np.concatenate(
        [sil, speech1, sil, speech2, sil]
    ).astype(np.float32)
    wav_path = str(tmp_path / "long.wav")
    write_audio(wav_path, audio, SR)

    class ChunkVAD(VAD):
        MODULES_NEEDED = ["model", "out_lin"]

        def get_speech_prob_chunk(self, wavs, wav_lens=None):
            import jax as _jax
            import jax.numpy as _jnp

            wavs = _jnp.asarray(wavs)
            if wav_lens is None:
                wav_lens = _jnp.ones(wavs.shape[0])
            feats = brain.fbank(wavs)
            out = self._apply("model", feats, lengths=wav_lens)
            logit = self._apply("out_lin", out).mean(axis=1)
            return _jax.nn.sigmoid(logit)

    vad = ChunkVAD(
        modules=brain._module_defs,
        hparams={
            "sample_rate": SR,
            "time_resolution": 0.4,  # one prob per 0.4s chunk
        },
        params={
            name: {
                "params": jax.device_get(
                    brain.train_state["params"][name]
                ),
                **jax.device_get(
                    brain.train_state["model_state"].get(name, {})
                ),
            }
            for name in brain._module_defs
        },
    )
    boundaries = vad.get_speech_segments(
        wav_path,
        large_chunk_size=5,
        small_chunk_size=0.4,
        activation_th=0.5,
        deactivation_th=0.4,
        close_th=0.3,
        len_th=0.3,
    )
    # Two speech regions near [1,2] and [3,4] seconds.
    assert len(boundaries) == 2
    assert abs(boundaries[0][0] - 1.0) < 0.5
    assert abs(boundaries[1][0] - 3.0) < 0.5
