import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speechbrain_tpu.processing.features import (
    DCT,
    STFT,
    ISTFT,
    ContextWindow,
    Deltas,
    Filterbank,
    GlobalNormState,
    InputNormalization,
    spectral_magnitude,
)
from speechbrain_tpu.processing.speech_augmentation import (
    DropChunk,
    Resample,
    SpeedPerturb,
)


@pytest.fixture(scope="module")
def sine_wav():
    sr = 16000
    t = np.arange(sr) / sr
    return (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None], sr


def test_stft_shape(sine_wav):
    wav, sr = sine_wav
    stft = STFT(sample_rate=sr, win_length=25, hop_length=10, n_fft=400)
    out = stft(wav)
    assert out.shape == (1, 101, 201, 2)


def test_stft_peak_bin(sine_wav):
    wav, sr = sine_wav
    stft = STFT(sample_rate=sr)
    mag = spectral_magnitude(stft(wav))
    peak_bin = int(jnp.argmax(mag[0, 50]))
    # 440 Hz with 400-point FFT at 16 kHz -> bin 11
    assert abs(peak_bin - 11) <= 1


def test_stft_mxu_bf16_close_to_f32(sine_wav):
    # bf16-multiply/f32-accumulate DFT stays within input-rounding
    # error of the f32 path (the TPU fast path's precision contract).
    wav, sr = sine_wav
    f32 = STFT(sample_rate=sr)(wav)
    bf16 = STFT(sample_rate=sr, mxu_dtype="bfloat16")(wav)
    mag = np.abs(np.asarray(f32))
    err = np.abs(np.asarray(f32) - np.asarray(bf16))
    assert float(err.max()) <= 1e-2 * float(mag.max()) + 1e-3


def test_istft_reconstruction(sine_wav):
    wav, sr = sine_wav
    stft = STFT(sample_rate=sr)
    istft = ISTFT(sample_rate=sr)
    rec = istft(stft(wav), sig_length=wav.shape[1])
    err = np.abs(np.asarray(rec)[0, 400:-400] - wav[0, 400:-400]).max()
    assert err < 1e-4


def test_fbank_pipeline(sine_wav):
    wav, sr = sine_wav
    stft = STFT(sample_rate=sr)
    fb = Filterbank(n_mels=40, n_fft=400)
    feats = fb(spectral_magnitude(stft(wav), power=1))
    assert feats.shape == (1, 101, 40)
    assert np.isfinite(np.asarray(feats)).all()


def test_dct_orthonormal():
    dct = DCT(input_size=40, n_out=40)
    mat = np.asarray(dct.mat)
    eye = mat.T @ mat
    assert np.abs(eye - np.eye(40)).max() < 1e-4


def test_deltas_constant_zero():
    deltas = Deltas(window_length=5)
    x = jnp.ones((1, 20, 10))
    out = deltas(x)
    assert out.shape == x.shape
    assert np.abs(np.asarray(out)).max() < 1e-6


def test_context_window():
    cw = ContextWindow(left_frames=2, right_frames=2)
    x = jnp.ones((1, 10, 4))
    out = cw(x)
    assert out.shape == (1, 10, 20)


def test_input_norm_sentence():
    norm = InputNormalization(norm_type="sentence")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 50, 8)) * 3 + 1
    y = norm(x, jnp.ones(2))
    m = np.asarray(y).mean(axis=1)
    assert np.abs(m).max() < 1e-4


def test_input_norm_global_state():
    norm = InputNormalization(norm_type="global")
    state = GlobalNormState.init(8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 50, 8)) * 2 + 5
    y, state = norm(x, jnp.ones(2), state)
    assert float(state["count"]) == 1.0  # one training batch seen
    assert np.abs(np.asarray(state["mean"]) - 5).max() < 0.5
    # After update_until_epoch, stats freeze (count still advances)
    y2, state2 = norm(x * 100, jnp.ones(2), state, epoch=10)
    assert np.allclose(np.asarray(state2["mean"]), np.asarray(state["mean"]))
    assert np.allclose(np.asarray(state2["std"]), np.asarray(state["std"]))


def test_input_norm_respects_padding():
    norm = InputNormalization(norm_type="sentence")
    x = jnp.concatenate(
        [jnp.ones((1, 25, 4)), 100 * jnp.ones((1, 25, 4))], axis=1
    )
    y_full = norm(x, jnp.ones(1))
    y_half = norm(x, jnp.array([0.5]))  # padding ignored in stats
    # With only the first half valid (constant ones), variance ~ 0
    assert np.abs(np.asarray(y_half)[0, :25]).max() < 1.0


def test_resample_downsample_shape():
    r = Resample(orig_freq=16000, new_freq=8000)
    out = r(jnp.ones((2, 1600)))
    assert out.shape == (2, 800)


def test_resample_preserves_sine(sine_wav):
    wav, sr = sine_wav
    r = Resample(orig_freq=sr, new_freq=sr // 2)
    y = np.asarray(r(wav))
    ref = 0.5 * np.sin(2 * np.pi * 440 * np.arange(sr // 2) / (sr // 2))
    assert np.abs(y[0, 100:-100] - ref[100:-100]).max() < 1e-3


def test_speed_perturb_fixed_shape():
    sp = SpeedPerturb(16000, speeds=[90, 100, 110])
    wav = jnp.ones((2, 1600))
    out, lens = sp(wav, jnp.ones(2), jax.random.PRNGKey(0))
    assert out.shape == (2, 1600)
    assert np.all(np.asarray(lens) <= 1.0)


def test_drop_chunk_masks():
    drop = DropChunk(drop_length_low=10, drop_length_high=50)
    out = drop(jnp.ones((2, 1000)), jnp.ones(2), jax.random.PRNGKey(1))
    zeros = float((np.asarray(out) == 0).sum())
    assert zeros > 0


def test_frontend_is_jittable(sine_wav):
    wav, sr = sine_wav
    stft = STFT(sample_rate=sr)
    fb = Filterbank(n_mels=40, n_fft=400)

    @jax.jit
    def frontend(x):
        return fb(spectral_magnitude(stft(x), power=1))

    out = frontend(jnp.asarray(wav))
    assert out.shape == (1, 101, 40)
