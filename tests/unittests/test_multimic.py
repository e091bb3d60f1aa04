import numpy as np
import pytest

from speechbrain_tpu.processing.features import ISTFT, STFT
from speechbrain_tpu.processing.multi_mic import (
    Covariance,
    DelaySum,
    GccPhat,
    Gev,
    Mvdr,
)

SR = 16000


def _delayed_pair(delay=3, n=8192, seed=0):
    rng = np.random.default_rng(seed)
    sig = rng.normal(size=n + delay).astype(np.float32)
    x0 = sig[delay:]
    x1 = sig[:-delay] if delay else sig
    return np.stack([x0, x1], axis=1)[None]  # (1, T, 2)


def test_gcc_phat_recovers_delay():
    delay = 3
    wavs = _delayed_pair(delay)
    stft = STFT(SR, n_fft=256, win_length=16, hop_length=8)
    X = np.asarray(stft(wavs))  # (B, T, F, 2, C)
    cov = Covariance(average=True)(X)
    tdoas = np.asarray(GccPhat(tdoa_max=10)(cov))
    # mic1 lags mic0 by `delay` samples
    # pair (0,1) is triu entry 1; mic1 lags mic0 by `delay`
    assert abs(abs(tdoas[0, 0, 1]) - delay) < 0.5


def test_delay_sum_improves_alignment():
    delay = 4
    wavs = _delayed_pair(delay)
    stft = STFT(SR, n_fft=256, win_length=16, hop_length=8)
    istft = ISTFT(SR, n_fft=256, win_length=16, hop_length=8)
    X = np.asarray(stft(wavs))
    cov = Covariance(average=True)(X)
    tdoas = GccPhat(tdoa_max=10)(cov)
    Y = DelaySum()(X, tdoas)
    y = np.asarray(istft(Y[..., 0]))
    ref = wavs[0, :, 0]
    n = min(len(ref), y.shape[1]) - 500
    corr = np.corrcoef(y[0, 400:n], ref[400:n])[0, 1]
    assert corr > 0.9


def test_mvdr_runs():
    wavs = _delayed_pair(2)
    stft = STFT(SR, n_fft=256, win_length=16, hop_length=8)
    X = np.asarray(stft(wavs))
    cov = Covariance(average=True)(X)
    tdoas = GccPhat(tdoa_max=10)(cov)
    Y = np.asarray(Mvdr()(X, cov, tdoas))
    assert Y.shape == X.shape[:3] + (2, 1)
    assert np.isfinite(Y).all()


def test_gev_runs():
    wavs = _delayed_pair(2)
    noise = _delayed_pair(0, seed=9) * 0.1
    stft = STFT(SR, n_fft=256, win_length=16, hop_length=8)
    X = np.asarray(stft(wavs))
    N = np.asarray(stft(noise))
    SS = Covariance(average=True)(X)
    NN = Covariance(average=True)(N)
    Y = np.asarray(Gev()(X, SS, NN))
    assert Y.shape == X.shape[:3] + (2, 1)
    assert np.isfinite(Y).all()
