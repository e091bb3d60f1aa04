"""Deterministic DSP parity: signal_processing, Resample, multi-mic."""

import numpy as np
import pytest

from tests.parity.conftest import assert_close, to_np


@pytest.fixture(scope="module")
def sig(torch):
    """Zero-padded batch: the reference's amplitude helpers sum over the
    FULL time axis and divide by `lengths`, relying on real zero padding."""
    rng = np.random.default_rng(91)
    x = rng.standard_normal((3, 2000)).astype(np.float32) * 0.1
    x[1, 1500:] = 0.0
    x[2, 1000:] = 0.0
    return x


def test_compute_amplitude_normalize_rescale_parity(ref, torch, sig):
    from speechbrain.processing.signal_processing import (
        compute_amplitude as ref_amp,
        normalize as ref_norm,
        rescale as ref_rescale,
    )
    import speechbrain_tpu.processing.signal_processing as sp

    lens = (torch.tensor([2000, 1500, 1000]).unsqueeze(1))
    lens_j = np.asarray([[2000], [1500], [1000]], dtype=np.float32)
    for amp_type in ("avg", "peak"):
        theirs = ref_amp(torch.tensor(sig), lens, amp_type=amp_type)
        ours = sp.compute_amplitude(sig, lens_j, amp_type=amp_type)
        assert_close(ours, theirs, rtol=1e-4, atol=1e-6, what=f"amp {amp_type}")
    theirs = ref_amp(torch.tensor(sig), lens, scale="dB")
    ours = sp.compute_amplitude(sig, lens_j, scale="dB")
    assert_close(ours, theirs, rtol=1e-4, atol=1e-4, what="amp dB")

    theirs = ref_norm(torch.tensor(sig), lens)
    ours = sp.normalize(sig, lens_j)
    assert_close(ours, theirs, rtol=1e-4, atol=1e-5, what="normalize")

    theirs = ref_rescale(torch.tensor(sig), lens, target_lvl=0.5)
    ours = sp.rescale(sig, lens_j, target_lvl=0.5)
    assert_close(ours, theirs, rtol=1e-4, atol=1e-5, what="rescale")


@pytest.mark.parametrize("use_fft", [False, True])
def test_convolve1d_parity(ref, torch, sig, use_fft):
    from speechbrain.processing.signal_processing import (
        convolve1d as ref_conv,
    )
    import speechbrain_tpu.processing.signal_processing as sp

    rng = np.random.default_rng(92)
    kernel = rng.standard_normal((1, 30)).astype(np.float32)
    x = sig[..., None]  # (B, T, 1)
    k = torch.tensor(kernel).unsqueeze(-1)
    theirs = ref_conv(
        torch.tensor(x), k, padding=(10, 10), use_fft=use_fft
    )
    ours = sp.convolve1d(x, kernel[..., None], padding=(10, 10), use_fft=use_fft)
    assert_close(
        ours, theirs, rtol=1e-3, atol=1e-4, what=f"convolve1d fft={use_fft}"
    )


def test_notch_filter_parity(ref, torch):
    from speechbrain.processing.signal_processing import (
        notch_filter as ref_notch,
    )
    import speechbrain_tpu.processing.signal_processing as sp

    theirs = ref_notch(0.25, filter_width=101, notch_width=0.05)
    ours = sp.notch_filter(0.25, filter_width=101, notch_width=0.05)
    assert_close(ours, theirs, rtol=1e-4, atol=1e-6, what="notch")


def test_reverberate_parity(ref, torch, sig):
    from speechbrain.processing.signal_processing import (
        reverberate as ref_rev,
    )
    import speechbrain_tpu.processing.signal_processing as sp

    rng = np.random.default_rng(93)
    rir = np.zeros((1, 400), dtype=np.float32)
    rir[0, 50] = 1.0
    rir[0, 120] = 0.4
    rir += 0.01 * rng.standard_normal((1, 400)).astype(np.float32)
    theirs = ref_rev(torch.tensor(sig), torch.tensor(rir))
    ours = sp.reverberate(sig, rir)
    assert_close(ours, theirs, rtol=1e-3, atol=1e-4, what="reverberate")


def test_overlap_and_add_parity(ref, torch):
    from speechbrain.processing.signal_processing import (
        overlap_and_add as ref_ola,
    )
    import speechbrain_tpu.processing.signal_processing as sp

    rng = np.random.default_rng(94)
    frames = rng.standard_normal((2, 10, 64)).astype(np.float32)
    theirs = ref_ola(torch.tensor(frames), 32)
    ours = sp.overlap_and_add(frames, 32)
    assert_close(ours, theirs, rtol=1e-4, atol=1e-5, what="overlap_add")


def test_resample_parity(ref, torch, sig):
    from speechbrain.processing.speech_augmentation import (
        Resample as RefResample,
    )
    from speechbrain_tpu.processing.speech_augmentation import Resample

    for orig, new in [(16000, 8000), (16000, 22050), (16000, 16000)]:
        theirs = RefResample(orig_freq=orig, new_freq=new)(torch.tensor(sig))
        ours = Resample(orig_freq=orig, new_freq=new)(sig)
        assert_close(
            ours, theirs, rtol=1e-3, atol=1e-4, what=f"resample {orig}->{new}"
        )


def test_covariance_gccphat_parity(ref, torch):
    from speechbrain.processing.features import STFT as RefSTFT
    from speechbrain.processing.multi_mic import (
        Covariance as RefCov,
        GccPhat as RefGcc,
        DelaySum as RefDS,
    )
    import speechbrain_tpu.processing.multi_mic as mm

    rng = np.random.default_rng(95)
    base = rng.standard_normal(4000).astype(np.float32)
    # 4-mic array: delayed copies + noise
    mics = np.stack(
        [np.roll(base, d) for d in (0, 3, 5, 8)], axis=-1
    )[None]
    mics = mics + 0.01 * rng.standard_normal(mics.shape).astype(np.float32)
    stft_t = RefSTFT(sample_rate=16000)(torch.tensor(mics))

    theirs_cov = RefCov()(stft_t)
    ours_cov = mm.Covariance()(to_np(stft_t))
    assert_close(ours_cov, theirs_cov, rtol=1e-3, atol=1e-4, what="Covariance")

    theirs_tdoa = RefGcc()(theirs_cov)
    ours_tdoa = mm.GccPhat()(ours_cov)
    assert_close(
        ours_tdoa, theirs_tdoa, rtol=1e-2, atol=1e-2, what="GccPhat tdoas"
    )

    theirs_ds = RefDS()(stft_t, theirs_tdoa)
    ours_ds = mm.DelaySum()(to_np(stft_t), np.asarray(ours_tdoa))
    assert_close(ours_ds, theirs_ds, rtol=1e-2, atol=1e-2, what="DelaySum")
