"""Feature-frontend numeric parity vs reference processing/features.py.

Same waveform through both stacks; the reference's outputs are the
oracle (reference `processing/features.py:50,191,327,359,715,789,855,941`
and `lobes/features.py:22,150`).
"""

import numpy as np
import pytest

from tests.parity.conftest import assert_close, to_np

import speechbrain_tpu.processing.features as F
import speechbrain_tpu.lobes.features as LF


@pytest.fixture(scope="module")
def wav(torch):
    rng = np.random.default_rng(1234)
    return rng.standard_normal((3, 16000 + 731)).astype(np.float32) * 0.1


def test_stft_parity(ref, torch, wav):
    from speechbrain.processing.features import STFT as RefSTFT

    theirs = RefSTFT(sample_rate=16000)(torch.tensor(wav))
    ours = F.STFT(sample_rate=16000)(wav)
    assert_close(ours, theirs, rtol=1e-3, atol=1e-4, what="STFT")


def test_stft_fft_backend_parity(ref, torch, wav):
    from speechbrain.processing.features import STFT as RefSTFT

    theirs = RefSTFT(sample_rate=16000, n_fft=512, window_fn=torch.hann_window)(
        torch.tensor(wav)
    )
    ours = F.STFT(
        sample_rate=16000, n_fft=512, window_type="hann", backend="fft"
    )(wav)
    assert_close(ours, theirs, rtol=1e-3, atol=1e-4, what="STFT-fft")


def test_spectral_magnitude_parity(ref, torch, wav):
    from speechbrain.processing.features import (
        STFT as RefSTFT,
        spectral_magnitude as ref_mag,
    )

    stft_t = RefSTFT(sample_rate=16000)(torch.tensor(wav))
    for power, log in [(2, False), (1, False), (2, True), (0.5, False)]:
        theirs = ref_mag(stft_t, power=power, log=log)
        ours = F.spectral_magnitude(to_np(stft_t), power=power, log=log)
        assert_close(
            ours, theirs, rtol=1e-4, atol=1e-4, what=f"mag p={power} log={log}"
        )


def test_istft_roundtrip_parity(ref, torch, wav):
    from speechbrain.processing.features import (
        STFT as RefSTFT,
        ISTFT as RefISTFT,
    )

    stft_t = RefSTFT(sample_rate=16000)(torch.tensor(wav))
    theirs = RefISTFT(sample_rate=16000)(stft_t)
    ours = F.ISTFT(sample_rate=16000)(to_np(stft_t))
    n = min(to_np(theirs).shape[-1], to_np(ours).shape[-1])
    assert_close(
        to_np(ours)[:, :n], to_np(theirs)[:, :n], rtol=1e-3, atol=1e-4,
        what="ISTFT",
    )


@pytest.mark.parametrize("shape", ["triangular", "rectangular", "gaussian"])
def test_filterbank_parity(ref, torch, wav, shape):
    from speechbrain.processing.features import (
        STFT as RefSTFT,
        Filterbank as RefFbank,
        spectral_magnitude as ref_mag,
    )

    mag = ref_mag(RefSTFT(sample_rate=16000)(torch.tensor(wav)))
    theirs = RefFbank(n_mels=40, filter_shape=shape)(mag)
    ours = F.Filterbank(n_mels=40, filter_shape=shape)(to_np(mag))
    assert_close(ours, theirs, rtol=1e-3, atol=1e-3, what=f"Filterbank {shape}")


def test_dct_deltas_context_parity(ref, torch):
    from speechbrain.processing.features import (
        DCT as RefDCT,
        Deltas as RefDeltas,
        ContextWindow as RefCW,
    )

    rng = np.random.default_rng(7)
    feats = rng.standard_normal((2, 50, 40)).astype(np.float32)
    t = torch.tensor(feats)

    theirs = RefDCT(input_size=40, n_out=20)(t)
    ours = F.DCT(input_size=40, n_out=20)(feats)
    assert_close(ours, theirs, rtol=1e-4, atol=1e-5, what="DCT")

    theirs = RefDeltas(input_size=20)(t[..., :20])
    ours = F.Deltas(input_size=20)(feats[..., :20])
    assert_close(ours, theirs, rtol=1e-4, atol=1e-5, what="Deltas")

    theirs = RefCW(left_frames=3, right_frames=2)(t)
    ours = F.ContextWindow(left_frames=3, right_frames=2)(feats)
    assert_close(ours, theirs, rtol=1e-5, atol=1e-6, what="ContextWindow")


@pytest.mark.parametrize("norm_type", ["sentence", "batch"])
def test_input_normalization_parity(ref, torch, norm_type):
    from speechbrain.processing.features import (
        InputNormalization as RefNorm,
    )

    rng = np.random.default_rng(3)
    feats = rng.standard_normal((4, 30, 20)).astype(np.float32) * 3 + 1
    lengths = np.asarray([1.0, 0.7, 0.5, 0.9], dtype=np.float32)

    theirs = RefNorm(norm_type=norm_type)(
        torch.tensor(feats), torch.tensor(lengths)
    )
    ours_mod = F.InputNormalization(norm_type=norm_type)
    ours, _ = ours_mod(feats, lengths, state=F.GlobalNormState.init(20))
    assert_close(ours, theirs, rtol=1e-3, atol=1e-4, what=f"norm {norm_type}")


def test_global_norm_running_stats_parity(ref, torch):
    """global norm accumulates moving stats across calls; compare after 3."""
    from speechbrain.processing.features import (
        InputNormalization as RefNorm,
    )

    rng = np.random.default_rng(5)
    ref_norm = RefNorm(norm_type="global")
    ours_mod = F.InputNormalization(norm_type="global")
    state = F.GlobalNormState.init(12)
    for step in range(3):
        feats = rng.standard_normal((2, 25, 12)).astype(np.float32) + step
        lengths = np.asarray([1.0, 0.8], dtype=np.float32)
        theirs = ref_norm(torch.tensor(feats), torch.tensor(lengths), epoch=0)
        ours, state = ours_mod(feats, lengths, state=state, epoch=0)
    assert_close(ours, theirs, rtol=1e-3, atol=1e-3, what="global norm")


def test_fbank_pipeline_parity(ref, torch, wav):
    from speechbrain.lobes.features import Fbank as RefFbank

    theirs = RefFbank(n_mels=40)(torch.tensor(wav))
    ours = LF.Fbank(n_mels=40)(wav)
    assert_close(ours, theirs, rtol=2e-3, atol=2e-3, what="Fbank pipeline")


def test_fbank_deltas_context_pipeline_parity(ref, torch, wav):
    from speechbrain.lobes.features import Fbank as RefFbank

    theirs = RefFbank(n_mels=24, deltas=True, context=True)(torch.tensor(wav))
    ours = LF.Fbank(n_mels=24, deltas=True, context=True)(wav)
    assert_close(ours, theirs, rtol=2e-3, atol=2e-3, what="Fbank+deltas+ctx")


def test_mfcc_pipeline_parity(ref, torch, wav):
    from speechbrain.lobes.features import MFCC as RefMFCC

    theirs = RefMFCC(n_mfcc=20, deltas=False, context=False)(torch.tensor(wav))
    ours = LF.MFCC(n_mfcc=20, deltas=False, context=False)(wav)
    assert_close(ours, theirs, rtol=2e-3, atol=2e-3, what="MFCC pipeline")
