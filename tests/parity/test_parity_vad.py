"""VAD inference-pipeline parity vs reference interfaces.py:1120-2053.

Drives the SAME synthetic audio + the SAME deterministic stand-in for
the neural posterior model through both VAD implementations; every
post-processing stage (double-windowing chunker, hamming overlap
averaging, hysteresis thresholding, boundary extraction, energy VAD,
merge/remove, double-check, segment output, report format) must agree.

The torch side is constructed without from_hparams (no HF fetch):
attributes are set directly and torchaudio.load/info are served from
the same in-memory waveform our side reads from the WAV file.
"""

import io
import os
import sys
import contextlib

import numpy as np
import pytest

from tests.parity.conftest import assert_close


SR = 16000
TIME_RES = 0.01


@pytest.fixture(scope="module")
def wave_file(tmp_path_factory):
    """A 9.3 s waveform with two loud 'speech' bursts, int16-exact."""
    rng = np.random.default_rng(123)
    n = int(9.3 * SR)
    audio = 0.01 * rng.standard_normal(n)
    audio[int(1.2 * SR) : int(3.4 * SR)] += 0.5 * np.sin(
        2 * np.pi * 220 * np.arange(int(3.4 * SR) - int(1.2 * SR)) / SR
    )
    audio[int(5.0 * SR) : int(7.7 * SR)] += 0.4 * np.sin(
        2 * np.pi * 330 * np.arange(int(7.7 * SR) - int(5.0 * SR)) / SR
    )
    # quantize so file-read and in-memory views are bit-identical
    pcm = np.clip(audio, -1, 1)
    pcm = (pcm * 32767.0).astype(np.int16)
    audio = pcm.astype(np.float32) / 32768.0

    path = tmp_path_factory.mktemp("vad") / "long.wav"
    from scipy.io import wavfile

    wavfile.write(str(path), SR, pcm)
    return str(path), audio


def _fake_probs_np(wavs):
    """Deterministic per-frame 'speech probabilities' from energy.

    Produces len//160 + 1 frames (one extra trailing frame, mirroring
    the reference model whose last frame get_speech_prob_file drops).
    """
    wavs = np.asarray(wavs, np.float32)
    if wavs.ndim == 1:
        wavs = wavs[None]
    B, L = wavs.shape
    frame = int(TIME_RES * SR)
    n_frames = L // frame + 1
    pad = n_frames * frame - L
    x = np.pad(wavs, ((0, 0), (0, pad)))
    frames = x.reshape(B, n_frames, frame)
    rms = np.sqrt((frames**2).mean(-1))
    prob = 1.0 / (1.0 + np.exp(-40.0 * (rms - 0.1)))
    return prob[:, :, None].astype(np.float32)


@pytest.fixture(scope="module")
def vads(ref, torch, wave_file):
    """(ours, theirs) VAD instances over the same fake model/audio."""
    import speechbrain.pretrained.interfaces as ref_if
    from speechbrain_tpu.pretrained.interfaces import VAD as OurVAD

    path, audio = wave_file

    # torchaudio stub serving the in-memory waveform
    ta = sys.modules["torchaudio"]

    def fake_load(fpath, frame_offset=0, num_frames=-1):
        seg = audio[frame_offset:]
        if num_frames is not None and num_frames >= 0:
            seg = seg[:num_frames]
        return torch.tensor(seg[None]), SR

    class _Info:
        sample_rate = SR
        num_frames = len(audio)

    ta.load = fake_load
    ta.info = lambda fpath: _Info()
    ref_if.torchaudio = ta
    # local files only: bypass HF fetch
    ref_if.fetch = lambda fl, source=None, **kw: os.path.join(
        source or "", fl
    )

    theirs = ref_if.VAD.__new__(ref_if.VAD)
    theirs.device = "cpu"
    theirs.sample_rate = SR
    theirs.time_resolution = TIME_RES
    theirs.get_speech_prob_chunk = lambda wavs, wav_lens=None: torch.tensor(
        _fake_probs_np(wavs.detach().cpu().numpy())
    )

    ours = OurVAD(
        modules={"model": None},
        hparams={"sample_rate": SR, "time_resolution": TIME_RES},
    )
    ours.get_speech_prob_chunk = lambda wavs, wav_lens=None: _fake_probs_np(
        np.asarray(wavs)
    )
    return ours, theirs


def test_audio_info(vads, wave_file):
    ours, theirs = vads
    path, audio = wave_file
    sr, n = ours._get_audio_info(path)
    assert sr == SR and n == len(audio)


def test_apply_threshold_parity(vads, torch):
    ours, theirs = vads
    rng = np.random.default_rng(5)
    # random probs plus crafted hysteresis edge cases
    probs = [
        rng.random((1, 50, 1)).astype(np.float32),
        np.array([0.3, 0.6, 0.3, 0.3, 0.1, 0.3, 0.6, 0.1], np.float32)[
            None, :, None
        ],
        np.array([0.6, 0.6, 0.26, 0.26, 0.24, 0.6], np.float32)[
            None, :, None
        ],
        np.zeros((1, 5, 1), np.float32),
        np.ones((1, 5, 1), np.float32),
    ]
    for p in probs:
        t = theirs.apply_threshold(torch.tensor(p)).numpy()
        o = ours.apply_threshold(p)
        np.testing.assert_array_equal(o, t)


def test_boundaries_parity(vads, torch):
    ours, theirs = vads
    rng = np.random.default_rng(6)
    cases = [
        (rng.random((1, 80, 1)) > 0.5).astype(np.float32),
        np.array([1, 1, 0, 0, 1, 0, 1], np.float32)[None, :, None],
        np.array([0, 0, 0], np.float32)[None, :, None],
        np.array([1, 1, 1], np.float32)[None, :, None],
        np.array([0, 0, 1], np.float32)[None, :, None],
    ]
    for c in cases:
        for unit in ("seconds", "samples"):
            t = theirs.get_boundaries(
                torch.tensor(c), output_value=unit
            ).numpy()
            o = ours.get_boundaries(c, output_value=unit)
            assert_close(o, t.reshape(-1, 2), what=f"boundaries {unit}")


def test_merge_remove_parity(vads, torch):
    ours, theirs = vads
    b = np.array(
        [[0.5, 1.0], [1.2, 1.3], [1.4, 3.0], [3.9, 4.0], [5.0, 5.1]],
        np.float32,
    )
    t = theirs.merge_close_segments(torch.tensor(b), close_th=0.25).numpy()
    o = ours.merge_close_segments(b, close_th=0.25)
    assert_close(o, t, what="merge_close")
    t2 = theirs.remove_short_segments(torch.tensor(t), len_th=0.25).numpy()
    o2 = ours.remove_short_segments(o, len_th=0.25)
    assert_close(o2, t2.reshape(-1, 2), what="remove_short")


@pytest.mark.parametrize("overlap", [False, True])
def test_speech_prob_file_parity(vads, wave_file, overlap):
    ours, theirs = vads
    path, _ = wave_file
    t = theirs.get_speech_prob_file(
        path,
        large_chunk_size=4,
        small_chunk_size=2,
        overlap_small_chunk=overlap,
    ).numpy()
    o = ours.get_speech_prob_file(
        path,
        large_chunk_size=4,
        small_chunk_size=2,
        overlap_small_chunk=overlap,
    )
    assert_close(o, t, rtol=1e-5, atol=1e-6, what=f"prob_file ov={overlap}")


def test_energy_vad_parity(vads, wave_file, torch):
    ours, theirs = vads
    path, _ = wave_file
    b = np.array([[1.0, 3.6], [4.8, 7.9]], np.float32)
    t = theirs.energy_VAD(path, torch.tensor(b)).numpy()
    o = ours.energy_VAD(path, b)
    assert_close(o, t.reshape(-1, 2), rtol=1e-4, atol=1e-5, what="energy_VAD")


def test_upsample_and_chunks_parity(vads, wave_file, torch):
    ours, theirs = vads
    path, audio = wave_file
    vad_out = (_fake_probs_np(audio)[:, :-1] > 0.5).astype(np.float32)
    t = theirs.upsample_VAD(torch.tensor(vad_out), path).numpy()
    o = ours.upsample_VAD(vad_out, path)
    assert_close(o, t, what="upsample_VAD")

    b = np.array([[1.2, 3.4], [5.0, 7.7]], np.float32)
    t = theirs.upsample_boundaries(torch.tensor(b), path).numpy()
    o = ours.upsample_boundaries(b, path)
    assert_close(o, t, what="upsample_boundaries")

    x = audio[: SR]
    t = theirs.create_chunks(
        torch.tensor(x[None]), chunk_size=400, chunk_stride=160
    ).numpy()
    o = ours.create_chunks(x[None], chunk_size=400, chunk_stride=160)
    assert_close(o, t, what="create_chunks")

    segs_t = theirs.get_segments(torch.tensor(b), path)
    segs_o = ours.get_segments(b, path)
    assert len(segs_t) == len(segs_o)
    for so, st in zip(segs_o, segs_t):
        assert_close(so, st.numpy(), what="get_segments")


def test_double_check_parity(vads, wave_file, torch):
    ours, theirs = vads
    path, _ = wave_file
    b = np.array([[1.2, 3.4], [4.0, 4.4], [5.0, 7.7]], np.float32)
    t = theirs.double_check_speech_segments(
        torch.tensor(b), path, speech_th=0.5
    ).numpy()
    o = ours.double_check_speech_segments(b, path, speech_th=0.5)
    assert_close(o, t.reshape(-1, 2), what="double_check")


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),
        dict(overlap_small_chunk=True),
        dict(apply_energy_VAD=True),
        dict(apply_energy_VAD=True, double_check=False),
    ],
)
def test_full_pipeline_parity(vads, wave_file, kwargs):
    ours, theirs = vads
    path, _ = wave_file
    t = theirs.get_speech_segments(
        path, large_chunk_size=4, small_chunk_size=2, **kwargs
    ).numpy()
    o = ours.get_speech_segments(
        path, large_chunk_size=4, small_chunk_size=2, **kwargs
    )
    assert_close(
        o, t.reshape(-1, 2), rtol=1e-4, atol=1e-5,
        what=f"get_speech_segments {kwargs}",
    )


def test_save_boundaries_format_parity(vads, wave_file, torch, tmp_path):
    ours, theirs = vads
    path, _ = wave_file
    b = np.array([[1.2, 3.4], [5.0, 7.7]], np.float32)
    f_t = tmp_path / "theirs.txt"
    f_o = tmp_path / "ours.txt"
    with contextlib.redirect_stdout(io.StringIO()):
        theirs.save_boundaries(
            torch.tensor(b), save_path=str(f_t), audio_file=path
        )
        ours.save_boundaries(b, save_path=str(f_o), audio_file=path)
    assert f_o.read_text() == f_t.read_text()
