"""LibriParty VAD auxiliary prep + on-the-fly augmentation.

Role counterparts of reference ``recipes/LibriParty/VAD/
{musan_prepare, commonlanguage_prepare, data_augment}.py``.
"""

import os
import sys
import wave

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
VAD_DIR = os.path.join(REPO, "recipes", "LibriParty", "VAD")


@pytest.fixture(autouse=True)
def _vad_path():
    sys.path.insert(0, VAD_DIR)
    yield
    sys.path.remove(VAD_DIR)


def _write_wav(path, seconds, sr=16000, channels=1, seed=0):
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    sig = (0.2 * rng.standard_normal((n, channels))).clip(-1, 1)
    pcm = (sig * 32767).astype("<i2")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with wave.open(path, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def _read_csv(path):
    with open(path) as f:
        rows = [
            line.strip().split(",")
            for line in f
            if line.strip() and not line.startswith("ID")
        ]
    return rows


def test_musan_prepare_slices_long_files(tmp_path):
    from musan_prepare import prepare_musan

    root = tmp_path / "musan"
    _write_wav(str(root / "music" / "m1.wav"), 2.0, seed=1)
    _write_wav(str(root / "noise" / "n1.wav"), 7.0, seed=2)  # sliced
    _write_wav(str(root / "noise" / "n2.wav"), 1.5, seed=3)
    _write_wav(str(root / "speech" / "s1.wav"), 2.0, channels=2, seed=4)

    csvs = [str(tmp_path / f"{c}.csv") for c in ("music", "noise", "speech")]
    prepare_musan(str(root), *csvs, max_noise_len=3.0)

    music = _read_csv(csvs[0])
    assert len(music) == 1 and abs(float(music[0][1]) - 2.0) < 0.01
    noise = _read_csv(csvs[1])
    # 7 s at max 3 s -> 2 slices of n1 (reference int(7/3)=2) + n2
    ids = sorted(r[0] for r in noise)
    assert ids == ["n1_0", "n1_1", "n2"]
    assert not os.path.exists(root / "noise" / "n1.wav")  # replaced
    for r in noise:
        assert os.path.exists(r[2])
    # stereo speech was downmixed in place
    with wave.open(str(root / "speech" / "s1.wav"), "rb") as w:
        assert w.getnchannels() == 1


def test_commonlanguage_prepare(tmp_path):
    from commonlanguage_prepare import prepare_commonlanguage

    root = tmp_path / "cl"
    _write_wav(str(root / "it" / "a.wav"), 1.0, seed=5)
    _write_wav(str(root / "de" / "b.wav"), 1.2, seed=6)
    csv = str(tmp_path / "cl.csv")
    prepare_commonlanguage(str(root), csv)
    rows = _read_csv(csv)
    assert sorted(r[0] for r in rows) == ["a", "b"]


def test_augment_data_transitions():
    from data_augment import augment_data, create_chunks

    sr, secs = 16000, 5
    B = 2
    rng = np.random.default_rng(0)

    def fake_aug(wav, lens, key):
        # stand-in for AddNoise-style augmenters: deterministic shaping
        return np.asarray(wav) * 0.5

    wavs = rng.standard_normal((B, secs * sr)).astype(np.float32)
    targets = np.zeros((B, 500), np.float32)
    lens = np.ones(B, np.float32)
    out_w, out_t, out_l = augment_data(
        [fake_aug, fake_aug],
        [fake_aug, fake_aug],  # source counts must match (reference)
        wavs,
        targets,
        lens,
        key=jax.random.PRNGKey(0),
        rng=np.random.default_rng(3),
    )
    # originals + 4 transition types; transition batches are B * n_src
    assert out_w.shape[0] == out_t.shape[0] == out_l.shape[0]
    assert out_w.shape[0] > B
    assert out_w.shape[1] == secs * sr
    # peak-normalized with random gain: amplitudes bounded by 1
    assert float(np.abs(out_w).max()) <= 1.0 + 1e-6
    # the speech-containing chunks produced frame targets
    assert float(out_t.max()) == 1.0 and float(out_t.min()) == 0.0

    # speech1/speech2 flags drive the targets
    rng2 = np.random.default_rng(1)
    n_src = 2
    w1 = rng2.standard_normal((B, secs * sr, n_src)).astype(np.float32)
    w2 = rng2.standard_normal((B, secs * sr, n_src)).astype(np.float32)
    bg = rng2.standard_normal((B, secs * sr, n_src)).astype(np.float32)
    _, t_noise, _ = create_chunks(
        w1, w2, bg, np.random.default_rng(2), speech1=False, speech2=False
    )
    assert float(t_noise.max()) == 0.0
    _, t_speech, _ = create_chunks(
        w1, w2, bg, np.random.default_rng(2), speech1=True, speech2=True
    )
    assert float(t_speech.max()) == 1.0
