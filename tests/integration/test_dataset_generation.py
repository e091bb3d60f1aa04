"""Dataset-generation utilities end to end (VERDICT round-2 item 6).

Generates a miniature LibriParty corpus from a synthetic LibriSpeech
tree + RIR/noise bank with ``create_custom_dataset.py``, converts it to
VAD manifests with ``libriparty_prepare``, and loads the result through
the dataio stack; also smoke-tests the shared dynamic-mixing
``resample_folder`` preprocessor.
"""

import json
import os
import subprocess
import sys
import wave

import numpy as np

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
SR = 16000


def _write_wav(path, audio, sr=SR):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2")
        w.writeframes(pcm.tobytes())


def _write_flac(path, audio, sr=SR):
    sys.path.insert(0, os.path.join(REPO, "tests", "unittests"))
    from test_native_audio import encode_flac

    os.makedirs(os.path.dirname(path), exist_ok=True)
    pcm = (np.clip(audio, -1, 1) * 32767).astype(int).tolist()
    with open(path, "wb") as f:
        f.write(bytes(encode_flac([pcm], sr, 16, 4096, "fixed2")))


def _make_mini_librispeech(root):
    rng = np.random.default_rng(0)
    for split, spks in [
        ("train-clean-100", ["101", "102"]),
        ("dev-clean", ["201", "202"]),
        ("test-clean", ["301", "302"]),
    ]:
        for spk in spks:
            chap = "1"
            d = os.path.join(root, split, spk, chap)
            os.makedirs(d, exist_ok=True)
            lines = []
            for u in range(2):
                utt_id = f"{spk}-{chap}-{u:04d}"
                t = np.arange(SR) / SR
                sig = 0.3 * np.sin(
                    2 * np.pi * rng.uniform(100, 400) * t
                )
                _write_flac(
                    os.path.join(d, utt_id + ".flac"),
                    sig.astype(np.float32),
                )
                lines.append(f"{utt_id} HELLO WORLD {u}")
            with open(
                os.path.join(d, f"{spk}-{chap}.trans.txt"), "w"
            ) as f:
                f.write("\n".join(lines) + "\n")


def _make_rirs_noises(root):
    rng = np.random.default_rng(1)
    for i in range(10):
        rir = np.zeros(800, np.float32)
        rir[0] = 1.0
        rir[200:260] = 0.2 * rng.standard_normal(60)
        _write_wav(
            os.path.join(root, "simulated_rirs", f"rir{i}.wav"), rir
        )
        noise = 0.1 * rng.standard_normal(SR // 2).astype(np.float32)
        _write_wav(
            os.path.join(root, "pointsource_noises", f"n{i}.wav"),
            noise,
        )


def test_libriparty_generation(tmp_path):
    libri = str(tmp_path / "LibriSpeech")
    rirs = str(tmp_path / "RIRS_NOISES")
    out = str(tmp_path / "LibriParty")
    _make_mini_librispeech(libri)
    _make_rirs_noises(rirs)
    yaml_path = str(tmp_path / "mini.yaml")
    with open(
        os.path.join(
            REPO, "recipes/LibriParty/generate_dataset/dataset.yaml"
        )
    ) as f:
        base = f.read()
    base = base.replace(
        "out_folder: !PLACEHOLDER", f"out_folder: {out}"
    )
    base = base.replace(
        "librispeech_root: !PLACEHOLDER", f"librispeech_root: {libri}"
    )
    base = base.replace(
        "rirs_noises_root: !PLACEHOLDER", f"rirs_noises_root: {rirs}"
    )
    base = base.replace("max_length: 60.0", "max_length: 10.0")
    # short gaps so every 10 s session fits at least one utterance
    base = base.replace(
        "interval_factor_speech: 10.0", "interval_factor_speech: 1.0"
    )
    base = base.replace(
        "interval_factor_noises: 20.0", "interval_factor_noises: 2.0"
    )
    base = base.replace(
        "n_sessions:\n    train: 50\n    dev: 5\n    eval: 5",
        "n_sessions:\n    train: 2\n    dev: 1\n    eval: 1",
    )
    with open(yaml_path, "w") as f:
        f.write(base)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    # Dataset generation is pure host work: force CPU regardless of the
    # image's preset platform (an accelerator runtime must not be required).
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(
                REPO,
                "recipes/LibriParty/generate_dataset/"
                "create_custom_dataset.py",
            ),
            yaml_path,
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    # metadata + sessions + mixtures exist
    for split, n in [("train", 2), ("dev", 1), ("eval", 1)]:
        meta_path = os.path.join(out, "metadata", split + ".json")
        with open(meta_path) as f:
            meta = json.load(f)
        assert len(meta) == n
        for sess in meta:
            mix = os.path.join(out, split, sess, f"{sess}_mixture.wav")
            assert os.path.exists(mix), mix

    # convert to VAD manifests and load through dataio
    sys.path.insert(0, os.path.join(REPO, "recipes", "LibriParty"))
    from libriparty_prepare import prepare_libriparty

    from speechbrain_tpu.dataio.dataio import read_audio
    from speechbrain_tpu.dataio.dataset import DynamicItemDataset

    manifests = prepare_libriparty(out, str(tmp_path / "save"))
    ds = DynamicItemDataset.from_json(manifests["train"])
    assert len(ds) == 2
    row = ds.data[ds.data_ids[0]]
    audio = read_audio(row["file"])
    assert len(audio) > SR  # sessions are several seconds long
    assert all(e > s for s, e in row["speech"])


def test_resample_folder(tmp_path):
    from speechbrain_tpu.dataio.preprocess import resample_folder

    src = tmp_path / "src" / "sub"
    rng = np.random.default_rng(2)
    _write_wav(
        str(src / "a.wav"),
        0.5 * rng.standard_normal(SR).astype(np.float32),
        SR,
    )
    out = resample_folder(
        str(tmp_path / "src"), str(tmp_path / "dst"), 8000
    )
    assert len(out) == 1 and "_peak_" in out[0]
    from speechbrain_tpu.dataio.dataio import read_audio

    audio = np.asarray(read_audio(out[0]))
    assert abs(len(audio) - 8000) <= 1
    assert np.max(np.abs(audio)) > 0.97  # peak-normalized


def test_whamr_room_rirs(tmp_path):
    """Native image-source WHAMR room: RIR physics sanity — direct
    path at the geometric delay, energy decaying at the requested T60
    scale, anechoic == direct-path-only."""
    sys.path.insert(
        0, os.path.join(REPO, "recipes", "WHAMandWHAMR", "meta")
    )
    from wham_room import C_SOUND, WhamRoom

    fs = 16000
    room = WhamRoom(
        p=[5.0, 4.0, 3.0],
        mics=[[2.0, 2.0, 1.5], [2.1, 2.0, 1.5]],
        s1=[1.0, 1.0, 1.5],
        s2=[4.0, 3.0, 1.5],
        T60=0.2,
        fs=fs,
    )
    room.generate_rirs()
    rir = room.rir_reverberant[0][0]  # micL, s1
    assert len(rir) == int(np.ceil(0.2 * fs))
    # direct path: distance micL<->s1 = sqrt(2), delay ~ d/c*fs
    d = np.sqrt(2.0)
    expected = d / C_SOUND * fs
    peak = int(np.argmax(np.abs(rir)))
    assert abs(peak - expected) <= 2, (peak, expected)
    # energy decays: last 10% of the RIR holds far less energy than
    # the first 10%
    n = len(rir)
    head = float(np.sum(rir[: n // 10] ** 2))
    tail = float(np.sum(rir[-n // 10:] ** 2))
    assert tail < 0.05 * head
    # anechoic = direct path only: single dominant spike
    an = room.rir_anechoic[0][0]
    assert int(np.argmax(np.abs(an))) == peak
    above = np.sum(np.abs(an) > 0.05 * np.max(np.abs(an)))
    assert above <= 4  # the lerp spreads the spike over <= 2 bins


def test_create_whamr_rirs_cli(tmp_path):
    """create_whamr_rirs drives the CSV -> RIR-wavs flow end to end
    with local metadata (no network)."""
    meta = tmp_path / "data"
    os.makedirs(meta)
    with open(meta / "mix_2_spk_filenames_tr.csv", "w") as f:
        f.write("output_filename\nutt1.wav\n")
    for other in [
        "mix_2_spk_filenames_cv.csv", "mix_2_spk_filenames_tt.csv",
        "reverb_params_cv.csv", "reverb_params_tt.csv",
    ]:
        with open(meta / other, "w") as f:
            f.write("output_filename\n")
    with open(meta / "reverb_params_tr.csv", "w") as f:
        f.write(
            "utterance_id,room_x,room_y,room_z,micL_x,micL_y,micR_x,"
            "micR_y,mic_z,s1_x,s1_y,s1_z,s2_x,s2_y,s2_z,T60\n"
            "utt1.wav,5,4,3,2,2,2.1,2,1.5,1,1,1.5,4,3,1.5,0.15\n"
        )
    sys.path.insert(
        0, os.path.join(REPO, "recipes", "WHAMandWHAMR", "meta")
    )
    import create_whamr_rirs

    out = str(tmp_path / "rirs")
    create_whamr_rirs.create_rirs(
        out, sr=8000, splits=("tr",), data_dir=str(meta)
    )
    from speechbrain_tpu.dataio.dataio import read_audio

    written = sorted(os.listdir(out))
    assert written == [
        "0_0_utt1.wav", "0_1_utt1.wav", "1_0_utt1.wav", "1_1_utt1.wav",
    ]
    rir = np.asarray(read_audio(os.path.join(out, "0_0_utt1.wav")))
    assert abs(len(rir) - int(0.15 * 8000)) <= 1


def test_aishell1mix_chain(tmp_path):
    """The four Aishell1Mix scripts end to end on a synthetic corpus:
    source metadata -> noise metadata -> mixture metadata (native
    BS.1770 loudness randomization + clip check) -> synthesized
    mixtures in the reference wav8k/16k min/max layout."""
    import csv

    sys.path.insert(
        0,
        os.path.join(
            REPO, "recipes", "Aishell1Mix", "separation", "scripts"
        ),
    )
    rng = np.random.default_rng(5)

    # --- synthetic AISHELL-1 layout -----------------------------------
    ai = tmp_path / "aishell1" / "wav"
    res = tmp_path / "aishell1" / "resource_aishell"
    os.makedirs(res)
    spk_info, trans = [], []
    for split, spks in [("train", ["S0002", "S0003", "S0004"]),
                        ("dev", ["S0021", "S0022"]),
                        ("test", ["S0031", "S0032"])]:
        for spk in spks:
            spk_info.append(f"{spk[1:]} {'M' if int(spk[1:]) % 2 else 'F'}")
            for u in range(2):
                utt = f"BAC009{spk}W{u:04d}"
                d = ai / split / spk
                _write_wav(
                    str(d / (utt + ".wav")),
                    0.3 * rng.standard_normal(4 * SR).astype(np.float32),
                )
                trans.append(f"{utt} ni hao shi jie {u}")
    (res / "speaker.info").write_text("\n".join(spk_info) + "\n")
    (res / "aishell_transcript_v0.8.txt").write_text(
        "\n".join(trans) + "\n"
    )

    # --- synthetic WHAM noise -----------------------------------------
    wham = tmp_path / "wham_noise"
    for sub, n in [("tr", 3), ("cv", 2), ("tt", 2)]:
        for i in range(n):
            _write_wav(
                str(wham / sub / f"noise{i}.wav"),
                0.1 * rng.standard_normal(5 * SR).astype(np.float32),
            )

    import create_aishell1_metadata
    import create_aishell1mix_from_metadata
    import create_aishell1mix_metadata
    import create_wham_metadata

    ai_md = str(tmp_path / "ai_md")
    wham_md = str(tmp_path / "wham_md")
    create_aishell1_metadata.main(str(ai), ai_md)
    create_wham_metadata.main(str(wham), wham_md)
    with open(os.path.join(ai_md, "train.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 6 and rows[0]["speaker_ID"].startswith("S")

    mix_md = str(tmp_path / "mix_md")
    create_aishell1mix_metadata.main(
        str(ai), ai_md, str(wham), wham_md, mix_md, 2
    )
    with open(
        os.path.join(mix_md, "aishell1mix2_train.csv")
    ) as f:
        mrows = list(csv.DictReader(f))
    assert mrows, "no mixtures generated"
    assert "source_1_gain" in mrows[0] and "noise_gain" in mrows[0]

    out = str(tmp_path / "Aishell1Mix")
    create_aishell1mix_from_metadata.main(
        str(ai), str(wham), mix_md, out, 2, ["8k"], ["min"]
    )
    from speechbrain_tpu.dataio.dataio import read_audio

    base = os.path.join(out, "wav8k", "min", "train")
    mid = mrows[0]["mixture_ID"]
    mix = np.asarray(read_audio(os.path.join(base, "mix_both", mid + ".wav")))
    s1 = np.asarray(read_audio(os.path.join(base, "s1", mid + ".wav")))
    s2 = np.asarray(read_audio(os.path.join(base, "s2", mid + ".wav")))
    nz = np.asarray(read_audio(os.path.join(base, "noise", mid + ".wav")))
    assert len(mix) == len(s1) == len(s2) == len(nz)
    np.testing.assert_allclose(mix, s1 + s2 + nz, atol=2e-4)
    assert np.max(np.abs(mix)) <= 0.95  # clip check applied


def test_bs1770_loudness_sanity():
    """Native BS.1770 meter: a -20 dBFS 997 Hz sine measures close to
    the BS.1770 reference value, and normalization hits its target."""
    sys.path.insert(
        0,
        os.path.join(
            REPO, "recipes", "Aishell1Mix", "separation", "scripts"
        ),
    )
    from loudness import integrated_loudness, normalize_loudness

    sr = 16000
    t = np.arange(10 * sr) / sr
    sine = 0.1 * np.sin(2 * np.pi * 997 * t)  # -20 dBFS amplitude
    lufs = integrated_loudness(sine, sr)
    # BS.1770: a full-scale 997 Hz sine reads ~ -3.01 LUFS, so
    # -20 dBFS reads ~ -23 LUFS (the K-weighting shelf is ~0 dB there)
    assert abs(lufs - (-23.0)) < 0.6, lufs
    scaled, gain = normalize_loudness(sine, sr, -30.0)
    assert abs(integrated_loudness(scaled, sr) - (-30.0)) < 0.1
