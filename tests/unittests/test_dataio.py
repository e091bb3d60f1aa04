import json
import os

import numpy as np
import pytest

from speechbrain_tpu.dataio.batch import BatchShapePolicy, PaddedBatch
from speechbrain_tpu.dataio.dataio import (
    load_data_csv,
    load_data_json,
    read_audio,
    write_audio,
)
from speechbrain_tpu.dataio.dataset import DynamicItemDataset


def test_wav_roundtrip(tmp_path):
    sr = 16000
    audio = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(
        np.float32
    )
    path = str(tmp_path / "tone.wav")
    write_audio(path, audio, sr)
    loaded = read_audio(path)
    assert loaded.shape == audio.shape
    assert np.abs(loaded - audio).max() < 1e-3


def test_wav_segment_read(tmp_path):
    sr = 16000
    audio = np.arange(1000, dtype=np.float32) / 32768.0
    path = str(tmp_path / "ramp.wav")
    write_audio(path, audio, sr)
    seg = read_audio({"file": path, "start": 100, "stop": 200})
    assert len(seg) == 100
    full = read_audio(path)
    assert np.allclose(seg, full[100:200])


def test_manifest_json(tmp_path):
    manifest = {"u1": {"wav": "$root/a.wav", "duration": 1.5}}
    path = tmp_path / "data.json"
    path.write_text(json.dumps(manifest))
    data = load_data_json(str(path), {"root": "/data"})
    assert data["u1"]["wav"] == "/data/a.wav"


def test_manifest_csv(tmp_path):
    path = tmp_path / "data.csv"
    path.write_text("ID,duration,wav\nu1,1.5,$root/a.wav\nu2,2.0,$root/b.wav\n")
    data = load_data_csv(str(path), {"root": "/data"})
    assert data["u1"]["duration"] == 1.5
    assert data["u2"]["wav"] == "/data/b.wav"


def test_dataset_pipeline():
    data = {
        "u1": {"text": "ab", "duration": 1.0},
        "u2": {"text": "cdef", "duration": 2.0},
    }
    ds = DynamicItemDataset(data)
    ds.add_dynamic_item(
        lambda t: np.arange(len(t), dtype=np.float32), takes="text", provides="feat"
    )
    ds.set_output_keys(["id", "feat"])
    assert ds[0]["id"] == "u1"
    assert ds[1]["feat"].shape == (4,)


def test_filtered_sorted():
    data = {
        f"u{i}": {"duration": float(i), "text": "x" * i} for i in range(1, 6)
    }
    ds = DynamicItemDataset(data)
    ds.set_output_keys(["id"])
    filtered = ds.filtered_sorted(key_max_value={"duration": 3.0})
    assert len(filtered) == 3
    sorted_ds = ds.filtered_sorted(sort_key="duration", reverse=True)
    assert sorted_ds[0]["id"] == "u5"
    # Views share data; original untouched
    assert len(ds) == 5


def test_padded_batch_basic():
    batch = PaddedBatch(
        [
            {"id": "a", "wav": np.ones(10, dtype=np.float32)},
            {"id": "b", "wav": np.ones(20, dtype=np.float32)},
        ]
    )
    assert batch.wav.data.shape == (2, 20)
    assert np.allclose(batch.wav.lengths, [0.5, 1.0])
    assert batch.id == ["a", "b"]
    assert len(batch) == 2


def test_padded_batch_bucketed():
    policy = BatchShapePolicy(time_buckets=[16, 32], pad_batch_to=4)
    batch = PaddedBatch(
        [
            {"id": "a", "wav": np.ones(10, dtype=np.float32)},
            {"id": "b", "wav": np.ones(20, dtype=np.float32)},
        ],
        shape_policy=policy,
    )
    assert batch.wav.data.shape == (4, 32)
    assert np.allclose(batch.wav.lengths, [10 / 32, 20 / 32, 0.0, 0.0])


def test_numeric_dict():
    batch = PaddedBatch(
        [
            {"id": "a", "wav": np.ones(4, dtype=np.float32), "spk": 3},
            {"id": "b", "wav": np.ones(4, dtype=np.float32), "spk": 5},
        ]
    )
    nd = batch.numeric_dict()
    assert set(nd.keys()) == {"wav", "wav_lens", "spk"}
    assert nd["spk"].tolist() == [3, 5]


def test_sphere_read(tmp_path):
    """NIST SPHERE decode (TIMIT's .WAV container), incl. magic sniff."""
    sr = 16000
    audio = (0.4 * np.sin(2 * np.pi * 300 * np.arange(800) / sr)).astype(
        np.float32
    )
    pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()
    hdr_lines = [
        "NIST_1A", "   1024", f"sample_rate -i {sr}",
        "channel_count -i 1", "sample_n_bytes -i 2",
        f"sample_count -i {len(audio)}", "sample_byte_format -s2 01",
        "sample_coding -s3 pcm", "end_head",
    ]
    hdr = ("\n".join(hdr_lines) + "\n").encode("ascii")
    hdr = hdr + b" " * (1024 - len(hdr))
    path = str(tmp_path / "utt.WAV")  # sphere with a .WAV extension
    with open(path, "wb") as f:
        f.write(hdr + pcm)
    loaded = read_audio(path)
    assert loaded.shape == audio.shape
    assert np.abs(loaded - audio).max() < 1e-3
    seg = read_audio({"file": path, "start": 100, "stop": 300})
    assert np.allclose(seg, loaded[100:300])


def test_shape_policy_per_key():
    """time_keys scoping + key_buckets menus (mixed audio/token batch)."""
    policy = BatchShapePolicy(
        time_buckets=[100, 200], time_keys=("sig",),
        key_buckets={"tokens": [8, 16]},
    )
    examples = [
        {"id": "a", "sig": np.zeros(150), "tokens": np.arange(5)},
        {"id": "b", "sig": np.zeros(90), "tokens": np.arange(3)},
    ]
    batch = PaddedBatch(examples, shape_policy=policy)
    assert batch["sig"].data.shape == (2, 200)
    assert batch["tokens"].data.shape == (2, 8)


def test_kaldi_ark_roundtrip(tmp_path):
    """Native Kaldi ark read/write: int vectors, float mats, scp."""
    import struct

    from speechbrain_tpu.dataio.dataio import read_kaldi_lab
    from speechbrain_tpu.dataio.kaldi_io import (
        read_mat_ark,
        read_mat_scp,
        read_vec_flt_ark,
        read_vec_int_ark,
        write_mat,
        write_vec_flt,
    )

    # int-vector ark (alignment labels) written by hand per the spec
    ali = tmp_path / "ali.1.ark"
    with open(ali, "wb") as f:
        for key, vec in [("utt1", [3, 1, 4, 1]), ("utt2", [5, 9])]:
            f.write(key.encode() + b" \0B\4" + struct.pack("<i", len(vec)))
            for v in vec:
                f.write(b"\4" + struct.pack("<i", v))
    got = {k: v.tolist() for k, v in read_vec_int_ark(str(ali))}
    assert got == {"utt1": [3, 1, 4, 1], "utt2": [5, 9]}
    lab = read_kaldi_lab(str(tmp_path))
    assert lab["utt2"].tolist() == [5, 9]

    # float matrix ark round-trip + scp offsets
    feats = tmp_path / "feats.ark"
    scp_lines = []
    mats = {"a": np.arange(12, dtype=np.float32).reshape(3, 4),
            "b": np.eye(2, dtype=np.float32)}
    with open(feats, "wb") as f:
        for key, m in mats.items():
            pos = f.tell() + len(key) + 1  # offset points at \0B
            write_mat(f, m, key)
            scp_lines.append(f"{key} {feats}:{pos}")
    for k, m in read_mat_ark(str(feats)):
        assert np.allclose(m, mats[k])
    scp = tmp_path / "feats.scp"
    scp.write_text("\n".join(scp_lines))
    for k, m in read_mat_scp(str(scp)):
        assert np.allclose(m, mats[k])

    # float vector ark
    xv = tmp_path / "xvector.ark"
    write_vec_flt(str(xv), np.array([1.5, -2.0], np.float32), "spk1")
    k, v = next(iter(read_vec_flt_ark(str(xv))))
    assert k == "spk1" and np.allclose(v, [1.5, -2.0])


def test_shape_policy_batch_buckets():
    """Batch-dim quantization: dummy rows + batch_mask in numeric_dict."""
    policy = BatchShapePolicy(
        time_buckets=[8], batch_buckets=[2, 4, 8]
    )
    examples = [
        {"id": f"u{i}", "sig": np.ones(5) * (i + 1)} for i in range(3)
    ]
    batch = PaddedBatch(examples, shape_policy=policy)
    nd = batch.numeric_dict()
    assert nd["sig"].shape == (4, 8)  # batch 3 -> 4, time 5 -> 8
    assert nd["batch_mask"].tolist() == [1.0, 1.0, 1.0, 0.0]
    assert nd["sig_lens"].tolist()[-1] == 0.0  # dummy row length 0
    # exact bucket hit: no dummy rows, no mask emitted
    batch2 = PaddedBatch(examples[:2], shape_policy=policy)
    assert "batch_mask" not in batch2.numeric_dict()
