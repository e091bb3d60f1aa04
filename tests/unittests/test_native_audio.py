"""Native FLAC decoder: exact-recovery tests against a minimal
in-test encoder (verbatim / constant / fixed / LPC subframes, rice
residuals, independent + mid/side stereo), plus real files encoded by
libsndfile (the reference's augmentation golden outputs).
"""

import glob
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def native():
    from speechbrain_tpu import native as n

    if n.get_lib() is None:
        pytest.skip("native toolchain unavailable")
    return n


# --------------------------------------------------------------------
# Minimal FLAC encoder (test-side ground truth)
# --------------------------------------------------------------------


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.cur = 0
        self.nbits = 0

    def bits(self, value, n):
        for i in range(n - 1, -1, -1):
            self.cur = (self.cur << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def align(self):
        while self.nbits:
            self.bits(0, 1)

    def unary(self, q):
        for _ in range(q):
            self.bits(0, 1)
        self.bits(1, 1)


def _utf8_num(bw, v):
    assert v < 0x80  # frame counts in tests stay tiny
    bw.bits(v, 8)


def _rice(bw, residuals, param):
    bw.bits(0, 2)  # method 0 (4-bit rice)
    bw.bits(0, 4)  # partition order 0
    bw.bits(param, 4)
    for r in residuals:
        u = (r << 1) if r >= 0 else ((-r) << 1) - 1  # zigzag
        bw.unary(u >> param)
        bw.bits(u & ((1 << param) - 1), param)


def _subframe(bw, samples, bps, mode):
    bw.bits(0, 1)  # pad
    if mode == "constant":
        bw.bits(0b000000, 6)
        bw.bits(0, 1)  # no wasted bits
        bw.bits(samples[0] & ((1 << bps) - 1), bps)
        return
    if mode == "verbatim":
        bw.bits(0b000001, 6)
        bw.bits(0, 1)
        for s in samples:
            bw.bits(s & ((1 << bps) - 1), bps)
        return
    if mode == "fixed2":
        order = 2
        bw.bits(0b001000 | order, 6)
        bw.bits(0, 1)
        for s in samples[:order]:
            bw.bits(s & ((1 << bps) - 1), bps)
        res = [
            samples[i] - (2 * samples[i - 1] - samples[i - 2])
            for i in range(order, len(samples))
        ]
        _rice(bw, res, 10)
        return
    if mode == "lpc2":
        order, precision, shift = 2, 12, 10
        coefs = [1536, -512]  # arbitrary but fixed
        bw.bits(0b100000 | (order - 1), 6)
        bw.bits(0, 1)
        for s in samples[:order]:
            bw.bits(s & ((1 << bps) - 1), bps)
        bw.bits(precision - 1, 4)
        bw.bits(shift, 5)
        for c in coefs:
            bw.bits(c & ((1 << precision) - 1), precision)
        res = []
        for i in range(order, len(samples)):
            pred = (coefs[0] * samples[i - 1] + coefs[1] * samples[i - 2]) >> shift
            res.append(samples[i] - pred)
        _rice(bw, res, 12)
        return
    raise ValueError(mode)


def encode_flac(channel_samples, sample_rate, bps, blocksize, mode,
                stereo="independent"):
    """channel_samples: list of equal-length int lists (1 or 2)."""
    n_ch = len(channel_samples)
    total = len(channel_samples[0])
    bw = BitWriter()
    bw.bytes += b"fLaC"
    # STREAMINFO (last metadata block)
    bw.bits(1, 1)
    bw.bits(0, 7)
    bw.bits(34, 24)
    bw.bits(blocksize, 16)
    bw.bits(blocksize, 16)
    bw.bits(0, 24)
    bw.bits(0, 24)
    bw.bits(sample_rate, 20)
    bw.bits(n_ch - 1, 3)
    bw.bits(bps - 1, 5)
    bw.bits(total, 36)
    for _ in range(16):
        bw.bits(0, 8)
    # frames
    frame_no = 0
    for start in range(0, total, blocksize):
        chunk = [c[start : start + blocksize] for c in channel_samples]
        bs = len(chunk[0])
        bw.bits(0b11111111111110, 14)
        bw.bits(0, 1)  # reserved
        bw.bits(0, 1)  # fixed blocksize stream
        bw.bits(7, 4)  # blocksize: 16 bits at end
        bw.bits(0, 4)  # samplerate: STREAMINFO
        if n_ch == 2 and stereo == "mid_side":
            bw.bits(10, 4)
        else:
            bw.bits(n_ch - 1, 4)
        bw.bits(0, 3)  # sample size: STREAMINFO
        bw.bits(0, 1)
        _utf8_num(bw, frame_no)
        bw.bits(bs - 1, 16)
        bw.bits(0, 8)  # crc8 (decoder skips)
        if n_ch == 2 and stereo == "mid_side":
            mids = [(l + r) >> 1 for l, r in zip(chunk[0], chunk[1])]
            sides = [l - r for l, r in zip(chunk[0], chunk[1])]
            _subframe(bw, mids, bps, mode)
            _subframe(bw, sides, bps + 1, mode)
        else:
            for c in chunk:
                _subframe(bw, c, bps, mode)
        bw.align()
        bw.bits(0, 16)  # crc16 (decoder skips)
        frame_no += 1
    bw.align()
    return bytes(bw.bytes)


def _int_wave(n, bps, seed, smooth=True):
    rng = np.random.default_rng(seed)
    amp = 2 ** (bps - 2)
    t = np.arange(n)
    x = amp * np.sin(2 * np.pi * t / 50.0)
    if smooth:
        x += rng.normal(0, amp / 50.0, size=n)
    else:
        x = rng.integers(-amp, amp, size=n)
    return np.clip(np.round(x), -(2 ** (bps - 1)), 2 ** (bps - 1) - 1).astype(
        np.int64
    )


@pytest.mark.parametrize(
    "mode", ["verbatim", "constant", "fixed2", "lpc2"]
)
def test_flac_exact_mono(native, tmp_path, mode):
    bps = 16
    if mode == "constant":
        samples = np.full(600, -1234, np.int64)
    else:
        samples = _int_wave(600, bps, seed=hash(mode) % 2**31)
    path = str(tmp_path / f"{mode}.flac")
    with open(path, "wb") as f:
        f.write(encode_flac([samples.tolist()], 16000, bps, 256, mode))
    audio, sr = native.flac_decode(path)
    assert sr == 16000 and audio.shape == (600,)
    rec = np.round(audio * 2 ** (bps - 1)).astype(np.int64)
    np.testing.assert_array_equal(rec, samples)


@pytest.mark.parametrize("stereo", ["independent", "mid_side"])
def test_flac_exact_stereo(native, tmp_path, stereo):
    bps = 16
    left = _int_wave(512, bps, seed=1)
    right = _int_wave(512, bps, seed=2)
    path = str(tmp_path / f"{stereo}.flac")
    with open(path, "wb") as f:
        f.write(
            encode_flac(
                [left.tolist(), right.tolist()],
                16000,
                bps,
                128,
                "fixed2",
                stereo=stereo,
            )
        )
    audio, sr = native.flac_decode(path)
    assert audio.shape == (512, 2)
    rec = np.round(audio * 2 ** (bps - 1)).astype(np.int64)
    np.testing.assert_array_equal(rec[:, 0], left)
    np.testing.assert_array_equal(rec[:, 1], right)


REF_FLACS = sorted(
    glob.glob(
        "/root/reference/tests/integration/augmentation/expected/*/save/*.flac"
    )
)


@pytest.mark.skipif(not REF_FLACS, reason="no sample FLAC files")
def test_flac_real_files(native):
    for path in REF_FLACS[:4]:
        audio, sr = native.flac_decode(path)
        assert sr == 16000
        assert audio.shape == (52173,)
        assert np.isfinite(audio).all()
        assert np.abs(audio).max() <= 1.0


@pytest.mark.skipif(not REF_FLACS, reason="no sample FLAC files")
def test_read_audio_flac_path(native):
    from speechbrain_tpu.dataio.dataio import read_audio

    audio = read_audio(REF_FLACS[0])
    assert audio.shape == (52173,)
    seg = read_audio({"file": REF_FLACS[0], "start": 100, "stop": 600})
    np.testing.assert_allclose(seg, audio[100:600])
