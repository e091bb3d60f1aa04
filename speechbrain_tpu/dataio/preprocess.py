"""Waveform-level preprocessing at load time.

Parity target: reference ``dataio/preprocess.py:7`` (AudioNormalizer).
"""

import numpy as np

__all__ = ["AudioNormalizer", "resample_folder"]


class AudioNormalizer:
    """Resample to a standard rate and downmix to mono (host side).

    Example
    -------
    >>> normalizer = AudioNormalizer(sample_rate=16000)
    >>> stereo = np.ones((160, 2), dtype=np.float32)
    >>> normalizer(stereo, 16000).shape
    (160,)
    """

    def __init__(self, sample_rate=16000, mix="avg-to-mono"):
        self.sample_rate = sample_rate
        if mix not in ["avg-to-mono", "keep"]:
            raise ValueError(f"Unexpected mixing configuration {mix}")
        self.mix = mix

    def __call__(self, audio, sample_rate):
        audio = np.asarray(audio, dtype=np.float32)
        if sample_rate != self.sample_rate:
            audio = _resample_poly(audio, sample_rate, self.sample_rate)
        return self._mix(audio)

    def _mix(self, audio):
        if audio.ndim == 1 or self.mix == "keep":
            return audio
        if self.mix == "avg-to-mono":
            return audio.mean(axis=1)
        return audio


def _resample_poly(audio, orig_freq, new_freq):
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(int(orig_freq), int(new_freq))
    up = int(new_freq) // g
    down = int(orig_freq) // g
    return resample_poly(audio, up, down, axis=0).astype(np.float32)


def resample_folder(
    input_folder,
    output_folder,
    fs,
    regex="**/*.wav",
    peak_suffix=True,
    progress=True,
):
    """Recursively resample every matching audio file into a mirrored
    folder tree, peak-normalizing each file.

    Role counterpart of the reference's dynamic-mixing preprocessing
    (``recipes/WSJ0Mix/meta/preprocess_dynamic_mixing.py:38``, and the
    LibriMix/Aishell1Mix/WHAMandWHAMR copies): dynamic-mixing recipes
    mix sources on the fly at training time, so every source file is
    stored peak-normalized at the target rate, with the original peak
    recorded in the filename (``*_peak_<p>.wav``) so mixing can restore
    true levels.

    Arguments
    ---------
    input_folder, output_folder : str
    fs : int
        Target sampling rate.
    regex : str
        Recursive glob for the files to process.
    peak_suffix : bool
        Append ``_peak_<peak>`` to each output stem (reference
        behavior); False keeps the original names.

    Returns
    -------
    list of written file paths.
    """
    import glob
    import os
    from pathlib import Path

    from speechbrain_tpu.dataio.dataio import _load_audio_any, write_audio

    files = sorted(
        glob.glob(os.path.join(input_folder, regex), recursive=True)
    )
    written = []
    for i, f in enumerate(files):
        audio, sr = _load_audio_any(f)
        audio = np.asarray(audio, np.float32)
        if audio.ndim > 1:
            audio = audio[:, 0]
        if sr != fs:
            audio = _resample_poly(audio, sr, fs)
        peak = float(np.max(np.abs(audio))) if audio.size else 1.0
        if peak > 0:
            audio = audio / peak
        rel = Path(f).relative_to(Path(input_folder))
        stem = rel.stem + (f"_peak_{peak}" if peak_suffix else "")
        out_path = Path(output_folder) / rel.parent / (stem + ".wav")
        os.makedirs(out_path.parent, exist_ok=True)
        write_audio(str(out_path), audio, fs)
        written.append(str(out_path))
        if progress and (i + 1) % 100 == 0:
            print(f"resampled {i + 1}/{len(files)}")
    return written
