#!/usr/bin/env python3
"""Convert KsponSpeech raw .pcm files to .wav in place.

    python convert_to_wav.py --dirpath /data/KsponSpeech [--nj 32]

The corpus ships headerless 16 kHz 16-bit mono PCM; this wraps each
file in a WAV header next to the original (reference
``recipes/KsponSpeech/convert_to_wav.py``).
"""

import argparse
import multiprocessing as mp
import wave
from pathlib import Path


def convert_to_wav(filepath):
    """Wrap one raw PCM file in a WAV header."""
    with open(filepath, "rb") as r:
        data = r.read()
    with wave.open(str(filepath.with_suffix(".wav")), "wb") as w:
        w.setparams((1, 2, 16000, 0, "NONE", "NONE"))
        w.writeframes(data)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dirpath", type=str, required=True)
    parser.add_argument("--nj", type=int, default=32)
    args = parser.parse_args()
    file_list = list(Path(args.dirpath).glob("**/*.pcm"))
    with mp.Pool(processes=args.nj) as pool:
        for i, _ in enumerate(
            pool.imap_unordered(convert_to_wav, file_list), 1
        ):
            if i % 1000 == 0:
                print(f"{i}/{len(file_list)}")


if __name__ == "__main__":
    main()
