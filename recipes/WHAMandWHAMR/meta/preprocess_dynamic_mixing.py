#!/usr/bin/env python3
"""Preprocess source audio for dynamic mixing (WHAMandWHAMR).

Recursively resamples every audio file under --input_folder into a
mirrored tree at --output_folder at --fs Hz, peak-normalized with the
original peak recorded in the filename (`*_peak_<p>.wav`) so
training-time dynamic mixing can restore true levels.

Role counterpart of the reference
`recipes/WHAMandWHAMR/meta/preprocess_dynamic_mixing.py` (sox/torchaudio
resample loop); this version runs on the native audio readers +
polyphase resampler (no torch).

Usage:
    python preprocess_dynamic_mixing.py --input_folder /data/src \
        --output_folder /data/src8k --fs 8000
"""

import argparse

from speechbrain_tpu.dataio.preprocess import resample_folder

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input_folder", type=str, required=True)
    parser.add_argument("--output_folder", type=str, required=True)
    parser.add_argument("--fs", type=int, default=8000)
    parser.add_argument("--regex", type=str, default="**/*.wav")
    args = parser.parse_args()
    out = resample_folder(
        args.input_folder, args.output_folder, args.fs, args.regex
    )
    print(f"wrote {len(out)} files to {args.output_folder}")
