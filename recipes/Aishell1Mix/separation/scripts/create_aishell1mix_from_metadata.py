#!/usr/bin/env python3
"""Synthesize the Aishell1Mix corpus from mixture metadata.

    python create_aishell1mix_from_metadata.py --aishell1_dir ... \
        --wham_dir ... --metadata_dir ... --aishell1mix_outdir ... \
        --n_src 2 --freqs 8k 16k --modes min max

Role counterpart of the reference
``create_aishell1mix_from_metadata.py``: for every metadata row, loads
the sources and noise, applies the recorded gains, resamples to each
requested rate, crops (``min``) or pads (``max``) to align, writes
``mix_clean`` / ``mix_both`` / per-source / noise wavs in the
reference directory layout (``wav8k/min/train/...``) and a per-output
CSV with lengths.
"""

import argparse
import csv
import os

import numpy as np

from speechbrain_tpu.dataio.dataio import _load_audio_any, write_audio
from speechbrain_tpu.dataio.preprocess import _resample_poly

RATE = 16000


def _read(path, gain, rate):
    audio, sr = _load_audio_any(path)
    audio = np.asarray(audio, np.float64)
    if audio.ndim > 1:
        audio = audio[:, 0]
    audio = audio * float(gain)
    if rate != sr:
        audio = np.asarray(_resample_poly(audio, sr, rate), np.float64)
    return audio


def process_split(
    csv_path, aishell1_dir, wham_dir, out_root, split, n_src,
    freqs, modes,
):
    with open(csv_path) as f:
        rows = list(csv.DictReader(f))
    for freq in freqs:
        rate = int(freq.replace("k", "000"))
        for mode in modes:
            base = os.path.join(out_root, f"wav{freq}", mode, split)
            dirs = (
                [f"s{i + 1}" for i in range(n_src)]
                + ["mix_clean", "mix_both", "noise"]
            )
            for d in dirs:
                os.makedirs(os.path.join(base, d), exist_ok=True)
            md_rows = []
            for row in rows:
                sources = [
                    _read(
                        os.path.join(
                            aishell1_dir,
                            row[f"source_{i + 1}_path"],
                        ),
                        row[f"source_{i + 1}_gain"],
                        rate,
                    )
                    for i in range(n_src)
                ]
                noise = _read(
                    os.path.join(wham_dir, row["noise_path"]),
                    row["noise_gain"],
                    rate,
                )
                if mode == "min":
                    n = min(
                        [len(s) for s in sources] + [len(noise)]
                    )
                    sources = [s[:n] for s in sources]
                    noise = noise[:n]
                else:
                    n = max(len(s) for s in sources)
                    sources = [
                        np.pad(s, (0, n - len(s))) for s in sources
                    ]
                    reps = int(np.ceil(n / max(1, len(noise))))
                    noise = np.tile(noise, reps)[:n]
                mix_clean = sum(sources)
                mix_both = mix_clean + noise
                mid = row["mixture_ID"]
                for i, s in enumerate(sources):
                    write_audio(
                        os.path.join(base, f"s{i + 1}", mid + ".wav"),
                        s.astype(np.float32), rate,
                    )
                write_audio(
                    os.path.join(base, "noise", mid + ".wav"),
                    noise.astype(np.float32), rate,
                )
                write_audio(
                    os.path.join(base, "mix_clean", mid + ".wav"),
                    mix_clean.astype(np.float32), rate,
                )
                write_audio(
                    os.path.join(base, "mix_both", mid + ".wav"),
                    mix_both.astype(np.float32), rate,
                )
                md_rows.append(
                    {"mixture_ID": mid, "length": n}
                )
            md_path = os.path.join(
                out_root, f"wav{freq}", mode, "metadata"
            )
            os.makedirs(md_path, exist_ok=True)
            with open(
                os.path.join(md_path, f"mixture_{split}.csv"),
                "w", newline="",
            ) as f:
                w = csv.DictWriter(
                    f, fieldnames=["mixture_ID", "length"]
                )
                w.writeheader()
                w.writerows(md_rows)
            print(
                f"wrote {len(md_rows)} mixtures under {base}"
            )


def main(
    aishell1_dir, wham_dir, metadata_dir, out_root, n_src, freqs, modes
):
    dataset = f"aishell1mix{n_src}"
    for split in ("train", "dev", "test"):
        csv_path = os.path.join(
            metadata_dir, f"{dataset}_{split}.csv"
        )
        if os.path.exists(csv_path):
            process_split(
                csv_path, aishell1_dir, wham_dir, out_root, split,
                n_src, freqs, modes,
            )


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--aishell1_dir", required=True)
    p.add_argument("--wham_dir", required=True)
    p.add_argument("--metadata_dir", required=True)
    p.add_argument("--aishell1mix_outdir", required=True)
    p.add_argument("--n_src", type=int, default=2)
    p.add_argument("--freqs", nargs="+", default=["8k", "16k"])
    p.add_argument("--modes", nargs="+", default=["min", "max"])
    a = p.parse_args()
    main(
        a.aishell1_dir, a.wham_dir, a.metadata_dir,
        a.aishell1mix_outdir, a.n_src, a.freqs, a.modes,
    )
