#!/usr/bin/env python3
"""Aishell1Mix mixture metadata: source+noise CSVs -> mixture CSVs.

    python create_aishell1mix_metadata.py --aishell1_dir ... \
        --aishell1_md_dir ... --wham_dir ... --wham_md_dir ... \
        --metadata_outdir ... --n_src 2

Role counterpart of the reference
``recipes/Aishell1Mix/separation/scripts/create_aishell1mix_metadata.py``:
pairs utterances from DISTINCT speakers with a WHAM noise clip,
randomizes per-source loudness in [-33, -25] LUFS (noise in
[-38, -30]), checks the summed mixture for clipping (renormalizing
against a 0.9 peak when needed), and writes the reference CSV schema:
``mixture_ID, source_k_path, source_k_gain, source_k_transcript...,
noise_path, noise_gain`` plus a ``*_info.csv`` with speaker ids/sexes.
Loudness is the native BS.1770 meter (``loudness.py``), replacing
pyloudnorm.
"""

import argparse
import csv
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from loudness import integrated_loudness  # noqa: E402

from speechbrain_tpu.dataio.dataio import _load_audio_any  # noqa: E402

EPS = 1e-10
MAX_AMP = 0.9
RATE = 16000
MIN_LOUDNESS = -33
MAX_LOUDNESS = -25

random.seed(72)


def read_csv_rows(path):
    with open(path) as f:
        return list(csv.DictReader(f))


def set_pairs(src_rows, noise_rows, n_src):
    """Non-repeating speaker-distinct pairs (reference set_pairs)."""
    utt_pairs, noise_pairs = [], []
    idx = list(range(len(src_rows)))
    random.shuffle(idx)
    while len(idx) >= n_src:
        pair = []
        spks = set()
        rest = []
        for i in idx:
            if len(pair) == n_src:
                rest.append(i)
                continue
            spk = src_rows[i]["speaker_ID"]
            if spk in spks:
                rest.append(i)
                continue
            pair.append(i)
            spks.add(spk)
        if len(pair) < n_src:
            break
        utt_pairs.append(pair)
        idx = rest
        noise_pairs.append(
            random.randrange(len(noise_rows))
        )
    return utt_pairs, noise_pairs


def main(
    aishell1_dir, aishell1_md_dir, wham_dir, wham_md_dir,
    metadata_outdir, n_src,
):
    os.makedirs(metadata_outdir, exist_ok=True)
    dataset = f"aishell1mix{n_src}"
    for split in ("train", "dev", "test"):
        src_csv = os.path.join(aishell1_md_dir, split + ".csv")
        noise_csv = os.path.join(wham_md_dir, split + ".csv")
        if not (os.path.exists(src_csv) and os.path.exists(noise_csv)):
            continue
        save_path = os.path.join(
            metadata_outdir, f"{dataset}_{split}.csv"
        )
        info_path = os.path.join(
            metadata_outdir, f"{dataset}_{split}_info.csv"
        )
        src_rows = read_csv_rows(src_csv)
        noise_rows = read_csv_rows(noise_csv)
        pairs, noise_pairs = set_pairs(src_rows, noise_rows, n_src)
        md_fields = ["mixture_ID"]
        info_fields = ["mixture_ID"]
        for i in range(n_src):
            md_fields += [
                f"source_{i + 1}_path",
                f"source_{i + 1}_gain",
                f"source_{i + 1}_transcript",
            ]
            info_fields += [
                f"speaker_{i + 1}_ID",
                f"speaker_{i + 1}_sex",
            ]
        md_fields += ["noise_path", "noise_gain"]
        out_md, out_info = [], []
        for pair, ni in zip(pairs, noise_pairs):
            sources = []
            for i in pair:
                row = src_rows[i]
                audio, sr = _load_audio_any(
                    os.path.join(aishell1_dir, row["origin_path"])
                )
                sources.append((row, np.asarray(audio, np.float64)))
            nrow = noise_rows[ni]
            naudio, _ = _load_audio_any(
                os.path.join(wham_dir, nrow["origin_path"])
            )
            naudio = np.asarray(naudio, np.float64)
            if naudio.ndim > 1:
                naudio = naudio[:, 0]
            # pad everything to the longest source (reference pads to
            # the max-length source; noise is tiled/truncated)
            max_len = max(len(a) for _, a in sources)
            padded = [
                np.pad(a, (0, max_len - len(a))) for _, a in sources
            ]
            reps = int(np.ceil(max_len / max(1, len(naudio))))
            naudio = np.tile(naudio, reps)[:max_len]
            # loudness randomization
            gains = []
            norm = []
            for a in padded:
                target = random.uniform(MIN_LOUDNESS, MAX_LOUDNESS)
                c = integrated_loudness(a, RATE)
                g = 10 ** ((target - c) / 20)
                gains.append(g)
                norm.append(a * g)
            ntarget = random.uniform(
                MIN_LOUDNESS - 5, MAX_LOUDNESS - 5
            )
            nc = integrated_loudness(naudio, RATE)
            ng = 10 ** ((ntarget - nc) / 20)
            gains.append(ng)
            norm.append(naudio * ng)
            mixture = sum(norm)
            # clipping check (reference check_for_cliping)
            peak = np.max(np.abs(mixture)) + EPS
            if peak > MAX_AMP:
                scale = MAX_AMP / peak
                gains = [g * scale for g in gains]
            mix_id = "_".join(
                src_rows[i]["origin_path"]
                .split("/")[-1]
                .split(".")[0]
                for i in pair
            )
            md = {"mixture_ID": mix_id}
            info = {"mixture_ID": mix_id}
            for k, i in enumerate(pair):
                row = src_rows[i]
                md[f"source_{k + 1}_path"] = row["origin_path"]
                md[f"source_{k + 1}_gain"] = round(gains[k], 6)
                md[f"source_{k + 1}_transcript"] = row["transcript"]
                info[f"speaker_{k + 1}_ID"] = row["speaker_ID"]
                info[f"speaker_{k + 1}_sex"] = row["sex"]
            md["noise_path"] = nrow["origin_path"]
            md["noise_gain"] = round(gains[-1], 6)
            out_md.append(md)
            out_info.append(info)
        with open(save_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=md_fields)
            w.writeheader()
            w.writerows(out_md)
        with open(info_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=info_fields)
            w.writeheader()
            w.writerows(out_info)
        print(f"wrote {len(out_md)} mixtures to {save_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--aishell1_dir", required=True)
    p.add_argument("--aishell1_md_dir", required=True)
    p.add_argument("--wham_dir", required=True)
    p.add_argument("--wham_md_dir", required=True)
    p.add_argument("--metadata_outdir", required=True)
    p.add_argument("--n_src", type=int, default=2)
    a = p.parse_args()
    main(
        a.aishell1_dir, a.aishell1_md_dir, a.wham_dir, a.wham_md_dir,
        a.metadata_outdir, a.n_src,
    )
