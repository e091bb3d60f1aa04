#!/usr/bin/env python3
"""WHAM! noise metadata: noise tree -> per-split CSV.

    python create_wham_metadata.py --wham_dir /data/wham_noise

Role counterpart of the reference
``recipes/Aishell1Mix/separation/scripts/create_wham_metadata.py``:
walks tr/cv/tt noise folders and writes
(noise_ID,subset,length,augmented,origin_path) CSVs sorted by length
(train.csv merges tr, dev.csv = cv, test.csv = tt, matching the
reference's split mapping).
"""

import argparse
import csv
import glob
import os

from speechbrain_tpu.dataio.dataio import _load_audio_any

SPLIT_MAP = {"train": ["tr"], "dev": ["cv"], "test": ["tt"]}


def rows_for(wham_dir, subdirs):
    rows = []
    for sub in subdirs:
        for path in sorted(
            glob.glob(os.path.join(wham_dir, sub, "*.wav"))
        ):
            audio, sr = _load_audio_any(path)
            rows.append(
                {
                    "noise_ID": os.path.basename(path).split(".")[0],
                    "subset": sub,
                    "length": len(audio),
                    "augmented": False,
                    "origin_path": os.path.relpath(path, wham_dir),
                }
            )
    rows.sort(key=lambda r: r["length"])
    return rows


def main(wham_dir, md_dir=None):
    md_dir = md_dir or os.path.join(wham_dir, "metadata")
    os.makedirs(md_dir, exist_ok=True)
    fields = ["noise_ID", "subset", "length", "augmented", "origin_path"]
    for name, subs in SPLIT_MAP.items():
        save_path = os.path.join(md_dir, name + ".csv")
        if os.path.exists(save_path):
            print(f"{save_path} exists, skipping")
            continue
        rows = rows_for(wham_dir, subs)
        with open(save_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields)
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {len(rows)} rows to {save_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wham_dir", required=True)
    p.add_argument("--md_dir", default=None)
    a = p.parse_args()
    main(a.wham_dir, a.md_dir)
