#!/usr/bin/env python3
"""AISHELL-1 source metadata: corpus tree -> per-split CSV.

    python create_aishell1_metadata.py --aishell1_dir /data/aishell1/wav

Role counterpart of the reference
``recipes/Aishell1Mix/separation/scripts/create_aishell1_metadata.py``:
walks each split (train/dev/test), joins speaker sex from
``../resource_aishell/speaker.info`` and transcripts from
``aishell_transcript_v0.8.txt``, filters utterances < 3 s, sorts by
length, and writes the reference CSV schema
(speaker_ID,sex,subset,length,origin_path,transcript).
"""

import argparse
import csv
import glob
import os

from speechbrain_tpu.dataio.dataio import _load_audio_any

RATE = 16000
NUMBER_OF_SECONDS = 3


def read_speakers(aishell1_dir):
    path = os.path.join(
        aishell1_dir, "..", "resource_aishell", "speaker.info"
    )
    sex = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                sex["S" + parts[0]] = parts[1]
    return sex


def read_transcripts(aishell1_dir):
    path = os.path.join(
        aishell1_dir,
        "..",
        "resource_aishell",
        "aishell_transcript_v0.8.txt",
    )
    out = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split(maxsplit=1)
            if len(parts) == 2:
                out[parts[0]] = parts[1]
    return out


def create_split_rows(aishell1_dir, subdir, sex_map, transcripts):
    rows = []
    for sound_path in sorted(
        glob.glob(
            os.path.join(aishell1_dir, subdir, "**/*.wav"),
            recursive=True,
        )
    ):
        spk_id = sound_path.split("/")[-2]
        filename = os.path.basename(sound_path).split(".")[0]
        if filename not in transcripts:
            continue
        audio, sr = _load_audio_any(sound_path)
        rows.append(
            {
                "speaker_ID": spk_id,
                "sex": sex_map.get(spk_id, "U"),
                "subset": subdir,
                "length": len(audio),
                "origin_path": os.path.relpath(
                    sound_path, aishell1_dir
                ),
                "transcript": transcripts[filename],
            }
        )
    rows = [r for r in rows if r["length"] >= NUMBER_OF_SECONDS * RATE]
    rows.sort(key=lambda r: r["length"])
    return rows


def main(aishell1_dir, md_dir=None):
    md_dir = md_dir or os.path.join(aishell1_dir, "metadata")
    os.makedirs(md_dir, exist_ok=True)
    sex_map = read_speakers(aishell1_dir)
    transcripts = read_transcripts(aishell1_dir)
    fields = [
        "speaker_ID", "sex", "subset", "length", "origin_path",
        "transcript",
    ]
    for subdir in ("train", "dev", "test"):
        if not os.path.isdir(os.path.join(aishell1_dir, subdir)):
            continue
        save_path = os.path.join(md_dir, subdir + ".csv")
        if os.path.exists(save_path):
            print(f"{save_path} exists, skipping")
            continue
        rows = create_split_rows(
            aishell1_dir, subdir, sex_map, transcripts
        )
        with open(save_path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields)
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {len(rows)} rows to {save_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--aishell1_dir", required=True)
    p.add_argument("--md_dir", default=None)
    a = p.parse_args()
    main(a.aishell1_dir, a.md_dir)
