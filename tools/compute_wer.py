#!/usr/bin/env python3
"""Kaldi-style WER scoring between reference and hypothesis text files.

    python tools/compute_wer.py ref.txt hyp.txt [--mode present]

File format: one utterance per line, "<utt_id> w1 w2 w3 ...".
Mirrors the reference's ``tools/compute_wer.py``.
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

from speechbrain_tpu.dataio.wer import print_alignments, print_wer_summary
from speechbrain_tpu.utils.edit_distance import (
    wer_details_by_utterance,
    wer_summary,
)


def _read_trn(path):
    out = {}
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if not parts:
                continue
            out[parts[0]] = parts[1:]
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("ref")
    parser.add_argument("hyp")
    parser.add_argument(
        "--mode", choices=["strict", "present", "all"], default="strict"
    )
    parser.add_argument("--print-alignments", action="store_true")
    args = parser.parse_args()
    ref = _read_trn(args.ref)
    hyp = _read_trn(args.hyp)
    details = wer_details_by_utterance(
        ref, hyp, compute_alignments=args.print_alignments,
        scoring_mode=args.mode,
    )
    summary = wer_summary(details)
    print_wer_summary(summary)
    if args.print_alignments:
        print_alignments(details)


if __name__ == "__main__":
    main()
