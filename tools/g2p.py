#!/usr/bin/env python3
"""Grapheme-to-phoneme conversion from the command line.

    python tools/g2p.py --model <pretrained-dir> --text "hello world"
    echo "one line per utterance" | python tools/g2p.py --model <dir>

TPU-native counterpart of the reference ``tools/g2p.py``: loads a
trained G2P model through the ``GraphemeToPhoneme`` pretrained
interface and prints space-joined phoneme sequences.
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/tools", 1)[0])


def main():
    """Parse args, load the model, convert stdin/--text lines."""
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--model", required=True,
        help="pretrained model dir (hyperparams.yaml + ckpt)",
    )
    parser.add_argument(
        "--text", default=None,
        help="text to convert (default: read lines from stdin)",
    )
    args = parser.parse_args()
    from speechbrain_tpu.pretrained.interfaces import GraphemeToPhoneme

    g2p = GraphemeToPhoneme.from_hparams(source=args.model)
    lines = (
        [args.text] if args.text is not None
        else [l.strip() for l in sys.stdin if l.strip()]
    )
    for line in lines:
        print(" ".join(g2p.g2p(line)))


if __name__ == "__main__":
    main()
