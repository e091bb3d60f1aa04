#!/usr/bin/env python3
"""Score diarization RTTMs with the native DER implementation.

    python tools/der_eval.py --ref ref.rttm --sys sys.rttm [--collar 0.25]

TPU-native counterpart of the reference ``tools/der_eval/md-eval.pl``
(NIST perl scorer): same missed/false-alarm/confusion decomposition,
implemented in ``speechbrain_tpu.utils.DER`` (Hungarian speaker
mapping, forgiveness collar).
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/tools", 1)[0])

from speechbrain_tpu.processing.diarization import read_rttm  # noqa: E402
from speechbrain_tpu.utils.DER import DER  # noqa: E402


def main():
    """Parse args, score, print the DER breakdown."""
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ref", required=True, help="reference RTTM")
    parser.add_argument("--sys", required=True, help="system RTTM")
    parser.add_argument("--collar", type=float, default=0.25)
    parser.add_argument(
        "--ignore_overlap", action="store_true", default=False
    )
    args = parser.parse_args()
    ref = read_rttm(args.ref)
    hyp = read_rttm(args.sys)
    miss, fa, conf, der = DER(
        ref, hyp, ignore_overlap=args.ignore_overlap, collar=args.collar
    )
    print(
        f"MISSED SPEECH  = {miss:6.2f}%\n"
        f"FALARM SPEECH  = {fa:6.2f}%\n"
        f"SPEAKER ERROR  = {conf:6.2f}%\n"
        f"OVERALL DER    = {der:6.2f}%"
    )


if __name__ == "__main__":
    main()
