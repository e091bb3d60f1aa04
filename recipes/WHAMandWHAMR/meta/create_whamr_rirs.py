#!/usr/bin/env python3
"""Create the WHAMR! room impulse responses.

    python create_whamr_rirs.py --output-dir /data/whamr_rirs [--sr 8000]

Role counterpart of the reference
``recipes/WHAMandWHAMR/meta/create_whamr_rirs.py``: fetches the
published reverb-parameter CSVs (HF ``speechbrain/sepformer-whamr``
metadata; local copies are used when present), simulates each
utterance's room with the native image-source model (``wham_room.py``),
and saves the reverberant RIR of every (mic, source) pair as
``<mic>_<src>_<utt>.wav`` at the requested rate.
"""

import argparse
import csv
import os

import numpy as np

from speechbrain_tpu.dataio.dataio import write_audio
from speechbrain_tpu.dataio.preprocess import _resample_poly

from wham_room import WhamRoom  # noqa: E402 (script-local import)

FILELIST = [
    "mix_2_spk_filenames_tr.csv",
    "mix_2_spk_filenames_cv.csv",
    "mix_2_spk_filenames_tt.csv",
    "reverb_params_tr.csv",
    "reverb_params_cv.csv",
    "reverb_params_tt.csv",
]


def _fetch_metadata(savedir):
    from speechbrain_tpu.pretrained.fetching import fetch

    os.makedirs(savedir, exist_ok=True)
    for fl in FILELIST:
        if not os.path.exists(os.path.join(savedir, fl)):
            fetch(
                "metadata/" + fl,
                "speechbrain/sepformer-whamr",
                savedir=savedir,
                save_filename=fl,
            )


def create_rirs(output_dir, sr=8000, splits=("tr",), data_dir=None):
    """Simulate + save the RIRs for the requested splits."""
    os.makedirs(output_dir, exist_ok=True)
    metadir = data_dir or os.path.join(
        os.path.dirname(os.path.realpath(__file__)), "data"
    )
    if not all(
        os.path.exists(os.path.join(metadir, f)) for f in FILELIST
    ):
        _fetch_metadata(metadir)
    for splt in splits:
        with open(
            os.path.join(metadir, f"reverb_params_{splt}.csv")
        ) as f:
            rows = {
                r["utterance_id"]: r for r in csv.DictReader(f)
            }
        with open(
            os.path.join(metadir, f"mix_2_spk_filenames_{splt}.csv")
        ) as f:
            utt_ids = [r["output_filename"] for r in csv.DictReader(f)]
        for output_name in utt_ids:
            r = rows[output_name]
            room = WhamRoom(
                [float(r["room_x"]), float(r["room_y"]),
                 float(r["room_z"])],
                [
                    [float(r["micL_x"]), float(r["micL_y"]),
                     float(r["mic_z"])],
                    [float(r["micR_x"]), float(r["micR_y"]),
                     float(r["mic_z"])],
                ],
                [float(r["s1_x"]), float(r["s1_y"]), float(r["s1_z"])],
                [float(r["s2_x"]), float(r["s2_y"]), float(r["s2_z"])],
                float(r["T60"]),
            )
            room.generate_rirs()
            for i, mics in enumerate(room.rir_reverberant):
                for j, source in enumerate(mics):
                    h = source
                    if sr != 16000:
                        h = _resample_poly(
                            np.asarray(source), 16000, sr
                        )
                    write_audio(
                        os.path.join(
                            output_dir, f"{i}_{j}_" + output_name
                        ),
                        np.asarray(h, np.float32),
                        sr,
                    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--output-dir", type=str, required=True)
    parser.add_argument("--sr", type=int, default=8000)
    parser.add_argument(
        "--splits", type=str, default="tr",
        help="comma-separated: tr,cv,tt",
    )
    args = parser.parse_args()
    create_rirs(
        args.output_dir, sr=args.sr, splits=args.splits.split(",")
    )
