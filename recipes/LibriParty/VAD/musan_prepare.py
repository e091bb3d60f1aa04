#!/usr/bin/env python3
"""MUSAN preparation for VAD training (torch/torchaudio-free).

Role counterpart of the reference
``recipes/LibriParty/VAD/musan_prepare.py``: walks the music/noise/
speech subfolders, downmixes multi-channel files, slices waveforms
longer than ``max_noise_len`` into pieces (rewriting the audio like the
reference does, so re-runs are idempotent), and emits the reference CSV
schema ``ID,duration,wav,wav_format,wav_opts`` consumed by the
``AddNoise``-style CSV samplers.
"""

import logging
import os

import numpy as np

from speechbrain_tpu.utils.data_utils import get_all_files
from speechbrain_tpu.utils.distributed import if_main_process, ddp_barrier

logger = logging.getLogger(__name__)


def prepare_musan(
    folder, music_csv, noise_csv, speech_csv, max_noise_len=None
):
    """Prepare the musan dataset (music, noise, speech).

    Arguments
    ---------
    folder : str
        The location of the folder containing the dataset.
    music_csv / noise_csv / speech_csv : str
        Filenames for the prepared per-category csvs.
    max_noise_len : float
        The maximum noise length in seconds.  Noises longer than this
        are cut into pieces.
    """
    sub_folders = ["music", "noise", "speech"]
    csv_files = [music_csv, noise_csv, speech_csv]
    logger.info("Musan Data Preparation...")
    for sub_folder, csv_file in zip(sub_folders, csv_files):
        wav_lst = get_all_files(
            os.path.join(folder, sub_folder), match_and=[".wav"]
        )
        if not os.path.isfile(csv_file):
            logger.info("%s creation...", csv_file)
            prepare_noise_csv(folder, wav_lst, csv_file, max_noise_len)


def prepare_noise_csv(folder, filelist, csv_file, max_length=None):
    """Write the reference-schema CSV for a list of wavs, slicing files
    longer than ``max_length`` seconds (shared with
    ``commonlanguage_prepare``)."""
    from speechbrain_tpu.dataio.dataio import read_audio, write_audio

    try:
        if if_main_process():
            with open(csv_file, "w") as w:
                w.write("ID,duration,wav,wav_format,wav_opts\n\n")
                for line in filelist:
                    filename = os.path.join(folder, line.split()[-1])
                    signal = read_audio(filename)
                    rate = 16000
                    try:
                        import wave

                        with wave.open(filename, "rb") as wf:
                            rate = wf.getframerate()
                    except Exception:
                        pass
                    # ensure a single channel (rewrite like the
                    # reference so downstream loads are mono)
                    if signal.ndim > 1:
                        signal = np.asarray(signal)[:, 0]
                        write_audio(filename, signal, rate)
                    signal = np.asarray(signal)
                    ID, ext = os.path.basename(filename).split(".")
                    duration = signal.shape[0] / rate
                    if max_length is not None and duration > max_length:
                        # slice long waveforms into max_length pieces
                        os.remove(filename)
                        for i in range(int(duration / max_length)):
                            start = int(max_length * i * rate)
                            stop = int(
                                min(max_length * (i + 1), duration)
                                * rate
                            )
                            new_filename = (
                                filename[: -len(f".{ext}")] + f"_{i}.{ext}"
                            )
                            write_audio(
                                new_filename, signal[start:stop], rate
                            )
                            w.write(
                                ",".join(
                                    (
                                        f"{ID}_{i}",
                                        str((stop - start) / rate),
                                        new_filename,
                                        ext,
                                        "\n",
                                    )
                                )
                            )
                    else:
                        w.write(
                            ",".join(
                                (ID, str(duration), filename, ext, "\n")
                            )
                        )
    finally:
        ddp_barrier()
