"""Thin wrapper over the shared recursive resampler (see
``speechbrain_tpu.dataio.preprocess.resample_folder``); reference
counterpart ``generate_dataset/local/resample_folder.py``."""

from speechbrain_tpu.dataio.preprocess import resample_folder  # noqa: F401
