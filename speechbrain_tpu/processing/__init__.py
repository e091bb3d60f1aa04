"""DSP: feature frontend, signal ops, augmentation, beamforming, PLDA."""

from speechbrain_tpu.processing import (  # noqa: F401
    features,
    signal_processing,
    speech_augmentation,
)
