"""DSP: feature frontend, signal ops, augmentation, beamforming, PLDA."""

from speechbrain_tpu.processing import (  # noqa: F401
    NMF,
    PLDA_LDA,
    decomposition,
    diarization,
    features,
    multi_mic,
    signal_processing,
    speech_augmentation,
)
