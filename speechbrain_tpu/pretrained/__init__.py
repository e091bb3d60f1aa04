"""Pretrained-model inference interfaces."""

from speechbrain_tpu.pretrained.fetching import fetch  # noqa: F401
from speechbrain_tpu.pretrained.interfaces import (  # noqa: F401
    EncoderASR,
    EncoderClassifier,
    EncoderDecoderASR,
    EndToEndSLU,
    GraphemeToPhoneme,
    HIFIGAN,
    Pretrained,
    SepformerSeparation,
    SNREstimator,
    SpeakerRecognition,
    SpectralMaskEnhancement,
    Tacotron2,
    Tacotron2TTS,
    VAD,
    WaveformEncoder,
    WaveformEnhancement,
    foreign_class,
)
