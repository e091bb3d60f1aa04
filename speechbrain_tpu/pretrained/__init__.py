"""Pretrained-model inference interfaces."""

from speechbrain_tpu.pretrained.fetching import fetch  # noqa: F401
from speechbrain_tpu.pretrained.interfaces import (  # noqa: F401
    EncoderASR,
    EncoderClassifier,
    EncoderDecoderASR,
    Pretrained,
    SepformerSeparation,
    SpeakerRecognition,
    SpectralMaskEnhancement,
    VAD,
    foreign_class,
)
