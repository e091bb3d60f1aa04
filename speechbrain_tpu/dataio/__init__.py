"""Data loading: datasets, bucketed batching, samplers, encoders, audio I/O."""

from speechbrain_tpu.dataio import (  # noqa: F401
    batch,
    dataio,
    dataloader,
    dataset,
    encoder,
    iterators,
    preprocess,
    sampler,
    wer,
)
