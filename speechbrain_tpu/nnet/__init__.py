"""NN primitives: conv/rnn/attention/losses/normalization/schedulers."""

from speechbrain_tpu.nnet import (  # noqa: F401
    CNN,
    RNN,
    activations,
    attention,
    containers,
    dropout,
    embedding,
    linear,
    losses,
    normalization,
    pooling,
    schedulers,
)
