"""Infrastructure utilities: checkpoints, metrics, data pipeline, logging."""

from speechbrain_tpu.utils import (  # noqa: F401
    checkpoints,
    data_pipeline,
    data_utils,
    depgraph,
    distributed,
    edit_distance,
    epoch_loop,
    hyperyaml,
    logger,
    metric_stats,
    superpowers,
    train_logger,
)
