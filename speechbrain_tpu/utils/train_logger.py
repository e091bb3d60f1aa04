"""Epoch-level training loggers: file, TensorBoard, W&B.

Parity targets: reference ``utils/train_logger.py:14,46,104,176``.
"""

import logging

logger = logging.getLogger(__name__)

__all__ = [
    "TrainLogger",
    "FileTrainLogger",
    "TensorboardLogger",
    "WandBLogger",
]


class TrainLogger:
    """Abstract interface: log one train/valid/test report per call."""

    def log_stats(
        self,
        stats_meta,
        train_stats=None,
        valid_stats=None,
        test_stats=None,
        verbose=False,
    ):
        """Log one stats entry (epoch/train/valid/test)."""
        raise NotImplementedError


class FileTrainLogger(TrainLogger):
    """One line per epoch in a text file.

    Example line:
    ``epoch: 2, lr: 1.00e-03 - train loss: 2.31 - valid loss: 2.10``
    """

    def __init__(self, save_file, precision=2):
        self.save_file = save_file
        self.precision = precision

    def _item_to_string(self, key, value, dataset=None):
        if isinstance(value, float) and 1.0 < value < 100.0:
            value = f"{value:.{self.precision}f}"
        elif isinstance(value, float):
            value = f"{value:.{self.precision}e}"
        if dataset is not None:
            key = f"{dataset} {key}"
        return f"{key}: {value}"

    def _stats_to_string(self, stats, dataset=None):
        return ", ".join(
            self._item_to_string(k, v, dataset) for k, v in stats.items()
        )

    def log_stats(
        self,
        stats_meta,
        train_stats=None,
        valid_stats=None,
        test_stats=None,
        verbose=True,
    ):
        """Log one stats entry (epoch/train/valid/test)."""
        string_summary = self._stats_to_string(stats_meta)
        for dataset, stats in [
            ("train", train_stats),
            ("valid", valid_stats),
            ("test", test_stats),
        ]:
            if stats is not None:
                string_summary += " - " + self._stats_to_string(stats, dataset)
        with open(self.save_file, "a") as fout:
            print(string_summary, file=fout)
        if verbose:
            logger.info(string_summary)


class TensorboardLogger(TrainLogger):
    """Scalars to TensorBoard via flax.metrics or tensorboardX if present."""

    def __init__(self, save_dir):
        self.save_dir = save_dir
        self.writer = None
        self.global_step = {"train": {}, "valid": {}, "test": {}, "meta": 0}
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(self.save_dir)
        except Exception as e:  # pragma: no cover
            logger.warning(f"TensorBoard writer unavailable: {e}")

    def log_stats(
        self,
        stats_meta,
        train_stats=None,
        valid_stats=None,
        test_stats=None,
        verbose=False,
    ):
        """Log one stats entry (epoch/train/valid/test)."""
        if self.writer is None:
            return
        self.global_step["meta"] += 1
        for name, value in stats_meta.items():
            if isinstance(value, (int, float)):
                self.writer.add_scalar(
                    name, value, self.global_step["meta"]
                )
        for dataset, stats in [
            ("train", train_stats),
            ("valid", valid_stats),
            ("test", test_stats),
        ]:
            if stats is None:
                continue
            for stat, value in stats.items():
                if not isinstance(value, (int, float)):
                    continue
                tag = f"{stat}/{dataset}"
                new_step = self.global_step[dataset].get(stat, 0) + 1
                self.global_step[dataset][stat] = new_step
                self.writer.add_scalar(tag, value, new_step)


class WandBLogger(TrainLogger):
    """Weights & Biases logger (optional dependency, lazily initialized)."""

    def __init__(self, initializer=None, **kwargs):
        try:
            import wandb

            if initializer is None:
                initializer = wandb.init
            self.run = initializer(**kwargs)
        except Exception as e:
            raise e

    def log_stats(
        self,
        stats_meta,
        train_stats=None,
        valid_stats=None,
        test_stats=None,
        verbose=False,
    ):
        """Log one stats entry (epoch/train/valid/test)."""
        logs = {}
        for dataset, stats in [
            ("train", train_stats),
            ("valid", valid_stats),
            ("test", test_stats),
        ]:
            if stats is not None:
                logs[dataset] = stats
        step = stats_meta.get("epoch", None)
        if step is not None:
            self.run.log({**logs, **stats_meta}, step=step)
        else:
            self.run.log({**logs, **stats_meta})
