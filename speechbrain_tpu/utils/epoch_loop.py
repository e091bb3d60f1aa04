"""Checkpoint-recoverable epoch iteration.

Parity targets: reference ``utils/epoch_loop.py:16`` (EpochCounter) and
``:71`` (EpochCounterWithStopper early stopping).

Example
-------
>>> counter = EpochCounter(3)
>>> [e for e in counter]
[1, 2, 3]
"""

import logging

from speechbrain_tpu.utils.checkpoints import (
    mark_as_loader,
    mark_as_saver,
    register_checkpoint_hooks,
)

logger = logging.getLogger(__name__)

__all__ = ["EpochCounter", "EpochCounterWithStopper"]


@register_checkpoint_hooks
class EpochCounter:
    """Iterator yielding epoch numbers 1..limit; resumes from checkpoints."""

    def __init__(self, limit):
        self.current = 0
        self.limit = int(limit)

    def __iter__(self):
        return self

    def __next__(self):
        if self.current < self.limit:
            self.current += 1
            logger.info(f"Going into epoch {self.current}")
            return self.current
        raise StopIteration

    @mark_as_saver
    def _save(self, path):
        with open(path, "w") as fo:
            fo.write(str(self.current))

    @mark_as_loader
    def _recover(self, path, end_of_epoch=True):
        with open(path) as fi:
            saved_value = int(fi.read())
            if end_of_epoch:
                self.current = saved_value
            else:
                # Mid-epoch recovery: the saved epoch did not complete.
                self.current = saved_value - 1


class EpochCounterWithStopper(EpochCounter):
    """EpochCounter with early stopping on a tracked metric.

    Arguments
    ---------
    limit : int
        Max epochs.
    limit_to_stop : int
        Number of consecutive non-improving epochs tolerated.
    limit_warmup : int
        Epochs before stopping logic activates.
    direction : "min" | "max"
        Whether lower or higher metric is better.

    Example
    -------
    >>> epoch_counter = EpochCounterWithStopper(limit=10, limit_to_stop=1,
    ...                                         limit_warmup=0, direction="min")
    >>> losses = [1.0, 0.9, 0.8, 0.9, 0.9]
    >>> ran = []
    >>> for epoch in epoch_counter:
    ...     ran.append(epoch)
    ...     epoch_counter.update_metric(losses[epoch - 1])
    >>> ran
    [1, 2, 3, 4, 5]
    """

    def __init__(self, limit, limit_to_stop, limit_warmup, direction):
        super().__init__(limit)
        self.limit_to_stop = int(limit_to_stop)
        self.limit_warmup = int(limit_warmup)
        self.direction = direction
        if self.limit_to_stop < 0:
            raise ValueError("Stopper 'limit_to_stop' must be >= 0")
        if self.limit_warmup < 0:
            raise ValueError("Stopper 'limit_warmup' must be >= 0")
        if direction == "min":
            self.min_delta = 1e-6
            self.best_limit = float("inf")
            self.th = lambda x: x < self.best_limit - self.min_delta
        elif direction == "max":
            self.min_delta = 1e-6
            self.best_limit = float("-inf")
            self.th = lambda x: x > self.best_limit + self.min_delta
        else:
            raise ValueError("Stopper 'direction' must be 'min' or 'max'")
        self.wait = 0
        self.should_stop = False

    def __next__(self):
        if self.should_stop:
            raise StopIteration
        return super().__next__()

    def update_metric(self, current_metric):
        """Record this epoch's tracked metric; sets ``should_stop``."""
        if self.current > self.limit_warmup:
            if self.th(current_metric):
                self.best_limit = current_metric
                self.wait = 0
            else:
                self.wait += 1
                if self.wait > self.limit_to_stop:
                    self.should_stop = True
