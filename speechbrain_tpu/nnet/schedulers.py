"""Learning-rate schedulers (host-side, checkpointable).

Schedulers are called BY RECIPE CODE (not the Brain), mirroring the
reference (``nnet/schedulers.py``).  Each returns (old_lr, new_lr); the
recipe feeds new_lr into the optax optimizer via inject_hyperparams.

Parity targets: reference ``nnet/schedulers.py:58`` (NewBob), ``:153,
199,287`` (Linear/Warmup/Step), ``:362`` (Noam), ``:459`` (CyclicCosine),
``:562`` (ReduceLROnPlateau), ``:675`` (CyclicLR), ``:847,953,997``.
"""

import logging
import math

from speechbrain_tpu.utils.checkpoints import (
    mark_as_loader,
    mark_as_saver,
    register_checkpoint_hooks,
)

__all__ = [
    "NewBobScheduler",
    "LinearScheduler",
    "LinearWarmupScheduler",
    "StepScheduler",
    "NoamScheduler",
    "CyclicCosineScheduler",
    "ReduceLROnPlateau",
    "CyclicLRScheduler",
    "IntervalScheduler",
    "InverseSquareRootScheduler",
    "WarmCoolDecayScheduler",
]


def _save_attrs(obj, path, attrs):
    import json

    with open(path, "w") as f:
        json.dump({a: getattr(obj, a) for a in attrs}, f)


def _load_attrs(obj, path, attrs):
    import json

    with open(path) as f:
        data = json.load(f)
    for a in attrs:
        if a in data:
            setattr(obj, a, data[a])


@register_checkpoint_hooks
class NewBobScheduler:
    """Metric-driven annealing: halve lr when improvement is too small.

    Example
    -------
    >>> scheduler = NewBobScheduler(initial_value=1.0)
    >>> scheduler(0.5)
    (1.0, 1.0)
    >>> scheduler(0.5)
    (1.0, 0.5)
    """

    def __init__(
        self,
        initial_value,
        annealing_factor=0.5,
        improvement_threshold=0.0025,
        patient=0,
    ):
        self.hyperparam_value = initial_value
        self.annealing_factor = annealing_factor
        self.improvement_threshold = improvement_threshold
        self.patient = patient
        self.metric_values = []
        self.current_patient = self.patient

    def __call__(self, metric_value):
        old_value = new_value = self.hyperparam_value
        if len(self.metric_values) > 0:
            prev_metric = self.metric_values[-1]
            if prev_metric == 0:
                improvement = 0
            else:
                improvement = (prev_metric - metric_value) / prev_metric
            if improvement < self.improvement_threshold:
                if self.current_patient == 0:
                    new_value = old_value * self.annealing_factor
                    self.current_patient = self.patient
                else:
                    self.current_patient -= 1
        self.metric_values.append(float(metric_value))
        self.hyperparam_value = new_value
        return old_value, new_value

    @mark_as_saver
    def _save(self, path):
        _save_attrs(
            self, path, ["hyperparam_value", "metric_values", "current_patient"]
        )

    @mark_as_loader
    def _load(self, path, end_of_epoch=True):
        _load_attrs(
            self, path, ["hyperparam_value", "metric_values", "current_patient"]
        )


@register_checkpoint_hooks
class LinearScheduler:
    """Linear interpolation between initial and final over N epochs.

    Example
    -------
    >>> scheduler = LinearScheduler(1.0, 0.0, epoch_count=5)
    >>> scheduler(1)
    (1.0, 0.75)
    """

    def __init__(self, initial_value, final_value, epoch_count):
        self.initial_value = initial_value
        self.final_value = final_value
        self.epoch_count = epoch_count

    def __call__(self, epoch):
        old = self._value(epoch - 1)
        new = self._value(epoch)
        return old, new

    def _value(self, epoch):
        frac = min(max(epoch, 0), self.epoch_count - 1) / (self.epoch_count - 1)
        return self.initial_value + frac * (
            self.final_value - self.initial_value
        )

    @mark_as_saver
    def _save(self, path):
        _save_attrs(self, path, [])

    @mark_as_loader
    def _load(self, path, end_of_epoch=True):
        pass


@register_checkpoint_hooks
class LinearWarmupScheduler:
    """Linear warmup then linear decay over total steps (per-step)."""

    def __init__(self, initial_value, num_warmup_steps, num_training_steps):
        self.initial_value = initial_value
        self.num_warmup_steps = num_warmup_steps
        self.num_training_steps = num_training_steps
        self.current_step = 0

    def get_next_value(self):
        """Next hyperparameter value to try."""
        step = self.current_step
        self.current_step += 1
        if step < self.num_warmup_steps:
            return self.initial_value * step / max(1, self.num_warmup_steps)
        return self.initial_value * max(
            0.0,
            (self.num_training_steps - step)
            / max(1, self.num_training_steps - self.num_warmup_steps),
        )

    @mark_as_saver
    def _save(self, path):
        _save_attrs(self, path, ["current_step"])

    @mark_as_loader
    def _load(self, path, end_of_epoch=True):
        _load_attrs(self, path, ["current_step"])


@register_checkpoint_hooks
class StepScheduler:
    """lr * decay^floor(epoch / decay_drop).

    Example
    -------
    >>> s = StepScheduler(1.0, decay_factor=0.5, decay_drop=2)
    >>> s(2)[1]
    0.5
    """

    def __init__(self, initial_value, decay_factor=0.5, decay_drop=2):
        self.initial_value = initial_value
        self.decay_factor = decay_factor
        self.decay_drop = decay_drop

    def __call__(self, epoch):
        old = self._value(epoch - 1)
        new = self._value(epoch)
        return old, new

    def _value(self, epoch):
        return self.initial_value * math.pow(
            self.decay_factor, math.floor((1 + epoch) / self.decay_drop)
        )

    @mark_as_saver
    def _save(self, path):
        _save_attrs(self, path, [])

    @mark_as_loader
    def _load(self, path, end_of_epoch=True):
        pass


@register_checkpoint_hooks
class NoamScheduler:
    """lr * n_warmup^0.5 * min(step^-0.5, step * warmup^-1.5), per step.

    The transformer-recipe default (stepped after each optimizer step,
    reference ``nnet/schedulers.py:362``).

    Example
    -------
    >>> s = NoamScheduler(lr_initial=1.0, n_warmup_steps=10)
    >>> _, lr1 = s(None)
    >>> _, lr2 = s(None)
    >>> lr2 > lr1
    True
    """

    def __init__(self, lr_initial, n_warmup_steps, model_size=None):
        self.lr_initial = lr_initial
        self.n_warmup_steps = n_warmup_steps
        self.current_lr = lr_initial
        self.n_steps = 0
        self.normalize = n_warmup_steps ** 0.5
        if model_size is not None:
            self.normalize = model_size ** (-0.5)

    def __call__(self, opt_or_none=None):
        self.n_steps += 1
        current_lr = self.current_lr
        lr = self.lr_initial * self._get_lr_scale()
        self.current_lr = lr
        return current_lr, lr

    def _get_lr_scale(self):
        n_steps, n_warmup_steps = self.n_steps, self.n_warmup_steps
        return self.normalize * min(
            n_steps ** (-0.5), n_steps * n_warmup_steps ** (-1.5)
        )

    @mark_as_saver
    def _save(self, path):
        _save_attrs(self, path, ["current_lr", "n_steps"])

    @mark_as_loader
    def _load(self, path, end_of_epoch=True):
        _load_attrs(self, path, ["current_lr", "n_steps"])


@register_checkpoint_hooks
class CyclicCosineScheduler:
    """Cosine annealing with warmup restarts (per step)."""

    def __init__(self, n_warmup_steps, lr_initial=None, total_steps=100000):
        self.n_warmup_steps = n_warmup_steps
        self.lr_initial = lr_initial
        self.total = total_steps
        self.n_steps = 0
        self.current_lr = lr_initial

    def __call__(self, opt_or_none=None):
        self.n_steps += 1
        current_lr = self.current_lr
        lr = self.lr_initial * self._get_lr_scale()
        self.current_lr = lr
        return current_lr, lr

    def _get_lr_scale(self):
        n = self.n_steps
        if n < self.n_warmup_steps:
            return n / max(1, self.n_warmup_steps)
        progress = (n - self.n_warmup_steps) / max(
            1, self.total - self.n_warmup_steps
        )
        return 0.5 * (1 + math.cos(math.pi * min(progress, 1.0)))

    @mark_as_saver
    def _save(self, path):
        _save_attrs(self, path, ["current_lr", "n_steps"])

    @mark_as_loader
    def _load(self, path, end_of_epoch=True):
        _load_attrs(self, path, ["current_lr", "n_steps"])


@register_checkpoint_hooks
class ReduceLROnPlateau:
    """Reduce lr when a metric stops improving (with patience).

    Example
    -------
    >>> s = ReduceLROnPlateau(lr_min=0.1, factor=0.5, patience=0)
    >>> s(1.0, current_epoch=1, current_loss=10.0)
    (1.0, 1.0)
    >>> s(1.0, current_epoch=2, current_loss=11.0)
    (1.0, 0.5)
    """

    def __init__(self, lr_min=1e-8, factor=0.5, patience=2, dont_halve_until_epoch=0):
        self.lr_min = lr_min
        self.factor = factor
        self.patience = patience
        self.patience_counter = 0
        self.losses = []
        self.dont_halve_until_epoch = dont_halve_until_epoch
        self.anchor = 99999.0

    def __call__(self, current_lr, current_epoch, current_loss):
        if current_epoch <= self.dont_halve_until_epoch:
            next_lr = current_lr
            self.anchor = current_loss
        else:
            if current_loss <= self.anchor:
                self.patience_counter = 0
                next_lr = current_lr
                self.anchor = current_loss
            elif self.patience_counter < self.patience:
                self.patience_counter += 1
                next_lr = current_lr
            else:
                next_lr = current_lr * self.factor
                self.patience_counter = 0
        next_lr = max(self.lr_min, next_lr)
        self.losses.append(float(current_loss))
        return current_lr, next_lr

    @mark_as_saver
    def _save(self, path):
        _save_attrs(
            self, path, ["losses", "anchor", "patience_counter"]
        )

    @mark_as_loader
    def _load(self, path, end_of_epoch=True):
        _load_attrs(
            self, path, ["losses", "anchor", "patience_counter"]
        )


@register_checkpoint_hooks
class CyclicLRScheduler:
    """Triangular cyclic lr between base and max (per step)."""

    def __init__(self, base_lr=0.001, max_lr=0.006, step_size=2000, mode="triangular", gamma=1.0):
        self.base_lr = base_lr
        self.max_lr = max_lr
        self.step_size = step_size
        self.mode = mode
        self.gamma = gamma
        self.clr_iterations = 0
        self.current_lr = base_lr

    def _scale(self, x):
        if self.mode == "triangular":
            return 1.0
        if self.mode == "triangular2":
            return 1 / (2.0 ** (x - 1))
        return self.gamma ** x

    def __call__(self, opt_or_none=None):
        self.clr_iterations += 1
        current = self.current_lr
        cycle = math.floor(1 + self.clr_iterations / (2 * self.step_size))
        x = abs(self.clr_iterations / self.step_size - 2 * cycle + 1)
        lr = self.base_lr + (self.max_lr - self.base_lr) * max(
            0, 1 - x
        ) * self._scale(cycle)
        self.current_lr = lr
        return current, lr

    @mark_as_saver
    def _save(self, path):
        _save_attrs(self, path, ["clr_iterations", "current_lr"])

    @mark_as_loader
    def _load(self, path, end_of_epoch=True):
        _load_attrs(self, path, ["clr_iterations", "current_lr"])


@register_checkpoint_hooks
class IntervalScheduler:
    """Explicit (step, lr) breakpoint table."""

    def __init__(self, intervals):
        self.intervals = intervals  # list of {"steps": int, "lr": float}
        self.n_steps = 0
        self.current_lr = None

    def __call__(self, opt_or_none=None):
        self.n_steps += 1
        current = self.current_lr
        for interval in self.intervals:
            if self.n_steps >= interval["steps"]:
                self.current_lr = interval["lr"]
        return current, self.current_lr

    @mark_as_saver
    def _save(self, path):
        _save_attrs(self, path, ["n_steps", "current_lr"])

    @mark_as_loader
    def _load(self, path, end_of_epoch=True):
        _load_attrs(self, path, ["n_steps", "current_lr"])


@register_checkpoint_hooks
class InverseSquareRootScheduler:
    """lr = initial * sqrt(warmup) / sqrt(max(step, warmup))."""

    def __init__(self, lr_initial, n_warmup_steps):
        self.lr_initial = lr_initial
        self.n_warmup_steps = n_warmup_steps
        self.n_steps = 0
        self.current_lr = lr_initial

    def __call__(self, opt_or_none=None):
        self.n_steps += 1
        current = self.current_lr
        lr = (
            self.lr_initial
            * self.n_warmup_steps ** 0.5
            / max(self.n_steps, self.n_warmup_steps) ** 0.5
        )
        if self.n_steps < self.n_warmup_steps:
            lr = self.lr_initial * self.n_steps / self.n_warmup_steps
        self.current_lr = lr
        return current, lr

    @mark_as_saver
    def _save(self, path):
        _save_attrs(self, path, ["n_steps", "current_lr"])

    @mark_as_loader
    def _load(self, path, end_of_epoch=True):
        _load_attrs(self, path, ["n_steps", "current_lr"])


@register_checkpoint_hooks
class WarmCoolDecayScheduler:
    """Warmup -> hold -> cooldown -> exponential decay (per step)."""

    def __init__(self, lr, warmup, cooldown, total_steps, decay_factor=0.75, decay_every=100000):
        self.lr = lr
        self.warmup = warmup
        self.cooldown = cooldown
        self.total_steps = total_steps
        self.decay_factor = decay_factor
        self.decay_every = decay_every
        self.n_steps = 0
        self.current_lr = 0.0

    def __call__(self, opt_or_none=None):
        self.n_steps += 1
        current = self.current_lr
        n = self.n_steps
        if n <= self.warmup:
            lr = self.lr * n / self.warmup
        elif n <= self.total_steps - self.cooldown:
            past = n - self.warmup
            lr = self.lr * self.decay_factor ** (past / self.decay_every)
        else:
            start_cool = self.total_steps - self.cooldown
            lr_at_cool = self.lr * self.decay_factor ** (
                (start_cool - self.warmup) / self.decay_every
            )
            frac = (n - start_cool) / max(1, self.cooldown)
            lr = lr_at_cool * max(0.0, 1 - frac)
        self.current_lr = lr
        return current, lr

    @mark_as_saver
    def _save(self, path):
        _save_attrs(self, path, ["n_steps", "current_lr"])

    @mark_as_loader
    def _load(self, path, end_of_epoch=True):
        _load_attrs(self, path, ["n_steps", "current_lr"])


logger = logging.getLogger(__name__)


def update_learning_rate(optimizer, new_lr, param_group=None):
    """Change the learning rate on a Brain-like object or a dict-style
    optimizer state (reference ``nnet/schedulers.py:19``; optax
    schedules are pure, so the mutable lr lives on the Brain).

    Example
    -------
    >>> class FakeBrain: lr = 0.1
    >>> b = FakeBrain()
    >>> update_learning_rate(b, 0.2)
    >>> b.lr
    0.2
    """
    del param_group  # single param group in this framework
    if hasattr(optimizer, "lr"):
        old_lr = optimizer.lr
        if new_lr != old_lr:
            optimizer.lr = new_lr
            logger.info("Changing lr from %.2g to %.2g", old_lr, new_lr)
    elif isinstance(optimizer, dict) and "lr" in optimizer:
        optimizer["lr"] = new_lr
    else:
        raise TypeError(
            "update_learning_rate expects a Brain-like object with an "
            "``lr`` attribute or a dict with an 'lr' key"
        )


# Reference-name alias (reference ``nnet/schedulers.py:997``).
WarmCoolDecayLRSchedule = WarmCoolDecayScheduler
