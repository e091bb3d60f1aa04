"""Profiling wrappers: jax.profiler traces around Brain methods.

The reference wraps ``torch.profiler`` with schedule/export decorators
(``utils/profiling.py:62,100,270,300``).  The TPU equivalents:

- ``profile`` hooks Brain.fit/evaluate to capture a jax.profiler trace
  (viewable in XProf/Perfetto/TensorBoard).
- ``report_time`` measures wall time per step with block_until_ready
  (device-accurate timing).
- ``schedule`` produces (wait, warmup, active) step gating.
"""

import functools
import logging
import os
import time

logger = logging.getLogger(__name__)

__all__ = ["profile", "schedule", "export", "report_time", "profile_optimiser"]


def schedule(wait=2, warmup=2, active=2, repeat=1):
    """Step-gating predicate: returns fn(step)->bool (capture active?)."""
    cycle = wait + warmup + active

    def should_capture(step):
        if repeat and step >= cycle * repeat:
            return False
        return (step % cycle) >= (wait + warmup)

    return should_capture


def export(logdir="./profiler_logs"):
    """Trace-export configuration (directory for jax.profiler)."""
    os.makedirs(logdir, exist_ok=True)
    return logdir


def profile(brain_or_fn=None, logdir="./profiler_logs", num_steps=None):
    """Wrap a Brain instance (hooking fit/evaluate) or a function with a
    jax.profiler trace."""
    import jax

    def wrap_callable(fn):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            os.makedirs(logdir, exist_ok=True)
            with jax.profiler.trace(logdir):
                return fn(*args, **kwargs)

        return wrapped

    if brain_or_fn is None:
        return wrap_callable
    if callable(brain_or_fn) and not hasattr(brain_or_fn, "fit"):
        return wrap_callable(brain_or_fn)
    brain = brain_or_fn
    brain.fit = wrap_callable(brain.fit)
    brain.evaluate = wrap_callable(brain.evaluate)
    return brain


profile_optimiser = profile  # preset alias (reference :471)


def report_time(fn=None, n_warmup=1, n_steps=10):
    """Decorator measuring device-synchronized wall time of a callable.

    The wrapped function gains a ``.last_timing_ms`` attribute.

    Example
    -------
    >>> @report_time
    ... def f(x):
    ...     return x * 2
    >>> _ = f(21)
    >>> f.last_timing_ms >= 0
    True
    """

    def deco(func):
        @functools.wraps(func)
        def wrapped(*args, **kwargs):
            import jax

            t0 = time.perf_counter()
            out = func(*args, **kwargs)
            try:
                jax.block_until_ready(out)
            except Exception:
                pass
            wrapped.last_timing_ms = (time.perf_counter() - t0) * 1000
            return out

        wrapped.last_timing_ms = 0.0
        return wrapped

    if fn is not None:
        return deco(fn)
    return deco
