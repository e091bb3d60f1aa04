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

__all__ = [
    "profile",
    "schedule",
    "export",
    "report_time",
    "profile_optimiser",
    "profile_analyst",
    "profile_report",
    "report_memory",
]


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


def _scheduled_step_profiler(
    brain, logdir, wait, warmup, active, detailed
):
    """Wrap ``fit_batch``/``evaluate_batch`` with a SCHEDULED
    jax.profiler capture: steps [0, wait+warmup) run untraced (compile
    + cache warm), then exactly ``active`` steps are captured, each
    inside a ``StepTraceAnnotation`` so XProf renders step boundaries.

    ``detailed`` toggles the analyst/optimiser split (reference
    ``utils/profiling.py:439,471``): analyst pays for host-side Python
    tracing (callstack attribution); optimiser keeps the capture lean
    so device timings are undisturbed.
    """
    import jax

    state = {"step": 0, "tracing": False, "done": False}
    start_at = wait + warmup
    stop_at = start_at + active

    def options():
        try:
            opts = jax.profiler.ProfileOptions()
            opts.python_tracer_level = 1 if detailed else 0
            opts.host_tracer_level = 2 if detailed else 1
            return opts
        except Exception:  # older jax: no options object
            return None

    def timed(method, name):
        @functools.wraps(method)
        def wrapped(*args, **kwargs):
            step = state["step"]
            state["step"] += 1
            if not state["done"] and step == start_at:
                os.makedirs(logdir, exist_ok=True)
                opts = options()
                if opts is not None:
                    jax.profiler.start_trace(
                        logdir, profiler_options=opts
                    )
                else:
                    jax.profiler.start_trace(logdir)
                state["tracing"] = True
            if state["tracing"]:
                with jax.profiler.StepTraceAnnotation(
                    name, step_num=step
                ):
                    out = method(*args, **kwargs)
                try:
                    jax.block_until_ready(out)
                except Exception:
                    pass
                if step + 1 >= stop_at:
                    jax.profiler.stop_trace()
                    state["tracing"] = False
                    state["done"] = True
                return out
            return method(*args, **kwargs)

        return wrapped

    brain.fit_batch = timed(brain.fit_batch, "fit_batch")
    brain.evaluate_batch = timed(brain.evaluate_batch, "evaluate_batch")
    brain.profiler_logdir = logdir
    return brain


def profile_analyst(
    brain_or_fn=None, logdir="./profiler_logs",
    wait=2, warmup=2, active=2,
):
    """Detailed scheduled capture — analyst preset (reference
    ``utils/profiling.py:439``): skips ``wait+warmup`` steps, records
    ``active`` steps with host-side Python tracing enabled (callstack
    attribution; adds overhead — use ``profile_optimiser`` for clean
    device timings)."""
    def attach(brain):
        return _scheduled_step_profiler(
            brain, logdir, wait, warmup, active, detailed=True
        )

    if brain_or_fn is None:
        return attach
    if callable(brain_or_fn) and not hasattr(brain_or_fn, "fit_batch"):
        return profile(brain_or_fn, logdir=logdir)
    return attach(brain_or_fn)


def profile_optimiser(
    brain_or_fn=None, logdir="./profiler_logs",
    wait=2, warmup=2, active=2,
):
    """Lean scheduled capture — optimiser preset (reference
    ``utils/profiling.py:471``): same schedule as ``profile_analyst``
    but host/Python tracing off, so the captured device timeline is
    what production steps actually cost."""
    def attach(brain):
        return _scheduled_step_profiler(
            brain, logdir, wait, warmup, active, detailed=False
        )

    if brain_or_fn is None:
        return attach
    if callable(brain_or_fn) and not hasattr(brain_or_fn, "fit_batch"):
        return profile(brain_or_fn, logdir=logdir)
    return attach(brain_or_fn)


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




def report_memory(report=None):
    """Peak device-memory bytes.

    With no argument, queries the live device allocator
    (``Device.memory_stats()``; 0 when the backend doesn't track, e.g.
    CPU).  With a ``profile_report`` summary dict, returns its recorded
    ``peak_bytes`` (reference ``utils/profiling.py:620`` reads the max
    self-CUDA memory from kineto events).
    """
    if report is not None:
        return report.get("peak_bytes", 0)
    import jax

    peak = 0
    for dev in jax.local_devices():
        stats = getattr(dev, "memory_stats", lambda: None)() or {}
        peak = max(peak, stats.get("peak_bytes_in_use", 0))
    return peak


def profile_report(brain_or_fn=None, logdir=None):
    """Aggregated per-batch timing + memory report (reference
    ``utils/profiling.py:500``: the ``profile_report`` preset attaches
    a profiler whose ``key_averages`` the recipe reads at the end).

    Wraps a Brain's ``fit_batch``/``evaluate_batch`` with
    device-synchronized timers; the summary lives at
    ``brain.profiler_report`` (updated after every batch):
    ``{"steps", "total_ms", "mean_ms", "p50_ms", "p90_ms",
    "max_ms", "peak_bytes"}``.

    Example
    -------
    >>> class T:
    ...     def fit_batch(self, batch):
    ...         return sum(batch)
    ...     def evaluate_batch(self, batch, stage=None):
    ...         return 0.0
    >>> t = profile_report(T())
    >>> _ = t.fit_batch([1, 2])
    >>> t.profiler_report["steps"]
    1
    """

    def attach(brain):
        records = []

        def timed(method):
            @functools.wraps(method)
            def wrapped(*args, **kwargs):
                import jax

                t0 = time.perf_counter()
                out = method(*args, **kwargs)
                try:
                    jax.block_until_ready(out)
                except Exception:
                    pass
                records.append((time.perf_counter() - t0) * 1000)
                brain.profiler_report = summarize()
                return out

            return wrapped

        def summarize():
            if not records:
                return {"steps": 0, "total_ms": 0.0, "peak_bytes": 0}
            srt = sorted(records)
            n = len(srt)
            return {
                "steps": n,
                "total_ms": sum(srt),
                "mean_ms": sum(srt) / n,
                "p50_ms": srt[n // 2],
                "p90_ms": srt[min(n - 1, int(0.9 * n))],
                "max_ms": srt[-1],
                "peak_bytes": report_memory(),
            }

        brain.profiler_report = summarize()
        brain.fit_batch = timed(brain.fit_batch)
        brain.evaluate_batch = timed(brain.evaluate_batch)
        if logdir is not None:
            return profile(brain, logdir=logdir)
        return brain

    if brain_or_fn is None:
        return attach
    return attach(brain_or_fn)


def set_profiler_attr(obj, set_attr, profiler):
    """Attach a profiler object to a Brain attribute (reference
    ``utils/profiling.py:270``-family helper)."""
    setattr(obj, set_attr, profiler)
    return obj


def hook_brain_methods(brain, profiler=None, methods=("fit", "evaluate")):
    """Wrap the given Brain methods with a jax.profiler trace
    (reference ``utils/profiling.py:270``)."""
    import functools as _functools

    import jax

    logdir = getattr(profiler, "logdir", "./profiler_logs")

    for name in methods:
        fn = getattr(brain, name, None)
        if fn is None:
            continue

        @_functools.wraps(fn)
        def wrapped(*args, __fn=fn, **kwargs):
            os.makedirs(logdir, exist_ok=True)
            with jax.profiler.trace(logdir):
                return __fn(*args, **kwargs)

        setattr(brain, name, wrapped)
    return brain


def prepare_profiler_for_brain(brain, logdir="./profiler_logs"):
    """Hook fit/evaluate with tracing and record the logdir on the
    Brain (reference ``utils/profiling.py:100``-family)."""
    brain.profiler_logdir = logdir
    return hook_brain_methods(brain)
