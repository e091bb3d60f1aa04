"""Host-traced jit: AOT compile with trace-time constants on the host.

Tracing a function eagerly materializes its closure constants (masks,
positional tables, iotas) on the DEFAULT device; when the accelerator
sits behind a remote-dispatch link, MLIR lowering then pulls every one
back with a blocking ``device_get`` — measured on the dev TPU tunnel:
>20 minutes to lower the beam-search program, ~60 s when the trace
runs under a cpu default_device instead (PERFORMANCE.md round 3).

``host_traced_jit(fn)`` returns a callable with jax.jit semantics for
positional-array arguments whose traces/lowers run under the host CPU
device; compiled executables are cached per argument
(structure, shape, dtype) signature.
"""

import jax

__all__ = ["host_traced_jit"]


def _abstract_sig(args):
    # jax.Array leaves carry a precomputed hashable ShapedArray aval —
    # ~16x cheaper per call than building (shape, str(dtype)) tuples
    # (dispatch-path cost at train-state leaf counts: 2.2 ms -> 0.13 ms).
    leaves, treedef = jax.tree_util.tree_flatten(args)
    sig = []
    for x in leaves:
        aval = getattr(x, "aval", None)
        if aval is None:
            aval = (getattr(x, "shape", ()), str(getattr(x, "dtype", type(x))))
        sig.append(aval)
    return (treedef, tuple(sig))


class _HostTracedJit:
    def __init__(self, fn, jit_kwargs):
        self._fn = fn
        self._jit_kwargs = jit_kwargs
        self._cache = {}

    def clear_cache(self):
        """Drop compiled executables (e.g. after rebinding closures)."""
        self._cache = {}

    def lower(self, *args):
        """AOT ``jax.jit(...).lower`` with host-side trace constants.

        Exposes the jax.stages surface (``.compile()``,
        ``.cost_analysis()`` via the compiled object) so callers like
        bench.py's ``_step_flops`` can treat this like a ``jax.jit``
        wrapper.

        Accelerator-resident arguments are COMMITTED to their current
        devices first: uncommitted arrays follow the default device,
        and under the cpu-default-device trace the whole program would
        otherwise silently compile for (and run on) the CPU backend.
        CPU-resident and multi-device (sharded) arrays are left
        untouched — pinning an uncommitted CPU array to one device
        would CONFLICT with sharded siblings on a multi-device CPU
        mesh, and sharded arrays are already committed.
        """
        try:
            cpus = jax.devices("cpu")
        except RuntimeError:
            cpus = []

        def _commit(x):
            if not isinstance(x, jax.Array):
                return x
            try:
                d = x.device  # raises for multi-device arrays
            except Exception:
                return x
            if getattr(d, "platform", "cpu") != "cpu":
                return jax.device_put(x, d)
            return x

        args = jax.tree_util.tree_map(_commit, args)
        jitted = jax.jit(self._fn, **self._jit_kwargs)
        if cpus:
            with jax.default_device(cpus[0]):
                return jitted.lower(*args)
        return jitted.lower(*args)

    def __call__(self, *args):
        key = _abstract_sig(args)
        compiled = self._cache.get(key)
        if compiled is None:
            compiled = self.lower(*args).compile()
            self._cache[key] = compiled
        return compiled(*args)


def host_traced_jit(fn, **jit_kwargs):
    """jax.jit variant that traces under a cpu default_device.

    Accepts jax.jit keyword arguments (``donate_argnums``, ...).

    Example
    -------
    >>> import jax.numpy as jnp
    >>> f = host_traced_jit(lambda x: x * 2 + jnp.ones(3))
    >>> out = f(jnp.ones(3))
    >>> [float(v) for v in out]
    [3.0, 3.0, 3.0]
    """
    return _HostTracedJit(fn, jit_kwargs)
