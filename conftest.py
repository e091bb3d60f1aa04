"""Root test config: force JAX onto a virtual 8-device CPU platform.

The axon TPU plugin in this image overrides the JAX_PLATFORMS env var,
so the platform must be forced through jax.config after import (before
backend initialization).  Applies to doctests collected from
speechbrain_tpu/ as well as tests/.  Benchmarks (bench.py) run outside
pytest and use the real TPU.
"""

import os

# Keep CPU test runs hermetic: the persistent compile cache is for
# TPU entry points (bench/__graft_entry__), not the virtual-CPU suite.
os.environ.setdefault("SB_TPU_NO_COMPILE_CACHE", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
