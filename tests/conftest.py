"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding/mesh tests use
XLA's host-platform device-count override, mirroring the reference's
gloo-on-localhost distributed test strategy (SURVEY.md §4.4).
"""

import pytest


@pytest.fixture(scope="session")
def mesh8():
    """An 8-device data-parallel mesh on the virtual CPU platform."""
    import jax
    from jax.sharding import Mesh
    import numpy as np

    devices = np.array(jax.devices()[:8])
    return Mesh(devices, ("data",))
