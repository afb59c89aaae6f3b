"""Test configuration: force an 8-device virtual CPU mesh.

This is the standard JAX way to exercise pjit/shard_map collectives without a
TPU pod (SURVEY.md §4c). Must run before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize registers a remote-TPU ("axon") PJRT plugin
# in every interpreter; initializing it claims the TPU tunnel and can take
# minutes. Tests are CPU-only: deregister the factory before any backend
# initialization so jax never dials the tunnel.
try:
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
