"""Test configuration: force an 8-device virtual CPU mesh.

This is the standard JAX way to exercise pjit/shard_map collectives without a
TPU pod (SURVEY.md §4c). Must run before jax initializes its backends.
"""

import os
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compilation cache: the 1-core test VM pays heavily for XLA
# compiles; cache them across tests and sessions
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(tempfile.gettempdir(), "a2v_jax_cache")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
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
