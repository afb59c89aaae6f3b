"""Test configuration: force an 8-device virtual CPU mesh.

This is the standard JAX way to exercise pjit/shard_map collectives without a
TPU pod (SURVEY.md §4c). Must run before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# The environment routes XLA compilation through a remote TPU-tunnel compile
# service (PALLAS_AXON_REMOTE_COMPILE, read per-compile by the baked axon
# module). For CPU-only tests that turns every jit compile into remote
# round-trips — a ~50 s e2e file becomes hours. Compile locally.
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
# persistent compilation cache: the 1-core test VM pays heavily for XLA
# compiles; cache them across tests and sessions
import tempfile

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(tempfile.gettempdir(), "a2v_jax_cache")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # single-threaded eigen: the 1-core test VM wastes most of its cycles in
    # spin/sched_yield when the CPU client spawns its default worker pool
    flags += " --xla_force_host_platform_device_count=8 --xla_cpu_multi_thread_eigen=false"
    os.environ["XLA_FLAGS"] = flags.strip()

# The environment's sitecustomize registers a remote-TPU ("axon") PJRT plugin
# in every interpreter; initializing it claims the TPU tunnel and can take
# minutes. Tests are CPU-only: deregister the factory before any backend
# initialization so jax never dials the tunnel.
try:
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
except Exception:
    pass

# sitecustomize may have imported jax before this conftest ran, in which case
# jax's config already latched JAX_PLATFORMS=axon from the environment and the
# os.environ assignments above are no-ops. Force the config values too.
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _free_native_executables():
    """Drop jax's in-memory compiled-executable caches between test
    modules. Once the suite grew past ~310 tests (round 5), the full
    session accumulated enough XLA:CPU native state that one late native
    compile segfaulted — deterministically at the same test, 5/5 runs,
    110+ GB RAM free, with OR without the persistent cache (the crash
    then lands in `backend_compile_and_load` or in
    `deserialize_executable` respectively), while the same tests pass in
    any smaller session and the round-4 309-test suite still passes
    under the identical toolchain (control run, 2026-08-21). Cross-
    module jit reuse is rare (each file builds its own models) and the
    persistent cache covers recompiles, so this costs little and keeps
    the session's native footprint bounded."""
    yield
    try:
        import gc

        import jax

        jax.clear_caches()
        gc.collect()
    except Exception:
        pass
