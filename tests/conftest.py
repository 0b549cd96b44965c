"""Test harness: force an 8-device virtual CPU mesh.

The reference has no test suite (SURVEY §4); this framework tests every
kernel against NumPy references and validates multi-chip sharding on a
virtual CPU mesh, since real multi-chip hardware is not available in CI.

Must set XLA flags before the first ``import jax`` anywhere in the test
process.
"""

import os

# Force CPU even when the ambient environment points JAX at a TPU tunnel
# (JAX_PLATFORMS=axon): unit tests need the 8-device virtual mesh and fast
# process startup; TPU validation happens in bench.py / __graft_entry__.py.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The TPU-tunnel sitecustomize pins jax_platforms="axon,cpu" in jax.config,
# which outranks the env var — override it in config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the stereo/pipeline graphs are large; caching
# their CPU executables makes repeat suite runs dominated by execution only.
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables at module teardown.

    The suite runs on a SINGLE CPU core; by the later (alphabetical) test
    modules the process holds every executable previous modules compiled,
    and the resulting allocator pressure was measured to triple the wall
    time of the big stereo executables (scene-family tests: 70 s as a
    file, 250+ s late in the full suite). Cross-module executable reuse
    is rare (modules use distinct canvas/config combinations), so
    clearing at module boundaries trades nothing for bounded memory."""
    yield
    jax.clear_caches()
