"""Test harness configuration.

All tests run on CPU with 8 virtual XLA devices so the multi-chip sharding
paths (skeletondiffusion_tpu.parallel) are exercised without TPU hardware —
the TPU-native replacement for the reference's nonexistent distributed tests
(SURVEY.md §4 implication (e)).  Must run before the first ``import jax``.
"""
import os

# force CPU even when the ambient environment pins an accelerator platform
# (the test suite must be runnable anywhere, incl. under the axon TPU tunnel
# where remote compiles take ~90 s each)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compilation cache: XLA CPU compiles dominate test wall time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_skeldiff")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax  # noqa: E402

# a site package may have imported jax before this conftest ran, in which
# case the env var above was read too late — force the config directly
# (backends are initialized lazily, so this still wins)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_skeldiff")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
assert jax.default_backend() == "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# repo root for tests that chdir to resolve the configs/ tree — derived from
# this file's location so the suite runs from any checkout path
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def rng():
    return np.random.default_rng(0)
