"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host devices (JAX semantics are platform-uniform).
"""

import os

# Must be set before jax is imported anywhere.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin force-sets jax_platforms="axon,cpu" at import,
# overriding the JAX_PLATFORMS env var — tests must run on the virtual
# 8-device CPU backend, so override the config back.
jax.config.update("jax_platforms", "cpu")

# Oracle-parity tests need accurate f32 matmuls; this build's default is
# low precision (bf16-like). Production code requests HIGHEST explicitly
# where accuracy matters and keeps the fast default in model forwards.
jax.config.update("jax_default_matmul_precision", "highest")

# Compiles are expensive in this environment (~1.5s per eager op dispatch);
# persist compiled executables across test runs.
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
