"""Test harness: force the JAX CPU backend with 8 virtual devices.

Tests never need the real TPU — kernels run in Pallas interpret mode and the
multi-chip sharding paths run over a virtual 8-device CPU mesh, exactly how
the driver's dryrun validates them.

Note: this environment's sitecustomize registers an 'axon' TPU platform and
rewrites JAX_PLATFORMS, so the env var alone is not enough — we must also
update jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite's cost is dominated by CPU
# XLA compiles of big programs (shard_map value_and_grad of the renderer
# alone is ~10 min cold); caching them makes repeat runs (CI, the driver's
# round-end run, local iteration) mostly execution-bound. Keyed on HLO
# hash, so code changes invalidate exactly the affected programs.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_pytest_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except AttributeError:  # older jax without the persistent cache flags
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def teapot_mesh():
    from raytracing_tpu.geometry.scene import teapot_only_mesh

    return teapot_only_mesh()


@pytest.fixture(scope="session")
def default_scene():
    from raytracing_tpu.geometry.scene import build_default_scene

    return build_default_scene(t=0.0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
