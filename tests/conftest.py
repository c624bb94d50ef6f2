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
