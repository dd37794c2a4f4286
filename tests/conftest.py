"""Test configuration: CPU backend with a virtual 8-device mesh.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count), mirroring how the driver dry-runs
the multi-chip path; numerical physics oracle tests run f64 on CPU against
the mujoco C engine.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# a sitecustomize in this image pins JAX_PLATFORMS; override via config
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


REFERENCE_XML = "/root/repo/assets/pupper_v3_test.xml"
