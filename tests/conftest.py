"""Test harness: force CPU with 8 virtual devices for mesh tests.

Must run before jax is imported anywhere (SURVEY §4 implication: multi-host
paths are validated on fake-device CPU meshes).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests always run on (virtual) CPU devices
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin ignores JAX_PLATFORMS; force via jax.config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def make_ramp_surface(h=64, w=64, base_depth=30.0, seed=0):
    """Synthetic smooth seafloor: ramp + gentle sinusoid + tiny roughness."""
    rg = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    depth = (
        base_depth
        + 0.05 * xx
        + 0.02 * yy
        + 0.5 * np.sin(xx / 7.0)
        + 0.3 * np.cos(yy / 9.0)
        + rg.normal(0, 0.02, (h, w)).astype(np.float32)
    )
    return depth.astype(np.float32)


@pytest.fixture
def ramp_surface():
    return make_ramp_surface()
