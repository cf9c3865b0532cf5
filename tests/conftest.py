"""Test harness configuration.

Forces the CPU backend with 8 virtual devices (before JAX import) so
multi-chip sharding logic is exercised without TPU hardware, and enables
x64 so the float64 column oracle and parity tests are meaningful.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's TPU PJRT plugin can override JAX_PLATFORMS at import
# time; the config knob wins, so force the CPU backend explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from hybrid9_tpu.config import LayerGrid  # noqa: E402


@pytest.fixture(scope="session")
def layer_grid() -> LayerGrid:
    return LayerGrid.from_interfaces()


@pytest.fixture(scope="session")
def geometry_np(layer_grid):
    """(zi, dz, zc) float64 NumPy geometry with 9-layer dz/zc buffers."""
    zi = layer_grid.zi.copy()
    dz = layer_grid.dz.copy()
    zc = layer_grid.zc.copy()
    return zi, dz, zc


def pytest_configure(config):
    np.seterr(all="ignore")


def pytest_sessionstart(session):
    """Build the native host library once if the toolchain is present,
    so the real C++ paths are tested instead of skipping (the NumPy
    fallback tests run either way)."""
    import shutil
    import subprocess
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(root, "native", "libh9io.so")
    if not os.path.exists(so) and shutil.which("make") \
            and shutil.which("g++"):
        try:
            subprocess.run(["make", "-C", os.path.join(root, "native")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            pass                       # fallback paths still tested


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled-executable caches after each test module.

    Running the whole suite in ONE process used to segfault inside the
    XLA CPU compiler around test ~140 (accumulated compiler/executable
    state; every test passed in isolation or in halves).  Dropping the
    caches at module boundaries keeps the live-executable population
    bounded; within-module caching (the expensive repeated day steps)
    is unaffected.
    """
    yield
    import jax
    jax.clear_caches()
