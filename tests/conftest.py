"""Test configuration.

Runs the suite on CPU with 8 virtual devices (so multi-chip sharding tests
work without a pod — SURVEY §4 "Multi-node testing") and float64 enabled
(the reference's ``real_t = double``).  Must run before jax initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var JAX_PLATFORMS is pinned to the TPU plugin by the container's
# sitecustomize; the config update below reliably forces CPU for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: repeated suite runs re-trace but skip XLA
# compilation of unchanged programs (measured: shaves minutes off the
# suite, which is compile-dominated).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_spd_matrix(n, rng, density=0.3):
    """Random symmetric positive-definite dense matrix."""
    a = rng.standard_normal((n, n))
    mask = rng.random((n, n)) < density
    a = a * mask
    return a @ a.T + n * np.eye(n)


def make_nonsym_matrix(n, rng):
    """Random diagonally-dominant nonsymmetric matrix (convection-diffusion-ish)."""
    a = rng.standard_normal((n, n)) * 0.5
    return a + n * np.eye(n)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running tests (big meshes)")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run tests marked slow (reference-scale meshes; adds ~2 min)",
    )


def pytest_collection_modifyitems(config, items):
    """Skip ``slow`` tests by default to keep the suite under the driver's
    600 s budget (CLAUDE.md).  Run them with ``--runslow`` (CI nightly) or
    ``STORMX_RUN_SLOW=1``."""
    if config.getoption("--runslow") or os.environ.get("STORMX_RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow (reference scale); use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
