"""Test harness: force an 8-virtual-device CPU mesh before JAX initializes.

Multi-chip sharding code paths (outerspace_tpu.shard) are exercised without
real TPU hardware via ``xla_force_host_platform_device_count`` — the same
``shard_map`` programs run unmodified on a real ICI-connected mesh.
"""

import os
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
# Tests must not pollute the repo's committed sizing cache.
os.environ["OUTERSPACE_SIZING_CACHE"] = os.path.join(
    tempfile.gettempdir(), "outerspace_test_sizing_cache.json"
)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS at interpreter
# startup; the config knob after import wins, so force CPU explicitly —
# otherwise "CPU" tests silently run on the tunneled TPU.
import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: repeat suite runs on the same box skip XLA
# re-compiles (the dominant cost of the CPU profile). Cold runs are
# unaffected; the cache lives outside the repo. Set
# OUTERSPACE_TEST_COMPILE_CACHE="" to disable.
#
# NOTE: the FULL suite (--runslow / OUTERSPACE_RUN_SLOW=1) must run in
# per-file chunks (fresh process each): a single ~345-test process
# segfaults inside XLA's CPU backend_compile after ~300 prior compiles
# (reproduced with the cache disabled — an upstream compiler-state
# issue, not this repo's code; the same test passes standalone). The
# default profile runs single-process fine.
_cache_dir = os.environ.get(
    "OUTERSPACE_TEST_COMPILE_CACHE",
    os.path.join(tempfile.gettempdir(), "outerspace_test_xla_cache"),
)
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from outerspace_tpu.formats import COO, erdos_renyi, rmat  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run tests marked slow (interpret-mode Pallas heavy)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running (interpret-mode Pallas / big XLA compiles); "
        "skipped by default for CI-speed signal — enable with --runslow "
        "or OUTERSPACE_RUN_SLOW=1",
    )


def pytest_collection_modifyitems(config, items):
    if (
        config.getoption("--runslow")
        or os.environ.get("OUTERSPACE_RUN_SLOW") == "1"
    ):
        return
    skip = pytest.mark.skip(reason="slow; use --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def random_matrices():
    """A small zoo of operand pairs covering the tricky structure cases."""
    cases = []
    # ER square pair
    a = erdos_renyi(64, 64, 0.08, seed=1)
    b = erdos_renyi(64, 64, 0.08, seed=2)
    cases.append(("er64", a, b))
    # Rectangular chain
    a = erdos_renyi(48, 96, 0.1, seed=3)
    b = erdos_renyi(96, 32, 0.07, seed=4)
    cases.append(("rect", a, b))
    # Skewed power-law squared (load imbalance)
    g = rmat(6, edge_factor=8, seed=5)
    cases.append(("rmat6_sq", g, g))
    # Empty rows/cols, tiny
    a = COO((8, 8), np.array([0, 0, 7]), np.array([1, 7, 0]),
            np.array([1.0, 2.0, 3.0], dtype=np.float32))
    b = COO((8, 8), np.array([1, 7, 0]), np.array([2, 3, 0]),
            np.array([4.0, 5.0, 6.0], dtype=np.float32))
    cases.append(("tiny", a, b))
    # Annihilation: values that cancel exactly produce explicit zeros in
    # scipy — keep positive values to make nnz comparisons well-defined.
    return cases


@pytest.fixture(params=random_matrices(), ids=lambda c: c[0])
def operand_pair(request):
    return request.param[1], request.param[2]
