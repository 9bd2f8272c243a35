"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU is reserved for bench.py; unit tests exercise the identical jitted
code paths on CPU (with float64 available for physics parity tests against
the MuJoCo CPU oracle).
"""

import os

# force CPU: the session environment may point JAX at a remote TPU (axon),
# which would run every un-jitted op over the wire and lacks float64
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# the session sitecustomize (PYTHONPATH=/root/.axon_site) imports jax before
# this conftest runs, so the env var above may be latched too late — force the
# platform through the config API as well
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: the physics step graphs are large and CPU XLA is
# slow to compile; cache across test runs
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np
import pytest

# the "fast" marker (pytest -m fast / make test-fast): the math/metrics/
# rewards core — cheap, compile-light modules that verify the numerical
# contracts without building full engine/env/agent graphs
_FAST_MODULES = {
    "test_tmath",
    "test_fk",
    "test_metrics",
    "test_success",
    "test_rewards_more",
    "test_bvh",
    "test_datasets",
    "test_aux_models",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in _FAST_MODULES:
            item.add_marker(pytest.mark.fast)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
