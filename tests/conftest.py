"""Test configuration: CPU backend with 8 virtual devices + float64.

The reference has no tests at all (SURVEY.md section 4); this suite is the
"fake backend" it lacks: multi-device sharding is exercised on a virtual
8-device CPU mesh, and float64 on CPU lets us compare bit-closely against the
NumPy oracle (the reference is float64 LAPACK throughout).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell env may pin a TPU backend
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax may already be imported (pytest plugins) with the shell's
# JAX_PLATFORMS=axon captured; config.update still wins pre-backend-init.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: the f64 pipeline tests compile a handful of
# ~30-60 s CPU executables (batched L-BFGS while_loops); the cache keys on
# the computation + jaxlib version, so repeat suite runs skip them safely.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/oi_jax_cache_cpu"),
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
