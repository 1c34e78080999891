"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU backend before any
conftest runs and overrides JAX_PLATFORMS, so plain env vars are not enough:
we must flip jax's config in-process *before the first backend use*.
Real-TPU behaviour is exercised by bench.py and the driver's
__graft_entry__ checks; unit tests must run anywhere.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

if os.environ.get("DSM_TEST_TPU") != "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the wavefront step recompiles per frontier
# capacity bucket; caching makes reruns cheap on the small CI machine
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
try:
    import jax

    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def toydata_dir(tmp_path_factory):
    from tests.make_toydata import make_toydata

    out = tmp_path_factory.mktemp("toydata")
    make_toydata(str(out))
    return str(out)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
