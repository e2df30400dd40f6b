"""Test configuration: force CPU with a virtual 8-device mesh.

Tests must run anywhere (CI, dev box, TPU host) identically; the multi-chip
sharding tests use XLA's host-platform device virtualization — the TPU-world
equivalent of a fake distributed backend (SURVEY.md §4).

Note: on hosts where a TPU platform plugin registers itself regardless of
JAX_PLATFORMS (e.g. the experimental 'axon' tunnel), the env var alone is not
enough — we also pin jax's default device to CPU after import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

try:
    # On axon hosts jax is pre-imported with JAX_PLATFORMS=axon by a
    # sitecustomize, so the env pin above is a no-op there; backends are
    # still lazy at this point, so a config update keeps the TPU backend
    # from ever initializing during tests.
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

jax.config.update("jax_default_device", jax.devices("cpu")[0])

# Share the repo's persistent XLA compile cache: the heavyweight programs
# (full train step at 64^3, its 8-device shard_map twin) are also compiled by
# __graft_entry__'s driver entry points — cache hits make repeat suite runs
# minutes instead of hours on this 1-vCPU host.
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # No XLA-level AOT artifacts: XLA:CPU AOT entries bake in host machine
    # features and fail to load on a different CPU (round-2 driver capture),
    # so only the portable StableHLO-keyed cache is kept.
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
except Exception:
    pass

import numpy as np
import pytest


def cpu_devices(n=8):
    return jax.devices("cpu")[:n]


@pytest.fixture
def rng():
    return np.random.default_rng(0)
