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

jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np
import pytest


def cpu_devices(n=8):
    return jax.devices("cpu")[:n]


@pytest.fixture
def rng():
    return np.random.default_rng(0)
