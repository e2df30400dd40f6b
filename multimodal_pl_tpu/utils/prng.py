"""Determinism helpers (reference utils.py:116-149 seedfix).

JAX is deterministic by construction given a PRNGKey; the only stateful RNGs
in this framework are the host-side numpy generators in the data pipeline,
which are seeded explicitly. seedfix seeds python/numpy for any remaining
library code and returns the root jax key.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def seedfix(seed: int) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
