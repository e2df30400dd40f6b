"""Pallas kernel correctness in interpret mode (CPU) vs the XLA reference ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_pl_tpu.ops.norm import group_norm
from multimodal_pl_tpu.ops.pallas.fused_gn_relu import fused_group_norm_relu


@pytest.mark.parametrize("shape,groups", [((2, 4, 8, 8, 32), 16), ((1, 3, 5, 7, 24), 4)])
def test_fused_gn_relu_matches_reference(rng, shape, groups):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    c = shape[-1]
    scale = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    got = fused_group_norm_relu(x, scale, bias, groups, block_spatial=64, interpret=True)
    want = jax.nn.relu(group_norm(x, scale, bias, groups))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_fused_gn_relu_blocking_invariance(rng):
    """Different spatial block sizes must give identical results (incl. the
    zero-padded remainder path)."""
    x = jnp.asarray(rng.standard_normal((1, 3, 7, 5, 16)).astype(np.float32))
    scale = jnp.ones(16)
    bias = jnp.zeros(16)
    a = fused_group_norm_relu(x, scale, bias, 16, block_spatial=32, interpret=True)
    b = fused_group_norm_relu(x, scale, bias, 16, block_spatial=128, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
