"""Adversarial losses (reference losses.py:441-475).

SmoothCrossEntropyLoss with smoothing=0 (the only configuration the driver
uses) is a plain mean cross-entropy over (N, 2) logits; bce_loss fills a
constant integer target — the generator's "look like the labeled modality"
objective (train_amos_atlas_final.py:338).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_cross_entropy(logits: jax.Array, targets: jax.Array, smoothing: float = 0.0,
                         weight: jax.Array | None = None) -> jax.Array:
    """Label-smoothed CE, mean reduction (losses.py:441-469)."""
    n = logits.shape[-1]
    onehot = jax.nn.one_hot(targets, n, dtype=jnp.float32)
    soft = onehot * (1.0 - smoothing) + (1.0 - onehot) * (smoothing / (n - 1))
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if weight is not None:
        logp = logp * weight[None, :]
    return jnp.mean(-jnp.sum(soft * logp, axis=-1))


def bce_loss(logits: jax.Array, label: int, smoothing: float = 0.0) -> jax.Array:
    """CE against a constant class label (losses.py:471-475)."""
    targets = jnp.full((logits.shape[0],), label, jnp.int32)
    return smooth_cross_entropy(logits, targets, smoothing)
