"""Soft-Dice cores as masked *weighted sums* — no data-dependent shapes.

The reference selects voxels by boolean indexing
(loss_functions/loss_partial.py:27-28: ``score[mask.bool()]``); under XLA that
would force dynamic shapes, so we multiply by the mask instead. The sums are
identical: sum(score[mask]) == sum(score * mask) for a 0/1 mask, and the
smooth-term placement matches the reference formula exactly:

    loss = 1 - (2*intersect + s) / (z_sum + y_sum + s),  s = 1e-5
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SMOOTH = 1e-5


def binary_dice_masked(score: jax.Array, target: jax.Array, mask: jax.Array | None = None,
                       axes=None) -> jax.Array:
    """1 - soft dice of (score, target) restricted to mask (loss_partial.py:24-36).

    axes: reduction axes (default: all). Pass spatial axes to vectorize the
    per-organ calls of the reference into one fused reduction.
    """
    target = target.astype(score.dtype)
    if mask is not None:
        m = mask.astype(score.dtype)
        score = score * m
        target = target * m
    if axes is None:
        axes = tuple(range(score.ndim))
    intersect = jnp.sum(score * target, axis=axes)
    y_sum = jnp.sum(target * target, axis=axes)
    z_sum = jnp.sum(score * score, axis=axes)
    return 1.0 - (2.0 * intersect + SMOOTH) / (z_sum + y_sum + SMOOTH)


def dice_per_class(probs: jax.Array, labels: jax.Array, num_classes: int,
                   class_mask: jax.Array | None = None) -> jax.Array:
    """Per-class 1-dice over the whole batch (loss_partial.py DiceLoss.forward).

    probs: (B, ..., C) channel-last probabilities; labels: (B, ...) ints.
    class_mask: optional (B, ..., C) 0/1 voxel mask per class.
    Returns (C,) per-class dice losses (each reduced over batch+space, like
    the reference's whole-tensor sums).
    """
    onehot = jax.nn.one_hot(labels, num_classes, dtype=probs.dtype)
    if class_mask is not None:
        m = class_mask.astype(probs.dtype)
        probs = probs * m
        onehot = onehot * m
    axes = tuple(range(probs.ndim - 1))
    intersect = jnp.sum(probs * onehot, axis=axes)
    y_sum = jnp.sum(onehot * onehot, axis=axes)
    z_sum = jnp.sum(probs * probs, axis=axes)
    return 1.0 - (2.0 * intersect + SMOOTH) / (z_sum + y_sum + SMOOTH)


def multiclass_dice(probs: jax.Array, labels: jax.Array, num_classes: int,
                    weight: jax.Array | None = None,
                    class_mask: jax.Array | None = None) -> jax.Array:
    """sum_i dice_i * weight_i / n_classes (loss_partial.py:38-57)."""
    d = dice_per_class(probs, labels, num_classes, class_mask)
    if weight is None:
        return jnp.sum(d) / num_classes
    return jnp.sum(d * weight.astype(d.dtype)) / num_classes
