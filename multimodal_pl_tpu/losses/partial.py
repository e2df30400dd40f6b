"""EDice loss family (reference loss_functions/loss_partial.py).

- edice_partial: marginal masked Dice (+ per-channel BCE) on 14-way softmax —
  the supervision bitmask selects which class channels contribute
  (loss_partial.py:59-99; the commented-out autocast import there is resolved
  by simply computing the BCE in f32, see SURVEY.md §2.2).
- edice_full: softmax Dice (all classes) + CE (loss_partial.py:102-135) — the
  refiner supervision loss.
- edice_full2: binary sigmoid Dice (+ BCE) with confidence masks
  (loss_partial.py:137-170) — the pseudo-label consistency loss.

All operate channels-last; labels are integer volumes without channel dim.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multimodal_pl_tpu.losses.dice import binary_dice_masked, multiclass_dice

_LOG_CLAMP = -100.0  # torch BCELoss clamps log terms at -100


def bce_probs(probs: jax.Array, target: jax.Array) -> jax.Array:
    """torch.nn.BCELoss on probabilities (mean reduction, log clamped)."""
    p = probs.astype(jnp.float32)
    t = target.astype(jnp.float32)
    logp = jnp.maximum(jnp.log(p), _LOG_CLAMP)
    lognp = jnp.maximum(jnp.log1p(-p), _LOG_CLAMP)
    return -jnp.mean(t * logp + (1.0 - t) * lognp)


def bce_logits(logits: jax.Array, target: jax.Array) -> jax.Array:
    """torch.nn.BCEWithLogitsLoss (mean reduction), numerically stable."""
    x = logits.astype(jnp.float32)
    t = target.astype(jnp.float32)
    return jnp.mean(jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x))))


def softmax_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """torch.nn.CrossEntropyLoss (mean) with channel-last logits."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)
    return -jnp.mean(picked)


def edice_partial(
    logits: jax.Array,
    labels: jax.Array,
    sup_mask: jax.Array,
    soft_max: bool = True,
    uce: bool = True,
) -> jax.Array:
    """Marginal masked Dice (+ per-channel BCE) — EDiceLoss_partial.forward.

    logits: (B, D, H, W, C); labels: (B, D, H, W) int; sup_mask: (C,) 0/1
    per-class supervision weights ([0]=background, always 1 in practice).
    """
    nc = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1) if soft_max else jax.nn.sigmoid(logits)
    w = sup_mask.astype(probs.dtype)
    loss = multiclass_dice(probs, labels, nc, weight=w)
    if uce:
        # per-channel BCE(probs[..., l], labels == l) * sup_mask[l] (:89-92)
        onehot = jax.nn.one_hot(labels, nc, dtype=jnp.float32)
        p = probs.astype(jnp.float32)
        logp = jnp.maximum(jnp.log(p), _LOG_CLAMP)
        lognp = jnp.maximum(jnp.log1p(-p), _LOG_CLAMP)
        per_ch = -jnp.mean(onehot * logp + (1.0 - onehot) * lognp,
                           axis=tuple(range(logits.ndim - 1)))
        loss = loss + jnp.sum(per_ch * w.astype(jnp.float32))
    return loss


def edice_full(logits: jax.Array, labels: jax.Array, uce: bool = True) -> jax.Array:
    """Softmax Dice over all classes + CE — EDiceLoss_full.forward."""
    nc = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    loss = multiclass_dice(probs, labels, nc)
    if uce:
        loss = loss + softmax_cross_entropy(logits, labels)
    return loss


def edice_full2(
    inputs: jax.Array,
    target: jax.Array,
    mask: jax.Array | None = None,
    uce: bool = True,
    sigmoid: bool = True,
    axes=None,
) -> jax.Array:
    """Binary Dice (+ BCEWithLogits) — EDiceLoss_full2.forward.

    inputs/target/mask broadcast-compatible; axes passes through to the dice
    reduction so callers can vectorize the reference's per-organ loop.
    """
    scores = jax.nn.sigmoid(inputs) if sigmoid else inputs
    loss = binary_dice_masked(scores, target, mask, axes=axes)
    if uce:
        loss = loss + bce_logits(inputs, target)
    return loss
