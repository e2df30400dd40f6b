"""Per-organ evaluation metrics (reference evaluate_amos.py:92-182).

dice/sensitivity/specificity on argmax predictions, each with the reference's
+1 denominator smoothing and per-sample mean; the atlas-blended variant
thresholds (p + 0.15) > (1 - atlas) instead of argmax (evaluate_amos.py:146).
Vectorized over the 13 organs — one fused reduction instead of 13 Python
iterations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _counts(pred: jax.Array, target: jax.Array):
    """pred/target: (L, B, S) 0/1 -> per (L, B) sums."""
    num = jnp.sum(pred * target, axis=-1)
    psum = jnp.sum(pred, axis=-1)
    tsum = jnp.sum(target, axis=-1)
    return num, psum, tsum


def dice_score(pred: jax.Array, target: jax.Array) -> jax.Array:
    """2|pq| / (|p| + |q| + 1), per-sample then mean (evaluate_amos.py:92-102)."""
    b = pred.shape[0]
    p = pred.reshape(b, -1).astype(jnp.float32)
    t = target.reshape(b, -1).astype(jnp.float32)
    num = jnp.sum(p * t, axis=1)
    den = jnp.sum(p, axis=1) + jnp.sum(t, axis=1) + 1.0
    return jnp.mean(2.0 * num / den)


def spec_score(pred: jax.Array, target: jax.Array) -> jax.Array:
    b = pred.shape[0]
    p = pred.reshape(b, -1).astype(jnp.float32)
    t = target.reshape(b, -1).astype(jnp.float32)
    return jnp.mean(jnp.sum(p * t, axis=1) / (jnp.sum(p, axis=1) + 1.0))


def senc_score(pred: jax.Array, target: jax.Array) -> jax.Array:
    b = pred.shape[0]
    p = pred.reshape(b, -1).astype(jnp.float32)
    t = target.reshape(b, -1).astype(jnp.float32)
    return jnp.mean(jnp.sum(p * t, axis=1) / (jnp.sum(t, axis=1) + 1.0))


def organ_scores(logits: jax.Array, labels: jax.Array, num_fg: int = 13):
    """Reference get_dice (evaluate_amos.py:128-154), atlas=None branch.

    logits: (B, D, H, W, C); labels: (B, D, H, W).
    Returns (dice, senc, spec) each (num_fg,), and the argmax prediction.
    """
    pred = jnp.argmax(logits, axis=-1)
    b = pred.shape[0]
    classes = jnp.arange(1, num_fg + 1)
    p = (pred.reshape(1, b, -1) == classes[:, None, None]).astype(jnp.float32)
    t = (labels.reshape(1, b, -1) == classes[:, None, None]).astype(jnp.float32)
    num, psum, tsum = _counts(p, t)
    dice = jnp.mean(2.0 * num / (psum + tsum + 1.0), axis=-1)
    senc = jnp.mean(num / (tsum + 1.0), axis=-1)
    spec = jnp.mean(num / (psum + 1.0), axis=-1)
    return dice, senc, spec, pred


def organ_scores_atlas(logits: jax.Array, labels: jax.Array, atlas: jax.Array,
                       num_fg: int = 13, boost: float = 0.15):
    """Atlas-blended threshold variant (evaluate_amos.py:144-151).

    atlas: (B, D, H, W, num_fg) organ prior probabilities.
    """
    probs = jax.nn.softmax(logits, axis=-1)
    b = labels.shape[0]
    cpred = (probs[..., 1:] + boost) > (1.0 - atlas)      # (B, D, H, W, L)
    p = jnp.moveaxis(cpred, -1, 0).reshape(num_fg, b, -1).astype(jnp.float32)
    classes = jnp.arange(1, num_fg + 1)
    t = (labels.reshape(1, b, -1) == classes[:, None, None]).astype(jnp.float32)
    num, psum, tsum = _counts(p, t)
    dice = jnp.mean(2.0 * num / (psum + tsum + 1.0), axis=-1)
    senc = jnp.mean(num / (tsum + 1.0), axis=-1)
    spec = jnp.mean(num / (psum + 1.0), axis=-1)
    return dice, senc, spec


def refiner_organ_scores(refiner_logits: jax.Array, labels: jax.Array, num_fg: int = 13):
    """Reference get_dice2 (evaluate_amos.py:156-182): per-organ binary heads.

    refiner_logits: (num_fg, D, H, W, 2); labels: (B=1, D, H, W).
    """
    pred = jnp.argmax(refiner_logits, axis=-1)            # (L, D, H, W)
    p = (pred == 1).reshape(num_fg, 1, -1).astype(jnp.float32)
    classes = jnp.arange(1, num_fg + 1)
    t = (labels.reshape(1, 1, -1) == classes[:, None, None]).astype(jnp.float32)
    num, psum, tsum = _counts(p, t)
    dice = jnp.mean(2.0 * num / (psum + tsum + 1.0), axis=-1)
    senc = jnp.mean(num / (tsum + 1.0), axis=-1)
    spec = jnp.mean(num / (psum + 1.0), axis=-1)
    return dice, senc, spec
