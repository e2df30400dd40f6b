"""Composite training losses (reference loss_functions/losses.py:46-182).

Everything is a fixed-shape weighted sum so the whole loss fits in one jit:
the reference's per-organ Python loops over ``tlist`` / ``label_t`` become
multiplications by 0/1 organ-weight vectors (same values, XLA-static shapes),
and its per-scale loops are unrolled over the static 3-or-4-entry lists.

Batch semantics: the marginal Dice and deep-supervision terms run over the
full batch; the pseudo-label consistency term uses sample 0, exactly like the
reference driver (train_amos_atlas_final.py:277, 337 index ``[0]``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from multimodal_pl_tpu.losses.dice import SMOOTH, binary_dice_masked
from multimodal_pl_tpu.losses.partial import edice_partial
from multimodal_pl_tpu.ops.resize import resize_nearest

DEEP_WEIGHTS = (0.125, 0.25, 0.5, 1.0)  # losses.py:116


def _nearest_labels(labels: jax.Array, spatial) -> jax.Array:
    """Nearest-downsample an integer label volume (B, D, H, W)."""
    return resize_nearest(labels[..., None], spatial)[..., 0]


def segmentation_loss(
    logits: jax.Array,
    labels: jax.Array,
    sup_mask: jax.Array,
    deep_outs: Sequence[jax.Array],
    attns: Sequence[jax.Array],
    refiner_logits: jax.Array | None = None,
    label_d: jax.Array | None = None,
    weight_feature: jax.Array | float = 0.1,
    confidence: float = 0.10,
    aux_weight: float = 1.0,
):
    """The reference ``get_loss`` (losses.py:107-182), channel-last.

    logits: (B, D, H, W, C) raw; labels: (B, D, H, W) with unsupervised organs
    zeroed (cmask); sup_mask: (C,) 0/1 class WEIGHTS fed straight to the
    masked dice/BCE — [0] must be 0 for reference parity (the driver passes
    the raw csv row, slot 0 always 0, train:312: background gets no direct
    loss and unsupervised organs feel no "be background" pressure);
    deep_outs: deep-sup logits at 1/8, 1/4, 1/2 scales — NOTE the final
    reference driver passes deep_out=[] (train:305, :312), so the trained
    configuration calls this with an empty tuple and the deep-dice formula
    below only serves the aux experiment variants;
    attns: 3 attention maps, full-size when deep_up
    (B, D, H, W, C-1); refiner_logits: (C-1, D, H, W, 2) raw refiner output
    for every organ (or None during the pretrain phase); label_d: (C-1,)
    per-case organ supervision bits (== sup_mask[1:]) — the pseudo-label
    consistency term covers exactly the organs NOT supervised in this case.
    (The reference's parameter is *named* label_t but the driver passes
    label_d into it, train_amos_atlas_final.py:312 — the consistency term is
    what trains the 12 per-case-unsupervised organs, so wiring the modality
    vector here instead silently disables it for labeled-modality cases.)

    Returns the scalar loss.
    """
    nc = logits.shape[-1]
    num_fg = nc - 1

    loss = edice_partial(logits, labels, sup_mask, soft_max=True, uce=True)

    aux = 0.0
    for idx, d in enumerate(deep_outs):
        ct = _nearest_labels(labels, d.shape[1:4])
        aux = aux + edice_partial(d, ct, sup_mask, soft_max=True, uce=False) * DEEP_WEIGHTS[idx]

    if refiner_logits is None:
        return loss + aux

    if label_d is None:
        raise ValueError(
            "segmentation_loss: refiner_logits given but label_d is None — "
            "the pseudo-label consistency term needs the per-case organ "
            "supervision bits (sup_mask[1:]) to select unsupervised organs"
        )
    probs = jax.nn.softmax(logits, axis=-1)
    rprob = jax.nn.softmax(refiner_logits.astype(jnp.float32), axis=-1)  # (13, D, H, W, 2)
    p1 = rprob[..., 1]                                                   # (13, D, H, W)
    confi = jnp.logical_or(rprob > (1.0 - confidence), rprob < confidence).astype(jnp.float32)
    confi1 = confi[..., 1]                                               # (13, D, H, W)

    u = (1.0 - label_d.astype(jnp.float32))                              # per-case unsupervised organs
    supcount = jnp.sum(label_d.astype(jnp.float32))
    denom = jnp.maximum(num_fg - supcount, 1.0)

    maps = list(attns) + [probs[..., 1:]]  # 4th entry: the softmax prediction itself
    for idx, amap in enumerate(maps):
        # sample 0, organs-last -> organs-first: (13, D, H, W)
        organ_maps = jnp.moveaxis(amap[0], -1, 0).astype(jnp.float32)
        use_sigmoid = idx != 3  # raw probs for the prediction entry (losses.py:167)
        scores = jax.nn.sigmoid(organ_maps) if use_sigmoid else organ_maps
        d = binary_dice_masked(scores, p1, confi1, axes=(1, 2, 3))       # (13,)
        aux = aux + jnp.sum(d * u) / denom * DEEP_WEIGHTS[idx] * weight_feature

    return loss + aux * aux_weight


def refine_loss(
    refiner_logits: jax.Array,
    labels: jax.Array,
    organ_weights: jax.Array,
    aug_mask: int = 1,
    organ_ids: jax.Array | None = None,
) -> jax.Array:
    """The reference ``get_loss_refine`` (losses.py:46-62), vectorized.

    refiner_logits: (L, D, H, W, 2) — one binary head per organ; labels:
    (B, D, H, W) supervised label volume (sample 0 is used); organ_weights:
    (L,) 0/1 == membership of tlist. aug_mask>1 multiplies the loss, which
    equals the reference's duplicated-input sum because mask_aug makes exact
    copies (utils.py:76-114) and the refiner is deterministic.

    organ_ids: (L,) 1-based label id of each row. Defaults to 1..L (the
    all-organ layout); the train step passes the gathered supervised-organ
    ids so the refiner's gradient pass only runs on tlist rows, exactly as
    the reference indexes ``preds[tlist]`` (train:277) instead of masking a
    full-organ batch.

    Per organ: EDiceLoss_full(2) with uce=False == mean over both classes of
    softmax dice vs the binary (label == organ) target.
    """
    probs = jax.nn.softmax(refiner_logits.astype(jnp.float32), axis=-1)  # (L, D, H, W, 2)
    if organ_ids is None:
        organ_ids = jnp.arange(1, refiner_logits.shape[0] + 1)
    target1 = (labels[0][None] == organ_ids[:, None, None, None])
    target1 = target1.astype(jnp.float32)                                 # (L, D, H, W)
    onehot = jnp.stack([1.0 - target1, target1], axis=-1)                 # (L, D, H, W, 2)
    axes = (1, 2, 3)
    intersect = jnp.sum(probs * onehot, axis=axes)
    y_sum = jnp.sum(onehot * onehot, axis=axes)
    z_sum = jnp.sum(probs * probs, axis=axes)
    dice = 1.0 - (2.0 * intersect + SMOOTH) / (z_sum + y_sum + SMOOTH)    # (L, 2)
    per_organ = jnp.sum(dice, axis=-1) / 2.0
    return jnp.sum(per_organ * organ_weights.astype(jnp.float32)) * max(aug_mask, 1)


def feature_ramp(epoch: jax.Array | int, pretrain_epoch: int = 20, ramp_until: int = 50,
                 max_weight: float = 0.1):
    """weight_feature schedule (train_amos_atlas_final.py:303-311).

    0 before pretrain_epoch (refiner term disabled), linear 0 -> max_weight
    until ``ramp_until``, then constant.
    """
    e = jnp.asarray(epoch, jnp.float32)
    w = jnp.where(e < ramp_until, max_weight / ramp_until * e, max_weight)
    return jnp.where(e < pretrain_epoch, 0.0, w)
