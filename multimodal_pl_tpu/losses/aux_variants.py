"""Auxiliary composite-loss variants (reference losses.py:64-105, 184-438).

Experiment ablations not called by the final driver but part of the public
surface (SURVEY.md §2 #20): MSE-consistency (get_loss_mse), the fixed-0.1
variant (get_loss2), hard-pseudo-label multiref (get_loss_multiref) and the
mean-teacher semi-supervised loss (get_loss_semi). Same fixed-shape
weighted-sum rewrites as losses.compose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multimodal_pl_tpu.losses.compose import DEEP_WEIGHTS, _nearest_labels
from multimodal_pl_tpu.losses.dice import binary_dice_masked
from multimodal_pl_tpu.losses.partial import edice_partial
from multimodal_pl_tpu.ops.resize import resize_nearest


def _deep_terms(logits, labels, sup_mask, deep_outs, weights=DEEP_WEIGHTS):
    aux = 0.0
    for idx, d in enumerate(deep_outs):
        ct = _nearest_labels(labels, d.shape[1:4])
        aux = aux + edice_partial(d, ct, sup_mask, soft_max=True, uce=False) * weights[idx]
    return aux


def segmentation_loss_mse(logits, labels, sup_mask, deep_outs, attns,
                          refiner_logits=None, label_t=None):
    """get_loss_mse (losses.py:64-105): MSE between softmaxed attention maps
    and the refiner posterior for unsupervised-modality organs."""
    weights = (0.03, 0.1, 0.2, 0.3)
    loss = edice_partial(logits, labels, sup_mask, uce=True)
    aux = _deep_terms(logits, labels, sup_mask, deep_outs, weights)
    if refiner_logits is not None:
        rprob = jax.nn.softmax(refiner_logits.astype(jnp.float32), axis=-1)
        u = 1.0 - label_t.astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        maps = list(attns) + [probs[..., 1:]]
        for idx, amap in enumerate(maps):
            organ_maps = jnp.moveaxis(amap[0], -1, 0).astype(jnp.float32)
            lr = jax.nn.softmax(organ_maps, axis=0)
            # nearest-resize refiner p1 to map resolution (losses.py:90)
            p1 = rprob[..., 1]
            if organ_maps.shape[1:] != p1.shape[1:]:
                p1 = resize_nearest(p1[..., None], organ_maps.shape[1:4])[..., 0]
            mse = jnp.mean((lr - p1) ** 2, axis=(1, 2, 3))
            # reference iterates gan in range(8) with /7 scaling
            aux = aux + jnp.sum(mse[:8] * u[:8]) / 7.0 * weights[idx]
    return loss + aux


def segmentation_loss2(logits, labels, sup_mask, deep_outs, attns,
                       refiner_logits=None, label_t=None, confidence=0.10):
    """get_loss2 (losses.py:184-270): like get_loss but the pseudo term uses a
    fixed 0.1 weight and sigmoid on every map (the idx==5 branch never fires)."""
    loss = edice_partial(logits, labels, sup_mask, uce=True)
    aux = _deep_terms(logits, labels, sup_mask, deep_outs)
    if refiner_logits is not None:
        rprob = jax.nn.softmax(refiner_logits.astype(jnp.float32), axis=-1)
        p1 = rprob[..., 1]
        confi1 = jnp.logical_or(rprob > 1 - confidence, rprob < confidence)[..., 1]
        confi1 = confi1.astype(jnp.float32)
        u = 1.0 - label_t.astype(jnp.float32)
        supcount = jnp.sum(label_t.astype(jnp.float32))
        denom = jnp.maximum(logits.shape[-1] - 1 - supcount, 1.0)
        maps = list(attns) + [logits[..., 1:]]  # raw logits appended (losses.py:244)
        for idx, amap in enumerate(maps):
            organ_maps = jnp.moveaxis(amap[0], -1, 0).astype(jnp.float32)
            scores = jax.nn.sigmoid(organ_maps)
            d = binary_dice_masked(scores, p1, confi1, axes=(1, 2, 3))
            aux = aux + jnp.sum(d * u) / denom * DEEP_WEIGHTS[idx] * 0.1
    return loss + aux


def segmentation_loss_multiref(logits, labels, sup_mask, deep_outs, attns,
                               refiner_logits=None, label_t=None):
    """get_loss_multiref (losses.py:272-367): hard pseudo-labels — argmax the
    refiner, compose a label volume, nearest-resize per scale, unmasked dice."""
    loss = edice_partial(logits, labels, sup_mask, uce=True)
    aux = _deep_terms(logits, labels, sup_mask, deep_outs)
    if refiner_logits is not None:
        num_fg = refiner_logits.shape[0]
        rhard = jnp.argmax(refiner_logits, axis=-1)            # (L, D, H, W)
        organ_ids = jnp.arange(1, num_fg + 1)[:, None, None, None]
        u = (1.0 - label_t.astype(jnp.float32))
        # refine_label: organ l where its head fires and modality unsupervised;
        # supervised organs take the ground-truth label (losses.py:316-330)
        pseudo = jnp.max(jnp.where((rhard == 1) & (u[:, None, None, None] > 0),
                                    organ_ids, 0), axis=0)
        sup_keep = jnp.take(label_t.astype(jnp.float32),
                            jnp.clip(labels[0] - 1, 0, num_fg - 1)) * (labels[0] > 0)
        refine_label = jnp.where(sup_keep > 0, labels[0], pseudo)  # (D, H, W)
        supcount = jnp.sum(label_t.astype(jnp.float32))
        denom = jnp.maximum(num_fg - supcount, 1.0)
        probs = jax.nn.softmax(logits, axis=-1)
        maps = list(attns) + [logits[..., 1:]]
        for idx, amap in enumerate(maps):
            organ_maps = jnp.moveaxis(amap[0], -1, 0).astype(jnp.float32)
            rl = refine_label
            if organ_maps.shape[1:4] != rl.shape:
                rl = resize_nearest(rl[None, ..., None].astype(jnp.float32),
                                    organ_maps.shape[1:4])[0, ..., 0]
            targets = (rl[None] == organ_ids).astype(jnp.float32)
            scores = jax.nn.sigmoid(organ_maps)
            d = binary_dice_masked(scores, targets, None, axes=(1, 2, 3))
            aux = aux + jnp.sum(d * u) / denom * DEEP_WEIGHTS[idx] * 0.1
    return loss + aux


def segmentation_loss_semi(logits, labels, sup_mask, deep_outs, attns,
                           teacher_logits=None, label_t=None):
    """get_loss_semi (losses.py:370-438): mean-teacher pseudo-labels with a
    0.9/0.1 confidence mask; only the final-scale map (idx 3) contributes."""
    loss = edice_partial(logits, labels, sup_mask, uce=True)
    aux = _deep_terms(logits, labels, sup_mask, deep_outs)
    if teacher_logits is not None:
        num_fg = logits.shape[-1] - 1
        tprob = jax.nn.softmax(teacher_logits.astype(jnp.float32), axis=-1)
        confi = jnp.logical_or(tprob > 0.9, tprob < 0.1).astype(jnp.float32)
        thard = jnp.argmax(tprob, axis=-1)                      # (L, D, H, W) binary heads
        organ_ids = jnp.arange(1, num_fg + 1)[:, None, None, None]
        u = 1.0 - label_t.astype(jnp.float32)
        pseudo = jnp.max(jnp.where((thard == 1) & (u[:, None, None, None] > 0),
                                    organ_ids, 0), axis=0)
        sup_keep = jnp.take(label_t.astype(jnp.float32),
                            jnp.clip(labels[0] - 1, 0, num_fg - 1)) * (labels[0] > 0)
        refine_label = jnp.where(sup_keep > 0, labels[0], pseudo)
        maps = list(attns) + [logits[..., 1:]]
        for idx, amap in enumerate(maps):
            if idx < 3:  # losses.py:422
                continue
            organ_maps = jnp.moveaxis(amap[0], -1, 0).astype(jnp.float32)
            targets = (refine_label[None] == organ_ids).astype(jnp.float32)
            scores = jax.nn.sigmoid(organ_maps)
            # per-organ foreground-confidence mask (the reference's
            # c_confi_mask[:, gan:gan+1] indexing is out of range for gan >= 2
            # — resolved as channel-1 confidence per organ head)
            d = binary_dice_masked(scores, targets, confi[..., 1], axes=(1, 2, 3))
            aux = aux + jnp.sum(d * u) / 7.0 * 0.1
    return loss + aux
