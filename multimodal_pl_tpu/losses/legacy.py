"""Legacy MOTS-era loss zoo (reference loss_functions/loss.py:11-497).

Not used by the final AMOS driver but part of the public surface: binary Dice
variants, per-class Dice/BCE for MOTS 2-channel targets (with the -1
ignore-sample convention), task-adaptive marginal CE (TAL/TAL5/TAL6) and the
marginal+exclusive MargExcLoss. All channel-last; targets that the reference
kept as (B, C, ...) tensors are (B, ..., C) here.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from multimodal_pl_tpu.losses.partial import bce_logits, softmax_cross_entropy

# task -> foreground class ids of the 12-class MOTS head (loss.py:329-335)
MOTS_TASK_FG: Dict[int, Sequence[int]] = {
    0: (1, 2), 1: (3, 4), 2: (5, 6), 3: (7, 8), 4: (9,), 5: (10,), 6: (11,),
}


def binary_dice(predict: jax.Array, target: jax.Array, smooth: float = 1.0,
                reduce_ignore: bool = True) -> jax.Array:
    """BinaryDiceLoss(_) (loss.py:11-60): per-sample 1 - 2|pq|/(|p|+|q|+s).

    reduce_ignore=True averages over samples whose target[:, 0] != -1
    (the MOTS "organ/tumor missing" convention); False returns per-sample.
    """
    b = predict.shape[0]
    p = predict.reshape(b, -1).astype(jnp.float32)
    t = target.reshape(b, -1).astype(jnp.float32)
    num = jnp.sum(p * t, axis=1)
    den = jnp.sum(p, axis=1) + jnp.sum(t, axis=1) + smooth
    loss = 1.0 - 2.0 * num / den
    if not reduce_ignore:
        return loss
    valid = (t[:, 0] != -1).astype(jnp.float32)
    return jnp.sum(loss * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def dice_loss_4mots(predict: jax.Array, target: jax.Array, sigmoid: bool = True) -> jax.Array:
    """DiceLoss4MOTS (loss.py:63-90): mean over class channels of binary_dice."""
    if sigmoid:
        predict = jax.nn.sigmoid(predict)
    nc = predict.shape[-1]
    losses = jnp.stack(
        [binary_dice(predict[..., i], target[..., i], smooth=1.0) for i in range(nc)]
    )
    return jnp.mean(losses)


def ce_loss_4mots(predict: jax.Array, target: jax.Array) -> jax.Array:
    """CELoss4MOTS (loss.py:93-123): per-class BCE-with-logits averaged over
    valid samples (target[..., 0 voxel] != -1)."""
    nc = predict.shape[-1]
    b = predict.shape[0]
    total = []
    for i in range(nc):
        x = predict[..., i].reshape(b, -1).astype(jnp.float32)
        t = target[..., i].reshape(b, -1).astype(jnp.float32)
        ce = jnp.mean(jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x))), axis=1)
        valid = (t[:, 0] != -1).astype(jnp.float32)
        total.append(jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0))
    return jnp.mean(jnp.stack(total))


def bce_onehot(predict: jax.Array, labels: jax.Array, num_classes: int,
               offset: int = 1) -> jax.Array:
    """BCELoss (loss.py:126-151): BCE-with-logits vs one-hot(labels == i+offset)."""
    onehot = jnp.stack(
        [(labels == (i + offset)).astype(jnp.float32) for i in range(num_classes)], axis=-1
    )
    return bce_logits(predict, onehot)


def dice_softmax_fg(logits: jax.Array, labels: jax.Array, num_classes: int) -> jax.Array:
    """DiceLoss (loss.py:243-279): softmax, dice over classes 1..C-1, smooth
    only in the denominator."""
    probs = jax.nn.softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=probs.dtype)
    axes = tuple(range(probs.ndim - 1))
    inter = jnp.sum(probs * onehot, axis=axes)
    y = jnp.sum(onehot * onehot, axis=axes)
    z = jnp.sum(probs * probs, axis=axes)
    dice = 1.0 - (2.0 * inter) / (z + y + 1e-5)
    return jnp.sum(dice[1:]) / (num_classes - 1)


def dice_sigmoid_shifted(logits: jax.Array, labels: jax.Array, num_classes: int) -> jax.Array:
    """DiceLoss2 (loss.py:282-315): sigmoid per channel, target one-hot of i+1."""
    probs = jax.nn.sigmoid(logits)
    onehot = jnp.stack(
        [(labels == (i + 1)).astype(probs.dtype) for i in range(num_classes)], axis=-1
    )
    axes = tuple(range(probs.ndim - 1))
    inter = jnp.sum(probs * onehot, axis=axes)
    y = jnp.sum(onehot * onehot, axis=axes)
    z = jnp.sum(probs * probs, axis=axes)
    dice = 1.0 - (2.0 * inter) / (z + y + 1e-5)
    return jnp.mean(dice)


def _marginal_inputs(logits_or_probs: jax.Array, task_id: int, num_classes: int = 12):
    """Collapse background classes of one sample: (…, C) -> (…, 1+|fg|)."""
    fg = list(MOTS_TASK_FG[int(task_id)])
    bg = [i for i in range(num_classes) if i not in fg]
    merged_bg = jnp.sum(logits_or_probs[..., bg], axis=-1, keepdims=True)
    return jnp.concatenate([merged_bg, logits_or_probs[..., fg]], axis=-1), fg


def _remap_targets(labels: jax.Array, task_id: int) -> jax.Array:
    """Global label -> marginal index (loss.py:360-364): fg labels become 1..|fg|."""
    tid = int(task_id)
    delta = -2 * tid if tid <= 4 else -(tid + 4)
    return jnp.where(labels > 0, labels + delta, 0)


def tal_loss(logits: jax.Array, labels: jax.Array, task_ids: Sequence[int],
             num_classes: int = 12) -> jax.Array:
    """TAL (loss.py:317-370) without the running voxel-frequency weights
    (norm=False default): marginal CE per sample, summed."""
    loss = 0.0
    for i, tid in enumerate(task_ids):
        merged, _ = _marginal_inputs(logits[i], tid, num_classes)
        tgt = _remap_targets(labels[i], tid)
        loss = loss + softmax_cross_entropy(merged[None], tgt[None])
    return loss


# task -> single foreground class id of the 6-class / 5-class heads
# (loss.py:377-386 TAL6, :412-419 TAL5 — the MSD-subset experiment heads)
MOTS_TASK_FG6: Dict[int, int] = {0: 1, 1: 2, 2: 3, 3: 4, 6: 5}
MOTS_TASK_FG5: Dict[int, int] = {0: 1, 1: 2, 3: 3, 6: 4}


def _tal_binary(logits: jax.Array, labels: jax.Array, task_ids: Sequence[int],
                task_fg: Dict[int, int], num_classes: int) -> jax.Array:
    """Shared body of TAL5/TAL6 (loss.py:388-406, :421-435): merge every
    non-task class into channel 0, binarize the target, CE per sample, sum."""
    loss = 0.0
    for i, tid in enumerate(task_ids):
        fg = task_fg[int(tid)]
        bg = [c for c in range(num_classes) if c != fg]
        merged = jnp.concatenate(
            [jnp.sum(logits[i][..., bg], axis=-1, keepdims=True),
             logits[i][..., fg:fg + 1]], axis=-1)
        tgt = (labels[i] > 0).astype(jnp.int32)
        loss = loss + softmax_cross_entropy(merged[None], tgt[None])
    return loss


def tal6_loss(logits: jax.Array, labels: jax.Array, task_ids: Sequence[int]) -> jax.Array:
    """TAL6 (loss.py:373-406): 6-class head, one fg class per task."""
    return _tal_binary(logits, labels, task_ids, MOTS_TASK_FG6, 6)


def tal5_loss(logits: jax.Array, labels: jax.Array, task_ids: Sequence[int]) -> jax.Array:
    """TAL5 (loss.py:408-435): 5-class head, one fg class per task."""
    return _tal_binary(logits, labels, task_ids, MOTS_TASK_FG5, 5)


def bce_no_bg5(logits: jax.Array, labels: jax.Array, task_ids: Sequence[int]) -> jax.Array:
    """BCELossNoBG5 (loss.py:185-211): per sample, BCE-with-logits of the
    task's single foreground channel vs (label == that class), averaged over
    voxels, then over the batch."""
    per_sample = []
    for i, tid in enumerate(task_ids):
        c = MOTS_TASK_FG5[int(tid)]
        per_sample.append(bce_logits(logits[i][..., c],
                                     (labels[i] == c).astype(jnp.float32)))
    return jnp.mean(jnp.stack(per_sample))


def tal_update_weights(voxel_sum: jax.Array, voxel_count: jax.Array,
                       val, dim: int, voxels: int = 64 * 192 * 192):
    """TAL.update_weights (loss.py:337-341): running per-class foreground
    voxel frequency. Returns (voxel_sum, voxel_count, weights) where
    weights[dim] = log(1 / avg_frequency[dim]); untouched classes keep
    weight 1 (torch init). The reference writes ``self.weights[dim]`` on a
    (1,12) tensor — an IndexError for dim>0 and a full-row overwrite for
    dim==0; we implement the evident per-class intent."""
    voxel_count = voxel_count.at[dim].add(1.0)
    voxel_sum = voxel_sum.at[dim].add(jnp.asarray(val, jnp.float32) / voxels)
    avg = voxel_sum / jnp.maximum(voxel_count, 1.0)
    weights = jnp.where(voxel_count > 0, jnp.log(1.0 / avg), 1.0)
    return voxel_sum, voxel_count, weights


def tal_loss_weighted(logits: jax.Array, labels: jax.Array, task_ids: Sequence[int],
                      weights: jax.Array, norm: bool = True,
                      num_classes: int = 12) -> jax.Array:
    """TAL forward with the frequency weights (loss.py:343-368, norm=True):
    per-sample weighted CE over channels [0] + task_fg, weights normalized by
    their mean. torch's weighted CE divides by the sum of the picked
    per-voxel weights."""
    w = weights / jnp.mean(weights) if norm else weights
    loss = 0.0
    for i, tid in enumerate(task_ids):
        merged, fg = _marginal_inputs(logits[i], tid, num_classes)
        tgt = _remap_targets(labels[i], tid)
        wsel = jnp.concatenate([w[0:1], w[jnp.asarray(fg)]]).astype(jnp.float32)
        logp = jax.nn.log_softmax(merged.astype(jnp.float32), axis=-1)
        picked = -jnp.take_along_axis(logp, tgt[..., None].astype(jnp.int32), axis=-1)[..., 0]
        wv = wsel[tgt]
        loss = loss + jnp.sum(picked * wv) / jnp.sum(wv)
    return loss


def marg_exc_loss(logits: jax.Array, labels: jax.Array, task_ids: Sequence[int],
                  num_classes: int = 12):
    """MargExcLoss (loss.py:437-497): returns (marg_dice, marg_ce, exc_dice, exc_ce)."""
    probs = jax.nn.softmax(logits, axis=-1)
    n = logits.shape[0]
    marg_dice = marg_ce = exc_dice = exc_ce = 0.0
    for i, tid in enumerate(task_ids):
        fg = [0] + list(MOTS_TASK_FG[int(tid)])
        p_marg = probs[i][..., fg]
        tgt = _remap_targets(labels[i], tid)
        # marginal CE on probabilities == NLL of renormalized... reference uses
        # F.cross_entropy on *softmaxed* inputs; reproduce that literally:
        marg_ce = marg_ce + softmax_cross_entropy(p_marg[None], tgt[None])
        onehot = jnp.stack([(labels[i] == c).astype(jnp.float32) for c in fg], axis=0)
        pm = jnp.moveaxis(p_marg, -1, 0).astype(jnp.float32)
        axes = tuple(range(1, pm.ndim))
        inter = jnp.sum(pm * onehot, axis=axes)
        y = jnp.sum(onehot * onehot, axis=axes)
        z = jnp.sum(pm * pm, axis=axes)
        marg_dice = marg_dice + jnp.sum(1.0 - (2 * inter + 1e-5) / (z + y + 1e-5))
        # exclusive: push probability off classes that are known-absent
        te = 1.0 - jnp.stack([(labels[i] == c).astype(jnp.float32) for c in range(num_classes)], 0)
        te = te.at[0].set(0.0)
        pe = jnp.moveaxis(probs[i], -1, 0).astype(jnp.float32)
        inter_e = jnp.sum(pe * te, axis=axes)
        y_e = jnp.sum(te * te, axis=axes)
        z_e = jnp.sum(pe * pe, axis=axes)
        exc_dice = exc_dice + jnp.sum((2 * inter_e + 1e-5) / (z_e + y_e + 1e-5))
        exc_ce = exc_ce + jnp.sum(jnp.mean(jnp.log(pe + 1.0) * te, axis=axes))
    return marg_dice / n, marg_ce / n, exc_dice / n, exc_ce / n
