"""Class-token EMA state, as explicit functional state.

The reference stores per-class tokens as plain (non-parameter) tensors mutated
in place after every step (unet3D.py:1016-1021, renew_token :1051-1068,
driver call train_amos_atlas_final.py:382-391). Here they are an explicit
pytree threaded through the train step and included in checkpoints (fixing the
reference bug where they were silently dropped from state_dict).

renew semantics per scale s with feature map x_s (B, d, h, w, C_s) and the
agreement mask fmask (B, D, H, W) of labels 1..num_classes-1:
  for every class l with at least one voxel at feature resolution,
    token[l] <- (1 - alpha) * token[l] + alpha * mean_{masked voxels} x_s[..., :]
The mask is nearest-downsampled with the torch floor convention
(matches F.interpolate(mode='nearest') at unet3D.py:1056).

Note: the reference's boolean-indexing reshape scrambles channels when B > 1;
we implement the intended per-channel masked mean (identical for B == 1).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from multimodal_pl_tpu.ops.resize import resize_nearest

TOKEN_DIMS = {"t1": 128, "t2": 64, "t3": 32}


def init_class_tokens(
    rng: jax.Array, num_classes: int = 14, dims: Dict[str, int] | None = None
) -> Dict[str, jax.Array]:
    """Standard-normal init, matching torch.randn (unet3D.py:1016-1021)."""
    dims = dims or TOKEN_DIMS
    keys = jax.random.split(rng, len(dims))
    return {
        name: jax.random.normal(k, (num_classes - 1, dim), jnp.float32)
        for k, (name, dim) in zip(keys, dims.items())
    }


def masked_class_sums(x: jax.Array, mask: jax.Array, num_fg: int):
    """Per-class masked channel sums and voxel counts.

    x: (B, d, h, w, C); mask: (B, d, h, w) integer labels (0 = none).
    Returns (sums (num_fg, C), counts (num_fg,)) for labels 1..num_fg.
    """
    b = x.shape[0]
    c = x.shape[-1]
    xf = x.reshape(b, -1, c)
    mf = mask.reshape(b, -1)
    onehot = (mf[None, :, :] == jnp.arange(1, num_fg + 1, dtype=mf.dtype)[:, None, None]).astype(
        x.dtype
    )  # (L, B, S)
    counts = onehot.sum(axis=(1, 2))
    sums = jnp.einsum("lbs,bsc->lc", onehot, xf, preferred_element_type=jnp.float32)
    return sums, counts


def masked_class_means(x: jax.Array, mask: jax.Array, num_fg: int,
                       axis_name: str | None = None):
    """Per-class masked channel means, optionally psum-reduced over a mesh
    axis (the multi-device generalization of the reference's per-rank EMA —
    the reference never synchronized tokens across DDP ranks, letting them
    drift; a psum over the data axis keeps them consistent)."""
    sums, counts = masked_class_sums(x, mask, num_fg)
    if axis_name is not None:
        sums = jax.lax.psum(sums, axis_name)
        counts = jax.lax.psum(counts, axis_name)
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    return means.astype(x.dtype), counts


def renew_tokens(
    tokens: Dict[str, jax.Array],
    features: Sequence[jax.Array],
    fmask: jax.Array,
    alpha: float = 0.01,
    axis_name: str | None = None,
) -> Dict[str, jax.Array]:
    """Functional equivalent of model.renew_token (unet3D.py:1051-1068).

    features: decoder feature maps at the three EAM scales, channels-last.
    fmask: (B, D, H, W) labels where prediction and (supervised) label agree
           (train_amos_atlas_final.py:383-389).
    """
    new = dict(tokens)
    names = list(tokens.keys())
    for name, x in zip(names, features):
        tok = tokens[name]
        num_fg = tok.shape[0]
        m = resize_nearest(fmask[..., None].astype(x.dtype), x.shape[1:4])[..., 0]
        means, counts = masked_class_means(x, m, num_fg, axis_name)
        upd = tok * (1.0 - alpha) + alpha * means.astype(tok.dtype)
        new[name] = jnp.where((counts > 0)[:, None], upd, tok)
    return new


def agreement_mask(cmask: jax.Array, pred_labels: jax.Array, sup_mask: jax.Array) -> jax.Array:
    """fmask: voxels where the supervised label and the argmax prediction agree.

    cmask: (B, D, H, W) labels with unsupervised organs zeroed;
    pred_labels: (B, D, H, W) argmax of the logits;
    sup_mask: (num_classes,) 0/1 supervision bitmask ([0] = background).
    Mirrors train_amos_atlas_final.py:383-389.
    """
    agree = (cmask == pred_labels) & (cmask > 0)
    supervised = jnp.take(sup_mask, cmask.astype(jnp.int32)) > 0
    return jnp.where(agree & supervised, cmask, 0)
