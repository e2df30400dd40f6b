"""The fused training step — one jit'd program per configuration.

One reference iteration (train_amos_atlas_final.py:209-391) is ~15 separate
graph launches with host round-trips (forward, refiner x2, two backwards, a
rebuilt Adam, token EMA in Python loops). Here the whole iteration — both
forwards, all losses, both gradient computations, both optimizer updates and
the token EMA — is a single XLA program with donated state, so weights and
activations never leave HBM and XLA fuses across all of it.

Exact-math notes (all verified by tests against the reference formulas):
- Python index-set shuffles (flist/tlist/clist/dlist, train:228-244) only feed
  order-invariant reductions, so they become 0/1 weight vectors.
- ``mask_aug`` duplication (train:279) is an exact x-augmask loss scale
  because the copies are identical and the refiner is deterministic.
- The reference's separate no-grad refiner pass (train:289-290) is the same
  forward as the training pass restricted to all organs; we run the all-organ
  pass once and use stop_gradient for the pseudo-label consumer.
- The per-iteration fresh Adam == sign-SGD update (see state.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multimodal_pl_tpu.losses.compose import refine_loss, segmentation_loss
from multimodal_pl_tpu.losses.gan import smooth_cross_entropy
from multimodal_pl_tpu.models.tokens import agreement_mask, renew_tokens
from multimodal_pl_tpu.train.state import (
    StepConfig,
    TrainState,
    all_finite,
    fresh_adam_update,
    select_tree,
    torch_sgd_update,
)


def poly_lr(base_lr: float, epoch, num_epochs: int, power: float = 0.9):
    """lr_poly (reference utils.py:53-60)."""
    return base_lr * (1.0 - jnp.asarray(epoch, jnp.float32) / num_epochs) ** power


def _weighted_ce_const(logits, weights, label: int):
    """bce_loss over a row subset: mean CE over rows with weight 1."""
    n = logits.shape[-1]
    onehot = jax.nn.one_hot(jnp.full((logits.shape[0],), label), n, dtype=jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.sum(onehot * logp, axis=-1)
    w = weights.astype(jnp.float32)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)


def _apply_pallas_flags(cfg: StepConfig) -> None:
    """Trace-time Pallas routing switches (read inside model code)."""
    from multimodal_pl_tpu.ops.norm import set_fused_gn_relu
    from multimodal_pl_tpu.ops.s2d import set_k2_pallas

    set_fused_gn_relu(cfg.pallas_gn)
    set_k2_pallas(cfg.pallas_k2)


def build_step_body(model, refiner, disc, cfg: StepConfig, axis_name: str | None = None):
    """Unjitted step body: step(state, batch, lr, weight_feature) ->
    (state, metrics).

    axis_name: when set (SPMD via shard_map over a data mesh), gradients and
    reported losses are pmean'd and the token EMA statistics psum'd over that
    axis — the TPU-native replacement for the reference's NCCL all-reduce
    (engine.py:57, train:314-315) with identical averaged-gradient semantics.

    batch dict (all device arrays):
      image:  (B, D, H, W, 1) float
      label:  (B, D, H, W) int32 full labels
      catlas: (C-1, D, H, W) float atlas prior (resized to the patch)
      sup_mask: (C,) float 0/1 supervision bitmask, [0] == 0 — the
        background channel carries NO loss weight (the reference feeds the
        raw csv row, slot 0 always 0, straight into get_loss as the class
        weights, train:312; see data/supervision.py)
      label_t:  (C-1,) float modality flags (train:223-226)
    lr: segmenter/refiner learning rate (poly-scheduled by the caller);
    weight_feature: pseudo-label ramp weight (0 during pretrain).
    """
    _apply_pallas_flags(cfg)
    nfg = cfg.num_classes - 1

    def seg_losses(params, rparams, state, batch, weight_feature):
        images = batch["image"].astype(cfg.compute_dtype)
        labels = batch["label"]
        catlas = batch["catlas"]
        sup_mask = batch["sup_mask"]
        label_t = batch["label_t"]

        # cmask: zero out unsupervised organs (train:252-255)
        cmask = jnp.where(jnp.take(sup_mask, labels) > 0, labels, 0)

        logits, attns, deeps, feats, _ = model.apply(params, images, state.tokens)
        logits32 = logits.astype(jnp.float32)

        # ---- refiner (organ-prob ++ atlas channels), two passes exactly as
        # the reference (train:277-291): a GRADIENT pass over only the
        # supervised labeled-modality organs (tlist — at most one per AMOS
        # case), and a no-grad all-organ pass for the pseudo-labels. Running
        # the gradient pass on a static-size gather of tlist rows instead of
        # masking a full 13-organ batch cuts the refiner's backward 13/K-fold
        # (743 -> 628 ms/step at the production patch); the gather commutes
        # with the per-sample refiner, so the loss value is identical. ----
        # (prob, atlas) channel pairs are passed as separate well-tiled
        # planes — the models pack them straight into the s2d block domain
        # (see RefinerUNet3D docstring; a full-res channels-last C=2 tensor
        # pads the 128-lane dim 64x)
        probs0 = jax.nn.softmax(jax.lax.stop_gradient(logits32[0]), axis=-1)   # (D,H,W,C)
        organ_probs = jnp.moveaxis(probs0[..., 1:], -1, 0).astype(cfg.compute_dtype)
        catlas_c = catlas.astype(cfg.compute_dtype)                            # (13,D,H,W)

        tlist_w = label_t * sup_mask[1:]                     # supervised & labeled-modality
        k = min(cfg.refine_grad_organs, nfg)
        order = jnp.argsort(-tlist_w)                        # tlist rows first; pad rows get weight 0
        sup_idx, rest_idx = order[:k], order[k:]
        rlogits_sup = refiner.apply(
            rparams, (organ_probs[sup_idx], catlas_c[sup_idx])
        ).astype(jnp.float32)
        r_loss = refine_loss(rlogits_sup, cmask, tlist_w[sup_idx],
                             aug_mask=cfg.augmask, organ_ids=sup_idx + 1)

        # pseudo-label pass: all organs, no gradient (reference torch.no_grad,
        # train:289-290). The gradient pass above already ran the sup_idx rows
        # through the same refiner with the same inputs, so only the nfg-k
        # complement rows are recomputed here and the full (nfg, ...) output
        # is reassembled by scatter — identical values, 13/(13-k) less
        # refiner forward work than rerunning all organs.
        if k < nfg:
            from multimodal_pl_tpu.ops.s2d import pallas_inference_scope

            # this pass is gradient-free by construction (rparams and both
            # inputs are stop_gradient'd), so when cfg.pallas_infer is set it
            # takes the inference-only fused GN->ReLU->k2 kernels — the
            # normalized activations never round-trip HBM, same as eval
            with pallas_inference_scope(cfg.pallas_infer or cfg.pallas_k2,
                                        cfg.pallas_infer):
                rlogits_rest = refiner.apply(
                    jax.lax.stop_gradient(rparams),
                    (jax.lax.stop_gradient(organ_probs[rest_idx]),
                     jax.lax.stop_gradient(catlas_c[rest_idx]))
                ).astype(jnp.float32)
            rlogits = (
                jnp.zeros((nfg, *rlogits_rest.shape[1:]), jnp.float32)
                .at[sup_idx].set(jax.lax.stop_gradient(rlogits_sup))
                .at[rest_idx].set(rlogits_rest)
            )
        else:
            rlogits = jax.lax.stop_gradient(rlogits_sup)[jnp.argsort(sup_idx)]

        # deep_outs=(): the final reference driver passes deep_out=[] into
        # get_loss (train:305, :312) — the deep-supervision heads receive no
        # dice terms; the multi-scale signal comes from the attention maps in
        # the consistency term instead.
        seg = segmentation_loss(
            logits32, cmask, sup_mask, (), attns,
            refiner_logits=jax.lax.stop_gradient(rlogits),
            label_d=sup_mask[1:], weight_feature=weight_feature,
        )

        # ---- generator GAN term (discriminator frozen, train:323-347) ----
        probs_g = jax.nn.softmax(logits32, axis=-1)
        flist_w = 1.0 - label_t
        dfrozen = jax.lax.stop_gradient(state.dparams)
        organ_probs_g = jnp.moveaxis(probs_g[0, ..., 1:], -1, 0)               # (13,D,H,W)
        din = (organ_probs_g.astype(cfg.compute_dtype), catlas_c)
        if cfg.deep_up:
            d_out = disc.apply(dfrozen, din)
            loss_d = _weighted_ce_const(d_out, flist_w, 1) * 1.0               # weights[3]
        else:
            amaps = [
                jnp.moveaxis(jax.nn.softmax(a.astype(jnp.float32), -1)[0], -1, 0)[..., None]
                for a in attns
            ]
            d_out = disc.apply(dfrozen, din, amaps)
            loss_d = _weighted_ce_const(d_out, flist_w, 1)

        total = seg + r_loss + loss_d * cfg.weight_gan
        aux = {
            "logits": logits32, "attns": attns, "feats": feats, "cmask": cmask,
            "rlogits": rlogits, "seg_loss": seg, "refine_loss": r_loss, "gan_g_loss": loss_d,
        }
        return total, aux

    def disc_loss_fn(dparams, aux, batch):
        """Discriminator CE on detached inputs over all organs (train:349-368)."""
        label_t = batch["label_t"].astype(jnp.int32)
        probs = jax.nn.softmax(jax.lax.stop_gradient(aux["logits"]), axis=-1)
        organ_probs = jnp.moveaxis(probs[0, ..., 1:], -1, 0)
        din = (organ_probs.astype(cfg.compute_dtype),
               batch["catlas"].astype(cfg.compute_dtype))
        if cfg.deep_up:
            d_out = disc.apply(dparams, din)
        else:
            amaps = [
                jnp.moveaxis(
                    jax.nn.softmax(jax.lax.stop_gradient(a.astype(jnp.float32)), -1)[0], -1, 0
                )[..., None]
                for a in aux["attns"]
            ]
            d_out = disc.apply(dparams, din, amaps)
        return smooth_cross_entropy(d_out, label_t), d_out

    def step(state: TrainState, batch, lr, weight_feature):
        # --- segmenter + refiner grads ---
        if cfg.train_refiner:
            (total, aux), grads = jax.value_and_grad(
                lambda p, rp: seg_losses(p, rp, state, batch, weight_feature), argnums=(0, 1),
                has_aux=True,
            )(state.params, state.rparams)
        else:
            (total, aux), gmodel = jax.value_and_grad(
                lambda p: seg_losses(p, state.rparams, state, batch, weight_feature),
                has_aux=True,
            )(state.params)
            grads = (gmodel, jax.tree_util.tree_map(jnp.zeros_like, state.rparams))
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        # non-finite-gradient guard (absent in the reference): a single bad
        # bf16 step otherwise poisons the weights permanently — skip it instead
        g_ok = all_finite(grads)
        new_pr, new_mom = torch_sgd_update(
            (state.params, state.rparams), grads, state.momentum, lr,
            cfg.momentum, cfg.weight_decay,
        )
        (params, rparams) = select_tree(g_ok, new_pr, (state.params, state.rparams))
        momentum = select_tree(g_ok, new_mom, state.momentum)

        # --- discriminator grads (fresh-Adam/sign update, poly lr) ---
        disc_lr = poly_lr(cfg.disc_lr, state.epoch, cfg.num_epochs)  # train:325
        (d_loss, _), dgrads = jax.value_and_grad(
            lambda dp: disc_loss_fn(dp, aux, batch), has_aux=True
        )(state.dparams)
        if axis_name is not None:
            dgrads = jax.lax.pmean(dgrads, axis_name)
            d_loss = jax.lax.pmean(d_loss, axis_name)
            total = jax.lax.pmean(total, axis_name)
        d_ok = all_finite(dgrads)
        dparams = select_tree(d_ok, fresh_adam_update(state.dparams, dgrads, disc_lr),
                              state.dparams)

        # --- class-token EMA renew (train:382-391), guarded like the updates ---
        pred_labels = jnp.argmax(aux["logits"], axis=-1)
        fmask = agreement_mask(aux["cmask"], pred_labels, batch["sup_mask"])
        new_tokens = renew_tokens(state.tokens, aux["feats"], fmask, cfg.token_alpha,
                                  axis_name=axis_name)
        tokens = select_tree(all_finite(new_tokens), new_tokens, state.tokens)

        new_state = state.replace(
            params=params, rparams=rparams, dparams=dparams,
            momentum=momentum, tokens=tokens, step=state.step + 1,
        )
        # per-iteration training dice vs the FULL labels (train:265-275), plus
        # refiner pseudo-label dice (get_dice2, train:294)
        from multimodal_pl_tpu.infer.metrics import organ_scores, refiner_organ_scores

        dice, _, _, _ = organ_scores(aux["logits"], batch["label"], nfg)
        rdice, _, _ = refiner_organ_scores(aux["rlogits"], batch["label"][:1], nfg)
        supw = batch["sup_mask"][1:].astype(jnp.float32)

        metrics = {
            "loss": total,
            "seg_loss": aux["seg_loss"],
            "refine_loss": aux["refine_loss"],
            "gan_g_loss": aux["gan_g_loss"],
            "disc_loss": d_loss,
            "train_dice_mean": jnp.mean(dice),
            # dice restricted to this batch's supervised organs — the signal
            # the partial-label loss actually trains (cf. reference val_Dice3)
            "train_dice_sup": jnp.sum(dice * supw) / jnp.maximum(jnp.sum(supw), 1.0),
            "refiner_dice_mean": jnp.mean(rdice),
            "grads_finite": g_ok.astype(jnp.float32),
            "disc_grads_finite": d_ok.astype(jnp.float32),
            "lr": lr,
        }
        return new_state, metrics

    return step


def make_train_step(model, refiner, disc, cfg: StepConfig):
    """Single-device fused train step: the whole reference iteration as one
    jit'd program with donated state."""
    body = build_step_body(model, refiner, disc, cfg, axis_name=None)
    return jax.jit(body, donate_argnums=(0,))
