"""Ablation decomposition of the fused train step on the real chip.

Times a ladder of step variants, each dropping one component, so the
difference between adjacent rungs is that component's cost INSIDE the fused
program (with XLA fusion/CSE active — summing isolated microbenches
overstates, PERF.md round-2). Rungs:

  full        the production step (train/step.py)
  nometrics   metrics dict -> constants (organ_scores/refiner_organ_scores off)
  norest      no-grad refiner complement pass off (pseudo-labels only from
              the K-row gradient pass scatter)
  nodisc      GAN G and D terms off (no disc forwards/backwards/update)
  norefiner   refiner gradient pass + refine_loss off
  noconsist   consistency term off (segmentation_loss without refiner_logits)
  segonly     segmenter fwd+bwd+SGD+EMA only (edice loss)

Usage: python scripts/step_ablate.py [--steps 8] [--patch 64,192,192]
"""

from __future__ import annotations

import argparse
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_pl_tpu.losses.compose import refine_loss, segmentation_loss
from multimodal_pl_tpu.losses.gan import smooth_cross_entropy
from multimodal_pl_tpu.models.tokens import agreement_mask, renew_tokens
from multimodal_pl_tpu.train.state import (
    StepConfig,
    all_finite,
    build_models,
    create_train_state,
    fresh_adam_update,
    select_tree,
    torch_sgd_update,
)
from multimodal_pl_tpu.train.step import _weighted_ce_const, poly_lr


def build_ablated_step(model, refiner, disc, cfg: StepConfig, *,
                       metrics_on=True, rest_on=True, disc_on=True,
                       refiner_on=True, consist_on=True):
    nfg = cfg.num_classes - 1

    def seg_losses(params, rparams, state, batch, weight_feature):
        images = batch["image"].astype(cfg.compute_dtype)
        labels = batch["label"]
        catlas = batch["catlas"]
        sup_mask = batch["sup_mask"]
        label_t = batch["label_t"]
        cmask = jnp.where(jnp.take(sup_mask, labels) > 0, labels, 0)

        logits, attns, deeps, feats, _ = model.apply(params, images, state.tokens)
        logits32 = logits.astype(jnp.float32)

        probs0 = jax.nn.softmax(jax.lax.stop_gradient(logits32[0]), axis=-1)
        organ_probs = jnp.moveaxis(probs0[..., 1:], -1, 0).astype(cfg.compute_dtype)
        catlas_c = catlas.astype(cfg.compute_dtype)

        tlist_w = label_t * sup_mask[1:]
        k = min(cfg.refine_grad_organs, nfg)
        order = jnp.argsort(-tlist_w)
        sup_idx, rest_idx = order[:k], order[k:]
        r_loss = 0.0
        rlogits = jnp.zeros((nfg, *labels.shape[1:], 2), jnp.float32)
        if refiner_on:
            rlogits_sup = refiner.apply(
                rparams, (organ_probs[sup_idx], catlas_c[sup_idx])
            ).astype(jnp.float32)
            r_loss = refine_loss(rlogits_sup, cmask, tlist_w[sup_idx],
                                 aug_mask=cfg.augmask, organ_ids=sup_idx + 1)
            rlogits = rlogits.at[sup_idx].set(jax.lax.stop_gradient(rlogits_sup))
            if rest_on and k < nfg:
                rlogits_rest = refiner.apply(
                    jax.lax.stop_gradient(rparams),
                    (organ_probs[rest_idx], catlas_c[rest_idx])
                ).astype(jnp.float32)
                rlogits = rlogits.at[rest_idx].set(rlogits_rest)

        seg = segmentation_loss(
            logits32, cmask, sup_mask, (), attns,
            refiner_logits=jax.lax.stop_gradient(rlogits) if (consist_on and refiner_on) else None,
            label_d=sup_mask[1:], weight_feature=weight_feature,
        )

        loss_d = 0.0
        if disc_on:
            probs_g = jax.nn.softmax(logits32, axis=-1)
            flist_w = 1.0 - label_t
            dfrozen = jax.lax.stop_gradient(state.dparams)
            organ_probs_g = jnp.moveaxis(probs_g[0, ..., 1:], -1, 0)
            din = (organ_probs_g.astype(cfg.compute_dtype), catlas_c)
            d_out = disc.apply(dfrozen, din)
            loss_d = _weighted_ce_const(d_out, flist_w, 1)

        total = seg + r_loss + loss_d * cfg.weight_gan
        aux = {"logits": logits32, "feats": feats, "cmask": cmask,
               "rlogits": rlogits}
        return total, aux

    def disc_loss_fn(dparams, aux, batch):
        label_t = batch["label_t"].astype(jnp.int32)
        probs = jax.nn.softmax(jax.lax.stop_gradient(aux["logits"]), axis=-1)
        organ_probs = jnp.moveaxis(probs[0, ..., 1:], -1, 0)
        din = (organ_probs.astype(cfg.compute_dtype),
               batch["catlas"].astype(cfg.compute_dtype))
        d_out = disc.apply(dparams, din)
        return smooth_cross_entropy(d_out, label_t), d_out

    def step(state, batch, lr, weight_feature):
        (total, aux), grads = jax.value_and_grad(
            lambda p, rp: seg_losses(p, rp, state, batch, weight_feature),
            argnums=(0, 1), has_aux=True,
        )(state.params, state.rparams)
        g_ok = all_finite(grads)
        new_pr, new_mom = torch_sgd_update(
            (state.params, state.rparams), grads, state.momentum, lr,
            cfg.momentum, cfg.weight_decay,
        )
        (params, rparams) = select_tree(g_ok, new_pr, (state.params, state.rparams))
        momentum = select_tree(g_ok, new_mom, state.momentum)

        dparams = state.dparams
        d_loss = jnp.float32(0)
        if disc_on:
            disc_lr = poly_lr(cfg.disc_lr, state.epoch, cfg.num_epochs)
            (d_loss, _), dgrads = jax.value_and_grad(
                lambda dp: disc_loss_fn(dp, aux, batch), has_aux=True
            )(state.dparams)
            d_ok = all_finite(dgrads)
            dparams = select_tree(d_ok, fresh_adam_update(state.dparams, dgrads, disc_lr),
                                  state.dparams)

        pred_labels = jnp.argmax(aux["logits"], axis=-1)
        fmask = agreement_mask(aux["cmask"], pred_labels, batch["sup_mask"])
        new_tokens = renew_tokens(state.tokens, aux["feats"], fmask, cfg.token_alpha,
                                  axis_name=None)
        tokens = select_tree(all_finite(new_tokens), new_tokens, state.tokens)

        new_state = state.replace(
            params=params, rparams=rparams, dparams=dparams,
            momentum=momentum, tokens=tokens, step=state.step + 1,
        )
        if metrics_on:
            from multimodal_pl_tpu.infer.metrics import organ_scores, refiner_organ_scores
            dice, _, _, _ = organ_scores(aux["logits"], batch["label"], nfg)
            rdice, _, _ = refiner_organ_scores(aux["rlogits"], batch["label"][:1], nfg)
            metrics = {"loss": total, "d": jnp.mean(dice), "rd": jnp.mean(rdice),
                       "dl": d_loss}
        else:
            metrics = {"loss": total, "d": jnp.float32(0), "rd": jnp.float32(0),
                       "dl": d_loss}
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


RUNGS = [
    ("full", {}),
    ("nometrics", dict(metrics_on=False)),
    ("norest", dict(metrics_on=False, rest_on=False)),
    ("nodisc", dict(metrics_on=False, rest_on=False, disc_on=False)),
    ("norefiner", dict(metrics_on=False, rest_on=False, disc_on=False,
                       refiner_on=False)),
    ("segonly", dict(metrics_on=False, rest_on=False, disc_on=False,
                     refiner_on=False, consist_on=False)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--patch", default="64,192,192")
    ap.add_argument("--rungs", default=",".join(n for n, _ in RUNGS))
    args = ap.parse_args()
    patch = tuple(map(int, args.patch.split(",")))

    from multimodal_pl_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    cfg = StepConfig(num_classes=14, deep_up=True, augmask=2, weight_gan=1e-3,
                     compute_dtype=jnp.bfloat16)
    model, refiner, disc = build_models(cfg)

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((1, *patch, 1)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 14, (1, *patch)), jnp.int32),
        "catlas": jnp.asarray(rng.random((13, *patch)), jnp.float32),
        "sup_mask": jnp.asarray([0, 0, 0, 1] + [0] * 10, jnp.float32),
        "label_t": jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1, 1, 0, 1, 1, 1], jnp.float32),
    }
    lr, wf = jnp.float32(5e-4), jnp.float32(0.05)

    want = set(args.rungs.split(","))
    prev = None
    for name, kw in RUNGS:
        if name not in want:
            continue
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        step = build_ablated_step(model, refiner, disc, cfg, **kw)
        for _ in range(2):
            state, m = step(state, batch, lr, wf)
            _ = float(m["loss"])
        ts = []
        for _ in range(args.steps):
            t0 = time.perf_counter()
            state, m = step(state, batch, lr, wf)
            _ = float(m["loss"])
            ts.append(time.perf_counter() - t0)
        med = statistics.median(ts)
        delta = "" if prev is None else f"  (component: {1e3 * (prev - med):+7.1f} ms)"
        print(f"{name:10s} {med * 1e3:7.1f} ms/step{delta}", flush=True)
        prev = med


if __name__ == "__main__":
    main()
