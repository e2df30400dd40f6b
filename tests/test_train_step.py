"""Mechanics of the fused train step on a tiny synthetic batch (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_pl_tpu.train import StepConfig, TrainState, create_train_state, make_train_step
from multimodal_pl_tpu.train.state import (
    build_models,
    fresh_adam_update,
    tiny_step_config,
    torch_sgd_update,
)
from multimodal_pl_tpu.train.step import poly_lr

# tiny-geometry tier (matches the driver's dryrun_multichip): full step
# STRUCTURE — both forwards, 3 losses, 2 optimizers, token EMA — compiled
# cold in minutes on a 1-vCPU host. 32^3 is the smallest patch its stride
# pyramids allow (refiner 5 stride-2 levels; disc depth 5 -> final 1^3).
# The production 64^3 geometry is covered by tests/test_parallel.py's
# MPL_HEAVY_TESTS-gated TestFullShardedStepFull tier.
P = (32, 32, 32)
NC = 14


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_step_config(num_classes=NC, deep_up=True, augmask=2, weight_gan=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    model, refiner, disc = build_models(cfg)
    step = make_train_step(model, refiner, disc, cfg)

    rng = np.random.default_rng(0)
    labels = rng.integers(0, NC, (1, *P)).astype(np.int32)
    batch = {
        "image": jnp.asarray(rng.standard_normal((1, *P, 1)), jnp.float32),
        "label": jnp.asarray(labels),
        "catlas": jnp.asarray(rng.random((NC - 1, *P)), jnp.float32),
        # [0]=0: the background channel carries no loss weight (reference
        # feeds the raw csv row, slot 0 always 0 — train:312)
        "sup_mask": jnp.asarray([0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], jnp.float32),
        "label_t": jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1, 1, 0, 1, 1, 1], jnp.float32),
    }
    return cfg, state, step, batch


def _clone(tree):
    """Fresh device buffers — the jitted step donates its input state, so
    tests sharing the module-scoped fixture must not reuse its buffers."""
    return jax.tree_util.tree_map(jnp.array, tree)


def test_step_runs_and_updates(setup):
    cfg, state, step, batch = setup
    state = _clone(state)
    tok_before = jax.tree_util.tree_map(np.asarray, state.tokens)
    p_before = np.asarray(
        state.params["params"]["encoder"]["conv1"]["kernel"]
    ).copy()
    d_before = np.asarray(state.dparams["params"]["block1"]["kernel"]).copy()

    state2, metrics = step(state, batch, jnp.float32(5e-4), jnp.float32(0.05))

    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"metric {k} not finite"
    assert float(metrics["loss"]) > 0
    assert int(state2.step) == 1

    p_after = np.asarray(state2.params["params"]["encoder"]["conv1"]["kernel"])
    assert not np.allclose(p_before, p_after), "segmenter params did not move"
    d_after = np.asarray(state2.dparams["params"]["block1"]["kernel"])
    assert not np.allclose(d_before, d_after), "discriminator params did not move"

    # supervised organ 3 appears in labels -> its token should move where predicted
    moved = any(
        not np.allclose(np.asarray(state2.tokens[k]), tok_before[k]) for k in tok_before
    )
    # token only moves when prediction agrees with label; random init may not agree,
    # so just assert tokens are finite and shapes preserved
    for k in tok_before:
        assert np.asarray(state2.tokens[k]).shape == tok_before[k].shape
        assert np.all(np.isfinite(np.asarray(state2.tokens[k])))

    # second step must reuse the compiled program and keep being finite
    state3, metrics3 = step(state2, batch, jnp.float32(4e-4), jnp.float32(0.05))
    assert np.isfinite(float(metrics3["loss"]))


def test_sgd_matches_torch(rng):
    import torch

    p0 = rng.standard_normal((5, 3)).astype(np.float32)
    steps = [rng.standard_normal((5, 3)).astype(np.float32) for _ in range(3)]

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.SGD([tp], lr=0.01, momentum=0.9, weight_decay=1e-4)
    for g in steps:
        opt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        opt.step()

    jp, buf = jnp.asarray(p0), jnp.zeros_like(jnp.asarray(p0))
    for g in steps:
        jp, buf = torch_sgd_update(jp, jnp.asarray(g), buf, 0.01, 0.9, 1e-4)
    np.testing.assert_allclose(np.asarray(jp), tp.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_fresh_adam_matches_torch(rng):
    import torch

    p0 = rng.standard_normal((4, 4)).astype(np.float32)
    g = rng.standard_normal((4, 4)).astype(np.float32)

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.Adam([tp], lr=1e-4)  # fresh optimizer, single step
    tp.grad = torch.from_numpy(g.copy())
    opt.step()

    jp = fresh_adam_update(jnp.asarray(p0), jnp.asarray(g), 1e-4)
    np.testing.assert_allclose(np.asarray(jp), tp.detach().numpy(), rtol=1e-4, atol=1e-7)


def test_poly_lr_matches_reference():
    # lr_poly(base, iter, max_iter, power) = base * (1 - iter/max)^power
    for e in [0, 100, 499]:
        got = float(poly_lr(5e-4, e, 500, 0.9))
        want = 5e-4 * (1 - e / 500) ** 0.9
        np.testing.assert_allclose(got, want, rtol=5e-5)  # f32 pow precision


def test_finite_guard_helpers():
    from multimodal_pl_tpu.train.state import all_finite, select_tree

    good = {"a": jnp.ones(3), "b": jnp.zeros(2)}
    bad = {"a": jnp.ones(3), "b": jnp.array([1.0, np.nan])}
    assert bool(all_finite(good))
    assert not bool(all_finite(bad))
    out = select_tree(all_finite(bad), bad, good)
    np.testing.assert_array_equal(np.asarray(out["b"]), np.asarray(good["b"]))
    out2 = select_tree(all_finite(good), bad, good)  # flag True -> takes new
    np.testing.assert_array_equal(np.asarray(out2["a"]), np.asarray(bad["a"]))


def test_ws_standardize_f32_stats_under_bf16(rng):
    from multimodal_pl_tpu.ops.conv import standardize_kernel

    w = (rng.standard_normal((3, 3, 3, 4, 8)) * 1e-3).astype(np.float32)
    got_bf16 = standardize_kernel(jnp.asarray(w, jnp.bfloat16))
    got_f32 = standardize_kernel(jnp.asarray(w))
    assert got_bf16.dtype == jnp.bfloat16
    # bf16-stored result must agree with the f32 computation to bf16 precision
    np.testing.assert_allclose(np.asarray(got_bf16, np.float32), np.asarray(got_f32),
                               rtol=2e-2, atol=2e-2)


def test_step_seg_loss_composition(setup):
    """Pin the fused step's seg_loss to the directly-composed reference loss,
    including the pseudo-label branch keying on PER-CASE supervision
    (label_d == sup_mask[1:], reference train:312) — regression for wiring
    the modality vector there, which silently disables the consistency term
    for labeled-modality cases."""
    from multimodal_pl_tpu.losses.compose import segmentation_loss

    cfg, state, step, batch = setup
    state = _clone(state)
    model, refiner, _ = build_models(cfg)
    wf = jnp.float32(0.08)

    logits, attns, deeps, _, _ = model.apply(state.params, batch["image"], state.tokens)
    logits32 = logits.astype(jnp.float32)
    cmask = jnp.where(jnp.take(batch["sup_mask"], batch["label"]) > 0, batch["label"], 0)
    probs0 = jax.nn.softmax(logits32[0], axis=-1)
    organ_probs = jnp.moveaxis(probs0[..., 1:], -1, 0)
    rlogits = refiner.apply(
        state.rparams, (organ_probs, batch["catlas"])).astype(jnp.float32)
    # deep_outs=(): the reference driver passes deep_out=[] (train:305, :312)
    expected = float(segmentation_loss(
        logits32, cmask, batch["sup_mask"], (), attns,
        refiner_logits=rlogits, label_d=batch["sup_mask"][1:], weight_feature=wf,
    ))

    _, metrics = step(state, batch, jnp.float32(5e-4), wf)
    np.testing.assert_allclose(float(metrics["seg_loss"]), expected, rtol=2e-5)


def test_step_pallas_infer_parity(setup):
    """StepConfig.pallas_infer routes the no-grad refiner complement pass
    through the inference-only fused Pallas kernels (interpret mode on CPU).
    The step's losses, updated params, and pseudo-label metrics must match
    the default path: the subgraph is gradient-free by construction, so the
    routing may change the engine but never the math (round-4 B=1 lever)."""
    cfg, state, step, batch = setup
    model, refiner, disc = build_models(cfg)
    step_i = make_train_step(model, refiner, disc,
                             cfg.replace(pallas_infer=True))

    s_a, m_a = step(_clone(state), batch, jnp.float32(5e-4), jnp.float32(0.05))
    s_b, m_b = step_i(_clone(state), batch, jnp.float32(5e-4), jnp.float32(0.05))

    for k in ("loss", "seg_loss", "refine_loss", "refiner_dice_mean"):
        np.testing.assert_allclose(float(m_a[k]), float(m_b[k]), rtol=1e-4,
                                   err_msg=f"metric {k} diverged")
    pa = np.asarray(s_a.params["params"]["encoder"]["conv1"]["kernel"])
    pb = np.asarray(s_b.params["params"]["encoder"]["conv1"]["kernel"])
    np.testing.assert_allclose(pa, pb, atol=1e-6)


def test_check_refine_grad_capacity():
    """refine_grad_organs must cover the max per-case supervised
    labeled-modality organ count or the refiner gradient pass silently drops
    tlist rows (advisor finding, train/step.py static-K gather)."""
    from multimodal_pl_tpu.data.supervision import label_t_of, supervision_mask_for_case
    from multimodal_pl_tpu.train.loop import check_refine_grad_capacity

    class StubDS:
        # CT case 40 supervises one organ; the single-organ AMOS csv never
        # exceeds 1, so capacity 2 passes and capacity 0 must raise
        cids = [40, 500]

        def supervision_rows(self):
            for cid in self.cids:
                yield supervision_mask_for_case(cid), label_t_of(cid)

    got = check_refine_grad_capacity(StubDS(), StepConfig(refine_grad_organs=2))
    want = int(np.sum(supervision_mask_for_case(40)[1:] * label_t_of(40)))
    assert got == want and got >= 0

    if want > 0:
        with pytest.raises(ValueError, match="refine_grad_organs"):
            check_refine_grad_capacity(StubDS(), StepConfig(refine_grad_organs=0))


def test_check_refine_grad_capacity_requires_interface():
    """A dataset without supervision_rows must fail FAST, not silently skip
    the guard (round-2 verdict: getattr(..., 'files', []) no-op'd for wrapped
    datasets and refiner gradients would silently drop tlist organs)."""
    from multimodal_pl_tpu.train.loop import check_refine_grad_capacity

    class Wrapped:  # e.g. a device pipeline or custom source without metadata
        pass

    with pytest.raises(TypeError, match="supervision_rows"):
        check_refine_grad_capacity(Wrapped(), StepConfig())


def test_check_refine_grad_capacity_over_capacity_multisource():
    """An over-capacity case in ANY dataset exposing the interface (incl.
    MultiSourceDataset, which inherits supervision_rows) fails fast."""
    import numpy as np

    from multimodal_pl_tpu.train.loop import check_refine_grad_capacity

    class OverCap:
        def supervision_rows(self):
            sup = np.zeros(14, np.float32)
            sup[1:6] = 1.0                      # five supervised organs
            yield sup, np.ones(13, np.float32)  # all labeled-modality

    with pytest.raises(ValueError, match="refine_grad_organs"):
        check_refine_grad_capacity(OverCap(), StepConfig(refine_grad_organs=2))
    assert check_refine_grad_capacity(OverCap(), StepConfig(refine_grad_organs=5)) == 5
