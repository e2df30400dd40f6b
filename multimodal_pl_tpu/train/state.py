"""Train state: every mutable quantity of a training run in one pytree.

Covers what the reference scatters across objects and fixes its checkpoint
gap: segmenter/refiner/discriminator params, SGD momentum buffers, the EMA
class tokens (NOT in the reference's state_dict — unet3D.py:1016-1021 are
plain tensors, silently dropped on save; see SURVEY.md §5), and step/epoch
counters. Being a single pytree, it shards/checkpoints/donates as one unit.

Optimizer semantics (documented deviations):
- Segmenter: torch-SGD(momentum=0.9, wd=1e-4) semantics, poly LR per epoch
  (train_amos_atlas_final.py:132-135, 198).
- Refiner: the snapshot's optimizer covers only model.parameters()
  (train:132), which would leave the refiner frozen at init even though its
  loss is computed and backpropagated — an apparent snapshot bug. We include
  the refiner in the SGD update (the paper's intent); set
  ``train_refiner=False`` in StepConfig to reproduce the literal snapshot.
- Discriminator: the reference builds a FRESH Adam(lr=1e-4·poly) every
  iteration (train:324) — with zeroed moments every step, Adam reduces to
  g / (|g| + eps), i.e. sign-SGD. We implement exactly that update.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp

from multimodal_pl_tpu.models import (
    NormStyleDiscriminator,
    DeepStyleDiscriminator,
    RefinerUNet3D,
    UNet3DFEAM,
    init_class_tokens,
)


@flax.struct.dataclass
class StepConfig:
    """Static (hashable) per-run configuration baked into the jit'd step."""

    num_classes: int = flax.struct.field(pytree_node=False, default=14)
    num_epochs: int = flax.struct.field(pytree_node=False, default=500)
    deep_up: bool = flax.struct.field(pytree_node=False, default=True)
    augmask: int = flax.struct.field(pytree_node=False, default=2)
    weight_gan: float = flax.struct.field(pytree_node=False, default=1e-3)
    momentum: float = flax.struct.field(pytree_node=False, default=0.9)
    weight_decay: float = flax.struct.field(pytree_node=False, default=1e-4)
    disc_lr: float = flax.struct.field(pytree_node=False, default=1e-4)
    token_alpha: float = flax.struct.field(pytree_node=False, default=0.01)
    # static batch size of the refiner's gradient pass: tlist rows (supervised
    # & labeled-modality organs) are gathered up front, at most one per AMOS
    # case (supervise_mask.csv), so 2 covers the data with augmask headroom
    refine_grad_organs: int = flax.struct.field(pytree_node=False, default=2)
    train_refiner: bool = flax.struct.field(pytree_node=False, default=True)
    remat: bool = flax.struct.field(pytree_node=False, default=False)
    pretrain_epoch: int = flax.struct.field(pytree_node=False, default=20)
    ramp_until: int = flax.struct.field(pytree_node=False, default=50)
    weight_feature_max: float = flax.struct.field(pytree_node=False, default=0.1)
    compute_dtype: Any = flax.struct.field(pytree_node=False, default=jnp.float32)
    # route the voxel-domain GN->ReLU pre-activations through the fused
    # Pallas kernel (ops/pallas/fused_gn_relu.py). Applied globally via
    # ops.norm.set_fused_gn_relu at step/predictor build time.
    pallas_gn: bool = flax.struct.field(pytree_node=False, default=False)
    # route s2d block-domain stride-1 k2 convs through the Pallas
    # fused-gather kernel (ops/pallas/k2_conv.py). Applied globally via
    # ops.s2d.set_k2_pallas at step/predictor build time.
    pallas_k2: bool = flax.struct.field(pytree_node=False, default=False)
    # route the step's GRADIENT-FREE subgraph (the no-grad all-organ refiner
    # complement pass, train_amos_atlas_final.py:289-290) through the
    # inference-only fused GN->ReLU->k2 Pallas path, the same kernels
    # mpl-evaluate ships with. Differentiated subgraphs are unaffected.
    pallas_infer: bool = flax.struct.field(pytree_node=False, default=False)
    # ---- model geometry (defaults == the reference network; the tiny
    # values exist so the driver's multichip dryrun and the cold-host test
    # tier can compile the FULL step structure in minutes on 1 vCPU) ----
    # run the segmenter on the round-5 mixed-axis block domain (ops/bd.py)
    # instead of the 3-axis s2d domain — minimal-MAC-inflation layouts,
    # differentiable through the XLA lowerings (param tree unchanged)
    bd: bool = flax.struct.field(pytree_node=False, default=False)
    base: int = flax.struct.field(pytree_node=False, default=32)
    layers: tuple = flax.struct.field(pytree_node=False, default=(1, 2, 2, 2, 2))
    refiner_filter: int = flax.struct.field(pytree_node=False, default=24)
    disc_ndf: int = flax.struct.field(pytree_node=False, default=32)
    disc_depth: int = flax.struct.field(pytree_node=False, default=6)
    weight_std: bool = flax.struct.field(pytree_node=False, default=True)


def tiny_step_config(**overrides) -> "StepConfig":
    """The smallest geometry the step's stride pyramids allow: 32^3 patches
    (refiner: 5 stride-2 levels; disc depth 5 -> final 1^3), base 16 (GN
    groups of 16 must divide every stage width), single-block stages.
    Full step STRUCTURE — both forwards, all losses, both optimizers, token
    EMA — at ~1/40 the compile+execute cost of the production geometry."""
    cfg = dict(base=16, layers=(1, 1, 1, 1, 1), refiner_filter=8,
               disc_ndf=16, disc_depth=5)
    cfg.update(overrides)
    return StepConfig(**cfg)


def token_dims_for(cfg: StepConfig) -> Dict[str, int]:
    """EAM token dims track the decoder widths at the three EAM scales."""
    return {"t1": 4 * cfg.base, "t2": 2 * cfg.base, "t3": cfg.base}


def build_models(cfg: StepConfig):
    """The (segmenter, refiner, discriminator) triple for a StepConfig — the
    single construction point shared by the CLI, the driver dryrun and the
    test tiers, so geometry knobs can never drift between them."""
    model = UNet3DFEAM(layers=cfg.layers, num_classes=cfg.num_classes,
                       weight_std=cfg.weight_std, deep_up=cfg.deep_up,
                       base=cfg.base, remat=cfg.remat, bd=cfg.bd)
    refiner = RefinerUNet3D(num_classes=2, weight_std=cfg.weight_std,
                            init_filter=cfg.refiner_filter, in_channel=2)
    disc = (NormStyleDiscriminator(ndf=cfg.disc_ndf, depth=cfg.disc_depth)
            if cfg.deep_up else DeepStyleDiscriminator(ndf=cfg.disc_ndf))
    return model, refiner, disc


@flax.struct.dataclass
class TrainState:
    params: Any            # segmenter
    rparams: Any           # refiner
    dparams: Any           # discriminator
    momentum: Any          # SGD momentum for (params, rparams)
    tokens: Dict[str, jax.Array]
    step: jax.Array
    epoch: jax.Array


def create_train_state(rng: jax.Array, cfg: StepConfig,
                       patch: tuple = (64, 192, 192)) -> TrainState:
    """Build models + fresh state. Init runs at a tiny spatial shape (the
    params only depend on channel counts) to keep compile time down."""
    k_model, k_ref, k_disc, k_tok = jax.random.split(rng, 4)
    nc = cfg.num_classes

    model, refiner, disc = build_models(cfg)
    tokens = init_class_tokens(k_tok, nc, dims=token_dims_for(cfg))
    tiny = jnp.zeros((1, 16, 32, 32, 1))
    # jit the inits: unjitted flax init dispatches hundreds of single ops
    params = jax.jit(model.init)(k_model, tiny, tokens)

    rparams = jax.jit(refiner.init)(k_ref, jnp.zeros((1, 32, 32, 32, 2)))

    if cfg.deep_up:
        # init spatial = 2**(depth-1): the smallest size where every pyramid
        # level is non-empty (the trace just shapes the params)
        s = 2 ** (cfg.disc_depth - 1)
        dparams = jax.jit(disc.init)(k_disc, jnp.zeros((1, s, s, s, 2)))
    else:
        dparams = jax.jit(disc.init)(
            k_disc,
            jnp.zeros((1, 32, 96, 96, 2)),
            [jnp.zeros((1, 4, 12, 12, 1)), jnp.zeros((1, 8, 24, 24, 1)),
             jnp.zeros((1, 16, 48, 48, 1))],
        )

    momentum = jax.tree_util.tree_map(jnp.zeros_like, (params, rparams))
    return TrainState(
        params=params,
        rparams=rparams,
        dparams=dparams,
        momentum=momentum,
        tokens=tokens,
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
    )


def torch_sgd_update(params, grads, buf, lr, momentum=0.9, weight_decay=1e-4):
    """torch.optim.SGD (dampening=0, nesterov=False) semantics:
    g += wd * p;  buf = mu * buf + g;  p -= lr * buf."""

    new_buf = jax.tree_util.tree_map(
        lambda p, g, b: momentum * b + (g + weight_decay * p), params, grads, buf
    )
    new_params = jax.tree_util.tree_map(lambda p, b: p - lr * b, params, new_buf)
    return new_params, new_buf


def fresh_adam_update(params, grads, lr, eps=1e-8):
    """One step of a freshly-initialized Adam == lr * g / (|g| + eps)
    (the reference's per-iteration Adam reconstruction, train:324)."""
    return jax.tree_util.tree_map(lambda p, g: p - lr * g / (jnp.abs(g) + eps), params, grads)


def all_finite(tree) -> jax.Array:
    """Scalar bool: every leaf of the pytree is finite."""
    leaves = jax.tree_util.tree_leaves(tree)
    ok = jnp.array(True)
    for l in leaves:
        ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(l)))
    return ok


def select_tree(flag: jax.Array, new, old):
    """new where flag else old, leafwise (skip-bad-update guard)."""
    return jax.tree_util.tree_map(lambda a, b: jnp.where(flag, a, b), new, old)
