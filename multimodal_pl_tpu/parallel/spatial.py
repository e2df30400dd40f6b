"""Spatial (volume-axis) model parallelism via XLA GSPMD auto-partitioning.

The reference has no tensor/spatial parallelism at all (SURVEY §2: DP only);
this is the TPU-native stretch capability for volumes or tiles too large for
one chip's HBM. Instead of hand-writing halo exchanges, the forward is jit'd
with the activations sharded along a spatial axis of the NDHWC tensor and
the parameters replicated — XLA's SPMD partitioner propagates the sharding
through the network and inserts the conv halo exchanges / GroupNorm
cross-slab reductions / attention all-gathers itself, riding the ICI. This
is the "annotate shardings, let XLA insert collectives" recipe — the
idiomatic TPU formulation of what a CUDA framework would hand-roll with
NCCL send/recv halos.

Results are bit-identical to the unsharded forward up to XLA reduction
ordering (pinned by tests/test_parallel.py on the virtual CPU mesh).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


#: NDHWC axis index -> PartitionSpec slot for the sharded spatial axis.
_SPATIAL_AXES = {"D": 1, "H": 2, "W": 3}


def spatial_sharding(mesh: Mesh, axis: str = "space",
                     spatial: str = "H") -> NamedSharding:
    """NamedSharding that splits an NDHWC activation along one spatial axis
    (default H — AMOS volumes are largest in-plane) over ``axis``."""
    spec = [None, None, None, None, None]
    spec[_SPATIAL_AXES[spatial]] = axis
    return NamedSharding(mesh, P(*spec))


def make_spatial_apply(
    apply_fn: Callable,
    mesh: Mesh,
    axis: str = "space",
    spatial: str = "H",
    out_sharded: bool = True,
    static_argnums: Sequence[int] = (),
) -> Callable:
    """Wrap ``apply_fn(params, x, *rest) -> y`` so that ``x`` (NDHWC) is
    sharded along ``spatial`` over the mesh axis ``axis`` and everything else
    is replicated; XLA partitions the whole network accordingly.

    out_sharded: keep the output sharded the same way (stays distributed for
    a downstream sharded consumer); False gathers it to every device.
    """
    xs = spatial_sharding(mesh, axis, spatial)
    rep = NamedSharding(mesh, P())
    out = xs if out_sharded else rep

    def wrapped(params, x, *rest):
        # pin the activation sharding; params/rest replicate (GSPMD default
        # for unannotated operands combined with the replicated device_put
        # below). The partitioner propagates xs through every conv/norm/
        # attention op and materializes halos & reductions as collectives.
        params = jax.lax.with_sharding_constraint(params, rep)
        x = jax.lax.with_sharding_constraint(x, xs)
        return apply_fn(params, x, *rest)

    return jax.jit(wrapped, out_shardings=out, static_argnums=static_argnums)


def put_spatial(x, mesh: Mesh, axis: str = "space", spatial: str = "H"):
    """Commit a host/device NDHWC array to the spatially-sharded layout."""
    return jax.device_put(x, spatial_sharding(mesh, axis, spatial))


def make_spatial_train_step(model, refiner, disc, cfg, mesh: Mesh,
                            axis: str = "space", spatial: str = "H"):
    """The FULL fused train step (train/step.py) with its activations
    spatially sharded over ``axis`` — volumetric model parallelism for
    B=1 patches too large for one chip's HBM (e.g. the BASELINE config-5
    128^3+ regime at f32, or >192^2 in-plane patches).

    Beyond reference parity: the reference's only parallelism is DP
    (SURVEY §2), which cannot help when a SINGLE patch exceeds device
    memory. Here the batch's spatial axis is sharded and the state
    replicated; XLA's SPMD partitioner threads the sharding through both
    forwards, all three losses, both backwards and the token EMA,
    inserting conv halo exchanges and cross-slab reductions itself. The
    result is numerically the single-device step (up to reduction
    ordering — pinned by tests/test_parallel.py::TestSpatialTrainStep).
    """
    from multimodal_pl_tpu.train.step import build_step_body

    body = build_step_body(model, refiner, disc, cfg, axis_name=None)
    rep = NamedSharding(mesh, P())
    idx = _SPATIAL_AXES[spatial]
    spec5 = [None] * 5
    spec5[idx] = axis                      # (B, D, H, W, 1) image
    spec4 = [None] * 4
    spec4[idx] = axis                      # (B, D, H, W) label / (13, D, H, W) catlas
    img_s = NamedSharding(mesh, P(*spec5))
    vol_s = NamedSharding(mesh, P(*spec4))

    def step(state, batch, lr, weight_feature):
        state = jax.lax.with_sharding_constraint(state, rep)
        batch = dict(
            batch,
            image=jax.lax.with_sharding_constraint(batch["image"], img_s),
            label=jax.lax.with_sharding_constraint(batch["label"], vol_s),
            catlas=jax.lax.with_sharding_constraint(batch["catlas"], vol_s),
        )
        return body(state, batch, lr, weight_feature)

    return jax.jit(step, donate_argnums=(0,))
