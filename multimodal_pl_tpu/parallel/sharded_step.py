"""Data-parallel train step: shard_map over a 1-D data mesh.

DDP-equivalent semantics (engine.py + NCCL in the original launch): every
device runs the full per-device step on its local batch shard — including its
own sample-0 refiner/GAN machinery, like each DDP rank did — then gradients
are pmean'd over the ICI before the (replicated) SGD update. Class-token EMA
statistics are psum'd so tokens stay bit-identical across devices (the
reference let per-rank tokens drift; see models/tokens.py).

Global batch layout (see parallel.mesh.shard_batch):
  image/label: (n_dev * B, ...) sharded on the batch axis
  catlas:      (n_dev, num_fg, D, H, W) — one per device shard
  sup_mask:    (n_dev, C); label_t: (n_dev, num_fg)
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from multimodal_pl_tpu.train.state import StepConfig
from multimodal_pl_tpu.train.step import build_step_body


def make_sharded_train_step(model, refiner, disc, cfg: StepConfig,
                            mesh: Mesh | str = "data:8",
                            devices: Optional[Sequence] = None,
                            axis: str = "data"):
    """Returns step(state, global_batch, lr, weight_feature) -> (state, metrics).

    state is replicated; the returned state is identical on every device.
    """
    if isinstance(mesh, str):
        from multimodal_pl_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(mesh, devices)

    body = build_step_body(model, refiner, disc, cfg, axis_name=axis)

    def device_step(state, image, label, catlas, sup_mask, label_t, lr, wf):
        batch = {
            "image": image,
            "label": label,
            "catlas": catlas[0],      # (1, num_fg, ...) shard -> per-device
            "sup_mask": sup_mask[0],
            "label_t": label_t[0],
        }
        return body(state, batch, lr, wf)

    sharded = shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, global_batch, lr, weight_feature):
        return sharded(
            state,
            global_batch["image"],
            global_batch["label"],
            global_batch["catlas"],
            global_batch["sup_mask"],
            global_batch["label_t"],
            lr,
            weight_feature,
        )

    return step
