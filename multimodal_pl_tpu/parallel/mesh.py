"""Mesh construction and batch sharding helpers."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(spec: str = "data:8", devices: Optional[Sequence] = None) -> Mesh:
    """'data:8' or 'data:4,space:2' -> jax.sharding.Mesh.

    Axis sizes must multiply to the device count used; devices default to
    jax.devices() truncated to the product.
    """
    axes = []
    sizes = []
    for part in spec.split(","):
        name, size = part.split(":")
        axes.append(name.strip())
        sizes.append(int(size))
    n = int(np.prod(sizes))
    devs = list(devices) if devices is not None else jax.devices()
    if len(devs) < n:
        raise ValueError(f"mesh {spec} needs {n} devices, have {len(devs)}")
    arr = np.asarray(devs[:n]).reshape(sizes)
    return Mesh(arr, tuple(axes))


def shard_batch(per_device_batches: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack per-device batch dicts into the global-batch layout the sharded
    step expects: sample tensors concatenated on the batch axis, per-batch
    scalars/vectors stacked on a new leading device axis."""
    out: Dict[str, np.ndarray] = {}
    cat_keys = ("image", "label")
    stack_keys = ("catlas", "sup_mask", "label_t")
    for k in cat_keys:
        out[k] = np.concatenate([b[k] for b in per_device_batches], axis=0)
    for k in stack_keys:
        out[k] = np.stack([b[k] for b in per_device_batches], axis=0)
    return out
