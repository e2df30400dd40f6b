"""Multi-chip sliding-window inference: windows sharded over the data mesh.

The volume is replicated (a full AMOS volume is ~16-64MB — cheap next to the
window forwards); each device gathers and forwards its own subset of windows,
accumulates its partial Gaussian-weighted sums locally, and a single psum
pair over the ICI merges the (probs, count) accumulators before
normalization. Duplicate pad windows are exact no-ops (count normalization),
so any window count shards cleanly onto any mesh size.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from multimodal_pl_tpu.infer.gaussian import gaussian_importance_map
from multimodal_pl_tpu.infer.sliding import make_window_grid, pad_to_bucket


class ShardedSlidingWindowPredictor:
    """Like infer.sliding.SlidingWindowPredictor, but windows are processed
    data-parallel over a mesh. apply_fn: (tiles, *extra) -> logits."""

    def __init__(self, apply_fn: Callable, tile: Sequence[int], num_classes: int,
                 mesh: Mesh, axis: str = "data", window_batch: int = 2,
                 bucket: Sequence[int] = (32, 64, 64), overlap: float = 0.25,
                 dtype=jnp.float32, compute_dtype=None):
        self.apply_fn = apply_fn
        self.tile = tuple(tile)
        self.num_classes = num_classes
        self.mesh = mesh
        self.axis = axis
        self.n_dev = mesh.devices.size
        self.window_batch = window_batch
        self.bucket = tuple(bucket)
        self.overlap = overlap
        self.dtype = dtype
        self.compute_dtype = compute_dtype or dtype
        self.gaussian = jnp.asarray(gaussian_importance_map(self.tile))[..., None]
        self._jitted = {}

    def _build(self, padded_shape, batches_per_dev, n_extra):
        tile = self.tile
        nc = self.num_classes
        wb = self.window_batch
        gauss = self.gaussian.astype(self.dtype)

        def gather(vol, start):
            return jax.lax.dynamic_slice(vol, (start[0], start[1], start[2], 0),
                                         (*tile, vol.shape[-1]))

        def device_run(vol, starts, *extra):
            # vol replicated (D, H, W, 1); starts local (1, bpd, wb, 3)
            starts = starts[0]
            full = jnp.zeros((*padded_shape, nc), self.dtype)
            count = jnp.zeros((*padded_shape, 1), self.dtype)
            net = (lambda t: self.apply_fn(t, *extra)) if extra else self.apply_fn

            def body(carry, batch_starts):
                full, count = carry
                tiles = jax.vmap(lambda s: gather(vol, s))(batch_starts)
                logits = net(tiles.astype(self.compute_dtype)).astype(self.dtype) * gauss

                def scatter(i, carry):
                    full, count = carry
                    s = batch_starts[i]
                    idx = (s[0], s[1], s[2], 0)
                    cur = jax.lax.dynamic_slice(full, idx, (*tile, nc))
                    full = jax.lax.dynamic_update_slice(full, cur + logits[i], idx)
                    curc = jax.lax.dynamic_slice(count, idx, (*tile, 1))
                    count = jax.lax.dynamic_update_slice(count, curc + gauss, idx)
                    return full, count

                full, count = jax.lax.fori_loop(0, wb, scatter, (full, count))
                return (full, count), None

            (full, count), _ = jax.lax.scan(body, (full, count), starts)
            full = jax.lax.psum(full, self.axis)
            count = jax.lax.psum(count, self.axis)
            return full / count

        sharded = shard_map(
            device_run,
            mesh=self.mesh,
            in_specs=(P(), P(self.axis)) + (P(),) * n_extra,
            out_specs=P(),
            check_vma=False,
        )
        return jax.jit(sharded)

    def __call__(self, image: np.ndarray, *extra) -> jax.Array:
        img = np.asarray(image)
        if img.ndim == 3:
            img = img[..., None]
        orig = img.shape[:3]
        padded = pad_to_bucket(orig, self.bucket, self.tile)
        img = np.pad(img, [(0, p - s) for s, p in zip(orig, padded)] + [(0, 0)])

        starts = make_window_grid(padded, self.tile, self.overlap)
        per_step = self.window_batch * self.n_dev
        n = len(starts)
        n_steps = int(np.ceil(n / per_step))
        total = n_steps * per_step
        if total > n:
            starts = np.concatenate([starts, np.repeat(starts[-1:], total - n, 0)])
        # (n_dev, batches_per_dev, wb, 3): window i goes to device i % n_dev
        starts = starts.reshape(n_steps, self.n_dev, self.window_batch, 3)
        starts = np.swapaxes(starts, 0, 1)

        key = (padded, n_steps, len(extra))
        if key not in self._jitted:
            self._jitted[key] = self._build(padded, n_steps, len(extra))
        out = self._jitted[key](jnp.asarray(img, self.dtype), jnp.asarray(starts), *extra)
        return out[: orig[0], : orig[1], : orig[2]]

    def predict_iter(self, images, *extra):
        """Per-volume iteration (API-compatible with
        SlidingWindowPredictor.predict_iter). Dispatch is async, so the next
        volume's host prep overlaps the current device compute."""
        for img in images:
            yield self(img, *extra)
