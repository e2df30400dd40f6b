"""Mesh / sharding mechanics on the virtual 8-device CPU mesh.

The full multi-device train step is exercised by the driver's
dryrun_multichip (see __graft_entry__.py); these tests cover the pieces it
composes: mesh construction, batch sharding layout, psum'd token EMA, and
pmean'd gradient semantics under shard_map.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from multimodal_pl_tpu.models.tokens import renew_tokens
from multimodal_pl_tpu.parallel.mesh import make_mesh, shard_batch

from tests.conftest import cpu_devices


def test_make_mesh_shapes():
    mesh = make_mesh("data:8", cpu_devices())
    assert mesh.axis_names == ("data",)
    assert mesh.devices.shape == (8,)
    mesh2 = make_mesh("data:4,space:2", cpu_devices())
    assert mesh2.axis_names == ("data", "space")
    assert mesh2.devices.shape == (4, 2)


def test_make_mesh_too_few_devices():
    with pytest.raises(ValueError, match="needs 16 devices"):
        make_mesh("data:16", cpu_devices())


def test_shard_batch_layout(rng):
    per_dev = [
        {
            "image": rng.standard_normal((2, 4, 4, 4, 1)).astype(np.float32),
            "label": rng.integers(0, 3, (2, 4, 4, 4)),
            "catlas": rng.random((13, 4, 4, 4)).astype(np.float32),
            "sup_mask": np.ones(14, np.float32),
            "label_t": np.zeros(13, np.float32),
        }
        for _ in range(4)
    ]
    gb = shard_batch(per_dev)
    assert gb["image"].shape == (8, 4, 4, 4, 1)
    assert gb["catlas"].shape == (4, 13, 4, 4, 4)
    assert gb["sup_mask"].shape == (4, 14)
    np.testing.assert_array_equal(gb["image"][2:4], per_dev[1]["image"])


def test_renew_tokens_psum_across_devices(rng):
    """Token EMA under shard_map must equal the single-device EMA on the
    concatenated batch (global masked means)."""
    mesh = make_mesh("data:4", cpu_devices())
    tokens = {"t1": jnp.asarray(rng.standard_normal((13, 8)).astype(np.float32))}
    feats = jnp.asarray(rng.standard_normal((4, 2, 2, 2, 8)).astype(np.float32))
    fmask = jnp.asarray(rng.integers(0, 4, (4, 4, 4, 4)).astype(np.int32))

    def shard_fn(tokens, feats, fmask):
        return renew_tokens(tokens, [feats], fmask, alpha=0.5, axis_name="data")

    sharded = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=P(),
        check_rep=False,
    )
    got = jax.jit(sharded)(tokens, feats, fmask)
    want = renew_tokens(tokens, [feats], fmask, alpha=0.5)  # global single-device
    np.testing.assert_allclose(np.asarray(got["t1"]), np.asarray(want["t1"]),
                               rtol=1e-5, atol=1e-6)


def test_pmean_grads_match_global_mean(rng):
    """pmean'd per-shard gradients == gradient of the global-batch mean loss."""
    mesh = make_mesh("data:8", cpu_devices())
    w = jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32))

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    def shard_grads(w, x):
        g = jax.grad(loss)(w, x)
        return jax.lax.pmean(g, "data")

    sharded = shard_map(shard_grads, mesh=mesh, in_specs=(P(), P("data")),
                        out_specs=P(), check_rep=False)
    got = jax.jit(sharded)(w, x)
    want = jax.grad(loss)(w, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_sharded_sliding_matches_single_device(rng):
    """Window-sharded inference over a 4-device mesh must equal the
    single-device scan (and the naive loop) exactly."""
    from multimodal_pl_tpu.infer.sliding import SlidingWindowPredictor
    from multimodal_pl_tpu.parallel.sharded_infer import ShardedSlidingWindowPredictor

    def toy_apply(tiles):
        return jnp.concatenate([tiles + float(c) for c in range(3)], axis=-1)

    vol = rng.standard_normal((24, 40, 40)).astype(np.float32)
    tile = (16, 24, 24)
    mesh = make_mesh("data:4", cpu_devices())
    sharded = ShardedSlidingWindowPredictor(toy_apply, tile, 3, mesh,
                                            window_batch=2, bucket=(8, 8, 8))
    single = SlidingWindowPredictor(toy_apply, tile, 3, window_batch=2, bucket=(8, 8, 8))
    np.testing.assert_allclose(np.asarray(sharded(vol)), np.asarray(single(vol)),
                               rtol=1e-4, atol=1e-5)


def test_sliding_params_as_dynamic_args(rng):
    """Weights passed as extra args must not change results vs closure form."""
    from multimodal_pl_tpu.infer.sliding import SlidingWindowPredictor

    w = jnp.asarray(rng.standard_normal((1, 3)).astype(np.float32))

    def apply_with_params(tiles, w):
        return tiles * w[0, 0] + jnp.concatenate([tiles * w[0, c] for c in range(3)], -1) * 0 \
            + jnp.concatenate([tiles + w[0, c] for c in range(3)], -1)

    def apply_closure(tiles):
        return apply_with_params(tiles, w)

    vol = rng.standard_normal((16, 24, 24)).astype(np.float32)
    tile = (16, 24, 24)
    a = SlidingWindowPredictor(apply_with_params, tile, 3)(vol, w)
    b = SlidingWindowPredictor(apply_closure, tile, 3)(vol)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
