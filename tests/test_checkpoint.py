"""Checkpoint save/restore roundtrip of the TrainState pytree (incl. tokens)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_pl_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from multimodal_pl_tpu.train.state import TrainState


def _small_state(seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 6)
    params = {"params": {"w": jax.random.normal(ks[0], (4, 4)), "b": jnp.zeros(4)}}
    rparams = {"params": {"w": jax.random.normal(ks[1], (3, 3))}}
    dparams = {"params": {"w": jax.random.normal(ks[2], (2, 2))}}
    tokens = {"t1": jax.random.normal(ks[3], (13, 8)), "t2": jax.random.normal(ks[4], (13, 4))}
    momentum = jax.tree_util.tree_map(jnp.zeros_like, (params, rparams))
    return TrainState(params=params, rparams=rparams, dparams=dparams,
                      momentum=momentum, tokens=tokens,
                      step=jnp.asarray(7, jnp.int32), epoch=jnp.asarray(3, jnp.int32))


def test_roundtrip(tmp_path):
    state = _small_state()
    path = save_checkpoint(str(tmp_path), state, int(state.step))
    restored = restore_checkpoint(path, _small_state(seed=99))
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 7
    # tokens made the trip (the reference's checkpoints silently dropped them)
    np.testing.assert_array_equal(np.asarray(restored.tokens["t1"]),
                                  np.asarray(state.tokens["t1"]))


def test_latest_checkpoint(tmp_path):
    assert latest_checkpoint(str(tmp_path)) is None
    s = _small_state()
    save_checkpoint(str(tmp_path), s, 5)
    save_checkpoint(str(tmp_path), s, 50)
    save_checkpoint(str(tmp_path), s, 9)
    assert latest_checkpoint(str(tmp_path)).endswith("ckpt_50")
