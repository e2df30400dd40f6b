"""Checkpoint / resume for the full TrainState pytree.

The reference saves {model, optimizer, refiner, dis} dicts every 50-epoch
best and at the end (train_amos_atlas_final.py:442-473) but silently LOSES
the EMA class tokens (they are not nn.Parameters — SURVEY.md §5). Here the
whole TrainState — params, momentum, discriminator, tokens, counters — is one
pytree serialized with orbax, so resume is bit-exact.
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from multimodal_pl_tpu.train.state import TrainState


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int) -> str:
    path = os.path.abspath(os.path.join(ckpt_dir, f"ckpt_{step}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(path: str, target: TrainState) -> TrainState:
    """target: an abstract/concrete TrainState with the right structure."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [d for d in os.listdir(ckpt_dir) if d.startswith("ckpt_")]
    if not cands:
        return None
    best = max(cands, key=lambda d: int(d.split("_")[1]))
    return os.path.join(ckpt_dir, best)
