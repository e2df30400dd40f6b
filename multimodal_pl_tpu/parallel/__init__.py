"""SPMD parallelism over jax.sharding meshes.

The reference's parallelism is NCCL data-parallel DDP over 3 GPUs
(run_amos_atlas_final.sh:2, engine.py). The TPU-native equivalent here:
a 1-D ``data`` mesh, shard_map'd train step with pmean'd gradients riding the
ICI, psum-consistent class tokens, and per-host sharded input batching. A
``space`` mesh axis is additionally supported for sharding the H axis of
large volumes at inference (halo-less because windows are gathered whole).
"""

from multimodal_pl_tpu.parallel.mesh import make_mesh, shard_batch
from multimodal_pl_tpu.parallel.sharded_step import make_sharded_train_step
