"""Engine: runtime context for loaders and device topology.

API-parity shim for the reference's Engine (engine.py:10-77) so reference
users find the same entry points; internally it maps onto the TPU-native
pieces: prefetching dataset iterators, jax device meshes and psum reductions.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp


def extant_file(x: str) -> str:
    """argparse type checking file existence (reference utils.py:62-70)."""
    if not os.path.exists(x):
        raise argparse.ArgumentTypeError(f"{x} does not exist")
    return x


class Engine:
    """Context manager exposing the reference surface:
    get_train_loader / get_test_loader / data_parallel / all_reduce_tensor.
    """

    def __init__(self, custom_parser: Optional[argparse.ArgumentParser] = None):
        self.parser = custom_parser or argparse.ArgumentParser()
        self.inject_default_parser()
        self.devices = jax.devices()
        self.world_size = len(self.devices)
        self.local_rank = 0
        self.distributed = self.world_size > 1

    def inject_default_parser(self):
        p = self.parser
        p.add_argument("-d", "--devices", default="", help="set data parallel training")
        p.add_argument("-c", "--continue", type=extant_file, metavar="FILE",
                       dest="continue_fpath", help="continue from one certain checkpoint")

    def get_train_loader(self, dataset, batch_size: int = 1, collate_fn=None, epochs: int = 1):
        """Prefetching train iterator (replaces torch DataLoader + sampler)."""
        return dataset.batches(batch_size=batch_size, shuffle=True, augment=True,
                               epochs=epochs), None

    def get_test_loader(self, dataset):
        def it():
            for i in range(len(dataset)):
                yield dataset[i]

        return it(), None

    def data_parallel(self, step_fn_or_model):
        """In the TPU world, data parallelism is a property of the step
        (parallel.make_sharded_train_step), not a model wrapper; returned
        unchanged for API compatibility."""
        return step_fn_or_model

    def all_reduce_tensor(self, tensor, norm: bool = True):
        """Mean across devices — inside jit'd SPMD code this is lax.pmean;
        at the host level values are already averaged, so mean() matches the
        reference's single-process fallback (engine.py:57-58)."""
        return jnp.mean(tensor)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, value, tb):
        if exc_type is not None:
            print("An exception occurred during Engine initialization, "
                  "give up running process")
            return False
