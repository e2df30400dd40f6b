"""Persistent XLA compilation cache shared by the CLIs.

The full fused train step takes minutes to compile on this class of host;
long campaigns run as checkpoint/resume chunks (train/loop.py stop_epoch), so
every chunk restart would otherwise pay the full compile again. One on-disk
cache keyed by XLA makes restarts near-instant. bench.py, __graft_entry__.py
and tests/conftest.py point at the same directory.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Point JAX at the repo-local persistent compilation cache (no-op on
    jax builds without the feature)."""
    import jax

    cache = cache_dir or os.environ.get("MPL_COMPILE_CACHE", _DEFAULT)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
