"""Persistent XLA compilation cache.

TPU compiles of the fused batch_solve / train-step graphs run minutes (the
computations themselves run in seconds); a persistent cache makes every run
after the first start instantly.  Called by bench.py and the experiment
drivers; safe to call multiple times.
"""
from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("HIPGP_JAX_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: carry on uncached
