"""Persistent XLA/Mosaic compilation cache.

Compiles through the axon TPU tunnel cost minutes (a trivial op ~40s, the
fused Pallas kernel ~8.5min); caching them on disk makes repeat runs start in
seconds.  Called by every CLI entry point (train/eval/bench)."""

from __future__ import annotations

import os


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    import jax

    if cache_dir is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        cache_dir = os.path.join(repo_root, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
