"""Persistent XLA/Mosaic compilation cache + TPU env defaults.

Compiles through the axon TPU tunnel cost minutes (a trivial op ~40s, the
fused Pallas kernel ~8.5min); caching them on disk makes repeat runs start in
seconds.  Called by every CLI entry point (train/eval/bench)."""

from __future__ import annotations

import os

# Re-exported from the single source of truth (sinnerf_tpu._env): the raised
# scoped-VMEM limit must be set before the TPU plugin initializes, and every
# CLI entry point calls configure_tpu_env via enable_persistent_cache.
from sinnerf_tpu._env import SCOPED_VMEM_FLAG as _SCOPED_VMEM_FLAG  # noqa: F401
from sinnerf_tpu._env import configure_tpu_env


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    configure_tpu_env()
    import jax

    if cache_dir is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        cache_dir = os.path.join(repo_root, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
