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
        # SINNERF_JAX_CACHE_DIR reroutes ("off" disables) every entry point's
        # cache in one place.  tests/conftest.py sets "off": the cache exists
        # for the axon tunnel's minutes-long remote compiles, and on CPU it is
        # actively dangerous — reading back a persisted CPU executable can
        # kill the interpreter inside compilation_cache.get_executable_and_time
        # (backend.deserialize_executable aborts; observed twice, as SIGSEGV
        # and SIGABRT, both at tests/test_train.py resume tests once a
        # contended >1s CPU compile got cached and re-read).  CPU compiles are
        # fast; caching them buys nothing.
        cache_dir = os.environ.get("SINNERF_JAX_CACHE_DIR")
        if cache_dir is not None and cache_dir.lower() in ("", "0", "off", "none"):
            return ""
    if cache_dir is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        cache_dir = os.path.join(repo_root, ".jax_cache")
    # Multi-process launches (SINNERF_COORDINATOR topology): two live
    # processes sharing one cache dir is a read/write race, and a corrupt
    # CPU entry read back via backend.deserialize_executable can abort the
    # interpreter.  Ranks pay duplicate compiles into per-rank subdirs
    # instead.  Env-based (not jax.process_index()) so no backend
    # initializes before configure_tpu_env's LIBTPU_INIT_ARGS are set.
    rank = os.environ.get("SINNERF_PROCESS_ID")
    if rank is not None and os.environ.get("SINNERF_COORDINATOR"):
        cache_dir = os.path.join(cache_dir, f"rank{rank}")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
