"""Persistent XLA/Mosaic compilation cache + TPU env defaults.

Compiles through the axon TPU tunnel cost minutes (a trivial op ~40s, the
fused Pallas kernel ~8.5min); caching them on disk makes repeat runs start in
seconds.  Called by every CLI entry point (train/eval/bench)."""

from __future__ import annotations

import os

# The default 16MB scoped-VMEM compiler budget blocks the train backward
# kernel's best tile (R_TRAIN_BWD=1024 needs ~21MB of a v5e's 128MB VMEM;
# measured: 123.5 -> 121.2ms per train fwd+bwd).  This is a libtpu flag —
# host XLA_FLAGS rejects it — and must be in the env BEFORE the TPU plugin
# initializes, which is why it lives next to the cache setup every entry
# point calls first.
_SCOPED_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib=32768"


def configure_tpu_env() -> None:
    """Append our libtpu defaults unless the user already set that flag."""
    current = os.environ.get("LIBTPU_INIT_ARGS", "")
    if "xla_tpu_scoped_vmem_limit_kib" not in current:
        os.environ["LIBTPU_INIT_ARGS"] = f"{current} {_SCOPED_VMEM_FLAG}".strip()


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
