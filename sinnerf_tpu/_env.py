"""Single source of truth for TPU process-env defaults.

The default 16MB scoped-VMEM compiler budget blocks the train backward
kernel's best tile (R_TRAIN_BWD=1024 needs ~21MB of a v5e's 128MB VMEM;
measured: 123.5 -> 121.2ms per train fwd+bwd).  This is a libtpu flag —
host XLA_FLAGS rejects it — and must be in the env BEFORE the TPU plugin
initializes, which is why it is applied at ``sinnerf_tpu`` package import
AND by ``utils.cache.configure_tpu_env`` (both delegate here; keeping one
copy means a future limit bump cannot silently drift between them).

Deliberately imports nothing but ``os`` so the package ``__init__`` can run
it before anything else the package pulls in.
"""

import os

SCOPED_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib=32768"


def configure_tpu_env() -> None:
    """Append our libtpu defaults unless the user already set that flag."""
    current = os.environ.get("LIBTPU_INIT_ARGS", "")
    if "xla_tpu_scoped_vmem_limit_kib" not in current:
        os.environ["LIBTPU_INIT_ARGS"] = f"{current} {SCOPED_VMEM_FLAG}".strip()
