"""SPMD data parallelism over a TPU mesh.

Replaces the reference's pytorch-lightning DDP/NCCL backend (``train.py:51-52``;
SURVEY.md §2 item 26): the reference's only parallelism is data parallelism —
each rank runs the identical single-image dataset with different RNG and DDP
all-reduces gradients.

TPU-native design: a 1-D ``Mesh(('data',))`` over ICI.  The training batch's
leading axis is sharded with ``NamedSharding(P('data'))`` and params/optimizer
state are replicated; because every loss term is a mean over the batch-sharded
axis, GSPMD inserts the gradient ``psum`` automatically inside the one jitted
train step — there is no separate communication code to maintain.  For
rendering, ``shard_rays`` shards the ray axis instead (rays are embarrassingly
parallel, SURVEY.md §5 long-context note).

Multi-process topology (one process per host): the same code runs unchanged
under ``jax.distributed.initialize`` — ``jax.devices()`` is the GLOBAL device
list, every process executes the identical program (scene + sample key are
deterministic, so each host materializes the same global batch), and
``jax.device_put`` with a mesh-spanning NamedSharding keeps only the local
shards.  Exercised for real by ``tests/test_multiprocess.py`` (two processes
x 4 virtual CPU devices, gradient psum over gloo, bit-identical replicated
params on both).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x,
        tree,
    )


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "data") -> Dict[str, Any]:
    """Shard every batch leaf along its leading (batch) axis.

    Requires batch_size % mesh size == 0 (mirror of DDP's per-rank split).
    """
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def shard_rays(rays: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Shard a (N_rays, 8) bundle over the mesh for distributed rendering.
    Pads N_rays to a mesh multiple (callers slice outputs back)."""
    import jax.numpy as jnp

    n = rays.shape[0]
    size = mesh.devices.size
    pad = (-n) % size
    if pad:
        rays = jnp.pad(rays, ((0, pad), (0, 0)), constant_values=1.0)
    return jax.device_put(rays, NamedSharding(mesh, P(axis, None))), n


def maybe_initialize_distributed() -> bool:
    """Env-gated multi-process initialization for the CLIs.

    The reference reaches its multi-GPU topology through
    ``Trainer(distributed_backend='ddp')`` (train.py:51-52); the equivalent
    here is one ``jax.distributed`` process per host.  ``train.py`` calls
    this before any backend initializes; it is a no-op unless
    ``SINNERF_COORDINATOR`` is set:

    * ``SINNERF_COORDINATOR``  — coordinator address, e.g. ``host0:9876``
    * ``SINNERF_NUM_PROCESSES`` — total process count
    * ``SINNERF_PROCESS_ID``    — this process's rank
    * ``SINNERF_PLATFORM``      — optional platform override (e.g. ``cpu``
      for the two-process smoke test: the axon TPU plugin ignores the
      ``JAX_PLATFORMS`` env var, so CPU topologies must force the platform
      via ``jax.config`` before ``jax.distributed`` brings up a backend)
    * ``SINNERF_SHUTDOWN_TIMEOUT`` — optional shutdown-barrier timeout in
      seconds (default jax's 300).  Ranks diverge at end-of-run: rank 0
      still compiles + renders validation and writes checkpoints while
      other ranks already wait at the coordination-service shutdown
      barrier, so heavily contended hosts (the CPU test suite alongside a
      TPU job) need more than 300 s — the two-process CLI smoke sets 2400
      to match its subprocess timeout.

    Rank 0 of the trainer owns tensorboard + checkpoints; per-batch image
    grids are skipped in multi-process runs (their payloads are shards of
    globally-sharded arrays).  Returns True when distributed mode came up.
    """
    import os

    coord = os.environ.get("SINNERF_COORDINATOR")
    if not coord:
        return False
    missing = [
        v for v in ("SINNERF_NUM_PROCESSES", "SINNERF_PROCESS_ID")
        if v not in os.environ
    ]
    if missing:
        raise RuntimeError(
            f"SINNERF_COORDINATOR={coord} is set but {', '.join(missing)} "
            "is not — a multi-process launch needs all three of "
            "SINNERF_COORDINATOR, SINNERF_NUM_PROCESSES, SINNERF_PROCESS_ID"
        )
    platform = os.environ.get("SINNERF_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    jax.distributed.initialize(
        coord,
        num_processes=int(os.environ["SINNERF_NUM_PROCESSES"]),
        process_id=int(os.environ["SINNERF_PROCESS_ID"]),
        shutdown_timeout_seconds=int(
            os.environ.get("SINNERF_SHUTDOWN_TIMEOUT", "300")
        ),
    )
    return True
