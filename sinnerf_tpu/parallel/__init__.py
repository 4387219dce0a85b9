from sinnerf_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_rays,
)

__all__ = ["make_mesh", "replicate", "shard_batch", "shard_rays"]
