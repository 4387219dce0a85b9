"""Worker for the two-process SPMD smoke test (run via test_multiprocess.py).

Each process owns 4 virtual CPU devices; `jax.distributed.initialize` joins
them into one 8-device global mesh, and the UNCHANGED trainer path
(SinNeRFTrainer -> sample -> shard_batch -> train_step) runs one composed
step across both processes — cross-process gradient psum via gloo.  Both
processes must end with identical replicated params (printed as a checksum
the parent test compares).

The platform is forced to CPU *before* jax.distributed/backends initialize —
same pattern as dryrun_multichip (the axon TPU plugin ignores the
JAX_PLATFORMS env var, and two processes must never share the TPU tunnel).
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    tmp = sys.argv[4]

    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nproc, process_id=pid
    )

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo_root)

    import jax.numpy as jnp
    import numpy as np

    from sinnerf_tpu.data.synthetic import make_blender_scene
    from sinnerf_tpu.parallel.mesh import shard_batch
    from sinnerf_tpu.train.loop import SinNeRFTrainer
    from sinnerf_tpu.train.step import train_step
    from tests.test_train import _hparams

    assert len(jax.local_devices()) == 4 and len(jax.devices()) == 8, (
        f"expected 4 local / 8 global devices, got "
        f"{len(jax.local_devices())}/{len(jax.devices())}"
    )

    # deterministic synthetic scene: every process builds an identical copy
    # in its own directory (no cross-process file races), and the shared
    # sample key makes each host materialize the same global batch
    scene = make_blender_scene(os.path.join(tmp, f"scene_{pid}"), (64, 64))
    hp = _hparams(
        scene, os.path.join(tmp, f"proc_{pid}"),
        num_gpus=8, batch_size=8, exp_name=f"mp_{pid}",
    )
    trainer = SinNeRFTrainer(hp)
    assert trainer.mesh is not None and trainer.mesh.devices.size == 8

    key = jax.random.key(0)
    key, kb, ks = jax.random.split(key, 3)
    batch = trainer.train_dataset.sample(kb, step=0, batch_size=8)
    batch = shard_batch(batch, trainer.mesh)
    state, out = train_step(
        trainer.state, batch, ks, jnp.asarray(0.0),
        trainer.cfg, trainer.opt_g, trainer.opt_d,
    )

    # replicated outputs span non-addressable devices: read the local shard
    loss = float(np.asarray(out["metrics"]["train/loss"].addressable_data(0)))
    assert np.isfinite(loss), f"loss not finite: {loss}"
    w = state.params["coarse"]["sigma"]["w"]
    assert w.sharding.is_fully_replicated
    checksum = float(np.abs(np.asarray(w.addressable_data(0))).sum())
    print(f"MPSMOKE pid={pid} loss={loss:.6f} checksum={checksum:.6f}",
          flush=True)

    jax.distributed.shutdown()
    print(f"MPSMOKE pid={pid} DONE", flush=True)


if __name__ == "__main__":
    main()
