"""Multi-process SPMD smoke: two jax.distributed processes, 4 virtual CPU
devices each, one composed train_step over the joint 8-device mesh.

SURVEY.md §4 suggests multi-host CPU-mesh tests; the reference itself maxes
out at 4 GPUs on one host (DDP), but this framework claims a data-parallel
mesh, so the >1-process topology is exercised once for real: the trainer's
unchanged sample -> shard_batch -> train_step path with the gradient psum
riding gloo across processes.  Both processes must produce identical
replicated params.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch_two_with_retry(make_proc, timeout, attempts=3):
    """Run two ranks to completion; retry the coordinator-port TOCTOU race.

    ``make_proc(pid, port) -> (argv, env, cwd)``.  _free_port closes its
    probe socket before the coordinator binds the port (jax.distributed in
    rank 0, seconds later) — a TOCTOU window on shared machines.  Retry with
    a fresh port if the bind itself lost the race; any other failure is a
    real test failure and is returned to the caller's asserts.
    """
    for attempt in range(attempts):
        port = _free_port()
        procs = []
        for pid in range(2):
            argv, env, cwd = make_proc(pid, port)
            procs.append(subprocess.Popen(
                argv, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env, cwd=cwd,
            ))
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append(out)
        bind_lost = any(
            p.returncode != 0
            and ("address already in use" in out.lower()
                 or "failed to bind" in out.lower())
            for p, out in zip(procs, outs)
        )
        if not bind_lost:
            break
    return procs, outs


def test_two_process_mesh_train_step(tmp_path):
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo_root, "tests", "multiprocess_worker.py")

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # the worker forces CPU via jax.config before backend init; drop any
    # inherited platform hints so nothing initializes the axon TPU plugin
    env.pop("JAX_PLATFORMS", None)

    def make_proc(pid, port):
        argv = [sys.executable, worker, str(pid), "2", str(port),
                str(tmp_path)]
        return argv, env, repo_root

    procs, outs = _launch_two_with_retry(make_proc, timeout=840)

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"MPSMOKE pid={pid} DONE" in out, f"worker {pid}:\n{out[-4000:]}"

    def parse(out, pid):
        for line in out.splitlines():
            if line.startswith(f"MPSMOKE pid={pid} loss="):
                parts = dict(kv.split("=") for kv in line.split()[1:])
                return float(parts["loss"]), float(parts["checksum"])
        raise AssertionError(f"no MPSMOKE line from worker {pid}:\n{out[-2000:]}")

    loss0, ck0 = parse(outs[0], 0)
    loss1, ck1 = parse(outs[1], 1)
    # one global step: both processes saw the same loss and, after the
    # all-reduced update, bit-identical replicated params
    assert loss0 == pytest.approx(loss1, rel=1e-6)
    assert ck0 == pytest.approx(ck1, rel=1e-7), (
        f"replicated params diverged across processes: {ck0} vs {ck1}"
    )


def test_two_process_cli_train(tmp_path):
    """The REAL CLI path: two `python train.py` processes joined via the
    env-gated jax.distributed.initialize in train.py (SINNERF_COORDINATOR /
    SINNERF_NUM_PROCESSES / SINNERF_PROCESS_ID / SINNERF_PLATFORM=cpu —
    parallel/mesh.py:maybe_initialize_distributed).  Rank 0 owns the shared
    ckpt/log dirs; both ranks must finish a 1-epoch run with the same
    best val/psnr."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    import jax

    jax.config.update("jax_platforms", "cpu")
    from sinnerf_tpu.data.synthetic import make_blender_scene

    scene = make_blender_scene(str(tmp_path / "scene"), (64, 64))
    args = [
        sys.executable, "train.py",
        "--dataset_name", "blender_ray_patch_1image_rot3d",
        "--root_dir", scene, "--img_wh", "64", "64",
        "--N_samples", "4", "--N_importance", "4",
        "--num_epochs", "1", "--batch_size", "8", "--num_gpus", "8",
        "--exp_name", "mpcli", "--with_ref", "--patch_size", "16",
        "--sW", "2", "--sH", "2", "--load_depth", "--model", "sinnerf",
        "--depth_weight", "8", "--num_rays", "32", "--ref_idx", "0",
        "--ckpt_dir", str(tmp_path / "ck"), "--log_dir", str(tmp_path / "lg"),
        "--mlp_impl", "xla", "--compute_dtype", "float32",
        "--check_val_every_n_epoch", "1",
    ]

    base_env = dict(os.environ)
    base_env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    base_env.pop("JAX_PLATFORMS", None)
    base_env["SINNERF_PLATFORM"] = "cpu"
    base_env["SINNERF_NUM_PROCESSES"] = "2"
    # End-of-run divergence: rank 0 compiles + renders validation and writes
    # checkpoints while rank 1 already waits at the coordination-service
    # shutdown barrier.  Under 3-way contention (this suite + a TPU soak's
    # dispatch loop on one core) that tail exceeds jax's default 300 s
    # barrier timeout (round-5 suite runs 1-2); raise it well past the
    # subprocess timeout so the barrier never fires first.
    base_env["SINNERF_SHUTDOWN_TIMEOUT"] = "2400"

    def make_proc(pid, port):
        env = dict(base_env)
        env["SINNERF_COORDINATOR"] = f"localhost:{port}"
        env["SINNERF_PROCESS_ID"] = str(pid)
        return args, env, repo_root

    # two concurrent XLA CPU train-step compiles on this single-core box can
    # each run at ~50% when a TPU soak's dispatch loop is also live; 840s
    # timed out under that 3-way contention (round-5 suite run 1) while the
    # test passes in ~4 min uncontended.
    procs, outs = _launch_two_with_retry(make_proc, timeout=2400)

    best = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"CLI worker {pid} failed:\n{out[-4000:]}"
        lines = [l for l in out.splitlines() if l.startswith("best val/psnr:")]
        assert lines, f"no best-psnr line from CLI worker {pid}:\n{out[-2000:]}"
        best.append(float(lines[-1].split(":")[1]))
    assert best[0] == pytest.approx(best[1], rel=1e-6)
    # rank-0-only checkpointing into the SHARED dir: 'last' + the epoch dir
    ckdir = tmp_path / "ck" / "mpcli"
    assert (ckdir / "last").is_dir()
