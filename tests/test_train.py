"""End-to-end training-system tests on a synthetic miniature blender scene."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sinnerf_tpu.data.synthetic import make_blender_scene
from sinnerf_tpu.train.loop import SinNeRFTrainer
from sinnerf_tpu.train.optimizers import get_optimizer, lr_for_epoch


def _hparams(root, tmp, **overrides):
    base = dict(
        root_dir=root,
        dataset_name="blender_ray_patch_1image_rot3d",
        img_wh=[64, 64],
        spheric_poses=False,
        N_samples=8,
        N_importance=8,
        use_disp=False,
        perturb=1.0,
        noise_std=1.0,
        batch_size=1,
        chunk=4096,
        num_epochs=2,
        num_gpus=1,
        ckpt_path=None,
        prefixes_to_ignore=["loss"],
        optimizer="adam",
        lr=2e-4,
        momentum=0.9,
        weight_decay=0.0,
        lr_scheduler="steplr",
        warmup_multiplier=1.0,
        warmup_epochs=0,
        decay_step=[500, 1000],
        decay_gamma=0.5,
        poly_exp=0.9,
        exp_name="test",
        with_ref=True,
        patch_size=16,
        patch_size_x=-1,
        patch_size_y=-1,
        pt_model=None,
        model="sinnerf",
        repeat=1,
        nW=32,
        nH=32,
        sW=2,
        sH=2,
        dloss="hinge",
        load_depth=True,
        nerf_only=False,
        depth_type="nerf",
        dis_weight=0.0,
        proj_weight=1.0,
        angle=20,
        scan=4,
        depth_weight=8.0,
        vit_weight=0.0,
        depth_smooth_weight=0.5,
        depth_anneal=False,
        loss_type="mse",
        patch_loss="mse",
        compute_dtype="float32",
        mlp_impl="xla",
        vit_weights=None,
        vgg_weights=None,
        allow_random_pretrained=True,
        check_val_every_n_epoch=1,
        ckpt_dir=os.path.join(tmp, "ckpts"),
        log_dir=os.path.join(tmp, "logs"),
        seed=0,
        num_rays=64,
        ref_idx=0,
    )
    base.update(overrides)
    return argparse.Namespace(**base)


@pytest.fixture(scope="module")
def blender_root(tmp_path_factory):
    return make_blender_scene(str(tmp_path_factory.mktemp("scene")), (64, 64))


def _run_steps(trainer, n=2):
    from sinnerf_tpu.train.step import train_step

    metrics = None
    for i in range(n):
        trainer.key, kb, ks = jax.random.split(trainer.key, 3)
        batch = trainer.train_dataset.sample(kb, step=i, batch_size=1)
        trainer.state, out = train_step(
            trainer.state,
            batch,
            ks,
            jnp.asarray(0.0),
            trainer.cfg,
            trainer.opt_g,
            trainer.opt_d,
        )
        metrics = out["metrics"]
    return metrics


def test_step1_recipe_runs_and_updates_params(blender_root, tmp_path):
    hp = _hparams(blender_root, str(tmp_path))
    trainer = SinNeRFTrainer(hp)
    w0 = np.asarray(trainer.state.params["coarse"]["xyz_encoding_1"]["w"]).copy()
    metrics = _run_steps(trainer, 2)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    w1 = np.asarray(trainer.state.params["coarse"]["xyz_encoding_1"]["w"])
    assert not np.allclose(w0, w1)
    assert int(trainer.state.step) == 2


def test_gan_step2_recipe_updates_discriminator(blender_root, tmp_path):
    hp = _hparams(blender_root, str(tmp_path), dis_weight=0.01)
    trainer = SinNeRFTrainer(hp)
    d0 = np.asarray(trainer.state.d_params["convs"][0]["w"]).copy()
    u0 = np.asarray(trainer.state.sn_state["convs"][0]["u"]).copy()
    metrics = _run_steps(trainer, 2)
    assert np.isfinite(float(metrics["train/loss_d"]))
    d1 = np.asarray(trainer.state.d_params["convs"][0]["w"])
    u1 = np.asarray(trainer.state.sn_state["convs"][0]["u"])
    assert not np.allclose(d0, d1), "discriminator params did not update"
    assert not np.allclose(u0, u1), "spectral norm state did not update"


def test_vit_loss_path_runs(blender_root, tmp_path):
    hp = _hparams(blender_root, str(tmp_path), vit_weight=10.0)
    trainer = SinNeRFTrainer(hp)
    metrics = _run_steps(trainer, 2)
    assert float(metrics["train/loss_vit"]) > 0
    # ref feature got populated from the first step
    assert float(jnp.abs(trainer.state.ref_feature).sum()) > 0


def test_vit_cache_zero_row_does_not_force_refresh(blender_root, tmp_path):
    """The cache-validity flag, not an all-zeros sentinel, decides refresh: a
    legitimately zero CLS row with valid=True must survive a step with the
    refresh coin disabled, while valid=False must force a refresh."""
    import dataclasses

    from sinnerf_tpu.train.step import compute_losses

    hp = _hparams(blender_root, str(tmp_path), vit_weight=10.0)
    trainer = SinNeRFTrainer(hp)
    assert trainer.state.ref_feature_valid is not None
    assert not bool(jnp.any(trainer.state.ref_feature_valid))  # fresh init

    cfg = dataclasses.replace(trainer.cfg, vit_refresh_prob=0.0)
    trainer.key, kb, ks = jax.random.split(trainer.key, 3)
    batch = trainer.train_dataset.sample(kb, step=0, batch_size=1)

    def run(valid):
        _, aux = compute_losses(
            trainer.state.params, None, None, trainer.state.vit_params,
            jnp.zeros((1, 384)), batch, ks, jnp.asarray(0.0), cfg,
            ref_feature_valid=jnp.asarray([valid]),
        )
        return aux

    aux_valid = run(True)  # zero row + valid: no refresh, row stays zero
    assert float(jnp.abs(aux_valid["ref_feature"]).sum()) == 0.0
    assert bool(aux_valid["ref_feature_valid"][0])

    aux_invalid = run(False)  # invalid: refresh fires despite coin p=0
    assert float(jnp.abs(aux_invalid["ref_feature"]).sum()) > 0.0
    assert bool(aux_invalid["ref_feature_valid"][0])

    # the trainer's first real step flips the flag on
    _run_steps(trainer, 1)
    assert bool(jnp.all(trainer.state.ref_feature_valid))


def test_wgan_gp_flavor_runs(blender_root, tmp_path):
    hp = _hparams(blender_root, str(tmp_path), dis_weight=0.01, dloss="wgan_gp")
    trainer = SinNeRFTrainer(hp)
    metrics = _run_steps(trainer, 1)
    assert np.isfinite(float(metrics["train/loss_d"]))


def test_relavistic_flavor_runs(blender_root, tmp_path):
    """The relativistic G term runs its own D(DiffAugment(real)) forward
    (sinnerf.py:454) — exercise that extra augmented forward end to end."""
    hp = _hparams(
        blender_root, str(tmp_path), dis_weight=0.01, dloss="relavistic"
    )
    trainer = SinNeRFTrainer(hp)
    metrics = _run_steps(trainer, 1)
    assert np.isfinite(float(metrics["train/loss_d"]))
    assert np.isfinite(float(metrics["train/loss"]))


def test_short_training_reduces_loss(blender_root, tmp_path):
    hp = _hparams(blender_root, str(tmp_path), lr=5e-3)
    trainer = SinNeRFTrainer(hp)
    first = float(_run_steps(trainer, 1)["train/loss"])
    last = float(_run_steps(trainer, 25)["train/loss"])
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_validate_and_checkpoint(blender_root, tmp_path):
    hp = _hparams(blender_root, str(tmp_path))
    trainer = SinNeRFTrainer(hp)
    _run_steps(trainer, 1)
    val_psnr = trainer.validate(0, max_batches=1, log=False)
    assert np.isfinite(val_psnr) and val_psnr > 0
    trainer._save(0, val_psnr)
    ckpt = os.path.join(hp.ckpt_dir, "test", "last")
    assert os.path.isdir(ckpt)
    # resume round-trip
    hp2 = _hparams(blender_root, str(tmp_path), ckpt_path=ckpt)
    trainer2 = SinNeRFTrainer(hp2)
    np.testing.assert_allclose(
        np.asarray(trainer2.state.params["coarse"]["sigma"]["w"]),
        np.asarray(trainer.state.params["coarse"]["sigma"]["w"]),
    )
    assert int(trainer2.state.step) == int(trainer.state.step)


def test_lr_schedule_steplr():
    hp = argparse.Namespace(
        lr=2e-4, lr_scheduler="steplr", decay_step=[500, 1000],
        decay_gamma=0.5, num_epochs=2000, warmup_epochs=0, optimizer="adam",
        warmup_multiplier=1.0,
    )
    assert lr_for_epoch(hp, 0) == 2e-4
    assert lr_for_epoch(hp, 499) == 2e-4
    np.testing.assert_allclose(lr_for_epoch(hp, 500), 1e-4)
    np.testing.assert_allclose(lr_for_epoch(hp, 1500), 5e-5)


def test_lr_schedule_cosine_poly_warmup():
    hp = argparse.Namespace(
        lr=1e-3, lr_scheduler="cosine", num_epochs=100, warmup_epochs=0,
        optimizer="adam", warmup_multiplier=1.0,
    )
    assert lr_for_epoch(hp, 0) == pytest.approx(1e-3)
    assert lr_for_epoch(hp, 100) == pytest.approx(1e-8, abs=1e-9)
    hp2 = argparse.Namespace(
        lr=1e-3, lr_scheduler="poly", num_epochs=100, poly_exp=1.0,
        warmup_epochs=0, optimizer="adam", warmup_multiplier=1.0,
    )
    assert lr_for_epoch(hp2, 50) == pytest.approx(5e-4)
    hp3 = argparse.Namespace(
        lr=1e-3, lr_scheduler="steplr", decay_step=[1000], decay_gamma=0.5,
        num_epochs=100, warmup_epochs=10, warmup_multiplier=2.0, optimizer="adam",
    )
    # GradualWarmupScheduler: base_lr at epoch 0, multiplier*base_lr at
    # warmup end (warmup_scheduler.py:35)
    assert lr_for_epoch(hp3, 0) == pytest.approx(1e-3)
    assert lr_for_epoch(hp3, 10) == pytest.approx(2e-3)


def test_lr_schedule_warmup_matches_reference_scheduler():
    """Golden parity with GradualWarmupScheduler(MultiStepLR): ramp to
    multiplier*base over warmup, then milestones shifted by the warmup
    length on base*multiplier (warmup_scheduler.py:25-35)."""
    torch = pytest.importorskip("torch")
    from tests.reference_util import import_reference_module

    ws = import_reference_module("utils.warmup_scheduler")

    base_lr, w, m = 1e-3, 10, 2.0
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=base_lr)
    after = torch.optim.lr_scheduler.MultiStepLR(
        opt, milestones=[20, 40], gamma=0.5
    )
    sched = ws.GradualWarmupScheduler(
        opt, multiplier=m, total_epoch=w, after_scheduler=after
    )
    hp = argparse.Namespace(
        lr=base_lr, lr_scheduler="steplr", decay_step=[20, 40],
        decay_gamma=0.5, num_epochs=60, warmup_epochs=w,
        warmup_multiplier=m, optimizer="adam",
    )
    for epoch in range(60):
        want = opt.param_groups[0]["lr"]
        got = lr_for_epoch(hp, epoch)
        assert got == pytest.approx(want, rel=1e-6), (
            f"epoch {epoch}: {got} vs torch {want}"
        )
        opt.step()
        sched.step()


def test_d_lr_constant_across_decay_boundaries(blender_root, tmp_path):
    """Reference parity: get_scheduler binds ONLY to the G optimizer
    (sinnerf.py:202-210 builds it around self.optimizer; utils/__init__.py:34
    never sees opt_d), so under PL 0.10 the discriminator's LR is a CONSTANT
    0.2x base for the entire run — --decay_step boundaries must move G's LR
    but never D's."""
    from sinnerf_tpu.train.optimizers import get_learning_rate

    hp = _hparams(
        blender_root, str(tmp_path), dis_weight=0.01, num_epochs=3,
        decay_step=[1, 2], decay_gamma=0.5, num_rays=32,
    )
    trainer = SinNeRFTrainer(hp)
    trainer.train_dataset.length = 1  # one step per epoch
    d_lrs, g_lrs = [], []

    import sinnerf_tpu.train.loop as loop_mod

    orig_step = loop_mod.train_step

    def recording_step(state, *a, **k):
        g_lrs.append(get_learning_rate(state.opt_g))
        d_lrs.append(get_learning_rate(state.opt_d))
        return orig_step(state, *a, **k)

    loop_mod.train_step = recording_step
    try:
        trainer.fit()
    finally:
        loop_mod.train_step = orig_step

    # G follows the steplr schedule across both boundaries...
    np.testing.assert_allclose(g_lrs, [2e-4, 1e-4, 5e-5], rtol=1e-6)
    # ...while D sits at a constant 0.2x base the whole run
    np.testing.assert_allclose(d_lrs, [4e-5, 4e-5, 4e-5], rtol=1e-6)


@pytest.mark.parametrize(
    "name,wd,n_steps",
    [
        ("adam", 0.1, 5),
        ("sgd", 0.1, 5),
        ("radam", 0.1, 5),
        # ranger runs 13 steps so BOTH k=6 lookahead syncs (step 6 and 12)
        # are crossed — a sync-boundary off-by-one or slow-weight init bug
        # would diverge here.  Tested with decay on and off.
        ("ranger", 0.1, 13),
        ("ranger", 0.0, 13),
    ],
)
def test_weight_decay_matches_reference(name, wd, n_steps):
    """Golden parity for every --optimizer flavor: torch Adam/SGD couple L2
    into the gradient before the moment updates; the vendored RAdam/Ranger
    apply a decoupled lr-scaled decay (reference utils/optimizers.py:92-101,
    417-419).  Ranger (optimizers.py:292-439) additionally has
    betas=(0.95, 0.999) defaults that get_optimizer does not override, and
    the per-param lookahead sync every k=6 steps."""
    torch = pytest.importorskip("torch")
    from tests.reference_util import import_reference_module

    import argparse as ap

    lr = 1e-2
    w0 = np.array([0.5, -1.0, 2.0], np.float32)
    # a varying gradient stream so the moments/lookahead have structure
    rng = np.random.RandomState(3)
    gs = rng.randn(n_steps, 3).astype(np.float32) * 0.3

    p = torch.nn.Parameter(torch.tensor(w0))
    if name == "adam":
        topt = torch.optim.Adam([p], lr=lr, eps=1e-8, weight_decay=wd)
    elif name == "sgd":
        topt = torch.optim.SGD([p], lr=lr, momentum=0.9, weight_decay=wd)
    else:
        ropt = import_reference_module("utils.optimizers")
        cls = ropt.RAdam if name == "radam" else ropt.Ranger
        # reference get_optimizer overrides only lr/eps/weight_decay
        # (utils/__init__.py:23-27); betas stay at the class defaults
        topt = cls([p], lr=lr, eps=1e-8, weight_decay=wd)
    for g in gs:
        topt.zero_grad()
        p.grad = torch.tensor(g)
        topt.step()
    want = p.detach().numpy()

    hp = ap.Namespace(optimizer=name, lr=lr, weight_decay=wd, momentum=0.9)
    opt = get_optimizer(hp)
    params = {"w": jnp.asarray(w0)}
    state = opt.init(params)
    import optax

    for g in gs:
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(
        np.asarray(params["w"]), want, rtol=2e-5, atol=1e-7,
        err_msg=f"{name} (wd={wd}) diverges from torch",
    )


def test_trainer_data_parallel_mesh(blender_root, tmp_path):
    """num_gpus=8 on the 8 virtual CPU devices: trainer replicates state,
    shards batches, and the jitted step runs SPMD (GSPMD all-reduce)."""
    hp = _hparams(blender_root, str(tmp_path), num_gpus=8, batch_size=8)
    trainer = SinNeRFTrainer(hp)
    assert trainer.mesh is not None and trainer.mesh.devices.size == 8
    trainer.key, kb, ks = jax.random.split(trainer.key, 3)
    batch = trainer.train_dataset.sample(kb, step=0, batch_size=8)
    from sinnerf_tpu.parallel.mesh import shard_batch
    from sinnerf_tpu.train.step import train_step

    batch = shard_batch(batch, trainer.mesh)
    trainer.state, out = train_step(
        trainer.state, batch, ks, jnp.asarray(0.0),
        trainer.cfg, trainer.opt_g, trainer.opt_d,
    )
    assert np.isfinite(float(out["metrics"]["train/loss"]))
    # params stay replicated after the update
    w = trainer.state.params["coarse"]["sigma"]["w"]
    assert w.sharding.is_fully_replicated
    # validation renders through the mesh-sharded path (render_chunked_sharded)
    val_psnr = trainer.validate(0, max_batches=1, log=False)
    assert np.isfinite(val_psnr) and val_psnr > 0


def test_ddp_epoch_length_matches_reference(blender_root, tmp_path):
    """PL 0.10 under ddp injects a DistributedSampler (reference
    train.py:51-52), so one reference epoch at --num_gpus N is
    ceil(len/N) *global* optimizer steps — ceil(125/4)=32 for the rot3d
    bank at the published 4-GPU recipes, not 125.  Pins steps_per_epoch
    to the global-batch division and the --decay_step 500 boundary to the
    same global step index as the reference."""
    hp1 = _hparams(blender_root, str(tmp_path), num_gpus=1)
    t1 = SinNeRFTrainer(hp1)
    assert len(t1.train_dataset) == 125  # the 5^3 rot3d pose bank
    assert t1.steps_per_epoch() == 125

    hp4 = _hparams(blender_root, str(tmp_path), num_gpus=4)
    t4 = SinNeRFTrainer(hp4)
    assert t4.global_batch_size == 4
    assert t4.steps_per_epoch() == 32  # == math.ceil(125 / 4), the DDP count
    # --decay_step 500 fires entering epoch 500 = global step 500*32, the
    # same index a 4-rank reference run reaches after 500 DistributedSampler
    # epochs of ceil(125/4) steps each.
    assert 500 * t4.steps_per_epoch() == 16000
    assert lr_for_epoch(hp4, 499) == pytest.approx(2e-4)
    assert lr_for_epoch(hp4, 500) == pytest.approx(1e-4)

    # per-chip batch_size > 1 multiplies the global batch
    hp8 = _hparams(blender_root, str(tmp_path), num_gpus=4, batch_size=2)
    t8 = SinNeRFTrainer(hp8)
    assert t8.steps_per_epoch() == 16  # ceil(125 / 8)


def test_llff_train_step_end_to_end(tmp_path):
    """Composed train_step on the LLFF proj dataset family: losses finite,
    params update (the non-blender, non-DTU loss branch)."""
    from sinnerf_tpu.data.synthetic import make_llff_scene

    root = make_llff_scene(str(tmp_path / "llff"), (64, 48))
    hp = _hparams(
        root, str(tmp_path),
        dataset_name="llff_ray_patch_1image_proj",
        img_wh=[64, 48], patch_size=-1, patch_size_x=16, patch_size_y=16,
        sW=2, sH=2, dis_weight=0.01,
    )
    trainer = SinNeRFTrainer(hp)
    assert not trainer.cfg.is_dtu and not trainer.cfg.is_blender
    w0 = np.asarray(trainer.state.params["fine"]["sigma"]["w"]).copy()
    metrics = _run_steps(trainer, 2)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert not np.allclose(w0, np.asarray(trainer.state.params["fine"]["sigma"]["w"]))
    # validation renders an LLFF pose
    assert np.isfinite(trainer.validate(0, max_batches=1, log=False))


def test_dtu_train_step_end_to_end(tmp_path):
    """Composed train_step on DTU: exercises the cfg.is_dtu masked patch-depth
    branch (train/step.py) that no other suite path reaches."""
    from sinnerf_tpu.data.synthetic import make_dtu_scene

    root = make_dtu_scene(str(tmp_path / "dtu"), (64, 64))
    hp = _hparams(
        root, str(tmp_path),
        dataset_name="dtu_proj",
        img_wh=[64, 64], patch_size=-1, patch_size_x=16, patch_size_y=16,
        sW=2, sH=2,
    )
    trainer = SinNeRFTrainer(hp)
    assert trainer.cfg.is_dtu
    w0 = np.asarray(trainer.state.params["fine"]["sigma"]["w"]).copy()
    metrics = _run_steps(trainer, 2)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert float(metrics["train/loss_depth"]) > 0
    assert not np.allclose(w0, np.asarray(trainer.state.params["fine"]["sigma"]["w"]))
    assert np.isfinite(trainer.validate(0, max_batches=1, log=False))


def test_fit_runs_epochs_with_val_and_checkpoint(blender_root, tmp_path):
    """fit() end-to-end: sanity val, epoch loop with lr schedule, periodic
    validation, top-k checkpointing."""
    hp = _hparams(
        blender_root, str(tmp_path), num_epochs=2, check_val_every_n_epoch=1,
        num_rays=32, patch_size=16,
    )
    trainer = SinNeRFTrainer(hp)
    # shrink the epoch length for test speed
    trainer.train_dataset.length = 2
    best = trainer.fit()
    assert np.isfinite(best) and best > 0
    ckpt_dir = os.path.join(hp.ckpt_dir, "test")
    assert os.path.isdir(os.path.join(ckpt_dir, "last"))
    # top-k checkpoint for the best epoch exists as well
    assert any(name.startswith("epoch_") for name in os.listdir(ckpt_dir))
    assert int(trainer.state.step) == 4  # 2 epochs x 2 steps


class _RecordingWriter:
    def __init__(self):
        self.scalars, self.images = set(), set()

    def add_scalar(self, tag, *a, **k):
        self.scalars.add(tag)

    def add_images(self, tag, *a, **k):
        self.images.add(tag)


def test_logging_tag_parity(blender_root, tmp_path):
    """TensorBoard tags match the reference's (sinnerf.py:413-444,510-516,
    375-381): scalar losses, every-10-step image stacks incl. the side stack
    with the white-filled warp patch, and val/psnr + val/GT_pred_depth."""
    hp = _hparams(blender_root, str(tmp_path), num_epochs=1, num_rays=32)
    trainer = SinNeRFTrainer(hp)
    trainer.writer = _RecordingWriter()
    trainer.train_dataset.length = 10  # step 10 hits the %10 logging cadence
    trainer.fit()
    want_scalars = {
        "lr", "train/loss", "train/loss_g", "train/loss_vit", "train/loss_d",
        "train/loss_depth", "train/loss_depth_smooth", "train/loss_side_depth",
        "train/psnr", "train/depth_min", "train/depth_max", "train/depth_l2",
        "train/epoch_time", "val/psnr",
    }
    missing = want_scalars - trainer.writer.scalars
    assert not missing, f"missing scalar tags: {missing}"
    want_images = {"train/images", "train/images_side", "val/GT_pred_depth"}
    missing_img = want_images - trainer.writer.images
    assert not missing_img, f"missing image tags: {missing_img}"


def test_train_cli_main(blender_root, tmp_path, monkeypatch):
    """train.py main() wiring from reference-style argv."""
    # the reference mount shares top-level module names; make sure ours wins
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if sys.path[0] != repo_root:
        sys.path.insert(0, repo_root)
    sys.modules.pop("train", None)
    sys.modules.pop("opt", None)
    import train as train_cli
    from opt import get_opts

    monkeypatch.chdir(tmp_path)
    argv = (
        f"--dataset_name blender_ray_patch_1image_rot3d --root_dir {blender_root} "
        "--img_wh 64 64 --N_samples 4 --N_importance 4 --num_epochs 1 "
        "--batch_size 1 --optimizer adam --lr 2e-4 --lr_scheduler steplr "
        "--decay_step 500 --decay_gamma 0.5 --exp_name cli_smoke --with_ref "
        "--patch_size 16 --sW 2 --sH 2 --load_depth --depth_type nerf "
        "--model sinnerf --depth_weight 8 --num_rays 32 "
        "--check_val_every_n_epoch 1 --compute_dtype float32 --mlp_impl xla"
    ).split()
    hp = get_opts(argv)
    hp.ref_idx = 0
    trainer_best = None

    # cap the run length: monkeypatch the dataset length after construction
    import sinnerf_tpu.train.loop as loop_mod

    orig_init = loop_mod.SinNeRFTrainer.__init__

    def patched_init(self, hparams):
        orig_init(self, hparams)
        self.train_dataset.length = 2

    monkeypatch.setattr(loop_mod.SinNeRFTrainer, "__init__", patched_init)
    best = train_cli.main(hp)
    assert np.isfinite(best)


def test_loss_type_l2_vgg_rejected(blender_root, tmp_path):
    """--loss_type l2_vgg crashes in the reference (flat ray bundles into
    F.interpolate, losses.py:129); we reject it up front with a clear error.
    --patch_loss l2_vgg remains the supported perceptual path."""
    hp = _hparams(blender_root, str(tmp_path), loss_type="l2_vgg")
    with pytest.raises(ValueError, match="l2_vgg"):
        SinNeRFTrainer(hp)


def test_loss_type_l2_ssim_rejected(blender_root, tmp_path):
    """--loss_type l2_ssim crashes in the reference too (flat ray bundles
    into the window-11 SSIM, losses.py:105); same fail-fast treatment as
    l2_vgg.  --patch_loss l2_ssim remains supported on image patches."""
    hp = _hparams(blender_root, str(tmp_path), loss_type="l2_ssim")
    with pytest.raises(ValueError, match="l2_ssim"):
        SinNeRFTrainer(hp)


def test_resume_migrates_flat_ref_feature(blender_root, tmp_path):
    """Checkpoints from before the per-item ViT cache stored ref_feature as
    (384,); resume must broadcast it to (global_batch, 384)."""
    import glob

    from sinnerf_tpu.train.checkpoints import TopKCheckpointManager

    hp = _hparams(blender_root, str(tmp_path), vit_weight=1.0,
                  allow_random_pretrained=True)
    trainer = SinNeRFTrainer(hp)
    # simulate the legacy layout: flatten the stored cache to (384,)
    legacy_state = dict(trainer.state._asdict())
    legacy_state["ref_feature"] = jnp.zeros((384,))
    legacy_dir = os.path.join(str(tmp_path), "legacy")
    mgr = TopKCheckpointManager(legacy_dir, top_k=1)
    mgr.save({"state": legacy_state, "epoch": 0}, 0, 1.0)
    trainer._resume(os.path.join(legacy_dir, "last"))
    assert trainer.state.ref_feature.shape == (trainer.global_batch_size, 384)


def test_pt_model_orbax_warm_start_loads_params(blender_root, tmp_path):
    """Regression: our orbax checkpoints nest params under 'state', and the
    warm-start path used to look for a top-level 'params' key — silently
    loading NOTHING from --pt_model <orbax dir>."""
    hp = _hparams(blender_root, str(tmp_path))
    trainer = SinNeRFTrainer(hp)
    _run_steps(trainer, 2)
    trainer._save(0, 11.0)
    ckpt = os.path.join(hp.ckpt_dir, "test", "last")

    hp2 = _hparams(blender_root, str(tmp_path), pt_model=ckpt, exp_name="warm")
    trainer2 = SinNeRFTrainer(hp2)
    np.testing.assert_array_equal(
        np.asarray(trainer2.state.params["coarse"]["sigma"]["w"]),
        np.asarray(trainer.state.params["coarse"]["sigma"]["w"]),
    )
    np.testing.assert_array_equal(
        np.asarray(trainer2.state.params["fine"]["sigma"]["w"]),
        np.asarray(trainer.state.params["fine"]["sigma"]["w"]),
    )
    # warm start, not resume: optimizer/step state stays fresh
    assert int(trainer2.state.step) == 0


def _fake_reference_system_ckpt(path, d_imsize=-1):
    """A reference-shaped pytorch-lightning checkpoint: full SinNeRF system
    (nerf_coarse + nerf_fine + discriminator D with spectral-norm buffers)."""
    import torch

    from sinnerf_tpu.models.discriminator import init_discriminator
    from sinnerf_tpu.models.nerf import export_torch_state, init_nerf_params

    key = jax.random.key(7)
    kc, kf, kd = jax.random.split(key, 3)
    coarse, fine = init_nerf_params(kc), init_nerf_params(kf)
    d_params, sn_state = init_discriminator(kd, d_imsize)
    sd = {}
    sd.update(export_torch_state(coarse, "nerf_coarse."))
    sd.update(export_torch_state(fine, "nerf_fine."))
    for i, (conv, u) in enumerate(zip(d_params["convs"], sn_state["convs"])):
        sd[f"D.main.{i}.weight_orig"] = torch.tensor(np.asarray(conv["w"]))
        sd[f"D.main.{i}.weight_u"] = torch.tensor(np.asarray(u["u"]))
    sd["loss.dummy"] = torch.zeros(3)  # the default prefixes_to_ignore target
    sd = {
        k: torch.tensor(np.asarray(v)) if not isinstance(v, torch.Tensor) else v
        for k, v in sd.items()
    }
    torch.save({"state_dict": sd}, path)
    return coarse, fine, d_params, sn_state


def test_pt_model_full_system_torch_warm_start(blender_root, tmp_path):
    """--pt_model WITHOUT --nerf_only loads the whole system incl. the
    discriminator + its spectral-norm state (reference train.py:31-33)."""
    torch = pytest.importorskip("torch")  # noqa: F841
    ckpt = str(tmp_path / "system.ckpt")
    coarse, fine, d_params, sn_state = _fake_reference_system_ckpt(ckpt)

    hp = _hparams(
        blender_root, str(tmp_path), pt_model=ckpt, dis_weight=0.01,
        nerf_only=False,
    )
    trainer = SinNeRFTrainer(hp)
    np.testing.assert_allclose(
        np.asarray(trainer.state.params["coarse"]["sigma"]["w"]),
        np.asarray(coarse["sigma"]["w"]), rtol=1e-6,
    )
    for i, conv in enumerate(d_params["convs"]):
        np.testing.assert_allclose(
            np.asarray(trainer.state.d_params["convs"][i]["w"]),
            np.asarray(conv["w"]), rtol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(trainer.state.sn_state["convs"][i]["u"]),
            np.asarray(sn_state["convs"][i]["u"]), rtol=1e-6,
        )

    # --nerf_only keeps the freshly initialized discriminator (train.py:24-30)
    hp2 = _hparams(
        blender_root, str(tmp_path), pt_model=ckpt, dis_weight=0.01,
        nerf_only=True, exp_name="nerfonly",
    )
    trainer2 = SinNeRFTrainer(hp2)
    assert not np.allclose(
        np.asarray(trainer2.state.d_params["convs"][0]["w"]),
        np.asarray(d_params["convs"][0]["w"]),
    )
    np.testing.assert_allclose(
        np.asarray(trainer2.state.params["fine"]["sigma"]["w"]),
        np.asarray(fine["sigma"]["w"]), rtol=1e-6,
    )


def test_prefixes_to_ignore_honored(blender_root, tmp_path):
    """--prefixes_to_ignore drops state-dict keys by prefix in the pt_model
    partial load (extract_model_state_dict, utils/__init__.py:60-74)."""
    pytest.importorskip("torch")
    ckpt = str(tmp_path / "system2.ckpt")
    coarse, fine, _, _ = _fake_reference_system_ckpt(ckpt)

    hp = _hparams(
        blender_root, str(tmp_path), pt_model=ckpt,
        prefixes_to_ignore=["loss", "nerf_fine"],
    )
    trainer = SinNeRFTrainer(hp)
    np.testing.assert_allclose(
        np.asarray(trainer.state.params["coarse"]["sigma"]["w"]),
        np.asarray(coarse["sigma"]["w"]), rtol=1e-6,
    )
    # the ignored fine net keeps its fresh random init
    assert not np.allclose(
        np.asarray(trainer.state.params["fine"]["sigma"]["w"]),
        np.asarray(fine["sigma"]["w"]),
    )


def test_prefixes_to_ignore_honored_orbax(blender_root, tmp_path):
    """Same flag, same behavior on our orbax checkpoints: component names map
    to the reference module names (coarse->nerf_coarse, fine->nerf_fine)."""
    hp = _hparams(blender_root, str(tmp_path))
    trainer = SinNeRFTrainer(hp)
    _run_steps(trainer, 1)
    trainer._save(0, 11.0)
    ckpt = os.path.join(hp.ckpt_dir, "test", "last")

    hp2 = _hparams(
        blender_root, str(tmp_path), pt_model=ckpt, exp_name="warm2",
        prefixes_to_ignore=["nerf_fine"],
    )
    trainer2 = SinNeRFTrainer(hp2)
    np.testing.assert_array_equal(
        np.asarray(trainer2.state.params["coarse"]["sigma"]["w"]),
        np.asarray(trainer.state.params["coarse"]["sigma"]["w"]),
    )
    assert not np.allclose(
        np.asarray(trainer2.state.params["fine"]["sigma"]["w"]),
        np.asarray(trainer.state.params["fine"]["sigma"]["w"]),
    )


def test_topk_manager_state_persists_across_resume(tmp_path):
    """The (score, name) top-k ranking rides inside every checkpoint and a
    restored manager keeps pruning correctly (Lightning carries the callback
    best scores the same way, reference eval.py:132)."""
    from sinnerf_tpu.train.checkpoints import (
        TopKCheckpointManager,
        load_checkpoint,
    )

    d = str(tmp_path / "ck")
    tree = {"x": np.zeros(2)}
    mgr = TopKCheckpointManager(d, top_k=2)
    mgr.save(tree, 0, 10.0)
    mgr.save(tree, 1, 12.0)
    mgr.save(tree, 2, 11.0)  # prunes epoch 0 (10.0)
    assert not os.path.isdir(os.path.join(d, "epoch_0_psnr_10.00"))

    best = load_checkpoint(os.path.join(d, "last"))["ckpt_best"]
    mgr2 = TopKCheckpointManager(d, top_k=2, best=best)
    assert [round(p, 2) for p, _ in mgr2.best] == [12.0, 11.0]
    mgr2.save(tree, 3, 13.0)  # must prune 11.0, keep 12.0 + 13.0
    assert os.path.isdir(os.path.join(d, "epoch_3_psnr_13.00"))
    assert os.path.isdir(os.path.join(d, "epoch_1_psnr_12.00"))
    assert not os.path.isdir(os.path.join(d, "epoch_2_psnr_11.00"))


def test_trainer_resume_restores_topk_state(blender_root, tmp_path):
    hp = _hparams(blender_root, str(tmp_path))
    trainer = SinNeRFTrainer(hp)
    _run_steps(trainer, 1)
    trainer._save(0, 9.0)
    trainer._save(1, 10.0)
    ckpt = os.path.join(hp.ckpt_dir, "test", "last")
    hp2 = _hparams(blender_root, str(tmp_path), ckpt_path=ckpt)
    trainer2 = SinNeRFTrainer(hp2)
    assert [round(p, 2) for p, _ in trainer2.ckpt_manager.best] == [10.0, 9.0]


def test_trainer_resume_continues_at_next_epoch(blender_root, tmp_path):
    """_save(epoch) runs after epoch `epoch` completed, so resume must start
    at epoch+1: replaying the saved epoch would train it a second time on top
    of its own post-epoch params (extra steps + LR/log skew per restart)."""
    hp = _hparams(blender_root, str(tmp_path))
    trainer = SinNeRFTrainer(hp)
    _run_steps(trainer, 1)
    trainer._save(3, 9.0)
    ckpt = os.path.join(hp.ckpt_dir, "test", "last")
    hp2 = _hparams(blender_root, str(tmp_path), ckpt_path=ckpt)
    trainer2 = SinNeRFTrainer(hp2)
    assert trainer2.start_epoch == 4
    # resumed state must be TRAINABLE: a target-less orbax restore loses the
    # optax namedtuple structure, which used to crash set_lr/optax.update on
    # the first resumed epoch (masked because no test trained after resume)
    from sinnerf_tpu.train.optimizers import set_lr

    trainer2.state = trainer2.state._replace(
        opt_g=set_lr(trainer2.state.opt_g, 1e-4)
    )
    _run_steps(trainer2, 1)
    assert int(trainer2.state.step) == 2
    # a completed run resumes as a no-op: fit() must run zero further epochs
    hp3 = _hparams(blender_root, str(tmp_path), ckpt_path=ckpt, num_epochs=4)
    trainer3 = SinNeRFTrainer(hp3)
    spe = trainer3.steps_per_epoch()
    step_before = int(trainer3.state.step)
    trainer3.fit()
    assert int(trainer3.state.step) == step_before


def _degrade_to_orbax_form(tree):
    """Mimic a target-less orbax restore: namedtuples -> field dicts, tuples
    -> lists, empty nodes (optax.EmptyState) -> None, arrays -> numpy."""
    if hasattr(tree, "_fields"):
        if not tree._fields:
            return None
        return {f: _degrade_to_orbax_form(getattr(tree, f)) for f in tree._fields}
    if isinstance(tree, (tuple, list)):
        if not tree:
            return None
        return [_degrade_to_orbax_form(x) for x in tree]
    if isinstance(tree, dict):
        return {k: _degrade_to_orbax_form(v) for k, v in tree.items()}
    return np.asarray(tree)


def test_restructure_migrates_pre_chain_optimizer_state():
    """get_optimizer once built inject_hyperparams(optax.adam) directly; it
    now wraps every optimizer in a chain-of-one.  A checkpoint written with
    the old structure (e.g. the round-2 hardware soaks) must restructure into
    the new template with its adam moment estimates intact, not crash."""
    import optax

    from sinnerf_tpu.train.checkpoints import restructure_like
    from sinnerf_tpu.train.optimizers import set_lr

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
    old_opt = optax.inject_hyperparams(optax.adam)(learning_rate=2e-4)
    old_state = old_opt.init(params)
    # put recognizable values in the moments
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    _, old_state = old_opt.update(grads, old_state, params)
    restored = _degrade_to_orbax_form(old_state)

    hp = argparse.Namespace(
        optimizer="adam", lr=2e-4, momentum=0.9, weight_decay=0.0
    )
    new_opt = get_optimizer(hp)
    template = new_opt.init(params)
    migrated = restructure_like(template, restored)

    # moment estimates preserved (old inner_state was adam's bare 2-tuple;
    # new is a 1-tuple chain around it)
    old_mu = old_state.inner_state[0].mu["w"]
    new_mu = migrated.inner_state[0][0].mu["w"]
    np.testing.assert_allclose(np.asarray(new_mu), np.asarray(old_mu))
    # and the migrated state is live: set_lr + a real update step work
    migrated = set_lr(migrated, 1e-4)
    updates, migrated = new_opt.update(grads, migrated, params)
    assert jnp.all(jnp.isfinite(updates["w"]))


def test_resume_falls_back_to_fresh_optimizer_state(
    blender_root, tmp_path, capsys
):
    """An opt_g structure no migration understands must not brick the
    checkpoint: resume warns and reinitializes the optimizer state while
    params and step restore normally."""
    hp = _hparams(blender_root, str(tmp_path))
    trainer = SinNeRFTrainer(hp)
    _run_steps(trainer, 1)
    trainer._save(3, 9.0)
    ckpt = os.path.join(hp.ckpt_dir, "test", "last")

    # corrupt the saved opt_g into an alien structure
    from sinnerf_tpu.train.checkpoints import load_checkpoint, save_checkpoint

    tree = load_checkpoint(ckpt)
    tree["state"]["opt_g"] = {"alien": [1, 2, 3]}
    save_checkpoint(os.path.dirname(ckpt), "last", tree)

    hp2 = _hparams(blender_root, str(tmp_path), ckpt_path=ckpt)
    trainer2 = SinNeRFTrainer(hp2)
    out = capsys.readouterr().out
    assert "incompatible" in out and "opt_g" in out
    assert trainer2.start_epoch == 4
    # params restored (not fresh): step counter carried over
    assert int(trainer2.state.step) == int(trainer.state.step)
    # and training continues from the fresh optimizer state
    from sinnerf_tpu.train.optimizers import set_lr

    trainer2.state = trainer2.state._replace(
        opt_g=set_lr(trainer2.state.opt_g, 1e-4)
    )
    _run_steps(trainer2, 1)
    assert int(trainer2.state.step) == int(trainer.state.step) + 1


def test_epoch_batches_prefetch_equivalent(blender_root, tmp_path):
    """The --prefetch_batches fast path yields the same (i, batch, k_step)
    stream and leaves trainer.key in the same state as the per-step path —
    including a tail group (7 steps at K=3 -> groups of 3, 3, 1).

    Every draw (ray picks, patch origins, warp winners) is bit-identical;
    the one tolerance is warp_patch_depth, where the K-batched compilation
    reassociates the fresh-warp projection matmul chain by <=1 ulp (the
    winner ordinals themselves are depth-independent for rot3d's last-write
    warp, so only the float depth value wiggles, never which pixel won)."""
    hp1 = _hparams(blender_root, str(tmp_path), prefetch_batches=1)
    hpK = _hparams(blender_root, str(tmp_path), prefetch_batches=3)
    t1, tK = SinNeRFTrainer(hp1), SinNeRFTrainer(hpK)
    t1.key = tK.key = jax.random.key(123)
    s1 = list(t1._epoch_batches(epoch=2, spe=7))
    sK = list(tK._epoch_batches(epoch=2, spe=7))
    assert [i for i, _, _ in s1] == [i for i, _, _ in sK] == list(range(7))
    for (_, b1, k1), (_, bK, kK) in zip(s1, sK):
        np.testing.assert_array_equal(
            np.asarray(jax.random.key_data(k1)),
            np.asarray(jax.random.key_data(kK)),
        )
        for name in b1:
            if name == "warp_patch_depth":
                np.testing.assert_allclose(
                    np.asarray(b1[name]), np.asarray(bK[name]),
                    rtol=1e-6, atol=2e-6, err_msg=name,
                )
            else:
                np.testing.assert_array_equal(
                    np.asarray(b1[name]), np.asarray(bK[name]), err_msg=name
                )
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(t1.key)),
        np.asarray(jax.random.key_data(tK.key)),
    )
