"""CLI-level tests: flag parsing, eval pipeline end-to-end on synthetic data,
torch checkpoint interop, weight stripping."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import eval as eval_cli
from opt import get_opts
from sinnerf_tpu.data.synthetic import make_llff_scene
from sinnerf_tpu.models.nerf import export_torch_state, init_nerf_params
from sinnerf_tpu.train.checkpoints import (
    load_torch_nerf_checkpoint,
    save_checkpoint,
)


def test_get_opts_reference_recipe():
    """The reference README Step-1 lego command parses unchanged."""
    argv = (
        "--dataset_name blender_ray_patch_1image_rot3d --root_dir /tmp/lego "
        "--N_importance 64 --img_wh 400 400 --num_epochs 2000 --batch_size 1 "
        "--optimizer adam --lr 2e-4 --lr_scheduler steplr --decay_step 500 1000 "
        "--decay_gamma 0.5 --exp_name lego_s4 --with_ref --patch_size 64 "
        "--sW 6 --sH 6 --proj_weight 1 --depth_smooth_weight 0.5 "
        "--dis_weight 0 --num_gpus 4 --load_depth --depth_type nerf "
        "--model sinnerf --depth_weight 8 --vit_weight 10"
    ).split()
    hp = get_opts(argv)
    assert hp.dataset_name == "blender_ray_patch_1image_rot3d"
    assert hp.decay_step == [500, 1000]
    assert hp.patch_size == 64 and hp.sW == 6
    assert hp.vit_weight == 10 and hp.depth_weight == 8
    assert hp.load_depth and hp.with_ref


def test_eval_cli_on_synthetic_llff(tmp_path, monkeypatch):
    root = make_llff_scene(str(tmp_path / "llff"), (32, 24))
    params = {
        "coarse": init_nerf_params(jax.random.key(0)),
        "fine": init_nerf_params(jax.random.key(1)),
    }
    ckpt = save_checkpoint(str(tmp_path), "weights", {"params": params})

    monkeypatch.chdir(tmp_path)
    args = eval_cli.get_opts(
        [
            "--root_dir", root,
            "--dataset_name", "llff",
            "--scene_name", "synth",
            "--split", "val",
            "--img_wh", "32", "24",
            "--N_samples", "8",
            "--N_importance", "8",
            "--chunk", "1024",
            "--ckpt_path", ckpt,
        ]
    )
    mean_psnr = eval_cli.main(args)
    assert mean_psnr is not None and np.isfinite(mean_psnr)
    out_dir = tmp_path / "results" / "llff" / "synth"
    pngs = list(out_dir.rglob("*.png"))
    gifs = list(out_dir.rglob("*.gif"))
    assert pngs and gifs


def test_eval_cli_test_train_names_outputs_after_source_images(
    tmp_path, monkeypatch
):
    """LLFF test_train renders are named after their source images exactly as
    the reference does (eval.py:163-166 via datasets/llff.py:391-392: basename
    with only '.JPG' stripped), keeping renders file-level comparable."""
    root = make_llff_scene(str(tmp_path / "llff"), (32, 24))
    from sinnerf_tpu.data.llff import LLFFEval

    ds = LLFFEval(root, split="test_train", img_wh=(32, 24))
    item = ds.val_item(0)
    assert "fname" in item
    want_names = {
        os.path.basename(f).replace(".JPG", "") + ".png"
        for f in ds.val_fnames
    }

    params = {
        "coarse": init_nerf_params(jax.random.key(0)),
        "fine": init_nerf_params(jax.random.key(1)),
    }
    ckpt = save_checkpoint(str(tmp_path), "weights", {"params": params})
    monkeypatch.chdir(tmp_path)
    args = eval_cli.get_opts(
        [
            "--root_dir", root, "--dataset_name", "llff", "--scene_name", "tt",
            "--split", "test_train", "--img_wh", "32", "24", "--N_samples", "4",
            "--N_importance", "4", "--chunk", "1024", "--ckpt_path", ckpt,
        ]
    )
    eval_cli.main(args)
    out_dir = tmp_path / "results" / "llff" / "tt"
    got = {p.name for p in out_dir.rglob("*.png")}
    missing = want_names - got
    assert not missing, f"renders not named after source images: {missing}"
    # the numbered fallback must not have fired
    assert "000.png" not in got


def test_eval_cli_save_depth(tmp_path, monkeypatch):
    root = make_llff_scene(str(tmp_path / "llff"), (32, 24))
    params = {
        "coarse": init_nerf_params(jax.random.key(0)),
        "fine": init_nerf_params(jax.random.key(1)),
    }
    ckpt = save_checkpoint(str(tmp_path), "weights", {"params": params})
    monkeypatch.chdir(tmp_path)
    args = eval_cli.get_opts(
        [
            "--root_dir", root, "--dataset_name", "llff", "--scene_name", "sd",
            "--split", "val", "--img_wh", "32", "24", "--N_samples", "4",
            "--N_importance", "4", "--chunk", "1024", "--ckpt_path", ckpt,
            "--save_depth", "--depth_format", "pfm",
        ]
    )
    eval_cli.main(args)
    pfms = list((tmp_path / "results").rglob("*.pfm"))
    assert pfms


def test_torch_lightning_ckpt_import(tmp_path):
    """A reference-style Lightning checkpoint (nerf_coarse./nerf_fine.
    prefixes inside state_dict) loads into our param pytrees."""
    import torch

    coarse = init_nerf_params(jax.random.key(3))
    fine = init_nerf_params(jax.random.key(4))
    state = {}
    for prefix, params in (("nerf_coarse.", coarse), ("nerf_fine.", fine)):
        for k, v in export_torch_state(params, model_prefix=prefix).items():
            state[k] = torch.from_numpy(np.ascontiguousarray(v))
    blob = {"state_dict": state, "epoch": 7}
    path = str(tmp_path / "ref.ckpt")
    torch.save(blob, path)

    loaded = load_torch_nerf_checkpoint(path)
    assert set(loaded) == {"coarse", "fine"}
    np.testing.assert_allclose(
        np.asarray(loaded["coarse"]["sigma"]["w"]),
        np.asarray(coarse["sigma"]["w"]),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(loaded["fine"]["xyz_encoding_5"]["w"]),
        np.asarray(fine["xyz_encoding_5"]["w"]),
        rtol=1e-6,
    )


def test_save_weights_only(tmp_path):
    from sinnerf_tpu.train.checkpoints import load_checkpoint
    from sinnerf_tpu.utils.save_weights_only import save_weights_only

    params = {"coarse": init_nerf_params(jax.random.key(5))}
    full = {
        "state": {
            "params": params,
            "opt_g": {"big": np.zeros((10, 10))},
            "d_params": None,
        },
        "epoch": 3,
    }
    ckpt = save_checkpoint(str(tmp_path), "full", full)
    out = save_weights_only(ckpt, str(tmp_path / "weights_only"))
    tree = load_checkpoint(out)
    assert "params" in tree and "opt_g" not in tree.get("state", tree)


def test_train_help_with_rank_env_prints_usage(tmp_path):
    """`python train.py --help` on a worker host whose shell exports the
    multi-process env trio must print usage immediately: distributed init
    runs after argparse (at module import it blocked on the coordinator for
    jax.distributed's 300 s initialization timeout before help could print).
    """
    import subprocess

    env = dict(os.environ)
    env.update(
        SINNERF_COORDINATOR="localhost:1",  # nothing listens here
        SINNERF_NUM_PROCESSES="2",
        SINNERF_PROCESS_ID="1",
        SINNERF_JAX_CACHE_DIR="off",
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "train.py", "--help"],
        capture_output=True,
        text=True,
        env=env,
        timeout=240,  # import time only, but this box can be heavily contended
        cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "usage" in proc.stdout.lower()


def test_save_checkpoint_with_inherited_rank_env(tmp_path, monkeypatch):
    """The multi-process env trio WITHOUT jax.distributed.initialize (e.g. a
    read/write CLI utility run from a worker host's shell) must still write a
    real checkpoint: rank-scoped orbax options keyed on the env alone made
    primary_host=1 != process_index()==0, so orbax silently never finalized
    the save (only an *.orbax-checkpoint-tmp dir remained)."""
    from sinnerf_tpu.train.checkpoints import load_checkpoint

    monkeypatch.setenv("SINNERF_COORDINATOR", "localhost:12345")
    monkeypatch.setenv("SINNERF_NUM_PROCESSES", "2")
    monkeypatch.setenv("SINNERF_PROCESS_ID", "1")
    path = save_checkpoint(str(tmp_path), "x", {"a": np.arange(3.0)})
    assert os.path.isdir(path), os.listdir(str(tmp_path))
    np.testing.assert_array_equal(
        np.asarray(load_checkpoint(path)["a"]), np.arange(3.0)
    )


def test_make_default_hparams_matches_flag_table():
    """Programmatic hparams == CLI defaults; unknown keys rejected."""
    import pytest as _pytest

    from opt import get_opts, make_default_hparams

    cli = vars(get_opts([]))
    prog = vars(make_default_hparams())
    assert prog == cli
    assert vars(make_default_hparams(lr=1.0))["lr"] == 1.0
    with _pytest.raises(TypeError, match="unknown"):
        make_default_hparams(not_a_flag=1)


def test_configure_tpu_env_respects_user_override(monkeypatch):
    from sinnerf_tpu.utils.cache import configure_tpu_env

    monkeypatch.setenv("LIBTPU_INIT_ARGS", "--xla_tpu_scoped_vmem_limit_kib=8192")
    configure_tpu_env()
    import os

    assert os.environ["LIBTPU_INIT_ARGS"] == "--xla_tpu_scoped_vmem_limit_kib=8192"
    monkeypatch.setenv("LIBTPU_INIT_ARGS", "--foo=1")
    configure_tpu_env()
    assert "--foo=1" in os.environ["LIBTPU_INIT_ARGS"]
    assert "xla_tpu_scoped_vmem_limit_kib=32768" in os.environ["LIBTPU_INIT_ARGS"]


def test_scripts_imports_resolve():
    """Every `from sinnerf_tpu.* import X` / `from opt import X` in scripts/
    must resolve: the profiling/experiment scripts are run rarely (on the
    real TPU), so a rename in the package breaks them silently until the
    next hardware session (exp_bwd_pipeline once imported a pre-rename
    `_round8` and died at import).  Static check — no script code runs."""
    import ast
    import importlib

    scripts_dir = os.path.join(os.path.dirname(__file__), "..", "scripts")
    checked = 0
    for fname in sorted(os.listdir(scripts_dir)):
        if not fname.endswith(".py"):
            continue
        tree = ast.parse(open(os.path.join(scripts_dir, fname)).read(), fname)
        for node in ast.walk(tree):
            if not isinstance(node, ast.ImportFrom) or node.level:
                continue
            mod = node.module or ""
            if not (mod.startswith("sinnerf_tpu") or mod in ("opt", "eval")):
                continue
            imported = importlib.import_module(mod)
            for alias in node.names:
                assert hasattr(imported, alias.name), (
                    f"{fname}: `from {mod} import {alias.name}` does not "
                    "resolve"
                )
                checked += 1
    assert checked > 20  # the guard itself must be exercising something


def test_persistent_cache_disabled_under_tests():
    """conftest sets SINNERF_JAX_CACHE_DIR=off and enable_persistent_cache
    honors it: the persistent compile cache exists for the axon tunnel's
    remote compiles, and on CPU a cached executable read back through
    backend.deserialize_executable can abort the interpreter (see
    utils/cache.py) — the suite must never turn it on."""
    import os

    import jax

    from sinnerf_tpu.utils.cache import enable_persistent_cache

    assert os.environ.get("SINNERF_JAX_CACHE_DIR") == "off"
    assert enable_persistent_cache() == ""
    assert jax.config.jax_compilation_cache_dir is None


def test_persistent_cache_per_rank_subdir(tmp_path, monkeypatch):
    """Multi-process launches must not share one cache dir (read/write race;
    a corrupt CPU entry read back can abort the interpreter) — each rank
    gets a rank{N} subdir."""
    import jax

    from sinnerf_tpu.utils.cache import enable_persistent_cache

    monkeypatch.setenv("SINNERF_COORDINATOR", "localhost:1")
    monkeypatch.setenv("SINNERF_PROCESS_ID", "1")
    monkeypatch.setenv("SINNERF_JAX_CACHE_DIR", str(tmp_path / "c"))
    old = jax.config.jax_compilation_cache_dir
    try:
        got = enable_persistent_cache()
        assert got == str(tmp_path / "c" / "rank1")
        assert os.path.isdir(got)
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


def test_distributed_partial_env_raises(monkeypatch):
    """SINNERF_COORDINATOR without the rest of the env trio must fail with
    a message naming what's missing, not a bare KeyError."""
    from sinnerf_tpu.parallel.mesh import maybe_initialize_distributed

    monkeypatch.setenv("SINNERF_COORDINATOR", "localhost:1")
    monkeypatch.delenv("SINNERF_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("SINNERF_PROCESS_ID", raising=False)
    with pytest.raises(RuntimeError, match="SINNERF_NUM_PROCESSES"):
        maybe_initialize_distributed()


def test_torch_export_roundtrip(tmp_path):
    """Reverse checkpoint interop: an orbax checkpoint exported with
    export_torch_checkpoint must be consumable by the reference ecosystem —
    load_ckpt(model, path, model_name='nerf_coarse') semantics
    (reference utils/__init__.py:60-83, the exact path eval.py:131-145 and
    --pt_model warm starts take) re-executed on the real torch modules, with
    matching forward logits for both NeRFs and the discriminator."""
    torch = pytest.importorskip("torch")
    from tests.reference_util import import_reference_module

    from sinnerf_tpu.models.discriminator import (
        discriminator_apply,
        init_discriminator,
    )
    from sinnerf_tpu.models.nerf import nerf_apply
    from sinnerf_tpu.core.encoding import positional_encoding
    from sinnerf_tpu.train.checkpoints import (
        export_torch_checkpoint,
        load_torch_nerf_checkpoint,
    )

    nerf_ref = import_reference_module("models.nerf")
    disc_ref = import_reference_module("models.discriminator")

    params = {
        "coarse": init_nerf_params(jax.random.key(0)),
        "fine": init_nerf_params(jax.random.key(1)),
    }
    d_params, sn_state = init_discriminator(jax.random.key(2), 64)
    full = {
        "state": {"params": params, "d_params": d_params, "sn_state": sn_state},
        "epoch": 11,
        "hparams": {"patch_size": 64},
    }
    ckpt = save_checkpoint(str(tmp_path), "full", full)
    out = export_torch_checkpoint(ckpt, str(tmp_path / "export.ckpt"))

    # --- reference load semantics (utils/__init__.py:60-83): filter keys by
    # model_name prefix, update the module state dict, strict load
    def extract_model_state_dict(ckpt_path, model_name):
        checkpoint = torch.load(
            ckpt_path, map_location="cpu", weights_only=False
        )
        if "state_dict" in checkpoint:
            checkpoint = checkpoint["state_dict"]
        return {
            k[len(model_name) + 1:]: v
            for k, v in checkpoint.items()
            if k.startswith(model_name)
        }

    def load_ckpt(model, ckpt_path, model_name):
        model_dict = model.state_dict()
        model_dict.update(extract_model_state_dict(ckpt_path, model_name))
        model.load_state_dict(model_dict)

    rng = np.random.default_rng(3)
    xyz_pe = positional_encoding(
        jnp.asarray(rng.uniform(-1, 1, (64, 3)).astype(np.float32)), 10
    )
    dir_pe = positional_encoding(
        jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32)), 4
    )
    x_in = torch.from_numpy(
        np.concatenate([np.asarray(xyz_pe), np.asarray(dir_pe)], axis=-1)
    )
    for name, prefix in (("coarse", "nerf_coarse"), ("fine", "nerf_fine")):
        model = nerf_ref.NeRF(use_new_activation=True)
        load_ckpt(model, out, prefix)
        model.eval()
        with torch.no_grad():
            want = model(x_in).numpy()
        got = np.asarray(nerf_apply(params[name], xyz_pe, dir_pe))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # --- discriminator: strict load of the exported D.* spectral-norm keys
    dmodel = disc_ref.Discriminator(
        conditional=False, policy=None, ndf=64, imsize=64
    )
    load_ckpt(dmodel, out, "D")
    dmodel.train()
    x = rng.uniform(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want_d = dmodel(torch.from_numpy(x)).numpy()
    got_d, _ = discriminator_apply(
        d_params, sn_state, jnp.asarray(x), key=None, train=True,
        imsize=64, policy="",
    )
    np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-3, atol=1e-4)

    # --- and back through our own importer: bit-equal pytrees
    back = load_torch_nerf_checkpoint(out, nerf_only=False)
    for name in ("coarse", "fine"):
        for k in params[name]:
            np.testing.assert_array_equal(
                np.asarray(params[name][k]["w"]), np.asarray(back[name][k]["w"])
            )
    for slot in range(len(d_params["convs"])):
        np.testing.assert_array_equal(
            np.asarray(d_params["convs"][slot]["w"]),
            np.asarray(back["d_params"]["convs"][slot]["w"]),
        )
        np.testing.assert_array_equal(
            np.asarray(sn_state["convs"][slot]["u"]),
            np.asarray(back["sn_state"]["convs"][slot]["u"]),
        )
