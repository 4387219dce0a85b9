"""Training driver: the reference's pytorch-lightning ``Trainer`` + ``SinNeRF``
LightningModule collapse into one explicit loop.

Parity targets:
* system construction — ``models/sinnerf.py:124-210`` (embeddings, coarse/fine
  NeRF, optional D and ViT, loss selection, two optimizers with D at 0.2x lr)
* fit loop — ``train.py:44-62`` (sanity val step, val every N epochs,
  ModelCheckpoint top-2+last on val/psnr, TensorBoard logging)
* validation — ``models/sinnerf.py:556-586`` (full-image render, PSNR mean,
  image triptych every 5th batch)

The loop is host-side Python; everything per-step (sampling, rendering,
losses, both optimizer updates) is inside the jitted ``train_step``.
"""

from __future__ import annotations

import math
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sinnerf_tpu.data import dataset_dict
from sinnerf_tpu.models.nerf import init_nerf_params
from sinnerf_tpu.models.discriminator import init_discriminator
from sinnerf_tpu.models.vit import load_vit_params
from sinnerf_tpu.render.renderer import (
    RenderSettings,
    pick_val_tile,
    render_chunked,
    render_chunked_sharded,
)
from sinnerf_tpu.train.checkpoints import (
    TopKCheckpointManager,
    load_checkpoint,
    load_torch_nerf_checkpoint,
    restructure_like,
)
from sinnerf_tpu.train.optimizers import get_optimizer, lr_for_epoch, set_lr
from sinnerf_tpu.train.step import TrainConfig, TrainState, train_step
from sinnerf_tpu.utils.metrics import psnr as psnr_metric
from sinnerf_tpu.utils.visualization import visualize_depth


def build_render_settings(hparams: Any, white_back: bool) -> RenderSettings:
    return RenderSettings(
        n_samples=hparams.N_samples,
        n_importance=hparams.N_importance,
        use_disp=hparams.use_disp,
        perturb=hparams.perturb,
        noise_std=hparams.noise_std,
        white_back=white_back,
        compute_dtype=getattr(hparams, "compute_dtype", "float32"),
        mlp_impl=getattr(hparams, "mlp_impl", "xla"),
    )


class SinNeRFTrainer:
    def __init__(self, hparams: Any):
        self.hparams = hparams
        key = jax.random.key(getattr(hparams, "seed", 0))
        self.key, *init_keys = jax.random.split(key, 5)

        if hparams.dataset_name not in dataset_dict:
            # the reference ships default='blender' which is absent from its
            # own dataset_dict (opt.py:10 vs datasets/__init__.py) — keep the
            # flag-table parity but fail with a usable message, not KeyError
            raise ValueError(
                f"--dataset_name {hparams.dataset_name!r} is not a known "
                f"dataset; choose one of {sorted(dataset_dict)}"
            )
        ds_cls = dataset_dict[hparams.dataset_name]
        ds_kwargs = dict(vars(hparams))
        ds_kwargs["img_wh"] = tuple(hparams.img_wh)
        ds_kwargs["num_rays"] = getattr(hparams, "num_rays", 4096)
        root = ds_kwargs.pop("root_dir")
        self.train_dataset = ds_cls(root, split="train", **ds_kwargs)
        self.val_dataset = ds_cls(root, split="val", **ds_kwargs)

        self.render_settings = build_render_settings(
            hparams, self.train_dataset.white_back
        )
        self.cfg = TrainConfig(
            render=self.render_settings,
            dataset_name=hparams.dataset_name,
            loss_type=hparams.loss_type,
            patch_loss=hparams.patch_loss,
            dloss=hparams.dloss,
            depth_weight=hparams.depth_weight,
            vit_weight=hparams.vit_weight,
            dis_weight=hparams.dis_weight,
            proj_weight=hparams.proj_weight,
            depth_smooth_weight=hparams.depth_smooth_weight,
            depth_anneal=hparams.depth_anneal,
            load_depth=hparams.load_depth,
            imsize=hparams.patch_size,
        )

        # ---- data-parallel sizing (replaces DDP, train.py:51-52) ----------
        # DDP semantics: --batch_size is PER-RANK (each reference rank runs
        # its own DataLoader); the global batch is batch_size * num_gpus.
        # Sized before the model state because the per-item ViT feature cache
        # is shaped (global_batch, 384).
        n_chips = getattr(hparams, "num_gpus", 1)
        if n_chips > 1 and len(jax.devices()) < n_chips:
            print(
                f"[parallel] requested {n_chips} chips but only "
                f"{len(jax.devices())} present; running single-chip"
            )
            n_chips = 1
        self._n_chips = n_chips
        self.global_batch_size = hparams.batch_size * n_chips

        # ---- models -------------------------------------------------------
        params = {
            "coarse": init_nerf_params(init_keys[0]),
            "fine": init_nerf_params(init_keys[1]),
        }
        warm = None
        if hparams.pt_model:  # warm start (train.py:22-33)
            warm = self._load_any_checkpoint(hparams.pt_model)
            params.update(
                {k: warm[k] for k in ("coarse", "fine") if k in warm}
            )
        d_params, sn_state, opt_d_state = None, None, None
        self.opt_d = None
        if hparams.dis_weight > 0:
            d_params, sn_state = init_discriminator(
                init_keys[2], hparams.patch_size
            )
            if warm is not None and "d_params" in warm:
                # whole-system warm start includes D (train.py:31-33); keep
                # the fresh power-iteration state if the ckpt lacks one
                d_params = warm["d_params"]
                sn_state = warm.get("sn_state", sn_state)
            self.opt_d = get_optimizer(hparams, rate=0.2)  # sinnerf.py:208
            opt_d_state = self.opt_d.init(d_params)
        allow_random = getattr(hparams, "allow_random_pretrained", False)
        vit_params = None
        ref_feature = None
        ref_feature_valid = None
        if hparams.vit_weight > 0:
            vit_path = getattr(hparams, "vit_weights", None)
            if not vit_path and not allow_random:
                raise ValueError(
                    "--vit_weight > 0 requires --vit_weights <path to DINO "
                    "ViT-S/16 torch weights>: without them the semantic loss "
                    "compares against a RANDOM ViT and is pure noise. Pass "
                    "--allow_random_pretrained to override (tests only)."
                )
            vit_params = load_vit_params(vit_path, init_keys[3])
            # per-item CLS cache: the reference caches per DDP rank
            # (sinnerf.py:272-275); one row per global-batch item.
            ref_feature = jnp.zeros((self.global_batch_size, 384))
            # explicit cache-validity flag (False = refresh on first step);
            # an all-zeros sentinel would re-refresh forever on a genuinely
            # zero CLS row
            ref_feature_valid = jnp.zeros((self.global_batch_size,), bool)
        vgg_params = None
        if hparams.loss_type == "l2_vgg":
            # The reference crashes on this combination too: its random-ray
            # loss feeds flat (N, 3) bundles into VGG16LossDirect, whose
            # F.interpolate needs 4-D images (reference losses.py:129,
            # sinnerf.py:317).  Same treatment as the broken ft/clip choices.
            raise ValueError(
                "--loss_type l2_vgg is unsupported (as in the reference, "
                "where it crashes on ray bundles) — use --patch_loss l2_vgg "
                "for the perceptual term on image patches."
            )
        if hparams.loss_type == "l2_ssim":
            # Same failure class: the random-ray loss feeds flat (N, 3)
            # bundles into the window-11 SSIM, which needs 4-D images — the
            # reference crashes identically (losses.py:105 on ray bundles).
            raise ValueError(
                "--loss_type l2_ssim is unsupported (as in the reference, "
                "where it crashes on ray bundles) — use --patch_loss l2_ssim "
                "for the SSIM term on image patches."
            )
        if hparams.patch_loss == "l2_vgg":
            from sinnerf_tpu.models.vgg import load_vgg_params

            vgg_path = getattr(hparams, "vgg_weights", None)
            if not vgg_path and not allow_random:
                raise ValueError(
                    "--patch_loss l2_vgg requires --vgg_weights "
                    "<path to torchvision VGG16 weights>: without them the "
                    "perceptual loss uses a RANDOM VGG. Pass "
                    "--allow_random_pretrained to override (tests only)."
                )
            vgg_params = load_vgg_params(vgg_path, init_keys[3])

        self.opt_g = get_optimizer(hparams)
        self.state = TrainState(
            params=params,
            opt_g=self.opt_g.init(params),
            d_params=d_params,
            sn_state=sn_state,
            opt_d=opt_d_state,
            vit_params=vit_params,
            ref_feature=ref_feature,
            vgg_params=vgg_params,
            step=jnp.zeros((), jnp.int32),
            ref_feature_valid=ref_feature_valid,
        )
        self.start_epoch = 0
        if hparams.ckpt_path:  # full resume (train.py:46)
            self._resume(hparams.ckpt_path)

        self.mesh = None
        if self._n_chips > 1:
            from sinnerf_tpu.parallel.mesh import make_mesh, replicate

            self.mesh = make_mesh(self._n_chips)
            self.state = replicate(self.state, self.mesh)

        # ---- logging / checkpoints ---------------------------------------
        # multi-process CLI (SINNERF_COORDINATOR env, parallel/mesh.py):
        # rank 0 owns tensorboard + checkpoints (Lightning-DDP semantics);
        # per-batch image grids are single-process only (they are shards of
        # globally-sharded arrays, not addressable from one process)
        self._proc0 = jax.process_index() == 0
        self._single_proc = jax.process_count() == 1
        self.ckpt_manager = TopKCheckpointManager(
            os.path.join(hparams.ckpt_dir, hparams.exp_name),
            top_k=2,
            best=getattr(self, "_restored_ckpt_best", None),
        )
        self.writer = self._make_writer()

    # ------------------------------------------------------------------ io
    def _make_writer(self):
        if not self._proc0:
            return None
        try:
            from tensorboardX import SummaryWriter

            return SummaryWriter(
                os.path.join(self.hparams.log_dir, self.hparams.exp_name)
            )
        except Exception:
            return None

    def _load_any_checkpoint(self, path: str) -> Dict[str, Any]:
        """Accept either our orbax checkpoints or reference torch ckpts.

        Returns a dict with ``coarse``/``fine`` NeRF params and — when
        ``--nerf_only`` is absent, matching the reference's whole-system
        ``load_state_dict(..., strict=False)`` (train.py:31-33) — also
        ``d_params``/``sn_state`` if the checkpoint carries a discriminator.
        """
        nerf_only = getattr(self.hparams, "nerf_only", False)
        prefixes = tuple(
            getattr(self.hparams, "prefixes_to_ignore", None) or ()
        )

        def ignored(torch_name: str) -> bool:
            # same semantics as the torch path (extract_model_state_dict,
            # reference utils/__init__.py:60-83): drop by reference-side
            # module-name prefix ('nerf_coarse', 'nerf_fine', 'D')
            return any(torch_name.startswith(p) for p in prefixes)

        if os.path.isdir(path):
            tree = load_checkpoint(path)
            # our checkpoints nest the live TrainState under 'state'
            state = tree.get("state", tree)
            params = state.get("params", state)
            present = {k: params[k] for k in ("coarse", "fine") if k in params}
            if not present:
                raise KeyError(f"no NeRF weights found in {path}")
            out = {
                k: v
                for k, v in present.items()
                if not ignored({"coarse": "nerf_coarse", "fine": "nerf_fine"}[k])
            }
            if not nerf_only and not ignored("D"):
                for k in ("d_params", "sn_state"):
                    if state.get(k) is not None:
                        out[k] = state[k]
            return out
        return load_torch_nerf_checkpoint(
            path,
            nerf_only=nerf_only,
            prefixes_to_ignore=tuple(
                getattr(self.hparams, "prefixes_to_ignore", None) or ()
            ),
        )

    def _resume(self, path: str) -> None:
        tree = load_checkpoint(path)
        raw = tree["state"]
        # tolerate checkpoints written before a TrainState field existed, and
        # rebuild optax/namedtuple structure against the live fresh state — a
        # target-less orbax restore returns plain dicts/lists, which crash
        # set_lr/optax.update on the first resumed epoch
        def restore_field(f):
            if f not in raw:
                return getattr(self.state, f)
            try:
                return restructure_like(getattr(self.state, f), raw[f])
            except (ValueError, KeyError, TypeError):
                # optimizer-state layout changes across framework versions are
                # survivable: fall back to the fresh init (moment estimates
                # reset, params/schedule unaffected).  Anything else (params,
                # caches) genuinely mismatching must stay a hard error.
                if f in ("opt_g", "opt_d"):
                    print(
                        f"WARNING: checkpoint field {f!r} has an incompatible "
                        "optimizer-state structure; resuming with a fresh "
                        "optimizer state"
                    )
                    return getattr(self.state, f)
                raise

        fields = {f: restore_field(f) for f in TrainState._fields}
        fields = jax.tree_util.tree_map(jnp.asarray, fields)
        # migrate the pre-per-item ViT cache: (384,) -> (B, 384) (the cache
        # became one row per global-batch item for DDP-exact semantics)
        rf = fields.get("ref_feature")
        if rf is not None and rf.ndim == 1:
            fields["ref_feature"] = jnp.broadcast_to(
                rf[None], (self.global_batch_size, rf.shape[0])
            )
        # migrate pre-validity-flag checkpoints: recover the flag from the
        # old zeros sentinel (nonzero cached row == valid)
        if fields.get("ref_feature") is not None and "ref_feature_valid" not in raw:
            fields["ref_feature_valid"] = jnp.any(
                fields["ref_feature"] != 0, axis=1
            )
        self.state = TrainState(**fields)
        # _save(epoch, ...) runs AFTER epoch `epoch` finished (post-val), so
        # resume must continue at epoch+1 — resuming at `epoch` would replay
        # the completed epoch on top of its own post-epoch params (extra
        # optimizer steps + a one-epoch LR/log skew per restart)
        saved_epoch = tree.get("epoch", None)
        self.start_epoch = 0 if saved_epoch is None else int(saved_epoch) + 1
        # restore the top-k manager's (score, name) ranking so pruning
        # continues across the restart (Lightning parity, eval.py:132)
        self._restored_ckpt_best = tree.get("ckpt_best", None)

    def _save(self, epoch: int, val_psnr: float) -> None:
        if not self._proc0:
            return
        tree = {
            "state": dict(self.state._asdict()),
            "epoch": epoch,
            "val_psnr": val_psnr,
            "hparams": {
                k: v
                for k, v in vars(self.hparams).items()
                if isinstance(v, (int, float, str, bool, list, tuple))
            },
        }
        self.ckpt_manager.save(tree, epoch, val_psnr)

    # --------------------------------------------------------------- train
    def steps_per_epoch(self) -> int:
        """Global optimizer steps per epoch.

        DDP parity: pytorch-lightning 0.10 under ``distributed_backend='ddp'``
        (reference train.py:51-52) wraps the train DataLoader in a
        ``DistributedSampler``, so each of N ranks sees ~len/N items per
        epoch and one reference "epoch" is ceil(len / (batch_size*num_gpus))
        global steps — e.g. ceil(125/4)=32 at the published ``--num_gpus 4``.
        Dividing by the *global* batch reproduces that, keeping the
        ``--decay_step`` epoch boundaries on the same global step index.
        """
        return max(
            1, math.ceil(len(self.train_dataset) / self.global_batch_size)
        )

    def fit(self, max_epochs: Optional[int] = None) -> float:
        """Reference train.py enables a profiler on single-GPU runs
        (train.py:59); here --profile captures a jax.profiler trace of the
        whole fit into the log dir (view with TensorBoard's profile plugin)."""
        if getattr(self.hparams, "profile", False):
            from sinnerf_tpu.utils.profiling import trace

            with trace(
                os.path.join(self.hparams.log_dir, self.hparams.exp_name)
            ):
                return self._fit(max_epochs)
        return self._fit(max_epochs)

    def _fit(self, max_epochs: Optional[int] = None) -> float:
        hp = self.hparams
        max_epochs = max_epochs or hp.num_epochs
        best_psnr = -1.0

        # sanity val (train.py:54 num_sanity_val_steps=1)
        self.validate(self.start_epoch, max_batches=1, log=False)

        spe = self.steps_per_epoch()
        # host-side mirror of state.step: `int(self.state.step)` would force
        # a ~30ms axon round-trip EVERY step (20% of wall time at the soak
        # shape) just to decide whether to log
        host_step = int(self.state.step)
        for epoch in range(self.start_epoch, max_epochs):
            host_step = self._run_epoch(epoch, spe, host_step)

            if (epoch + 1) % hp.check_val_every_n_epoch == 0:
                val_psnr = self.validate(epoch)
                best_psnr = max(best_psnr, val_psnr)
                self._save(epoch, val_psnr)
        return best_psnr

    def _epoch_batches(self, epoch: int, spe: int):
        """Yield ``(i, batch, k_step)`` for the epoch's spe steps.

        With ``--prefetch_batches K > 1`` (default 8), K steps' sampling is
        dispatched as ONE device call (``sample_batches_prefetch``) and the
        per-step batch is a cheap leading-axis slice — the sampler's ~5.8 ms
        of per-op fixed overhead amortizes K-fold (DESIGN.md §9).  The PRNG
        chain advances exactly like the K=1 path (one 3-way split per step),
        and prefetch groups never cross an epoch boundary, so checkpoint-
        boundary key state and every per-step batch match the unprefetched
        loop — bit-identically except <=1-ulp rounding on the fresh-warp
        depth value (pinned by test_epoch_batches_prefetch_equivalent /
        test_sampler_prefetch_bit_identical).  The tail group (spe % K)
        compiles one extra sampler variant.
        """
        k_pref = max(1, int(getattr(self.hparams, "prefetch_batches", 1)))
        i = 0
        while i < spe:
            k = min(k_pref, spe - i)
            kb, ks = [], []
            for _ in range(k):
                self.key, k_batch, k_step = jax.random.split(self.key, 3)
                kb.append(k_batch)
                ks.append(k_step)
            if k == 1:
                batch = self.train_dataset.sample(
                    kb[0],
                    step=epoch * spe + i,
                    batch_size=self.global_batch_size,
                )
                yield i, batch, ks[0]
            else:
                batches = self.train_dataset.sample_many(
                    jnp.stack(kb),
                    epoch * spe + i + np.arange(k),
                    batch_size=self.global_batch_size,
                )
                for j in range(k):
                    batch = jax.tree_util.tree_map(
                        lambda x, j=j: x[j], batches
                    )
                    yield i + j, batch, ks[j]
            i += k

    def _run_epoch(self, epoch: int, spe: int, host_step: int) -> int:
        """One training epoch: per-epoch LR assert, spe sampled steps,
        every-10-step deferred logging.  Returns the updated host step."""
        hp = self.hparams
        lr = lr_for_epoch(hp, epoch)
        self.state = self.state._replace(opt_g=set_lr(self.state.opt_g, lr))
        if self.state.opt_d is not None:
            # Reference parity: get_scheduler binds ONLY to the G
            # optimizer (sinnerf.py:202-210, utils/__init__.py:34-52),
            # so under PL 0.10 the discriminator trains at a CONSTANT
            # 0.2x base lr for the whole run — the decay/warmup schedule
            # never touches it.  Re-assert the constant every epoch so a
            # resumed checkpoint written by an older (decaying) build
            # snaps back to the reference value.
            self.state = self.state._replace(
                opt_d=set_lr(self.state.opt_d, hp.lr, rate=0.2)
            )
        t0 = time.time()
        for i, batch, k_step in self._epoch_batches(epoch, spe):
            if self.mesh is not None:
                from sinnerf_tpu.parallel.mesh import shard_batch

                batch = shard_batch(batch, self.mesh)
            self.state, out = train_step(
                self.state,
                batch,
                k_step,
                jnp.asarray(epoch, jnp.float32),
                self.cfg,
                self.opt_g,
                self.opt_d,
            )
            host_step += 1
            step = host_step
            if step % 10 == 0 and self.writer:
                if not self._single_proc:
                    # image payloads are shards of globally-sharded batch
                    # arrays — not addressable from one process; log the
                    # (replicated) scalars only
                    out = {"metrics": out["metrics"], "images": None}
                # deferred logging: a blocking device_get here stalls the
                # dispatch pipeline a full ~30ms tunnel RTT every 10 steps
                # (~3ms/step amortized).  Instead start an async host copy
                # now and materialize it at the NEXT log step, after 10
                # newer steps are already queued — the RTT overlaps device
                # work.  Payload is one batch, RTT >> transfer time.
                for leaf in jax.tree_util.tree_leaves(out):
                    leaf.copy_to_host_async()
                self._flush_pending_log()
                self._pending_log = (out, step, lr)
        self._flush_pending_log()
        dt = time.time() - t0
        if self.writer:
            self.writer.add_scalar("train/epoch_time", dt, epoch)
        return host_step

    def _flush_pending_log(self):
        """Materialize + write the previous log payload (started with
        copy_to_host_async); the tensorboard step recorded is the step the
        payload came from, so the deferral never skews the curves."""
        if getattr(self, "_pending_log", None) is None:
            return
        out, step, lr = self._pending_log
        self._pending_log = None
        host_out = jax.device_get(out)
        self._log_scalars(host_out["metrics"], step, lr)
        if host_out.get("images") is not None:
            self._log_images(host_out["images"], step)

    def _log_scalars(self, metrics: Dict[str, Any], step: int, lr: float):
        if not self.writer:
            return
        self.writer.add_scalar("lr", lr, step)
        for k, v in metrics.items():
            self.writer.add_scalar(k, float(v), step)

    def _log_images(self, images: Dict[str, Any], step: int):
        """Tag-for-tag parity with sinnerf.py:413-444: 'train/images' is
        [real, coarse, fine]; 'train/images_side' is the white-filled warp
        patch + coarse/fine renders + 3 jet depth maps."""
        if not self.writer:
            return
        stack = np.stack(
            [
                np.asarray(images["real_patch"][0]),
                np.asarray(images["rgb_coarse_full"][0]),
                np.asarray(images["rgb_fine_full"][0]),
            ]
        )
        self.writer.add_images("train/images", np.clip(stack, 0, 1), step)
        side = np.stack(
            [
                np.asarray(images["side_rgb"][0]),
                np.asarray(images["rgb_coarse_side"][0]),
                np.asarray(images["rgb_fine_side"][0]),
                visualize_depth(np.asarray(images["depth_coarse_side"][0])),
                visualize_depth(np.asarray(images["depth_fine_side"][0])),
                visualize_depth(np.asarray(images["warp_depth"][0])),
            ]
        )
        self.writer.add_images("train/images_side", np.clip(side, 0, 1), step)

    # ----------------------------------------------------------------- val
    def validate(
        self, epoch: int, max_batches: Optional[int] = None, log: bool = True
    ) -> float:
        hp = self.hparams
        w, h = hp.img_wh
        psnrs = []
        n = self.val_dataset.val_len()
        if max_batches is not None:
            n = min(n, max_batches)
        # static tile: one compile across heterogeneous val image sizes
        tile = pick_val_tile(w * h, hp.chunk, self._n_chips)
        for i in range(n):
            item = self.val_dataset.val_item(i)
            rays = jnp.asarray(item["rays"])
            if self.mesh is not None:
                # mesh-sharded image render (rays split over the data axis)
                results = render_chunked_sharded(
                    self.state.params, rays, self.render_settings,
                    self.mesh, tile=tile,
                )
            else:
                results = render_chunked(
                    self.state.params, rays, self.render_settings, tile=tile
                )
            if "rgbs" in item:
                # device scalar, fetched in one batch after the loop: a
                # per-image float() would block render i before dispatching
                # render i+1 (30ms tunnel RTT each, plus lost host/device
                # overlap of the next item's ray build + upload)
                psnrs.append(
                    psnr_metric(results["rgb_fine"], jnp.asarray(item["rgbs"]))
                )
            if (
                log and self.writer and self._single_proc
                and i % 5 == 0 and "rgbs" in item
            ):
                img = np.asarray(results["rgb_fine"]).reshape(h, w, 3)
                gt = np.asarray(item["rgbs"]).reshape(h, w, 3)
                depth = visualize_depth(
                    np.asarray(results["depth_fine"]).reshape(h, w)
                )
                stack = np.stack(
                    [gt.transpose(2, 0, 1), img.transpose(2, 0, 1), depth]
                )
                self.writer.add_images(
                    "val/GT_pred_depth", np.clip(stack, 0, 1), int(self.state.step)
                )
        mean_psnr = float(np.mean(jax.device_get(psnrs))) if psnrs else 0.0
        if log and self.writer:
            self.writer.add_scalar("val/psnr", mean_psnr, epoch)
        return mean_psnr
