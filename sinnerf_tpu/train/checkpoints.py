"""Checkpointing: orbax for native checkpoints + PyTorch ckpt interop.

Parity targets:
* ``ModelCheckpoint(monitor='val/psnr', mode='max', save_top_k=2,
  save_last=True)`` — ``train.py:34-35``
* warm start ``--pt_model`` with ``--nerf_only`` filtering — ``train.py:22-33``
* prefix-filtered partial load ``load_ckpt`` — ``utils/__init__.py:60-83``
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np

from sinnerf_tpu.models.nerf import import_torch_state


def _checkpointer():
    import orbax.checkpoint as ocp

    rank = os.environ.get("SINNERF_PROCESS_ID")
    if (
        rank is not None
        and os.environ.get("SINNERF_COORDINATOR")
        and jax.distributed.is_initialized()
    ):
        # Multi-process launch (parallel/mesh.py env contract).  A default
        # Checkpointer barriers save/restore across ALL processes via
        # multihost.sync_global_processes — but checkpointing here is
        # rank-0-gated (Lightning-DDP semantics, train/loop.py), so rank 0
        # would block at Checkpointer:save_start until the coordination
        # service's barrier timeout kills the whole job (observed as the
        # two-process CLI smoke's 40-min shutdown-barrier cascade).  Trees
        # are host-numpy (replicated), so every barrier can be scoped to
        # the calling process: saves are rank-0-only by construction,
        # restores are per-process local reads of the same files.  Gated on
        # is_initialized() (a pure global_state check, no backend init — the
        # axon tunnel hangs a second process) and NOT the env alone: in a
        # process that merely inherited the env trio without calling
        # jax.distributed.initialize (e.g. save_weights_only run from a
        # worker host's shell), orbax sees process_index()==0 != primary_host
        # and silently never finalizes the save.
        from orbax.checkpoint import options as options_lib

        me = int(rank)
        mp = options_lib.MultiprocessingOptions(
            primary_host=me,
            active_processes={me},
            barrier_sync_key_prefix=f"proc{me}",
        )
        return ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(multiprocessing_options=mp),
            multiprocessing_options=mp,
        )
    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, name: str, tree: Dict[str, Any]) -> str:
    """Save a pytree checkpoint under ckpt_dir/name (overwrites)."""
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    # jax arrays -> host numpy for a portable checkpoint
    host_tree = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree
    )
    cp = _checkpointer()
    cp.save(path, host_tree, force=True)
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    cp = _checkpointer()
    return cp.restore(os.path.abspath(path))


def restructure_like(template, restored):
    """Rebuild a target-less orbax restore into ``template``'s structure.

    ``PyTreeCheckpointer.restore`` without a target returns plain containers:
    namedtuples come back as dicts keyed by field name, tuples as lists, and
    empty nodes (e.g. ``optax.EmptyState``) as ``None``.  Optimizer states
    restored that way crash ``set_lr``/``optax.update`` (which expect the
    typed namedtuples), so resumed training needs the live, freshly
    ``init``-ed state as the structural template.  Leaves are taken from
    ``restored`` unchanged (shape migration stays the caller's job); where
    ``template`` is ``None`` the raw restore is returned best-effort.
    """
    if template is None:
        return restored
    if restored is None:
        # a field the checkpoint lacks entirely (e.g. resuming with
        # --dis_weight > 0 from a GAN-less run): keep the live fresh init
        # rather than crashing on None[...]; covers EmptyState too (orbax
        # restores empty namedtuples as None)
        return template if hasattr(template, "_fields") or isinstance(
            template, (tuple, list, dict)
        ) else None
    if hasattr(template, "_fields"):  # namedtuple (optax states, TrainState)
        vals = [
            restructure_like(getattr(template, f), restored[f])
            for f in template._fields
        ]
        return type(template)(*vals)
    if isinstance(template, (tuple, list)):
        if len(restored) != len(template):
            # migration: get_optimizer once built inject_hyperparams(optax.adam)
            # (inner state = adam's own 2-tuple); it now wraps every optimizer
            # in a chain-of-one (inner state = 1-tuple holding that 2-tuple).
            # Unwrap the new layer so pre-change checkpoints (e.g. the round-2
            # hardware soaks) resume with their moment estimates intact.
            if (
                len(template) == 1
                and isinstance(template[0], (tuple, list))
                and len(template[0]) == len(restored)
            ):
                return type(template)([restructure_like(template[0], restored)])
            raise ValueError(
                f"checkpoint structure mismatch: {len(restored)} entries "
                f"restored for a {len(template)}-entry {type(template).__name__}"
            )
        seq = [restructure_like(t, r) for t, r in zip(template, restored)]
        return type(template)(seq)
    if isinstance(template, dict):
        return {
            k: restructure_like(v, restored[k]) for k, v in template.items()
        }
    return restored  # leaf


class TopKCheckpointManager:
    """Keep the best-k checkpoints by val/psnr plus a rolling 'last'
    (train.py:34-35 semantics).

    The (score, name) ranking is embedded in every saved tree under
    ``ckpt_best`` and restored on ``--ckpt_path`` resume, like Lightning
    checkpoints carrying the ModelCheckpoint callback's best scores
    (reference eval.py:132) — without it, pruning would restart empty after
    a resume and stale best-k dirs would stop being tracked."""

    def __init__(self, ckpt_dir: str, top_k: int = 2, best=None):
        self.ckpt_dir = ckpt_dir
        self.top_k = top_k
        os.makedirs(ckpt_dir, exist_ok=True)
        # drop restored entries whose directory no longer exists on disk
        self.best: list[tuple[float, str]] = [
            (float(p), str(n))
            for p, n in (best or [])
            if os.path.isdir(os.path.join(ckpt_dir, str(n)))
        ]
        self.best.sort(key=lambda t: -t[0])

    def save(self, tree: Dict[str, Any], epoch: int, val_psnr: float) -> None:
        name = f"epoch_{epoch}_psnr_{val_psnr:.2f}"
        # a NaN score must never enter the ranking: comparisons against NaN
        # are all False, so one diverged validation would permanently block
        # every later genuine best-k save (and persist across resumes)
        finite = np.isfinite(val_psnr)
        keep = finite and (
            len(self.best) < self.top_k or val_psnr > self.best[-1][0]
        )
        dropped = []
        if keep:
            self.best.append((val_psnr, name))
            self.best.sort(key=lambda t: -t[0])
            while len(self.best) > self.top_k:
                dropped.append(self.best.pop()[1])
        tree = dict(tree)
        tree["ckpt_best"] = [[float(p), n] for p, n in self.best]
        save_checkpoint(self.ckpt_dir, "last", tree)
        if keep:
            save_checkpoint(self.ckpt_dir, name, tree)
            for drop in dropped:
                drop_path = os.path.join(self.ckpt_dir, drop)
                if os.path.isdir(drop_path):
                    import shutil

                    shutil.rmtree(drop_path, ignore_errors=True)


# ---------------------------------------------------------------------------
# PyTorch checkpoint interop
# ---------------------------------------------------------------------------

def load_torch_nerf_checkpoint(
    path: str, nerf_only: bool = True, prefixes_to_ignore=()
) -> Dict[str, Any]:
    """Load a reference (pytorch-lightning) checkpoint and extract the
    coarse/fine NeRF weights — plus, when ``nerf_only`` is False, the
    discriminator (params + spectral-norm state) under ``d_params`` /
    ``sn_state`` — as our param pytrees.

    Mirrors ``extract_model_state_dict``/``load_ckpt``
    (utils/__init__.py:60-83), the ``--nerf_only`` filter (train.py:24-30),
    and the whole-system ``load_state_dict(..., strict=False)`` branch
    (train.py:31-33).  ``prefixes_to_ignore`` drops state-dict keys by
    prefix like ``extract_model_state_dict`` does (the reference declares
    the flag in opt.py:42 but never routes it from train.py; we honor it
    in this, the analogous partial-load path).
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    if prefixes_to_ignore:
        state = {
            k: v
            for k, v in state.items()
            if not any(k.startswith(p) for p in prefixes_to_ignore)
        }
    out: Dict[str, Any] = {}
    for name, prefix in (("coarse", "nerf_coarse."), ("fine", "nerf_fine.")):
        try:
            out[name] = import_torch_state(state, model_prefix=prefix)
        except KeyError:
            pass
    if not out:
        # eval.py loads bare-NeRF ckpts with load_ckpt(model_name='nerf_coarse')
        # where keys may carry a 'model.' wrapper; try common wrappings.
        for wrapper in ("model.", "module."):
            for name, prefix in (("coarse", "nerf_coarse."), ("fine", "nerf_fine.")):
                try:
                    out[name] = import_torch_state(state, model_prefix=wrapper + prefix)
                except KeyError:
                    pass
            if out:
                break
    if not out:
        raise KeyError(f"no NeRF weights found in {path}")
    if not nerf_only:
        # whole-system load (train.py:31-33): also pick up the discriminator
        # if the checkpoint carries one (keys 'D.main.<i>.weight_orig', ...)
        from sinnerf_tpu.models.discriminator import (
            import_torch_discriminator_state,
        )

        for d_prefix in ("D.", "model.D.", "module.D."):
            try:
                d_params, sn_state = import_torch_discriminator_state(
                    state, prefix=d_prefix
                )
                out["d_params"], out["sn_state"] = d_params, sn_state
                break
            except KeyError:
                pass
    return out


def export_torch_checkpoint(
    ckpt_path: str, out_path: str, imsize: int = None
) -> str:
    """Write one of this framework's orbax checkpoints as a reference-
    consumable PyTorch ``.ckpt``.

    Reverse interop for ``load_ckpt``/``extract_model_state_dict``
    (reference utils/__init__.py:60-83) and ``eval.py:131-145``: the blob is
    ``{'state_dict': {'nerf_coarse.*', 'nerf_fine.*'}}`` (+ ``'D.*'``
    spectral-norm keys when the checkpoint carries a discriminator), so the
    reference ecosystem can evaluate / warm-start from checkpoints trained
    here.  ``imsize`` selects the discriminator's nn.Sequential slot
    numbering; defaults to the checkpoint's saved ``hparams['patch_size']``
    (the trainer builds D with imsize=patch_size, sinnerf.py:143-145).
    """
    import torch

    from sinnerf_tpu.models.discriminator import (
        export_torch_discriminator_state,
    )
    from sinnerf_tpu.models.nerf import export_torch_state

    tree = load_checkpoint(ckpt_path)
    state = tree.get("state", tree)
    params = state["params"]
    sd: Dict[str, Any] = {}
    for name, prefix in (("coarse", "nerf_coarse."), ("fine", "nerf_fine.")):
        if name in params:
            sd.update(export_torch_state(params[name], model_prefix=prefix))
    if not sd:
        raise KeyError(f"no NeRF params found in {ckpt_path}")
    if state.get("d_params") is not None and state.get("sn_state") is None:
        # save_weights_only() keeps d_params but drops sn_state; without the
        # spectral-norm u/sigma the reference's D.* keys (weight_orig/u/v)
        # cannot be reconstructed — exporting silently NeRF-only would lose
        # a trained discriminator on a --pt_model whole-system warm start.
        import warnings

        warnings.warn(
            f"{ckpt_path}: d_params present but sn_state missing (weights-"
            "only checkpoint?) — exporting WITHOUT discriminator D.* keys",
            stacklevel=2,
        )
    if state.get("d_params") is not None and state.get("sn_state") is not None:
        if imsize is None:
            imsize = int(
                tree.get("hparams", {}).get("patch_size", 64) or 64
            )
        sd.update(
            export_torch_discriminator_state(
                state["d_params"], state["sn_state"], imsize=imsize,
                prefix="D.",
            )
        )
    blob = {
        "state_dict": {
            k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()
        },
        "epoch": int(tree.get("epoch", 0)),
    }
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    torch.save(blob, out_path)
    return out_path
