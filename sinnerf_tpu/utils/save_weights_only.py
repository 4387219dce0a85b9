"""Strip a full training checkpoint down to model weights only.

Parity: ``utils/save_weights_only.py`` of the reference (drops the Lightning
wrapper / optimizer state so the ckpt is small and loadable by eval).

With ``--torch`` the output is a reference-consumable PyTorch checkpoint
instead — ``{'state_dict':
{'nerf_coarse.*', 'nerf_fine.*', 'D.*'}}`` — so the reference's ``eval.py``
/ ``--pt_model`` warm start (reference eval.py:131-145,
utils/__init__.py:60-83) can consume training output from this framework.

Usage:
    python -m sinnerf_tpu.utils.save_weights_only <ckpt_dir> <out_dir>
    python -m sinnerf_tpu.utils.save_weights_only <ckpt_dir> <out.ckpt> --torch
"""

from __future__ import annotations

import argparse
import os

from sinnerf_tpu.train.checkpoints import (
    export_torch_checkpoint,
    load_checkpoint,
    save_checkpoint,
)


def save_weights_only(ckpt_path: str, out_path: str) -> str:
    tree = load_checkpoint(ckpt_path)
    state = tree.get("state", tree)
    weights = {"params": state["params"]}
    if state.get("d_params") is not None:
        weights["d_params"] = state["d_params"]
        # spectral-norm u/sigma are model buffers (torch keeps them in the
        # state_dict a weights-only ckpt retains); without them the D.*
        # weight_orig/u/v keys cannot be reconstructed on a later --torch
        # export (export_torch_checkpoint warns and skips D otherwise)
        if state.get("sn_state") is not None:
            weights["sn_state"] = state["sn_state"]

    out_dir, name = os.path.split(os.path.abspath(out_path))
    return save_checkpoint(out_dir or ".", name, weights)


def main(argv=None) -> str:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt_path")
    ap.add_argument("out_path")
    ap.add_argument(
        "--torch",
        action="store_true",
        help="write a PyTorch .ckpt consumable by the reference ecosystem",
    )
    ap.add_argument(
        "--imsize",
        type=int,
        default=None,
        help="discriminator imsize (torch Sequential slot numbering); "
        "defaults to the checkpoint's saved patch_size",
    )
    args = ap.parse_args(argv)
    # explicit --torch only, no extension sniffing: .ckpt is also a natural
    # name for an orbax output dir, and silently switching formats on the
    # same argv (plus a new ImportError on torch-less machines) breaks the
    # CLI's contract
    if args.torch:
        return export_torch_checkpoint(
            args.ckpt_path, args.out_path, imsize=args.imsize
        )
    return save_weights_only(args.ckpt_path, args.out_path)


if __name__ == "__main__":
    print(main())
