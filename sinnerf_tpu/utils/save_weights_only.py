"""Strip a full training checkpoint down to model weights only.

Parity: ``utils/save_weights_only.py`` of the reference (drops the Lightning
wrapper / optimizer state so the ckpt is small and loadable by eval).

Usage:
    python -m sinnerf_tpu.utils.save_weights_only <ckpt_dir> <out_dir>
"""

from __future__ import annotations

import sys

from sinnerf_tpu.train.checkpoints import load_checkpoint, save_checkpoint


def save_weights_only(ckpt_path: str, out_path: str) -> str:
    tree = load_checkpoint(ckpt_path)
    state = tree.get("state", tree)
    weights = {"params": state["params"]}
    if state.get("d_params") is not None:
        weights["d_params"] = state["d_params"]
    import os

    out_dir, name = os.path.split(os.path.abspath(out_path))
    return save_checkpoint(out_dir or ".", name, weights)


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    print(save_weights_only(sys.argv[1], sys.argv[2]))
