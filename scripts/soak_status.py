"""Print val/psnr progress for running/finished soaks.

Reads the tensorboard event files under the soak log dir (default
/tmp/soak_log) directly — no TPU contact, safe to run while a soak holds
the axon tunnel (a second TPU process would hang, CLAUDE.md).

    python scripts/soak_status.py [--log_dir /tmp/soak_log] [--last N]
"""

import argparse
import glob
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log_dir", default="/tmp/soak_log")
    ap.add_argument("--last", type=int, default=4)
    args = ap.parse_args()

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    exps = sorted(
        d
        for d in glob.glob(os.path.join(args.log_dir, "*"))
        if os.path.isdir(d)
    )
    if not exps:
        print(f"no experiments under {args.log_dir}")
        return
    for exp in exps:
        files = sorted(glob.glob(os.path.join(exp, "**/events*"), recursive=True))
        if not files:
            continue
        # soak.sh retries train legs on tunnel flakes, and every restart opens
        # a NEW event file in the same dir — accumulate across ALL of them so
        # pre-resume history (and the true best) isn't dropped.
        scalars, n_tags = [], 0
        for f in files:
            ea = EventAccumulator(f)
            ea.Reload()
            tags = ea.Tags()["scalars"]
            n_tags = max(n_tags, len(tags))
            if "val/psnr" in tags:
                scalars.extend(ea.Scalars("val/psnr"))
        name = os.path.basename(exp)
        if not scalars:
            print(f"{name}: no val/psnr yet ({n_tags} tags)")
            continue
        scalars.sort(key=lambda e: e.step)
        recent = ", ".join(
            f"ep{e.step}={e.value:.2f}" for e in scalars[-args.last :]
        )
        best = max(e.value for e in scalars)
        print(f"{name}: best {best:.2f} dB | {recent}")


if __name__ == "__main__":
    main()
