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
        ea = EventAccumulator(files[-1])
        ea.Reload()
        tags = ea.Tags()["scalars"]
        name = os.path.basename(exp)
        if "val/psnr" not in tags:
            print(f"{name}: no val/psnr yet ({len(tags)} tags)")
            continue
        scalars = ea.Scalars("val/psnr")
        recent = ", ".join(
            f"ep{e.step}={e.value:.2f}" for e in scalars[-args.last :]
        )
        best = max(e.value for e in scalars)
        print(f"{name}: best {best:.2f} dB | {recent}")


if __name__ == "__main__":
    main()
