"""Per-round quality-trend regression: fixed-budget efficacy run.

Throughput benchmarks can't see silent quality regressions (a wrong loss
weight, a broken gradient path, a norm-semantics change all keep img/s
flat). This harness re-runs the stick-figure learning proof under a FIXED
budget and compares the held-out SSIM/PSNR/L1 trajectory against the
committed round-3 curve (docs/learning/eval_log_scratch.txt — the 8000-iter
from-scratch run whose SSIM went 0.25 -> 0.90).

One command, ~15-25 min on the TPU chip at the default 3000 iters:

  python scripts/quality_trend.py --tag r4           # train + compare
  python scripts/quality_trend.py --tag r4 --iters 1500   # quicker gate

Outputs:
  * docs/learning/trend_{tag}.txt  — this run's eval_log (commit it)
  * ONE JSON line on stdout: {"iters": N, "ssim": ..., "baseline_ssim":
    ..., "pass": true/false, ...}

Pass criterion: the mean of the last `--window` held-out eval points must
be within --tol_ssim / --tol_psnr of the baseline curve's mean over the
SAME iteration window (the baseline has eval points every 100-200 iters).
The synthetic dataset is regenerated deterministically (seed 0), so runs
are comparable across rounds up to TPU numerics and data-order noise —
tolerances default loose enough for that, tight enough to catch a dead
loss term (measured: zeroing lambda_correct moves 3000-iter SSIM by ~0.1).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(REPO, "docs", "learning", "eval_log_scratch.txt")
_LINE = re.compile(
    r"iters:\s*(\d+)\)\s*ssim:\s*([\d.]+)\s*psnr:\s*([\d.]+)\s*l1:\s*([\d.]+)"
)


def parse_eval_log(path):
    """-> list of (iters, ssim, psnr, l1)."""
    rows = []
    with open(path) as f:
        for line in f:
            m = _LINE.search(line)
            if m:
                rows.append((int(m.group(1)), float(m.group(2)),
                             float(m.group(3)), float(m.group(4))))
    return rows


def window_mean(rows, lo, hi):
    sel = [r for r in rows if lo <= r[0] <= hi]
    if not sel:
        return None
    n = len(sel)
    return tuple(sum(r[k] for r in sel) / n for k in (1, 2, 3))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="dev", help="round tag for the output")
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--window", type=int, default=500,
                    help="final iteration window averaged for the gate")
    ap.add_argument("--eval_freq", type=int, default=100)
    ap.add_argument("--dataroot", default="/tmp/stickfigure_trend")
    ap.add_argument("--checkpoints_dir", default="/tmp/gfla_trend")
    ap.add_argument("--baseline", default=BASELINE)
    ap.add_argument("--tol_ssim", type=float, default=0.06)
    ap.add_argument("--tol_psnr", type=float, default=1.5)
    ap.add_argument("--skip_train", action="store_true",
                    help="only re-compare an existing run")
    args = ap.parse_args()

    name = f"trend_{args.tag}"
    run_dir = os.path.join(args.checkpoints_dir, name)

    if not args.skip_train:
        if not os.path.exists(os.path.join(args.dataroot, "train")):
            subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "scripts", "make_stickfigure_dataset.py"),
                 "--root", args.dataroot, "--identities", "40",
                 "--poses", "10", "--pairs", "2400", "--seed", "0"],
                check=True,
            )
        shutil.rmtree(run_dir, ignore_errors=True)
        subprocess.run(
            [sys.executable, os.path.join(REPO, "train.py"),
             "--name", name, "--model", "pose", "--dataset_mode", "fashion",
             "--dataroot", args.dataroot, "--batchSize", "8",
             "--compute_dtype", "bfloat16", "--seed", "0",
             "--max_iters", str(args.iters),
             "--eval_iters_freq", str(args.eval_freq),
             "--save_iters_freq", str(10 * args.iters),
             "--print_freq", "500",
             "--checkpoints_dir", args.checkpoints_dir],
            check=True, cwd=REPO,
        )

    log_path = os.path.join(run_dir, "eval_log.txt")
    if not os.path.exists(log_path):
        print(json.dumps({
            "pass": False,
            "error": f"no eval log at {log_path} (did the run with "
                     f"--tag {args.tag} happen? --skip_train only "
                     "re-compares an existing run)",
        }))
        return 1
    rows = parse_eval_log(log_path)
    if not rows:
        print(json.dumps({"pass": False, "error": "no eval rows"}))
        return 1
    lo, hi = args.iters - args.window, args.iters
    got = window_mean(rows, lo, hi)
    base_rows = parse_eval_log(args.baseline)
    base = window_mean(base_rows, lo, hi)

    out_txt = os.path.join(REPO, "docs", "learning",
                           f"trend_{args.tag}.txt")
    shutil.copyfile(os.path.join(run_dir, "eval_log.txt"), out_txt)

    if base is None:
        # Baseline has no rows in the compared window — the gate CANNOT
        # judge this run (truncated/mismatched baseline must not read as
        # a pass). Distinct status + nonzero exit; the trend curve is
        # still recorded for the next round.
        print(json.dumps({
            "iters": args.iters,
            "ssim": round(got[0], 4), "psnr": round(got[1], 3),
            "l1": round(got[2], 4),
            "status": "no-baseline",
            "pass": False,
            "error": f"baseline {os.path.relpath(args.baseline, REPO)} has "
                     f"no eval rows in window [{lo}, {hi}]",
            "log": os.path.relpath(out_txt, REPO),
        }))
        return 3
    ok = (got[0] >= base[0] - args.tol_ssim
          and got[1] >= base[1] - args.tol_psnr)
    print(json.dumps({
        "iters": args.iters,
        "ssim": round(got[0], 4), "psnr": round(got[1], 3),
        "l1": round(got[2], 4),
        "baseline_ssim": round(base[0], 4),
        "baseline_psnr": round(base[1], 3),
        "pass": bool(ok),
        "log": os.path.relpath(out_txt, REPO),
    }))
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
