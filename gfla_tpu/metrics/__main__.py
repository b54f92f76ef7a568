"""Metrics CLI — `python -m gfla_tpu.metrics --gt_path ... --distorated_path
... --fid_real_path ... --name exp` (CLI-compatible with the reference
`python -m script.metrics`, script/metrics.py:619-674). Writes
./eval_results/{name}.csv.
"""

from __future__ import annotations

import argparse
import os

import pandas as pd

from gfla_tpu.runtime import setup_runtime

from gfla_tpu.metrics import (
    FID,
    LPIPS,
    ReconstructionMetrics,
    preprocess_path_for_deform_task,
)


def main():
    parser = argparse.ArgumentParser(
        description="compute FID / reconstruction / LPIPS metrics"
    )
    parser.add_argument("--gt_path", type=str)
    parser.add_argument("--distorated_path", type=str)
    parser.add_argument("--fid_real_path", type=str)
    parser.add_argument("--name", type=str, default="exp")
    parser.add_argument("--calculate_mask", action="store_true")
    parser.add_argument("--out_dir", type=str, default="./eval_results")
    parser.add_argument(
        "--allow_fallback_weights", action="store_true",
        help="proceed without inception/lpips assets (random feature nets); "
             "all outputs are stamped FALLBACK-WEIGHTS and are NOT "
             "comparable to published numbers",
    )
    args = parser.parse_args()
    for arg in vars(args):
        print(f"[{arg}] = {getattr(args, arg)}")

    # honor JAX_PLATFORMS / GFLA_PLATFORM + enable the compile cache (the
    # axon TPU plugin ignores the env var; without this the CLI grabs the
    # TPU even when the caller forced CPU)
    setup_runtime()

    fid = FID(allow_fallback=args.allow_fallback_weights)
    rec = ReconstructionMetrics()
    lpips = LPIPS(allow_fallback=args.allow_fallback_weights)
    fallback = fid.fallback or lpips.fallback
    if fallback:
        print("=" * 70)
        print("WARNING: FALLBACK-WEIGHTS — FID/LPIPS below use random "
              "feature nets.\nThey are NOT comparable to published numbers.")
        print("=" * 70)

    print("calculate fid metric...")
    fid_score = fid.calculate_from_disk(args.distorated_path,
                                        args.fid_real_path)
    gt_list, distorted_list = preprocess_path_for_deform_task(
        args.gt_path, args.distorated_path
    )
    print("calculate reconstruction metric...")
    rec_dic = rec.calculate_from_disk(
        distorted_list, gt_list, save_path=args.distorated_path, sort=False
    )
    print("calculate LPIPS...")
    lpips_score = lpips.calculate_from_disk(distorted_list, gt_list,
                                            sort=False)

    dic = {"name": [args.name]}
    dic.update(rec_dic)
    dic["fid"] = [fid_score]
    dic["lpips"] = [lpips_score]
    if fallback:
        dic["FALLBACK_WEIGHTS"] = [True]
    if args.calculate_mask:
        from gfla_tpu.data.pose_utils import produce_ma_mask  # noqa: F401
        print("mask-LPIPS requires pose CSVs; see gfla_tpu.metrics.lpips "
              "masked API")

    os.makedirs(args.out_dir, exist_ok=True)
    stem = args.name + ("_FALLBACK-WEIGHTS" if fallback else "")
    pd.DataFrame(dic).to_csv(
        os.path.join(args.out_dir, stem + ".csv"), index=True
    )
    print(f"wrote {os.path.join(args.out_dir, stem + '.csv')}")


if __name__ == "__main__":
    main()
