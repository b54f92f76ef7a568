"""Offline metrics tooling (L8): FID / LPIPS / reconstruction metrics."""

from gfla_tpu.metrics.fid import FID, calculate_frechet_distance
from gfla_tpu.metrics.lpips import LPIPS
from gfla_tpu.metrics.reconstruction import (
    ReconstructionMetrics,
    compare_l1,
    compare_mae,
    compare_psnr,
    compare_ssim,
    get_image_list,
)

__all__ = [
    "FID",
    "LPIPS",
    "ReconstructionMetrics",
    "calculate_frechet_distance",
    "compare_l1",
    "compare_mae",
    "compare_psnr",
    "compare_ssim",
    "get_image_list",
    "preprocess_path_for_deform_task",
]


def preprocess_path_for_deform_task(gt_path: str, distorted_path: str):
    """Pair generated files back to GT via the `{src}_2_{tgt}_vis` naming
    contract (reference script/metrics.py:414-439)."""
    import os

    distorted_image_list = sorted(get_image_list(distorted_path))
    gt_list, distorted_list = [], []
    for distorted_image in distorted_image_list:
        image = os.path.basename(distorted_image)
        image = image.split("_2_")[-1]
        image = image.split("_vis")[0] + ".jpg"
        gt_image = os.path.join(gt_path, image)
        if not os.path.isfile(gt_image):
            print(f"missing GT: {gt_image}")
            continue
        gt_list.append(gt_image)
        distorted_list.append(distorted_image)
    return gt_list, distorted_list
