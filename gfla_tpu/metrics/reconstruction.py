"""Reconstruction metrics: SSIM / ssim_256 / PSNR / L1 / MAE.

Capability parity with reference script/metrics.py:253-382 (skimage-based
compare_ssim/compare_psnr): SSIM with uniform 51×51 window (default), the
Gaussian-weighted ssim_256 variant (σ=1.5, population covariance), PSNR,
and the two pixel-error variants. numpy/scipy implementation (skimage is
not in this image); identical math to skimage.metrics.structural_similarity.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import numpy as np
from scipy.ndimage import uniform_filter, gaussian_filter

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def _ssim_channel(x, y, data_range, win_size=51, gaussian_weights=False,
                  sigma=1.5, use_sample_covariance=True):
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    if gaussian_weights:
        # skimage truncates at 3.5σ
        filt = lambda im: gaussian_filter(im, sigma, truncate=3.5)
        r = int(3.5 * sigma + 0.5)
        npts = (2 * r + 1) ** 2
    else:
        filt = lambda im: uniform_filter(im, win_size)
        npts = win_size**2
    cov_norm = npts / (npts - 1) if use_sample_covariance else 1.0

    ux, uy = filt(x), filt(y)
    uxx, uyy, uxy = filt(x * x), filt(y * y), filt(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    num = (2 * ux * uy + C1) * (2 * vxy + C2)
    den = (ux**2 + uy**2 + C1) * (vx + vy + C2)
    s = num / den

    # crop the filter's edge effects, as skimage does
    pad = (win_size - 1) // 2 if not gaussian_weights else int(3.5 * sigma + 0.5)
    if pad > 0 and s.shape[0] > 2 * pad and s.shape[1] > 2 * pad:
        s = s[pad:-pad, pad:-pad]
    return s.mean()


def compare_ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0,
                 win_size: int = 51, multichannel: bool = True,
                 gaussian_weights: bool = False, sigma: float = 1.5,
                 use_sample_covariance: bool = True) -> float:
    if multichannel and a.ndim == 3:
        return float(np.mean([
            _ssim_channel(a[..., c], b[..., c], data_range, win_size,
                          gaussian_weights, sigma, use_sample_covariance)
            for c in range(a.shape[-1])
        ]))
    return float(_ssim_channel(a, b, data_range, win_size, gaussian_weights,
                               sigma, use_sample_covariance))


def compare_psnr(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10 * np.log10(data_range**2 / mse))


def compare_l1(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.mean(np.abs(a.astype(np.float64) - b.astype(np.float64))))


def compare_mae(a: np.ndarray, b: np.ndarray) -> float:
    """The reference's 'mae': normalized sum-abs-diff
    (script/metrics.py compare_mae: sum|a-b| / sum(|a|+|b|))."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    return float(np.sum(np.abs(a - b)) / (np.sum(np.abs(a) + np.abs(b)) + 1e-12))


def get_image_list(source) -> List[str]:
    if isinstance(source, (list, tuple)):
        return list(source)
    if os.path.isdir(source):
        return [
            os.path.join(source, f) for f in os.listdir(source)
            if f.lower().endswith(IMG_EXTS)
        ]
    if source.endswith(".txt"):
        return [l.strip() for l in open(source) if l.strip()]
    return [source]


class ReconstructionMetrics:
    """Folder-level driver (script/metrics.py:295-382)."""

    def __init__(self, data_range: float = 1.0, win_size: int = 51):
        self.data_range = data_range
        self.win_size = win_size

    def calculate_from_disk(self, inputs, gts, save_path=None,
                            sort: bool = True) -> Dict[str, List[float]]:
        import imageio.v2 as imageio

        input_list = get_image_list(inputs)
        gt_list = get_image_list(gts)
        if sort:
            input_list, gt_list = sorted(input_list), sorted(gt_list)
        psnr, ssim, ssim_256, mae, l1 = [], [], [], [], []
        for inp, gt in zip(input_list, gt_list):
            img_pred = imageio.imread(inp).astype(np.float32) / 255.0
            img_gt = imageio.imread(gt).astype(np.float32) / 255.0
            psnr.append(compare_psnr(img_gt, img_pred, self.data_range))
            ssim.append(compare_ssim(img_gt, img_pred, self.data_range,
                                     self.win_size))
            mae.append(compare_mae(img_gt, img_pred))
            l1.append(compare_l1(img_gt, img_pred))
            g256, p256 = img_gt * 255.0, img_pred * 255.0
            ssim_256.append(compare_ssim(
                g256, p256, data_range=p256.max() - p256.min(),
                gaussian_weights=True, sigma=1.5,
                use_sample_covariance=False,
            ))
        if save_path:
            os.makedirs(save_path, exist_ok=True)
            np.savez(os.path.join(save_path, "metrics.npz"), psnr=psnr,
                     ssim=ssim, ssim_256=ssim_256, mae=mae, l1=l1)
        return {
            "psnr": [round(float(np.mean(psnr)), 6)],
            "psnr_variance": [round(float(np.var(psnr)), 6)],
            "ssim": [round(float(np.mean(ssim)), 6)],
            "ssim_variance": [round(float(np.var(ssim)), 6)],
            "ssim_256": [round(float(np.mean(ssim_256)), 6)],
            "ssim_256_variance": [round(float(np.var(ssim_256)), 6)],
            "mae": [round(float(np.mean(mae)), 6)],
            "mae_variance": [round(float(np.var(mae)), 6)],
            "l1": [round(float(np.mean(l1)), 6)],
            "l1_variance": [round(float(np.var(l1)), 6)],
        }
