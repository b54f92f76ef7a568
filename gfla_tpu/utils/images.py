"""Tensor↔image conversion and flow colorization (reference util/util.py).

tensor2im: [-1,1] float NHWC → uint8 HWC. flow2color: Middlebury color
wheel, matching the reference's flow visualization (util/util.py:82-216).
"""

from __future__ import annotations

import numpy as np


def tensor2im(x, index: int = 0) -> np.ndarray:
    """(B, H, W, C) or (H, W, C) in [-1, 1] → uint8 (H, W, 3)."""
    arr = np.asarray(x)
    if arr.ndim == 4:
        arr = arr[index]
    arr = (np.clip(arr, -1.0, 1.0) + 1.0) / 2.0 * 255.0
    arr = arr.astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    return arr


def _make_color_wheel() -> np.ndarray:
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:RY, 0] = 255
    wheel[0:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    wheel[col : col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    wheel[col : col + YG, 1] = 255
    col += YG
    wheel[col : col + GC, 1] = 255
    wheel[col : col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    wheel[col : col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col : col + CB, 2] = 255
    col += CB
    wheel[col : col + BM, 2] = 255
    wheel[col : col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    wheel[col : col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col : col + MR, 0] = 255
    return wheel


_WHEEL = _make_color_wheel()


def flow2color(flow, index: int = 0) -> np.ndarray:
    """(B, H, W, 2) or (H, W, 2) (x, y) flow → uint8 color-wheel image."""
    f = np.asarray(flow)
    if f.ndim == 4:
        f = f[index]
    u, v = f[..., 0], f[..., 1]
    rad = np.sqrt(u**2 + v**2)
    maxrad = max(rad.max(), 1e-8)
    u, v = u / maxrad, v / maxrad
    rad = np.sqrt(u**2 + v**2)
    a = np.arctan2(-v, -u) / np.pi
    ncols = _WHEEL.shape[0]
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int)
    k1 = (k0 + 1) % ncols
    frac = fk - k0
    img = np.zeros(f.shape[:2] + (3,), np.uint8)
    for c in range(3):
        col0 = _WHEEL[k0, c] / 255.0
        col1 = _WHEEL[k1, c] / 255.0
        col = (1 - frac) * col0 + frac * col1
        idx = rad <= 1
        col[idx] = 1 - rad[idx] * (1 - col[idx])
        col[~idx] = col[~idx] * 0.75
        img[..., c] = np.floor(255.0 * col)
    return img
