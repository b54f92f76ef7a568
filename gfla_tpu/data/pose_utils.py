"""Keypoint utilities: parsing, heatmap encoding, skeleton drawing, masks.

Capability parity with reference util/pose_utils.py. Heatmap encoding has
two implementations:

* `encode_heatmaps` — device-side, vectorized jnp (runs inside the jitted
  train step; BASELINE.md: "Gaussian heatmap encoding on device"). The
  reference computes per-keypoint numpy meshgrids on the host dataloader
  workers (pose_utils.py:52-70) — on TPU we ship (K, 2) coords and encode
  on-chip, saving host CPU and H2D bandwidth (18×H×W floats → 36 floats).
* `cords_to_map` — numpy reference/parity implementation.

Skeleton drawing uses cv2 instead of skimage (not in this image).
"""

from __future__ import annotations

import json
from typing import Optional, Tuple

import cv2
import numpy as np

# NOTE: jax is imported lazily inside encode_heatmaps — this module is
# unpickled inside loader worker processes (forkserver), which are
# numpy-only and must not pay the jax import.

MISSING_VALUE = -1

# OpenPose-18 limb pairs / colors / names (pose_utils.py:14-24)
LIMB_SEQ = [
    [1, 2], [1, 5], [2, 3], [3, 4], [5, 6], [6, 7], [1, 8], [8, 9],
    [9, 10], [1, 11], [11, 12], [12, 13], [1, 0], [0, 14], [14, 16],
    [0, 15], [15, 17], [2, 16], [5, 17],
]
COLORS = [
    [255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0], [170, 255, 0],
    [85, 255, 0], [0, 255, 0], [0, 255, 85], [0, 255, 170], [0, 255, 255],
    [0, 170, 255], [0, 85, 255], [0, 0, 255], [85, 0, 255], [170, 0, 255],
    [255, 0, 255], [255, 0, 170], [255, 0, 85],
]
LABELS = [
    "nose", "neck", "Rsho", "Relb", "Rwri", "Lsho", "Lelb", "Lwri",
    "Rhip", "Rkne", "Rank", "Lhip", "Lkne", "Lank", "Leye", "Reye",
    "Lear", "Rear",
]


def load_pose_cords_from_strings(y_str: str, x_str: str) -> np.ndarray:
    """CSV keypoint strings → (K, 2) array of (y, x) (pose_utils.py:102-105)."""
    y = json.loads(y_str)
    x = json.loads(x_str)
    return np.stack([np.asarray(y), np.asarray(x)], axis=1)


def transform_cords(
    cords: np.ndarray,
    img_size: Tuple[int, int],
    old_size: Optional[Tuple[int, int]] = None,
    affine_matrix: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Rescale (y, x) keypoints old_size→img_size and apply the affine,
    keeping MISSING_VALUE sentinels. Mirrors the per-point math of
    cords_to_map (pose_utils.py:56-67) including the int() truncation."""
    old_size = img_size if old_size is None else old_size
    out = np.full_like(cords, MISSING_VALUE, dtype=np.float32)
    for i, point in enumerate(cords.astype(float)):
        if point[0] == MISSING_VALUE or point[1] == MISSING_VALUE:
            continue
        y = point[0] / old_size[0] * img_size[0]
        x = point[1] / old_size[1] * img_size[1]
        if affine_matrix is not None:
            p = affine_matrix @ np.array([x, y, 1.0])
            y, x = int(p[1]), int(p[0])
        else:
            y, x = int(y), int(x)
        out[i] = (y, x)
    return out


def cords_to_map(
    cords: np.ndarray,
    img_size: Tuple[int, int],
    old_size: Optional[Tuple[int, int]] = None,
    affine_matrix: Optional[np.ndarray] = None,
    sigma: float = 6.0,
) -> np.ndarray:
    """Host Gaussian heatmaps (H, W, K) — numpy parity implementation."""
    t = transform_cords(cords, img_size, old_size, affine_matrix)
    H, W = img_size
    result = np.zeros((H, W, cords.shape[0]), np.float32)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    for i, (y, x) in enumerate(t):
        if y == MISSING_VALUE or x == MISSING_VALUE:
            continue
        result[..., i] = np.exp(
            -((yy - y) ** 2 + (xx - x) ** 2) / (2 * sigma**2)
        )
    return result


def encode_heatmaps(cords, height: int, width: int, sigma: float = 6.0,
                    missing_value: float = MISSING_VALUE):
    """Device Gaussian heatmap encoding.

    cords: (..., K, 2) float (y, x), `missing_value` for absent joints —
    -1 for the fashion CSV convention (default), 0 for openpose JSON
    skeletons (openpose_utils.MISSING_VALUE, matching obtain_map's skip).
    Returns (..., H, W, K). Fully vectorized; jit/vmap/pjit friendly.
    """
    import jax.numpy as jnp

    y = cords[..., 0]
    x = cords[..., 1]
    yy = jnp.arange(height, dtype=jnp.float32)
    xx = jnp.arange(width, dtype=jnp.float32)
    dy2 = (yy[:, None] - y[..., None, :]) ** 2      # (..., H, K)
    dx2 = (xx[:, None] - x[..., None, :]) ** 2      # (..., W, K)
    maps = jnp.exp(
        -(dy2[..., :, None, :] + dx2[..., None, :, :]) / (2.0 * sigma**2)
    )  # (..., H, W, K)
    present = (y != missing_value) & (x != missing_value)
    return maps * present[..., None, None, :]


def draw_pose_from_cords(
    pose_joints: np.ndarray,
    img_size: Tuple[int, int],
    radius: int = 2,
    draw_joints: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Render the skeleton as an RGB uint8 image + coverage mask
    (pose_utils.py:73-94), cv2-based."""
    colors = np.zeros(img_size + (3,), np.uint8)
    mask = np.zeros(img_size, bool)
    pts = pose_joints.astype(int)
    if draw_joints:
        for f, t in LIMB_SEQ:
            if (pts[f] == MISSING_VALUE).any() or (pts[t] == MISSING_VALUE).any():
                continue
            line = np.zeros(img_size, np.uint8)
            cv2.line(line, (pts[f][1], pts[f][0]), (pts[t][1], pts[t][0]),
                     255, 1, cv2.LINE_AA)
            sel = line > 0
            colors[sel] = line[sel][:, None]
            mask |= sel
    for i, joint in enumerate(pts):
        if (joint == MISSING_VALUE).any():
            continue
        circ = np.zeros(img_size, np.uint8)
        cv2.circle(circ, (joint[1], joint[0]), radius, 255, -1)
        sel = circ > 0
        colors[sel] = COLORS[i]
        mask |= sel
    return colors, mask


def map_to_cord(pose_map: np.ndarray, threshold: float = 0.1) -> np.ndarray:
    """Heatmaps (H, W, K) → (K, 2) argmax coords (pose_utils.py:29-49)."""
    K = min(18, pose_map.shape[-1])
    out = np.full((K, 2), MISSING_VALUE, np.int64)
    for i in range(K):
        m = pose_map[..., i]
        peak = m.max()
        if peak > threshold:
            y, x = np.unravel_index(np.argmax(m), m.shape)
            out[i] = (y, x)
    return out


def draw_pose_from_map(pose_map: np.ndarray, threshold: float = 0.1, **kwargs):
    cords = map_to_cord(pose_map, threshold)
    return draw_pose_from_cords(cords, pose_map.shape[:2], **kwargs)


def produce_ma_mask(
    kp_array: np.ndarray, img_size: Tuple[int, int], point_radius: int = 4
) -> np.ndarray:
    """Morphological body mask from keypoints (pose_utils.py:119-154),
    cv2-based (fillPoly + circles + close/open)."""
    mask = np.zeros(img_size, np.uint8)
    limbs = np.array([
        [2, 3], [2, 6], [3, 4], [4, 5], [6, 7], [7, 8], [2, 9], [9, 10],
        [10, 11], [2, 12], [12, 13], [13, 14], [2, 1], [1, 15], [15, 17],
        [1, 16], [16, 18], [2, 17], [2, 18], [9, 12], [12, 6], [9, 3],
        [17, 18],
    ]) - 1
    kp = kp_array.astype(float)
    for f, t in limbs:
        if (kp[f] == MISSING_VALUE).any() or (kp[t] == MISSING_VALUE).any():
            continue
        n = kp[f] - kp[t]
        n = np.array([-n[1], n[0]])
        norm = np.linalg.norm(n)
        if norm == 0:
            continue
        n = point_radius * n / norm
        poly = np.array([kp[f] + n, kp[f] - n, kp[t] - n, kp[t] + n])
        cv2.fillPoly(mask, [poly[:, ::-1].astype(np.int32)], 1)
    for joint in kp:
        if (joint == MISSING_VALUE).any():
            continue
        cv2.circle(mask, (int(joint[1]), int(joint[0])), point_radius, 1, -1)
    kernel = np.ones((5, 5), np.uint8)
    mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, kernel)
    return mask.astype(bool)
