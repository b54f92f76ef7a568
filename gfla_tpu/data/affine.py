"""Random affine augmentation (host-side, PIL) for paired keypoint datasets.

Capability parity with the reference's affine pipeline
(data/base_dataset.py:65-79,101-170): random angle/shift/scale per image
(target aug damped ×0.2 / ×0.5 / 1), PIL affine warp with grey fill, and the
forward 3×3 matrix applied to keypoint coordinates.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image


def random_affine_params(
    rng: np.random.RandomState,
    angle: Optional[Sequence[float]],
    shift: Optional[Sequence[float]],
    scale: Optional[Sequence[float]],
):
    a = rng.uniform(angle[0], angle[1]) if angle else 0.0
    s = rng.uniform(scale[0], scale[1]) if scale else 1.0
    if shift:
        t = (rng.uniform(shift[0], shift[1]), rng.uniform(shift[0], shift[1]))
    else:
        t = (0.0, 0.0)
    return a, t, s


def inverse_affine_matrix(center, angle, translate, scale) -> list:
    """Inverse map M⁻¹ = C·RSS⁻¹·C⁻¹·T⁻¹ (torchvision convention, shear=0)."""
    angle = math.radians(angle)
    scale = 1.0 / scale
    matrix = [math.cos(angle), math.sin(angle), 0,
              -math.sin(angle), math.cos(angle), 0]
    matrix = [scale * m for m in matrix]
    matrix[2] += matrix[0] * (-center[0] - translate[0]) + \
        matrix[1] * (-center[1] - translate[1])
    matrix[5] += matrix[3] * (-center[0] - translate[0]) + \
        matrix[4] * (-center[1] - translate[1])
    matrix[2] += center[0]
    matrix[5] += center[1]
    return matrix


def forward_affine_matrix(center, angle, translate, scale) -> np.ndarray:
    """Forward 3×3 matrix for transforming keypoints (base_dataset.py:163-170)."""
    inv = np.array(inverse_affine_matrix(center, angle, translate, scale))
    m = np.vstack([inv.reshape(2, 3), [0, 0, 1]])
    return np.linalg.inv(m)


def apply_affine(
    img: Image.Image, angle: float, translate, scale: float,
    fill=(128, 128, 128),
) -> Image.Image:
    """PIL affine warp matching torchvision F.affine semantics."""
    center = (img.size[0] * 0.5 + 0.5, img.size[1] * 0.5 + 0.5)
    matrix = inverse_affine_matrix(center, angle, translate, scale)
    return img.transform(
        img.size, Image.AFFINE, matrix, resample=Image.BILINEAR,
        fillcolor=fill,
    )
