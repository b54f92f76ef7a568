"""Flow-field affine regularization loss.

Capability parity with the reference (Multi)AffineRegularizationLoss
(model/networks/external_function.py:12-77): penalize, for every k×k patch
of the flow-displaced coordinate grid, the residual of the best-fit affine
transform of patch coordinates.

Math: with A the (k², 3) matrix of patch coordinates (x, y, 1) and
v the k² grid values of one patch/component, the residual projector is
k = A(AᵀA)⁻¹Aᵀ − I; the reference computes vᵀ(kᵀk)v per patch via
conv2d + BlockExtractor + LocalAttnReshape + avg_pool and averages with a
k² scale — algebraically mean_{patches}(‖k·v‖²), which is what we compute
directly:

* patch extraction of the grid = static slicing (no gather, no conv);
* the k²×k² projector contraction is one einsum on the MXU.

The per-patch scalar matches the reference chain exactly (the reference's
conv2d(weights=KᵀK) → tile-reshape → zero-frac block extraction →
avg_pool·k² composition reduces to the same quadratic form).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=8)
def _residual_projector(kz: int) -> np.ndarray:
    """K = A(AᵀA)⁻¹Aᵀ − I, (k², k²), float32 (external_function.py:41-47)."""
    temp = np.arange(kz)
    A = np.ones([kz * kz, 3], dtype=np.float64)
    A[:, 0] = np.repeat(temp, kz)
    A[:, 1] = np.tile(temp, kz)
    AH = A.T
    k = A @ np.linalg.inv(AH @ A) @ AH - np.identity(kz * kz)
    return k.astype(np.float32)


def _patches(grid: jax.Array, kz: int) -> jax.Array:
    """(B, H, W) → (B, H-k+1, W-k+1, k²) valid patches via static slicing."""
    B, H, W = grid.shape
    Ho, Wo = H - kz + 1, W - kz + 1
    cols = [
        grid[:, i : i + Ho, j : j + Wo] for i in range(kz) for j in range(kz)
    ]
    return jnp.stack(cols, axis=-1)


class AffineRegularizationLoss:
    """Single-resolution affine regularization for one flow field."""

    def __init__(self, kz: int):
        self.kz = kz
        self.projector = jnp.asarray(_residual_projector(kz))

    def __call__(self, flow: jax.Array) -> jax.Array:
        """flow: (B, H, W, 2) with (x, y) channels, feature-pixel units."""
        B, H, W, _ = flow.shape
        xs = jnp.arange(W, dtype=flow.dtype)
        ys = jnp.arange(H, dtype=flow.dtype)
        grid_x = flow[..., 0] + xs[None, None, :]
        grid_y = flow[..., 1] + ys[None, :, None]
        loss = 0.0
        for g in (grid_x, grid_y):
            v = _patches(g, self.kz)  # (B, Ho, Wo, k²)
            r = jnp.einsum(
                "bhwk,jk->bhwj", v, self.projector,
                preferred_element_type=jnp.float32,
            )
            # per-patch vᵀKᵀKv = ‖Kv‖², averaged over patches (the
            # reference's avg_pool/·k² factors cancel; K is symmetric)
            loss = loss + jnp.mean(jnp.sum(r * r, axis=-1))
        return loss


class MultiAffineRegularizationLoss:
    """Multi-resolution wrapper (external_function.py:12-27): flow_fields[i]
    (coarse→fine) pairs with kz_dic keys sorted descending."""

    def __init__(self, kz_dic: Dict[int, int]):
        self.layers = sorted(kz_dic, reverse=True)
        self.methods = {key: AffineRegularizationLoss(kz_dic[key]) for key in kz_dic}

    def __call__(self, flow_fields: Sequence[jax.Array]) -> jax.Array:
        loss = 0.0
        for i, flow in enumerate(flow_fields):
            loss = loss + self.methods[self.layers[i]](flow)
        return loss
