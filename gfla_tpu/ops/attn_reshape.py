"""Local-attention coefficient reshape — pure layout transform.

Capability parity with the reference CUDA op ``LocalAttnReshape``
(reference: model/networks/local_attn_reshape/local_attn_reshape_kernel.cu:52-58):
turn a per-location k²-vector of attention coefficients (B, H, W, k²) into
spatial k×k tiles (B, k·H, k·W, 1) aligned with the block-extractor tile
layout: out[y, x] = in[y//k, x//k, (y%k)·k + x%k].

On TPU this is a zero-FLOP reshape+transpose that XLA folds into
neighbouring ops — no kernel needed (the reference needed a CUDA kernel
only because of its NCHW tile layout). Provided for layout parity and for
code that genuinely wants the tile view; the fused local-attention path
never materialises it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def local_attn_reshape(x: jax.Array, kernel_size: int) -> jax.Array:
    """(B, H, W, k²) → (B, k·H, k·W, 1); channel c = i·k + j maps to tile (i, j)."""
    k = kernel_size
    B, H, W, K2 = x.shape
    assert K2 == k * k, f"channel dim {K2} != k²={k * k}"
    t = x.reshape(B, H, W, k, k).transpose(0, 1, 3, 2, 4)
    return t.reshape(B, H * k, W * k, 1)


def local_attn_reshape_inverse(tiles: jax.Array, kernel_size: int) -> jax.Array:
    """(B, k·H, k·W, 1) → (B, H, W, k²). Exact inverse (scatter in the reference)."""
    k = kernel_size
    B, kH, kW, _ = tiles.shape
    H, W = kH // k, kW // k
    t = tiles.reshape(B, H, k, W, k).transpose(0, 1, 3, 2, 4)
    return t.reshape(B, H, W, k * k)
