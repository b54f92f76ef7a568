"""Pallas TPU kernel for the local-attention math stage.

Fuses concat → stride-k-conv-as-dense (MXU) → 1×1 conv (MXU) → softmax →
attention-weighted block sum into ONE pass over the gathered block tensors:

    hidden = LeakyReLU( [block_target ‖ block_source] · W1 + b1 )
    attn   = softmax( hidden · W2 + b2 )
    out    = (1/k²) Σ_k attn_k · block_source_k

The XLA composition materializes the (N, k², 2C) concat and the (N, D)
hidden in HBM between fusions; this kernel streams 256-row tiles of the
block tensors through VMEM once and writes only the (N, C) output —
roughly halving HBM traffic for the stage. The gather that produces the
blocks stays in XLA (its dynamic-index pattern is what XLA's TPU gather
is good at; per-pixel scalar loads in a kernel would serialize on the
VPU).

Backward: custom_vjp recomputing through the jnp composition (the stage is
cheap to recompute relative to its memory traffic).

Reference semantics: ExtractorAttn (model/networks/base_function.py:790-818).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 128 rows/tile keeps the double-buffered fp32 working set under the
# 16 MiB VMEM budget at the largest live config (k²=9, C=256)
_TILE = 128


def _attn_math_jnp(bs, bt, w1, b1, w2, b2, negative_slope=0.1):
    """Pure-jnp reference of the fused stage. bs/bt: (N, k², C)."""
    cat = jnp.concatenate([bt, bs], axis=-1)
    hidden = jnp.einsum("nkc,kcd->nd", cat, w1,
                        preferred_element_type=jnp.float32) + b1
    hidden = jax.nn.leaky_relu(hidden, negative_slope)
    logits = jnp.einsum(
        "nd,dk->nk", hidden.astype(bs.dtype), w2,
        preferred_element_type=jnp.float32,
    ) + b2
    attn = jax.nn.softmax(logits, axis=-1)
    k2 = bs.shape[1]
    out = jnp.einsum("nk,nkc->nc", attn.astype(bs.dtype), bs,
                     preferred_element_type=jnp.float32) / float(k2)
    return out.astype(bs.dtype)


def _kernel(bs_ref, bt_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
            *, k2: int, c: int, negative_slope: float):
    bs = bs_ref[:]                       # (T, k², C)
    bt = bt_ref[:]
    T = bs.shape[0]
    cat = jnp.concatenate([bt, bs], axis=-1)         # (T, k², 2C)
    cat2d = cat.reshape(T, k2 * 2 * c)
    w1 = w1_ref[:]                                    # (k²·2C, D)
    hidden = jnp.dot(cat2d, w1, preferred_element_type=jnp.float32)
    hidden = hidden + b1_ref[:][None, :]
    hidden = jnp.where(hidden >= 0, hidden, hidden * negative_slope)
    logits = jnp.dot(hidden.astype(bs.dtype), w2_ref[:],
                     preferred_element_type=jnp.float32)
    logits = logits + b2_ref[:][None, :]              # (T, k²)
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)     # (T, k²)
    out = jnp.sum(attn[..., None].astype(bs.dtype) * bs, axis=1) / float(k2)
    out_ref[:] = out.astype(out_ref.dtype)


def _attn_math_pallas(bs, bt, w1, b1, w2, b2, negative_slope=0.1,
                      interpret=False):
    N, k2, c = bs.shape
    d = w1.shape[-1]
    pad = (-N) % _TILE
    if pad:
        bs = jnp.pad(bs, ((0, pad), (0, 0), (0, 0)))
        bt = jnp.pad(bt, ((0, pad), (0, 0), (0, 0)))
    n_pad = bs.shape[0]
    w1_2d = w1.reshape(k2 * 2 * c, d)  # concat layout: [target ‖ source] per k²

    # w1 rows must interleave to match concat-on-channel layout:
    # cat[..., j, :] = [bt_j (C), bs_j (C)] while w1 is (k², 2C, D) with the
    # SAME per-k² [target-C ‖ source-C] channel order → flat reshape aligns.
    grid = (n_pad // _TILE,)
    out = pl.pallas_call(
        functools.partial(_kernel, k2=k2, c=c,
                          negative_slope=negative_slope),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), bs.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE, k2, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, k2, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2 * 2 * c, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(bs, bt, w1_2d, b1, w2, b2)
    return out[:N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def attn_math_fused(bs, bt, w1, b1, w2, b2, negative_slope=0.1,
                    interpret=False):
    """Fused attention math stage: (N, k², C) blocks → (N, C) output."""
    return _attn_math_pallas(bs, bt, w1, b1, w2, b2, negative_slope,
                             interpret)


def _fwd(bs, bt, w1, b1, w2, b2, negative_slope, interpret):
    out = _attn_math_pallas(bs, bt, w1, b1, w2, b2, negative_slope,
                            interpret)
    return out, (bs, bt, w1, b1, w2, b2)


def _bwd(negative_slope, interpret, residuals, g):
    bs, bt, w1, b1, w2, b2 = residuals
    _, vjp = jax.vjp(
        lambda *a: _attn_math_jnp(*a, negative_slope=negative_slope),
        bs, bt, w1, b1, w2, b2,
    )
    return vjp(g)


attn_math_fused.defvjp(_fwd, _bwd)
