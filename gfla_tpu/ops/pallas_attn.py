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

Backward: a fused Pallas kernel too. One pass over 64-row tiles of the
saved block tensors recomputes the (VMEM-cheap, MXU-heavy) forward
intermediates and emits d_block_source, d_block_target and dHidden in the
same pass, accumulating the small weight/bias grads (dW2, db1, db2) in
fp32 VMEM across the grid. Only dW1 — whose fp32 accumulator (k²·2C × D)
would not share VMEM with the working set at the largest live config
(k²=25, C=256) — is formed outside the kernel as a single XLA matmul over
the saved blocks. Net HBM traffic ≈ read 2·blocks + grad, write 2·blocks
(+ one extra block read for dW1), versus the recompute-VJP's full jnp
composition with its HBM-materialised concat/hidden intermediates.

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


# Backward tile: the fp32 (T, k²·C) d_cat intermediates dominate the
# working set — 64 rows keeps the largest live config (k²=25, C=256)
# comfortably inside VMEM alongside the split weight halves.
_TILE_BWD = 64


def _split_w1(w1):
    """(k², 2C, D) → target-half (k²·C, D) and source-half (k²·C, D).

    The forward's concat layout is [target-C ‖ source-C] per k² index, so
    hidden = bt2d·w1t + bs2d·w1s with no concat materialised."""
    k2, c2, d = w1.shape
    c = c2 // 2
    return (w1[:, :c, :].reshape(k2 * c, d),
            w1[:, c:, :].reshape(k2 * c, d))


def _bwd_kernel(bs_ref, bt_ref, g_ref, w1t_ref, w1s_ref, b1_ref, w2_ref,
                b2_ref, dbs_ref, dbt_ref, dhpre_ref, dw2_ref, db1_ref,
                db2_ref, *, k2: int, c: int, d: int, negative_slope: float):
    i = pl.program_id(0)
    bs = bs_ref[:]                                    # (T, k², C)
    bt = bt_ref[:]
    T = bs.shape[0]
    dt = bs.dtype
    bs2d = bs.reshape(T, k2 * c)
    bt2d = bt.reshape(T, k2 * c)

    # ---- forward recompute (VMEM-resident, MXU work) ----
    hidden = (
        jnp.dot(bt2d, w1t_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(bs2d, w1s_ref[:], preferred_element_type=jnp.float32)
        + b1_ref[:][None, :]
    )                                                 # (T, D) f32
    h = jnp.where(hidden >= 0, hidden, hidden * negative_slope)
    h_dt = h.astype(dt)
    logits = jnp.dot(h_dt, w2_ref[:],
                     preferred_element_type=jnp.float32)
    logits = logits + b2_ref[:][None, :]              # (T, k²) f32
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)     # (T, k²) f32

    # ---- backward ----
    g = g_ref[:].astype(jnp.float32)                  # (T, C)
    inv_k2 = 1.0 / float(k2)
    bs_f = bs.astype(jnp.float32)
    # d(out)/d(attn): (1/k²)·⟨g, bs⟩ over C
    d_attn = jnp.sum(bs_f * g[:, None, :], axis=-1) * inv_k2   # (T, k²)
    # weighted-sum appearance of bs
    d_bs_ws = (inv_k2 * attn)[..., None] * g[:, None, :]       # (T, k², C)
    # softmax VJP
    s = jnp.sum(attn * d_attn, axis=-1, keepdims=True)
    d_logits = attn * (d_attn - s)                    # (T, k²) f32
    # second projection grads
    dw2 = jax.lax.dot_general(
        h_dt.astype(jnp.float32), d_logits,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # (D, k²)
    d_h = jax.lax.dot_general(
        d_logits, w2_ref[:].astype(jnp.float32),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # (T, D)
    d_hpre = jnp.where(hidden >= 0, d_h, d_h * negative_slope)
    d_hpre_dt = d_hpre.astype(dt)
    # first projection data grads (dW1 is formed outside from d_hpre)
    d_bt = jax.lax.dot_general(
        d_hpre_dt, w1t_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(T, k2, c)
    d_bs_cat = jax.lax.dot_general(
        d_hpre_dt, w1s_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(T, k2, c)

    dbs_ref[:] = (d_bs_ws + d_bs_cat).astype(dbs_ref.dtype)
    dbt_ref[:] = d_bt.astype(dbt_ref.dtype)
    dhpre_ref[:] = d_hpre_dt

    # fp32 accumulators revisited every grid step (sequential TPU grid)
    @pl.when(i == 0)
    def _init():
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    dw2_ref[:] += dw2
    db1_ref[:] += jnp.sum(d_hpre, axis=0, keepdims=True)
    db2_ref[:] += jnp.sum(d_logits, axis=0, keepdims=True)


def _attn_math_bwd_pallas(bs, bt, g, w1, b1, w2, b2, negative_slope,
                          interpret=False):
    """Fused backward: one Pallas pass over the saved blocks + one XLA
    matmul for dW1. Returns grads for (bs, bt, w1, b1, w2, b2)."""
    N, k2, c = bs.shape
    d = w1.shape[-1]
    pad = (-N) % _TILE_BWD
    bs_p = jnp.pad(bs, ((0, pad), (0, 0), (0, 0))) if pad else bs
    bt_p = jnp.pad(bt, ((0, pad), (0, 0), (0, 0))) if pad else bt
    g_p = jnp.pad(g, ((0, pad), (0, 0))) if pad else g
    n_pad = bs_p.shape[0]
    w1t, w1s = _split_w1(w1)

    grid = (n_pad // _TILE_BWD,)
    acc = jnp.float32
    d_bs, d_bt, d_hpre, dw2, db1, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, k2=k2, c=c, d=d,
                          negative_slope=negative_slope),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, k2, c), bs.dtype),
            jax.ShapeDtypeStruct((n_pad, k2, c), bt.dtype),
            jax.ShapeDtypeStruct((n_pad, d), bs.dtype),
            jax.ShapeDtypeStruct((d, k2), acc),
            jax.ShapeDtypeStruct((1, d), acc),
            jax.ShapeDtypeStruct((1, k2), acc),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_BWD, k2, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_BWD, k2, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_BWD, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2 * c, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2 * c, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_TILE_BWD, k2, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_BWD, k2, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_BWD, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(bs_p, bt_p, g_p, w1t, w1s, b1, w2, b2)

    d_hpre = d_hpre[:N]
    # dW1 halves: one MXU matmul each over the saved blocks (the fp32
    # (k²·2C, D) accumulator would not fit VMEM next to the working set)
    dw1_t = jnp.einsum("nkc,nd->kcd", bt, d_hpre,
                       preferred_element_type=jnp.float32)
    dw1_s = jnp.einsum("nkc,nd->kcd", bs, d_hpre,
                       preferred_element_type=jnp.float32)
    dw1 = jnp.concatenate([dw1_t, dw1_s], axis=1).astype(w1.dtype)
    return (d_bs[:N], d_bt[:N], dw1, db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b2.dtype))


def _bwd(negative_slope, interpret, residuals, g):
    bs, bt, w1, b1, w2, b2 = residuals
    return _attn_math_bwd_pallas(bs, bt, g, w1, b1, w2, b2,
                                 negative_slope, interpret)


attn_math_fused.defvjp(_fwd, _bwd)
