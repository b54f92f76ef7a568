"""Pallas TPU kernel: streaming max-correlation (flash-max).

The sampling-correctness loss needs, per target position j,
    cmax_j = max_i <s_i, t_j>        (and argmax_i for the custom VJP)
over ALL source positions i — an (Ns × Nt) correlation the reference
materializes in HBM (model/networks/external_function.py:263; O(N²) bytes,
~½ GB at the 256² pose config's relu3_1 layer).

This kernel tiles (t_j × s_i) onto the MXU and keeps the running
(max, argmax) in VMEM: the N² correlation never touches HBM — only the
(B, Nt) outputs do. Grid = (B, Nt tiles, Ns tiles) with the source axis
innermost so each output tile is revisited across source steps
(sequential TPU grid ⇒ safe accumulation).

The backward runs through the same argmax-based gather/scatter custom VJP
as the XLA path (losses/perceptual.py): d cmax_j / d s_i ≠ 0 only at
i = argmax_j.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (t × s) fp32 corr tile: 1024·512·4 = 2 MiB in VMEM; inputs ≤ (1024, C≤512).
# TILE_T is pinned to 1024 because the flattened 1-D outputs carry XLA's
# T(1024) (= 8·128) layout tiling — Mosaic requires the block to match it.
_TILE_T = 1024
_TILE_S = 512


def _kernel(s_ref, t_ref, cmax_ref, amax_ref, *, ns: int, tile_s: int):
    i = pl.program_id(2)  # source-axis step (innermost)

    s = s_ref[0]                       # (TILE_S, C)
    t = t_ref[0]                       # (TILE_T, C)
    corr = jnp.dot(t, s.T, preferred_element_type=jnp.float32)  # (TT, TS)

    # mask padded source rows (global index ≥ ns)
    base = i * tile_s
    s_idx = base + jax.lax.broadcasted_iota(jnp.int32, corr.shape, 1)
    corr = jnp.where(s_idx < ns, corr, -jnp.inf)

    m = jnp.max(corr, axis=1)                                   # (TT,)
    a = base + jnp.argmax(corr, axis=1).astype(jnp.int32)       # (TT,)

    @pl.when(i == 0)
    def _init():
        cmax_ref[:] = m
        amax_ref[:] = a

    @pl.when(i > 0)
    def _accum():
        cur = cmax_ref[:]
        take = m > cur
        cmax_ref[:] = jnp.where(take, m, cur)
        amax_ref[:] = jnp.where(take, a, amax_ref[:])


def max_corr_pallas(source_norm: jax.Array, target_norm: jax.Array,
                    interpret: bool = False):
    """(B, Ns, C) × (B, Nt, C) → (cmax (B, Nt) fp32, argmax (B, Nt) int32).

    Equals max/argmax of einsum('bsc,btc->bst') without materializing the
    (Ns, Nt) correlation in HBM.
    """
    B, Ns, C = source_norm.shape
    Nt = target_norm.shape[1]
    s = source_norm.astype(jnp.float32)
    t = target_norm.astype(jnp.float32)

    # Mosaic block-shape rules: second-to-last dim a multiple of 8 (fp32),
    # last dim a multiple of 128. Round tile_s up to 8 (the Ns padding below
    # absorbs it) and zero-pad C to 128 — zero features contribute nothing
    # to the dot products.
    tile_s = min(_TILE_S, max(128, ((Ns + 7) // 8) * 8))
    tile_t = _TILE_T
    pad_c = (-C) % 128
    if pad_c:
        s = jnp.pad(s, ((0, 0), (0, 0), (0, pad_c)))
        t = jnp.pad(t, ((0, 0), (0, 0), (0, pad_c)))
        C = C + pad_c
    pad_s = (-Ns) % tile_s
    pad_t = (-Nt) % tile_t
    if pad_s:
        s = jnp.pad(s, ((0, 0), (0, pad_s), (0, 0)))
    if pad_t:
        t = jnp.pad(t, ((0, 0), (0, pad_t), (0, 0)))
    ns_pad, nt_pad = s.shape[1], t.shape[1]

    # outputs are 1-D (B·nt_pad) — a (1, tile_t) 2-D block would violate the
    # TPU (8, 128) block-divisibility rule on the batch dim; 1-D blocks only
    # need the last dim 128-aligned
    n_j = nt_pad // tile_t
    grid = (B, n_j, ns_pad // tile_s)
    cmax, amax = pl.pallas_call(
        functools.partial(_kernel, ns=Ns, tile_s=tile_s),
        out_shape=(
            jax.ShapeDtypeStruct((B * nt_pad,), jnp.float32),
            jax.ShapeDtypeStruct((B * nt_pad,), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_s, C), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t, C), lambda b, j, i: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_t,), lambda b, j, i: (b * n_j + j,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t,), lambda b, j, i: (b * n_j + j,),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(s, t)
    cmax = cmax.reshape(B, nt_pad)[:, :Nt]
    amax = amax.reshape(B, nt_pad)[:, :Nt]
    return cmax, amax
