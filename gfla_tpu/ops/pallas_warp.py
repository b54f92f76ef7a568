"""Fully-fused Pallas local-attention warp: gather + blend + attention in VMEM.

The profile of the XLA composition (bench.py --profile, v5e) shows the
local-attention stage dominated not by its math but by its *memory ops*:
XLA lowers the flow-displaced block gather to a slow row-gather
(~9.7 ms/step at the coarse level) and its transpose to sort + segment-sum
(~17.4 ms/step), and materialises the (B,H,W,(k+1)²,C) patch tensor, its
bilinear blend, and the (B,H,W,k²,2C) concat in HBM between fusions.

This module keeps the *entire* source stream on-chip:

  * The padded source feature map for one batch element (≤3 MB) lives in
    VMEM; each output position dynamic-slices its (k+1)² footprint
    directly from it (measured ~7× faster than XLA's gather at the live
    fashion config) and the bilinear blend happens in registers.
  * The attention math (dense layer over flattened blocks → LeakyReLU →
    logits → softmax → weighted block sum) runs on the MXU/VPU over
    128-position tiles without leaving VMEM.
  * The backward recomputes the forward per tile (MXU-cheap) and
    accumulates the d_source scatter into a VMEM-resident padded
    accumulator — replacing XLA's sort-based scatter entirely — while
    emitting d_flow analytically per position.

The zero-flow *target* stream is deliberately left to XLA: extracting
k×k patches of `target` and multiplying by the target half of W1 is
mathematically a plain k×k convolution, which XLA schedules on the MXU
better than any hand-written kernel. `local_attn_warp_fused` therefore
computes hidden_bt = conv(edge_pad(target), W1_target) + b1 as ordinary
differentiable jnp code and passes it into the Pallas core; autodiff
chains d_hidden_bt back through the conv to target/W1_target/b1 for free.

Reference semantics: ExtractorAttn, model/networks/base_function.py:790-818
(the k-stride conv over [target‖source] tiles at :799-807, the softmax and
avg_pool block sum at :808-809) and the CUDA gather/scatter pair it calls
(block_extractor_kernel.cu:52-84,151-169).

Numerics: the footprint slice comes from an edge-replicated padded copy of
`source`, so out-of-image taps reproduce the reference's edge clamp
exactly (block_extractor_kernel.cu:62-74); the bilinear fractional weights
keep d/d(flow) = 1 through floor(), matching the reference backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 128  # positions per grid step; all live configs have H·W % 128 == 0


def fused_warp_eligible(source, target, flow, kernel_size: int,
                        w1, return_attn: bool, default_act: bool) -> bool:
    """The fused kernel covers every *live* reference attention config
    (fashion/market/dance/face/shapenet: k∈{3,5}, C∈{128,256}, D=128,
    flow at source resolution). Anything else falls back to the XLA
    composition."""
    if return_attn or not default_act:
        return False
    if source.ndim != 4 or source.shape != target.shape:
        return False
    if source.shape[:3] != flow.shape[:3]:
        return False
    from gfla_tpu.parallel import get_spatial_halo

    if get_spatial_halo()[0] is not None:
        # the kernel gathers from the full source map; under the
        # halo-sharded spatial mesh block_extract's shard_map path applies
        return False
    B, H, W, C = source.shape
    k = kernel_size
    D = w1.shape[-1]
    if (H * W) % _TILE or C % 128 or D % 128:
        return False
    # VMEM budget (fp32 worst case): the padded per-batch source block is
    # double-buffered by the pipeline (Pallas prefetches block b+1 while b
    # computes), and the bwd kernel additionally holds the d_source
    # accumulator block (same size). 3 padded blocks + the tile working
    # set (weights + two (T,k²,C) scratches + dense intermediates,
    # ~3 MB at the largest live config) must fit the ~16 MB VMEM:
    # cap the padded block at 4 MB → ≤ 12 MB + working set.
    if (H + 2 * k) * _aligned_wp(W, k) * C * 4 > 4 * 1024 * 1024:
        return False
    return True


# ----------------------------------------------------------------------
# index / padding prep (cheap XLA elementwise, shared by fwd and bwd)
# ----------------------------------------------------------------------

def _aligned_wp(W, k):
    """Padded width sized so every aligned 16-wide slab load stays in
    bounds: max column start is ix_max = W+2k-(k+1), its 8-aligned base is
    (ix_max//8)*8, and the slab extends 16 past it."""
    P, F = k, k + 1
    return ((W + 2 * P - F) // 8) * 8 + 16


def _prep(source, flow, k):
    """Edge-padded fp32 source + clipped footprint start indices.

    Pad P=k each side (plus right-edge alignment padding to `_aligned_wp` —
    Mosaic only allows dynamic sublane slices at multiples of 8, so the
    kernel loads a 16-wide slab at the aligned base below each footprint
    and rotates it into place). The slice start s = clip(floor(d)-r+P, 0,
    HP-F) makes the padded (k+1)-row window reproduce per-tap edge clamping
    exactly for arbitrarily large displacements (rows of the padded copy
    replicate the image edge, and the clip saturates the window at the
    replicated band once every tap is out of image)."""
    B, H, W, C = source.shape
    r = k // 2
    F = k + 1
    P = k
    extra = _aligned_wp(W, k) - (W + 2 * P)
    src_pad = jnp.pad(
        source.astype(jnp.float32),
        ((0, 0), (P, P), (P, P + extra), (0, 0)), mode="edge",
    )
    fl = flow.astype(jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    dy = fl[..., 1] + ys[None, :, None]
    dx = fl[..., 0] + xs[None, None, :]
    fy = jnp.floor(dy)
    fx = jnp.floor(dx)
    wy = (dy - fy).reshape(B, 1, H * W)
    wx = (dx - fx).reshape(B, 1, H * W)
    by = jnp.clip(fy.astype(jnp.int32) - r + P, 0, H + 2 * P - F)
    bx = jnp.clip(fx.astype(jnp.int32) - r + P, 0, W + 2 * P - F)
    return src_pad, by.reshape(B, 1, H * W), bx.reshape(B, 1, H * W), wy, wx


def _fold_pad(dsrc_pad, H, W, P):
    """Transpose of edge-mode padding: fold replicated bands back onto the
    image border rows/cols."""
    d = dsrc_pad
    top = jnp.sum(d[:, : P + 1], axis=1, keepdims=True)
    bot = jnp.sum(d[:, H + P - 1 :], axis=1, keepdims=True)
    d = jnp.concatenate([top, d[:, P + 1 : H + P - 1], bot], axis=1)
    left = jnp.sum(d[:, :, : P + 1], axis=2, keepdims=True)
    right = jnp.sum(d[:, :, W + P - 1 :], axis=2, keepdims=True)
    return jnp.concatenate([left, d[:, :, P + 1 : W + P - 1], right], axis=2)


# ----------------------------------------------------------------------
# forward kernel
# ----------------------------------------------------------------------

def _slab_patch(src_ref, iy, ix, F):
    """(F, F, C) footprint at dynamic (iy, ix). Mosaic restricts dynamic
    slices on the sublane (W) dim to multiples of 8, so load the aligned
    16-wide slab containing [ix, ix+F) and rotate it into place (dynamic
    sublane rotate is supported; validated on v5e). Row (H) indices are on
    an untiled outer dim — arbitrary iy is fine."""
    ix0 = pl.multiple_of((ix // 8) * 8, 8)
    rr = ix - ix0
    slab = src_ref[0, pl.ds(iy, F), pl.ds(ix0, 16), :]       # (F,16,C)
    slab = pltpu.roll(slab, (16 - rr) % 16, axis=1)
    return slab[:, :F]


def _fwd_kernel(by_ref, bx_ref, wy_ref, wx_ref, src_ref, hbt_ref,
                w1s_ref, w2_ref, b2_ref, out_ref, bs_scr,
                *, k: int, c: int, ns: float):
    F = k + 1
    k2 = k * k
    T = out_ref.shape[1]

    def gather(t, _):
        iy = by_ref[0, 0, t]
        ix = bx_ref[0, 0, t]
        a = wy_ref[0, 0, t]
        b = wx_ref[0, 0, t]
        p = _slab_patch(src_ref, iy, ix, F)                  # (F,F,C) f32
        blk = ((1.0 - a) * (1.0 - b) * p[0:k, 0:k]
               + (1.0 - a) * b * p[0:k, 1:F]
               + a * (1.0 - b) * p[1:F, 0:k]
               + a * b * p[1:F, 1:F])                        # (k,k,C)
        bs_scr[t] = blk.reshape(k2, c).astype(bs_scr.dtype)
        return 0

    jax.lax.fori_loop(0, T, gather, 0)

    bs = bs_scr[:]                                           # (T,k²,C) bf16
    hidden = (
        jnp.dot(bs.reshape(T, k2 * c), w1s_ref[:],
                preferred_element_type=jnp.float32)
        + hbt_ref[0]
    )                                                        # (T,D) f32
    hidden = jnp.where(hidden >= 0, hidden, hidden * ns)
    logits = jnp.dot(hidden.astype(bs.dtype), w2_ref[:],
                     preferred_element_type=jnp.float32) + b2_ref[:][None, :]
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)            # (T,k²) f32
    out = jnp.sum(attn[..., None].astype(bs.dtype) * bs,
                  axis=1) / float(k2)
    out_ref[0] = out.astype(out_ref.dtype)


def _warp_fwd_pallas(src_pad, by, bx, wy, wx, hidden_bt, w1s, w2, b2,
                     k, ns, out_dtype, cdt, interpret):
    B, HP, WP, C = src_pad.shape
    N = by.shape[-1]
    k2 = k * k
    D = w1s.shape[-1]
    NT = N // _TILE
    sspec = lambda: pl.BlockSpec((1, 1, _TILE), lambda b, j: (b, 0, j),
                                 memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, c=C, ns=ns),
        grid=(B, NT),
        in_specs=[
            sspec(), sspec(), sspec(), sspec(),
            pl.BlockSpec((1, HP, WP, C), lambda b, j: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE, D), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2 * C, D), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, k2), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2,), lambda b, j: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TILE, C), lambda b, j: (b, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), out_dtype),
        scratch_shapes=[pltpu.VMEM((_TILE, k2, C), cdt)],
        interpret=interpret,
    )(by, bx, wy, wx, src_pad, hidden_bt, w1s, w2, b2)
    return out


# ----------------------------------------------------------------------
# backward kernel
# ----------------------------------------------------------------------

def _bwd_kernel(by_ref, bx_ref, wy_ref, wx_ref, src_ref, hbt_ref,
                w1s_ref, w2_ref, b2_ref, g_ref,
                dsrc_ref, dhpre_ref, dflow_ref, dw1s_ref, dw2_ref, db2_ref,
                bs_scr, dbs_scr, *, k: int, c: int, ns: float):
    F = k + 1
    k2 = k * k
    T = g_ref.shape[1]
    b_idx = pl.program_id(0)
    j_idx = pl.program_id(1)

    @pl.when(j_idx == 0)
    def _init_dsrc():
        dsrc_ref[...] = jnp.zeros_like(dsrc_ref)

    @pl.when(jnp.logical_and(b_idx == 0, j_idx == 0))
    def _init_wacc():
        dw1s_ref[...] = jnp.zeros_like(dw1s_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    def gather(t, _):
        iy = by_ref[0, 0, t]
        ix = bx_ref[0, 0, t]
        a = wy_ref[0, 0, t]
        b = wx_ref[0, 0, t]
        p = _slab_patch(src_ref, iy, ix, F)
        blk = ((1.0 - a) * (1.0 - b) * p[0:k, 0:k]
               + (1.0 - a) * b * p[0:k, 1:F]
               + a * (1.0 - b) * p[1:F, 0:k]
               + a * b * p[1:F, 1:F])
        bs_scr[t] = blk.reshape(k2, c).astype(bs_scr.dtype)
        return 0

    jax.lax.fori_loop(0, T, gather, 0)

    # ---- recompute forward tile (matches _fwd_kernel bit-for-bit) ----
    bs = bs_scr[:]
    bs2d = bs.reshape(T, k2 * c)
    hpre = (
        jnp.dot(bs2d, w1s_ref[:], preferred_element_type=jnp.float32)
        + hbt_ref[0]
    )
    hidden = jnp.where(hpre >= 0, hpre, hpre * ns)
    h_dt = hidden.astype(bs.dtype)
    logits = jnp.dot(h_dt, w2_ref[:],
                     preferred_element_type=jnp.float32) + b2_ref[:][None, :]
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)            # (T,k²) f32

    # ---- backward tile math ----
    g = g_ref[0].astype(jnp.float32)                         # (T,C)
    inv_k2 = 1.0 / float(k2)
    bs_f = bs.astype(jnp.float32)
    d_attn = jnp.sum(bs_f * g[:, None, :], axis=-1) * inv_k2  # (T,k²)
    s = jnp.sum(attn * d_attn, axis=-1, keepdims=True)
    d_logits = (attn * (d_attn - s)).astype(jnp.float32)      # (T,k²)
    dw2_ref[...] += jax.lax.dot_general(
        hidden, d_logits, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(d_logits, axis=0, keepdims=True)
    d_h = jax.lax.dot_general(
        d_logits.astype(bs.dtype), w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (T,D)
    d_hpre = jnp.where(hpre >= 0, d_h, d_h * ns)
    d_hpre_dt = d_hpre.astype(dhpre_ref.dtype)
    dhpre_ref[0] = d_hpre_dt
    dw1s_ref[...] += jax.lax.dot_general(
        bs2d, d_hpre_dt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (k²C,D)
    d_bs = (
        jax.lax.dot_general(
            d_hpre_dt, w1s_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(T, k2, c)
        + (inv_k2 * attn)[..., None] * g[:, None, :]
    )
    dbs_scr[...] = d_bs.astype(dbs_scr.dtype)

    def scatter(t, _):
        iy = by_ref[0, 0, t]
        ix = bx_ref[0, 0, t]
        a = wy_ref[0, 0, t]
        b = wx_ref[0, 0, t]
        db = dbs_scr[t].astype(jnp.float32).reshape(k, k, c)
        dp = (jnp.pad((1.0 - a) * (1.0 - b) * db,
                      ((0, 1), (0, 1), (0, 0)))
              + jnp.pad((1.0 - a) * b * db, ((0, 1), (1, 0), (0, 0)))
              + jnp.pad(a * (1.0 - b) * db, ((1, 0), (0, 1), (0, 0)))
              + jnp.pad(a * b * db, ((1, 0), (1, 0), (0, 0))))
        # aligned read-modify-write: place dp at slab cols [0,F), rotate
        # right to [rr, rr+F) = the real footprint columns, add (the
        # rotated-in wrap columns are the zero padding, so junk outside
        # the footprint is preserved untouched)
        ix0 = pl.multiple_of((ix // 8) * 8, 8)
        rr = ix - ix0
        buf = jnp.pad(dp, ((0, 0), (0, 16 - F), (0, 0)))     # (F,16,C)
        buf = pltpu.roll(buf, rr, axis=1)
        dsrc_ref[0, pl.ds(iy, F), pl.ds(ix0, 16), :] += buf
        p = _slab_patch(src_ref, iy, ix, F)
        tl = p[0:k, 0:k]
        tr = p[0:k, 1:F]
        bl = p[1:F, 0:k]
        br = p[1:F, 1:F]
        d_wy = jnp.sum(db * ((1.0 - b) * (bl - tl) + b * (br - tr)))
        d_wx = jnp.sum(db * ((1.0 - a) * (tr - tl) + a * (br - bl)))
        # per-position scalars: SMEM output (dynamic VMEM sublane stores
        # would hit the same multiple-of-8 restriction as the gather)
        dflow_ref[0, 0, t] = d_wy
        dflow_ref[0, 1, t] = d_wx
        return 0

    jax.lax.fori_loop(0, T, scatter, 0)


def _warp_bwd_pallas(src_pad, by, bx, wy, wx, hidden_bt, w1s, w2, b2, g,
                     k, ns, cdt, interpret):
    B, HP, WP, C = src_pad.shape
    N = by.shape[-1]
    k2 = k * k
    D = w1s.shape[-1]
    NT = N // _TILE
    sspec = lambda: pl.BlockSpec((1, 1, _TILE), lambda b, j: (b, 0, j),
                                 memory_space=pltpu.SMEM)
    f32 = jnp.float32
    dsrc_pad, d_hpre, dflow, dw1s, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k, c=C, ns=ns),
        grid=(B, NT),
        in_specs=[
            sspec(), sspec(), sspec(), sspec(),
            pl.BlockSpec((1, HP, WP, C), lambda b, j: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE, D), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2 * C, D), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, k2), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2,), lambda b, j: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE, C), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, HP, WP, C), lambda b, j: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE, D), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, _TILE), lambda b, j: (b, 0, j),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((k2 * C, D), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, k2), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k2), lambda b, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, HP, WP, C), f32),
            jax.ShapeDtypeStruct((B, N, D), cdt),
            jax.ShapeDtypeStruct((B, 2, N), f32),
            jax.ShapeDtypeStruct((k2 * C, D), f32),
            jax.ShapeDtypeStruct((D, k2), f32),
            jax.ShapeDtypeStruct((1, k2), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((_TILE, k2, C), cdt),
            pltpu.VMEM((_TILE, k2, C), cdt),
        ],
        interpret=interpret,
    )(by, bx, wy, wx, src_pad, hidden_bt, w1s, w2, b2, g)
    return dsrc_pad, d_hpre, dflow, dw1s, dw2, db2


# ----------------------------------------------------------------------
# custom-vjp core over the source stream
# ----------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def attn_warp_core(source, flow, hidden_bt, w1s, w2, b2,
                   kernel_size, negative_slope, interpret):
    """Pallas source-stream core.

    source: (B,H,W,C); flow: (B,H,W,2) x,y; hidden_bt: (B,H·W,D) f32 —
    the target-stream dense term *including* b1; w1s: (k²·C, D) source
    half of the first projection; w2: (D,k²); b2: (k²,).
    Returns (B,H,W,C) warped features.
    """
    out, _ = _core_fwd(source, flow, hidden_bt, w1s, w2, b2,
                       kernel_size, negative_slope, interpret)
    return out


def _compute_dtype(source):
    """bf16 internals for bf16 inputs (the production path); fp32 for
    fp32/f64 inputs so CPU interpret-mode parity tests are tight."""
    return jnp.bfloat16 if source.dtype == jnp.bfloat16 else jnp.float32


def _core_fwd(source, flow, hidden_bt, w1s, w2, b2,
              kernel_size, negative_slope, interpret):
    B, H, W, C = source.shape
    k = kernel_size
    cdt = _compute_dtype(source)
    src_pad, by, bx, wy, wx = _prep(source, flow, k)
    out = _warp_fwd_pallas(
        src_pad, by, bx, wy, wx, hidden_bt,
        w1s.astype(cdt), w2.astype(cdt),
        b2.astype(jnp.float32),
        k, negative_slope, source.dtype, cdt, interpret,
    ).reshape(B, H, W, C)
    return out, (source, flow, hidden_bt, w1s, w2, b2)


def _core_bwd(kernel_size, negative_slope, interpret, residuals, g):
    source, flow, hidden_bt, w1s, w2, b2 = residuals
    B, H, W, C = source.shape
    k = kernel_size
    P = k
    cdt = _compute_dtype(source)
    src_pad, by, bx, wy, wx = _prep(source, flow, k)
    dsrc_pad, d_hpre, dflow, dw1s, dw2, db2 = _warp_bwd_pallas(
        src_pad, by, bx, wy, wx, hidden_bt,
        w1s.astype(cdt), w2.astype(cdt),
        b2.astype(jnp.float32),
        g.reshape(B, H * W, C).astype(cdt),
        k, negative_slope, cdt, interpret,
    )
    d_source = _fold_pad(dsrc_pad, H, W, P).astype(source.dtype)
    d_flow = jnp.stack(
        [dflow[:, 1], dflow[:, 0]], axis=-1
    ).reshape(B, H, W, 2).astype(flow.dtype)  # (x, y) channel order
    return (
        d_source,
        d_flow,
        d_hpre.astype(hidden_bt.dtype).reshape(hidden_bt.shape),
        dw1s.astype(w1s.dtype),
        dw2.astype(w2.dtype),
        db2[0].astype(b2.dtype),
    )


attn_warp_core.defvjp(
    lambda *a: _core_fwd(*a),
    _core_bwd,
)


# ----------------------------------------------------------------------
# public op: full ExtractorAttn with the target stream as an XLA conv
# ----------------------------------------------------------------------

def local_attn_warp_fused(source, target, flow, kernel_size,
                          w1, b1, w2, b2, negative_slope=0.1,
                          interpret=False):
    """Drop-in fused equivalent of the XLA composition in
    ops/local_attn.py (concat order [target ‖ source], avg-pool 1/k²
    semantics — base_function.py:799-809).

    w1: (k², 2C, D) with k² index row-major over (i, j) — identical
    layout contract to `local_attn_warp`.
    """
    B, H, W, C = source.shape
    k = kernel_size
    r = k // 2
    D = w1.shape[-1]
    # target stream = k×k stride-1 conv over the edge-padded target; the
    # k² patch index (i,j) maps to conv tap (i,j) directly.
    w1_bt = w1[:, :C, :].reshape(k, k, C, D)
    tgt_pad = jnp.pad(
        target, ((0, 0), (r, k - 1 - r), (r, k - 1 - r), (0, 0)),
        mode="edge",
    )
    # conv in the input dtype; the astype to f32 transposes the f32
    # cotangent back to the conv dtype in backward (a preferred f32
    # accumulation type would leave the conv transpose with mixed dtypes)
    hidden_bt = jax.lax.conv_general_dilated(
        tgt_pad, w1_bt.astype(target.dtype),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32) + b1.astype(jnp.float32)
    hidden_bt = hidden_bt.reshape(B, H * W, D)
    w1_bs = w1[:, C:, :].reshape(k * k * C, D)
    return attn_warp_core(source, flow, hidden_bt, w1_bs, w2, b2,
                          k, negative_slope, interpret)
