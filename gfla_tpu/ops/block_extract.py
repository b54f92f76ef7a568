"""Flow-guided k×k block extraction — TPU-native formulation.

Capability parity with the reference CUDA op ``BlockExtractor``
(reference: model/networks/block_extractor/block_extractor_kernel.cu:52-84):
for every flow cell (y, x) extract the k×k neighbourhood of `source`
centred at the flow-displaced location (y + flow_y, x + flow_x), sampling
each neighbour bilinearly with edge-clamped taps.

TPU-first design, instead of a per-output-pixel scalar kernel:

* All k² offsets of one cell share the same fractional bilinear weights,
  because offsets are integer shifts. So one (k+1)×(k+1) integer patch
  gather per cell provides every tap for all k² offsets, and the bilinear
  combine is a shift-and-blend over that patch — (k+1)² gathered taps per
  cell instead of 4·k².
* The gather is one flat `take_along_axis` over a (B, Hs·Ws, C) view —
  a single XLA gather that the TPU backend handles natively; the blend is
  elementwise VPU work fused by XLA.
* Zero-flow extraction (used for the target stream of the local attention
  and by the affine regularisation loss) degenerates to pure pad+shift —
  no gather at all (`extract_patches`).
* Gradients come from autodiff: the gather transposes to a scatter-add
  (matching the reference's atomicAdd backward,
  block_extractor_kernel.cu:151-169) and the fractional weights carry the
  analytic flow gradient (floor() has zero gradient, matching the
  reference's treatment of taps as constants).

Layout: NHWC. Flow is (B, Hf, Wf, 2) with channel 0 = x-displacement and
channel 1 = y-displacement, in source-pixel units (matching
block_extractor_kernel.cu:62-63). `source` may have a different spatial
resolution than `flow` (the reference allows this; block_extractor.py:13-16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _patch_gather(source: jax.Array, flow: jax.Array, kernel_size: int):
    """Gather the (k+1)×(k+1) integer tap patch for every flow cell.

    Returns (patch, wy, wx):
      patch: (B, Hf, Wf, k+1, k+1, C) edge-clamped integer taps
      wy, wx: (B, Hf, Wf) fractional bilinear weights shared by all offsets
    """
    B, Hs, Ws, C = source.shape
    _, Hf, Wf, _ = flow.shape
    k = kernel_size
    r = k // 2

    ys = jnp.arange(Hf, dtype=flow.dtype)
    xs = jnp.arange(Wf, dtype=flow.dtype)
    dy = flow[..., 1] + ys[None, :, None]  # (B, Hf, Wf) absolute source y
    dx = flow[..., 0] + xs[None, None, :]

    fy = jnp.floor(dy)
    fx = jnp.floor(dx)
    wy = dy - fy  # fractional parts; grad d(wy)/d(flow_y) = 1
    wx = dx - fx

    offs = jnp.arange(k + 1, dtype=jnp.int32) - r
    iy = jnp.clip(fy.astype(jnp.int32)[..., None] + offs, 0, Hs - 1)  # (B,Hf,Wf,k+1)
    ix = jnp.clip(fx.astype(jnp.int32)[..., None] + offs, 0, Ws - 1)

    flat = iy[..., :, None] * Ws + ix[..., None, :]  # (B, Hf, Wf, k+1, k+1)
    src = source.reshape(B, Hs * Ws, C)
    patch = jnp.take_along_axis(
        src, flat.reshape(B, Hf * Wf * (k + 1) * (k + 1), 1), axis=1
    )
    patch = patch.reshape(B, Hf, Wf, k + 1, k + 1, C)
    return patch, wy, wx


def _patch_gather_halo(source, flow, kernel_size, mesh, axis, halo):
    """Halo-sharded variant of `_patch_gather` for H-sharded operands.

    Under a (data × spatial) mesh the plain gather forces GSPMD to
    all-gather the full source operand. Here each row-shard exchanges its
    ±halo boundary rows with its neighbours (two `lax.ppermute`s over ICI)
    and gathers from the extended local window; row indices are clamped to
    the window, so flows with |flow_y| + k//2 ≤ halo are bit-exact with
    the replicated path (larger displacements clamp — the same freeze
    semantics as the reference's image-edge clamp, applied at the window
    edge). Requires source and flow at the same resolution (all live
    attention call sites) and halo ≤ rows-per-shard (one neighbour each
    side)."""
    from jax.sharding import PartitionSpec as P

    k = kernel_size
    r = k // 2
    B, Hs, Ws, C = source.shape
    assert source.shape[:3] == flow.shape[:3], (
        "halo-sharded block_extract requires source and flow at the same "
        f"resolution, got {source.shape} vs {flow.shape}"
    )
    sp = mesh.shape[axis]
    Hl = Hs // sp
    h = min(int(halo), Hl)
    perm_up = [(i, (i - 1) % sp) for i in range(sp)]    # head rows → prev
    perm_down = [(i, (i + 1) % sp) for i in range(sp)]  # tail rows → next

    def local_fn(src, fl):
        # src/fl: (B, Hl, W, ...) local shards
        import os

        if os.environ.get("GFLA_HALO_DEBUG", "0") == "1":
            # debug guard (cheap reduction, env-gated): rows whose
            # |flow_y| + k//2 exceeds the halo freeze at the window edge —
            # surface it instead of silently diverging from the
            # replicated path
            over = jnp.max(jnp.abs(fl[..., 1])) + r - h
            jax.lax.cond(
                over > 0,
                lambda: jax.debug.print(
                    "WARNING: halo-sharded gather clamped: max|flow_y|+k//2 "
                    "exceeds halo={h} by {o:.1f} rows (raise --halo)",
                    h=h, o=over),
                lambda: None,
            )
        idx = jax.lax.axis_index(axis)
        r0 = idx * Hl
        below = jax.lax.ppermute(src[:, :h], axis, perm_up)
        above = jax.lax.ppermute(src[:, -h:], axis, perm_down)
        # rows r0-h … r0+Hl-1+h; wrap-around garbage at the outer shards
        # is never indexed (global row clamp keeps indices in-image)
        ext = jnp.concatenate([above, src, below], axis=1)

        ys = jnp.arange(Hl, dtype=fl.dtype) + jnp.asarray(r0, fl.dtype)
        xs = jnp.arange(Ws, dtype=fl.dtype)
        dy = fl[..., 1] + ys[None, :, None]
        dx = fl[..., 0] + xs[None, None, :]
        fy = jnp.floor(dy)
        fx = jnp.floor(dx)
        wy = dy - fy
        wx = dx - fx
        offs = jnp.arange(k + 1, dtype=jnp.int32) - r
        iy = jnp.clip(fy.astype(jnp.int32)[..., None] + offs, 0, Hs - 1)
        iy = jnp.clip(iy - (r0 - h), 0, Hl + 2 * h - 1)  # window clamp
        ix = jnp.clip(fx.astype(jnp.int32)[..., None] + offs, 0, Ws - 1)
        flat = iy[..., :, None] * Ws + ix[..., None, :]
        src2 = ext.reshape(B, (Hl + 2 * h) * Ws, C)
        patch = jnp.take_along_axis(
            src2, flat.reshape(B, Hl * Ws * (k + 1) * (k + 1), 1), axis=1
        )
        return patch.reshape(B, Hl, Ws, k + 1, k + 1, C), wy, wx

    spec = P(None, axis)
    return jax.shard_map(
        local_fn, mesh=mesh, axis_names={axis},
        in_specs=(spec, spec), out_specs=(spec, spec, spec),
    )(source, flow)


def block_extract(source: jax.Array, flow: jax.Array, kernel_size: int) -> jax.Array:
    """Extract flow-displaced k×k blocks of `source`.

    Args:
      source: (B, Hs, Ws, C) feature map.
      flow:   (B, Hf, Wf, 2) flow field, last dim (x, y), source-pixel units.
      kernel_size: block side k.

    Returns:
      (B, Hf, Wf, k*k, C) blocks; index k² is row-major over (i, j) block
      offsets, i.e. position (i, j) samples source at
      (y + flow_y + i - k//2, x + flow_x + j - k//2) bilinearly.

    The reference returns the tile layout (B, C, k·Hf, k·Wf); use
    `blocks_to_tiles` to convert for parity checks. Internally the
    (B, H, W, k², C) layout feeds the attention einsum directly.
    """
    k = kernel_size
    from gfla_tpu.parallel import get_spatial_halo

    mesh, axis, halo = get_spatial_halo()
    if mesh is not None and source.shape[:3] == flow.shape[:3] \
            and source.shape[1] % mesh.shape[axis] == 0:
        patch, wy, wx = _patch_gather_halo(source, flow, k, mesh, axis, halo)
    else:
        patch, wy, wx = _patch_gather(source, flow, k)
    wy = wy[..., None, None, None]
    wx = wx[..., None, None, None]

    tl = patch[:, :, :, 0:k, 0:k]
    tr = patch[:, :, :, 0:k, 1 : k + 1]
    bl = patch[:, :, :, 1 : k + 1, 0:k]
    br = patch[:, :, :, 1 : k + 1, 1 : k + 1]

    block = (
        (1.0 - wy) * (1.0 - wx) * tl
        + (1.0 - wy) * wx * tr
        + wy * (1.0 - wx) * bl
        + wy * wx * br
    )  # (B, Hf, Wf, k, k, C)
    B, Hf, Wf = block.shape[:3]
    return block.reshape(B, Hf, Wf, k * k, -1)


def extract_patches(x: jax.Array, kernel_size: int) -> jax.Array:
    """Zero-flow block extraction: edge-clamped k×k patches, no gather.

    Equivalent to `block_extract(x, zeros, k)` (the bilinear taps collapse
    to exact integer reads), but expressed as pad + static shifts so XLA
    emits no gather at all. Used for the target stream of local attention
    (reference base_function.py:806 extracts the target with zero flow).

    Returns (B, H, W, k*k, C).
    """
    k = kernel_size
    r = k // 2
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (r, k - 1 - r), (r, k - 1 - r), (0, 0)), mode="edge")
    shifts = [
        xp[:, i : i + H, j : j + W, :] for i in range(k) for j in range(k)
    ]
    return jnp.stack(shifts, axis=3)  # (B, H, W, k², C)


def blocks_to_tiles(blocks: jax.Array, kernel_size: int) -> jax.Array:
    """(B, H, W, k², C) → (B, k·H, k·W, C) tile layout (reference output layout).

    tile[y, x] = blocks[y//k, x//k, (y%k)*k + (x%k)] — pure reshape/transpose.
    """
    k = kernel_size
    B, H, W, K2, C = blocks.shape
    t = blocks.reshape(B, H, W, k, k, C)
    t = t.transpose(0, 1, 3, 2, 4, 5)  # (B, H, k, W, k, C)
    return t.reshape(B, H * k, W * k, C)


def tiles_to_blocks(tiles: jax.Array, kernel_size: int) -> jax.Array:
    """Inverse of `blocks_to_tiles`: (B, k·H, k·W, C) → (B, H, W, k², C)."""
    k = kernel_size
    B, kH, kW, C = tiles.shape
    H, W = kH // k, kW // k
    t = tiles.reshape(B, H, k, W, k, C)
    t = t.transpose(0, 1, 3, 2, 4, 5)
    return t.reshape(B, H, W, k * k, C)
