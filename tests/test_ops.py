"""Parity + gradient tests for the core ops.

Each op is checked against an independent numpy loop implementation written
directly from the reference kernels' documented semantics (SURVEY.md §2.1),
and gradients are verified with jax.test_util.check_grads (replacing the
reference's torch.autograd.gradcheck scripts,
e.g. block_extractor/test_block_extractor.py:74-78).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from gfla_tpu.ops import (
    block_extract,
    blocks_to_tiles,
    extract_patches,
    gaussian_resample,
    local_attn_reshape,
    local_attn_reshape_inverse,
    local_attn_warp,
    tiles_to_blocks,
)



from contextlib import contextmanager


@contextmanager
def x64():
    """check_grads needs float64 — fp32 finite differences are too noisy."""
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)


# ----------------------------------------------------------------------------
# numpy references (independent loop implementations of the CUDA semantics)
# ----------------------------------------------------------------------------

def np_block_extract_tiles(source, flow, k):
    """source (B,Hs,Ws,C), flow (B,Hf,Wf,2)->(x,y); returns tiles (B,kHf,kWf,C)."""
    B, Hs, Ws, C = source.shape
    _, Hf, Wf, _ = flow.shape
    out = np.zeros((B, k * Hf, k * Wf, C), dtype=source.dtype)
    for b in range(B):
        for y in range(k * Hf):
            for x in range(k * Wf):
                yf, xf = y // k, x // k
                yo, xo = y % k - k // 2, x % k - k // 2
                dy = flow[b, yf, xf, 1] + yo + yf
                dx = flow[b, yf, xf, 0] + xo + xf
                yT = int(np.clip(np.floor(dy), 0, Hs - 1))
                yB = int(np.clip(np.floor(dy) + 1, 0, Hs - 1))
                xL = int(np.clip(np.floor(dx), 0, Ws - 1))
                xR = int(np.clip(np.floor(dx) + 1, 0, Ws - 1))
                fy = dy - np.floor(dy)
                fx = dx - np.floor(dx)
                out[b, y, x] = (
                    (1 - fy) * (1 - fx) * source[b, yT, xL]
                    + (1 - fy) * fx * source[b, yT, xR]
                    + fy * (1 - fx) * source[b, yB, xL]
                    + fy * fx * source[b, yB, xR]
                )
    return out


def np_gaussian_resample(source, flow, k, dil, sigma):
    B, H, W, C = source.shape
    out = np.zeros_like(source)
    for b in range(B):
        for y in range(H):
            for x in range(W):
                dx, dy = flow[b, y, x, 0], flow[b, y, x, 1]
                xf, yf = x + dx, y + dy
                a, bb = xf - np.floor(xf), yf - np.floor(yf)
                val = np.zeros(C, source.dtype)
                tot = 0.0
                for fy in range(k // 2):
                    yT = int(np.clip(np.floor(yf) - fy * dil, 0, H - 1))
                    yB = int(np.clip(np.floor(yf) + (fy + 1) * dil, 0, H - 1))
                    dT = fy * dil + bb
                    dB = (fy + 1) * dil - bb
                    wT = np.exp(-dT * dT / (2 * sigma * sigma))
                    wB = np.exp(-dB * dB / (2 * sigma * sigma))
                    for fx in range(k // 2):
                        xL = int(np.clip(np.floor(xf) - fx * dil, 0, W - 1))
                        xR = int(np.clip(np.floor(xf) + (fx + 1) * dil, 0, W - 1))
                        dL = fx * dil + a
                        dR = (fx + 1) * dil - a
                        wL = np.exp(-dL * dL / (2 * sigma * sigma))
                        wR = np.exp(-dR * dR / (2 * sigma * sigma))
                        val += wT * wL * source[b, yT, xL] + wT * wR * source[b, yT, xR]
                        val += wB * wL * source[b, yB, xL] + wB * wR * source[b, yB, xR]
                        tot += wT * wL + wT * wR + wB * wL + wB * wR
                out[b, y, x] = val / tot
    return out


# ----------------------------------------------------------------------------
# block_extract
# ----------------------------------------------------------------------------

class TestBlockExtract:
    @pytest.mark.parametrize("k", [3, 4, 5])
    def test_parity_random_flow(self, k):
        rng = np.random.RandomState(0)
        src = rng.randn(2, 9, 7, 5).astype(np.float32)
        flow = (rng.randn(2, 9, 7, 2) * 1.8).astype(np.float32)
        got = blocks_to_tiles(block_extract(jnp.array(src), jnp.array(flow), k), k)
        want = np_block_extract_tiles(src, flow, k)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    def test_source_resolution_differs_from_flow(self):
        rng = np.random.RandomState(1)
        src = rng.randn(1, 12, 10, 3).astype(np.float32)
        flow = (rng.randn(1, 6, 5, 2) * 2.0).astype(np.float32)
        got = blocks_to_tiles(block_extract(jnp.array(src), jnp.array(flow), 3), 3)
        want = np_block_extract_tiles(src, flow, 3)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    def test_zero_flow_matches_extract_patches(self):
        rng = np.random.RandomState(2)
        src = jnp.array(rng.randn(2, 8, 6, 4).astype(np.float32))
        zero = jnp.zeros((2, 8, 6, 2), jnp.float32)
        a = block_extract(src, zero, 3)
        b = extract_patches(src, 3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)

    def test_grads(self):
        rng = np.random.RandomState(3)
        with x64():
            src = jnp.array(rng.randn(1, 6, 5, 2))
            # keep flow away from integer lattice points (floor kinks)
            flow = jnp.array(rng.rand(1, 6, 5, 2) * 1.6 + 0.2)
            f = lambda s, fl: jnp.sum(jnp.sin(block_extract(s, fl, 3)))
            check_grads(f, (src, flow), order=1, modes=["rev"],
                        atol=1e-4, rtol=1e-4)

    def test_tiles_roundtrip(self):
        rng = np.random.RandomState(4)
        blocks = jnp.array(rng.randn(2, 3, 4, 9, 5).astype(np.float32))
        rt = tiles_to_blocks(blocks_to_tiles(blocks, 3), 3)
        np.testing.assert_array_equal(np.asarray(rt), np.asarray(blocks))


# ----------------------------------------------------------------------------
# local_attn_reshape
# ----------------------------------------------------------------------------

class TestLocalAttnReshape:
    def test_tile_layout(self):
        # arange channel pattern: tile (i, j) of cell (y, x) = channel i*k+j
        k = 3
        x = jnp.broadcast_to(jnp.arange(k * k, dtype=jnp.float32), (1, 2, 2, k * k))
        tiles = local_attn_reshape(x, k)
        t = np.asarray(tiles)[0, :, :, 0]
        for y in range(2 * k):
            for xx in range(2 * k):
                assert t[y, xx] == (y % k) * k + xx % k

    def test_roundtrip(self):
        rng = np.random.RandomState(5)
        x = jnp.array(rng.randn(2, 4, 3, 16).astype(np.float32))
        rt = local_attn_reshape_inverse(local_attn_reshape(x, 4), 4)
        np.testing.assert_array_equal(np.asarray(rt), np.asarray(x))

    def test_grads(self):
        with x64():
            x = jnp.array(np.random.RandomState(6).randn(1, 3, 3, 4))
            f = lambda v: jnp.sum(local_attn_reshape(v, 2) ** 2)
            check_grads(f, (x,), order=1, modes=["rev"], atol=1e-6, rtol=1e-6)


# ----------------------------------------------------------------------------
# gaussian_resample
# ----------------------------------------------------------------------------

class TestGaussianResample:
    @pytest.mark.parametrize("k,dil,sigma", [(2, 1, 5.0), (4, 1, 2.0), (4, 2, 2.0)])
    def test_parity(self, k, dil, sigma):
        rng = np.random.RandomState(7)
        src = rng.randn(2, 8, 7, 3).astype(np.float32)
        flow = (rng.randn(2, 8, 7, 2) * 1.5).astype(np.float32)
        got = gaussian_resample(jnp.array(src), jnp.array(flow), k, dil, sigma)
        want = np_gaussian_resample(src, flow, k, dil, sigma)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    def test_grads(self):
        rng = np.random.RandomState(8)
        with x64():
            src = jnp.array(rng.randn(1, 6, 6, 2))
            # keep fractional parts away from integer crossings (floor kinks)
            flow = jnp.array(rng.rand(1, 6, 6, 2) * 0.2 + 0.4)
            f = lambda s, fl: jnp.sum(
                jnp.cos(gaussian_resample(s, fl, 4, 1, 2.0)))
            check_grads(f, (src, flow), order=1, modes=["rev"],
                        atol=1e-4, rtol=1e-4)


# ----------------------------------------------------------------------------
# fused local attention
# ----------------------------------------------------------------------------

class TestLocalAttnWarp:
    def _params(self, k, c, d=16, seed=9):
        rng = np.random.RandomState(seed)
        w1 = jnp.array(rng.randn(k * k, 2 * c, d).astype(np.float32) * 0.1)
        b1 = jnp.array(rng.randn(d).astype(np.float32) * 0.1)
        w2 = jnp.array(rng.randn(d, k * k).astype(np.float32) * 0.1)
        b2 = jnp.array(rng.randn(k * k).astype(np.float32) * 0.1)
        return w1, b1, w2, b2

    def test_matches_unfused_composition(self):
        """Fused op == explicit extract→dense→softmax→tile→avgpool pipeline."""
        k, c = 3, 4
        rng = np.random.RandomState(10)
        src = jnp.array(rng.randn(2, 6, 5, c).astype(np.float32))
        tgt = jnp.array(rng.randn(2, 6, 5, c).astype(np.float32))
        flow = jnp.array((rng.randn(2, 6, 5, 2) * 1.5).astype(np.float32))
        w1, b1, w2, b2 = self._params(k, c)

        out = local_attn_warp(src, tgt, flow, k, w1, b1, w2, b2)

        # unfused: exactly the reference composition in our layout
        bs = block_extract(src, flow, k)
        bt = block_extract(tgt, jnp.zeros_like(flow), k)
        cat = jnp.concatenate([bt, bs], -1)
        h = jax.nn.leaky_relu(jnp.einsum("bhwkc,kcd->bhwd", cat, w1) + b1, 0.1)
        logits = jnp.einsum("bhwd,dk->bhwk", h, w2) + b2
        attn = jax.nn.softmax(logits, -1)
        # tile layout route: attn tiles * block tiles, then k×k average pool
        attn_tiles = local_attn_reshape(attn, k)
        bs_tiles = blocks_to_tiles(bs, k)
        prod = attn_tiles * bs_tiles
        B, kH, kW, C = prod.shape
        pooled = prod.reshape(B, kH // k, k, kW // k, k, C).mean(axis=(2, 4))

        np.testing.assert_allclose(
            np.asarray(out), np.asarray(pooled), rtol=1e-5, atol=1e-5
        )

    def test_attention_normalised(self):
        k, c = 3, 4
        rng = np.random.RandomState(11)
        src = jnp.array(rng.randn(1, 4, 4, c).astype(np.float32))
        tgt = jnp.array(rng.randn(1, 4, 4, c).astype(np.float32))
        flow = jnp.zeros((1, 4, 4, 2), jnp.float32)
        w1, b1, w2, b2 = self._params(k, c)
        attn, _ = local_attn_warp(src, tgt, flow, k, w1, b1, w2, b2, return_attn=True)
        np.testing.assert_allclose(
            np.asarray(attn.sum(-1)), np.ones((1, 4, 4)), rtol=1e-5
        )

    def test_grads(self):
        k, c = 3, 2
        rng = np.random.RandomState(12)
        src = jnp.array(rng.randn(1, 4, 4, c).astype(np.float32))
        tgt = jnp.array(rng.randn(1, 4, 4, c).astype(np.float32))
        flow = jnp.array((rng.rand(1, 4, 4, 2) + 0.25).astype(np.float32))
        w1, b1, w2, b2 = self._params(k, c, d=8)
        f = lambda s, t, fl, a, bb, cc, dd: jnp.sum(
            local_attn_warp(s, t, fl, k, a, bb, cc, dd)
        )
        with x64():
            args64 = tuple(jnp.asarray(np.asarray(v), jnp.float64)
                           for v in (src, tgt, flow, w1, b1, w2, b2))
            check_grads(f, args64, order=1, modes=["rev"],
                        atol=1e-4, rtol=1e-4)


# ----------------------------------------------------------------------------
# halo-sharded block_extract (spatial mesh, shard_map + ppermute)
# ----------------------------------------------------------------------------

class TestBlockExtractHalo:
    """Halo-sharded gather over the 2-axis mesh equals the replicated path
    for in-window flows, carries exact gradients, and compiles to
    collective-permute halo exchange (no full-operand all-gather)."""

    def _inputs(self, B=2, H=16, W=12, C=5, max_dy=2.5, seed=7):
        rng = np.random.RandomState(seed)
        src = rng.randn(B, H, W, C).astype(np.float32)
        flow = np.stack(
            [
                rng.randn(B, H, W).astype(np.float32) * 3.0,       # x: free
                rng.uniform(-max_dy, max_dy, (B, H, W)).astype(np.float32),
            ],
            axis=-1,
        )
        # keep fractions off the floor lattice for the gradient check
        flow += 0.3
        return jnp.asarray(src), jnp.asarray(flow)

    def test_matches_replicated(self):
        from gfla_tpu.parallel import make_mesh_2d, spatial_halo_attention

        src, flow = self._inputs()
        k = 3
        base = block_extract(src, flow, k)
        mesh = make_mesh_2d(2, 4)
        with spatial_halo_attention(mesh, halo=4):
            got = block_extract(src, flow, k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   rtol=1e-6, atol=1e-6)

    @pytest.mark.slow  # multi-dev shard_map grads; value parity stays fast
    def test_grads_match_replicated(self):
        from gfla_tpu.parallel import make_mesh_2d, spatial_halo_attention

        # H=16 keeps 4 rows/shard so halo=4 covers max_dy+k//2 (smaller
        # shards force halo=rows/shard and the test flows leave the window)
        src, flow = self._inputs(B=1, H=16, W=6, C=3)
        k = 3
        f = lambda s, fl: jnp.sum(jnp.sin(block_extract(s, fl, k)))
        g_base = jax.grad(f, argnums=(0, 1))(src, flow)
        mesh = make_mesh_2d(2, 4)
        with spatial_halo_attention(mesh, halo=4):
            g_halo = jax.grad(f, argnums=(0, 1))(src, flow)
        for a, b in zip(g_halo, g_base):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)

    @pytest.mark.slow  # multi-dev halo clamp semantics
    def test_out_of_window_clamps_like_edge(self):
        """|flow_y| beyond the halo freezes at the window edge (the same
        clamp semantics the reference applies at the image edge) - the op
        stays finite and in-window cells are unaffected."""
        from gfla_tpu.parallel import make_mesh_2d, spatial_halo_attention

        src, flow = self._inputs()
        big = np.array(flow, copy=True)
        big[0, 5, :, 1] = 30.0  # way past the halo
        big = jnp.asarray(big)
        mesh = make_mesh_2d(2, 4)
        k = 3
        with spatial_halo_attention(mesh, halo=4):
            got = block_extract(src, big, k)
        assert bool(jnp.isfinite(got).all())
        base = block_extract(src, flow, k)
        with spatial_halo_attention(mesh, halo=4):
            got_in = block_extract(src, flow, k)
        np.testing.assert_allclose(np.asarray(got_in), np.asarray(base),
                                   rtol=1e-6, atol=1e-6)

    def test_hlo_uses_collective_permute_not_all_gather(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from gfla_tpu.parallel import make_mesh_2d, spatial_halo_attention

        src, flow = self._inputs()
        k = 3
        mesh = make_mesh_2d(2, 4)
        sh = NamedSharding(mesh, P("data", "spatial"))
        with spatial_halo_attention(mesh, halo=4):
            txt = (
                jax.jit(lambda s, fl: block_extract(s, fl, k))
                .lower(jax.ShapeDtypeStruct(src.shape, src.dtype, sharding=sh),
                       jax.ShapeDtypeStruct(flow.shape, flow.dtype, sharding=sh))
                .compile()
                .as_text()
            )
        assert "collective-permute" in txt
        assert "all-gather" not in txt
