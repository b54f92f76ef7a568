"""Fully-fused Pallas warp kernel (ops/pallas_warp.py): interpret-mode
parity with the XLA composition in ops/local_attn.py — values and the
gradients of ALL six differentiable inputs (source, flow, w1, b1, w2, b2).

The XLA composition itself carries f64 check_grads coverage
(tests/test_ops.py) and torch parity (tests/test_torch_parity.py), so
grad-parity against it transitively anchors the kernel to the reference
semantics (model/networks/base_function.py:790-818,
block_extractor_kernel.cu:52-84,151-169)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfla_tpu.ops.local_attn import local_attn_warp
from gfla_tpu.ops.pallas_warp import fused_warp_eligible, local_attn_warp_fused


def _inputs(b=2, h=16, w=16, c=8, k=3, d=16, seed=0, flow_scale=1.5):
    rng = np.random.RandomState(seed)
    src = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    tgt = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    flow = jnp.asarray(
        rng.randn(b, h, w, 2).astype(np.float32) * flow_scale)
    w1 = jnp.asarray(rng.randn(k * k, 2 * c, d).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(d, k * k).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(k * k).astype(np.float32) * 0.1)
    return src, tgt, flow, w1, b1, w2, b2


def _xla(src, tgt, flow, w1, b1, w2, b2, k):
    return local_attn_warp(src, tgt, flow, k, w1, b1, w2, b2,
                           use_pallas=False)


def _fused(src, tgt, flow, w1, b1, w2, b2, k):
    return local_attn_warp_fused(src, tgt, flow, k, w1, b1, w2, b2,
                                 interpret=True)


class TestWarpFusedParity:
    @pytest.mark.parametrize("k,c,d,seed", [(3, 8, 16, 0), (5, 4, 8, 1)])
    def test_fwd_parity(self, k, c, d, seed):
        src, tgt, flow, w1, b1, w2, b2 = _inputs(c=c, k=k, d=d, seed=seed)
        want = _xla(src, tgt, flow, w1, b1, w2, b2, k)
        got = _fused(src, tgt, flow, w1, b1, w2, b2, k)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_fwd_parity_large_flow_edge_clamp(self):
        """Displacements far past the image edge: the kernel's padded-window
        clamp must reproduce the per-tap edge clamp exactly
        (block_extractor_kernel.cu:62-74)."""
        src, tgt, flow, w1, b1, w2, b2 = _inputs(seed=2)
        flow = flow * 40.0  # |flow| up to ~2.5 H
        want = _xla(src, tgt, flow, w1, b1, w2, b2, 3)
        got = _fused(src, tgt, flow, w1, b1, w2, b2, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    # k=5 grads stay covered by the slow tier, the 8-dev GSPMD case and
    # scripts/onchip_warp_parity.py; k=5 *forward* parity stays fast above.
    # (f64 check_grads over six inputs is ~15s of cold compile on 1 core.)
    @pytest.mark.parametrize(
        "k,c,d",
        [(3, 8, 16), pytest.param(5, 4, 8, marks=pytest.mark.slow)],
    )
    def test_grad_parity_all_inputs(self, k, c, d):
        args = _inputs(c=c, k=k, d=d, seed=3)

        def loss_fused(*a):
            return jnp.sum(_fused(*a, k) ** 2)

        def loss_xla(*a):
            return jnp.sum(_xla(*a, k) ** 2)

        g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
        g_xla = jax.grad(loss_xla, argnums=tuple(range(7)))(*args)
        for name, a, b in zip(
            ["source", "target", "flow", "w1", "b1", "w2", "b2"],
            g_fused, g_xla,
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
                err_msg=f"grad mismatch for {name}",
            )

    def test_grad_parity_nonsym_cotangent(self):
        """Structured (non-symmetric) cotangent through the custom VJP."""
        args = _inputs(seed=4)
        rng = np.random.RandomState(5)
        g = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
        _, vjp_f = jax.vjp(lambda *a: _fused(*a, 3), *args)
        _, vjp_x = jax.vjp(lambda *a: _xla(*a, 3), *args)
        for name, a, b in zip(
            ["source", "target", "flow", "w1", "b1", "w2", "b2"],
            vjp_f(g), vjp_x(g),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
                err_msg=f"cotangent mismatch for {name}",
            )

    def test_grad_parity_edge_clamp(self):
        """Gradients with many taps clamped at the image edge: d_flow via
        the tap differences collapses to zero exactly where the XLA path's
        does (tl == bl at the clamp)."""
        src, tgt, flow, w1, b1, w2, b2 = _inputs(seed=6)
        flow = flow * 12.0

        def loss_fused(s, f):
            return jnp.sum(_fused(s, tgt, f, w1, b1, w2, b2, 3) ** 2)

        def loss_xla(s, f):
            return jnp.sum(_xla(s, tgt, f, w1, b1, w2, b2, 3) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1))(src, flow)
        gx = jax.grad(loss_xla, argnums=(0, 1))(src, flow)
        for name, a, b in zip(["source", "flow"], gf, gx):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
                err_msg=f"grad mismatch for {name}",
            )


class TestWarpEligibility:
    def _args(self, b=1, h=32, w=32, c=128, k=3, d=128):
        src = jnp.zeros((b, h, w, c))
        flow = jnp.zeros((b, h, w, 2))
        w1 = jnp.zeros((k * k, 2 * c, d))
        return src, src, flow, k, w1

    def test_live_configs_eligible(self):
        # the two flagship pose attention sites (bench.py fashion config)
        for (h, w, c, k) in [(32, 32, 256, 3), (64, 64, 128, 5)]:
            args = self._args(h=h, w=w, c=c, k=k)
            assert fused_warp_eligible(*args, False, True), (h, w, c, k)

    def test_ineligible_shapes(self):
        ok = self._args()
        assert fused_warp_eligible(*ok, False, True)
        assert not fused_warp_eligible(*ok, True, True)    # return_attn
        assert not fused_warp_eligible(*ok, False, False)  # custom act
        assert not fused_warp_eligible(
            *self._args(c=100), False, True)               # C % 128
        assert not fused_warp_eligible(
            *self._args(h=30, w=30), False, True)          # H·W % 128
        assert not fused_warp_eligible(
            *self._args(h=256, w=256, c=256), False, True)  # VMEM budget

    def test_halo_context_ineligible(self):
        """Under the halo-sharded spatial mesh the kernel (which gathers
        from the full map) must yield to block_extract's shard_map path."""
        from gfla_tpu.parallel import make_mesh_2d, spatial_halo_attention

        mesh = make_mesh_2d(2, 4)
        args = self._args()
        with spatial_halo_attention(mesh, "spatial", halo=8):
            assert not fused_warp_eligible(*args, False, True)
        assert fused_warp_eligible(*args, False, True)

    @pytest.mark.slow  # 21s 8-dev GSPMD case; single-dev parity stays fast
    def test_batch_sharded_jit_matches_1dev(self):
        """The kernel under jit with batch-sharded operands on the 8-dev
        mesh (the multi-chip data-parallel deployment shape) — GSPMD must
        produce the identical value, not mangle the custom call."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        src, tgt, flow, w1, b1, w2, b2 = _inputs(
            b=8, h=16, w=16, c=128, k=3, d=128, seed=9)
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        sh = NamedSharding(mesh, P("data"))
        s_s, t_s, f_s = (jax.device_put(x, sh) for x in (src, tgt, flow))

        def loss(s, t, fl):
            return jnp.sum(_fused(s, t, fl, w1, b1, w2, b2, 3) ** 2)

        v8, g8 = jax.jit(jax.value_and_grad(loss))(s_s, t_s, f_s)
        v1 = loss(src, tgt, flow)
        np.testing.assert_allclose(float(v8), float(v1), rtol=1e-6)
        assert bool(jnp.isfinite(g8).all())

    def test_env_warp_routes_through_kernel(self, monkeypatch):
        """GFLA_ATTN_PALLAS=warp routes an eligible local_attn_warp call
        through the fused kernel (interpret on CPU) with identical output;
        an ineligible shape silently falls back to the XLA path."""
        src, tgt, flow, w1, b1, w2, b2 = _inputs(
            b=1, h=16, w=16, c=128, k=3, d=128, seed=7)
        base = local_attn_warp(src, tgt, flow, 3, w1, b1, w2, b2,
                               use_pallas=False)
        monkeypatch.setenv("GFLA_ATTN_PALLAS", "warp")
        got = local_attn_warp(src, tgt, flow, 3, w1, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   rtol=2e-4, atol=2e-4)
        # ineligible (C % 128 != 0): falls back, still correct
        s2, t2, f2, w1b, b1b, w2b, b2b = _inputs(seed=8)
        got2 = local_attn_warp(s2, t2, f2, 3, w1b, b1b, w2b, b2b)
        want2 = local_attn_warp(s2, t2, f2, 3, w1b, b1b, w2b, b2b,
                                use_pallas=False)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                                   rtol=1e-5, atol=1e-5)
