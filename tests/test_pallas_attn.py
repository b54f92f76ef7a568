"""Pallas fused attention-stage kernel: parity with the jnp composition
(interpret mode on CPU) and gradient pass-through via the custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfla_tpu.ops.pallas_attn import (
    _attn_math_jnp,
    _attn_math_pallas,
    attn_math_fused,
)


def _inputs(n=300, k2=9, c=16, d=32, seed=0):
    rng = np.random.RandomState(seed)
    bs = jnp.asarray(rng.randn(n, k2, c).astype(np.float32))
    bt = jnp.asarray(rng.randn(n, k2, c).astype(np.float32))
    w1 = jnp.asarray(rng.randn(k2, 2 * c, d).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(d).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(d, k2).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(k2).astype(np.float32) * 0.1)
    return bs, bt, w1, b1, w2, b2


class TestPallasAttn:
    def test_parity_interpret(self):
        args = _inputs()
        want = _attn_math_jnp(*args)
        got = _attn_math_pallas(*args, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_parity_nonmultiple_tile(self):
        args = _inputs(n=77, k2=25, c=8, d=16, seed=1)
        want = _attn_math_jnp(*args)
        got = _attn_math_pallas(*args, interpret=True)
        assert got.shape == want.shape == (77, 8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("n,k2,c,d", [(64, 9, 8, 16), (77, 25, 16, 32)])
    def test_custom_vjp_matches_jnp_grads(self, n, k2, c, d):
        """Fused Pallas backward == jnp-composition VJP for ALL six args,
        including a non-tile-multiple N exercising the zero-pad path."""
        args = _inputs(n=n, k2=k2, c=c, d=d, seed=2)

        def loss_fused(*a):
            return jnp.sum(attn_math_fused(*a, 0.1, True) ** 2)

        def loss_ref(*a):
            return jnp.sum(_attn_math_jnp(*a) ** 2)

        g_fused = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
        g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
        for name, a, b in zip(["bs", "bt", "w1", "b1", "w2", "b2"],
                              g_fused, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
                err_msg=f"grad mismatch for {name}",
            )

    def test_bwd_pallas_nonuniform_cotangent(self):
        """Structured (non-symmetric) cotangent through the fused backward."""
        from gfla_tpu.ops.pallas_attn import _attn_math_bwd_pallas

        args = _inputs(n=130, k2=9, c=8, d=16, seed=7)
        rng = np.random.RandomState(8)
        g = jnp.asarray(rng.randn(130, 8).astype(np.float32))
        got = _attn_math_bwd_pallas(args[0], args[1], g, *args[2:],
                                    negative_slope=0.1, interpret=True)
        _, vjp = jax.vjp(lambda *a: _attn_math_jnp(*a), *args)
        want = vjp(g)
        for name, a, b in zip(["bs", "bt", "w1", "b1", "w2", "b2"],
                              got, want):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
                err_msg=f"grad mismatch for {name}",
            )

    def test_local_attn_warp_pallas_flag_parity(self):
        """local_attn_warp(use_pallas=True interpret route) == XLA route."""
        from gfla_tpu.ops import local_attn_warp

        rng = np.random.RandomState(3)
        k, c = 3, 8
        src = jnp.asarray(rng.randn(1, 8, 8, c).astype(np.float32))
        tgt = jnp.asarray(rng.randn(1, 8, 8, c).astype(np.float32))
        flow = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
        w1 = jnp.asarray(rng.randn(k * k, 2 * c, 16).astype(np.float32) * 0.1)
        b1 = jnp.zeros((16,))
        w2 = jnp.asarray(rng.randn(16, k * k).astype(np.float32) * 0.1)
        b2 = jnp.zeros((k * k,))
        base = local_attn_warp(src, tgt, flow, k, w1, b1, w2, b2,
                               use_pallas=False)
        # pallas_call(interpret=...) is engaged through the kernel directly
        from gfla_tpu.ops.block_extract import block_extract, extract_patches

        bs = block_extract(src, flow, k).reshape(-1, k * k, c)
        bt = extract_patches(tgt, k).reshape(-1, k * k, c)
        fused = attn_math_fused(bs, bt, w1, b1, w2, b2, 0.1, True)
        np.testing.assert_allclose(
            np.asarray(fused.reshape(1, 8, 8, c)), np.asarray(base),
            rtol=2e-4, atol=2e-4,
        )


class TestPallasMaxCorr:
    """Flash max-correlation kernel (ops/pallas_corr.py) vs dense
    max/argmax-of-einsum, interpret mode."""

    def _dense(self, s, t):
        corr = jnp.einsum("bsc,btc->bst", s, t)
        return jnp.max(corr, axis=1), jnp.argmax(corr, axis=1).astype(np.int32)

    @pytest.mark.parametrize("ns,nt,c", [(300, 260, 16), (512, 512, 64),
                                         (1100, 700, 8)])
    def test_matches_dense(self, ns, nt, c):
        from gfla_tpu.ops.pallas_corr import max_corr_pallas

        rng = np.random.RandomState(hash((ns, nt, c)) % 2**31)
        s = jnp.asarray(rng.randn(2, ns, c).astype(np.float32))
        t = jnp.asarray(rng.randn(2, nt, c).astype(np.float32))
        cm, am = max_corr_pallas(s, t, interpret=True)
        cm0, am0 = self._dense(s, t)
        np.testing.assert_allclose(np.asarray(cm), np.asarray(cm0),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(am), np.asarray(am0))

    def test_loss_path_env_switch(self, monkeypatch):
        """GFLA_PALLAS_CORR=1 routes the loss's correlation through the
        kernel (interpret on CPU) with identical value + gradients."""
        from gfla_tpu.losses.perceptual import _chunked_max_correlation

        rng = np.random.RandomState(11)
        s = jnp.asarray(rng.randn(1, 400, 8).astype(np.float32))
        t = jnp.asarray(rng.randn(1, 380, 8).astype(np.float32))

        def loss(a, b):
            return jnp.sum(_chunked_max_correlation(a, b) ** 2)

        v0, g0 = jax.value_and_grad(loss, argnums=(0, 1))(s, t)
        monkeypatch.setenv("GFLA_PALLAS_CORR", "1")
        v1, g1 = jax.value_and_grad(loss, argnums=(0, 1))(s, t)
        np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
        for a, b in zip(g1, g0):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)
