"""Shape/behavior tests for generators, discriminators, and losses.

Config mirrors the shipped fashion pose config (SURVEY.md §6: ngf=64,
img_f=512, layers=3, attn_layer=(2,3), kernel 2→5 / 3→3, instance norm,
LeakyReLU) at reduced spatial size for CPU speed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfla_tpu.losses import (
    AffineRegularizationLoss,
    MultiAffineRegularizationLoss,
    PerceptualCorrectness,
    adversarial_loss,
    gram_matrix,
    vgg_content_style_loss,
)
from gfla_tpu.models import define_d, define_g
from gfla_tpu.models.vgg import VGG19, load_vgg19_params

# Spatial dims must be divisible by 2^5 (the flow U-Net's 5 encoder levels);
# the reference trains at 256×256 (fashion) / 128×64 (market).
B, H, W = 1, 64, 32
POSE_KW = dict(
    image_nc=3, structure_nc=18, ngf=64, img_f=512, layers=3, num_blocks=2,
    norm_type="instance", activation="LeakyReLU", attn_layer=(2, 3),
    extractor_kz={"2": 5, "3": 3}, use_spect=False,
)


def _pose_inputs():
    rng = np.random.RandomState(0)
    src = jnp.array(rng.rand(B, H, W, 3).astype(np.float32) * 2 - 1)
    bp1 = jnp.array(rng.rand(B, H, W, 18).astype(np.float32))
    bp2 = jnp.array(rng.rand(B, H, W, 18).astype(np.float32))
    return src, bp1, bp2


class TestPoseGenerator:
    def test_forward_shapes(self):
        model = define_g("pose", **POSE_KW)
        src, bp1, bp2 = _pose_inputs()
        variables = model.init(jax.random.PRNGKey(0), src, bp1, bp2)
        img, flows, masks = model.apply(variables, src, bp1, bp2)
        assert img.shape == (B, H, W, 3)
        assert np.asarray(jnp.abs(img)).max() <= 1.0  # tanh output
        # coarse→fine: attn_layer (2,3) → flows at H/8 then H/4
        assert flows[0].shape == (B, H // 8, W // 8, 2)
        assert flows[1].shape == (B, H // 4, W // 4, 2)
        assert masks[0].shape == (B, H // 8, W // 8, 1)
        m = np.asarray(masks[1])
        assert (m >= 0).all() and (m <= 1).all()  # sigmoid masks

    def test_flow_pretrain_head_params_nest_inside_pose(self):
        """Two-stage protocol (SURVEY.md §3.4): poseflownet params must load
        into PoseGenerator.flow_net by matching subtree names."""
        src, bp1, bp2 = _pose_inputs()
        flow_gen = define_g(
            "poseflownet", attn_layer=(2, 3), norm_type="instance",
            activation="LeakyReLU",
        )
        fvars = flow_gen.init(jax.random.PRNGKey(0), src, bp1, bp2)
        pose = define_g("pose", **POSE_KW)
        pvars = pose.init(jax.random.PRNGKey(0), src, bp1, bp2)
        f_tree = jax.tree_util.tree_map(
            lambda x: x.shape, fvars["params"]["flow_net"]
        )
        p_tree = jax.tree_util.tree_map(
            lambda x: x.shape, pvars["params"]["flow_net"]
        )
        assert f_tree == p_tree

    def test_hooks(self):
        model = define_g("pose", **POSE_KW)
        src, bp1, bp2 = _pose_inputs()
        variables = model.init(jax.random.PRNGKey(0), src, bp1, bp2)
        img, flows, masks, hooks = model.apply(
            variables, src, bp1, bp2, return_hooks=True
        )
        assert len(hooks["attn"]) == 2
        assert hooks["attn"][0].shape[-1] == 9   # k=3 at layer 3
        assert hooks["attn"][1].shape[-1] == 25  # k=5 at layer 2


class TestDiscriminators:
    # layers=3 (vs the live 4): one block fewer halves cold compile on the
    # 1-core gate host; the registry + spectral-norm path is what this
    # covers — exact per-layer numerics are in test_torch_parity.py.
    def test_res_discriminator(self):
        d = define_d("res", ndf=32, img_f=128, layers=3, use_spect=True)
        x = jnp.zeros((B, H, W, 3))
        variables = d.init(jax.random.PRNGKey(0), x)
        out = d.apply(variables, x, mutable=["batch_stats"])[0]
        assert out.shape == (B, H // 8, W // 8, 1)

    def test_temporal_discriminator(self):
        d = define_d("temporal", input_length=6, ndf=16, img_f=64, layers=3,
                     use_spect=True)
        x = jnp.zeros((1, 6, 32, 32, 3))
        variables = d.init(jax.random.PRNGKey(0), x)
        out = d.apply(variables, x, mutable=["batch_stats"])[0]
        assert out.shape[0] == 1 and out.shape[-1] == 1


class TestShapeNet:
    def test_forward(self):
        # target decodes from 8×8 through 2+layers ups: 8·2^(2+layers) = img
        model = define_g(
            "shapenet", image_nc=3, structure_nc=21, ngf=32, img_f=256,
            layers=1, num_blocks=2, norm_type="instance",
            activation="LeakyReLU", attn_layer=(1,), extractor_kz={"1": 3},
            use_spect=False,
        )
        rng = np.random.RandomState(1)
        src = jnp.array(rng.rand(1, 64, 64, 3).astype(np.float32))
        sb = jnp.array(rng.rand(1, 1, 1, 21).astype(np.float32))
        tb = jnp.array(rng.rand(1, 1, 1, 21).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), src, sb, tb)
        img, flows, masks = model.apply(variables, src, sb, tb)
        assert img.shape == (1, 64, 64, 3)
        assert len(flows) == 1
        assert flows[0].shape == (1, 32, 32, 2)


class TestRecurrentGenerators:
    @staticmethod
    def _build(name):
        nc = 16 if name == "face" else 18
        model = define_g(
            name, image_nc=3, structure_nc=nc, ngf=16, img_f=64, layers=3,
            num_blocks=2, norm_type="instance", activation="LeakyReLU",
            attn_layer=(2, 3), extractor_kz={"2": 5, "3": 3}, use_spect=False,
        )
        rng = np.random.RandomState(2)
        T, h, w = 3, 32, 32
        bp = jnp.array(rng.rand(1, T, h, w, nc).astype(np.float32))
        p_ref = jnp.array(rng.rand(1, h, w, 3).astype(np.float32))
        bp_ref = jnp.array(rng.rand(1, h, w, nc).astype(np.float32))
        return model, bp, p_ref, bp_ref

    # dance stays in the fast gate (it exercises the shared FaceTargetNet
    # + scan recurrence); face's split-flow specifics are covered by the
    # slow-tier task/scan tests
    @pytest.mark.parametrize(
        "name",
        [pytest.param("face", marks=pytest.mark.slow), "dance"],
    )
    def test_forward(self, name):
        model, bp, p_ref, bp_ref = self._build(name)
        T, h, w = bp.shape[1:4]
        variables = model.init(jax.random.PRNGKey(0), bp, p_ref, bp_ref)
        gen, flows, masks, prev = model.apply(variables, bp, p_ref, bp_ref)
        assert gen.shape == (1, T, h, w, 3)
        assert prev.shape == (1, T, h, w, 3)
        # [p,r] interleaved per level, stacked over frames: (B, T, h, w, 2)
        assert len(flows) == 4
        assert flows[0].shape == (1, T, h // 8, w // 8, 2)
        assert masks[3].shape == (1, T, h // 4, w // 4, 1)

    @pytest.mark.slow
    @pytest.mark.parametrize("name", ["face", "dance"])
    def test_scan_matches_unrolled(self, name):
        """The lax.scan recurrence computes the identical function to the
        unrolled frame loop (the reference semantics, generator.py:284-316)."""
        model, bp, p_ref, bp_ref = self._build(name)
        variables = model.init(jax.random.PRNGKey(0), bp, p_ref, bp_ref)
        out_s = model.apply(variables, bp, p_ref, bp_ref, use_scan=True)
        out_u = model.apply(variables, bp, p_ref, bp_ref, use_scan=False)
        for a, b in zip(jax.tree_util.tree_leaves(out_s),
                        jax.tree_util.tree_leaves(out_u)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)

    @pytest.mark.parametrize("name", ["face", "dance"])
    @pytest.mark.slow
    def test_remat_matches(self, name):
        """Per-frame checkpointing (remat=True) is numerically identical in
        forward AND gradient — it only changes what is saved vs recomputed."""
        model, bp, p_ref, bp_ref = self._build(name)
        variables = model.init(jax.random.PRNGKey(0), bp, p_ref, bp_ref)

        def loss(v, remat):
            gen, flows, masks, prev = model.apply(v, bp, p_ref, bp_ref,
                                                  remat=remat)
            return jnp.mean(jnp.abs(gen)) + sum(jnp.mean(f ** 2)
                                                for f in flows)

        l0, g0 = jax.value_and_grad(lambda v: loss(v, False))(variables)
        l1, g1 = jax.value_and_grad(lambda v: loss(v, True))(variables)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


class TestLosses:
    def test_adversarial(self):
        x = jnp.array([[0.3, -0.2], [0.8, 0.1]])
        assert float(adversarial_loss(x, True, gan_mode="lsgan")) == pytest.approx(
            float(jnp.mean((x - 1) ** 2))
        )
        assert float(adversarial_loss(x, False, True, "hinge")) == pytest.approx(
            float(jnp.mean(jax.nn.relu(1 + x)))
        )
        assert float(adversarial_loss(x, True, False, "hinge")) == pytest.approx(
            -float(jnp.mean(x))
        )

    def test_affine_reg_zero_for_affine_flow(self):
        """Flow that is a global affine map of coordinates must incur ~0 loss
        (the defining invariance of the regularizer)."""
        Hh, Ww = 12, 10
        ys, xs = jnp.meshgrid(jnp.arange(Hh, dtype=jnp.float32),
                              jnp.arange(Ww, dtype=jnp.float32), indexing="ij")
        fx = 0.3 * xs - 0.1 * ys + 2.0
        fy = -0.2 * xs + 0.5 * ys - 1.0
        flow = jnp.stack([fx, fy], -1)[None]
        loss = AffineRegularizationLoss(3)(flow)
        assert float(loss) < 1e-6

    def test_affine_reg_positive_for_random_flow(self):
        rng = np.random.RandomState(3)
        flow = jnp.array(rng.randn(2, 12, 10, 2).astype(np.float32))
        loss = MultiAffineRegularizationLoss({2: 5, 3: 3})(
            [flow[:, ::2, ::2], flow]
        )
        assert float(loss) > 0.01

    def test_gram_symmetry(self):
        x = jnp.array(np.random.RandomState(4).rand(2, 8, 8, 5).astype(np.float32))
        g = gram_matrix(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g).transpose(0, 2, 1),
                                   rtol=1e-5)

    def test_vgg_and_correctness(self):
        params = load_vgg19_params()
        rng = np.random.RandomState(5)
        x = jnp.array(rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
        y = jnp.array(rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
        content, style = vgg_content_style_loss(params, x, y)
        assert float(content) > 0 and float(style) >= 0
        c0, s0 = vgg_content_style_loss(params, x, x)
        assert float(c0) == pytest.approx(0.0, abs=1e-5)

        corr = PerceptualCorrectness(params)
        zero_flow = jnp.zeros((1, 16, 16, 2))
        l_ident = corr(x, x, [zero_flow], [3])
        rand_flow = jnp.array(rng.randn(1, 16, 16, 2).astype(np.float32) * 4)
        l_rand = corr(x, x, [rand_flow], [3])
        assert float(l_ident) < float(l_rand)
        # identical images + zero flow: sampled≈target → loss near 0
        assert float(l_ident) < 0.05

    def test_correctness_masked(self):
        params = load_vgg19_params()
        rng = np.random.RandomState(6)
        x = jnp.array(rng.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1)
        y = jnp.array(rng.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1)
        corr = PerceptualCorrectness(params)
        flow = jnp.zeros((1, 8, 8, 2))
        mask = jnp.ones((1, 32, 32, 1))
        l = corr(y, x, [flow], [3], mask=mask)
        assert np.isfinite(float(l))

    def test_chunked_max_correlation_matches_dense(self):
        from gfla_tpu.losses.perceptual import _chunked_max_correlation
        rng = np.random.RandomState(7)
        s = jnp.array(rng.randn(2, 300, 8).astype(np.float32))
        t = jnp.array(rng.randn(2, 300, 8).astype(np.float32))
        dense = jnp.max(jnp.einsum("bsc,btc->bst", s, t), axis=1)
        chunked = _chunked_max_correlation(s, t, chunk=128)
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense),
                                   rtol=1e-5, atol=1e-5)


class TestMaxCorrelationVJP:
    """The custom VJP (gather/scatter via argmax) must equal autodiff of the
    dense max-of-matmul — both value and gradients, chunked and unchunked."""

    def _grads(self, fn, s, t):
        val, g = jax.value_and_grad(lambda a, b: jnp.sum(fn(a, b) ** 2),
                                    argnums=(0, 1))(s, t)
        return val, g

    def test_gradients_match_dense_autodiff(self):
        from gfla_tpu.losses.perceptual import _chunked_max_correlation

        jax.config.update("jax_enable_x64", True)
        try:
            rng = np.random.RandomState(8)
            s = jnp.array(rng.randn(2, 300, 8))
            t = jnp.array(rng.randn(2, 290, 8))

            def dense(a, b):
                return jnp.max(jnp.einsum("bsc,btc->bst", a, b), axis=1)

            v0, (gs0, gt0) = self._grads(dense, s, t)
            for chunk in (128, 4096):  # chunked scan + single-shot paths
                v1, (gs1, gt1) = self._grads(
                    lambda a, b: _chunked_max_correlation(a, b, chunk), s, t)
                np.testing.assert_allclose(float(v1), float(v0), rtol=1e-12)
                np.testing.assert_allclose(np.asarray(gs1), np.asarray(gs0),
                                           atol=1e-12)
                np.testing.assert_allclose(np.asarray(gt1), np.asarray(gt0),
                                           atol=1e-12)
        finally:
            jax.config.update("jax_enable_x64", False)

    def test_correctness_loss_grad_finite_after_vjp_change(self):
        from gfla_tpu.losses import PerceptualCorrectness
        from gfla_tpu.models.vgg import load_vgg19_params

        params = load_vgg19_params()
        rng = np.random.RandomState(9)
        x = jnp.array(rng.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1)
        y = jnp.array(rng.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1)
        corr = PerceptualCorrectness(params)
        flow = jnp.array(rng.randn(1, 8, 8, 2).astype(np.float32))

        g = jax.grad(lambda im: corr(y, im, [flow], [3]))(x)
        assert np.all(np.isfinite(np.asarray(g)))
