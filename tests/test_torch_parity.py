"""Torch-parity golden harness.

Proves the flax networks/losses compute the SAME function as the reference
PyTorch modules under shared weights — without pretrained assets (zero
egress): every module is exercised against the pure-torch functional oracle
in tests/torch_ref.py, with weights generated under the reference's exact
state_dict key strings and mapped through gfla_tpu.convert.

Networks run in float64 (tolerances ~1e-9); losses that pin fp32
accumulation internally run with matching looser tolerances. This is the
numeric anchor for the FID-parity north star: once real reference weights
exist, the same converter path loads them into a parity-proven
architecture.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import torch_ref as tr
from gfla_tpu.convert import (
    convert_pose_generator,
    convert_res_discriminator,
    convert_temporal_discriminator,
)
from gfla_tpu.convert.torch_mapping import (
    _attn,
    _encoder_block,
    _jump,
    _resblock,
    _resblock_decoder,
)

from contextlib import contextmanager


@contextmanager
def x64():
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)


def _nchw(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


def _nhwc(x):
    return np.asarray(x).transpose(0, 2, 3, 1)


def _t(x):
    return torch.from_numpy(np.ascontiguousarray(_nchw(x)))


def _rand(rng, *shape, scale=1.0):
    return (rng.standard_normal(shape) * scale).astype(np.float64)


def _close(ours_nhwc, theirs_nchw, atol=1e-9, rtol=1e-7):
    np.testing.assert_allclose(
        _nchw(ours_nhwc), theirs_nchw.detach().numpy(), atol=atol, rtol=rtol
    )


# ---------------------------------------------------------------------------
# op oracle cross-check (torch oracle vs the jax op, both independently
# validated against numpy loops in test_ops)
# ---------------------------------------------------------------------------

class TestOpOracles:
    def test_block_extract_matches_jax_op(self):
        from gfla_tpu.ops import block_extract, blocks_to_tiles

        rng = np.random.default_rng(0)
        src = _rand(rng, 1, 9, 7, 4)
        flow = _rand(rng, 1, 9, 7, 2, scale=2.3)
        with x64():
            ours = blocks_to_tiles(
                block_extract(jnp.asarray(src), jnp.asarray(flow), 3), 3
            )
            theirs = tr.block_extract_tiles(_t(src), _t(flow), 3)
            _close(ours, theirs)

    def test_attn_reshape_matches_jax_op(self):
        from gfla_tpu.ops import local_attn_reshape

        rng = np.random.default_rng(1)
        x = _rand(rng, 2, 5, 4, 9)  # NHWC k²-channels
        with x64():
            ours = local_attn_reshape(jnp.asarray(x), 3)
            theirs = tr.attn_reshape(_t(x), 3)
            _close(ours, theirs)


# ---------------------------------------------------------------------------
# building blocks (instance norm + LeakyReLU — the live generator config)
# ---------------------------------------------------------------------------

class TestBlockParity:
    def _sdb(self, seed=0):
        return tr.SDBuilder(seed=seed)

    def test_encoder_block(self):
        from gfla_tpu.nn.blocks import EncoderBlock

        b = self._sdb()
        b.encoder_block("blk", 5, 8)
        rng = np.random.default_rng(2)
        x = _rand(rng, 2, 12, 10, 5)
        with x64():
            params = _encoder_block(b.sd, "blk")
            out = EncoderBlock(8, norm_type="instance",
                               activation="LeakyReLU").apply(
                {"params": params}, jnp.asarray(x))
            theirs = tr.encoder_block(_t(x), b.sd, "blk")
            _close(out, theirs)

    def test_resblock_identity_and_learnable(self):
        from gfla_tpu.nn.blocks import ResBlock

        rng = np.random.default_rng(3)
        # identity shortcut (in == out)
        b = self._sdb()
        b.resblock("blk", 6)
        x = _rand(rng, 1, 8, 9, 6)
        with x64():
            out = ResBlock(6, norm_type="instance",
                           activation="LeakyReLU").apply(
                {"params": _resblock(b.sd, "blk")}, jnp.asarray(x))
            _close(out, tr.resblock(_t(x), b.sd, "blk"))
        # learnable shortcut (in != out)
        b = self._sdb(seed=4)
        b.resblock("blk", 6, 10, 6)
        with x64():
            out = ResBlock(10, 6, norm_type="instance",
                           activation="LeakyReLU").apply(
                {"params": _resblock(b.sd, "blk")}, jnp.asarray(x))
            _close(out, tr.resblock(_t(x), b.sd, "blk"))

    def test_resblock_decoder(self):
        from gfla_tpu.nn.blocks import ResBlockDecoder

        b = self._sdb(seed=5)
        b.resblock_decoder("blk", 8, 6, 6)
        rng = np.random.default_rng(5)
        x = _rand(rng, 2, 7, 6, 8)
        with x64():
            out = ResBlockDecoder(6, 6, norm_type="instance",
                                  activation="LeakyReLU").apply(
                {"params": _resblock_decoder(b.sd, "blk")}, jnp.asarray(x))
            theirs = tr.resblock_decoder(_t(x), b.sd, "blk")
            assert theirs.shape[2] == 14
            _close(out, theirs)

    def test_jump_and_output(self):
        from gfla_tpu.nn.blocks import Jump, Output

        b = self._sdb(seed=6)
        b.jump("j", 5, 7)
        b.output("o", 5, 3)
        rng = np.random.default_rng(6)
        x = _rand(rng, 1, 9, 8, 5)
        with x64():
            out = Jump(7, 3, norm_type="none", activation="LeakyReLU").apply(
                {"params": _jump(b.sd, "j")}, jnp.asarray(x))
            _close(out, tr.jump(_t(x), b.sd, "j"))
            out = Output(3, 3, norm_type="none", activation="LeakyReLU").apply(
                {"params": _jump(b.sd, "o")}, jnp.asarray(x))
            _close(out, tr.output_block(_t(x), b.sd, "o"))

    def test_extractor_attn(self):
        from gfla_tpu.nn.attention import ExtractorAttn

        b = self._sdb(seed=7)
        c, k = 6, 3
        b.attn("attn", c, k)
        rng = np.random.default_rng(7)
        src = _rand(rng, 1, 8, 7, c)
        tgt = _rand(rng, 1, 8, 7, c)
        flow = _rand(rng, 1, 8, 7, 2, scale=1.7)
        with x64():
            params = _attn(b.sd, "attn")
            out = ExtractorAttn(k, activation="LeakyReLU").apply(
                {"params": params},
                jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(flow))
            theirs = tr.extractor_attn(_t(src), _t(tgt), _t(flow), b.sd,
                                       "attn", k)
            _close(out, theirs)


# ---------------------------------------------------------------------------
# discriminators with torch-style spectral norm (same u injected both sides)
# ---------------------------------------------------------------------------

class TestDiscriminatorParity:
    def test_res_discriminator(self):
        from gfla_tpu.models.discriminators import ResDiscriminator

        sd = tr.build_res_discriminator_sd(seed=8, ndf=8, img_f=32, layers=3)
        rng = np.random.default_rng(8)
        x = _rand(rng, 2, 32, 32, 3)
        with x64():
            variables = convert_res_discriminator(sd, layers=3)
            model = ResDiscriminator(ndf=8, img_f=32, layers=3)
            # flax update_stats=True == torch training-mode forward: both run
            # exactly one power iteration from the shared u
            out, new_vars = model.apply(
                jax.tree_util.tree_map(jnp.asarray, variables),
                jnp.asarray(x), update_stats=True, mutable=["batch_stats"])
            theirs = tr.res_discriminator(_t(x), dict(sd), layers=3)
            _close(out, theirs, atol=1e-8)

    def test_temporal_discriminator(self):
        from gfla_tpu.models.discriminators import TemporalDiscriminator

        L = 6
        sd = tr.build_temporal_discriminator_sd(
            seed=9, input_length=L, ndf=8, img_f=32, layers=4)
        rng = np.random.default_rng(9)
        x = _rand(rng, 1, L, 32, 32, 3)  # flax: (B, T, H, W, C)
        with x64():
            variables = convert_temporal_discriminator(
                sd, input_length=L, ndf=8, layers=4)
            model = TemporalDiscriminator(input_length=L, ndf=8, img_f=32,
                                          layers=4)
            out, _ = model.apply(
                jax.tree_util.tree_map(jnp.asarray, variables),
                jnp.asarray(x), update_stats=True, mutable=["batch_stats"])
            # torch layout (B, C, T, H, W)
            xt = torch.from_numpy(
                np.ascontiguousarray(np.asarray(x).transpose(0, 4, 1, 2, 3)))
            theirs = tr.temporal_discriminator(xt, dict(sd), layers=4)
            _close(out, theirs, atol=1e-8)

    def test_spectral_norm_sigma_matches_torch(self):
        """The flax power iteration reproduces torch's sigma exactly from a
        shared u (VERDICT round-1 'weak': SN trusted, not verified)."""
        rng = np.random.default_rng(10)
        w = _rand(rng, 12, 5, 3, 3)
        u = _rand(rng, 12)
        u = u / np.linalg.norm(u)
        # torch
        _, u_t, v_t = tr.sn_iterate(torch.from_numpy(w), torch.from_numpy(u))
        wm = torch.from_numpy(w).reshape(12, -1)
        sigma_t = torch.dot(u_t, wm @ v_t).item()
        # flax-style: kernel (kh, kw, I, O) flattened (-1, O), u (1, O)
        with x64():
            kern = jnp.asarray(w.transpose(2, 3, 1, 0).reshape(-1, 12))
            u0 = jnp.asarray(u[None, :])
            v0 = u0 @ kern.T
            v0 = v0 / (jnp.linalg.norm(v0) + 1e-12)
            u1 = v0 @ kern
            u1 = u1 / (jnp.linalg.norm(u1) + 1e-12)
            sigma_f = (v0 @ kern @ u1.T)[0, 0]
            np.testing.assert_allclose(float(sigma_f), sigma_t, rtol=1e-10)
            np.testing.assert_allclose(
                np.asarray(u1[0]), u_t.numpy(), rtol=1e-8, atol=1e-10)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------

class TestLossParity:
    def test_adversarial(self):
        from gfla_tpu.losses import adversarial_loss

        rng = np.random.default_rng(11)
        logits = _rand(rng, 2, 4, 4, 1)
        lt = torch.from_numpy(_nchw(logits))
        with x64():
            lj = jnp.asarray(logits)
            for mode in ("lsgan", "hinge"):
                for is_real in (True, False):
                    for for_dis in (True, False):
                        ours = float(adversarial_loss(lj, is_real, for_dis,
                                                      mode))
                        theirs = float(tr.adversarial_loss(
                            lt, is_real, for_dis, mode))
                        np.testing.assert_allclose(ours, theirs, rtol=1e-9)

    @pytest.mark.slow  # 73s: heaviest single parity case; VGG loss
    # stays fast-covered by test_networks.py::TestLosses::test_vgg_and_correctness
    def test_vgg_content_style(self):
        from gfla_tpu.losses import vgg_content_style_loss
        from gfla_tpu.convert import map_conv

        sd = tr.build_vgg_sd()
        # numpy (f64) until inside the x64 context — jnp.asarray outside
        # x64 would truncate to f32
        params = {"params": {}}
        for item in tr.VGG_CFG:
            if item == "M":
                continue
            name, _ = item
            params["params"][name] = {
                "kernel": map_conv(sd[f"vgg.{name}.weight"]),
                "bias": sd[f"vgg.{name}.bias"].numpy(),
            }
        rng = np.random.default_rng(12)
        x = np.tanh(_rand(rng, 1, 64, 64, 3))
        y = np.tanh(_rand(rng, 1, 64, 64, 3))
        with x64():
            params64 = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, jnp.float64), params)
            content, style = vgg_content_style_loss(
                params64, jnp.asarray(x), jnp.asarray(y))
            ct, st = tr.vgg_loss(_t(x), _t(y), sd)
            np.testing.assert_allclose(float(content), float(ct), rtol=1e-8)
            np.testing.assert_allclose(float(style), float(st), rtol=1e-8)

    @pytest.mark.slow  # ~52 s: the N² correlation oracle dominates the tier
    def test_perceptual_correctness_bilinear(self):
        from gfla_tpu.losses import PerceptualCorrectness
        from gfla_tpu.convert import map_conv

        sd = tr.build_vgg_sd()
        # numpy (f64) until inside the x64 context — jnp.asarray outside
        # x64 would truncate to f32
        params = {"params": {}}
        for item in tr.VGG_CFG:
            if item == "M":
                continue
            name, _ = item
            params["params"][name] = {
                "kernel": map_conv(sd[f"vgg.{name}.weight"]),
                "bias": sd[f"vgg.{name}.bias"].numpy(),
            }
        rng = np.random.default_rng(13)
        tgt = np.tanh(_rand(rng, 1, 64, 64, 3))
        src = np.tanh(_rand(rng, 1, 64, 64, 3))
        # flows at the attn-layer resolutions (attn_layer=[2,3] → H/4, H/8)
        flow_c = _rand(rng, 1, 8, 8, 2, scale=2.0)
        flow_f = _rand(rng, 1, 16, 16, 2, scale=2.0)
        mask = rng.uniform(0.2, 1.0, (1, 64, 64, 1))
        with x64():
            params64 = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, jnp.float64), params)
            loss_fn = PerceptualCorrectness(params64)
            flows_t = [_t(flow_c), _t(flow_f)]
            flows_j = [jnp.asarray(flow_c), jnp.asarray(flow_f)]
            for m_j, m_t in ((None, None), (jnp.asarray(mask), _t(mask))):
                ours = float(loss_fn(
                    jnp.asarray(tgt), jnp.asarray(src), flows_j, [2, 3],
                    mask=m_j, use_bilinear_sampling=True))
                theirs = float(tr.perceptual_correctness_bilinear(
                    _t(tgt), _t(src), flows_t, [2, 3], sd, mask=m_t))
                np.testing.assert_allclose(ours, theirs, rtol=1e-7,
                                           atol=1e-9)

    def test_affine_regularization(self):
        from gfla_tpu.losses import MultiAffineRegularizationLoss

        rng = np.random.default_rng(14)
        flow_c = _rand(rng, 2, 8, 8, 2, scale=2.0)
        flow_f = _rand(rng, 2, 16, 16, 2, scale=2.0)
        with x64():
            loss = MultiAffineRegularizationLoss({2: 5, 3: 3})
            ours = float(loss([jnp.asarray(flow_c), jnp.asarray(flow_f)]))
            theirs = float(tr.affine_regularization(_t(flow_c), 3)
                           + tr.affine_regularization(_t(flow_f), 5))
            # projector matrix is fp32; everything else f64
            np.testing.assert_allclose(ours, theirs, rtol=1e-5)


# ---------------------------------------------------------------------------
# full PoseGenerator: converter key coverage + forward parity + task load
# ---------------------------------------------------------------------------

class _TrackingDict(dict):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.used = set()

    def __getitem__(self, k):
        self.used.add(k)
        return super().__getitem__(k)


@pytest.fixture(scope="module")
def pose_sd():
    return tr.build_pose_generator_sd(seed=20)


@pytest.mark.slow
class TestPoseGeneratorParity:
    CFG = dict(image_nc=3, structure_nc=18, output_nc=3, ngf=64, img_f=512,
               layers=3, num_blocks=2, norm_type="instance",
               activation="LeakyReLU", attn_layer=(2, 3),
               extractor_kz={"3": 3, "2": 5}, use_spect=False)

    def test_converter_consumes_every_key(self, pose_sd):
        sd, aliases = pose_sd
        tracked = _TrackingDict(sd)
        convert_pose_generator(tracked, layers=3, attn_layer=(2, 3),
                               num_blocks=2, flow_layers=5)
        unused = set(sd) - tracked.used
        # Jump/Output register conv1 twice (attribute + Sequential slot,
        # base_function.py:682-688); the converter reads the conv1 name.
        assert unused == set(aliases), (
            f"converter left non-alias keys unconsumed: {unused - set(aliases)}")

    def test_converted_tree_matches_init_tree(self, pose_sd):
        from gfla_tpu.models.generators import PoseGenerator

        sd, _ = pose_sd
        params = convert_pose_generator(sd, layers=3, attn_layer=(2, 3),
                                        num_blocks=2, flow_layers=5)
        model = PoseGenerator(**self.CFG)
        init_vars = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 18)),
            jnp.zeros((1, 64, 64, 18)))
        ref = jax.tree_util.tree_map(jnp.shape, init_vars["params"])
        got = jax.tree_util.tree_map(lambda a: tuple(np.shape(a)), params)
        assert ref == got

    def test_full_forward_parity(self, pose_sd):
        from gfla_tpu.models.generators import PoseGenerator

        sd, _ = pose_sd
        rng = np.random.default_rng(21)
        p1 = np.tanh(_rand(rng, 1, 64, 64, 3))
        bp1 = _rand(rng, 1, 64, 64, 18, scale=0.5)
        bp2 = _rand(rng, 1, 64, 64, 18, scale=0.5)
        with x64():
            params = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, jnp.float64),
                convert_pose_generator(sd, layers=3, attn_layer=(2, 3),
                                       num_blocks=2, flow_layers=5))
            model = PoseGenerator(**self.CFG)
            img, flows, masks = model.apply(
                {"params": params}, jnp.asarray(p1), jnp.asarray(bp1),
                jnp.asarray(bp2), train=False, update_stats=False)
            img_t, flows_t, masks_t = tr.pose_generator(
                _t(p1), _t(bp1), _t(bp2), sd)
            assert len(flows) == len(flows_t) == 2
            for f_j, f_t in zip(flows, flows_t):
                _close(f_j, f_t, atol=1e-8)
            for m_j, m_t in zip(masks, masks_t):
                _close(m_j, m_t, atol=1e-9)
            _close(img, img_t, atol=1e-8)

    def test_converted_params_load_into_pose_task(self, pose_sd):
        """The converted tree flows through partial_load into a live
        PoseTask state with every leaf loaded (reference load contract:
        base_model.py:154-197)."""
        from types import SimpleNamespace

        from gfla_tpu.tasks.pose import PoseTask
        from gfla_tpu.train.checkpoint import partial_load

        sd, _ = pose_sd
        params = convert_pose_generator(sd, layers=3, attn_layer=(2, 3),
                                        num_blocks=2, flow_layers=5)
        opt = SimpleNamespace(
            image_nc=3, structure_nc=18, kernel_size={"2": 5, "3": 3},
            attn_layer=[2, 3], layers=3, use_spect_g=False, no_spect_d=False,
            dataset_mode="fashion", gan_mode="lsgan", lr=1e-4,
            ratio_g2d=0.1, lr_policy="lambda", niter=10, niter_decay=10,
            iter_count=0, isTrain=True, compute_dtype="float32",
        )
        task = PoseTask(opt)
        batch = {
            "P1": jnp.zeros((1, 64, 64, 3)),
            "BP1": jnp.zeros((1, 64, 64, 18)),
            "P2": jnp.zeros((1, 64, 64, 3)),
            "BP2": jnp.zeros((1, 64, 64, 18)),
        }
        state = task.init_state(jax.random.PRNGKey(0), batch)
        params_f32 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float32), params)
        merged, loaded, skipped = partial_load(state.params_g, params_f32)
        assert not skipped
        n_leaves = len(jax.tree_util.tree_leaves(state.params_g))
        assert len(loaded) == n_leaves


# ---------------------------------------------------------------------------
# Face / Dance / ShapeNet generators: converter coverage + forward parity
# (small-channel configs keep f64 CPU runtime bounded; the walks are
# parameterized identically for the live ngf=64/img_f=512 configs)
# ---------------------------------------------------------------------------

from gfla_tpu.convert import (  # noqa: E402
    convert_dance_generator,
    convert_face_generator,
    convert_shapenet_generator,
)

_SMALL = dict(image_nc=3, structure_nc=6, ngf=32, img_f=256, layers=3,
              attn_layer=(2, 3), kz={"3": 3, "2": 3})


def _g_cfg(**over):
    cfg = dict(image_nc=3, structure_nc=6, output_nc=3, ngf=32, img_f=256,
               layers=3, num_blocks=2, norm_type="instance",
               activation="LeakyReLU", attn_layer=(2, 3),
               extractor_kz={"3": 3, "2": 3}, use_spect=False)
    cfg.update(over)
    return cfg


def _frames(rng, b, t, h, w, c, scale=1.0):
    return (rng.standard_normal((b, t, h, w, c)) * scale).astype(np.float64)


@pytest.mark.slow
class TestFaceGeneratorParity:
    @pytest.fixture(scope="class")
    def sd(self):
        return tr.build_face_generator_sd(seed=30, **_SMALL)

    def test_converter_consumes_every_key(self, sd):
        sd_, aliases = sd
        tracked = _TrackingDict(sd_)
        convert_face_generator(tracked, layers=3, attn_layer=(2, 3))
        unused = set(sd_) - tracked.used
        assert unused == set(aliases), (
            f"non-alias keys unconsumed: {unused - set(aliases)}")

    def test_converted_tree_matches_init_tree(self, sd):
        from gfla_tpu.models.generators import FaceGenerator

        params = convert_face_generator(sd[0], layers=3, attn_layer=(2, 3))
        model = FaceGenerator(**_g_cfg())
        init_vars = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 2, 64, 64, 6)), jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((1, 64, 64, 6)))
        ref = jax.tree_util.tree_map(jnp.shape, init_vars["params"])
        got = jax.tree_util.tree_map(lambda a: tuple(np.shape(a)), params)
        assert ref == got

    def test_full_forward_parity_with_recurrence(self, sd):
        """T=2 frames through the nn.scan path: frame 1 consumes frame 0's
        generated image, so parity here proves the whole feedback loop."""
        from gfla_tpu.models.generators import FaceGenerator

        rng = np.random.default_rng(31)
        bp_frames = _frames(rng, 1, 2, 64, 64, 6, scale=0.5)
        p_ref = np.tanh(_rand(rng, 1, 64, 64, 3))
        bp_ref = _rand(rng, 1, 64, 64, 6, scale=0.5)
        with x64():
            params = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, jnp.float64),
                convert_face_generator(sd[0], layers=3, attn_layer=(2, 3)))
            model = FaceGenerator(**_g_cfg())
            gen, flows, masks, prev = model.apply(
                {"params": params}, jnp.asarray(bp_frames),
                jnp.asarray(p_ref), jnp.asarray(bp_ref),
                train=False, update_stats=False)
            bp_t = torch.from_numpy(
                np.ascontiguousarray(bp_frames.transpose(0, 1, 4, 2, 3)))
            gens_t, flows_t, masks_t = tr.face_generator(
                bp_t, _t(p_ref), _t(bp_ref), sd[0], kz={"3": 3, "2": 3})
            assert gen.shape[1] == 2 and len(flows) == 4
            for t in range(2):
                _close(gen[:, t], gens_t[t], atol=1e-7)
                for j in range(len(flows)):
                    _close(flows[j][:, t], flows_t[t][j], atol=1e-6)
                    _close(masks[j][:, t], masks_t[t][j], atol=1e-8)


@pytest.mark.slow
class TestDanceGeneratorParity:
    @pytest.fixture(scope="class")
    def sd(self):
        return tr.build_dance_generator_sd(seed=32, **_SMALL)

    def test_converter_consumes_every_key(self, sd):
        sd_, aliases = sd
        tracked = _TrackingDict(sd_)
        convert_dance_generator(tracked, layers=3, attn_layer=(2, 3))
        unused = set(sd_) - tracked.used
        assert unused == set(aliases), (
            f"non-alias keys unconsumed: {unused - set(aliases)}")

    def test_converted_tree_matches_init_tree(self, sd):
        from gfla_tpu.models.generators import DanceGenerator

        params = convert_dance_generator(sd[0], layers=3, attn_layer=(2, 3))
        model = DanceGenerator(**_g_cfg())
        init_vars = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 2, 64, 64, 6)), jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((1, 64, 64, 6)))
        ref = jax.tree_util.tree_map(jnp.shape, init_vars["params"])
        got = jax.tree_util.tree_map(lambda a: tuple(np.shape(a)), params)
        assert ref == got

    def test_full_forward_parity_with_recurrence(self, sd):
        from gfla_tpu.models.generators import DanceGenerator

        rng = np.random.default_rng(33)
        bp_frames = _frames(rng, 1, 2, 64, 64, 6, scale=0.5)
        p_ref = np.tanh(_rand(rng, 1, 64, 64, 3))
        bp_ref = _rand(rng, 1, 64, 64, 6, scale=0.5)
        with x64():
            params = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, jnp.float64),
                convert_dance_generator(sd[0], layers=3, attn_layer=(2, 3)))
            model = DanceGenerator(**_g_cfg())
            gen, flows, masks, prev = model.apply(
                {"params": params}, jnp.asarray(bp_frames),
                jnp.asarray(p_ref), jnp.asarray(bp_ref),
                train=False, update_stats=False)
            bp_t = torch.from_numpy(
                np.ascontiguousarray(bp_frames.transpose(0, 1, 4, 2, 3)))
            gens_t, flows_t, masks_t = tr.dance_generator(
                bp_t, _t(p_ref), _t(bp_ref), sd[0], kz={"3": 3, "2": 3})
            for t in range(2):
                _close(gen[:, t], gens_t[t], atol=1e-7)
                for j in range(len(flows)):
                    _close(flows[j][:, t], flows_t[t][j], atol=1e-6)
                    _close(masks[j][:, t], masks_t[t][j], atol=1e-8)


@pytest.mark.slow
class TestShapeNetGeneratorParity:
    # The 8×8 target seed upsampled twice must meet the source pyramid's
    # coarsest level (generator.py:653-655): 32 = H/2^layers. The live
    # config is H=256/layers=3; the cheapest valid one is H=128/layers=2.
    CFG = dict(image_nc=3, structure_nc=6, ngf=16, img_f=128, layers=2,
               attn_layer=(1, 2), kz={"1": 3, "2": 3})

    @pytest.fixture(scope="class")
    def sd(self):
        return tr.build_shapenet_generator_sd(seed=34, **self.CFG)

    def test_converter_consumes_every_key(self, sd):
        sd_, aliases = sd
        tracked = _TrackingDict(sd_)
        convert_shapenet_generator(tracked, layers=2, attn_layer=(1, 2))
        unused = set(sd_) - tracked.used
        assert unused == set(aliases), (
            f"non-alias keys unconsumed: {unused - set(aliases)}")

    def test_converted_tree_matches_init_tree(self, sd):
        from gfla_tpu.models.generators import ShapeNetGenerator

        params = convert_shapenet_generator(sd[0], layers=2,
                                            attn_layer=(1, 2))
        model = ShapeNetGenerator(**_g_cfg(
            structure_nc=6, ngf=16, img_f=128, layers=2, attn_layer=(1, 2),
            extractor_kz={"1": 3, "2": 3}))
        init_vars = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 1, 1, 6)),
            jnp.zeros((1, 1, 1, 6)))
        ref = jax.tree_util.tree_map(jnp.shape, init_vars["params"])
        got = jax.tree_util.tree_map(lambda a: tuple(np.shape(a)), params)
        assert ref == got

    def test_full_forward_parity(self, sd):
        from gfla_tpu.models.generators import ShapeNetGenerator

        rng = np.random.default_rng(35)
        src = np.tanh(_rand(rng, 1, 128, 128, 3))
        sb = _rand(rng, 1, 1, 1, 6, scale=0.7)
        tb = _rand(rng, 1, 1, 1, 6, scale=0.7)
        with x64():
            params = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, jnp.float64),
                convert_shapenet_generator(sd[0], layers=2,
                                           attn_layer=(1, 2)))
            model = ShapeNetGenerator(**_g_cfg(
                structure_nc=6, ngf=16, img_f=128, layers=2,
                attn_layer=(1, 2), extractor_kz={"1": 3, "2": 3}))
            img, flows, masks = model.apply(
                {"params": params}, jnp.asarray(src), jnp.asarray(sb),
                jnp.asarray(tb), train=False, update_stats=False)
            img_t, flows_t, masks_t = tr.shapenet_generator(
                _t(src), _t(sb), _t(tb), sd[0], layers=2,
                attn_layer=(1, 2), kz={"1": 3, "2": 3})
            assert len(flows) == len(flows_t) == 2
            for f_j, f_t in zip(flows, flows_t):
                _close(f_j, f_t, atol=1e-7)
            for m_j, m_t in zip(masks, masks_t):
                _close(m_j, m_t, atol=1e-8)
            _close(img, img_t, atol=1e-7)


# ---------------------------------------------------------------------------
# Keypoint motion-extraction net (the 7th task head's network)
# ---------------------------------------------------------------------------

from gfla_tpu.convert import convert_kp_generator  # noqa: E402


@pytest.mark.slow
class TestKeypointNetParity:
    KP_CFG = dict(keypoint_nc=5, channels=32, layers=3)

    @pytest.fixture(scope="class")
    def sd(self):
        return tr.build_kp_input_sd(seed=40, **self.KP_CFG)

    def test_converter_consumes_every_key(self, sd):
        sd_, aliases = sd
        tracked = _TrackingDict(sd_)
        convert_kp_generator(tracked, layers=3)
        unused = set(sd_) - tracked.used
        assert unused == set(aliases)

    def test_converted_tree_matches_init_tree(self, sd):
        from gfla_tpu.models.keypoint_net import KPInput2DGenerator

        params = convert_kp_generator(sd[0], layers=3)
        model = KPInput2DGenerator(structure_nc=5, channels=32, layers=3)
        init_vars = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 40, 10)), train=False)
        ref = jax.tree_util.tree_map(jnp.shape, init_vars["params"])
        got = jax.tree_util.tree_map(lambda a: tuple(np.shape(a)), params)
        assert ref == got

    def test_full_forward_parity(self, sd):
        from gfla_tpu.models.keypoint_net import KPInput2DGenerator

        rng = np.random.default_rng(41)
        kp = _rand(rng, 1, 40, 10, scale=0.8)  # flax NTC: (B, T, 2K)
        with x64():
            params = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, jnp.float64),
                convert_kp_generator(sd[0], layers=3))
            model = KPInput2DGenerator(structure_nc=5, channels=32, layers=3)
            out = model.apply({"params": params}, jnp.asarray(kp),
                              train=False)
            # torch NCT: (B, 2K, T)
            kp_t = torch.from_numpy(
                np.ascontiguousarray(np.asarray(kp).transpose(0, 2, 1)))
            out_t = tr.kp_input_net(kp_t, sd[0], layers=3)
            np.testing.assert_allclose(
                np.asarray(out).transpose(0, 2, 1), out_t.numpy(),
                atol=1e-9, rtol=1e-7)
