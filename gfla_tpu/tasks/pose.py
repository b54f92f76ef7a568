"""Pose-guided person image generation task (the flagship head).

Capability parity with the reference Pose model (model/pose_model.py):
G = PoseGenerator (instance norm, LeakyReLU, ngf=64, img_f=512), D =
ResDiscriminator (fashion: layers=4 / market: layers=3, ndf=32, img_f=128,
spectral norm), two Adams β=(0,0.999) with D lr = 0.1·G lr, and losses
  L1·λ_rec + correctness·λ_correct + lsgan·λ_g + affine-reg·λ_reg
  + style·λ_style + content·λ_content          (pose_model.py:154-183)
with the D updated *before* the G loss is evaluated (pose_model.py:186-196).

TPU-native step: one jitted function per optimization step. The generator
runs forward exactly once via jax.vjp — the D update consumes the
stop-gradient fake, then the G gradients are pulled back through the saved
vjp against the *updated* discriminator, reproducing the reference's update
order without a second generator forward.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from gfla_tpu.losses import (
    MultiAffineRegularizationLoss,
    PerceptualCorrectness,
    adversarial_loss,
    l1_loss,
    vgg_content_style_loss,
)
from gfla_tpu.models import define_d, define_g
from gfla_tpu.options.options import add_spect_d_flags, resolve_use_spect_d
from gfla_tpu.models.vgg import load_vgg19_params
from gfla_tpu.train.precision import cast_tree, compute_dtype, to_f32
from gfla_tpu.train.state import GANTrainState, make_optimizer


class PoseTask:
    """Builds networks/optimizers from an options namespace and exposes
    jitted train/test steps."""

    loss_names = [
        "app_gen", "correctness_gen", "content_gen", "style_gen",
        "regularization", "ad_gen", "dis_img_gen",
    ]
    model_names = ["G", "D"]

    @staticmethod
    def modify_options(parser, is_train=True):
        """Task-specific flags & re-defaults (pose_model.py:20-47)."""
        from gfla_tpu.options import StoreDictKeyPair, StoreList

        parser.add_argument("--attn_layer", action=StoreList,
                            metavar="VAL1,VAL2...", default=[2, 3])
        parser.add_argument("--kernel_size", action=StoreDictKeyPair,
                            metavar="KEY1=VAL1,KEY2=VAL2...",
                            default={"2": 5, "3": 3})
        parser.add_argument("--layers", type=int, default=3)
        parser.add_argument("--netG", type=str, default="pose")
        parser.add_argument("--netD", type=str, default="res")
        parser.add_argument("--init_type", type=str, default="orthogonal")
        parser.add_argument("--ratio_g2d", type=float, default=0.1)
        parser.add_argument("--lambda_rec", type=float, default=5.0)
        parser.add_argument("--lambda_g", type=float, default=2.0)
        parser.add_argument("--lambda_correct", type=float, default=5.0)
        parser.add_argument("--lambda_style", type=float, default=500.0)
        parser.add_argument("--lambda_content", type=float, default=0.5)
        parser.add_argument("--lambda_regularization", type=float,
                            default=0.0025)
        parser.add_argument("--use_spect_g", action="store_true", default=False)
        add_spect_d_flags(parser)
        parser.add_argument("--save_input", action="store_true", default=False)
        return parser

    def __init__(self, opt):
        self.opt = opt
        kz = {str(k): int(v) for k, v in opt.kernel_size.items()}
        self.attn_layer = [int(a) for a in opt.attn_layer]
        self.net_g = define_g(
            "pose",
            image_nc=opt.image_nc, structure_nc=opt.structure_nc,
            output_nc=opt.image_nc, ngf=getattr(opt, "ngf", 64),
            img_f=getattr(opt, "img_f", 512), layers=opt.layers,
            num_blocks=2, norm_type="instance", activation="LeakyReLU",
            attn_layer=tuple(self.attn_layer), extractor_kz=kz,
            use_spect=opt.use_spect_g,
        )
        d_layers = getattr(opt, "d_layers", None) or (
            3 if opt.dataset_mode == "market" else 4)
        self.net_d = define_d(
            "res", ndf=getattr(opt, "ndf", 32),
            img_f=getattr(opt, "d_img_f", 128), layers=d_layers,
            use_spect=resolve_use_spect_d(opt),
        )
        self.dtype = compute_dtype(getattr(opt, "compute_dtype", "float32"))
        # frozen VGG runs in the compute dtype (bf16 halves its cost)
        self.vgg_params = cast_tree(load_vgg19_params(), self.dtype)
        self.correctness = PerceptualCorrectness(self.vgg_params)
        self.regularization = MultiAffineRegularizationLoss(
            {int(k): int(v) for k, v in opt.kernel_size.items()}
        )
        self.is_train = getattr(opt, "isTrain", True)
        # eval mode still needs no-op optimizers for init_state
        self.tx_g = optax.set_to_zero()
        self.tx_d = optax.set_to_zero()
        if self.is_train:
            ipe = max(1, getattr(opt, "iters_per_epoch", 1000))
            okw = dict(
                policy=opt.lr_policy, niter=opt.niter,
                niter_decay=opt.niter_decay, iter_count=opt.iter_count,
                iters_per_epoch=ipe,
            )
            self.tx_g = make_optimizer(opt.lr, **okw)
            self.tx_d = make_optimizer(opt.lr * opt.ratio_g2d, **okw)
        self._train_step = None
        self._test_step = None

    # ------------------------------------------------------------------
    def init_state(self, rng, sample_batch) -> GANTrainState:
        # Jitted: eager flax init dispatches one tiny op at a time, and on
        # a remote-compile backend (axon tunnel) every unique op is a ~2s
        # compile round-trip — minutes per net. One traced module instead.
        return jax.jit(self._init_state_impl)(rng, sample_batch)

    def _init_state_impl(self, rng, sample_batch) -> GANTrainState:
        p1, bp1, p2, bp2 = (
            sample_batch["P1"], sample_batch["BP1"],
            sample_batch["P2"], sample_batch["BP2"],
        )
        rg, rd = jax.random.split(rng)
        vg = self.net_g.init(rg, p1, bp1, bp2)
        vd = self.net_d.init(rd, p2)
        return GANTrainState.create(
            params_g=vg["params"],
            params_d=vd["params"],
            stats_g=vg.get("batch_stats", {}),
            stats_d=vd.get("batch_stats", {}),
            tx_g=self.tx_g,
            tx_d=self.tx_d,
        )

    # ------------------------------------------------------------------
    def _g_apply(self, params, stats, p1, bp1, bp2, train=True):
        """Generator forward in the compute dtype; fp32 outputs/stats.
        Casting inside the (differentiated) function makes the
        cast-transpose accumulate gradients back into the fp32 masters."""
        cd = self.dtype
        variables = {"params": cast_tree(params, cd)}
        if stats:
            variables["batch_stats"] = cast_tree(stats, cd)
        if not train:
            # eval semantics (reference nets are .eval() at test time,
            # base_model.py:160): running stats frozen, no stat updates
            outs = self.net_g.apply(
                variables, p1.astype(cd), bp1.astype(cd), bp2.astype(cd),
                train=False, update_stats=False,
            )
            return to_f32(outs), stats
        outs, new_vars = self.net_g.apply(
            variables, p1.astype(cd), bp1.astype(cd), bp2.astype(cd),
            mutable=["batch_stats"],
        )
        outs = to_f32(outs)
        return outs, to_f32(new_vars.get("batch_stats", stats))

    def _d_apply(self, params, stats, x, update_stats):
        cd = self.dtype
        variables = {"params": cast_tree(params, cd)}
        if stats:
            variables["batch_stats"] = cast_tree(stats, cd)
        x = x.astype(cd)
        if update_stats:
            out, new_vars = self.net_d.apply(
                variables, x, update_stats=True, mutable=["batch_stats"]
            )
            return out.astype(jnp.float32), to_f32(
                new_vars.get("batch_stats", stats)
            )
        out = self.net_d.apply(variables, x, update_stats=False)
        return out.astype(jnp.float32), stats

    # ------------------------------------------------------------------
    def train_step(self, state: GANTrainState, batch) -> Tuple[GANTrainState, Dict]:
        if self._train_step is None:
            self._train_step = jax.jit(self._train_step_impl, donate_argnums=0)
        return self._train_step(state, batch)

    def _train_step_impl(self, state: GANTrainState, batch):
        opt = self.opt
        p1, bp1, p2, bp2 = batch["P1"], batch["BP1"], batch["P2"], batch["BP2"]

        # ---- single generator forward, saved pullback --------------------
        def g_forward(params_g):
            (img_gen, flows, masks), new_stats = self._g_apply(
                params_g, state.stats_g, p1, bp1, bp2
            )
            return (img_gen, flows, masks), new_stats

        if getattr(opt, "remat", False):
            # bandwidth-bound regime: recomputing the generator in the
            # backward pass trades spare MXU FLOPs for saved activation
            # HBM traffic
            g_forward = jax.checkpoint(g_forward)

        (img_gen, flows, masks), g_vjp, new_stats_g = jax.vjp(
            g_forward, state.params_g, has_aux=True
        )
        fake = jax.lax.stop_gradient(img_gen)

        # ---- D update (pose_model.py:130-152) ----------------------------
        def d_loss_fn(params_d):
            d_real, stats1 = self._d_apply(params_d, state.stats_d, p2, True)
            d_fake, stats2 = self._d_apply(params_d, stats1, fake, True)
            loss_real = adversarial_loss(d_real, True, True, opt.gan_mode)
            loss_fake = adversarial_loss(d_fake, False, True, opt.gan_mode)
            return 0.5 * (loss_real + loss_fake), stats2

        (loss_d, new_stats_d), grads_d = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.params_d)
        upd_d, new_opt_d = self.tx_d.update(
            grads_d, state.opt_state_d, state.params_d
        )
        new_params_d = optax.apply_updates(state.params_d, upd_d)

        # ---- G losses against the *updated*, frozen D --------------------
        from gfla_tpu.models.vgg import vgg19_features

        def g_loss_fn(outputs):
            img, fl, mk = outputs
            loss_app = l1_loss(img, p2) * opt.lambda_rec
            # one VGG forward per distinct image (p2 features are shared by
            # the correctness and content/style terms)
            p2_feats = vgg19_features(self.vgg_params, p2)
            loss_correct = (
                self.correctness(p2, p1, fl, self.attn_layer,
                                 target_feats=p2_feats)
                * opt.lambda_correct
            )
            d_fake, _ = self._d_apply(new_params_d, new_stats_d, img, False)
            loss_ad = (
                adversarial_loss(d_fake, True, False, opt.gan_mode)
                * opt.lambda_g
            )
            loss_reg = self.regularization(fl) * opt.lambda_regularization
            content, style = vgg_content_style_loss(self.vgg_params, img, p2,
                                                    fy=p2_feats)
            loss_content = content * opt.lambda_content
            loss_style = style * opt.lambda_style
            total = (
                loss_app + loss_correct + loss_ad + loss_reg
                + loss_content + loss_style
            )
            return total, {
                "app_gen": loss_app,
                "correctness_gen": loss_correct,
                "ad_gen": loss_ad,
                "regularization": loss_reg,
                "content_gen": loss_content,
                "style_gen": loss_style,
            }

        (loss_g, logs), grads_out = jax.value_and_grad(g_loss_fn, has_aux=True)(
            (img_gen, flows, masks)
        )
        (grads_g,) = g_vjp(grads_out)
        upd_g, new_opt_g = self.tx_g.update(
            grads_g, state.opt_state_g, state.params_g
        )
        new_params_g = optax.apply_updates(state.params_g, upd_g)

        logs = dict(logs, dis_img_gen=loss_d, total_G=loss_g)
        new_state = state.replace(
            step=state.step + 1,
            params_g=new_params_g,
            params_d=new_params_d,
            stats_g=new_stats_g,
            stats_d=new_stats_d,
            opt_state_g=new_opt_g,
            opt_state_d=new_opt_d,
        )
        return new_state, logs

    # ------------------------------------------------------------------
    def run_test(self, opt, state, loader, prepare_batch):
        from gfla_tpu.tasks.testing import run_test_pose

        return run_test_pose(self, opt, state, loader, prepare_batch)

    # ------------------------------------------------------------------
    def test_step(self, state: GANTrainState, batch):
        """Inference forward in eval mode (pose_model.py:113-121; the
        reference nets are .eval() at test time). Returns
        (img_gen, flows, masks)."""
        if self._test_step is None:
            def _impl(params_g, stats_g, p1, bp1, bp2):
                (out, _) = self._g_apply(params_g, stats_g, p1, bp1, bp2,
                                         train=False)
                return out
            self._test_step = jax.jit(_impl)
        return self._test_step(
            state.params_g, state.stats_g,
            batch["P1"], batch["BP1"], batch["BP2"],
        )
