"""ShapeNet novel-view synthesis tasks (shapenet + shapenetflow).

Capability parity with model/shapenet_model.py and
model/shapenetflow_model.py: viewpoint labels (azimuth/2, elevation/10)
one-hot encoded on device (the reference scatter_s on GPU,
shapenet_model.py:116-127), G = ShapeNetGenerator, D = ResDiscriminator,
same loss suite as pose. The flow-pretrain head mirrors poseflownet.
"""

from __future__ import annotations

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
from gfla_tpu.tasks.pose import PoseTask
from gfla_tpu.tasks.poseflownet import PoseFlowNetTask
from gfla_tpu.train.state import GANTrainState, make_optimizer


def labels_to_semantic(bp: jax.Array, label_nc_h: int, label_nc_v: int):
    """(B, 2) int labels (azimuth, elevation raw) → (B, 1, 1, h+v) one-hot
    (shapenet_model.py:116-127: h=azimuth/2, v=elevation/10)."""
    h = (bp[:, 0] // 2).astype(jnp.int32)
    v = (bp[:, 1] // 10).astype(jnp.int32)
    sem = jnp.concatenate(
        [jax.nn.one_hot(h, label_nc_h), jax.nn.one_hot(v, label_nc_v)], axis=-1
    )
    return sem[:, None, None, :]


class ShapeNetTask(PoseTask):
    """Same optimization scheme as pose, different G wiring + semantic BPs."""

    @staticmethod
    def modify_options(parser, is_train=True):
        from gfla_tpu.options import StoreDictKeyPair, StoreList

        parser.add_argument("--attn_layer", action=StoreList,
                            metavar="VAL1,VAL2...", default=[2])
        parser.add_argument("--kernel_size", action=StoreDictKeyPair,
                            metavar="KEY1=VAL1,KEY2=VAL2...", default={"2": 3})
        parser.add_argument("--layers", type=int, default=3)
        parser.add_argument("--netG", type=str, default="shapenet")
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
        self.label_nc_h = getattr(opt, "label_nc_h", 18)
        self.label_nc_v = getattr(opt, "label_nc_v", 3)
        self.net_g = define_g(
            "shapenet",
            image_nc=opt.image_nc,
            structure_nc=self.label_nc_h + self.label_nc_v,
            output_nc=opt.image_nc, ngf=getattr(opt, "ngf", 64),
            img_f=getattr(opt, "img_f", 512), layers=opt.layers,
            num_blocks=2, norm_type="instance", activation="LeakyReLU",
            attn_layer=tuple(self.attn_layer), extractor_kz=kz,
            use_spect=opt.use_spect_g,
        )
        self.net_d = define_d(
            "res", ndf=getattr(opt, "ndf", 32),
            img_f=getattr(opt, "d_img_f", 128),
            layers=getattr(opt, "d_layers", 4),
            use_spect=resolve_use_spect_d(opt),
        )
        from gfla_tpu.train.precision import cast_tree, compute_dtype

        self.dtype = compute_dtype(getattr(opt, "compute_dtype", "float32"))
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
            okw = dict(policy=opt.lr_policy, niter=opt.niter,
                       niter_decay=opt.niter_decay, iter_count=opt.iter_count,
                       iters_per_epoch=ipe)
            self.tx_g = make_optimizer(opt.lr, **okw)
            self.tx_d = make_optimizer(opt.lr * opt.ratio_g2d, **okw)
        self._train_step = None
        self._test_step = None

    def _semantic(self, batch):
        out = dict(batch)
        for key in ("BP1", "BP2"):
            v = out.get(key)
            if v is None:
                continue
            if v.ndim == 2:  # raw (B, 2) labels
                out[key] = labels_to_semantic(
                    v, self.label_nc_h, self.label_nc_v
                )
            elif v.ndim == 3 and v.shape[-1] == 2:
                # test-time azimuth sweep (B, V, 2): one view for shapes
                out[key] = labels_to_semantic(
                    v[:, 0], self.label_nc_h, self.label_nc_v
                )
        if "P2" in out and out["P2"].ndim == 5:
            out["P2"] = out["P2"][:, 0]
        return out

    def init_state(self, rng, sample_batch):
        return super().init_state(rng, self._semantic(sample_batch))

    def _train_step_impl(self, state, batch):
        return super()._train_step_impl(state, self._semantic(batch))

    def test_step(self, state, batch):
        return super().test_step(state, self._semantic(batch))

    def run_test(self, opt, state, loader, prepare_batch):
        """Test sweeps all azimuths per source (shapenet_model.py:129-151):
        every sweep view becomes one `{src}_2_{target_id}_vis.jpg`."""
        import os

        import numpy as np

        from gfla_tpu.tasks.testing import _save
        from gfla_tpu.utils.images import tensor2im

        out_dir = os.path.join(opt.results_dir, opt.name)
        os.makedirs(out_dir, exist_ok=True)
        n = 0
        for batch in loader:
            dev = prepare_batch(batch)
            n_views = dev["BP2"].shape[1]
            for j in range(n_views):
                view = {
                    "P1": dev["P1"],
                    "BP1": dev["BP1"],
                    "BP2": dev["BP2"][:, j],
                    "P2": dev["P2"][:, j],
                }
                img, _, _ = self.test_step(state, view)
                for i in range(img.shape[0]):
                    src = batch["P1_path"][i]
                    # collate layout: P2_path[batch][view]
                    p2 = batch["P2_path"][i]
                    tgt = p2[j] if isinstance(p2, (list, tuple)) else p2
                    _save(os.path.join(out_dir, f"{src}_2_{tgt}_vis.jpg"),
                          tensor2im(img, i))
                    n += 1
            if n >= opt.max_dataset_size:
                break
        print(f"wrote {n} results to {out_dir}")
        return n


class ShapeNetFlowTask(PoseFlowNetTask):
    """Flow pretraining for ShapeNet (model/shapenetflow_model.py):
    correctness·20 + regularization·0.01 on ShapeNetFlowNetGenerator."""

    @staticmethod
    def modify_options(parser, is_train=True):
        from gfla_tpu.options import StoreDictKeyPair, StoreList

        parser.add_argument("--netG", type=str, default="shapenetflow")
        parser.add_argument("--init_type", type=str, default="orthogonal")
        parser.add_argument("--attn_layer", action=StoreList,
                            metavar="VAL1,VAL2...", default=[2])
        parser.add_argument("--kernel_size", action=StoreDictKeyPair,
                            metavar="KEY1=VAL1,KEY2=VAL2...", default={"2": 3})
        parser.add_argument("--lambda_correct", type=float, default=20.0)
        parser.add_argument("--lambda_regularization", type=float, default=0.01)
        parser.add_argument("--use_spect_g", action="store_true", default=False)
        return parser

    def __init__(self, opt):
        super().__init__(opt)
        self.label_nc_h = getattr(opt, "label_nc_h", 18)
        self.label_nc_v = getattr(opt, "label_nc_v", 3)
        self.net_g = define_g(
            "shapenetflow",
            image_nc=opt.image_nc,
            structure_nc=self.label_nc_h + self.label_nc_v,
            ngf=32, img_f=256, encoder_layer=5,
            attn_layer=tuple(self.attn_layer), norm_type="instance",
            activation="LeakyReLU", use_spect=opt.use_spect_g,
        )
        self._train_step = None
        self._test_step = None

    def _semantic(self, batch):
        out = dict(batch)
        for key in ("BP1", "BP2"):
            if out[key].ndim == 2:
                out[key] = labels_to_semantic(
                    out[key], self.label_nc_h, self.label_nc_v
                )
        return out

    def init_state(self, rng, sample_batch):
        return super().init_state(rng, self._semantic(sample_batch))

    def _train_step_impl(self, state, batch):
        return super()._train_step_impl(state, self._semantic(batch))

    def test_step(self, state, batch):
        return super().test_step(state, self._semantic(batch))
