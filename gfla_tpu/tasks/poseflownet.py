"""Stage-1 flow-estimator pretraining task.

Capability parity with the reference PoseFlowNet model
(model/poseflownet_model.py): G = PoseFlowNetGenerator only, losses
correctness·20 + affine-regularization·0.01, single Adam β=(0,0.999).
Its checkpoints feed stage-2 (--model=pose --continue_train) through the
tolerant partial load (SURVEY.md §3.4).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from gfla_tpu.losses import MultiAffineRegularizationLoss, PerceptualCorrectness
from gfla_tpu.models import define_g
from gfla_tpu.models.vgg import load_vgg19_params
from gfla_tpu.train.state import GANTrainState, make_optimizer


class PoseFlowNetTask:
    loss_names = ["correctness", "regularization"]
    model_names = ["G"]

    @staticmethod
    def modify_options(parser, is_train=True):
        from gfla_tpu.options import StoreDictKeyPair, StoreList

        parser.add_argument("--netG", type=str, default="poseflownet")
        parser.add_argument("--init_type", type=str, default="orthogonal")
        parser.add_argument("--attn_layer", action=StoreList,
                            metavar="VAL1,VAL2...", default=[2, 3])
        parser.add_argument("--kernel_size", action=StoreDictKeyPair,
                            metavar="KEY1=VAL1,KEY2=VAL2...",
                            default={"2": 5, "3": 3})
        parser.add_argument("--lambda_correct", type=float, default=20.0)
        parser.add_argument("--lambda_regularization", type=float, default=0.01)
        parser.add_argument("--use_spect_g", action="store_true", default=False)
        return parser

    def __init__(self, opt):
        self.opt = opt
        self.attn_layer = [int(a) for a in opt.attn_layer]
        self.net_g = define_g(
            "poseflownet",
            image_nc=opt.image_nc, structure_nc=opt.structure_nc,
            ngf=32, img_f=256, encoder_layer=5,
            attn_layer=tuple(self.attn_layer), norm_type="instance",
            activation="LeakyReLU", use_spect=opt.use_spect_g,
        )
        self.vgg_params = load_vgg19_params()
        self.correctness = PerceptualCorrectness(self.vgg_params)
        self.regularization = MultiAffineRegularizationLoss(
            {int(k): int(v) for k, v in opt.kernel_size.items()}
        )
        self.is_train = getattr(opt, "isTrain", True)
        # eval mode still needs no-op optimizers for init_state
        self.tx_g = optax.set_to_zero()
        self.tx_d = optax.set_to_zero()
        if self.is_train:
            self.tx_g = make_optimizer(
                opt.lr, policy=opt.lr_policy, niter=opt.niter,
                niter_decay=opt.niter_decay, iter_count=opt.iter_count,
                iters_per_epoch=max(1, getattr(opt, "iters_per_epoch", 1000)),
            )
            self.tx_d = optax.set_to_zero()  # no discriminator
        self._train_step = None
        self._test_step = None

    def init_state(self, rng, sample_batch) -> GANTrainState:
        # Jitted: one traced module instead of per-op remote compiles
        # (see PoseTask.init_state).
        return jax.jit(self._init_state_impl)(rng, sample_batch)

    def _init_state_impl(self, rng, sample_batch) -> GANTrainState:
        p1, bp1, bp2 = (
            sample_batch["P1"], sample_batch["BP1"], sample_batch["BP2"]
        )
        vg = self.net_g.init(rng, p1, bp1, bp2)
        return GANTrainState.create(
            params_g=vg["params"], params_d={},
            stats_g=vg.get("batch_stats", {}), stats_d={},
            tx_g=self.tx_g, tx_d=self.tx_d,
        )

    def train_step(self, state: GANTrainState, batch) -> Tuple[GANTrainState, Dict]:
        if self._train_step is None:
            self._train_step = jax.jit(self._train_step_impl, donate_argnums=0)
        return self._train_step(state, batch)

    def _train_step_impl(self, state, batch):
        opt = self.opt
        p1, bp1, p2, bp2 = batch["P1"], batch["BP1"], batch["P2"], batch["BP2"]

        def loss_fn(params_g):
            variables = {"params": params_g}
            if state.stats_g:
                variables["batch_stats"] = state.stats_g
            (flows, masks), new_vars = self.net_g.apply(
                variables, p1, bp1, bp2, mutable=["batch_stats"]
            )
            loss_correct = (
                self.correctness(p2, p1, flows, self.attn_layer)
                * opt.lambda_correct
            )
            loss_reg = self.regularization(flows) * opt.lambda_regularization
            total = loss_correct + loss_reg
            return total, (
                {"correctness": loss_correct, "regularization": loss_reg},
                new_vars.get("batch_stats", state.stats_g),
            )

        (total, (logs, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params_g)
        upd, new_opt = self.tx_g.update(grads, state.opt_state_g, state.params_g)
        new_params = optax.apply_updates(state.params_g, upd)
        logs = dict(logs, total_G=total)
        return state.replace(
            step=state.step + 1, params_g=new_params, stats_g=new_stats,
            opt_state_g=new_opt,
        ), logs

    def test_step(self, state: GANTrainState, batch):
        if self._test_step is None:
            def _impl(params_g, stats_g, p1, bp1, bp2):
                variables = {"params": params_g}
                if stats_g:
                    variables["batch_stats"] = stats_g
                return self.net_g.apply(variables, p1, bp1, bp2)
            self._test_step = jax.jit(_impl)
        return self._test_step(
            state.params_g, state.stats_g,
            batch["P1"], batch["BP1"], batch["BP2"],
        )
