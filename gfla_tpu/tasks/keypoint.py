"""Keypoint (Motion Extraction Net) task.

Capability parity with model/keypoint_model.py: KPInput2DGenerator trained
with MSE between denoised and ground-truth H36M-17 2-D sequences, single
Adam β=(0,0.999).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from gfla_tpu.models.keypoint_net import KPInput2DGenerator
from gfla_tpu.train.state import GANTrainState, make_optimizer


class KeypointTask:
    loss_names = ["mpjpe"]
    model_names = ["G"]

    @staticmethod
    def modify_options(parser, is_train=True):
        parser.add_argument("--netG", type=str, default="kpinput2d")
        parser.add_argument("--init_type", type=str, default="orthogonal")
        parser.add_argument("--lambda_mpjpe", type=float, default=1000)
        parser.add_argument("--write_image", action="store_true", default=False)
        parser.add_argument("--n_frames_pre_load", type=int, default=6)
        parser.add_argument("--start_frame", type=int, default=0)
        return parser

    def __init__(self, opt):
        self.opt = opt
        self.net_g = KPInput2DGenerator(
            structure_nc=getattr(opt, "structure_nc", 17),
            channels=getattr(opt, "kp_channels", 256),
            layers=getattr(opt, "kp_layers", 4),
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
            self.tx_d = optax.set_to_zero()
        self._train_step = None
        self._test_step = None

    def init_state(self, rng, batch) -> GANTrainState:
        # Jitted: one traced module instead of per-op remote compiles
        # (see PoseTask.init_state).
        return jax.jit(self._init_state_impl)(rng, batch)

    def _init_state_impl(self, rng, batch) -> GANTrainState:
        rp, rd = jax.random.split(rng)
        vg = self.net_g.init(
            {"params": rp, "dropout": rd}, batch["input_data"], train=True
        )
        return GANTrainState.create(
            params_g=vg["params"], params_d={}, stats_g={}, stats_d={},
            tx_g=self.tx_g, tx_d=self.tx_d,
        )

    def train_step(self, state, batch, rng=None):
        if self._train_step is None:
            self._train_step = jax.jit(self._train_step_impl, donate_argnums=0)
        rng = rng if rng is not None else jax.random.PRNGKey(int(state.step))
        return self._train_step(state, batch, rng)

    def _train_step_impl(self, state, batch, rng):
        def loss_fn(params):
            out = self.net_g.apply(
                {"params": params}, batch["input_data"], train=True,
                rngs={"dropout": rng},
            )
            return jnp.mean((out - batch["gt_data"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params_g)
        upd, new_opt = self.tx_g.update(grads, state.opt_state_g, state.params_g)
        new_params = optax.apply_updates(state.params_g, upd)
        return state.replace(
            step=state.step + 1, params_g=new_params, opt_state_g=new_opt
        ), {"mpjpe": loss, "total_G": loss}

    def run_test(self, opt, state, loader, prepare_batch):
        from gfla_tpu.tasks.testing import run_test_keypoint

        return run_test_keypoint(self, opt, state, loader, prepare_batch)

    def test_step(self, state, batch):
        if self._test_step is None:
            self._test_step = jax.jit(
                lambda p, x: self.net_g.apply({"params": p}, x, train=False)
            )
        return self._test_step(state.params_g, batch["input_data"])
