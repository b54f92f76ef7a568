"""Recurrent animation tasks: dance (person) and face.

Capability parity with model/dance_model.py and model/face_model.py:
truncated-BPTT training over `max_frames_per_gpu`-frame windows with the
generated last frame carried (detached) across windows; per-frame
L1+VGG losses; per-scale correctness/regularization split into
previous/reference streams; random-frame spatial GAN; random-window
temporal GAN. Differences between the two heads:

* dance: D_V = TemporalDiscriminator over an F-frame clip
  (dance_model.py:360-370); correctness_p target-source = ground-truth
  previous frames (dance_model.py:310,405); optional foreground masks
  (iPER) weight the correctness loss, with λ_correct→2.0
  (dance_model.py:115-117).
* face: D_V = ResDiscriminator over channel-stacked consecutive frame
  *differences*, input_nc=(frames_D_V−1)·3 (face_model.py:90-91,303-311);
  correctness_p uses the *generated* previous frames, detached
  (face_model.py:342-343).

TPU-native step: one jitted function per chunk. The generator's frame
recurrence runs as a `lax.scan` (compile time O(1) in n_frames) and the
per-frame losses are computed on temporally-folded (B·T) batches — one
VGG forward per image set; random frame/window selection uses an
on-device PRNG key so the step stays pure. Both discriminators update
under a single Adam (the reference chains their params into one
optimizer, dance_model.py:109-112).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
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
from gfla_tpu.train.state import make_optimizer
from flax import struct

# (N, T) pairs whose tail-drop warning already printed (once per run, not
# once per training step)
_TAIL_DROP_WARNED: set = set()


class AnimationTrainState(struct.PyTreeNode):
    step: jax.Array
    params_g: Any
    params_d: Any      # {'D': ..., 'D_V': ...}
    stats_g: Any
    stats_d: Any       # {'D': ..., 'D_V': ...}
    opt_state_g: Any
    opt_state_d: Any


class AnimationTaskBase:
    """Shared implementation; `kind` ∈ {'dance', 'face'}."""

    kind = "dance"
    loss_names = [
        "app_gen", "correctness_p", "correctness_r", "content_gen",
        "style_gen", "regularization_p", "regularization_r",
        "ad_gen", "dis_img_gen", "ad_gen_v", "dis_img_gen_v",
    ]
    model_names = ["G", "D", "D_V"]

    @classmethod
    def modify_options(cls, parser, is_train=True):
        from gfla_tpu.options import StoreDictKeyPair, StoreList

        parser.add_argument("--attn_layer", action=StoreList,
                            metavar="VAL1,VAL2...", default=[2, 3])
        parser.add_argument("--kernel_size", action=StoreDictKeyPair,
                            metavar="KEY1=VAL1,KEY2=VAL2...",
                            default={"2": 5, "3": 3})
        parser.add_argument("--layers", type=int, default=3)
        parser.add_argument("--netG", type=str, default=cls.kind)
        parser.add_argument("--netD", type=str, default="res")
        parser.add_argument("--netD_V", type=str,
                            default="temporal" if cls.kind == "dance" else "res")
        parser.add_argument("--init_type", type=str, default="orthogonal")
        parser.add_argument("--ratio_g2d", type=float, default=0.1)
        parser.add_argument("--lambda_rec", type=float, default=5.0)
        parser.add_argument("--lambda_g", type=float, default=2.0)
        parser.add_argument("--lambda_correct", type=float, default=5.0)
        parser.add_argument("--lambda_style", type=float, default=500.0)
        parser.add_argument("--lambda_content", type=float, default=0.5)
        parser.add_argument("--lambda_regularization", type=float,
                            default=0.0025)
        parser.add_argument("--frames_D_V", type=int,
                            default=6 if cls.kind == "dance" else 3)
        parser.add_argument("--max_frames_per_gpu", type=int, default=6)
        parser.add_argument("--n_frames_total", type=int, default=12)
        parser.add_argument("--max_t_step", type=int, default=1)
        parser.add_argument("--n_frames_pre_load_test", type=int, default=6)
        parser.add_argument("--start_frame", type=int, default=0)
        parser.add_argument("--use_mask", action="store_true", default=False)
        parser.add_argument("--use_spect_g", action="store_true", default=False)
        add_spect_d_flags(parser)
        parser.add_argument("--write_ext", type=str, default="png")
        return parser

    def __init__(self, opt):
        self.opt = opt
        if getattr(opt, "isTrain", True) and \
                opt.frames_D_V > opt.max_frames_per_gpu:
            # The reference crashes deep in backward_D on this config
            # (randint(len(img_gen) - frames_D_V + 1), dance_model.py:362);
            # fail at init with an actionable message instead.
            raise ValueError(
                f"--frames_D_V={opt.frames_D_V} (temporal-D window) cannot "
                f"exceed --max_frames_per_gpu={opt.max_frames_per_gpu} "
                "(frames generated per chunk)"
            )
        if self.kind == "dance" and opt.frames_D_V < 5:
            # the 3-D TemporalDiscriminator's two unpadded time convs eat
            # 4 frames (feature_len = input_length - 4 must stay positive,
            # reference discriminator.py:100-140)
            raise ValueError(
                f"--frames_D_V={opt.frames_D_V} is below the temporal "
                "discriminator's minimum of 5 (two 3-D encoders each "
                "shrink the time axis by 2)"
            )
        kz = {str(k): int(v) for k, v in opt.kernel_size.items()}
        self.attn_layer = [int(a) for a in opt.attn_layer]
        use_spect_d = resolve_use_spect_d(opt)
        self.net_g = define_g(
            self.kind,
            image_nc=opt.image_nc, structure_nc=opt.structure_nc,
            output_nc=opt.image_nc, ngf=getattr(opt, "ngf", 64),
            img_f=getattr(opt, "img_f", 512), layers=opt.layers,
            num_blocks=2, norm_type="instance", activation="LeakyReLU",
            attn_layer=tuple(self.attn_layer), extractor_kz=kz,
            use_spect=opt.use_spect_g,
        )
        ndf = getattr(opt, "ndf", 32)
        d_img_f = getattr(opt, "d_img_f", 128)
        d_layers = getattr(opt, "d_layers", 4)
        self.net_d = define_d("res", ndf=ndf, img_f=d_img_f, layers=d_layers,
                              use_spect=use_spect_d)
        if self.kind == "dance":
            self.net_d_v = define_d(
                "temporal", input_length=opt.frames_D_V, ndf=ndf,
                img_f=d_img_f, layers=d_layers, use_spect=use_spect_d,
            )
        else:
            self.net_d_v = define_d("res", ndf=ndf, img_f=d_img_f,
                                    layers=d_layers, use_spect=use_spect_d)
        self.dtype = compute_dtype(getattr(opt, "compute_dtype", "float32"))
        self.vgg_params = cast_tree(load_vgg19_params(), self.dtype)
        self.correctness = PerceptualCorrectness(self.vgg_params)
        self.regularization = MultiAffineRegularizationLoss(
            {int(k): int(v) for k, v in opt.kernel_size.items()}
        )
        self.use_mask = getattr(opt, "use_mask", False)
        if self.use_mask and self.kind == "dance":
            opt.lambda_correct = 2.0  # dance_model.py:115-117
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
        self._chunk_step = None
        self._test_step = None

    # ------------------------------------------------------------------
    def init_state(self, rng, chunk) -> AnimationTrainState:
        # Jitted: one traced module instead of per-op remote compiles
        # (see PoseTask.init_state). The key check below is trace-static.
        return jax.jit(self._init_state_impl)(rng, chunk)

    def _init_state_impl(self, rng, chunk) -> AnimationTrainState:
        if "P_step" not in chunk:  # full-clip batch from the train loop
            T = min(self.opt.max_frames_per_gpu, chunk["P_all"].shape[1])
            chunk = {
                "P_step": chunk["P_all"][:, :T],
                "BP_step": chunk["BP_all"][:, :T],
                "ref_image": chunk["ref_image"],
                "ref_skeleton": chunk["ref_skeleton"],
                "pre_image": chunk["ref_image"],
                "pre_skeleton": chunk["BP_all"][:, 0],
                "pre_gt_image": chunk["ref_image"],
            }
        rg, rd, rv = jax.random.split(rng, 3)
        vg = self.net_g.init(
            rg, chunk["BP_step"], chunk["ref_image"], chunk["ref_skeleton"],
            chunk["pre_image"], chunk["pre_skeleton"],
        )
        frame0 = chunk["P_step"][:, 0]
        vd = self.net_d.init(rd, frame0)
        F = self.opt.frames_D_V
        if self.kind == "dance":
            clip = jnp.repeat(frame0[:, None], F, axis=1)
            vdv = self.net_d_v.init(rv, clip)
        else:
            diffs = jnp.concatenate([frame0] * (F - 1), axis=-1)
            vdv = self.net_d_v.init(rv, diffs)
        params_d = {"D": vd["params"], "D_V": vdv["params"]}
        stats_d = {"D": vd.get("batch_stats", {}),
                   "D_V": vdv.get("batch_stats", {})}
        return AnimationTrainState(
            step=jnp.zeros((), jnp.int32),
            params_g=vg["params"], params_d=params_d,
            stats_g=vg.get("batch_stats", {}), stats_d=stats_d,
            opt_state_g=self.tx_g.init(vg["params"]),
            opt_state_d=self.tx_d.init(params_d),
        )

    # ------------------------------------------------------------------
    def _g_apply(self, params, stats, chunk):
        """Generator forward in the compute dtype; fp32 outputs/stats."""
        cd = self.dtype
        variables = {"params": cast_tree(params, cd)}
        if stats:
            variables["batch_stats"] = cast_tree(stats, cd)
        outs, new_vars = self.net_g.apply(
            variables,
            chunk["BP_step"].astype(cd), chunk["ref_image"].astype(cd),
            chunk["ref_skeleton"].astype(cd), chunk["pre_image"].astype(cd),
            chunk["pre_skeleton"].astype(cd),
            # --remat: checkpoint each frame of the recurrence — peak
            # activation HBM goes O(T) → O(1) (frame-boundary residuals
            # only), fitting reference-sized chunks on one chip
            remat=getattr(self.opt, "remat", False),
            mutable=["batch_stats"],
        )
        return to_f32(outs), to_f32(new_vars.get("batch_stats", stats))

    def _d_apply(self, net, params, stats, x, update_stats):
        cd = self.dtype
        variables = {"params": cast_tree(params, cd)}
        if stats:
            variables["batch_stats"] = cast_tree(stats, cd)
        x = x.astype(cd)
        if update_stats:
            out, new_vars = net.apply(variables, x, update_stats=True,
                                      mutable=["batch_stats"])
            return out.astype(jnp.float32), to_f32(
                new_vars.get("batch_stats", stats)
            )
        return net.apply(variables, x, update_stats=False).astype(
            jnp.float32
        ), stats

    def _dv_fake_real(self, frames, start):
        """Assemble the temporal-D input from an F-frame window."""
        F = self.opt.frames_D_V
        window = jax.lax.dynamic_slice_in_dim(frames, start, F, axis=1)
        if self.kind == "dance":
            return window  # (B, F, H, W, C) clip
        diffs = [window[:, f] - window[:, f + 1] for f in range(F - 1)]
        return jnp.concatenate(diffs, axis=-1)

    # ------------------------------------------------------------------
    def train_chunk(self, state, chunk, rng):
        """One optimization step over one temporal chunk. Returns
        (state, logs, (pre_image, pre_skeleton, pre_gt_image))."""
        if self._chunk_step is None:
            self._chunk_step = jax.jit(self._chunk_step_impl, donate_argnums=0)
        return self._chunk_step(state, chunk, rng)

    def _chunk_step_impl(self, state, chunk, rng):
        opt = self.opt
        p_step = chunk["P_step"]          # (B, T, H, W, 3) ground truth
        T = p_step.shape[1]
        F = opt.frames_D_V
        k_frame, k_win, k_frame_g, k_win_g = jax.random.split(rng, 4)
        i_d = jax.random.randint(k_frame, (), 0, T)
        s_d = jax.random.randint(k_win, (), 0, max(1, T - F + 1))
        i_g = jax.random.randint(k_frame_g, (), 0, T)
        s_g = jax.random.randint(k_win_g, (), 0, max(1, T - F + 1))

        # ---- single G forward over the chunk --------------------------
        def g_forward(params_g):
            (gen, flows_all, masks_all, prev_rec), new_stats = self._g_apply(
                params_g, state.stats_g, chunk
            )
            return (gen, flows_all, prev_rec), new_stats

        (gen, flows_all, prev_rec), g_vjp, new_stats_g = jax.vjp(
            g_forward, state.params_g, has_aux=True
        )
        fake_frames = jax.lax.stop_gradient(gen)

        # ---- D update (spatial + temporal, one optimizer) --------------
        def d_loss_fn(params_d):
            fake_i = jnp.take(fake_frames, i_d, axis=1)
            real_i = jnp.take(p_step, i_d, axis=1)
            d_real, st1 = self._d_apply(self.net_d, params_d["D"],
                                        state.stats_d["D"], real_i, True)
            d_fake, st2 = self._d_apply(self.net_d, params_d["D"], st1,
                                        fake_i, True)
            loss_d = 0.5 * (
                adversarial_loss(d_real, True, True, opt.gan_mode)
                + adversarial_loss(d_fake, False, True, opt.gan_mode)
            )
            fake_v = self._dv_fake_real(fake_frames, s_d)
            real_v = self._dv_fake_real(p_step, s_d)
            dv_real, sv1 = self._d_apply(self.net_d_v, params_d["D_V"],
                                         state.stats_d["D_V"], real_v, True)
            dv_fake, sv2 = self._d_apply(self.net_d_v, params_d["D_V"], sv1,
                                         fake_v, True)
            loss_dv = 0.5 * (
                adversarial_loss(dv_real, True, True, opt.gan_mode)
                + adversarial_loss(dv_fake, False, True, opt.gan_mode)
            )
            return loss_d + loss_dv, (loss_d, loss_dv,
                                      {"D": st2, "D_V": sv2})

        (_, (loss_d, loss_dv, new_stats_d)), grads_d = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.params_d)
        upd_d, new_opt_d = self.tx_d.update(grads_d, state.opt_state_d,
                                            state.params_d)
        new_params_d = optax.apply_updates(state.params_d, upd_d)

        # ---- G losses ---------------------------------------------------
        mask_step = chunk.get("mask_step") if self.use_mask else None

        def g_loss_fn(outputs):
            """Per-frame losses of the reference (dance_model.py:372-441),
            computed EXACTLY but with the frame axis folded into the batch:
            one VGG forward per image set instead of T — bigger MXU batches
            and an O(1)-in-T loss graph. Σ_t mean_t == T · mean_folded for
            every equal-sized per-frame term; the masked correctness uses
            per-frame grouping inside the loss (frames=T)."""
            from gfla_tpu.models.vgg import vgg19_features

            gen, flows, prev_rec = outputs  # flows: [levels × (B,T,h,w,2)]
            Bn = gen.shape[0]

            def fold(a):  # (B, T, ...) → (B·T, ...) in (b, t) order
                return a.reshape((Bn * T,) + a.shape[2:])

            def tile(a):  # (B, ...) → (B·T, ...) matching fold's order
                return jnp.repeat(a, T, axis=0)

            gen_f, gt_f = fold(gen), fold(p_step)
            gt_feats = vgg19_features(self.vgg_params, gt_f)
            loss_app = l1_loss(gen_f, gt_f) * T
            c, s = vgg_content_style_loss(self.vgg_params, gen_f, gt_f,
                                          fy=gt_feats)
            loss_content = c * T
            loss_style = s * T

            flow_p = [fold(flows[j]) for j in range(0, len(flows), 2)]
            flow_r = [fold(flows[j + 1]) for j in range(0, len(flows), 2)]
            m_f = fold(mask_step) if mask_step is not None else None
            if self.kind == "dance":
                # correctness_p warps the ground-truth previous frames
                # (dance_model.py:310,405)
                prev_src = jnp.concatenate(
                    [chunk["pre_gt_image"][:, None], p_step[:, :-1]], axis=1
                )
            else:
                # face warps the generated previous frames, detached
                # (face_model.py:342-343)
                prev_src = jax.lax.stop_gradient(prev_rec)
            # the reference image is static: one VGG forward, features tiled
            ref_feats = jax.tree_util.tree_map(
                tile, vgg19_features(self.vgg_params, chunk["ref_image"])
            )
            loss_cr = self.correctness(
                gt_f, None, flow_r, self.attn_layer, m_f, frames=T,
                target_feats=gt_feats, source_feats=ref_feats,
            )
            loss_cp = self.correctness(
                gt_f, fold(prev_src), flow_p, self.attn_layer, m_f, frames=T,
                target_feats=gt_feats,
            )
            loss_rp = self.regularization(flow_p) * T
            loss_rr = self.regularization(flow_r) * T

            d_fake, _ = self._d_apply(
                self.net_d, new_params_d["D"], new_stats_d["D"],
                jnp.take(gen, i_g, axis=1), False,
            )
            loss_ad = adversarial_loss(d_fake, True, False, opt.gan_mode) \
                * opt.lambda_g
            dv_fake, _ = self._d_apply(
                self.net_d_v, new_params_d["D_V"], new_stats_d["D_V"],
                self._dv_fake_real(gen, s_g), False,
            )
            loss_ad_v = adversarial_loss(dv_fake, True, False, opt.gan_mode) \
                * opt.lambda_g

            logs = {
                "app_gen": loss_app * opt.lambda_rec,
                "content_gen": loss_content * opt.lambda_content,
                "style_gen": loss_style * opt.lambda_style,
                "correctness_p": loss_cp * opt.lambda_correct,
                "correctness_r": loss_cr * opt.lambda_correct,
                "regularization_p": loss_rp * opt.lambda_regularization,
                "regularization_r": loss_rr * opt.lambda_regularization,
                "ad_gen": loss_ad,
                "ad_gen_v": loss_ad_v,
            }
            total = sum(logs.values())
            return total, logs

        (loss_g, logs), grads_out = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )((gen, flows_all, prev_rec))
        (grads_g,) = g_vjp(grads_out)
        upd_g, new_opt_g = self.tx_g.update(grads_g, state.opt_state_g,
                                            state.params_g)
        new_params_g = optax.apply_updates(state.params_g, upd_g)

        logs = dict(logs, dis_img_gen=loss_d, dis_img_gen_v=loss_dv,
                    total_G=loss_g)
        new_state = state.replace(
            step=state.step + 1,
            params_g=new_params_g, params_d=new_params_d,
            stats_g=new_stats_g, stats_d=new_stats_d,
            opt_state_g=new_opt_g, opt_state_d=new_opt_d,
        )
        carry = (
            fake_frames[:, -1],
            chunk["BP_step"][:, -1],
            p_step[:, -1],
        )
        return new_state, logs, carry

    # ------------------------------------------------------------------
    def train_step(self, state, batch, rng=None):
        """Full iteration = loop over temporal chunks (reference update(),
        dance_model.py:304-330). `batch` holds the whole clip; chunking
        happens here, carries detached between chunks."""
        opt = self.opt
        rng = rng if rng is not None else jax.random.PRNGKey(int(state.step))
        p = batch["P_all"]           # (B, N, H, W, 3)
        bp = batch["BP_all"]         # (B, N, H, W, nc)
        masks = batch.get("mask_all")
        N = p.shape[1]
        T = min(opt.max_frames_per_gpu, N)
        pre_image = batch["ref_image"]
        pre_skeleton = batch["ref_skeleton"]
        pre_gt_image = batch["ref_image"]
        logs_acc = None
        n_chunks = 0
        if N % T and (N, T) not in _TAIL_DROP_WARNED:
            # The reference would crash here (.view(-1, n_frames_load, ...),
            # dance_model.py:136-143); we train on the full chunks but refuse
            # to *silently* drop the tail. Warn once, not once per step.
            _TAIL_DROP_WARNED.add((N, T))
            print(f"animation: dropping {N % T} trailing frame(s) — "
                  f"n_frames_total={N} is not a multiple of "
                  f"max_frames_per_gpu={T}")
        for s in range(0, N - (N % T), T):
            chunk = {
                "P_step": p[:, s : s + T],
                "BP_step": bp[:, s : s + T],
                "ref_image": batch["ref_image"],
                "ref_skeleton": batch["ref_skeleton"],
                "pre_image": pre_image,
                "pre_skeleton": pre_skeleton,
                "pre_gt_image": pre_gt_image,
            }
            if masks is not None:
                chunk["mask_step"] = masks[:, s : s + T]
            rng, sub = jax.random.split(rng)
            state, logs, carry = self.train_chunk(state, chunk, sub)
            pre_image, pre_skeleton, pre_gt_image = carry
            logs_acc = logs if logs_acc is None else {
                k: logs_acc[k] + v for k, v in logs.items()
            }
            n_chunks += 1
        logs = {k: v / n_chunks for k, v in logs_acc.items()}
        return state, logs

    # ------------------------------------------------------------------
    def run_test(self, opt, state, loader, prepare_batch):
        from gfla_tpu.tasks.testing import run_test_animation

        return run_test_animation(self, opt, state, loader, prepare_batch)

    # ------------------------------------------------------------------
    def test_step(self, state, batch, pre_image=None, pre_skeleton=None):
        """Generate one chunk of frames; returns (frames, carry)."""
        if self._test_step is None:
            def _impl(params_g, stats_g, bp, ref_img, ref_skel, pre_i, pre_s):
                variables = {"params": params_g}
                if stats_g:
                    variables["batch_stats"] = stats_g
                gen, flows, masks, _ = self.net_g.apply(
                    variables, bp, ref_img, ref_skel, pre_i, pre_s,
                    train=False,
                )
                return gen
            self._test_step = jax.jit(_impl)
        pre_i = pre_image if pre_image is not None else batch["ref_image"]
        pre_s = pre_skeleton if pre_skeleton is not None else batch["ref_skeleton"]
        gen = self._test_step(
            state.params_g, state.stats_g, batch["BP_all"],
            batch["ref_image"], batch["ref_skeleton"], pre_i, pre_s,
        )
        return gen, (gen[:, -1], batch["BP_all"][:, -1])


class DanceTask(AnimationTaskBase):
    kind = "dance"


class FaceTask(AnimationTaskBase):
    kind = "face"
