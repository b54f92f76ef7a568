"""Training entry point — CLI-compatible with the reference train.py.

Epoch-less iteration loop (reference train.py:8-76): batches stream from the
loader, heatmaps are encoded on-device, the jitted GAN step runs under a
data-parallel mesh, and checkpoints/loss logs follow the reference cadence
flags (--print_freq / --save_latest_freq / --save_iters_freq).
"""

from __future__ import annotations

import time

from gfla_tpu.runtime import setup_runtime
setup_runtime()
import jax
import jax.numpy as jnp
import numpy as np

from gfla_tpu.data import create_dataloader, encode_heatmaps, infinite
from gfla_tpu.options import TrainOptions
from gfla_tpu.parallel import (
    enable_spatial_halo,
    make_mesh,
    make_mesh_2d,
    replicate_state,
    shard_batch,
    shard_batch_spatial,
)
from gfla_tpu.tasks import create_task
from gfla_tpu.train.checkpoint import get_iteration, load_checkpoint, save_checkpoint
from gfla_tpu.utils import Visualizer, flow2color, tensor2im


def prepare_batch(batch, opt, mesh):
    """Host batch → device batch. Pose-style batches get their keypoint
    coords encoded to heatmaps on device; animation/keypoint batches pass
    through sharded."""
    arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    if mesh.shape.get("spatial", 1) > 1:
        dev = shard_batch_spatial(arrays, mesh)
    else:
        dev = shard_batch(arrays, mesh)
    if "BP1" not in dev and "KP1" in dev:
        H, W = dev["P1"].shape[1:3]
        dev["BP1"] = encode_heatmaps(dev["KP1"], H, W)
        dev["BP2"] = encode_heatmaps(dev["KP2"], H, W)
    if "KP_all" in dev:
        # animation device encode (--no_device_encode disables): Gaussian
        # heatmaps from (B, T, 17, 2) coords, concat with host-drawn limb
        # RGB — numerically identical to the loader-built 20-ch maps
        import jax.numpy as jnp

        rgb = dev.pop("BP_all_rgb")
        H, W = rgb.shape[2:4]
        dev["BP_all"] = jnp.concatenate(
            [encode_heatmaps(dev.pop("KP_all"), H, W, missing_value=0.0),
             rgb], axis=-1)
        dev["ref_skeleton"] = jnp.concatenate(
            [encode_heatmaps(dev.pop("ref_KP"), H, W, missing_value=0.0),
             dev.pop("ref_rgb")], axis=-1)
    return dev


def evaluate_held_out(task, state, batch):
    """SSIM/PSNR/L1 of the current generator on a held-out batch (the
    reference's eval hook, train.py:52-58 / base_model.py:80-86 — latent
    there since no shipped model defines eval metrics; wired here)."""
    from gfla_tpu.metrics.reconstruction import (
        compare_l1,
        compare_psnr,
        compare_ssim,
    )

    if "gt_data" in batch and "input_data" in batch:
        # keypoint denoising: MSE of the denoised window vs gt, with the
        # identity (centered raw input) as the must-beat noise floor
        out = np.asarray(task.test_step(state, batch))
        gt = np.asarray(batch["gt_data"])
        T = gt.shape[1]
        out_c = out[:, (out.shape[1] - T) // 2:][:, :T]
        inp = np.asarray(batch["input_data"])
        inp_c = inp[:, (inp.shape[1] - T) // 2:][:, :T]
        return {
            "kp_mse": float(np.mean((out_c - gt) ** 2)),
            "kp_mse_identity": float(np.mean((inp_c - gt) ** 2)),
        }
    if "P2" not in batch and "P_all" not in batch:
        return {}  # no image ground truth (e.g. keypoint task)
    out = task.test_step(state, batch)
    gen = out[0] if isinstance(out, tuple) else out
    if not hasattr(gen, "ndim"):
        return {}
    if gen.ndim == 5:  # animation: (B, T, H, W, 3) vs P_all
        gt = batch.get("P_all")
        if gt is None:
            return {}
        gt = np.asarray(gt[:, : gen.shape[1]])
        gen = np.asarray(gen)
        gen = gen.reshape((-1,) + gen.shape[2:])
        gt = gt.reshape((-1,) + gt.shape[2:])
    else:
        gt = batch.get("P2")
        if gt is None or np.ndim(gt) != 4:
            return {}
        gen, gt = np.asarray(gen), np.asarray(gt)
    a = np.clip((gen + 1.0) / 2.0, 0.0, 1.0)
    b = np.clip((gt + 1.0) / 2.0, 0.0, 1.0)
    ssim = float(np.mean([compare_ssim(a[i], b[i]) for i in range(len(a))]))
    psnr = float(np.mean([compare_psnr(a[i], b[i]) for i in range(len(a))]))
    l1 = float(np.mean([compare_l1(a[i], b[i]) for i in range(len(a))]))
    return {"ssim": ssim, "psnr": psnr, "l1": l1}


def main():
    opt = TrainOptions().parse()
    if getattr(opt, "distributed", False):
        from gfla_tpu.runtime import init_distributed

        init_distributed()
    # Data sharding across hosts happens inside create_dataloader (shared
    # shuffle seed + disjoint strided index slice per process); this only
    # decorrelates any parent-side randomness.
    np.random.seed(opt.seed + jax.process_index())

    loader = create_dataloader(opt)
    # Hold out one batch of samples as a genuine validation set: these
    # indices never enter training (reference eval hook train.py:52-58 is
    # latent; here it must measure unseen data, not memorization).
    holdout_idx = None
    if getattr(opt, "eval_iters_freq", 0):
        n = len(loader.dataset)
        if n >= 2 * opt.batchSize:
            rng = np.random.RandomState(opt.seed + 9973)
            holdout_idx = np.sort(rng.choice(n, size=opt.batchSize,
                                             replace=False))
            loader.exclude = holdout_idx
            print(f"held out {len(holdout_idx)} samples for eval "
                  f"(indices {holdout_idx.tolist()})")
        else:
            print(f"WARNING: dataset too small ({n} samples) to hold out a "
                  f"val batch of {opt.batchSize}; eval will reuse training "
                  "data")
    if len(loader) == 0:
        raise SystemExit(
            f"dataset has {len(loader.dataset)} samples — fewer than "
            f"batchSize={opt.batchSize} (drop_last); reduce --batchSize"
        )
    if not opt.iters_per_epoch:
        opt.iters_per_epoch = max(1, len(loader))
    print(f"dataset [{opt.dataset_mode}] created: {len(loader.dataset)} samples,"
          f" {len(loader)} iters/epoch")

    sp = max(1, getattr(opt, "spatial", 1) or 1)
    if sp > 1:
        n_dev = opt.mesh_devices or len(jax.devices())
        if n_dev % sp:
            raise SystemExit(
                f"--spatial {sp} must divide the device count {n_dev}")
        if opt.load_size % sp:
            raise SystemExit(
                f"--spatial {sp} must divide the image height "
                f"{opt.load_size}")
        mesh = make_mesh_2d(n_dev // sp, sp)
        # attention block gathers go halo-sharded (shard_map + ppermute)
        # instead of all-gathering the source feature map
        enable_spatial_halo(mesh, "spatial", opt.halo)
        print(f"spatial partitioning: {sp} row shards, halo {opt.halo}")
    else:
        mesh = make_mesh(opt.mesh_devices)
    print(f"mesh: {mesh.shape} over {[str(d) for d in mesh.devices.flat]}")

    task = create_task(opt)
    visualizer = Visualizer(opt)

    batch_iter = infinite(loader)
    first = prepare_batch(next(batch_iter), opt, mesh)
    eval_batch = first  # fallback when no holdout is possible
    if holdout_idx is not None:
        from gfla_tpu.data import collate

        eval_batch = prepare_batch(
            collate([loader.dataset[int(i)] for i in holdout_idx]), opt, mesh
        )

    state = task.init_state(jax.random.PRNGKey(opt.seed), first)
    start_iter = 0
    if opt.continue_train:
        state, step = load_checkpoint(
            opt.checkpoints_dir, opt.name, state, opt.which_iter
        )
        if step is not None:
            start_iter = int(step)
            print(f"resumed from iteration {start_iter}")
        else:
            print("no checkpoint found; training from scratch")
    state = replicate_state(state, mesh)

    max_iters = opt.max_iters or (opt.niter * opt.iters_per_epoch)
    iters = start_iter
    batch = first
    t_last = time.time()
    # --profile_iters N: trace steps [warmup+1, warmup+N] into the
    # experiment dir (TensorBoard's profile plugin / xprof reads it)
    profile_at = (start_iter + 2) if opt.profile_iters else -1
    profile_dir = None
    while iters < max_iters:
        if iters == profile_at:
            import os

            profile_dir = os.path.join(opt.checkpoints_dir, opt.name,
                                       "profile")
            jax.profiler.start_trace(profile_dir)
        state, logs = task.train_step(state, batch)
        iters += 1
        if profile_dir and iters == profile_at + opt.profile_iters:
            jax.block_until_ready(logs["total_G"])
            jax.profiler.stop_trace()
            print(f"profiler trace written to {profile_dir}")
            profile_dir = None
        # overlap: fetch/encode next batch while the step executes
        batch = prepare_batch(next(batch_iter), opt, mesh)

        if iters % opt.print_freq == 0 or iters == start_iter + 1:
            logs = {k: float(v) for k, v in logs.items()}
            dt = (time.time() - t_last) / max(1, opt.print_freq)
            t_last = time.time()
            epoch = iters // opt.iters_per_epoch
            visualizer.print_current_errors(epoch, iters, logs, dt)

        if opt.display_freq and iters % opt.display_freq == 0:
            visuals = {}
            if "P1" in batch:
                visuals["input_P1"] = tensor2im(batch["P1"])
                visuals["input_P2"] = tensor2im(batch["P2"])
            out = task.test_step(state, batch)
            if isinstance(out, tuple) and len(out) == 3:
                img_gen, flows, masks = out
                visuals["img_gen"] = tensor2im(img_gen)
                # flow color wheels + occlusion masks per attention scale
                # (reference visual_names, pose_model.py:55)
                for j, (fl, mk) in enumerate(zip(flows, masks)):
                    visuals[f"flow_field{j}"] = flow2color(np.asarray(fl))
                    visuals[f"mask{j}"] = tensor2im(
                        np.asarray(mk) * 2.0 - 1.0
                    )
            else:
                img_gen = out[0] if isinstance(out, tuple) else out
                if hasattr(img_gen, "ndim") and img_gen.ndim == 5:
                    img_gen = img_gen[:, -1]
                if hasattr(img_gen, "ndim") and img_gen.ndim == 4:
                    visuals["img_gen"] = tensor2im(img_gen)
            visualizer.display_current_results(visuals, iters)
            # latent statistics hook (reference train.py:41-42): none of
            # the shipped tasks expose a distribution, but a custom task
            # returning {name: samples} here gets TB histograms
            if hasattr(task, "get_current_dis"):
                visualizer.plot_current_distribution(
                    task.get_current_dis(state), iters)

        if getattr(opt, "eval_iters_freq", 0) and \
                iters % opt.eval_iters_freq == 0:
            evals = evaluate_held_out(task, state, eval_batch)
            if evals:
                visualizer.print_current_eval(
                    iters // opt.iters_per_epoch, iters, evals
                )

        if iters % opt.save_latest_freq == 0 or iters % opt.save_iters_freq == 0:
            save_checkpoint(opt.checkpoints_dir, opt.name, iters, state,
                            keep_every=opt.save_iters_freq)

    if profile_dir:
        # max_iters hit before the trace window closed — flush it
        jax.block_until_ready(logs["total_G"])
        jax.profiler.stop_trace()
        print(f"profiler trace written to {profile_dir} (truncated at "
              f"iteration {iters})")
    save_checkpoint(opt.checkpoints_dir, opt.name, iters, state)
    print(f"training finished at iteration {iters}")


if __name__ == "__main__":
    main()
