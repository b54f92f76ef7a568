"""Render a held-out before/after panel from a training checkpoint.

Loads the checkpoint selected by --which_iter, rebuilds the SAME held-out
validation batch train.py carved out (same --seed ⇒ same indices), runs the
eval-mode generator, and writes a grid png. Pose/still tasks: rows =
source P1 / target structure BP2 / generated / ground-truth P2, one column
per sample. Animation tasks (dance/face): per held-out sequence, rows =
driving structure / generated / ground truth across the frame window, with
the reference appearance image as the first column. Also prints the batch
SSIM/PSNR/L1 — the visual companion to eval_log.txt.

Usage (same flags as train.py):
  python scripts/eval_panel.py --name learn_scratch --model pose \
      --dataset_mode fashion --dataroot /tmp/stickfigure --batchSize 8 \
      --checkpoints_dir /root/runs --which_iter 2000
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gfla_tpu.runtime import setup_runtime

setup_runtime()
import jax
import numpy as np


def main():
    from PIL import Image

    from gfla_tpu.data import collate, create_dataloader
    from gfla_tpu.options import TrainOptions
    from gfla_tpu.parallel import make_mesh, replicate_state
    from gfla_tpu.tasks import create_task
    from gfla_tpu.train.checkpoint import load_checkpoint
    from gfla_tpu.utils import tensor2im
    from train import evaluate_held_out, prepare_batch

    opt = TrainOptions().parse()
    np.random.seed(opt.seed)
    loader = create_dataloader(opt)
    n = len(loader.dataset)
    # Re-derive train.py's holdout under the SAME condition it used: a
    # batch was only withheld when --eval_iters_freq was set and the
    # dataset could spare one. Otherwise these samples were trained on —
    # say so rather than mislabel a memorization panel as validation.
    withheld = bool(getattr(opt, "eval_iters_freq", 0)) \
        and n >= 2 * opt.batchSize
    rng = np.random.RandomState(opt.seed + 9973)
    holdout = np.sort(rng.choice(n, size=min(opt.batchSize, n),
                                 replace=False))
    if withheld:
        print(f"held-out indices: {holdout.tolist()}")
    else:
        print(f"WARNING: this batch was NOT held out during training "
              f"(train.py only withholds when --eval_iters_freq is set and "
              f"the dataset has >= 2*batchSize samples; n={n}). The panel "
              f"shows TRAINED-ON samples — indices {holdout.tolist()}")

    mesh = make_mesh(opt.mesh_devices)
    batch = prepare_batch(collate([loader.dataset[int(i)] for i in holdout]),
                          opt, mesh)

    task = create_task(opt)
    state = task.init_state(jax.random.PRNGKey(opt.seed), batch)
    state, step = load_checkpoint(opt.checkpoints_dir, opt.name, state,
                                  opt.which_iter)
    label = f"iter{step}" if step is not None else "init"
    if step is None:
        print("no checkpoint loaded — rendering the UNTRAINED generator")
    state = replicate_state(state, mesh)

    out = task.test_step(state, batch)
    gen = np.asarray(out[0] if isinstance(out, tuple) else out)
    evals = evaluate_held_out(task, state, batch)
    print(f"{label}: " + " ".join(f"{k}={v:.4f}" for k, v in evals.items()))

    os.makedirs(opt.results_dir, exist_ok=True)
    if "P_all" in batch:  # animation: (B, T, H, W, 3) frame windows
        def to_u8(x):
            return (np.clip((np.asarray(x) + 1.0) / 2.0, 0, 1)
                    * 255).astype(np.uint8)

        def struct_vis(bp_t):  # (H, W, C) -> RGB
            bp_t = np.asarray(bp_t)
            if bp_t.shape[-1] == 20:  # dance: last 3 ch = drawn limb RGB
                return (np.clip(bp_t[..., 17:], 0, 1) * 255).astype(np.uint8)
            edge = (np.clip(bp_t[..., 0], 0, 1) * 255).astype(np.uint8)
            return np.repeat(edge[..., None], 3, axis=-1)

        gt = np.asarray(batch["P_all"])[:, : gen.shape[1]]
        bp = np.asarray(batch["BP_all"])[:, : gen.shape[1]]
        blocks = []
        for b in range(gen.shape[0]):
            ref = to_u8(batch["ref_image"][b])
            rows = [
                np.concatenate([ref] + [struct_vis(bp[b, t])
                                        for t in range(gen.shape[1])], 1),
                np.concatenate([ref] + [to_u8(gen[b, t])
                                        for t in range(gen.shape[1])], 1),
                np.concatenate([ref] + [to_u8(gt[b, t])
                                        for t in range(gen.shape[1])], 1),
            ]
            blocks.append(np.concatenate(rows, axis=0))
        grid = np.concatenate(blocks, axis=0)
        path = os.path.join(opt.results_dir, f"panel_{opt.name}_{label}.png")
        Image.fromarray(grid).save(path)
        print(f"wrote {path}  (per sequence: rows = structure / generated / "
              f"GT; col 0 = reference appearance, then {gen.shape[1]} frames)")
        return

    B = gen.shape[0]
    p1 = [tensor2im(np.asarray(batch["P1"]), i) for i in range(B)]
    p2 = [tensor2im(np.asarray(batch["P2"]), i) for i in range(B)]
    gen_im = [tensor2im(gen, i) for i in range(B)]
    bp2 = np.asarray(batch["BP2"])
    if bp2.ndim == 2:  # shapenet: (B, 2) = (azimuth/10, elevation) labels
        import cv2

        H, W = p1[0].shape[:2]
        bp2_im = []
        for az10, elev in bp2:
            tile = np.full((H, W, 3), 30, np.uint8)
            c, r = (W // 2, H // 2), min(H, W) // 3
            cv2.circle(tile, c, r, (200, 200, 200), 2)
            th = np.deg2rad(float(az10) * 10.0 - 90.0)
            tip = (int(c[0] + r * np.cos(th)), int(c[1] + r * np.sin(th)))
            cv2.line(tile, c, tip, (80, 220, 80), 3)
            cv2.putText(tile, f"az={int(az10) * 10} el={int(elev)}",
                        (8, H - 10), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                        (255, 255, 255), 1, cv2.LINE_AA)
            bp2_im.append(tile)
    else:  # (B, H, W, K) heatmaps
        bp2_im = list(np.repeat(
            (np.clip(bp2.max(-1, keepdims=True), 0, 1) * 255).astype(
                np.uint8),
            3, axis=-1))

    rows = [p1, bp2_im, gen_im, p2]
    grid = np.concatenate(
        [np.concatenate(r, axis=1) for r in rows], axis=0)
    path = os.path.join(opt.results_dir, f"panel_{opt.name}_{label}.png")
    Image.fromarray(grid).save(path)
    print(f"wrote {path}  (rows: P1 / BP2 / generated / GT, {B} columns)")


if __name__ == "__main__":
    main()
