"""Inference entry point — CLI-compatible with the reference test.py.

Loads the checkpoint, runs the generator over the test split, and writes
results named `{src}_2_{tgt}_vis.jpg` — the filename contract consumed by
the metrics CLI (reference pose_model.py:108-110, script/metrics.py:414-439).
"""

from __future__ import annotations

import os

import imageio
from gfla_tpu.runtime import setup_runtime
setup_runtime()
import jax
import numpy as np

from gfla_tpu.data import create_dataloader, encode_heatmaps
from gfla_tpu.options import TestOptions
from gfla_tpu.parallel import make_mesh, replicate_state, shard_batch
from gfla_tpu.tasks import create_task
from gfla_tpu.train.checkpoint import load_checkpoint
from gfla_tpu.utils import tensor2im


def prepare_batch(batch, mesh):
    arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    dev = shard_batch(arrays, mesh)
    if "BP1" not in dev and "KP1" in dev:
        H, W = dev["P1"].shape[1:3]
        dev["BP1"] = encode_heatmaps(dev["KP1"], H, W)
        dev["BP2"] = encode_heatmaps(dev["KP2"], H, W)
    return dev


def main():
    opt = TestOptions().parse()
    loader = create_dataloader(opt)
    mesh = make_mesh(1)  # serial inference on one chip
    task = create_task(opt)

    first = prepare_batch(next(iter(loader)), mesh)
    state = task.init_state(jax.random.PRNGKey(0), first)
    state, step = load_checkpoint(
        opt.checkpoints_dir, opt.name, state, opt.which_iter
    )
    if step is None:
        print("WARNING: no checkpoint found; using random init")
    state = replicate_state(state, mesh)

    out_dir = os.path.join(opt.results_dir, opt.name)
    os.makedirs(out_dir, exist_ok=True)

    n = 0
    for batch in loader:
        dev = prepare_batch(batch, mesh)
        out = task.test_step(state, dev)
        img_gen = out[0] if isinstance(out, tuple) else out
        for i in range(img_gen.shape[0]):
            src = os.path.splitext(batch["P1_path"][i])[0]
            tgt = batch["P2_path"][i]
            name = f"{src}_2_{tgt}_vis.jpg"
            imageio.imwrite(os.path.join(out_dir, name), tensor2im(img_gen, i))
            if getattr(opt, "save_input", False) or opt.phase == "val":
                imageio.imwrite(
                    os.path.join(out_dir, f"{src}_2_{tgt}_ref.jpg"),
                    tensor2im(dev["P1"], i),
                )
                imageio.imwrite(
                    os.path.join(out_dir, f"{src}_2_{tgt}_gt.jpg"),
                    tensor2im(dev["P2"], i),
                )
                allimg = np.concatenate(
                    [tensor2im(dev["P1"], i), tensor2im(img_gen, i),
                     tensor2im(dev["P2"], i)], axis=1,
                )
                imageio.imwrite(
                    os.path.join(out_dir, f"{src}_2_{tgt}_all.jpg"), allimg
                )
            n += 1
        if n >= opt.max_dataset_size:
            break
    print(f"wrote {n} results to {out_dir}")


if __name__ == "__main__":
    main()
