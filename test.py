"""Inference entry point — CLI-compatible with the reference test.py.

Loads the checkpoint and dispatches to the task family's test driver
(gfla_tpu/tasks/testing.py): pose/shapenet write `{src}_2_{tgt}_vis.jpg`
(the metrics CLI contract), dance/face stream chunks recurrently and stitch
mp4s, keypoint emits OpenPose JSONs.
"""

from __future__ import annotations

import numpy as np

from gfla_tpu.runtime import setup_runtime

setup_runtime()
import jax  # noqa: E402

from gfla_tpu.data import create_dataloader, encode_heatmaps  # noqa: E402
from gfla_tpu.options import TestOptions  # noqa: E402
from gfla_tpu.parallel import make_mesh, replicate_state, shard_batch  # noqa: E402
from gfla_tpu.tasks import create_task  # noqa: E402
from gfla_tpu.train.checkpoint import load_checkpoint  # noqa: E402


def main(options_cls=TestOptions):
    opt = options_cls().parse()
    loader = create_dataloader(opt)
    mesh = make_mesh(1)  # serial inference on one chip
    task = create_task(opt)

    def prepare_batch(batch):
        arrays = {k: v for k, v in batch.items()
                  if isinstance(v, np.ndarray)}
        dev = shard_batch(arrays, mesh)
        if "BP1" not in dev and "KP1" in dev:
            H, W = dev["P1"].shape[1:3]
            dev["BP1"] = encode_heatmaps(dev["KP1"], H, W)
            dev["BP2"] = encode_heatmaps(dev["KP2"], H, W)
        return dev

    first = prepare_batch(next(iter(loader)))
    state = task.init_state(jax.random.PRNGKey(0), first)
    state, step = load_checkpoint(
        opt.checkpoints_dir, opt.name, state, opt.which_iter
    )
    if step is None:
        print("WARNING: no checkpoint found; using random init")
    else:
        print(f"loaded checkpoint at iteration {step}")
    state = replicate_state(state, mesh)

    task.run_test(opt, state, loader, prepare_batch)


if __name__ == "__main__":
    main()
