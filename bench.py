"""Benchmark: pose-transfer training throughput (images/sec/chip).

Runs the full jitted GAN train step (G fwd + D update + G update with all
six losses) on synthetic fixed-seed data at the DeepFashion config
(256×256, batch 8 — reference defaults: options/base_options.py:27,
data/fashion_dataset.py:15-18) on the available accelerator.

Baseline: the reference publishes no throughput numbers (BASELINE.md).
vs_baseline is computed against an estimated 7 img/s for the PyTorch
reference on a V100 at this config (~1.1 s/iter for the same G+D step —
BASELINE.json's north star asks for ≥5× that, i.e. vs_baseline ≥ 5.0).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import time

from gfla_tpu.runtime import setup_runtime
setup_runtime()
import jax
import numpy as np

V100_REFERENCE_IMGS_PER_SEC = 7.0  # documented estimate; see module docstring


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--remat", action="store_true", default=False)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--dtype", type=str, default="bfloat16",
                    help="compute dtype (master params stay fp32; losses "
                    "fp32). bf16 measured ~1.3x over fp32 on v5e.")
    args = ap.parse_args()

    from __graft_entry__ import _pose_opt
    from gfla_tpu.data import encode_heatmaps
    from gfla_tpu.parallel import make_mesh, replicate_state, shard_batch
    from gfla_tpu.tasks import create_task

    mesh = make_mesh(1)
    task = create_task(_pose_opt(batch=args.batch, size=args.size,
                                 compute_dtype=args.dtype,
                                 remat=args.remat))

    rng = np.random.RandomState(0)
    B, S = args.batch, args.size
    kp = rng.rand(2, B, 18, 2).astype(np.float32) * (S - 1)
    host = {
        "P1": rng.rand(B, S, S, 3).astype(np.float32) * 2 - 1,
        "P2": rng.rand(B, S, S, 3).astype(np.float32) * 2 - 1,
    }
    batch = shard_batch(host, mesh)
    batch["BP1"] = encode_heatmaps(jax.device_put(kp[0]), S, S)
    batch["BP2"] = encode_heatmaps(jax.device_put(kp[1]), S, S)

    state = task.init_state(jax.random.PRNGKey(0), batch)
    state = replicate_state(state, mesh)

    for _ in range(args.warmup):
        state, logs = task.train_step(state, batch)
    jax.block_until_ready(logs["total_G"])

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, logs = task.train_step(state, batch)
    jax.block_until_ready(logs["total_G"])
    dt = time.perf_counter() - t0

    imgs_per_sec = args.batch * args.iters / dt
    print(json.dumps({
        "metric": "pose_train_throughput_256",
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / V100_REFERENCE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
