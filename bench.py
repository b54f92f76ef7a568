"""Benchmark: pose-transfer training throughput (images/sec/chip).

Runs the full jitted GAN train step (G fwd + D update + G update with all
six losses) at the DeepFashion north-star config — 256×176 content inside
256×256 tensors, batch 8, exactly how the reference trains DeepFashion
(data/fashion_dataset.py:15-18 loads 256×256 images whose content occupies
256×176 with white side borders; options/base_options.py:27 batchSize 8).

Baseline: the reference publishes no throughput numbers (BASELINE.md).
vs_baseline is computed against an estimated 7 img/s for the PyTorch
reference on a V100 at this config (~1.1 s/iter for the same G+D step —
BASELINE.json's north star asks for ≥5×, i.e. vs_baseline ≥ 5.0).

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.
Other task families bench via --config market / dance / face / shapenet
(each runs that head's full live-config training step).
Diagnostics (per-phase breakdown, FLOPs/bytes roofline, fp32 comparison,
from-disk feed check) go to stderr via flags:
  --breakdown   time G-fwd / eval-fwd (serving) / G-bwd + cost analysis
  --both-dtypes also measure fp32
  --from-disk   also train from a tiny on-disk DeepFashion-layout dataset
                through the real multiprocess loader (host-feed check)
  --profile DIR capture a profiler trace of the live step
                (summarize with scripts/summarize_profile.py)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from gfla_tpu.runtime import setup_runtime
setup_runtime()
import jax
import numpy as np

V100_REFERENCE_IMGS_PER_SEC = 7.0  # documented estimate; see module docstring

# per-chip peak: v5e ≈ 197 bf16 TFLOP/s (used for the rough MFU estimate)
PEAK_FLOPS = {"bfloat16": 197e12, "float32": 98.5e12}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_batch(batch, size, content_w=176, width=None):
    """Synthetic fixed-seed batch in the DeepFashion layout: image content
    in a centered 256×176 band, white (=1.0) side borders. With `width`
    (e.g. Market's 128×64 tensors) the tensor itself is rectangular and the
    content fills it."""
    from gfla_tpu.data import encode_heatmaps
    rng = np.random.RandomState(0)
    B, H = batch, size
    W = width or size
    content_w = min(content_w, W)
    x0 = (W - content_w) // 2
    imgs = np.ones((2, B, H, W, 3), np.float32)
    imgs[:, :, :, x0 : x0 + content_w, :] = (
        rng.rand(2, B, H, content_w, 3).astype(np.float32) * 2 - 1
    )
    kp = rng.rand(2, B, 18, 2).astype(np.float32)
    kp[..., 0] = kp[..., 0] * (content_w - 1) + x0   # x within content band
    kp[..., 1] = kp[..., 1] * (H - 1)
    host = {"P1": imgs[0], "P2": imgs[1]}
    bp = {
        "BP1": encode_heatmaps(jax.device_put(kp[0]), H, W),
        "BP2": encode_heatmaps(jax.device_put(kp[1]), H, W),
    }
    return host, bp


def make_animation_batch(batch, size, frames, nc):
    """Synthetic animation chunk (reference trains iPER dance at 256×256
    with 20-channel skeletons and face at 256×256 with 16-channel landmark
    edge/distance maps, 6-frame chunks — dance_dataset.py:31,
    face_dataset.py:24, animation_dataset.py:26-27)."""
    rng = np.random.RandomState(0)
    B, H = batch, size
    host = {
        "P_step": rng.rand(B, frames, H, H, 3).astype(np.float32) * 2 - 1,
        "BP_step": rng.rand(B, frames, H, H, nc).astype(np.float32),
        "ref_image": rng.rand(B, H, H, 3).astype(np.float32) * 2 - 1,
        "ref_skeleton": rng.rand(B, H, H, nc).astype(np.float32),
    }
    host["pre_image"] = host["ref_image"]
    host["pre_skeleton"] = host["BP_step"][:, 0]
    host["pre_gt_image"] = host["ref_image"]
    return host


def build_animation(args, dtype, kind):
    """Dance/FaceTask at the live animation configs; step = one training
    chunk (scan over frames, D + D_V updates, G update). Dance: 20-ch
    skeletons, temporal-3D D_V over the whole chunk. Face: 16-ch landmark
    maps, frame-difference D_V over 3 frames (face_model.py:46)."""
    from __graft_entry__ import _pose_opt
    from gfla_tpu.parallel import make_mesh, replicate_state, shard_batch
    from gfla_tpu.tasks import create_task

    mesh = make_mesh(1)
    frames = args.frames
    if kind == "dance":
        # the temporal D_V's two 3-D encoders each shrink time by 2
        # (discriminator.py:100-140) — same minimum as the reference
        assert frames >= 5, "--frames must be >= 5 (temporal D_V needs T-4 > 0)"
        nc, frames_dv = 20, frames
    else:
        nc, frames_dv = 16, 3
    opt = _pose_opt(
        batch=args.batch, size=args.size, model=kind, structure_nc=nc,
        frames_D_V=frames_dv, max_frames_per_gpu=frames,
        n_frames_total=frames,
        max_t_step=1, use_mask=False, n_frames_pre_load_test=frames,
        compute_dtype=dtype, remat=args.remat,
    )
    task = create_task(opt)
    chunk = shard_batch(
        make_animation_batch(args.batch, args.size, frames, nc), mesh)
    state = task.init_state(jax.random.PRNGKey(1), chunk)
    state = replicate_state(state, mesh)
    key = jax.random.PRNGKey(2)

    def step(s, b):
        s, logs, _carry = task.train_chunk(s, b, key)
        return s, logs

    return task, state, chunk, step


def build_shapenet(args, dtype):
    """ShapeNetTask at the live view-synthesis config: 256×256, attn 2/3,
    kernel 5/3, batch 8, viewpoint labels one-hot on device
    (VIEW_SYNTHESIS.md train cmd; shapenet_dataset.py:20 load_size 256)."""
    from __graft_entry__ import _pose_opt
    from gfla_tpu.parallel import make_mesh, replicate_state, shard_batch
    from gfla_tpu.tasks import create_task

    mesh = make_mesh(1)
    # target decodes from an 8×8 seed: size = 8·2^(layers+2) → layers 3 at
    # the live 256² config (attn 2,3 kernels 5/3); smaller sizes (CPU
    # smokes) scale layers/attn down the same way
    layers = (args.size // 8).bit_length() - 3
    if layers >= 2:
        attn, kz = [layers - 1, layers], {str(layers - 1): 5, str(layers): 3}
    else:
        attn, kz = [layers], {str(layers): 3}
    opt = _pose_opt(batch=args.batch, size=args.size, model="shapenet",
                    layers=layers, attn_layer=attn, kernel_size=kz,
                    compute_dtype=dtype, remat=args.remat)
    task = create_task(opt)
    rng = np.random.RandomState(0)
    B, H = args.batch, args.size
    labels = lambda: np.stack(
        [rng.randint(0, 18, B) * 2, rng.randint(0, 3, B) * 10], axis=1
    ).astype(np.int32)
    host = {
        "P1": rng.rand(B, H, H, 3).astype(np.float32) * 2 - 1,
        "P2": rng.rand(B, H, H, 3).astype(np.float32) * 2 - 1,
        "BP1": labels(),
        "BP2": labels(),
    }
    batch = shard_batch(host, mesh)
    state = task.init_state(jax.random.PRNGKey(0), batch)
    state = replicate_state(state, mesh)
    return task, state, batch


def build(args, dtype):
    from __graft_entry__ import _pose_opt
    from gfla_tpu.parallel import make_mesh, replicate_state, shard_batch
    from gfla_tpu.tasks import create_task

    mesh = make_mesh(1)
    over = dict(compute_dtype=dtype, remat=args.remat)
    width = None
    if args.config == "market":
        # Market-1501 live config: 128×64, attn 2, kernel 2=3, D layers=3
        # (reference data/market_dataset.py:16-26, model/pose_model.py:69-70)
        over.update(dataset_mode="market", attn_layer=[2],
                    kernel_size={"2": 3})
        args.size, args.content_w, width = 128, 64, 64
    task = create_task(_pose_opt(batch=args.batch, size=args.size,
                                 **over))
    host, bp = make_batch(args.batch, args.size, args.content_w, width)
    batch = shard_batch(host, mesh)
    batch.update(bp)
    state = task.init_state(jax.random.PRNGKey(0), batch)
    state = replicate_state(state, mesh)
    return task, state, batch


def _sync(scalar):
    """True device sync. On the axon remote backend `block_until_ready`
    resolves the client future WITHOUT waiting for device execution
    (measured: a 27-TFLOP program 'blocks' in 0.08 ms) — fetching a scalar
    to host is the only reliable barrier (device execution is in-order, so
    one scalar drains everything queued before it)."""
    return float(scalar)


def timed_loop(step, state, batch, iters, warmup):
    """Two-length slope timing: run n1 and n2 steps (each fetch-synced) and
    take (T2−T1)/(n2−n1) — cancels the fixed pipeline-fill/flush overhead
    of the remote dispatch path instead of folding it into the step time."""
    for _ in range(warmup):
        state, logs = step(state, batch)
    _sync(logs["total_G"])
    n1 = min(max(2, iters // 3), max(1, iters - 1))
    t0 = time.perf_counter()
    for _ in range(n1):
        state, logs = step(state, batch)
    _sync(logs["total_G"])
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        state, logs = step(state, batch)
    _sync(logs["total_G"])
    t2 = time.perf_counter() - t0
    if iters > n1:
        per_step = (t2 - t1) / (iters - n1)
    else:  # --iters 1: no slope possible, plain average
        per_step = t2 / iters
    if per_step <= 0:  # noisy host: fall back to the longer run's average
        per_step = t2 / iters
    return per_step * iters, state


def run_breakdown(task, state, batch, args, step_dt):
    """Per-phase timings + compiled cost analysis (est. roofline)."""
    import jax.numpy as jnp

    # G forward alone
    fwd = jax.jit(lambda s, b: task._g_apply(
        s.params_g, s.stats_g, b["P1"], b["BP1"], b["BP2"])[0][0])
    t_fwd = _time_fn(fwd, state, batch, args.iters)
    log(f"breakdown: G fwd            {1e3 * t_fwd:8.2f} ms")

    # eval-mode forward = the serving path (test.py/demo.py)
    infer = jax.jit(lambda s, b: task._g_apply(
        s.params_g, s.stats_g, b["P1"], b["BP1"], b["BP2"],
        train=False)[0][0])
    t_inf = _time_fn(infer, state, batch, args.iters)
    log(f"breakdown: G eval (serving) {1e3 * t_inf:8.2f} ms "
        f"→ {args.batch / t_inf:.0f} img/s/chip inference")

    # G fwd + bwd of a plain L1 proxy (isolates generator autodiff cost)
    def fwd_bwd(s, b):
        def loss(p):
            img = task._g_apply(p, s.stats_g, b["P1"], b["BP1"], b["BP2"])[0][0]
            return jnp.mean(jnp.abs(img - b["P2"]))
        return jax.grad(loss)(s.params_g)
    t_fb = _time_fn(jax.jit(fwd_bwd), state, batch, args.iters)
    log(f"breakdown: G fwd+bwd (L1)   {1e3 * t_fb:8.2f} ms "
        f"(bwd ≈ {1e3 * (t_fb - t_fwd):.2f} ms)")
    log(f"breakdown: full step        {1e3 * step_dt:8.2f} ms "
        f"(losses+D ≈ {1e3 * (step_dt - t_fb):.2f} ms)")

    _cost_roofline(task._train_step_impl, state, batch, args, step_dt)


def _cost_roofline(step_fn, state, batch, args, step_dt):
    """XLA cost analysis of the live step → FLOPs/bytes, MFU, HBM GB/s."""
    try:
        compiled = jax.jit(step_fn).lower(state, batch).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        bts = float(ca.get("bytes accessed", 0.0))
        peak = PEAK_FLOPS.get(args.dtype, 197e12)
        log(f"breakdown: step cost        {flops / 1e12:.2f} TFLOP, "
            f"{bts / 1e9:.1f} GB accessed (XLA estimate)")
        log(f"breakdown: rough MFU        "
            f"{100.0 * flops / step_dt / peak:.1f}% of "
            f"{peak / 1e12:.0f} TFLOP/s peak; "
            f"HBM {bts / step_dt / 1e9:.0f} GB/s")
    except Exception as e:  # cost analysis availability varies by backend
        log(f"breakdown: cost analysis unavailable ({e!r})")


def run_breakdown_other(task, state, batch, args, step_dt, step):
    """Breakdown for the dance/face/shapenet configs: serving forward +
    cost-analysis roofline of the live training step (the pose config gets
    the finer G-fwd/G-bwd split in run_breakdown)."""
    per_step = (args.batch * args.frames
                if args.config in ("dance", "face") else args.batch)
    if args.config in ("dance", "face"):
        eval_batch = {
            "P_all": batch["P_step"], "BP_all": batch["BP_step"],
            "ref_image": batch["ref_image"],
            "ref_skeleton": batch["ref_skeleton"],
        }
    else:
        eval_batch = batch
    infer = jax.jit(lambda s, b: task.test_step(s, b)[0])
    t_inf = _time_fn(infer, state, eval_batch, args.iters)
    log(f"breakdown: eval fwd (serving) {1e3 * t_inf:8.2f} ms "
        f"→ {per_step / t_inf:.0f} img/s/chip inference")
    log(f"breakdown: full step        {1e3 * step_dt:8.2f} ms "
        f"({1e3 * step_dt / per_step:.1f} ms per generated frame)")
    _cost_roofline(step, state, batch, args, step_dt)


def _sync_tree(out):
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    return _sync(jnp.sum(leaf.astype(jnp.float32)))


def _time_fn(fn, state, batch, iters, warmup=2):
    """Slope-timed like timed_loop (see _sync for why fetch, not block)."""
    for _ in range(warmup):
        out = fn(state, batch)
    _sync_tree(out)
    n1 = max(1, iters // 3)
    t0 = time.perf_counter()
    for _ in range(n1):
        out = fn(state, batch)
    _sync_tree(out)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(state, batch)
    _sync_tree(out)
    t2 = time.perf_counter() - t0
    per = (t2 - t1) / (iters - n1) if iters > n1 else t2 / iters
    return per if per > 0 else t2 / iters


def run_from_disk(task, state, args):
    """Train from an on-disk DeepFashion-layout dataset through the real
    multiprocess loader — proves the host can feed the chip. Uses the
    structured stickfigure images (scripts/make_stickfigure_dataset.py),
    whose JPEG decode cost matches real photos — random-noise JPEGs are
    maximum-entropy and decode ~2× slower than any real dataset would."""
    import subprocess
    import sys as _sys
    import tempfile

    from gfla_tpu.data import create_dataloader, encode_heatmaps, infinite
    from gfla_tpu.parallel import make_mesh, shard_batch

    mesh = make_mesh(1)
    with tempfile.TemporaryDirectory() as root:
        subprocess.run(
            [_sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "make_stickfigure_dataset.py"),
             "--root", root, "--identities", "12", "--poses", "4",
             "--pairs", "96", "--size", str(args.size),
             "--width", str(args.content_w)],
            check=True,
        )
        opt = argparse.Namespace(
            dataset_mode="fashion", dataroot=root, phase="train",
            isTrain=True, batchSize=args.batch, load_size=args.size,
            old_size=(args.size, args.content_w), serial_batches=False,
            nThreads=args.nthreads, seed=0,
            angle=(-10, 10), shift=(-30, 30), scale=(0.8, 1.2),
        )
        loader = create_dataloader(opt)
        it = infinite(loader)

        def fetch():
            host = next(it)
            b = shard_batch(
                {k: v for k, v in host.items() if isinstance(v, np.ndarray)},
                mesh,
            )
            b["BP1"] = encode_heatmaps(b.pop("KP1"), args.size, args.size)
            b["BP2"] = encode_heatmaps(b.pop("KP2"), args.size, args.size)
            return b

        batch = fetch()
        for _ in range(args.warmup):
            state, logs = task.train_step(state, batch)
            batch = fetch()
        _sync(logs["total_G"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, logs = task.train_step(state, batch)
            batch = fetch()  # overlap: host loads while the chip computes
        _sync(logs["total_G"])
        dt = time.perf_counter() - t0
        rate = args.batch * args.iters / dt
        log(f"from-disk: {rate:.1f} img/s through the loader "
            f"({args.nthreads} workers)")
        return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default="fashion",
                    choices=["fashion", "market", "dance", "face", "shapenet"],
                    help="market → 128×64, attn 2, kernel 3, D layers=3; "
                    "dance → 256×256 animation chunk step (6 frames, "
                    "D + temporal D_V). Dance defaults to batch 2 "
                    "(fastest per chip, 32.6 f/s); the reference's "
                    "per-GPU share (batch 4) fits with --remat "
                    "(per-frame checkpointing, 29.8 f/s)")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--frames", type=int, default=6,
                    help="frames per chunk (dance config only; reference "
                    "max_frames_per_gpu default 6)")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--content-w", type=int, default=176)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--remat", action="store_true", default=False)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--nthreads", type=int, default=2)
    ap.add_argument("--dtype", type=str, default="bfloat16",
                    help="compute dtype (master params stay fp32; losses "
                    "fp32). bf16 measured ~1.3x over fp32 on v5e.")
    ap.add_argument("--breakdown", action="store_true", default=False)
    ap.add_argument("--profile", type=str, default=None, metavar="DIR",
                    help="capture a JAX profiler trace of 3 steps into DIR "
                    "(inspect with scripts/summarize_profile.py)")
    ap.add_argument("--both-dtypes", action="store_true", default=False)
    ap.add_argument("--from-disk", action="store_true", default=False)
    args = ap.parse_args()
    # Fail fast (with a diagnosis) instead of hanging when the TPU relay
    # is down — a hung bench under the driver's timeout records nothing.
    from gfla_tpu.runtime import probe_devices
    if not probe_devices():
        log("bench aborted: no usable device backend (see above). Last "
            "committed on-chip pose number: README 'Performance' section.")
        sys.exit(3)
    if args.batch is None:
        args.batch = 2 if args.config in ("dance", "face") else 8

    if args.config in ("dance", "face"):
        task, state, batch, step = build_animation(args, args.dtype,
                                                   args.config)
        per_step = args.batch * args.frames  # generated frames per chunk
    elif args.config == "shapenet":
        task, state, batch = build_shapenet(args, args.dtype)
        step, per_step = task.train_step, args.batch
    else:
        task, state, batch = build(args, args.dtype)
        step, per_step = task.train_step, args.batch
    dt, state = timed_loop(step, state, batch, args.iters, args.warmup)
    imgs_per_sec = per_step * args.iters / dt
    step_dt = dt / args.iters
    log(f"{args.dtype}: {imgs_per_sec:.1f} img/s ({1e3 * step_dt:.1f} ms/step)")

    if args.both_dtypes:
        other = "float32" if args.dtype == "bfloat16" else "bfloat16"
        if args.config in ("dance", "face"):
            t2, s2, b2, st2 = build_animation(args, other, args.config)
        else:
            t2, s2, b2 = build(args, other)
            st2 = t2.train_step
        dt2, _ = timed_loop(st2, s2, b2, args.iters, args.warmup)
        log(f"{other}: {per_step * args.iters / dt2:.1f} img/s "
            f"({1e3 * dt2 / args.iters:.1f} ms/step)")

    if args.profile:
        jax.profiler.start_trace(args.profile)
        for _ in range(3):
            state, logs = step(state, batch)
        _sync(logs["total_G"])
        jax.profiler.stop_trace()
        log(f"profiler trace written to {args.profile}")

    if args.breakdown:
        if args.config in ("dance", "face", "shapenet"):
            run_breakdown_other(task, state, batch, args, step_dt, step)
        else:
            run_breakdown(task, state, batch, args, step_dt)

    if args.from_disk:
        if args.config in ("dance", "face", "shapenet"):
            log("from-disk: only implemented for the pose configs")
        else:
            run_from_disk(task, state, args)

    if args.config == "fashion":
        metric, ref = "pose_train_throughput_256x176", V100_REFERENCE_IMGS_PER_SEC
    elif args.config == "dance":
        # no published reference number; rough estimate: per generated
        # frame the dance step costs ≈ the pose step per image (two flow
        # nets + target decode + D + amortized D_V) on the same V100
        metric = f"dance_train_throughput_{args.size}"
        ref = V100_REFERENCE_IMGS_PER_SEC
    elif args.config == "face":
        # same rough per-generated-frame estimate as dance
        metric = f"face_train_throughput_{args.size}"
        ref = V100_REFERENCE_IMGS_PER_SEC
    elif args.config == "shapenet":
        # same pixel count / similar net as the fashion step → same rough
        # 7 img/s V100 estimate
        metric = f"shapenet_train_throughput_{args.size}"
        ref = V100_REFERENCE_IMGS_PER_SEC
    else:
        # pixel-scaled estimate: the V100 reference would run the 128×64
        # market config ~(256·256)/(128·64) = 8× faster than fashion
        metric = "pose_train_throughput_128x64_market"
        ref = V100_REFERENCE_IMGS_PER_SEC * 8.0
    print(json.dumps({
        "metric": metric,
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / ref, 3),
    }))


if __name__ == "__main__":
    main()
