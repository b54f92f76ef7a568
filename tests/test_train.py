"""End-to-end training-step tests: pose GAN step, flow-pretrain step,
checkpoint/resume, two-stage partial load, and 8-device data parallelism.
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfla_tpu.data import encode_heatmaps
from gfla_tpu.parallel import make_mesh, replicate_state, shard_batch
from gfla_tpu.tasks import create_task
from gfla_tpu.train.checkpoint import (
    get_iteration,
    load_checkpoint,
    partial_load,
    save_checkpoint,
)

H = W = 32


def make_opt(model="pose", batch=2, **over):
    opt = argparse.Namespace(
        model=model, dataset_mode="synthetic", phase="train", isTrain=True,
        batchSize=batch, load_size=H, old_size=(H, W), structure_nc=18,
        image_nc=3, layers=3, attn_layer=[2, 3],
        kernel_size={"2": 5, "3": 3}, use_spect_g=False, no_spect_d=False,
        lr=1e-4, lr_policy="lambda", niter=100, niter_decay=0, iter_count=1,
        iters_per_epoch=10, gan_mode="lsgan", ratio_g2d=0.1,
        lambda_rec=5.0, lambda_g=2.0, lambda_correct=5.0, lambda_style=500.0,
        lambda_content=0.5, lambda_regularization=0.0025,
        compute_dtype="float32", seed=0,
    )
    for k, v in over.items():
        setattr(opt, k, v)
    return opt


def make_batch(batch=2, seed=0):
    rng = np.random.RandomState(seed)
    kp = rng.rand(2, batch, 18, 2).astype(np.float32) * (H - 1)
    b = {
        "P1": jnp.array(rng.rand(batch, H, W, 3) * 2 - 1, dtype=jnp.float32),
        "P2": jnp.array(rng.rand(batch, H, W, 3) * 2 - 1, dtype=jnp.float32),
        "BP1": encode_heatmaps(jnp.array(kp[0]), H, W),
        "BP2": encode_heatmaps(jnp.array(kp[1]), H, W),
    }
    return b


class TestPoseTrainStep:
    def test_step_updates_and_finite(self):
        task = create_task(make_opt())
        batch = make_batch()
        state = task.init_state(jax.random.PRNGKey(0), batch)
        w_before = jax.tree_util.tree_leaves(state.params_g)[0].copy()
        state, logs = task.train_step(state, batch)
        assert int(state.step) == 1
        for k, v in logs.items():
            assert np.isfinite(float(v)), f"loss {k} not finite"
        w_after = jax.tree_util.tree_leaves(state.params_g)[0]
        assert not np.allclose(np.asarray(w_before), np.asarray(w_after))
        # second step reuses the compiled function
        state, logs2 = task.train_step(state, make_batch(seed=1))
        assert int(state.step) == 2
        assert float(logs2["dis_img_gen"]) > 0

    def test_test_step(self):
        task = create_task(make_opt())
        batch = make_batch()
        state = task.init_state(jax.random.PRNGKey(0), batch)
        img, flows, masks = task.test_step(state, batch)
        assert img.shape == (2, H, W, 3)


class TestPoseFlowNetStep:
    def test_step(self):
        task = create_task(make_opt(model="poseflownet"))
        batch = make_batch()
        state = task.init_state(jax.random.PRNGKey(0), batch)
        state, logs = task.train_step(state, batch)
        assert np.isfinite(float(logs["total_G"]))
        assert int(state.step) == 1


class TestCheckpoint:
    @pytest.mark.slow
    def test_save_load_roundtrip(self, tmp_path):
        task = create_task(make_opt())
        batch = make_batch()
        state = task.init_state(jax.random.PRNGKey(0), batch)
        state, _ = task.train_step(state, batch)
        save_checkpoint(str(tmp_path), "exp", 1, state)
        assert get_iteration(str(tmp_path), "exp") == 1
        template = task.init_state(jax.random.PRNGKey(1), batch)
        restored, step = load_checkpoint(str(tmp_path), "exp", template)
        assert step == 1
        a = jax.tree_util.tree_leaves(state.params_g)[0]
        b = jax.tree_util.tree_leaves(restored.params_g)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_missing_checkpoint_tolerated(self, tmp_path):
        task = create_task(make_opt())
        batch = make_batch()
        template = task.init_state(jax.random.PRNGKey(0), batch)
        restored, step = load_checkpoint(str(tmp_path), "nope", template)
        assert step is None

    def test_two_stage_partial_load(self):
        """poseflownet stage-1 params flow into PoseGenerator.flow_net
        (SURVEY.md §3.4)."""
        batch = make_batch()
        flow_task = create_task(make_opt(model="poseflownet"))
        fstate = flow_task.init_state(jax.random.PRNGKey(7), batch)
        pose_task = create_task(make_opt())
        pstate = pose_task.init_state(jax.random.PRNGKey(0), batch)
        merged, loaded, skipped = partial_load(
            pstate.params_g, fstate.params_g
        )
        assert len(loaded) > 10, f"expected flow_net params to match: {skipped}"
        # the merged flow_net must equal the source flow_net exactly
        a = jax.tree_util.tree_leaves(merged["flow_net"])
        b = jax.tree_util.tree_leaves(fstate.params_g["flow_net"])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestDataParallel:
    @pytest.mark.slow
    def test_8dev_mesh_step(self):
        assert jax.device_count() == 8
        mesh = make_mesh()
        task = create_task(make_opt(batch=8))
        batch = {k: np.asarray(v) for k, v in make_batch(batch=8).items()}
        sharded = shard_batch(batch, mesh)
        state = task.init_state(jax.random.PRNGKey(0), sharded)
        state = replicate_state(state, mesh)
        state, logs = task.train_step(state, sharded)
        assert np.isfinite(float(logs["total_G"]))
        # params remain replicated
        leaf = jax.tree_util.tree_leaves(state.params_g)[0]
        assert leaf.sharding.is_fully_replicated

    @pytest.mark.slow
    def test_8dev_equals_1dev(self):
        """The actual DataParallel-equivalence claim (SURVEY.md §2.3): one
        step on the same global batch must produce the same GRADIENTS
        whether the batch lives on 1 device or is sharded over 8.

        The optimizer is swapped to plain SGD so the param delta IS the
        gradient (Adam with β1=0 takes a full ±lr·sign(g) step on the first
        iteration, which flips on float reduction-order noise for near-zero
        gradients and makes post-Adam params incomparable)."""
        import optax

        batch_np = {k: np.asarray(v) for k, v in make_batch(batch=8).items()}

        def sgd_task():
            task = create_task(make_opt(batch=8))
            task.tx_g = optax.sgd(1e-3)
            task.tx_d = optax.sgd(1e-3)
            return task

        task1 = sgd_task()
        state1 = task1.init_state(jax.random.PRNGKey(0), batch_np)
        # snapshot to host before the step (train_step donates the state)
        p0_g = jax.tree_util.tree_map(np.asarray, state1.params_g)
        p0_d = jax.tree_util.tree_map(np.asarray, state1.params_d)
        state1, logs1 = task1.train_step(state1, batch_np)

        mesh = make_mesh()
        task8 = sgd_task()
        sharded = shard_batch(batch_np, mesh)
        state8 = task8.init_state(jax.random.PRNGKey(0), sharded)
        state8 = replicate_state(state8, mesh)
        state8, logs8 = task8.train_step(state8, sharded)

        np.testing.assert_allclose(float(logs1["total_G"]),
                                   float(logs8["total_G"]),
                                   rtol=1e-4)
        for which, p0 in (("params_g", p0_g), ("params_d", p0_d)):
            a = jax.tree_util.tree_leaves(getattr(state1, which))
            b = jax.tree_util.tree_leaves(getattr(state8, which))
            base = jax.tree_util.tree_leaves(p0)
            assert len(a) == len(b) == len(base)
            g1 = np.concatenate([
                ((np.asarray(z) - np.asarray(x)) / 1e-3).ravel()
                for x, z in zip(a, base)
            ])  # = full gradient vector
            g8 = np.concatenate([
                ((np.asarray(z) - np.asarray(y)) / 1e-3).ravel()
                for y, z in zip(b, base)
            ])
            d = np.abs(g1 - g8) / max(1e-6, float(np.abs(g1).max()))
            # Bulk of the gradient must match to float-reduction noise.
            # A sparse tail is allowed: block_extract takes floor(flow), so
            # ~1e-7 forward differences between the two compilations flip
            # bilinear taps at integer boundaries, discretely changing
            # isolated gradient entries (the same effect exists between any
            # two builds of the reference CUDA op).
            assert float(np.mean(d > 2e-4)) < 0.005, \
                f"{which}: {np.mean(d > 2e-4):.4%} elements diverge"
            assert float(d.max()) < 0.1, f"{which}: max {d.max()}"

    @pytest.mark.slow
    def test_8dev_dance_chunk_step(self):
        """One dance chunk step (scan recurrence, dual discriminators) on
        the 8-device mesh."""
        import __graft_entry__ as ge

        mesh = make_mesh()
        logs = ge._dry_dance(8, mesh, size=32, frames=5)
        for k, v in logs.items():
            assert np.isfinite(float(v)), k

    @pytest.mark.slow
    def test_8dev_dance_chunk_equals_1dev(self):
        """Dance-chunk gradient equivalence: the same global chunk must
        produce the same G and D/D_V param deltas on 1 device and sharded
        over 8 (scan recurrence + temporal D_V under psum — the recurrent
        analogue of test_8dev_equals_1dev; SGD so delta == gradient)."""
        import optax

        from __graft_entry__ import _pose_opt

        frames = 5
        opt = _pose_opt(
            batch=8, size=H, model="dance", structure_nc=20,
            frames_D_V=frames, max_frames_per_gpu=frames,
            n_frames_total=frames, max_t_step=1, use_mask=False,
            n_frames_pre_load_test=frames,
        )
        rng = np.random.RandomState(7)
        B, S = 8, H
        chunk_np = {
            "P_step": rng.rand(B, frames, S, S, 3).astype(np.float32) * 2 - 1,
            "BP_step": rng.rand(B, frames, S, S, 20).astype(np.float32),
            "ref_image": rng.rand(B, S, S, 3).astype(np.float32) * 2 - 1,
            "ref_skeleton": rng.rand(B, S, S, 20).astype(np.float32),
        }
        chunk_np["pre_image"] = chunk_np["ref_image"]
        chunk_np["pre_skeleton"] = chunk_np["BP_step"][:, 0]
        chunk_np["pre_gt_image"] = chunk_np["ref_image"]

        def sgd_task():
            task = create_task(opt)
            task.tx_g = optax.sgd(1e-3)
            task.tx_d = optax.sgd(1e-3)
            return task

        key = jax.random.PRNGKey(3)  # same key ⇒ same D frame selection
        task1 = sgd_task()
        state1 = task1.init_state(jax.random.PRNGKey(0), chunk_np)
        p0_g = jax.tree_util.tree_map(np.asarray, state1.params_g)
        p0_d = jax.tree_util.tree_map(np.asarray, state1.params_d)
        state1, logs1, _ = task1.train_chunk(state1, chunk_np, key)

        mesh = make_mesh()
        task8 = sgd_task()
        sharded = shard_batch(chunk_np, mesh)
        state8 = task8.init_state(jax.random.PRNGKey(0), sharded)
        state8 = replicate_state(state8, mesh)
        state8, logs8, _ = task8.train_chunk(state8, sharded, key)

        np.testing.assert_allclose(float(logs1["total_G"]),
                                   float(logs8["total_G"]), rtol=1e-4)
        for which, p0 in (("params_g", p0_g), ("params_d", p0_d)):
            a = jax.tree_util.tree_leaves(getattr(state1, which))
            b = jax.tree_util.tree_leaves(getattr(state8, which))
            base = jax.tree_util.tree_leaves(p0)
            g1 = np.concatenate([
                ((np.asarray(z) - np.asarray(x)) / 1e-3).ravel()
                for x, z in zip(a, base)
            ])
            g8 = np.concatenate([
                ((np.asarray(z) - np.asarray(y)) / 1e-3).ravel()
                for y, z in zip(b, base)
            ])
            d = np.abs(g1 - g8) / max(1e-6, float(np.abs(g1).max()))
            # same floor-kink tail allowance as the pose test, slightly
            # wider: the T-frame scan compounds reduction-order noise
            assert float(np.mean(d > 2e-4)) < 0.005, \
                f"{which}: {np.mean(d > 2e-4):.4%} elements diverge"
            assert float(d.max()) < 0.1, f"{which}: max {d.max()}"


class TestSpatialPartitioning:
    """data × spatial 2-axis mesh: image rows sharded over 'spatial',
    GSPMD partitions the convs (halo exchange) and gathers the replicated
    operand for the dynamic-index attention ops. Scaling beyond the
    reference's DataParallel ceiling (batch < n_devices)."""

    @pytest.mark.slow
    def test_2x4_step_equals_1dev(self):
        import optax

        from gfla_tpu.parallel import make_mesh_2d, shard_batch_spatial

        batch_np = {k: np.asarray(v) for k, v in make_batch(batch=2).items()}

        def sgd_task():
            task = create_task(make_opt(batch=2))
            task.tx_g = optax.sgd(1e-3)
            task.tx_d = optax.sgd(1e-3)
            return task

        task1 = sgd_task()
        state1 = task1.init_state(jax.random.PRNGKey(0), batch_np)
        p0_g = jax.tree_util.tree_map(np.asarray, state1.params_g)

        # strong claim first: the row-sharded generator FORWARD is
        # numerically identical (halo exchange is exact; the attention
        # gathers run on a replicated operand)
        mesh = make_mesh_2d(2, 4)
        sharded = shard_batch_spatial(batch_np, mesh)
        img1 = np.asarray(task1._g_apply(
            state1.params_g, state1.stats_g, jnp.asarray(batch_np["P1"]),
            jnp.asarray(batch_np["BP1"]), jnp.asarray(batch_np["BP2"]),
            train=False)[0][0])
        fwd = jax.jit(lambda p, s, x, y, z: task1._g_apply(
            p, s, x, y, z, train=False)[0][0])
        img8 = np.asarray(fwd(state1.params_g, state1.stats_g,
                              sharded["P1"], sharded["BP1"], sharded["BP2"]))
        np.testing.assert_allclose(img1, img8, atol=1e-6)

        state1, logs1 = task1.train_step(state1, batch_np)

        task8 = sgd_task()
        state8 = task8.init_state(jax.random.PRNGKey(0), sharded)
        state8 = replicate_state(state8, mesh)
        state8, logs8 = task8.train_step(state8, sharded)

        # the loss stack amplifies reduction-order noise (VGG pooling,
        # block_extract floor kinks) — measured ~3e-4 relative on CPU
        np.testing.assert_allclose(float(logs1["total_G"]),
                                   float(logs8["total_G"]), rtol=2e-3)
        a = jax.tree_util.tree_leaves(state1.params_g)
        b = jax.tree_util.tree_leaves(state8.params_g)
        base = jax.tree_util.tree_leaves(p0_g)
        g1 = np.concatenate([((np.asarray(z) - np.asarray(x)) / 1e-3).ravel()
                             for x, z in zip(a, base)])
        g8 = np.concatenate([((np.asarray(z) - np.asarray(y)) / 1e-3).ravel()
                             for y, z in zip(b, base)])
        d = np.abs(g1 - g8) / max(1e-6, float(np.abs(g1).max()))
        # Spatial partitioning reorders reductions at every halo'd conv, so
        # the noise tail is wider than the dp-only test's; measured: p99.9
        # = 4e-4, frac>1e-3 = 3e-5, and ~1 element in 5M where a flipped
        # bilinear tap (floor kink) discretely changes a gradient entry.
        assert float(np.mean(d > 1e-3)) < 1e-4, \
            f"{np.mean(d > 1e-3):.2e} elements diverge > 1e-3"
        assert float(np.mean(d > 1e-2)) < 1e-6, \
            f"{np.mean(d > 1e-2):.2e} elements diverge > 1e-2 (kink flips)"


class TestHaloShardedAttention:
    """spatial_halo_attention: generator forward with halo-sharded
    attention gathers (shard_map + ppermute in block_extract) equals the
    replicated-gather path on the 2-axis mesh. Op-level equality/grad/HLO
    assertions live in tests/test_ops.py::TestBlockExtractHalo."""

    @pytest.mark.slow
    def test_generator_forward_matches(self):
        from gfla_tpu.models import define_g
        from gfla_tpu.parallel import (
            make_mesh_2d, shard_batch_spatial, spatial_halo_attention,
        )

        Hh = 64
        model = define_g(
            "pose", image_nc=3, structure_nc=18, output_nc=3, ngf=8,
            img_f=16, layers=2, num_blocks=2, norm_type="instance",
            activation="LeakyReLU", attn_layer=(2,),
            extractor_kz={"2": 3}, use_spect=False,
        )
        rng = np.random.RandomState(0)
        p1 = jnp.asarray(rng.rand(2, Hh, Hh, 3) * 2 - 1, jnp.float32)
        bp1 = jnp.asarray(rng.rand(2, Hh, Hh, 18), jnp.float32)
        bp2 = jnp.asarray(rng.rand(2, Hh, Hh, 18), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), p1, bp1, bp2)
        fwd = lambda a, b, c: model.apply(
            variables, a, b, c, train=False, update_stats=False)[0]
        base = np.asarray(fwd(p1, bp1, bp2))

        mesh = make_mesh_2d(2, 4)
        sharded = shard_batch_spatial(
            {"P1": p1, "BP1": bp1, "BP2": bp2}, mesh)
        # coarse level: H/4 = 16 rows over 4 shards → halo 4 covers the
        # random-init flow magnitudes (O(1) feature rows) with margin
        with spatial_halo_attention(mesh, halo=4):
            got = np.asarray(jax.jit(fwd)(
                sharded["P1"], sharded["BP1"], sharded["BP2"]))
        np.testing.assert_allclose(got, base, rtol=2e-5, atol=2e-5)


class TestCheckpointPruning:
    def test_keep_every(self, tmp_path):
        import jax.numpy as jnp

        state = {"step": jnp.zeros(()), "w": jnp.ones((4,))}
        for step in (5, 10, 15, 20):
            save_checkpoint(str(tmp_path), "exp", step, state, keep_every=10)
        import os

        dirs = sorted(d for d in os.listdir(tmp_path / "exp")
                      if d.startswith("ckpt_"))
        # multiples of 10 kept permanently + the latest save
        assert dirs == ["ckpt_10", "ckpt_20"]
        assert get_iteration(str(tmp_path), "exp") == 20


class TestSpectralNormState:
    @pytest.mark.slow  # 23s; spectral norm exercised fast by every
    # use_spect train-step/discriminator test
    def test_power_iteration_state_updates(self):
        """The D's spectral-norm u vectors must change across train steps
        (torch updates them per forward; we update per D-loss forward)."""
        task = create_task(make_opt())
        batch = make_batch()
        state = task.init_state(jax.random.PRNGKey(0), batch)
        before = jax.tree_util.tree_leaves(state.stats_d)
        assert before, "expected spectral-norm state in D"
        state, _ = task.train_step(state, batch)
        after = jax.tree_util.tree_leaves(state.stats_d)
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(before, after)
        )
        assert changed


class TestEvaluateHeldOut:
    """train.py's eval hook handles both still (4-D) and animation (5-D)
    generator outputs, and skips gracefully without ground truth."""

    class _Task:
        def __init__(self, out):
            self._out = out

        def test_step(self, state, batch):
            return self._out

    def test_animation_window(self):
        from train import evaluate_held_out

        rng = np.random.RandomState(0)
        gt = rng.rand(2, 4, 8, 8, 3).astype(np.float32) * 2 - 1
        gen = gt[:, :3] + 0.01  # generator emits a shorter window
        evals = evaluate_held_out(self._Task(gen), None, {"P_all": gt})
        assert set(evals) == {"ssim", "psnr", "l1"}
        assert evals["l1"] == pytest.approx(0.005, abs=1e-4)
        assert evals["psnr"] > 40

    def test_still_image(self):
        from train import evaluate_held_out

        rng = np.random.RandomState(1)
        gt = rng.rand(3, 8, 8, 3).astype(np.float32) * 2 - 1
        evals = evaluate_held_out(self._Task(gt.copy()), None, {"P2": gt})
        assert evals["l1"] == pytest.approx(0.0, abs=1e-6)

    def test_no_ground_truth_skips(self):
        from train import evaluate_held_out

        assert evaluate_held_out(self._Task(None), None, {"KP1": 0}) == {}


class TestTrainCLISpatial:
    """train.py --spatial N: the full CLI entry builds the 2-axis
    (data × spatial) mesh AND enables halo-sharded attention gathers —
    the productized path for the capability previously reachable only
    from library code."""

    @pytest.mark.slow
    def test_train_main_spatial_cli(self, monkeypatch, tmp_path):
        import sys

        import train as train_mod
        from gfla_tpu import parallel

        argv = [
            "train.py", "--name=spatial_smoke", "--model=pose",
            "--dataset_mode=synthetic", "--load_size=32",
            "--batchSize=2", "--max_iters=2", "--mesh_devices=8",
            "--spatial=4", "--halo=4",
            "--attn_layer=2,3", "--kernel_size=2=5,3=3",
            "--print_freq=1", "--save_latest_freq=2",
            "--save_iters_freq=1000", "--eval_iters_freq=2",
            "--checkpoints_dir", str(tmp_path),
        ]
        monkeypatch.setattr(sys, "argv", argv)
        try:
            train_mod.main()
            mesh, axis, halo = parallel.get_spatial_halo()
            assert mesh is not None and axis == "spatial" and halo == 4
            assert dict(mesh.shape) == {"data": 2, "spatial": 4}
        finally:
            parallel.enable_spatial_halo(None)  # process-lifetime global
        # checkpoint written at iteration 2 (save_latest_freq)
        ckpts = list((tmp_path / "spatial_smoke").iterdir())
        assert ckpts, "no checkpoint/log output written"
