"""Task-head tests: recurrent animation (dance/face), shapenet, keypoint,
and the CLI option system."""

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfla_tpu.tasks import create_task

H = W = 32


def anim_opt(kind, **over):
    opt = argparse.Namespace(
        model=kind, dataset_mode="synthetic", phase="train", isTrain=True,
        batchSize=1, load_size=H, structure_nc=16 if kind == "face" else 18,
        image_nc=3, layers=3, attn_layer=[2, 3],
        kernel_size={"2": 5, "3": 3}, use_spect_g=False, no_spect_d=False,
        lr=1e-4, lr_policy="lambda", niter=100, niter_decay=0, iter_count=1,
        iters_per_epoch=10, gan_mode="lsgan", ratio_g2d=0.1, lambda_rec=5.0,
        lambda_g=2.0, lambda_correct=5.0, lambda_style=500.0,
        lambda_content=0.5, lambda_regularization=0.0025,
        frames_D_V=3, max_frames_per_gpu=3, n_frames_total=3,
        use_mask=False, seed=0,
    )
    for k, v in over.items():
        setattr(opt, k, v)
    return opt


def anim_batch(nc, n_frames=3, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "P_all": jnp.array(rng.rand(1, n_frames, H, W, 3) * 2 - 1,
                           dtype=jnp.float32),
        "BP_all": jnp.array(rng.rand(1, n_frames, H, W, nc),
                            dtype=jnp.float32),
        "ref_image": jnp.array(rng.rand(1, H, W, 3) * 2 - 1,
                               dtype=jnp.float32),
        "ref_skeleton": jnp.array(rng.rand(1, H, W, nc), dtype=jnp.float32),
    }


@pytest.mark.parametrize(
    "kind,over",
    [("dance", dict(frames_D_V=8, max_frames_per_gpu=6, n_frames_total=6)),
     ("dance", dict(frames_D_V=4, max_frames_per_gpu=4, n_frames_total=4)),
     ("face", dict(frames_D_V=8, max_frames_per_gpu=6, n_frames_total=6))],
)
def test_animation_invalid_frame_config_fails_at_init(kind, over):
    """frames_D_V > chunk length (reference crashes at dance_model.py:362)
    or below the temporal-D minimum of 5 must fail with a clear error at
    task init, not deep inside the first step."""
    with pytest.raises(ValueError, match="frames_D_V"):
        create_task(anim_opt(kind, **over))


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["face", "dance"])
def test_animation_train_step(kind):
    # dance's TemporalDiscriminator needs ≥5 frames (two 3-D blocks each
    # shrink time by 2); the reference default is frames_D_V=6
    n_frames = 5 if kind == "dance" else 3
    opt = anim_opt(kind, frames_D_V=n_frames, max_frames_per_gpu=n_frames,
                   n_frames_total=n_frames)
    task = create_task(opt)
    batch = anim_batch(opt.structure_nc, n_frames=n_frames)
    chunk = {
        "P_step": batch["P_all"],
        "BP_step": batch["BP_all"],
        "ref_image": batch["ref_image"],
        "ref_skeleton": batch["ref_skeleton"],
        "pre_image": batch["ref_image"],
        "pre_skeleton": batch["BP_all"][:, 0],
        "pre_gt_image": batch["ref_image"],
    }
    state = task.init_state(jax.random.PRNGKey(0), chunk)
    state, logs = task.train_step(state, batch, jax.random.PRNGKey(1))
    for k, v in logs.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert int(state.step) == 1
    gen, carry = task.test_step(state, batch)
    assert gen.shape == (1, n_frames, H, W, 3)


@pytest.mark.slow
def test_shapenet_train_step():
    opt = anim_opt("shapenet", structure_nc=21, layers=1, attn_layer=[1],
                   kernel_size={"1": 3}, label_nc_h=18, label_nc_v=3)
    task = create_task(opt)
    rng = np.random.RandomState(0)
    size = 64
    batch = {
        "P1": jnp.array(rng.rand(2, size, size, 3) * 2 - 1, dtype=jnp.float32),
        "P2": jnp.array(rng.rand(2, size, size, 3) * 2 - 1, dtype=jnp.float32),
        # raw (azimuth, elevation) labels as stored in the HDF5
        "BP1": jnp.array([[4, 0], [10, 10]], dtype=jnp.int32),
        "BP2": jnp.array([[20, 20], [6, 0]], dtype=jnp.int32),
    }
    state = task.init_state(jax.random.PRNGKey(0), batch)
    state, logs = task.train_step(state, batch)
    for k, v in logs.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    img, flows, masks = task.test_step(state, batch)
    assert img.shape == (2, size, size, 3)


def test_keypoint_train_step():
    opt = anim_opt("keypoint", structure_nc=17)
    task = create_task(opt)
    rng = np.random.RandomState(0)
    T = 81 + 4  # receptive field 81 for layers=4 + a few output frames
    batch = {
        "input_data": jnp.array(rng.randn(2, T, 34), dtype=jnp.float32),
        "gt_data": jnp.array(rng.randn(2, T - 80, 34), dtype=jnp.float32),
    }
    state = task.init_state(jax.random.PRNGKey(0), batch)
    out = task.test_step(state, batch)
    assert out.shape == (2, T - 80, 34)
    state, logs = task.train_step(state, batch)
    assert np.isfinite(float(logs["mpjpe"]))


class TestOptions:
    def test_train_options_reference_cli(self, monkeypatch, tmp_path):
        """A reference-style command line parses with identical semantics."""
        from gfla_tpu.options import TrainOptions

        argv = [
            "train.py", "--name=fashion_adgan", "--model=pose",
            "--attn_layer=2,3", "--kernel_size=2=5,3=3",
            "--dataset_mode=fashion", "--dataroot=/tmp/nonexistent",
            "--checkpoints_dir", str(tmp_path),
        ]
        monkeypatch.setattr(sys, "argv", argv)
        opt = TrainOptions().parse(save=True)
        assert opt.attn_layer == [2, 3]
        assert opt.kernel_size == {"2": 5, "3": 3}
        assert opt.old_size == (256, 176)   # fashion defaults applied
        assert opt.lambda_style == 500.0
        assert (tmp_path / "fashion_adgan" / "train_opt.txt").exists()

    def test_unknown_model_raises(self, monkeypatch):
        from gfla_tpu.options import TrainOptions

        monkeypatch.setattr(sys, "argv", ["train.py", "--model=nope"])
        with pytest.raises(KeyError):
            TrainOptions().parse(save=False)


class TestDatasetFlags:
    def test_dance_dataset_flags_parse(self, monkeypatch):
        """Third registration phase: dataset-specific flags reach opt."""
        from gfla_tpu.options import TrainOptions

        argv = [
            "train.py", "--model=dance", "--dataset_mode=dance",
            "--sub_dataset=fashion", "--attn_layer=2,3",
            "--kernel_size=2=5,3=3", "--dataroot=/tmp/none",
        ]
        monkeypatch.setattr(sys, "argv", argv)
        opt = TrainOptions().parse(save=False)
        assert opt.sub_dataset == "fashion"
        assert opt.structure_nc == 20       # 17 heatmaps + 3 limb RGB
        assert opt.frames_D_V == 6
        assert opt.netD_V == "temporal"

    def test_shapenet_dataset_flags_parse(self, monkeypatch):
        from gfla_tpu.options import TestOptions

        argv = [
            "test.py", "--model=shapenet", "--dataset_mode=shapenet",
            "--dataroot=/tmp/none", "--sub_dataset_model=chair",
        ]
        monkeypatch.setattr(sys, "argv", argv)
        opt = TestOptions().parse(save=False)
        assert opt.sub_dataset_model == "chair"
        assert opt.label_nc_h == 18 and opt.label_nc_v == 3
        assert opt.structure_nc == 21
        assert opt.batchSize == 1 and opt.serial_batches
