"""Data pipeline tests: loader mechanics, heatmap encoding parity,
synthetic datasets, keypoint2img, openpose utils."""

import numpy as np
import pytest

import jax.numpy as jnp

from gfla_tpu.data import DataLoader, collate, encode_heatmaps
from gfla_tpu.data.paired_dataset import SyntheticPoseDataset
from gfla_tpu.data.pose_utils import MISSING_VALUE, cords_to_map
from gfla_tpu.data import openpose_utils


class _Opt:
    load_size = 32
    max_dataset_size = 10
    structure_nc = 18
    phase = "train"
    isTrain = True


class TestLoader:
    def test_batching_and_drop_last(self):
        ds = SyntheticPoseDataset(_Opt())
        loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                            num_workers=0)
        batches = list(loader)
        assert len(batches) == 2  # 10 // 4
        assert batches[0]["P1"].shape == (4, 32, 32, 3)
        assert isinstance(batches[0]["P1_path"], list)

    def test_prefetch_worker_matches_sync(self):
        ds = SyntheticPoseDataset(_Opt())
        sync = list(DataLoader(ds, 2, shuffle=False, drop_last=False,
                               num_workers=0))
        thr = list(DataLoader(ds, 2, shuffle=False, drop_last=False,
                              num_workers=2))
        assert len(sync) == len(thr) == 5
        np.testing.assert_array_equal(sync[0]["P1"], thr[0]["P1"])

    def test_shuffle_changes_across_epochs(self):
        ds = SyntheticPoseDataset(_Opt())
        loader = DataLoader(ds, 4, shuffle=True, drop_last=True,
                            num_workers=0, seed=1)
        e1 = [b["P1_path"] for b in loader]
        e2 = [b["P1_path"] for b in loader]
        assert e1 != e2


class TestHeatmaps:
    def test_device_encoding_matches_numpy(self):
        rng = np.random.RandomState(0)
        kp = rng.rand(18, 2).astype(np.float32) * 31
        kp[-1] = MISSING_VALUE
        kp_int = np.where(kp == MISSING_VALUE, kp, np.floor(kp))
        dev = np.asarray(encode_heatmaps(jnp.asarray(kp_int), 32, 32))
        host = cords_to_map(kp_int, (32, 32))
        np.testing.assert_allclose(dev, host, atol=1e-5)

    def test_missing_joint_zero_map(self):
        kp = jnp.asarray([[5.0, 5.0], [MISSING_VALUE, MISSING_VALUE]])
        maps = np.asarray(encode_heatmaps(kp, 16, 16))
        assert maps[..., 0].max() > 0.99
        assert maps[..., 1].max() == 0.0


class TestOpenposeUtils:
    def test_18_to_17(self):
        pose = np.arange(36).reshape(2, 18)
        out = openpose_utils.openpose18_to_coco17(pose)
        assert out.shape == (2, 17)
        assert out[0, 0] == pose[0, openpose_utils.OPENPOSE_18["Nose"]]

    def test_draw_joint(self):
        pose = np.array([[5, 10, 20], [5, 15, 25]])  # (2, K=3) y,x
        colors = np.zeros((32, 32, 3), np.uint8)
        out = openpose_utils.draw_joint(colors, pose, [[0, 1], [1, 2]])
        assert out.max() > 0

    def test_tensor2skeleton(self):
        t = np.zeros((34, 2), np.float32)  # (2K, T) normalized
        frames = openpose_utils.tensor2skeleton(
            image_size=(64, 64))(t, "COCO_17")
        assert len(frames) == 2
        assert frames[0].shape == (64, 64, 3)


class TestKeypoint2Img:
    def test_interp_and_draw(self):
        from gfla_tpu.data.keypoint2img import draw_edge, interp_points

        x = np.array([2, 10, 20])
        y = np.array([5, 8, 6])
        cx, cy = interp_points(x, y)
        assert cx is not None and len(cx) >= 18
        im = np.zeros((32, 32), np.uint8)
        draw_edge(im, cx, cy, bw=0)
        assert im.max() == 255
