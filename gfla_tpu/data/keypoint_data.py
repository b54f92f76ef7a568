"""Keypoint (H36M 2-D pose) datasets for the Motion Extraction Net.

Capability parity with reference data/keypoint_dataset.py (+ the test-time
keypointtest_dataset.py streaming variant): detectron-vs-GT NPZ pairs with
camera normalization, receptive-field padding of the input window, and the
random scale/shift augmentation.

Layout: (T, 2K) float32 with channel order [y0..y16, x0..x16] (matching the
reference's (2, 17)→view ordering, keypoint_dataset.py:124-135).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

from gfla_tpu.data import human36m
from gfla_tpu.data import openpose_utils


def _normalize_2d(data: np.ndarray, res_w: int) -> np.ndarray:
    """(T, 17, 2 xy) pixels → (T, 34) in [-1, 1], order [y..., x...]."""
    d = data / res_w * 2 - 1
    d = d[:, :, ::-1]                       # (x, y) → (y, x)
    d = np.transpose(d, (0, 2, 1))          # (T, 2, 17)
    return d.reshape(d.shape[0], -1).astype(np.float32)


class KeypointDataset:
    @staticmethod
    def modify_options(parser, is_train: bool):
        """Dataset flags (keypoint_dataset.py:20-38)."""
        parser.add_argument("--t_step", type=int, default=1)
        parser.add_argument("--n_receptive", type=int, default=81)
        parser.add_argument("--gt_path", type=str,
                            default="./dataset/human36m/data_2d_h36m_gt.npz")
        parser.add_argument(
            "--input_path", type=str,
            default="./dataset/human36m/data_2d_h36m_detectron_pt_coco.npz")
        return parser

    @staticmethod
    def apply_defaults(opt, is_train: bool):
        opt.structure_nc = 17
        if not hasattr(opt, "t_step"):
            opt.t_step = 1
        if not hasattr(opt, "n_frames_pre_load"):
            opt.n_frames_pre_load = 24
        if not hasattr(opt, "n_receptive"):
            opt.n_receptive = 81
        if not hasattr(opt, "gt_path"):
            opt.gt_path = "./dataset/human36m/data_2d_h36m_gt.npz"
        if not hasattr(opt, "input_path"):
            opt.input_path = \
                "./dataset/human36m/data_2d_h36m_detectron_pt_coco.npz"
        return opt

    def __init__(self, opt):
        self.opt = opt
        self.is_train = getattr(opt, "isTrain", True) and opt.phase == "train"
        self.gt_data, self.gt_type = human36m.init_position_data(opt.gt_path)
        self.input_data, self.input_type = \
            human36m.init_position_data(opt.input_path)
        self.cameras = human36m.init_cameras_param()
        exclude = ["S9", "S11"] if self.is_train else \
            ["S1", "S5", "S6", "S7", "S8"]
        self.data_list = human36m.init_video_list(
            opt.input_path, opt.gt_path, exclude
        )
        self.data_list = human36m.check_dataset(
            self.gt_data, self.input_data, self.data_list, self.gt_type
        )
        self.rng = np.random.RandomState(getattr(opt, "seed", 0) or None)

    def __len__(self):
        return len(self.data_list)

    def __getitem__(self, index: int) -> Dict:
        opt = self.opt
        seq = self.data_list[index % len(self.data_list)]
        inp = self.input_data[seq["subject"]][seq["action"]][seq["camera"]]
        if "detectron_pt_coco" in opt.input_path:
            inp = inp[:, :, :-1]  # drop score channel
        gt = self.gt_data[seq["subject"]][seq["action"]][seq["camera"]][:, :, :2]
        n = min(inp.shape[0], gt.shape[0])
        inp, gt = inp[:n], gt[:n]
        cam = self.cameras[seq["subject"]][int(seq["camera"])]

        if not self.is_train:
            return {
                "input_data": _normalize_2d(inp, cam["res_w"]),
                "gt_data": _normalize_2d(gt, cam["res_w"]),
                "out_path": f"{seq['subject']}_{seq['action']}_{seq['camera']}",
            }

        # random window + receptive-field padding (keypoint_dataset.py:53-80)
        P = opt.n_frames_pre_load
        R = opt.n_receptive
        t_step = max(1, min(opt.t_step, n // P))
        start = self.rng.randint(max(1, n - (P - 1) * t_step))
        gt_idx = [start + i * t_step for i in range(P)]
        in_idx = [
            int(np.clip(start + i * t_step, 0, n - 1))
            for i in range(-R // 2 + 1, P + R // 2)
        ]
        inp_w = _normalize_2d(inp[in_idx], cam["res_w"])
        gt_w = _normalize_2d(gt[gt_idx], cam["res_w"])

        # random scale/shift aug (keypoint_dataset.py:137-150)
        scale = 0.5 * self.rng.random_sample() + 1.0
        dy = self.rng.random_sample() * 0.2 - 0.1
        dx = self.rng.random_sample() * 0.2 - 0.1
        delta = np.concatenate(
            [np.full(17, dy, np.float32), np.full(17, dx, np.float32)]
        )
        return {
            "input_data": inp_w * scale + delta,
            "gt_data": gt_w * scale + delta,
        }


class KeypointTestDataset:
    """Streams real-video skeleton JSONs through the denoiser with
    receptive-field padding (reference keypointtest_dataset.py)."""

    @staticmethod
    def apply_defaults(opt, is_train: bool):
        opt.structure_nc = 17
        if not hasattr(opt, "n_receptive"):
            opt.n_receptive = 81
        if not hasattr(opt, "n_frames_pre_load"):
            opt.n_frames_pre_load = 24
        return opt

    def __init__(self, opt):
        self.opt = opt
        from gfla_tpu.data.animation_data import make_grouped_dataset

        self.seqs = make_grouped_dataset(
            os.path.join(opt.dataroot, opt.phase + "_alphapose")
        )
        self.load_size = (opt.load_size, opt.load_size) \
            if isinstance(opt.load_size, int) else tuple(opt.load_size)

    def __len__(self):
        return len(self.seqs)

    def _kp(self, path: str) -> np.ndarray:
        people = json.load(open(path))["people"]
        if not people:
            return np.zeros(34, np.float32)
        pose = openpose_utils.obtain_2d_cords(people[0])["body"]
        pose = openpose_utils.openpose18_to_coco17(pose)
        kp = 2 * pose.astype(np.float32) / self.load_size[1] - 1
        return kp.reshape(-1)

    def __getitem__(self, index: int) -> Dict:
        paths = self.seqs[index]
        R = self.opt.n_receptive
        kps = np.stack([self._kp(p) for p in paths])  # (T, 34) [y..., x...]
        pad_front = np.repeat(kps[:1], R // 2, axis=0)
        pad_back = np.repeat(kps[-1:], R // 2, axis=0)
        return {
            "input_data": np.concatenate([pad_front, kps, pad_back]),
            "gen_paths": list(paths),
        }
