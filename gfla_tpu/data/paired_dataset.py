"""Paired keypoint-image datasets (fashion / market) + synthetic stand-in.

Capability parity with reference data/base_dataset.py + fashion_dataset.py +
market_dataset.py: CSV pair lists, CSV keypoint annotations (sep ':'),
per-image random affine aug (target damped ×0.2/×0.5/1), [-1,1] images.

TPU-first split of work: the host pipeline emits images + transformed
keypoint *coordinates*; the σ=6 Gaussian heatmaps are encoded on-device
inside the jitted step (gfla_tpu.data.pose_utils.encode_heatmaps), saving
host CPU and 18×H×W of H2D traffic per sample.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
from PIL import Image

from gfla_tpu.data.affine import (
    apply_affine,
    forward_affine_matrix,
    inverse_affine_matrix,
    random_affine_params,
)
from gfla_tpu.data import native
from gfla_tpu.data.pose_utils import (
    MISSING_VALUE,
    load_pose_cords_from_strings,
    transform_cords,
)


def _as_hw(size) -> Tuple[int, int]:
    if isinstance(size, int):
        return (size, size)
    return tuple(size)


class PairedKeypointDataset:
    """Base paired dataset. Subclasses wire paths (get_paths)."""

    def __init__(self, opt):
        self.opt = opt
        self.phase = opt.phase
        self.load_size = _as_hw(opt.load_size)
        self.old_size = _as_hw(opt.old_size)
        self.angle = getattr(opt, "angle", None) or None
        self.shift = getattr(opt, "shift", None) or None
        self.scale = getattr(opt, "scale", None) or None
        self.image_dir, bone_file, self.name_pairs = self.get_paths(opt)
        ann = pd.read_csv(bone_file, sep=":").set_index("name")
        self._kp_cache: Dict[str, np.ndarray] = {}
        self._ann = ann
        self.rng = np.random.RandomState(
            getattr(opt, "seed", None) or (0 if opt.phase != "train" else None)
        )

    # -- subclass hooks ---------------------------------------------------
    def get_paths(self, opt):
        raise NotImplementedError

    # ----------------------------------------------------------------------
    def __len__(self):
        return len(self.name_pairs)

    def _keypoints(self, name: str) -> np.ndarray:
        kp = self._kp_cache.get(name)
        if kp is None:
            row = self._ann.loc[name]
            kp = load_pose_cords_from_strings(
                row["keypoints_y"], row["keypoints_x"]
            )
            self._kp_cache[name] = kp
        return kp

    def _load_image(self, name: str) -> Image.Image:
        img = Image.open(os.path.join(self.image_dir, name)).convert("RGB")
        # torchvision F.resize semantics with (h, w) tuple
        return img.resize((self.load_size[1], self.load_size[0]),
                          Image.BILINEAR)

    def _one_side(self, name: str, damp: bool):
        angle, shift, scale = random_affine_params(
            self.rng, self.angle, self.shift, self.scale
        )
        if damp:  # target aug damped (base_dataset.py:73-75)
            angle, shift, scale = angle * 0.2, (shift[0] * 0.5, shift[1] * 0.5), 1.0
        has_aug = bool(self.angle or self.shift or self.scale)
        H, W = self.load_size
        center = (W * 0.5 + 0.5, H * 0.5 + 0.5)
        matrix = forward_affine_matrix(center, angle, shift, scale) \
            if has_aug else None

        if native.available():
            # fused native pass: decode → warp+resize+normalize in one sweep
            raw = np.asarray(
                Image.open(os.path.join(self.image_dir, name)).convert("RGB")
            )
            inv = None
            if has_aug:
                inv = np.asarray(
                    inverse_affine_matrix(center, angle, shift, scale),
                    np.float32,
                )
            arr = native.affine_resize_normalize(raw, (H, W), inv)
        else:
            img = self._load_image(name)
            if has_aug:
                img = apply_affine(img, angle, shift, scale)
            arr = np.asarray(img, np.float32) / 127.5 - 1.0

        kp = transform_cords(
            self._keypoints(name), self.load_size, self.old_size, matrix
        )
        return arr, kp.astype(np.float32)

    def __getitem__(self, index: int) -> Dict:
        p1_name, p2_name = self.name_pairs[index]
        p1, kp1 = self._one_side(p1_name, damp=False)
        p2, kp2 = self._one_side(p2_name, damp=True)
        return {
            "P1": p1, "KP1": kp1, "P2": p2, "KP2": kp2,
            "P1_path": p1_name, "P2_path": p2_name,
        }


class FashionDataset(PairedKeypointDataset):
    """DeepFashion (data/fashion_dataset.py): 256 load, old_size (256,176)."""

    @staticmethod
    def apply_defaults(opt, is_train: bool):
        opt.load_size = getattr(opt, "load_size", 256) or 256
        opt.old_size = (256, 176)
        opt.structure_nc = 18
        opt.image_nc = 3
        return opt

    def get_paths(self, opt):
        root, phase = opt.dataroot, opt.phase
        pairs = pd.read_csv(os.path.join(root, f"fasion-pairs-{phase}.csv"))
        name_pairs = list(zip(pairs["from"], pairs["to"]))
        image_dir = os.path.join(root, phase)
        bones = os.path.join(root, f"fasion-annotation-{phase}.csv")
        return image_dir, bones, name_pairs


class MarketDataset(PairedKeypointDataset):
    """Market-1501 (data/market_dataset.py): 128×64, train-time affine aug."""

    @staticmethod
    def apply_defaults(opt, is_train: bool):
        opt.load_size = (128, 64)
        opt.old_size = (128, 64)
        opt.structure_nc = 18
        opt.image_nc = 3
        if is_train:
            # per-field: a CLI override of one range (or an explicit
            # --angle=False) must not suppress the other two defaults
            # (reference market_dataset.py:17-19 sets each independently)
            if getattr(opt, "angle", None) is None:
                opt.angle = (-5, 5)
            if getattr(opt, "shift", None) is None:
                opt.shift = (-5, 5)
            if getattr(opt, "scale", None) is None:
                opt.scale = (0.95, 1.05)
        return opt

    def get_paths(self, opt):
        root, phase = opt.dataroot, opt.phase
        pairs = pd.read_csv(os.path.join(root, f"market-pairs-{phase}.csv"))
        name_pairs = list(zip(pairs["from"], pairs["to"]))
        image_dir = os.path.join(root, phase)
        bones = os.path.join(root, f"market-annotation-{phase}.csv")
        return image_dir, bones, name_pairs


class SyntheticPoseDataset:
    """Deterministic synthetic paired data (no files): smoke tests, CI, and
    fixed-seed benchmarking (BASELINE.md measurement harness)."""

    def __init__(self, opt):
        self.load_size = _as_hw(getattr(opt, "load_size", 64))
        self.n = getattr(opt, "max_dataset_size", 64)
        if self.n > 10_000:
            self.n = 64
        self.structure_nc = getattr(opt, "structure_nc", 18)

    @staticmethod
    def apply_defaults(opt, is_train: bool):
        opt.structure_nc = getattr(opt, "structure_nc", 18) or 18
        opt.image_nc = 3
        if getattr(opt, "old_size", None) is None:
            opt.old_size = opt.load_size
        return opt

    def __len__(self):
        return self.n

    def __getitem__(self, index: int):
        H, W = self.load_size
        rng = np.random.RandomState(index)
        kp = rng.rand(2, self.structure_nc, 2).astype(np.float32)
        kp[..., 0] *= H - 1
        kp[..., 1] *= W - 1
        kp[:, -2:, :] = MISSING_VALUE  # exercise missing-joint handling
        return {
            "P1": (rng.rand(H, W, 3).astype(np.float32) * 2 - 1),
            "KP1": kp[0],
            "P2": (rng.rand(H, W, 3).astype(np.float32) * 2 - 1),
            "KP2": kp[1],
            "P1_path": f"syn_{index}_a.jpg",
            "P2_path": f"syn_{index}_b.jpg",
        }
