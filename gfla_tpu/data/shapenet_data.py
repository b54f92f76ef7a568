"""ShapeNet novel-view dataset (HDF5 image+pose store).

Capability parity with reference data/shapenet_dataset.py: per-worker lazy
HDF5 open, train-time random target azimuth from the ang_skip sweep,
test-time 18-view azimuth sweeps per source. Pose labels are raw
(azimuth, elevation) ints shipped as (2,) arrays — one-hot encoding
happens on device (gfla_tpu.tasks.shapenet.labels_to_semantic).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
from PIL import Image


class ShapeNetDataset:
    @staticmethod
    def modify_options(parser, is_train: bool):
        """Dataset flags (shapenet_dataset.py:12-24)."""
        parser.add_argument("--ang_skip", type=int, default=20)
        parser.add_argument("--label_nc_h", type=int, default=18)
        parser.add_argument("--label_nc_v", type=int, default=3)
        parser.add_argument("--sub_dataset_model", type=str, default="car")
        return parser

    @staticmethod
    def apply_defaults(opt, is_train: bool):
        opt.load_size = getattr(opt, "load_size", 256) or 256
        opt.structure_nc = 18 + 3
        opt.image_nc = 3
        if getattr(opt, "old_size", None) is None:
            opt.old_size = opt.load_size
        if not hasattr(opt, "ang_skip"):
            opt.ang_skip = 20
        if not hasattr(opt, "label_nc_h"):
            opt.label_nc_h = 18
        if not hasattr(opt, "label_nc_v"):
            opt.label_nc_v = 3
        if not hasattr(opt, "sub_dataset_model"):
            opt.sub_dataset_model = "car"
        return opt

    def __init__(self, opt):
        self.opt = opt
        self.is_train = getattr(opt, "isTrain", True) and opt.phase == "train"
        root = opt.dataroot
        phase = "test" if opt.phase == "val" else opt.phase
        model = getattr(opt, "sub_dataset_model", "car")
        self.hdf5_file = os.path.join(root, f"data_{model}.hdf5")
        id_file = os.path.join(root, f"id_{model}_{phase}.txt")
        name_file = os.path.join(root, f"name_{model}_{phase}.txt")
        # atleast_1d: genfromtxt collapses single-line files to 0-d
        self.image_ids = np.atleast_1d(np.genfromtxt(id_file, dtype=str))
        self.image_names = (
            np.atleast_1d(np.genfromtxt(name_file, dtype=str))
            if not self.is_train else None
        )
        self.angle_list = list(range(0, 360, getattr(opt, "ang_skip", 20)))
        self.load_size = opt.load_size if isinstance(opt.load_size, int) \
            else opt.load_size[0]
        self._h5 = None  # lazy per-worker open (shapenet_dataset.py:53-58)
        self.rng = np.random.RandomState(
            None if self.is_train else 5
        )

    def _data(self):
        if self._h5 is None:
            import h5py

            self._h5 = h5py.File(self.hdf5_file, "r")
        return self._h5

    def _image(self, key: str) -> np.ndarray:
        img = Image.fromarray(np.uint8(self._data()[key]["image"][()]))
        img = img.convert("RGB").resize(
            (self.load_size, self.load_size), Image.BILINEAR
        )
        return np.asarray(img, np.float32) / 127.5 - 1.0

    def _pose(self, key: str) -> np.ndarray:
        return np.asarray(self._data()[key]["pose"][()], np.int32).reshape(-1)

    def __len__(self):
        return len(self.image_ids if self.is_train else self.image_names)

    def __getitem__(self, index: int) -> Dict:
        if self.is_train:
            source_id = str(self.image_ids[index])
            target_angle = int(self.rng.choice(self.angle_list) / 10)
            base = source_id.split("_")[0]
            elev = source_id.split("_")[-1]
            target_id = "_".join([base, str(target_angle), elev])
            return {
                "P1": self._image(source_id),
                "P2": self._image(target_id),
                "BP1": self._pose(source_id),
                "BP2": self._pose(target_id),
                "P1_path": source_id,
                "P2_path": target_id,
            }
        # test: one source view + the full azimuth sweep as targets
        name = str(self.image_names[index])
        h_angle = str(int(self.angle_list[index % len(self.angle_list)] / 10))
        source_id = f"{name}_{h_angle}_0"
        targets = [f"{name}_{int(a / 10)}_0" for a in self.angle_list]
        return {
            "P1": self._image(source_id),
            "BP1": self._pose(source_id),
            "P2": np.stack([self._image(t) for t in targets]),
            "BP2": np.stack(
                [np.array([int(a / 10), 0], np.int32)
                 for a in self.angle_list]
            ),
            "P1_path": source_id,
            "P2_path": targets,
        }
