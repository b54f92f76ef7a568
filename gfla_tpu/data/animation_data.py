"""Video datasets for the animation tasks (dance / face).

Capability parity with reference data/animation_dataset.py,
dance_dataset.py, face_dataset.py:

* grouped per-sequence frame directories,
* train-time random window sampling with random temporal stride
  (animation_dataset.py:77-102),
* test-time sequential chunk iteration with change_seq flags and
  end-of-sequence padding (animation_dataset.py:42-75,
  dance_dataset.py:139-155),
* dance: AlphaPose/video2d JSON skeletons → 17ch heatmaps + 3ch drawn limb
  RGB (structure_nc=20), reference pool = first 20 frames, optional iPER
  masks,
* face: 68-pt landmark txt → edge curves + canny background + per-part
  distance maps + part-label map (structure_nc=16).

Output layout is time-major numpy: P_all (T, H, W, 3), BP_all
(T, H, W, nc); the loader stacks a leading batch dim.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np
from PIL import Image

from gfla_tpu.data import native, openpose_utils
from gfla_tpu.data.affine import apply_affine, inverse_affine_matrix
from gfla_tpu.data.keypoint2img import draw_edge, interp_points

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def make_grouped_dataset(root: str) -> List[List[str]]:
    """List per-sequence sorted file groups (reference image_folder.py
    grouped listing): each subdirectory of `root` is one sequence."""
    groups = []
    if not os.path.isdir(root):
        return groups
    for d in sorted(os.listdir(root)):
        sub = os.path.join(root, d)
        if not os.path.isdir(sub):
            continue
        files = sorted(
            os.path.join(sub, f) for f in os.listdir(sub)
            if f.lower().endswith(IMG_EXTS + (".json", ".txt", ".npy"))
        )
        if files:
            groups.append(files)
    return groups


class AnimationDatasetBase:
    """Sequence indexing / window sampling shared by dance & face."""

    def __init__(self, opt):
        self.opt = opt
        self.is_train = getattr(opt, "isTrain", True) and opt.phase == "train"
        ls = opt.load_size
        self.load_size = (ls, ls) if isinstance(ls, int) else tuple(ls)
        self.n_frames_total = (
            opt.n_frames_total if self.is_train else opt.n_frames_pre_load_test
        )
        self.rng = np.random.RandomState(getattr(opt, "seed", 0) or None)
        self.seq_idx = 0
        self.frame_idx = getattr(opt, "start_frame", 0)

    def sample_window(self, seq_len: int) -> Tuple[int, int, int]:
        """(n_frames, start, t_step) — random window at train
        (animation_dataset.py:77-102), sequential at test."""
        opt = self.opt
        if self.is_train:
            n_total = min(self.n_frames_total, seq_len)
            per_load = min(opt.max_frames_per_gpu, n_total)
            n_total = per_load * (n_total // per_load)
            max_t_step = max(1, min(opt.max_t_step, seq_len // max(1, n_total)))
            t_step = self.rng.randint(max_t_step) + 1
            offset_max = max(1, seq_len - (n_total - 1) * t_step)
            start = self.rng.randint(offset_max)
            return n_total, start, t_step
        return self.n_frames_total, self.frame_idx, 1

    def advance_test_cursor(self, seq_count: int):
        """Returns change_seq and advances the (seq, frame) cursor."""
        self.frame_idx += self.opt.n_frames_pre_load_test
        change_seq = self.frame_idx >= seq_count
        if change_seq:
            self.seq_idx += 1
            self.frame_idx = getattr(self.opt, "start_frame", 0)
        return change_seq

    @staticmethod
    def pad_to_multiple(paths: List[str], chunk: int) -> List[str]:
        if len(paths) % chunk:
            paths = paths + [paths[-1]] * (chunk - len(paths) % chunk)
        return paths

    def transform_image(self, img: Image.Image, affine=None,
                        normalize=True, fill_white=False) -> np.ndarray:
        H, W = self.load_size
        if normalize and native.available():
            # fused native pass: decode → warp+resize+normalize in one
            # sweep (same path the paired datasets use)
            raw = np.asarray(img.convert("RGB"))
            inv = None
            if affine is not None:
                center = (W * 0.5 + 0.5, H * 0.5 + 0.5)
                inv = np.asarray(
                    inverse_affine_matrix(center, affine["angle"],
                                          affine["shift"], affine["scale"]),
                    np.float32,
                )
            fill = (255, 255, 255) if fill_white else (0, 0, 0)
            return native.affine_resize_normalize(raw, (H, W), inv,
                                                  fill=fill)
        img = img.convert("RGB").resize((W, H), Image.BICUBIC)
        if affine is not None:
            fill = (255, 255, 255) if fill_white else (0, 0, 0)
            img = apply_affine(img, affine["angle"], affine["shift"],
                               affine["scale"], fill=fill)
        arr = np.asarray(img, np.float32) / 255.0
        if normalize:
            arr = arr * 2.0 - 1.0
        return arr

    def random_affine(self):
        opt = self.opt
        angle = getattr(opt, "angle", None)
        shift = getattr(opt, "shift", None)
        scale = getattr(opt, "scale", None)
        if not (angle or shift or scale) or not self.is_train:
            return None
        return {
            "angle": self.rng.uniform(*angle) if angle else 0.0,
            "scale": self.rng.uniform(*scale) if scale else 1.0,
            "shift": (
                self.rng.uniform(-shift[0], shift[0]) if shift else 0.0,
                self.rng.uniform(-shift[1], shift[1]) if shift else 0.0,
            ),
        }


class DanceDataset(AnimationDatasetBase):
    """FashionVideo / iPER person animation data (dance_dataset.py)."""

    @staticmethod
    def modify_options(parser, is_train: bool):
        """Dataset-specific flags (dance_dataset.py:22-68)."""
        parser.add_argument("--sub_dataset", type=str, default="iper",
                            help="iper | fashion")
        parser.add_argument("--no_bone_map", action="store_true",
                            default=False)
        parser.add_argument("--use_kp", action="store_true", default=False)
        parser.add_argument("--total_test_frames", type=int, default=None)
        parser.add_argument("--test_list", type=str, default=None)
        parser.add_argument("--cross_eval", action="store_true",
                            default=False)
        parser.add_argument(
            "--no_device_encode", action="store_true", default=False,
            help="ship full 20-channel structure maps from the loader "
            "instead of (17,2) coords + limb RGB with the Gaussian "
            "heatmaps encoded on device (device encode cuts host->HBM "
            "transfer 3.4x and loader CPU ~2x; numerically identical)")
        return parser

    @staticmethod
    def apply_defaults(opt, is_train: bool):
        opt.load_size = getattr(opt, "load_size", 256) or 256
        opt.structure_nc = 17 + 3
        opt.image_nc = 3
        if getattr(opt, "old_size", None) is None:
            opt.old_size = opt.load_size
        sub = getattr(opt, "sub_dataset", "iper")
        if is_train:
            if sub == "fashion":
                opt.angle = getattr(opt, "angle", None) or (-5, 5)
                opt.shift = getattr(opt, "shift", None) or (20, 3)
                opt.scale = getattr(opt, "scale", None) or (0.98, 1.02)
            else:
                opt.angle = getattr(opt, "angle", None) or (-5, 5)
        return opt

    def __init__(self, opt):
        super().__init__(opt)
        self.sub_dataset = getattr(opt, "sub_dataset", "iper")
        self.use_mask = bool(getattr(opt, "use_mask", False)) and \
            self.sub_dataset == "iper" and self.is_train
        # train-only: emit (17, 2) coords + limb RGB and let prepare_batch
        # build the 17 Gaussian channels on device (TPU-first: the maps
        # are a pure function of the coords — don't burn host CPU and
        # host->HBM bandwidth shipping them)
        self.device_encode = self.is_train and \
            not getattr(opt, "no_device_encode", False)
        root = opt.dataroot
        phase_dir = opt.phase + "_256"
        self.A = make_grouped_dataset(os.path.join(root, phase_dir, "train_A"))
        self.B_clean = make_grouped_dataset(
            os.path.join(root, phase_dir, "train_video2d")
        )
        self.B_noise = make_grouped_dataset(
            os.path.join(root, phase_dir, "train_alphapose")
        )
        self.C = (
            make_grouped_dataset(os.path.join(root, phase_dir, "train_C"))
            if self.use_mask else None
        )
        if not self.is_train:
            chunk = opt.n_frames_pre_load_test
            self.A = [self.pad_to_multiple(p, chunk) for p in self.A]
            self.B_clean = [self.pad_to_multiple(p, chunk) for p in self.B_clean]
            self.B_noise = [self.pad_to_multiple(p, chunk) for p in self.B_noise]
        self.frames_count = [len(p) for p in self.A]

    def __len__(self):
        if self.is_train:
            return len(self.A)
        return sum(self.frames_count) // self.opt.n_frames_pre_load_test

    def _pose_cords(self, path, affine, org_size, is_clean=True):
        """JSON skeleton file → (2, 17) (y, x) coords in load_size space,
        or None when the frame has no detected person."""
        people = json.load(open(path))["people"]
        if not people:
            return None
        pose = openpose_utils.obtain_2d_cords(
            people[0], resize_param=self.load_size, org_size=org_size,
            affine=affine,
        )["body"]
        if not is_clean:
            pose = openpose_utils.openpose18_to_coco17(pose)
        return pose

    def _limb_rgb(self, pose, is_clean=True):
        """(2, 17) coords → (H, W, 3) drawn limb image in [0, 1]."""
        H, W = self.load_size
        color = np.zeros((H, W, 3), np.uint8)
        if pose is not None:
            limbs = (openpose_utils.LIMB_SEQ_HUMAN36M_17 if is_clean
                     else openpose_utils.LIMB_SEQ_COCO_17)
            color = openpose_utils.draw_joint(color, pose.astype(int), limbs)
        return color.astype(np.float32) / 255.0

    def _load_skeleton(self, path, affine, org_size, is_clean=True):
        pose = self._pose_cords(path, affine, org_size, is_clean)
        if pose is None:
            H, W = self.load_size
            return np.zeros((H, W, self.opt.structure_nc), np.float32)
        maps = openpose_utils.obtain_map(pose, self.load_size)
        return np.concatenate(
            [maps, self._limb_rgb(pose, is_clean)], axis=-1
        )

    @staticmethod
    def _kp_or_missing(pose):
        """(2, 17) or None → (17, 2) float32 (MISSING_VALUE when absent)."""
        if pose is None:
            return np.full((17, 2), openpose_utils.MISSING_VALUE, np.float32)
        return pose.T.astype(np.float32)

    def _load_kp(self, path, affine, org_size, is_clean):
        people = json.load(open(path))["people"]
        if not people:
            return np.zeros((34, 1), np.float32)
        pose = openpose_utils.obtain_2d_cords(
            people[0], resize_param=self.load_size, org_size=org_size,
            affine=affine,
        )["body"]
        if not is_clean:
            pose = openpose_utils.openpose18_to_coco17(pose)
        kp = pose.astype(np.float32).reshape(34, 1)
        return 2 * kp / self.load_size[1] - 1

    def __getitem__(self, index: int) -> Dict:
        if self.is_train:
            seq_idx = index % len(self.A)
        else:
            seq_idx = self.seq_idx
        A = self.A[seq_idx]
        affine = self.random_affine()
        with Image.open(A[0]) as im0:
            org_size = (im0.size[1], im0.size[0])
        n_frames, start, t_step = self.sample_window(len(A))
        fill_white = self.sub_dataset == "fashion"

        imgs, skels, kp_raw, masks, kps_c, kps_n, paths = \
            [], [], [], [], [], [], []
        for i in range(n_frames):
            idx = min(start + i * t_step, len(A) - 1)
            imgs.append(self.transform_image(
                Image.open(A[idx]), affine, fill_white=fill_white
            ))
            if self.device_encode:
                pose = self._pose_cords(
                    self.B_clean[seq_idx][idx], affine, org_size, True)
                kp_raw.append(self._kp_or_missing(pose))
                skels.append(self._limb_rgb(pose, True))
            else:
                skels.append(self._load_skeleton(
                    self.B_clean[seq_idx][idx], affine, org_size, True
                ))
            paths.append(A[idx])
            if not self.is_train:
                kps_c.append(self._load_kp(
                    self.B_clean[seq_idx][idx], affine, org_size, True))
                kps_n.append(self._load_kp(
                    self.B_noise[seq_idx][idx], affine, org_size, False))
            if self.use_mask:
                m = Image.open(self.C[seq_idx][idx]).convert("L")
                masks.append(self.transform_image(
                    m.convert("RGB"), affine, normalize=False
                )[..., :1])

        # reference pool: first 20 frames (dance_dataset.py:158-169)
        if self.sub_dataset == "fashion":
            affine = self.random_affine()
        ref_pool = A[:20]
        ridx = self.rng.randint(len(ref_pool))
        ref_image = self.transform_image(
            Image.open(ref_pool[ridx]), affine, fill_white=fill_white
        )
        out = {
            "P_all": np.stack(imgs).astype(np.float32),
            "ref_image": ref_image.astype(np.float32),
            "gen_paths": paths,
            "ref_path": ref_pool[ridx],
        }
        if self.device_encode:
            ref_pose = self._pose_cords(
                self.B_noise[seq_idx][ridx], affine, org_size, False)
            out["KP_all"] = np.stack(kp_raw)
            out["BP_all_rgb"] = np.stack(skels).astype(np.float32)
            out["ref_KP"] = self._kp_or_missing(ref_pose)
            out["ref_rgb"] = self._limb_rgb(ref_pose, False)
        else:
            out["BP_all"] = np.stack(skels).astype(np.float32)
            out["ref_skeleton"] = self._load_skeleton(
                self.B_noise[seq_idx][ridx], affine, org_size, False
            ).astype(np.float32)
        if self.use_mask:
            out["mask_all"] = np.stack(masks).astype(np.float32)
        if not self.is_train:
            out["gen_kps_clean"] = np.concatenate(kps_c, axis=1)
            out["gen_kps_noise"] = np.concatenate(kps_n, axis=1)
            out["frame_idx"] = self.frame_idx + self.opt.n_frames_pre_load_test
            out["change_seq"] = self.advance_test_cursor(
                self.frames_count[seq_idx]
            )
        return out


class FaceDataset(AnimationDatasetBase):
    """FaceForensics edge-map animation data (face_dataset.py)."""

    @staticmethod
    def modify_options(parser, is_train: bool):
        parser.add_argument("--no_canny_edge", action="store_true",
                            default=False)
        parser.add_argument("--no_dist_map", action="store_true",
                            default=False)
        parser.add_argument("--total_test_frames", type=int, default=None)
        return parser

    # facial part polylines over the 83 keypoints (68 + mirrored upper face)
    PART_LIST = [
        [list(range(0, 17)) + list(range(68, 83)) + [0]],
        [list(range(17, 22))],
        [list(range(22, 27))],
        [[28, 31], list(range(31, 36)), [35, 28]],
        [[36, 37, 38, 39], [39, 40, 41, 36]],
        [[42, 43, 44, 45], [45, 46, 47, 42]],
        [list(range(48, 55)), [54, 55, 56, 57, 58, 59, 48]],
        [list(range(60, 65)), [64, 65, 66, 67, 60]],
    ]
    PART_LABELS = [1, 2, 2, 3, 4, 4, 5, 6]

    @staticmethod
    def apply_defaults(opt, is_train: bool):
        opt.load_size = getattr(opt, "load_size", 256) or 256
        opt.structure_nc = 16
        opt.image_nc = 3
        if getattr(opt, "old_size", None) is None:
            opt.old_size = opt.load_size
        return opt

    def __init__(self, opt):
        super().__init__(opt)
        root = opt.dataroot
        self.A = make_grouped_dataset(os.path.join(root, opt.phase + "_keypoints"))
        self.B = make_grouped_dataset(os.path.join(root, opt.phase + "_data"))
        if not self.is_train:
            chunk = opt.n_frames_pre_load_test
            self.A = [self.pad_to_multiple(p, chunk) for p in self.A]
            self.B = [self.pad_to_multiple(p, chunk) for p in self.B]
        self.frames_count = [len(p) for p in self.A]

    def __len__(self):
        if self.is_train:
            return len(self.A)
        return sum(self.frames_count) // self.opt.n_frames_pre_load_test

    def _face_structure(self, kp_path: str, img: Image.Image) -> np.ndarray:
        """68-pt landmarks → (H, W, 16): 1 edge map + 14 per-part distance
        maps + 1 raw part-label map (values 0-6), matching the reference
        stack order cat([edge, dist], label) (face_dataset.py:97-98,
        143-229; label channel :163-164)."""
        H, W = self.load_size
        w, h = img.size
        keypoints = np.loadtxt(kp_path, delimiter=",")
        # mirror upper face (face_dataset.py:181-185)
        pts = keypoints[:17, :].astype(np.int32)
        baseline_y = (pts[0, 1] + pts[-1, 1]) / 2
        upper = pts[1:-1, :].copy()
        upper[:, 1] = baseline_y + (baseline_y - upper[:, 1]) * 2 // 3
        keypoints = np.vstack((keypoints, upper[::-1, :]))

        part_labels = np.zeros((h, w), np.uint8)
        for p, edge_list in enumerate(self.PART_LIST):
            indices = [i for sub in edge_list for i in sub]
            cv2.fillPoly(part_labels,
                         [keypoints[indices].astype(np.int32)],
                         self.PART_LABELS[p])

        im_edges = np.zeros((H, W), np.uint8)
        dist_maps = []
        for edge_list in self.PART_LIST:
            for edge in edge_list:
                im_edge = np.zeros((H, W), np.uint8)
                for i in range(0, max(1, len(edge) - 1), 2):
                    sub = list(edge[i : i + 3])
                    x = keypoints[sub, 0].astype(np.float32) / w * W
                    y = keypoints[sub, 1].astype(np.float32) / h * H
                    cx, cy = interp_points(x.astype(int), y.astype(int))
                    draw_edge(im_edges, cx, cy, bw=0)
                    draw_edge(im_edge, cx, cy, bw=0)
                if not getattr(self.opt, "no_dist_map", False):
                    dist = cv2.distanceTransform(255 - im_edge, cv2.DIST_L1, 3)
                    dist_maps.append(
                        np.clip(dist / 3, 0, 255).astype(np.float32) / 255.0
                    )

        labels_rs = cv2.resize(part_labels, (W, H),
                               interpolation=cv2.INTER_NEAREST)
        if not getattr(self.opt, "no_canny_edge", False):
            grey = np.asarray(
                img.convert("L").resize((W, H), Image.BICUBIC)
            )
            edges = cv2.Canny(grey, 100, 200) > 0
            edges = edges & (labels_rs == 0)
            im_edges = np.maximum(im_edges, (edges * 255).astype(np.uint8))

        layers = ([im_edges.astype(np.float32) / 255.0] + dist_maps
                  + [labels_rs.astype(np.float32)])
        return np.stack(layers, axis=-1)

    def __getitem__(self, index: int) -> Dict:
        seq_idx = index % len(self.A) if self.is_train else self.seq_idx
        A, B = self.A[seq_idx], self.B[seq_idx]
        n_frames, start, t_step = self.sample_window(len(A))

        imgs, structs, paths = [], [], []
        for i in range(n_frames):
            idx = min(start + i * t_step, len(A) - 1)
            img = Image.open(B[idx])
            structs.append(self._face_structure(A[idx], img))
            imgs.append(self.transform_image(img))
            paths.append(B[idx])

        out = {
            "P_all": np.stack(imgs).astype(np.float32),
            "BP_all": np.stack(structs).astype(np.float32),
            "ref_image": imgs[0].astype(np.float32),
            "ref_skeleton": structs[0].astype(np.float32),
            "gen_paths": paths,
        }
        if not self.is_train:
            out["frame_idx"] = self.frame_idx + self.opt.n_frames_pre_load_test
            out["change_seq"] = self.advance_test_cursor(
                self.frames_count[seq_idx]
            )
        return out


class SyntheticVideoDataset(AnimationDatasetBase):
    """Deterministic synthetic clips for smoke tests / benchmarking of the
    animation heads (no files)."""

    def __init__(self, opt):
        super().__init__(opt)
        self.n = 8
        self.nc = opt.structure_nc

    @staticmethod
    def apply_defaults(opt, is_train: bool):
        opt.image_nc = 3
        if getattr(opt, "old_size", None) is None:
            opt.old_size = opt.load_size
        return opt

    def __len__(self):
        return self.n

    def __getitem__(self, index: int) -> Dict:
        H, W = self.load_size
        T = self.n_frames_total
        rng = np.random.RandomState(index)
        return {
            "P_all": (rng.rand(T, H, W, 3).astype(np.float32) * 2 - 1),
            "BP_all": rng.rand(T, H, W, self.nc).astype(np.float32),
            "ref_image": (rng.rand(H, W, 3).astype(np.float32) * 2 - 1),
            "ref_skeleton": rng.rand(H, W, self.nc).astype(np.float32),
            "gen_paths": [f"syn_{index}_{t}.png" for t in range(T)],
        }
