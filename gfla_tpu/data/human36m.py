"""Human3.6M data access: NPZ 2-D pose archives + camera parameters.

Capability parity with reference util/human36m.py + util/camera.py for the
parts the keypoint task consumes: VideoPose3D-format NPZ loading, per
subject/camera resolution tables (only res_w/res_h feed the 2-D
normalization — human36m.py:217-238, keypoint_dataset.py:124-128),
screen-coordinate normalization, and sequence-list construction.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# Public H36M camera resolutions (VideoPose3D camera tables); index order
# matches the per-action camera list in the NPZ archives.
CAMERA_INTRINSICS = [
    {"id": "54138969", "res_w": 1000, "res_h": 1002,
     "focal_length": [2.2901, 2.2876], "center": [0.0251, 0.0290]},
    {"id": "55011271", "res_w": 1000, "res_h": 1000,
     "focal_length": [2.2994, 2.2952], "center": [0.0177, 0.0161]},
    {"id": "58860488", "res_w": 1000, "res_h": 1000,
     "focal_length": [2.2983, 2.2976], "center": [0.0396, 0.0028]},
    {"id": "60457274", "res_w": 1000, "res_h": 1002,
     "focal_length": [2.2910, 2.2895], "center": [0.0299, 0.0018]},
]

SUBJECTS = ["S1", "S5", "S6", "S7", "S8", "S9", "S11"]

# 32-joint → 17-joint selection (keypoint_dataset.py:133)
H36M_17_FROM_32 = [0, 1, 2, 3, 6, 7, 8, 12, 13, 14, 15, 17, 18, 19, 25, 26, 27]


def normalize_screen_coordinates(x: np.ndarray, w: int, h: int) -> np.ndarray:
    """Pixel coords → [-1, 1] keeping aspect (reference util/camera.py)."""
    return x / w * 2 - np.array([1, h / w], dtype=x.dtype)


def image_coordinates(x: np.ndarray, w: int, h: int) -> np.ndarray:
    return (x + np.array([1, h / w], dtype=x.dtype)) * w / 2


def init_position_data(path: str) -> Tuple[Dict, str]:
    """Load a VideoPose3D NPZ: returns ({subject: {action: {cam: (T,K,C)}}},
    '2d'|'3d') — human36m.py:197-215."""
    file_data = np.load(path, allow_pickle=True)
    if "positions_2d" in file_data:
        raw = file_data["positions_2d"].item()
        data_type = "2d"
    elif "positions_3d" in file_data:
        raw = file_data["positions_3d"].item()
        data_type = "3d"
    else:
        raise ValueError(f"{path}: no positions_2d/positions_3d key")
    data: Dict = {}
    for subject, actions in raw.items():
        data[subject] = {}
        for action, positions in actions.items():
            if data_type == "2d":
                data[subject][action] = {
                    str(i): positions[i] for i in range(len(positions))
                }
            else:
                data[subject][action] = positions
    return data, data_type


def init_cameras_param() -> Dict[str, List[Dict]]:
    """Per-subject camera parameter list (the 4 intrinsics are shared)."""
    return {s: [dict(c) for c in CAMERA_INTRINSICS] for s in SUBJECTS}


def init_video_list(path_input: str, path_gt: str,
                    exclude_subjects: List[str]) -> List[Dict]:
    """Sequences present in both archives, excluding held-out subjects
    (human36m.py:240-263)."""
    inp, _ = init_position_data(path_input)
    gt, _ = init_position_data(path_gt)
    out = []
    for subject in inp:
        if subject not in gt or subject in exclude_subjects:
            continue
        for action in inp[subject]:
            if action not in gt[subject]:
                continue
            for camera in inp[subject][action]:
                out.append(
                    {"subject": subject, "action": action, "camera": camera}
                )
    return out


def check_dataset(data_gt, data_input, data_list, gt_data_type) -> List[Dict]:
    """Drop sequences whose gt/input lengths disagree by >1%
    (human36m.py:265-279)."""
    out = []
    for seq in data_list:
        if gt_data_type == "2d":
            vg = data_gt[seq["subject"]][seq["action"]][seq["camera"]]
        else:
            vg = data_gt[seq["subject"]][seq["action"]]
        vi = data_input[seq["subject"]][seq["action"]][seq["camera"]]
        if abs(vg.shape[0] - vi.shape[0]) / vg.shape[0] <= 0.01:
            out.append(seq)
    return out
