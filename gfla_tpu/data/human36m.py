"""Human3.6M data access: NPZ 2-D pose archives + camera parameters.

Capability parity with reference util/human36m.py + util/camera.py:
VideoPose3D-format NPZ loading, the full camera tables (intrinsics with
distortion + per-subject quaternion extrinsics, gfla_tpu/data/camera.py),
screen-coordinate normalization, and sequence-list construction.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from gfla_tpu.data.camera import (  # noqa: F401  (re-exported surface)
    H36M_EXTRINSICS,
    H36M_INTRINSICS,
    camera_to_world,
    image_coordinates,
    init_cameras_param,
    normalize_screen_coordinates,
    project_to_2d,
    project_to_2d_linear,
    world_to_camera,
)

# back-compat alias (round-1 name)
CAMERA_INTRINSICS = H36M_INTRINSICS

SUBJECTS = ["S1", "S5", "S6", "S7", "S8", "S9", "S11"]

# 32-joint → 17-joint selection (keypoint_dataset.py:133)
H36M_17_FROM_32 = [0, 1, 2, 3, 6, 7, 8, 12, 13, 14, 15, 17, 18, 19, 25, 26, 27]


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
