"""Task-model registry (L3) — string-keyed like the reference's
model/__init__.py:7-34 reflection registry."""

from __future__ import annotations

from gfla_tpu.tasks.animation import DanceTask, FaceTask
from gfla_tpu.tasks.keypoint import KeypointTask
from gfla_tpu.tasks.pose import PoseTask
from gfla_tpu.tasks.poseflownet import PoseFlowNetTask
from gfla_tpu.tasks.shapenet import ShapeNetFlowTask, ShapeNetTask

TASKS = {
    "pose": PoseTask,
    "poseflownet": PoseFlowNetTask,
    "dance": DanceTask,
    "face": FaceTask,
    "shapenet": ShapeNetTask,
    "shapenetflow": ShapeNetFlowTask,
    "keypoint": KeypointTask,
}


def register_task(name: str, cls) -> None:
    TASKS[name] = cls


def get_task_class(name: str):
    if name not in TASKS:
        raise KeyError(f"unknown model '{name}'; have {sorted(TASKS)}")
    return TASKS[name]


def create_task(opt):
    return get_task_class(opt.model)(opt)
