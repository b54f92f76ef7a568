"""Network registry — string-keyed factories mirroring the reference's
define_g/define_d reflection registries (model/networks/__init__.py:22-51).
"""

from __future__ import annotations

from typing import Any, Dict

from gfla_tpu.models.discriminators import (
    PatchDiscriminator,
    ResDiscriminator,
    TemporalDiscriminator,
)
from gfla_tpu.models.generators import (
    DanceGenerator,
    FaceGenerator,
    PoseFlowNetGenerator,
    PoseGenerator,
    ShapeNetFlowNetGenerator,
    ShapeNetGenerator,
)

GENERATORS: Dict[str, Any] = {
    "pose": PoseGenerator,
    "poseflownet": PoseFlowNetGenerator,
    "dance": DanceGenerator,
    "face": FaceGenerator,
    "shapenet": ShapeNetGenerator,
    "shapenetflow": ShapeNetFlowNetGenerator,
}

DISCRIMINATORS: Dict[str, Any] = {
    "res": ResDiscriminator,
    "patch": PatchDiscriminator,
    "temporal": TemporalDiscriminator,
}


def define_g(name: str, **kwargs):
    """Instantiate a generator by registry name (reference define_g)."""
    if name not in GENERATORS:
        raise KeyError(f"unknown generator '{name}'; have {sorted(GENERATORS)}")
    return GENERATORS[name](**kwargs)


def define_d(name: str = "res", **kwargs):
    """Instantiate a discriminator by registry name (reference define_d)."""
    if name not in DISCRIMINATORS:
        raise KeyError(
            f"unknown discriminator '{name}'; have {sorted(DISCRIMINATORS)}"
        )
    return DISCRIMINATORS[name](**kwargs)
