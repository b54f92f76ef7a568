"""Checkpoint interop: torch reference checkpoints → flax params."""

from gfla_tpu.convert.torch_mapping import (
    convert_pose_generator,
    map_attn_conv1,
    map_conv,
    map_conv_transpose,
)

__all__ = [
    "convert_pose_generator",
    "map_conv",
    "map_conv_transpose",
    "map_attn_conv1",
]
