"""Checkpoint interop: torch reference checkpoints → flax params."""

from gfla_tpu.convert.torch_mapping import (
    convert_dance_generator,
    convert_face_generator,
    convert_kp_generator,
    convert_pose_generator,
    convert_res_discriminator,
    convert_shapenet_generator,
    convert_temporal_discriminator,
    map_attn_conv1,
    map_conv,
    map_conv3d,
    map_conv_transpose,
)

__all__ = [
    "convert_dance_generator",
    "convert_face_generator",
    "convert_kp_generator",
    "convert_pose_generator",
    "convert_res_discriminator",
    "convert_shapenet_generator",
    "convert_temporal_discriminator",
    "map_conv",
    "map_conv3d",
    "map_conv_transpose",
    "map_attn_conv1",
]
