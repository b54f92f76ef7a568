"""Building blocks (L1 of the reference layer map, SURVEY.md §1)."""

from gfla_tpu.nn.attention import ExtractorAttn
from gfla_tpu.nn.blocks import (
    EncoderBlock,
    Jump,
    Output,
    ResBlock,
    ResBlock3DEncoder,
    ResBlockDecoder,
    ResBlockEncoder,
    ResBlocks,
)
from gfla_tpu.nn.norms import (
    Conv2d,
    Conv3d,
    ConvTranspose2x,
    InstanceNorm,
    Norm,
    add_coords,
    get_activation,
)

__all__ = [
    "ExtractorAttn",
    "EncoderBlock",
    "Jump",
    "Output",
    "ResBlock",
    "ResBlock3DEncoder",
    "ResBlockDecoder",
    "ResBlockEncoder",
    "ResBlocks",
    "Conv2d",
    "Conv3d",
    "ConvTranspose2x",
    "InstanceNorm",
    "Norm",
    "add_coords",
    "get_activation",
]
