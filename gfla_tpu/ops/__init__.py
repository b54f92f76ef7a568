"""Core TPU-native ops replacing the reference's three CUDA extensions.

- block_extract / extract_patches / blocks_to_tiles   ← block_extractor
- local_attn_reshape                                  ← local_attn_reshape
- gaussian_resample                                   ← resample2d (Gaussian)
- local_attn_warp — fused ExtractorAttn inner loop (the hot path)
"""

from gfla_tpu.ops.block_extract import (
    block_extract,
    blocks_to_tiles,
    extract_patches,
    tiles_to_blocks,
)
from gfla_tpu.ops.attn_reshape import local_attn_reshape, local_attn_reshape_inverse
from gfla_tpu.ops.gaussian_resample import gaussian_resample
from gfla_tpu.ops.local_attn import local_attn_warp
from gfla_tpu.ops.pallas_warp import fused_warp_eligible, local_attn_warp_fused

__all__ = [
    "block_extract",
    "blocks_to_tiles",
    "extract_patches",
    "tiles_to_blocks",
    "local_attn_reshape",
    "local_attn_reshape_inverse",
    "gaussian_resample",
    "local_attn_warp",
    "local_attn_warp_fused",
    "fused_warp_eligible",
]
