"""ExtractorAttn — the local-attention module (flax wrapper over the fused op).

Capability parity with the reference ExtractorAttn
(model/networks/base_function.py:790-818): learned per-location attention
over flow-displaced k×k source blocks. The two convs of the reference's
`fully_connect_layer` (k-stride conv 2C→128, then 1×1 conv 128→k²) are held
here as dense einsum parameters feeding `ops.local_attn_warp`, which fuses
extract→correlate→softmax→weighted-sum without ever materialising the
(B, C, kH, kW) tile tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from gfla_tpu.nn.norms import default_kernel_init, get_activation
from gfla_tpu.ops.local_attn import local_attn_warp


class ExtractorAttn(nn.Module):
    kernel_size: int = 4
    hidden_nc: int = 128
    activation: str = "LeakyReLU"

    @nn.compact
    def __call__(self, source, target, flow, return_attn: bool = False):
        """source/target: (B, H, W, C); flow: (B, H, W, 2) (x, y)."""
        c = source.shape[-1]
        k = self.kernel_size
        k2 = k * k
        # reference conv1: Conv2d(2C, 128, kernel k, stride k) over tiles
        w1 = self.param("w1", default_kernel_init(), (k2, 2 * c, self.hidden_nc))
        b1 = self.param("b1", nn.initializers.zeros, (self.hidden_nc,))
        # reference conv2: Conv2d(128, k², 1)
        w2 = self.param("w2", default_kernel_init(), (self.hidden_nc, k2))
        b2 = self.param("b2", nn.initializers.zeros, (k2,))
        return local_attn_warp(
            source, target, flow, k, w1, b1, w2, b2,
            activation=get_activation(self.activation),
            return_attn=return_attn,
        )
