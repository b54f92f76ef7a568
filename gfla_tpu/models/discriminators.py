"""Discriminator networks (flax.linen, NHWC).

Capability parity with reference model/networks/discriminator.py:
ResDiscriminator (spectral-norm ResBlockEncoder stack → 1×1 logit map),
TemporalDiscriminator (two 3-D residual encoders, time folded into channels,
then 2-D encoders), and PatchDiscriminator (70×70 PatchGAN; kept for surface
parity although no live task head uses it — discriminator.py:50-98).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from gfla_tpu.nn.blocks import ResBlock3DEncoder, ResBlockEncoder
from gfla_tpu.nn.norms import Conv2d, get_activation


def _mult(i: int, ndf: int, img_f: int) -> int:
    return min(2**i, img_f // ndf)


class ResDiscriminator(nn.Module):
    """discriminator.py:10-47. Logit map output (no sigmoid — pairs with
    lsgan/hinge losses)."""

    ndf: int = 64
    img_f: int = 1024
    layers: int = 6
    norm_type: str = "none"
    activation: str = "LeakyReLU"
    use_spect: bool = True
    use_coord: bool = False

    @nn.compact
    def __call__(self, x, train=True, update_stats=True):
        act = get_activation(self.activation)
        kw = dict(
            norm_type=self.norm_type, activation=self.activation,
            use_spect=self.use_spect,
        )
        out = ResBlockEncoder(self.ndf, self.ndf, name="block0", **kw)(
            x, train, update_stats
        )
        mult = 1
        for i in range(self.layers - 1):
            mult_prev = mult
            mult = _mult(i + 1, self.ndf, self.img_f)
            out = ResBlockEncoder(
                self.ndf * mult, self.ndf * mult_prev, name=f"encoder{i}", **kw
            )(out, train, update_stats)
        out = Conv2d(1, (1, 1), (1, 1), 0, use_spect=True, name="conv")(
            act(out), update_stats
        )
        return out


class TemporalDiscriminator(nn.Module):
    """discriminator.py:100-140. Input (B, T, H, W, C) video clip; two 3-D
    residual encoders shrink time by 2 each and halve space, then the
    remaining time axis is folded into channels for 2-D encoders."""

    input_length: int = 6
    ndf: int = 64
    img_f: int = 1024
    layers: int = 6
    norm_type: str = "none"
    activation: str = "LeakyReLU"
    use_spect: bool = True
    use_coord: bool = False

    @nn.compact
    def __call__(self, x, train=True, update_stats=True):
        act = get_activation(self.activation)
        kw3 = dict(
            norm_type=self.norm_type, activation=self.activation,
            use_spect=self.use_spect,
        )
        out = ResBlock3DEncoder(self.ndf, self.ndf, name="block0", **kw3)(
            x, train, update_stats
        )
        out = ResBlock3DEncoder(2 * self.ndf, self.ndf, name="block1", **kw3)(
            out, train, update_stats
        )
        B, T, H, W, C = out.shape
        # fold time into channels (reference reshapes NCDHW → N(C·D)HW;
        # NHWC equivalent keeps (t, c) adjacency in the channel axis)
        out = out.transpose(0, 2, 3, 1, 4).reshape(B, H, W, T * C)

        feature_len = self.input_length - 4
        mult = 2 * feature_len
        for i in range(self.layers - 2):
            mult_prev = mult
            mult = _mult(i + 2, self.ndf, self.img_f)
            out = ResBlockEncoder(
                self.ndf * mult, self.ndf * mult_prev,
                norm_type=self.norm_type, activation=self.activation,
                use_spect=self.use_spect, name=f"encoder{i}",
            )(out, train, update_stats)
        out = Conv2d(1, (1, 1), (1, 1), 0, use_spect=True, name="conv")(
            act(out), update_stats
        )
        return out


class PatchDiscriminator(nn.Module):
    """70×70 PatchGAN (discriminator.py:50-98). Surface parity; unused by
    the shipped task heads."""

    ndf: int = 64
    img_f: int = 512
    layers: int = 3
    activation: str = "LeakyReLU"
    use_spect: bool = True
    use_coord: bool = False

    @nn.compact
    def __call__(self, x, train=True, update_stats=True):
        act = get_activation(self.activation)
        out = Conv2d(
            self.ndf, (4, 4), (2, 2), 1, use_bias=False,
            use_spect=self.use_spect, use_coord=self.use_coord, name="conv0",
        )(x, update_stats)
        out = act(out)
        mult = 1
        for i in range(1, self.layers):
            mult = _mult(i, self.ndf, self.img_f)
            out = Conv2d(
                self.ndf * mult, (4, 4), (2, 2), 1, use_bias=False,
                use_spect=self.use_spect, use_coord=self.use_coord,
                name=f"conv{i}",
            )(out, update_stats)
            out = act(out)
        out = Conv2d(
            self.ndf * mult, (4, 4), (1, 1), 1, use_bias=False,
            use_spect=self.use_spect, use_coord=self.use_coord, name="conv_last",
        )(out, update_stats)
        out = act(out)
        out = Conv2d(
            1, (4, 4), (1, 1), 1, use_bias=False,
            use_spect=self.use_spect, use_coord=self.use_coord, name="conv_out",
        )(out, update_stats)
        return out
