"""Network building blocks (flax.linen, NHWC).

Capability parity with the reference block zoo
(model/networks/base_function.py:334-556,650-691): pre-activation
norm→act→conv blocks. `norm_type='none'` means no norm layer, matching the
reference's `norm_layer=None` branches. All blocks thread
(train, update_stats) for batch-norm / spectral-norm state.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from gfla_tpu.nn.norms import (
    Conv2d,
    Conv3d,
    ConvTranspose2x,
    Norm,
    get_activation,
)


class EncoderBlock(nn.Module):
    """norm→act→conv4s2 → norm→act→conv3s1 (base_function.py:334-354). H→H/2."""

    output_nc: int
    norm_type: str = "batch"
    activation: str = "ReLU"
    use_spect: bool = False
    use_coord: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True, update_stats: bool = True):
        act = get_activation(self.activation)
        if self.norm_type != "none":
            x = Norm(self.norm_type, name="norm1")(x, train)
        x = act(x)
        x = Conv2d(
            self.output_nc, (4, 4), (2, 2), 1,
            use_spect=self.use_spect, use_coord=self.use_coord, name="conv1",
        )(x, update_stats)
        if self.norm_type != "none":
            x = Norm(self.norm_type, name="norm2")(x, train)
        x = act(x)
        x = Conv2d(
            self.output_nc, (3, 3), (1, 1), 1,
            use_spect=self.use_spect, use_coord=self.use_coord, name="conv2",
        )(x, update_stats)
        return x


class ResBlock(nn.Module):
    """Pre-activation residual block with optional learnable shortcut
    (base_function.py:357-391). Shortcut becomes learnable when
    input_nc != output_nc."""

    output_nc: Optional[int] = None
    hidden_nc: Optional[int] = None
    norm_type: str = "batch"
    activation: str = "ReLU"
    learnable_shortcut: bool = False
    use_spect: bool = False
    use_coord: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True, update_stats: bool = True):
        input_nc = x.shape[-1]
        output_nc = self.output_nc or input_nc
        hidden_nc = self.hidden_nc or input_nc
        learnable = self.learnable_shortcut or (input_nc != output_nc)
        act = get_activation(self.activation)

        h = x
        if self.norm_type != "none":
            h = Norm(self.norm_type, name="norm1")(h, train)
        h = act(h)
        h = Conv2d(
            hidden_nc, (3, 3), (1, 1), 1,
            use_spect=self.use_spect, use_coord=self.use_coord, name="conv1",
        )(h, update_stats)
        if self.norm_type != "none":
            h = Norm(self.norm_type, name="norm2")(h, train)
        h = act(h)
        h = Conv2d(
            output_nc, (3, 3), (1, 1), 1,
            use_spect=self.use_spect, use_coord=self.use_coord, name="conv2",
        )(h, update_stats)

        if learnable:
            s = Conv2d(
                output_nc, (1, 1), (1, 1), 0,
                use_spect=self.use_spect, use_coord=self.use_coord,
                name="shortcut",
            )(x, update_stats)
        else:
            s = x
        return h + s


class ResBlocks(nn.Module):
    """Sequence of ResBlocks (base_function.py:393-418)."""

    num_blocks: int
    output_nc: Optional[int] = None
    hidden_nc: Optional[int] = None
    norm_type: str = "batch"
    activation: str = "ReLU"
    learnable_shortcut: bool = False
    use_spect: bool = False
    use_coord: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True, update_stats: bool = True):
        input_nc = x.shape[-1]
        hidden_nc = self.hidden_nc or input_nc
        output_nc = self.output_nc or input_nc
        kw = dict(
            norm_type=self.norm_type,
            activation=self.activation,
            learnable_shortcut=self.learnable_shortcut,
            use_spect=self.use_spect,
            use_coord=self.use_coord,
        )
        if self.num_blocks == 1:
            return ResBlock(output_nc, hidden_nc, name="block0", **kw)(
                x, train, update_stats
            )
        x = ResBlock(hidden_nc, hidden_nc, name="block0", **kw)(
            x, train, update_stats
        )
        for i in range(self.num_blocks - 2):
            x = ResBlock(hidden_nc, hidden_nc, name=f"block{i + 1}", **kw)(
                x, train, update_stats
            )
        x = ResBlock(output_nc, hidden_nc, name=f"block{self.num_blocks - 1}", **kw)(
            x, train, update_stats
        )
        return x


class ResBlockDecoder(nn.Module):
    """Residual 2× upsampling block (base_function.py:508-531):
    main = norm→act→conv3s1 → norm→act→convT(2×); shortcut = convT(2×)."""

    output_nc: int
    hidden_nc: Optional[int] = None
    norm_type: str = "batch"
    activation: str = "ReLU"
    use_spect: bool = False
    use_coord: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True, update_stats: bool = True):
        input_nc = x.shape[-1]
        hidden_nc = self.hidden_nc or input_nc
        act = get_activation(self.activation)

        h = x
        if self.norm_type != "none":
            h = Norm(self.norm_type, name="norm1")(h, train)
        h = act(h)
        h = Conv2d(hidden_nc, (3, 3), (1, 1), 1, use_spect=self.use_spect,
                   name="conv1")(h, update_stats)
        if self.norm_type != "none":
            h = Norm(self.norm_type, name="norm2")(h, train)
        h = act(h)
        h = ConvTranspose2x(self.output_nc, use_spect=self.use_spect,
                            name="conv2")(h, update_stats)
        s = ConvTranspose2x(self.output_nc, use_spect=self.use_spect,
                            name="shortcut")(x, update_stats)
        return h + s


class ResBlockEncoder(nn.Module):
    """Residual 2× downsampling block (base_function.py:533-556):
    main = norm→act→conv3s1 → norm→act→conv4s2; shortcut = avgpool2 → conv1×1."""

    output_nc: int
    hidden_nc: Optional[int] = None
    norm_type: str = "none"
    activation: str = "LeakyReLU"
    use_spect: bool = True
    use_coord: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True, update_stats: bool = True):
        input_nc = x.shape[-1]
        hidden_nc = self.hidden_nc or input_nc
        act = get_activation(self.activation)

        h = x
        if self.norm_type != "none":
            h = Norm(self.norm_type, name="norm1")(h, train)
        h = act(h)
        h = Conv2d(hidden_nc, (3, 3), (1, 1), 1, use_spect=self.use_spect,
                   name="conv1")(h, update_stats)
        if self.norm_type != "none":
            h = Norm(self.norm_type, name="norm2")(h, train)
        h = act(h)
        h = Conv2d(self.output_nc, (4, 4), (2, 2), 1, use_spect=self.use_spect,
                   name="conv2")(h, update_stats)
        s = nn.avg_pool(x, (2, 2), strides=(2, 2))
        s = Conv2d(self.output_nc, (1, 1), (1, 1), 0, use_spect=self.use_spect,
                   name="shortcut")(s, update_stats)
        return h + s


class ResBlock3DEncoder(nn.Module):
    """3-D residual encoder block (base_function.py:43-67), NDHWC:
    conv3³s1(p1) → conv(3,4,4)s(1,2,2)(p(0,1,1)); shortcut
    avgpool3d(3,2,2)s(1,2,2) → conv1³. Time shrinks by 2, space halves."""

    output_nc: int
    hidden_nc: Optional[int] = None
    norm_type: str = "none"
    activation: str = "LeakyReLU"
    use_spect: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True, update_stats: bool = True):
        input_nc = x.shape[-1]
        hidden_nc = self.hidden_nc or input_nc
        act = get_activation(self.activation)

        h = act(x)
        h = Conv3d(hidden_nc, (3, 3, 3), (1, 1, 1), (1, 1, 1),
                   use_spect=self.use_spect, name="conv1")(h, update_stats)
        h = act(h)
        h = Conv3d(self.output_nc, (3, 4, 4), (1, 2, 2), (0, 1, 1),
                   use_spect=self.use_spect, name="conv2")(h, update_stats)
        s = nn.avg_pool(x, (3, 2, 2), strides=(1, 2, 2))
        s = Conv3d(self.output_nc, (1, 1, 1), (1, 1, 1), (0, 0, 0),
                   use_spect=self.use_spect, name="shortcut")(s, update_stats)
        return h + s


class Output(nn.Module):
    """Output head: norm→act→reflect-pad→conv→tanh (base_function.py:650-670)."""

    output_nc: int
    kernel_size: int = 3
    norm_type: str = "none"
    activation: str = "ReLU"
    use_spect: bool = False
    use_coord: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True, update_stats: bool = True):
        act = get_activation(self.activation)
        if self.norm_type != "none":
            x = Norm(self.norm_type, name="norm1")(x, train)
        x = act(x)
        x = Conv2d(
            self.output_nc, (self.kernel_size, self.kernel_size), (1, 1),
            self.kernel_size // 2, use_spect=self.use_spect,
            use_coord=self.use_coord, pad_mode="reflect", name="conv1",
        )(x, update_stats)
        return jnp.tanh(x)


class Jump(nn.Module):
    """Skip adapter: norm→act→reflect-pad→conv (base_function.py:672-691)."""

    output_nc: int
    kernel_size: int = 3
    norm_type: str = "none"
    activation: str = "ReLU"
    use_spect: bool = False
    use_coord: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True, update_stats: bool = True):
        act = get_activation(self.activation)
        if self.norm_type != "none":
            x = Norm(self.norm_type, name="norm1")(x, train)
        x = act(x)
        x = Conv2d(
            self.output_nc, (self.kernel_size, self.kernel_size), (1, 1),
            self.kernel_size // 2, use_spect=self.use_spect,
            use_coord=self.use_coord, pad_mode="reflect", name="conv1",
        )(x, update_stats)
        return x
