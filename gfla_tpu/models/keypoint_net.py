"""Motion Extraction Net — temporal 1-D keypoint denoiser (flax, NTC).

Capability parity with the reference KPInputNet2D / KPInput2DGenerator
(model/networks/generator.py:320-382) and its norm layers
(base_function.py:892-934): a dilated temporal conv stack with per-sample
layer norm, conditioned via ADALN on a global feature pooled from strided
convs. Denoises COCO-17 2-D pose sequences into H36M-17 sequences
(receptive field 3^layers; 81 for layers=4 — keypoint_dataset.py:26).

Layout: (B, T, 2K) time-major channels-last (torch uses (B, 2K, T)).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from gfla_tpu.nn.norms import default_kernel_init


class LayerNormAll(nn.Module):
    """Per-sample layer norm over ALL non-batch dims, per-channel affine
    (reference LayerNorm1d, base_function.py:892-907)."""

    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        w = self.param("scale", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return y * w + b


class ADALN1d(nn.Module):
    """Adaptive layer norm: param-free LN over (T, C) then per-channel
    (1+γ)/β from a global feature (base_function.py:910-934)."""

    norm_nc: int
    hidden_nc: int = 128
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, feature):  # x (B, T, C); feature (B, F)
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        h = jax.nn.relu(nn.Dense(self.hidden_nc, name="mlp_shared")(feature))
        gamma = nn.Dense(self.norm_nc, name="mlp_gamma")(h)[:, None, :]
        beta = nn.Dense(self.norm_nc, name="mlp_beta")(h)[:, None, :]
        return y * (1.0 + gamma) + beta


def _conv1d(features, kernel, stride=1, dilation=1, use_bias=True, name=None):
    return nn.Conv(
        features, (kernel,), strides=(stride,), padding="VALID",
        kernel_dilation=(dilation,), use_bias=use_bias,
        kernel_init=default_kernel_init(), name=name,
    )


class KPInputNet2D(nn.Module):
    keypoint_nc: int = 17
    channels: int = 256
    layers: int = 4
    dropout: float = 0.15
    kernel_size: int = 3

    @nn.compact
    def __call__(self, kp, train: bool = True):
        """kp: (B, T, 2K). Returns (B, T_out, 2K) with T_out = T − (RF−1)."""
        k = self.kernel_size
        lrelu = lambda v: jax.nn.leaky_relu(v, 0.1)
        drop = lambda v: nn.Dropout(self.dropout, deterministic=not train)(v)

        # global conditioning feature: 3 strided convs + temporal mean
        # (bias=False like the reference, generator.py:363-365). The three
        # stride-2 VALID convs consume timesteps: T → (T-k)//2+1 thrice, so
        # T < 15 (k=3) leaves an EMPTY feature whose mean is NaN — refuse
        # at trace time instead of training on NaNs.
        t = kp.shape[1]
        for _ in range(3):
            t = (t - k) // 2 + 1
        if t < 1:
            raise ValueError(
                f"KPInputNet2D: input length T={kp.shape[1]} too short for "
                f"the 3 stride-2 feature convs (k={k}); need T >= 15 for k=3"
            )
        f = lrelu(_conv1d(self.channels, k, 2, use_bias=False,
                          name="feature_conv_1")(kp))
        f = lrelu(_conv1d(self.channels, k, 2, use_bias=False,
                          name="feature_conv_2")(f))
        f = lrelu(_conv1d(self.channels, k, 2, use_bias=False,
                          name="feature_conv_3")(f))
        feature = jnp.mean(f, axis=1)  # (B, C)

        x = _conv1d(self.channels, k, use_bias=False, name="expand_conv")(kp)
        x = drop(lrelu(LayerNormAll(self.channels, name="expand_ln")(x)))

        dilation = k
        for i in range(self.layers - 1):
            pad = (k - 1) * dilation // 2
            res = x[:, pad : x.shape[1] - pad, :]
            h = _conv1d(self.channels, k, dilation=dilation, use_bias=False,
                        name=f"conv_{2 * i}")(x)
            h = drop(lrelu(ADALN1d(self.channels, name=f"ln_{2 * i}")(h, feature)))
            h2 = _conv1d(self.channels, 1, use_bias=False,
                         name=f"conv_{2 * i + 1}")(h)
            h2 = drop(lrelu(ADALN1d(self.channels, name=f"ln_{2 * i + 1}")(h2, feature)))
            x = res + h2
            dilation *= k

        return _conv1d(2 * self.keypoint_nc, 1, name="shrink")(x)


class KPInput2DGenerator(nn.Module):
    """Registry wrapper (generator.py:320-328)."""

    structure_nc: int = 17
    channels: int = 256
    layers: int = 4

    @nn.compact
    def __call__(self, input_2d, train: bool = True):
        return KPInputNet2D(
            keypoint_nc=self.structure_nc, channels=self.channels,
            layers=self.layers, name="kp_input",
        )(input_2d, train)
