"""Numerical validation of the torch→flax weight mappings.

Each mapping is checked against torch.nn.functional ops directly (no
reference code involved): conv, transposed conv (k3 s2 p1 op1), instance
norm, and the ExtractorAttn dense-from-conv reshape.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import torch.nn.functional as F
from flax import linen as nn

from gfla_tpu.convert import map_attn_conv1, map_conv, map_conv_transpose
from gfla_tpu.convert.torch_mapping import map_attn_conv2
from gfla_tpu.nn.norms import Conv2d, ConvTranspose2x, InstanceNorm


def _nchw(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


def _nhwc(x):
    return np.asarray(x).transpose(0, 2, 3, 1)


class TestConvMapping:
    def test_conv2d(self):
        rng = np.random.RandomState(0)
        x = rng.randn(2, 4, 9, 7).astype(np.float32)
        w = rng.randn(6, 4, 3, 3).astype(np.float32)
        b = rng.randn(6).astype(np.float32)
        yt = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                      stride=1, padding=1).numpy()
        mod = Conv2d(6, (3, 3), (1, 1), 1)
        out = mod.apply(
            {"params": {"Conv_0": {"kernel": jnp.asarray(map_conv(w)),
                                   "bias": jnp.asarray(b)}}},
            jnp.asarray(_nhwc(x)),
        )
        np.testing.assert_allclose(_nchw(out), yt, rtol=1e-4, atol=1e-4)

    def test_conv_transpose_2x(self):
        rng = np.random.RandomState(1)
        x = rng.randn(1, 3, 8, 6).astype(np.float32)
        w = rng.randn(3, 5, 3, 3).astype(np.float32)  # torch (in, out, kh, kw)
        b = rng.randn(5).astype(np.float32)
        yt = F.conv_transpose2d(torch.tensor(x), torch.tensor(w),
                                torch.tensor(b), stride=2, padding=1,
                                output_padding=1).numpy()
        mod = ConvTranspose2x(5)
        out = mod.apply(
            {"params": {"ConvTranspose_0": {
                "kernel": jnp.asarray(map_conv_transpose(w)),
                "bias": jnp.asarray(b)}}},
            jnp.asarray(_nhwc(x)),
        )
        assert out.shape == (1, 16, 12, 5)
        np.testing.assert_allclose(_nchw(out), yt, rtol=1e-4, atol=1e-4)

    def test_instance_norm(self):
        rng = np.random.RandomState(2)
        x = rng.randn(2, 5, 8, 8).astype(np.float32)
        w = rng.randn(5).astype(np.float32)
        b = rng.randn(5).astype(np.float32)
        yt = F.instance_norm(torch.tensor(x), weight=torch.tensor(w),
                             bias=torch.tensor(b), eps=1e-5).numpy()
        out = InstanceNorm().apply(
            {"params": {"scale": jnp.asarray(w), "bias": jnp.asarray(b)}},
            jnp.asarray(_nhwc(x)),
        )
        np.testing.assert_allclose(_nchw(out), yt, rtol=1e-4, atol=1e-4)

    def test_attn_stride_k_conv_as_dense(self):
        """Conv2d(2C→D, kernel k, stride k) over tile layout == our dense
        einsum over (k², 2C) block vectors with the mapped weight."""
        rng = np.random.RandomState(3)
        k, c2, d = 3, 8, 16
        H = W = 4
        blocks = rng.randn(1, H, W, k * k, c2).astype(np.float32)
        w = rng.randn(d, c2, k, k).astype(np.float32)
        b = rng.randn(d).astype(np.float32)

        # torch route: tiles (B, 2C, kH, kW), conv stride k
        from gfla_tpu.ops import blocks_to_tiles

        tiles = np.asarray(blocks_to_tiles(jnp.asarray(blocks), k))
        yt = F.conv2d(torch.tensor(_nchw(tiles)), torch.tensor(w),
                      torch.tensor(b), stride=k).numpy()  # (1, D, H, W)

        w1 = map_attn_conv1(w)  # (k², 2C, D)
        ours = np.einsum("bhwkc,kcd->bhwd", blocks, w1) + b
        np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), yt,
                                   rtol=1e-4, atol=1e-4)

    def test_attn_1x1(self):
        rng = np.random.RandomState(4)
        w = rng.randn(9, 16, 1, 1).astype(np.float32)
        x = rng.randn(1, 16, 4, 4).astype(np.float32)
        yt = F.conv2d(torch.tensor(x), torch.tensor(w)).numpy()
        w2 = map_attn_conv2(w)  # (16, 9)
        ours = np.einsum("bhwd,dk->bhwk", _nhwc(x), w2)
        np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), yt,
                                   rtol=1e-4, atol=1e-4)
