"""InceptionV3 pool3 feature extractor (flax, NHWC) for FID.

Capability parity with reference script/inception.py (torchvision
InceptionV3 up to the 2048-d pool3 features, aux head removed). Weights
load from assets/inception_v3.npz (scripts/convert_inception_weights.py);
without the asset a deterministic fallback keeps the pipeline runnable but
the resulting FID is NOT comparable to published numbers (flagged at
runtime).

Input contract (matching the reference FID pipeline, script/metrics.py):
uint8-range images scaled to [0,1], resized to 299×299, then mapped to
[-1,1] inside the network.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# GFLA_ASSETS_DIR overrides the default <repo>/assets location (e.g. the
# metrics-CLI golden test points it at converter-produced synthetic npz)
ASSET_PATH = os.path.join(
    os.environ.get(
        "GFLA_ASSETS_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "assets"),
    ),
    "inception_v3.npz",
)


class ConvBN(nn.Module):
    features: int
    kernel: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Any = (0, 0)

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(self.features, tuple(self.kernel), strides=tuple(self.strides),
                    padding=pad, use_bias=False, name="conv")(x)
        # inference-only batch norm (running stats from the converted ckpt)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         use_scale=True, use_bias=True, name="bn")(x)
        return jax.nn.relu(x)


def _pool(x, window=3, stride=1, pad=1, kind="avg"):
    p = ((pad, pad), (pad, pad))
    if kind == "avg":
        return nn.pool(x, 0.0, jax.lax.add, (window, window), (stride, stride),
                       p) / (window * window)
    return nn.max_pool(x, (window, window), (stride, stride), p)


class MixedA(nn.Module):
    """Inception A block (35×35)."""

    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _pool(x, 3, 1, 1, "avg")
        bp = ConvBN(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class MixedB(nn.Module):
    """Reduction A (35→17)."""

    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), (2, 2), name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), (2, 2), name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class MixedC(nn.Module):
    """Inception B block (17×17) with 7×1/1×7 factorization."""

    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = ConvBN(192, (1, 1), name="branch1x1")(x)
        b7 = ConvBN(c7, (1, 1), name="branch7x7_1")(x)
        b7 = ConvBN(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = ConvBN(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = ConvBN(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = ConvBN(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = ConvBN(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _pool(x, 3, 1, 1, "avg")
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class MixedD(nn.Module):
    """Reduction B (17→8)."""

    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), (2, 2), name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), (2, 2), name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class MixedE(nn.Module):
    """Inception C block (8×8) with branched 3×1/1×3."""

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), name="branch1x1")(x)
        b3 = ConvBN(384, (1, 1), name="branch3x3_1")(x)
        b3a = ConvBN(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = ConvBN(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvBN(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = ConvBN(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = ConvBN(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = _pool(x, 3, 1, 1, "avg")
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """x in [0,1], (B, 299, 299, 3) → (B, 2048) pool3 features."""

    @nn.compact
    def __call__(self, x):
        x = 2 * x - 1  # torchvision FID normalization
        x = ConvBN(32, (3, 3), (2, 2), name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = ConvBN(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), (2, 2))
        x = MixedA(32, name="Mixed_5b")(x)
        x = MixedA(64, name="Mixed_5c")(x)
        x = MixedA(64, name="Mixed_5d")(x)
        x = MixedB(name="Mixed_6a")(x)
        x = MixedC(128, name="Mixed_6b")(x)
        x = MixedC(160, name="Mixed_6c")(x)
        x = MixedC(160, name="Mixed_6d")(x)
        x = MixedC(192, name="Mixed_6e")(x)
        x = MixedD(name="Mixed_7a")(x)
        x = MixedE(name="Mixed_7b")(x)
        x = MixedE(name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # global avg pool → 2048


@lru_cache(maxsize=1)
def load_inception_params(path: str = ASSET_PATH):
    """Returns (variables, has_real_weights)."""
    model = InceptionV3Features()
    dummy = jnp.zeros((1, 299, 299, 3), jnp.float32)
    # jit: one compile instead of per-op remote round-trips on axon
    variables = jax.jit(model.init)(jax.random.PRNGKey(299), dummy)
    if not os.path.exists(path):
        return variables, False
    data = np.load(path)
    flat = dict(data)

    def fill(tree, prefix):
        out = {}
        for k, v in tree.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out[k] = fill(v, key)
            else:
                out[k] = jnp.asarray(flat[key]) if key in flat else v
        return out

    return {
        "params": fill(variables["params"], "params"),
        "batch_stats": fill(variables["batch_stats"], "batch_stats"),
    }, True


def inception_features(variables, x: jax.Array) -> jax.Array:
    return InceptionV3Features().apply(variables, x)
