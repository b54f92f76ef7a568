"""LPIPS (net-lin / AlexNet) perceptual distance.

Capability parity with reference script/metrics.py:443-567 (the external
PerceptualSimilarity net-lin alex model): AlexNet conv features at 5 taps,
channel-normalized, squared difference, learned per-channel linear weights,
spatial average, summed over taps. Also the masked variant used for
Market-1501 (mask-LPIPS, script/metrics.py:509-567) where the body mask
from pose keypoints weights the spatial map.

Weights load from assets/lpips_alex.npz (scripts/convert_lpips_weights.py);
deterministic fallback otherwise (values then not comparable — flagged).

Input images are in [-1, 1], matching the reference pipeline.
"""

from __future__ import annotations

import os
import warnings
from functools import lru_cache
from typing import List, Optional

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
    "lpips_alex.npz",
)

# ImageNet scaling used by LPIPS (applied to [-1,1] inputs)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_ALEX_CFG = [  # (features, kernel, stride, padding)
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]


class AlexNetFeatures(nn.Module):
    @nn.compact
    def __call__(self, x):
        taps = []
        for i, (f, k, s, p) in enumerate(_ALEX_CFG):
            x = nn.Conv(f, (k, k), strides=(s, s),
                        padding=((p, p), (p, p)), name=f"conv{i}")(x)
            x = jax.nn.relu(x)
            taps.append(x)
            if i in (0, 1):
                x = nn.max_pool(x, (3, 3), (2, 2))
            elif i == 4:
                pass
        return taps


@lru_cache(maxsize=1)
def load_lpips_params(path: str = ASSET_PATH):
    model = AlexNetFeatures()
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    # jit: one compile instead of per-op remote round-trips on axon
    variables = jax.jit(model.init)(jax.random.PRNGKey(64), dummy)
    if not os.path.exists(path):
        lins = [
            np.abs(np.random.RandomState(7 + i).randn(c).astype(np.float32))
            / np.sqrt(c)
            for i, c in enumerate([64, 192, 384, 256, 256])
        ]
        return variables, [jnp.asarray(l) for l in lins], False
    data = np.load(path)
    params = dict(variables["params"])
    for i in range(5):
        params[f"conv{i}"] = {
            "kernel": jnp.asarray(data[f"conv{i}_kernel"]),
            "bias": jnp.asarray(data[f"conv{i}_bias"]),
        }
    lins = [jnp.asarray(data[f"lin{i}"]) for i in range(5)]
    return {"params": params}, lins, True


def _norm(x, eps=1e-10):
    return x / (jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True)) + eps)


def lpips_distance(variables, lins, x: jax.Array, y: jax.Array,
                   mask: Optional[jax.Array] = None) -> jax.Array:
    """x, y: (B, H, W, 3) in [-1, 1] → (B,) distances."""
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    xin = (x - shift) / scale
    yin = (y - shift) / scale
    fx = AlexNetFeatures().apply(variables, xin)
    fy = AlexNetFeatures().apply(variables, yin)
    total = 0.0
    for tap_x, tap_y, lin in zip(fx, fy, lins):
        d = (_norm(tap_x) - _norm(tap_y)) ** 2
        val = jnp.einsum("bhwc,c->bhw", d, lin)
        if mask is not None:
            m = jax.image.resize(
                mask, (mask.shape[0],) + val.shape[1:3] + (1,), "bilinear"
            )[..., 0]
            val = jnp.sum(val * m, axis=(1, 2)) / (
                jnp.sum(m, axis=(1, 2)) + 1e-8
            )
        else:
            val = jnp.mean(val, axis=(1, 2))
        total = total + val
    return total


class LPIPS:
    def __init__(self, batch_size: int = 32, allow_fallback: bool = False):
        self.batch_size = batch_size
        self.variables, self.lins, self.has_weights = load_lpips_params()
        self.fallback = not self.has_weights
        if self.fallback:
            msg = (
                "lpips_alex.npz asset missing — LPIPS would use "
                "deterministic random features; values not comparable to "
                "published ones."
            )
            if not allow_fallback:
                raise RuntimeError(
                    msg + " Pass --allow_fallback_weights (CLI) or "
                    "allow_fallback=True to proceed anyway; outputs will "
                    "be stamped FALLBACK-WEIGHTS."
                )
            warnings.warn(msg)
        self._dist = jax.jit(
            lambda a, b: lpips_distance(self.variables, self.lins, a, b)
        )
        self._dist_masked = jax.jit(
            lambda a, b, m: lpips_distance(self.variables, self.lins, a, b, m)
        )

    def _load(self, paths: List[str]) -> np.ndarray:
        from PIL import Image

        out = []
        for p in paths:
            img = np.asarray(Image.open(p).convert("RGB"), np.float32)
            out.append(img / 127.5 - 1.0)
        return np.stack(out)

    def calculate_from_disk(self, generated_path, gt_path,
                            masks: Optional[List[np.ndarray]] = None,
                            sort: bool = True, verbose: bool = True) -> float:
        from gfla_tpu.metrics.reconstruction import get_image_list

        gen = get_image_list(generated_path)
        gt = get_image_list(gt_path)
        if sort:
            gen, gt = sorted(gen), sorted(gt)
        dists = []
        bs = self.batch_size
        for s in range(0, len(gen), bs):
            a = jnp.asarray(self._load(gen[s : s + bs]))
            b = jnp.asarray(self._load(gt[s : s + bs]))
            if masks is not None:
                m = jnp.asarray(
                    np.stack(masks[s : s + bs]).astype(np.float32)
                )[..., None]
                d = lpips_distance(self.variables, self.lins, a, b, m)
            else:
                d = lpips_distance(self.variables, self.lins, a, b)
            dists.append(np.asarray(d))
        value = float(np.mean(np.concatenate(dists)))
        if verbose:
            print(f"LPIPS: {value:.4f}")
        return value
