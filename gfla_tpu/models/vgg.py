"""VGG19 feature extractor (flax, NHWC) for perceptual losses.

Capability parity with the reference's frozen torchvision VGG19 slice
provider (model/networks/external_function.py:323-444): returns the full
dict of relu1_1 … relu5_4 activations. Faithful details:

* Inputs are consumed exactly as given (the reference feeds [-1,1] images
  straight into torchvision VGG19 without ImageNet normalization).
* The reference has a slicing bug (external_function.py:363-367) that
  routes conv3_3 into its `relu3_2` and leaves `relu3_3` empty; no live
  loss consumes those taps, so we implement the standard architecture.

Weights: loaded from `assets/vgg19_features.npz` when present (produced by
scripts/convert_vgg_weights.py from a torchvision checkpoint). Without the
asset, deterministic He-normal weights (fixed seed) are used so training
runs end-to-end; quality parity requires the real weights.
"""

from __future__ import annotations

import os
from functools import lru_cache
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# (name, out_channels); 'M' = maxpool
_CFG = [
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("conv3_4", 256), "M",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("conv4_4", 512), "M",
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), ("conv5_4", 512),
]

ASSET_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "assets", "vgg19_features.npz",
)


class VGG19(nn.Module):
    """Feature pyramid: __call__(x NHWC) -> {relu1_1, ..., relu5_4}."""

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        feats: Dict[str, jax.Array] = {}
        for item in _CFG:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            name, ch = item
            x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), name=name)(x)
            x = jax.nn.relu(x)
            feats["relu" + name[4:]] = x
        return feats


@lru_cache(maxsize=1)
def load_vgg19_params(path: str = ASSET_PATH):
    """Load (or deterministically synthesize) frozen VGG19 params.

    Returns a flax params dict for `VGG19`. npz keys: '{conv}_kernel'
    (kh, kw, cin, cout) and '{conv}_bias' (cout,).
    """
    if os.path.exists(path):
        data = np.load(path)
        params = {}
        for item in _CFG:
            if item == "M":
                continue
            name, _ = item
            params[name] = {
                "kernel": jnp.asarray(data[f"{name}_kernel"]),
                "bias": jnp.asarray(data[f"{name}_bias"]),
            }
        return {"params": params}
    # deterministic fallback (documented: quality parity needs real weights);
    # loud one-time banner so no training run silently optimizes against a
    # random VGG (lru_cache makes this print once per process)
    import sys

    print("=" * 70, file=sys.stderr)
    print("WARNING: assets/vgg19_features.npz missing — perceptual losses "
          "use a\nDETERMINISTIC RANDOM VGG19. Training runs end-to-end but "
          "quality is NOT\ncomparable to the reference. Run "
          "scripts/convert_vgg_weights.py once.", file=sys.stderr)
    print("=" * 70, file=sys.stderr)
    model = VGG19()
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    # jit: one compile instead of per-op remote round-trips on axon
    return jax.jit(model.init)(jax.random.PRNGKey(190219), dummy)


def vgg19_features(params, x: jax.Array) -> Dict[str, jax.Array]:
    """Functional feature extraction with frozen params (no grads into VGG).
    Runs in the params' dtype (bf16 when the task uses mixed precision)."""
    leaves = jax.tree_util.tree_leaves(params)
    if leaves:
        x = x.astype(leaves[0].dtype)
    return VGG19().apply(jax.lax.stop_gradient(params), x)
