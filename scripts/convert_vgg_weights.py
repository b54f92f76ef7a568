"""Convert torchvision VGG19 feature weights → assets/vgg19_features.npz.

One-time offline tool (needs torchvision or a raw vgg19 state_dict .pth).
Layout conversion: torch conv weight (out, in, kh, kw) → NHWC flax kernel
(kh, kw, in, out).

Usage:
  python scripts/convert_vgg_weights.py [--state_dict path/to/vgg19.pth]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# conv layer order of torchvision vgg19.features (indices of Conv2d)
_TORCH_IDX = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
_NAMES = [
    "conv1_1", "conv1_2", "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3", "conv3_4",
    "conv4_1", "conv4_2", "conv4_3", "conv4_4",
    "conv5_1", "conv5_2", "conv5_3", "conv5_4",
]

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "assets", "vgg19_features.npz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--state_dict", type=str, default=None,
                    help=".pth with torchvision vgg19 (full or .features) weights")
    ap.add_argument("--out", type=str, default=OUT)
    args = ap.parse_args()

    import torch

    if args.state_dict:
        sd = torch.load(args.state_dict, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    else:
        try:
            from torchvision import models

            sd = models.vgg19(pretrained=True).state_dict()
        except Exception as e:
            print(f"torchvision unavailable ({e}); pass --state_dict", file=sys.stderr)
            sys.exit(1)

    prefix = "features." if any(k.startswith("features.") for k in sd) else ""
    out = {}
    for name, idx in zip(_NAMES, _TORCH_IDX):
        w = sd[f"{prefix}{idx}.weight"].numpy()  # (out, in, kh, kw)
        b = sd[f"{prefix}{idx}.bias"].numpy()
        out[f"{name}_kernel"] = np.transpose(w, (2, 3, 1, 0))
        out[f"{name}_bias"] = b
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez(args.out, **out)
    print(f"wrote {args.out} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
