"""Convert LPIPS (net-lin, alex) weights → assets/lpips_alex.npz.

Needs a checkout of richzhang/PerceptualSimilarity weights (alex.pth linear
weights + torchvision alexnet features) or a combined state_dict. Layout:
  conv{i}_kernel (kh, kw, cin, cout), conv{i}_bias, lin{i} (c,)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "assets", "lpips_alex.npz")

# torchvision alexnet.features conv indices
_ALEX_IDX = [0, 3, 6, 8, 10]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alexnet", type=str, default=None,
                    help="torchvision alexnet state_dict .pth")
    ap.add_argument("--linear", type=str, default=None,
                    help="LPIPS alex.pth linear-layer state_dict")
    ap.add_argument("--out", type=str, default=OUT)
    args = ap.parse_args()

    import torch

    if args.alexnet:
        alex_sd = torch.load(args.alexnet, map_location="cpu")
    else:
        try:
            from torchvision import models

            alex_sd = models.alexnet(pretrained=True).state_dict()
        except Exception as e:
            print(f"torchvision unavailable ({e}); pass --alexnet",
                  file=sys.stderr)
            sys.exit(1)
    if not args.linear:
        print("pass --linear (LPIPS alex.pth)", file=sys.stderr)
        sys.exit(1)
    lin_sd = torch.load(args.linear, map_location="cpu")

    out = {}
    for i, idx in enumerate(_ALEX_IDX):
        w = alex_sd[f"features.{idx}.weight"].numpy()
        b = alex_sd[f"features.{idx}.bias"].numpy()
        out[f"conv{i}_kernel"] = np.transpose(w, (2, 3, 1, 0))
        out[f"conv{i}_bias"] = b
        lw = lin_sd[f"lin{i}.model.1.weight"].numpy()  # (1, c, 1, 1)
        out[f"lin{i}"] = lw.reshape(-1)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez(args.out, **out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
