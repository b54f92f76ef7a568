"""Convert a torchvision InceptionV3 checkpoint → assets/inception_v3.npz.

One-time offline tool (needs torchvision or a raw state_dict .pth from
torchvision.models.inception_v3). Flattens into the flax parameter paths of
gfla_tpu.metrics.inception.InceptionV3Features:
  params/<Module>/<branch>/conv/kernel       (kh, kw, cin, cout)
  params/<Module>/<branch>/bn/bias
  batch_stats/<Module>/<branch>/bn/mean|var

Our ConvBN uses inference batch norm (eps=1e-3) with learned scale+bias;
the torchvision BN gamma/beta/running stats map 1:1 onto bn/scale, bn/bias
and batch_stats mean/var. Validated end-to-end by
tests/test_metric_parity.py against a pure-torch oracle.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "assets", "inception_v3.npz")

# torchvision module path → our (block, branch) naming is identical except
# the stem convs which are top-level.
_TOP = ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3", "Conv2d_3b_1x1",
        "Conv2d_4a_3x3"]
_BLOCKS = ["Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
           "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
           "Mixed_7c"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--state_dict", type=str, default=None)
    ap.add_argument("--out", type=str, default=OUT)
    args = ap.parse_args()

    import torch

    if args.state_dict:
        sd = torch.load(args.state_dict, map_location="cpu")
    else:
        try:
            from torchvision import models

            sd = models.inception_v3(pretrained=True).state_dict()
        except Exception as e:
            print(f"torchvision unavailable ({e}); pass --state_dict",
                  file=sys.stderr)
            sys.exit(1)

    out = {}
    convs = {}
    for key in sd:
        if not key.endswith("conv.weight"):
            continue
        base = key[: -len(".conv.weight")]  # e.g. Mixed_5b.branch1x1
        convs[base] = True

    for base in convs:
        w = sd[f"{base}.conv.weight"].numpy()          # (out, in, kh, kw)
        path = "/".join(base.split("."))
        out[f"params/{path}/conv/kernel"] = np.transpose(w, (2, 3, 1, 0))
        out[f"params/{path}/bn/scale"] = sd[f"{base}.bn.weight"].numpy()
        out[f"params/{path}/bn/bias"] = sd[f"{base}.bn.bias"].numpy()
        out[f"batch_stats/{path}/bn/mean"] = \
            sd[f"{base}.bn.running_mean"].numpy()
        out[f"batch_stats/{path}/bn/var"] = \
            sd[f"{base}.bn.running_var"].numpy()

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez(args.out, **out)
    print(f"wrote {args.out} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
