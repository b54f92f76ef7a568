"""Convert a reference GFLA generator checkpoint (.pth) → orbax params.

Usage:
  python scripts/convert_torch_checkpoint.py --pth latest_net_G.pth \
      --out ./result/exp [--net pose|face|dance|shapenet] \
      [--layers 3] [--attn_layer 2,3]

Writes an orbax checkpoint whose params_g subtree can be loaded by
gfla_tpu.train.checkpoint.load_checkpoint's tolerant merge. Every converter
walk is forward-parity-tested against a pure-torch oracle in
tests/test_torch_parity.py (reference module trees:
model/networks/generator.py).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", type=str, required=True)
    ap.add_argument("--out", type=str, required=True,
                    help="experiment dir to write ckpt_0 into")
    ap.add_argument("--net", type=str, default="pose",
                    choices=["pose", "face", "dance", "shapenet", "keypoint"])
    ap.add_argument("--layers", type=int, default=None,
                    help="encoder/conv layer count; defaults per net "
                    "(keypoint: 4 per the reference KPInput2DGenerator, "
                    "others: 3)")
    ap.add_argument("--attn_layer", type=str, default="2,3")
    args = ap.parse_args()
    if args.layers is None:
        args.layers = 4 if args.net == "keypoint" else 3

    import torch

    from gfla_tpu import convert

    converters = {
        "pose": convert.convert_pose_generator,
        "face": convert.convert_face_generator,
        "dance": convert.convert_dance_generator,
        "shapenet": convert.convert_shapenet_generator,
        "keypoint": lambda sd, layers, attn_layer: convert.convert_kp_generator(sd, layers=layers),
    }

    sd = torch.load(args.pth, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    attn = tuple(int(a) for a in args.attn_layer.split(","))
    params = converters[args.net](sd, layers=args.layers, attn_layer=attn)

    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(args.out, "ckpt_0"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params_g": params}, force=True)
    ckptr.wait_until_finished()  # save is async; block before exiting
    with open(os.path.join(args.out, "latest"), "w") as f:
        f.write("0")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
