"""DeepFashion split tool: copy images into train/test by .lst files.

Capability parity with reference script/generate_fashion_datasets.py: reads
{dataroot}/train.lst and test.lst, copies listed images from the flattened
DeepFashion dump into {dataroot}/train and {dataroot}/test, flattening the
directory structure into the id-style filenames the pair CSVs use.

Usage: python scripts/generate_fashion_datasets.py --dataroot ./dataset/fashion
"""

from __future__ import annotations

import argparse
import os
import shutil


def flatten_name(path: str) -> str:
    """img/WOMEN/Dresses/id_0000xxxx/01_1_front.jpg →
    fashionWOMENDressesid0000xxxx01_1_front.jpg (the reference's scheme)."""
    name = path.replace("img/", "fashion")
    name = name.replace("/", "")
    return name.replace("id_0", "id0")


def run(dataroot: str):
    for phase in ("train", "test"):
        out_dir = os.path.join(dataroot, phase)
        os.makedirs(out_dir, exist_ok=True)
        lst = os.path.join(dataroot, f"{phase}.lst")
        if not os.path.exists(lst):
            print(f"missing {lst}; skipping {phase}")
            continue
        n = 0
        with open(lst) as f:
            for line in f:
                rel = line.strip()
                if not rel.endswith(".jpg"):
                    continue
                src = os.path.join(dataroot, rel)
                if not os.path.exists(src):
                    print(f"missing image {src}")
                    continue
                shutil.copy(src, os.path.join(out_dir, flatten_name(rel)))
                n += 1
        print(f"{phase}: copied {n} images to {out_dir}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", type=str, required=True)
    args = ap.parse_args()
    run(args.dataroot)
