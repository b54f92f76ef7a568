"""Generate a synthetic *learnable* pose-transfer dataset (DeepFashion layout).

Real DeepFashion can't be downloaded in this environment, but proving the
framework LEARNS needs data with actual structure: images here are
deterministic renderings of (identity appearance, pose) — per-identity limb
colors / torso fill / background over an OpenPose-18 skeleton — so
"transfer the appearance of P1 into the pose of BP2" has an exact,
learnable answer (P2), unlike noise images. The output follows the
reference DeepFashion layout (data/fashion_dataset.py: train/ jpgs +
fasion-pairs-train.csv + ':'-separated fasion-annotation-train.csv), so the
real FashionDataset + multiprocess loader path is exercised end-to-end.

Usage:
  python scripts/make_stickfigure_dataset.py --root /tmp/stickfigure \
      --identities 40 --poses 10 --pairs 2400
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# OpenPose-18 joint order (util/pose_utils.py:14-24); canonical standing
# pose in a 256(h)x176(w) frame, (y, x)
CANONICAL = np.array([
    [60, 88],    # 0 nose
    [82, 88],    # 1 neck
    [82, 64],    # 2 r shoulder
    [112, 56],   # 3 r elbow
    [142, 52],   # 4 r wrist
    [82, 112],   # 5 l shoulder
    [112, 120],  # 6 l elbow
    [142, 124],  # 7 l wrist
    [152, 72],   # 8 r hip
    [196, 70],   # 9 r knee
    [238, 68],   # 10 r ankle
    [152, 104],  # 11 l hip
    [196, 106],  # 12 l knee
    [238, 108],  # 13 l ankle
    [52, 80],    # 14 r eye
    [52, 96],    # 15 l eye
    [58, 70],    # 16 r ear
    [58, 106],   # 17 l ear
], np.float32)

LIMBS = [
    (0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (6, 7),
    (1, 8), (8, 9), (9, 10), (1, 11), (11, 12), (12, 13),
    (0, 14), (0, 15), (14, 16), (15, 17),
]


def sample_pose(rng, H, W):
    """Canonical skeleton + articulation jitter + global similarity."""
    kp = CANONICAL.copy()
    kp += rng.randn(18, 2).astype(np.float32) * 5.0
    # articulate arms/legs a bit more (distal joints move most)
    for j in (3, 4, 6, 7, 9, 10, 12, 13):
        kp[j] += rng.randn(2).astype(np.float32) * 9.0
    ang = np.deg2rad(rng.uniform(-12, 12))
    s = rng.uniform(0.75, 1.05)
    c0 = kp.mean(0)
    R = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]],
                 np.float32)
    kp = (kp - c0) @ R.T * s + c0
    kp += np.array([rng.uniform(-14, 14), rng.uniform(-18, 18)], np.float32)
    kp[:, 0] = np.clip(kp[:, 0], 2, H - 3)
    kp[:, 1] = np.clip(kp[:, 1], 2, W - 3)
    return kp


def sample_identity(rng):
    return {
        "bg": rng.randint(0, 90, 3),
        "torso": rng.randint(60, 255, 3),
        "head": rng.randint(60, 255, 3),
        "limb_colors": rng.randint(50, 255, (len(LIMBS), 3)),
        "thickness": int(rng.randint(4, 8)),
        "radius": int(rng.randint(3, 7)),
        "joint_color": rng.randint(120, 255, 3),
    }


def render(identity, kp, H, W):
    import cv2

    img = np.empty((H, W, 3), np.uint8)
    img[:] = identity["bg"]
    pts = kp[:, ::-1].astype(np.int32)  # (x, y) for cv2
    torso = np.stack([pts[2], pts[5], pts[11], pts[8]])
    cv2.fillConvexPoly(img, torso, identity["torso"].tolist())
    for li, (a, b) in enumerate(LIMBS):
        cv2.line(img, tuple(pts[a]), tuple(pts[b]),
                 identity["limb_colors"][li].tolist(),
                 identity["thickness"], cv2.LINE_AA)
    head_r = max(6, int(np.linalg.norm(pts[0] - pts[1]) * 0.55))
    cv2.circle(img, tuple(pts[0]), head_r, identity["head"].tolist(), -1,
               cv2.LINE_AA)
    for j in range(18):
        cv2.circle(img, tuple(pts[j]), identity["radius"],
                   identity["joint_color"].tolist(), -1, cv2.LINE_AA)
    return img


def main():
    import pandas as pd
    from PIL import Image

    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=str, required=True)
    ap.add_argument("--identities", type=int, default=40)
    ap.add_argument("--poses", type=int, default=10,
                    help="images per identity")
    ap.add_argument("--pairs", type=int, default=2400,
                    help="training pairs (same identity, different pose)")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--width", type=int, default=176)
    ap.add_argument("--phase", type=str, default="train")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    H, W = args.size, args.width
    rng = np.random.RandomState(args.seed)
    img_dir = os.path.join(args.root, args.phase)
    os.makedirs(img_dir, exist_ok=True)

    names, kps = [], []
    for i in range(args.identities):
        ident = sample_identity(rng)
        for p in range(args.poses):
            kp = sample_pose(rng, H, W)
            name = f"id{i:03d}_pose{p:02d}.jpg"
            Image.fromarray(render(ident, kp, H, W)).save(
                os.path.join(img_dir, name), quality=95)
            names.append(name)
            kps.append(kp)

    per_id = args.poses
    frm, to = [], []
    for _ in range(args.pairs):
        i = rng.randint(args.identities)
        a, b = rng.choice(per_id, size=2, replace=False)
        frm.append(names[i * per_id + a])
        to.append(names[i * per_id + b])
    pd.DataFrame({"from": frm, "to": to}).to_csv(
        os.path.join(args.root, f"fasion-pairs-{args.phase}.csv"),
        index=False)
    ann = pd.DataFrame({
        "name": names,
        "keypoints_y": [str([int(v) for v in k[:, 0]]) for k in kps],
        "keypoints_x": [str([int(v) for v in k[:, 1]]) for k in kps],
    })
    ann.to_csv(os.path.join(args.root,
                            f"fasion-annotation-{args.phase}.csv"),
               sep=":", index=False)
    print(f"wrote {len(names)} images, {args.pairs} pairs to {args.root}")


if __name__ == "__main__":
    main()
