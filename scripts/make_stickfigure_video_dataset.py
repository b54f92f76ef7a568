"""Generate a synthetic *learnable* person-animation video dataset
(iPER/dance layout).

The pose-transfer learning proof (`scripts/make_stickfigure_dataset.py`)
covers the feed-forward heads; this generates the VIDEO analogue so the
recurrent animation heads can be proven to learn on hardware. Each
sequence is one identity (fixed limb colors / torso fill / background)
performing smooth motion: K keyposes sampled like the still dataset,
cosine-eased interpolation between them, rendered frame by frame. The
mapping (identity appearance, skeleton trajectory) -> frames is
deterministic, so "animate the reference appearance along the driving
skeleton sequence" has an exact, learnable answer.

Output follows the reference iPER/dance on-disk layout consumed by
DanceDataset (reference dance_dataset.py:70-96):

  root/train_256/train_A/<seq>/frame_%05d.jpg           video frames
  root/train_256/train_video2d/<seq>/frame_%05d.json    clean 17-joint
      Human3.6M-order skeletons ({"people":[{"pose_keypoints_2d":
      [x,y,c]*17}]})
  root/train_256/train_alphapose/<seq>/frame_%05d.json  OpenPose-18
      skeletons (the "noisy" pool used for the reference frame)

Usage:
  python scripts/make_stickfigure_video_dataset.py --root /tmp/stickdance \
      --sequences 24 --frames 36
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_stickfigure_dataset import (  # noqa: E402
    CANONICAL,
    render,
    sample_identity,
    sample_pose,
)

# Human3.6M-17 joints (openpose_utils.HUMAN36M_17 order) from OpenPose-18:
# direct index where a joint exists, tuples are midpoints/extrapolations.
_H36M_FROM_OP18 = [
    ("mid", 8, 11),   # 0 Hip = midpoint(RHip, LHip)
    8, 9, 10,         # 1-3 RHip RKnee RFoot
    11, 12, 13,       # 4-6 LHip LKnee LFoot
    ("spine",),       # 7 Spine = midpoint(Neck, Hip)
    1,                # 8 Thorax = Neck
    0,                # 9 Neck/Nose = Nose
    ("head",),        # 10 Head = Nose extrapolated above the neck
    5, 6, 7,          # 11-13 LShoulder LElbow LWrist
    2, 3, 4,          # 14-16 RShoulder RElbow RWrist
]


def openpose18_to_h36m17(kp18: np.ndarray) -> np.ndarray:
    """(18, 2) (y, x) OpenPose joints -> (17, 2) Human3.6M joints."""
    hip = 0.5 * (kp18[8] + kp18[11])
    out = np.zeros((17, 2), np.float32)
    for i, src in enumerate(_H36M_FROM_OP18):
        if src == ("spine",):
            out[i] = 0.5 * (kp18[1] + hip)
        elif src == ("head",):
            out[i] = kp18[0] + 0.5 * (kp18[0] - kp18[1])
        elif isinstance(src, tuple):
            out[i] = 0.5 * (kp18[src[1]] + kp18[src[2]])
        else:
            out[i] = kp18[src]
    return out


def write_pose_json(path: str, kp_yx: np.ndarray) -> None:
    """OpenPose-style JSON: pose_keypoints_2d is [x, y, conf] triples."""
    flat = []
    for y, x in kp_yx:
        flat += [float(x), float(y), 1.0]
    with open(path, "w") as f:
        json.dump({"people": [{"pose_keypoints_2d": flat}]}, f)


def sample_trajectory(rng, n_frames: int, n_keyposes: int, H: int, W: int):
    """Smooth (n_frames, 18, 2) trajectory: cosine-eased interpolation
    between sampled keyposes, centered for a W-wide frame."""
    x_off = np.array([0.0, (W - 176) / 2.0], np.float32)
    keys = np.stack(
        [sample_pose(rng, H, W - int(2 * x_off[1])) + x_off
         for _ in range(n_keyposes)]
    )
    frames = []
    seg = max(1, (n_frames - 1)) / max(1, (n_keyposes - 1))
    for t in range(n_frames):
        pos = min(t / seg, n_keyposes - 1 - 1e-6)
        k = int(pos)
        alpha = pos - k
        ease = 0.5 - 0.5 * np.cos(np.pi * alpha)  # C1-smooth at keyposes
        kp = (1 - ease) * keys[k] + ease * keys[min(k + 1, n_keyposes - 1)]
        frames.append(kp.astype(np.float32))
    return np.stack(frames)


def main():
    from PIL import Image

    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=str, required=True)
    ap.add_argument("--sequences", type=int, default=24,
                    help="number of identities / video sequences")
    ap.add_argument("--frames", type=int, default=36,
                    help="frames per sequence")
    ap.add_argument("--keyposes", type=int, default=5)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--quality", type=int, default=92)
    args = ap.parse_args()

    H = W = args.size
    base = os.path.join(args.root, "train_256")
    rng = np.random.RandomState(args.seed)
    for s in range(args.sequences):
        seq = f"seq_{s:03d}"
        d_img = os.path.join(base, "train_A", seq)
        d_clean = os.path.join(base, "train_video2d", seq)
        d_noise = os.path.join(base, "train_alphapose", seq)
        for d in (d_img, d_clean, d_noise):
            os.makedirs(d, exist_ok=True)
        ident = sample_identity(rng)
        traj = sample_trajectory(rng, args.frames, args.keyposes, H, W)
        for t in range(args.frames):
            kp = traj[t]
            img = render(ident, kp, H, W)
            Image.fromarray(img).save(
                os.path.join(d_img, f"frame_{t:05d}.jpg"),
                quality=args.quality,
            )
            write_pose_json(
                os.path.join(d_clean, f"frame_{t:05d}.json"),
                openpose18_to_h36m17(kp),
            )
            write_pose_json(os.path.join(d_noise, f"frame_{t:05d}.json"), kp)
    print(f"wrote {args.sequences} sequences x {args.frames} frames under "
          f"{base}")


if __name__ == "__main__":
    main()
