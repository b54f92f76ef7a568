"""Generate a synthetic *learnable* Human3.6M 2-D keypoint NPZ pair for the
keypoint (Motion Extraction Net) learning proof.

The real data (data_2d_h36m_gt.npz + detectron predictions) cannot be
downloaded here, so this writes the same VideoPose3D archive layout
(`positions_2d = {subject: {action: [per-camera (T, 17, 2) arrays]}}`,
reference human36m.py:197-215) with:

* gt: smooth 17-joint trajectories — a drifting body center plus per-joint
  sinusoidal limb sway (band-limited, exactly the structure a temporal
  convnet can learn to preserve);
* input: gt + iid Gaussian pixel noise + sparse large outliers (detector
  jitter + mis-detections — what the MEN denoises,
  reference keypoint_model.py:15-45).

Subjects S1/S5/S6/S7/S8 serve the train split and S9 the eval split
(KeypointDataset excludes S9/S11 at train, keypoint_data.py:69-70).

Usage:
  python scripts/make_synth_h36m_keypoints.py --out /tmp/synthkp \
      --frames 600 --noise 6.0
"""

from __future__ import annotations

import argparse
import os

import numpy as np

# rough standing H36M-17 skeleton, pixel offsets from the body center
# (order: hip, rhip, rknee, rfoot, lhip, lknee, lfoot, spine, thorax,
#  nose, head, lsho, lelb, lwri, rsho, relb, rwri)
BASE_17 = np.array([
    [0, 0], [-35, 5], [-40, 105], [-45, 205], [35, 5], [40, 105], [45, 205],
    [0, -70], [0, -140], [0, -175], [0, -205],
    [55, -130], [75, -60], [85, 10], [-55, -130], [-75, -60], [-85, 10],
], np.float32)

SUBJECTS = ["S1", "S5", "S6", "S7", "S8", "S9"]
ACTIONS = ["Walking 1", "Posing 1"]


def smooth_walk(rng, T, scale, smooth=30):
    """Band-limited random walk: cumulative noise convolved with a box."""
    steps = rng.randn(T + smooth, 2).astype(np.float32)
    walk = np.cumsum(steps, axis=0)
    kernel = np.ones(smooth, np.float32) / smooth
    out = np.stack([np.convolve(walk[:, i], kernel, "valid")
                    for i in range(2)], -1)[:T]
    out -= out.mean(0)
    return out / (np.abs(out).max() + 1e-6) * scale


def make_sequence(rng, T, res_w, res_h):
    center = smooth_walk(rng, T, scale=120.0) + [res_w * 0.5, res_h * 0.45]
    gt = np.empty((T, 17, 2), np.float32)
    t = np.arange(T, dtype=np.float32)
    for j in range(17):
        amp = 4.0 + 28.0 * (np.linalg.norm(BASE_17[j]) / 220.0)
        w = rng.uniform(0.02, 0.12, size=2)
        phase = rng.uniform(0, 2 * np.pi, size=2)
        sway = amp * np.stack(
            [np.sin(w[0] * t + phase[0]), np.sin(w[1] * t + phase[1])], -1)
        gt[:, j] = center + BASE_17[j] + sway
    return np.clip(gt, 0, [res_w - 1, res_h - 1])


def corrupt(rng, gt, noise_px, outlier_p, outlier_px):
    noisy = gt + rng.randn(*gt.shape).astype(np.float32) * noise_px
    mask = rng.rand(gt.shape[0], gt.shape[1]) < outlier_p
    jumps = rng.uniform(-outlier_px, outlier_px,
                        size=(int(mask.sum()), 2)).astype(np.float32)
    noisy[mask] += jumps
    return noisy.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--frames", type=int, default=600)
    ap.add_argument("--cameras", type=int, default=2)
    ap.add_argument("--noise", type=float, default=6.0,
                    help="gaussian pixel noise sigma")
    ap.add_argument("--outlier-p", type=float, default=0.03)
    ap.add_argument("--outlier-px", type=float, default=60.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    gt_all, in_all = {}, {}
    for subject in SUBJECTS:
        gt_all[subject], in_all[subject] = {}, {}
        for action in ACTIONS:
            gts, ins = [], []
            for _ in range(args.cameras):
                gt = make_sequence(rng, args.frames, 1000, 1002)
                gts.append(gt)
                ins.append(corrupt(rng, gt, args.noise, args.outlier_p,
                                   args.outlier_px))
            gt_all[subject][action] = gts
            in_all[subject][action] = ins

    os.makedirs(args.out, exist_ok=True)
    gt_path = os.path.join(args.out, "data_2d_h36m_gt.npz")
    in_path = os.path.join(args.out, "data_2d_h36m_synth_noisy.npz")
    np.savez_compressed(gt_path, positions_2d=gt_all)
    np.savez_compressed(in_path, positions_2d=in_all)
    n_seq = len(SUBJECTS) * len(ACTIONS) * args.cameras
    print(f"wrote {gt_path} + {in_path}: {n_seq} sequences x "
          f"{args.frames} frames (noise {args.noise}px, "
          f"outliers p={args.outlier_p} up to {args.outlier_px}px)")


if __name__ == "__main__":
    main()
