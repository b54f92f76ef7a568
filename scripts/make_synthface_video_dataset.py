"""Generate a synthetic *learnable* face-animation video dataset
(FaceForensics layout).

Completes the learning-proof family: stick figures cover the pose /
dance heads; this covers the FACE head (split-flow FaceFlowNet +
frame-difference D_V). Each sequence is one identity (skin / lip / iris /
hair / background colors) whose cartoon face is rendered DETERMINISTICALLY
from a 68-point iBUG landmark track: K keyposes (head translation /
rotation / scale, mouth openness, blink, brow raise) with cosine-eased
interpolation between them. Because landmarks -> image is a deterministic
function given the identity, "animate the reference face along the
driving landmark track" has an exact, learnable answer.

Output follows the reference FaceForensics on-disk layout consumed by
FaceDataset (reference face_dataset.py:38-57):

  root/train_data/<seq>/frame_%05d.jpg       256x256 frames
  root/train_keypoints/<seq>/frame_%05d.txt  68x2 comma-separated landmarks
  (plus test_data/ test_keypoints/ for --test-sequences)

Usage:
  python scripts/make_synthface_video_dataset.py --root /tmp/synthface \
      --sequences 24 --frames 36
"""

from __future__ import annotations

import argparse
import os

import cv2
import numpy as np

H = W = 256


# ---------------------------------------------------------------- landmarks

def canonical_landmarks(mouth_open: float, blink: float,
                        brow_raise: float) -> np.ndarray:
    """68-point iBUG face in image coords (y down), centered at (128, 140).

    Expression params: mouth_open/blink in [0, 1], brow_raise in px.
    """
    cx, cy = 128.0, 140.0
    pts = np.zeros((68, 2), np.float64)

    # jaw 0-16: half-ellipse, point 0 at the left temple (eye level),
    # point 8 at the chin, point 16 at the right temple
    rx, ry = 70.0, 95.0
    for i in range(17):
        a = np.pi - np.pi * i / 16.0  # pi -> 0 through pi/2 (chin, y down)
        pts[i] = (cx + rx * np.cos(a), cy + ry * np.sin(a) * 0.98)
    pts[0, 1] = pts[16, 1] = cy - 5.0  # temples slightly above center line

    # brows 17-21 (left), 22-26 (right): 5-pt arcs above the eyes
    for k, sign in ((17, -1.0), (22, +1.0)):
        x0 = cx + sign * 14.0
        x1 = cx + sign * 52.0
        for j in range(5):
            t = j / 4.0
            x = x0 + (x1 - x0) * (t if sign < 0 else 1.0 - t)
            if sign > 0:  # keep left-to-right x order within each brow
                x = x0 + (x1 - x0) * t
            arch = 5.0 * np.sin(np.pi * t)
            pts[k + j] = (x, cy - 48.0 - arch - brow_raise)
        if sign < 0:  # left brow runs outer->inner in iBUG (x increasing)
            pts[k:k + 5] = pts[k:k + 5][np.argsort(pts[k:k + 5, 0])]

    # nose bridge 27-30 (top -> base), nostril line 31-35 (left -> right)
    for j in range(4):
        pts[27 + j] = (cx, cy - 25.0 + j * 13.0)
    for j in range(5):
        pts[31 + j] = (cx - 12.0 + j * 6.0, cy + 20.0 + (3.0 if j == 2 else 0.0))

    # eyes 36-41 (left), 42-47 (right): 6-pt ellipses; blink closes ry
    ery = 6.5 * (1.0 - 0.92 * blink) + 0.5
    for k, ex in ((36, cx - 32.0), (42, cx + 32.0)):
        ey, erx = cy - 22.0, 14.0
        ang = [np.pi, 2 * np.pi / 3, np.pi / 3, 0.0, -np.pi / 3, -2 * np.pi / 3]
        for j, a in enumerate(ang):
            pts[k + j] = (ex + erx * np.cos(a), ey - ery * np.sin(a))

    # mouth: outer 48-59 (12 pts), inner 60-67 (8 pts)
    mx, my = cx, cy + 45.0
    orx, ory = 24.0, 8.0 + 13.0 * mouth_open
    for j in range(12):
        a = np.pi + 2 * np.pi * j / 12.0  # 48 = left corner
        pts[48 + j] = (mx + orx * np.cos(a), my - ory * np.sin(a) *
                       (0.8 if np.sin(a) > 0 else 1.0))
    irx, iry = 17.0, 2.0 + 11.0 * mouth_open
    inner_a = ([np.pi, 3 * np.pi / 4, np.pi / 2, np.pi / 4, 0.0]  # 60-64 upper
               + [-np.pi / 4, -np.pi / 2, -3 * np.pi / 4])        # 65-67 lower
    for j, a in enumerate(inner_a):
        pts[60 + j] = (mx + irx * np.cos(a), my - iry * np.sin(a))
    return pts


def transform(pts: np.ndarray, dx: float, dy: float, scale: float,
              roll_deg: float) -> np.ndarray:
    """Similarity transform about the face center (128, 140)."""
    c = np.array([128.0, 140.0])
    a = np.deg2rad(roll_deg)
    R = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
    out = (pts - c) @ R.T * scale + c + np.array([dx, dy])
    return np.clip(out, 2.0, 253.0)


# ---------------------------------------------------------------- identity

def sample_identity(rng: np.random.RandomState) -> dict:
    skin = np.array([rng.randint(150, 235), rng.randint(120, 190),
                     rng.randint(95, 160)], np.int32)  # RGB warm tones
    return {
        "bg": rng.randint(30, 225, size=3),
        "skin": skin,
        "lip": np.array([rng.randint(130, 220), rng.randint(30, 90),
                         rng.randint(40, 110)]),
        "iris": rng.randint(20, 200, size=3),
        "hair": rng.randint(10, 120, size=3),
        "hair_drop": rng.uniform(0.25, 0.6),  # how far the cap reaches
    }


def _poly(img, pts_f, color, thickness=None):
    p = [np.round(pts_f).astype(np.int32)]
    c = tuple(int(v) for v in color)
    if thickness is None:
        cv2.fillPoly(img, p, c)
    else:
        cv2.polylines(img, p, False, c, thickness, cv2.LINE_AA)


def render(identity: dict, kp: np.ndarray) -> np.ndarray:
    """Deterministic cartoon render of the 68 landmarks (RGB uint8)."""
    img = np.empty((H, W, 3), np.uint8)
    img[:] = identity["bg"]

    jaw = kp[:17]
    # hair cap: scaled-up mirror of the jaw above the temple baseline
    base_y = (jaw[0, 1] + jaw[16, 1]) / 2.0
    cap = jaw[1:-1].copy()
    cap[:, 1] = base_y - (cap[:, 1] - base_y) * identity["hair_drop"] - 34.0
    hair_poly = np.vstack([jaw[:1] + [0, 6], cap[::-1], jaw[-1:] + [0, 6]])
    _poly(img, hair_poly, identity["hair"])

    # face region: jaw + mirrored forehead (2/3 mirror like the dataset's
    # edge construction, so the skin boundary tracks the landmarks)
    fore = jaw[1:-1].copy()
    fore[:, 1] = base_y - (fore[:, 1] - base_y) * 2.0 / 3.0
    _poly(img, np.vstack([jaw, fore[::-1]]), identity["skin"])

    # brows
    darker = identity["hair"] * 0.7
    _poly(img, kp[17:22], darker, thickness=4)
    _poly(img, kp[22:27], darker, thickness=4)
    # nose
    nose_c = identity["skin"] * 0.75
    _poly(img, kp[27:31], nose_c, thickness=3)
    _poly(img, kp[31:36], nose_c, thickness=3)
    # eyes: white sclera + iris + pupil, clipped by the (blinkable) lid poly
    for k, ctr in ((36, kp[36:42].mean(0)), (42, kp[42:48].mean(0))):
        lid = kp[k:k + 6]
        mask = np.zeros((H, W), np.uint8)
        _poly(mask, lid, (255,))
        eye = img.copy()
        cv2.circle(eye, tuple(np.round(ctr).astype(int)), 11, (255, 255, 255), -1)
        cv2.circle(eye, tuple(np.round(ctr).astype(int)), 5,
                   tuple(int(v) for v in identity["iris"]), -1)
        cv2.circle(eye, tuple(np.round(ctr).astype(int)), 2, (10, 10, 10), -1)
        img[mask > 0] = eye[mask > 0]
    # mouth: outer lips filled, inner cavity dark
    _poly(img, kp[48:60], identity["lip"])
    _poly(img, kp[60:68], (40, 15, 20))
    return img


# ---------------------------------------------------------------- sequences

def sample_keypose(rng: np.random.RandomState) -> dict:
    return {
        "dx": rng.uniform(-18, 18), "dy": rng.uniform(-14, 14),
        "scale": rng.uniform(0.85, 1.1), "roll": rng.uniform(-12, 12),
        "mouth": rng.uniform(0.0, 1.0),
        "blink": float(rng.rand() < 0.25),
        "brow": rng.uniform(-3, 6),
    }


def ease(a: dict, b: dict, t: float) -> dict:
    w = 0.5 - 0.5 * np.cos(np.pi * t)  # cosine ease like the stick videos
    return {k: a[k] * (1 - w) + b[k] * w for k in a}


def write_sequence(root: str, phase: str, name: str, frames: int,
                   rng: np.random.RandomState) -> None:
    ident = sample_identity(rng)
    n_key = max(2, frames // 9)
    keys = [sample_keypose(rng) for _ in range(n_key + 1)]
    img_dir = os.path.join(root, f"{phase}_data", name)
    kp_dir = os.path.join(root, f"{phase}_keypoints", name)
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(kp_dir, exist_ok=True)
    per = max(1, frames // n_key)
    for f in range(frames):
        seg = min(f // per, n_key - 1)
        p = ease(keys[seg], keys[seg + 1], (f - seg * per) / per)
        kp = canonical_landmarks(p["mouth"], p["blink"], p["brow"])
        kp = transform(kp, p["dx"], p["dy"], p["scale"], p["roll"])
        img = render(ident, kp)
        cv2.imwrite(os.path.join(img_dir, f"frame_{f:05d}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        np.savetxt(os.path.join(kp_dir, f"frame_{f:05d}.txt"), kp,
                   fmt="%.2f", delimiter=",")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--sequences", type=int, default=24)
    ap.add_argument("--test-sequences", type=int, default=2)
    ap.add_argument("--frames", type=int, default=36)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    for s in range(args.sequences):
        write_sequence(args.root, "train", f"seq{s:03d}", args.frames, rng)
    for s in range(args.test_sequences):
        write_sequence(args.root, "test", f"seq{s:03d}", args.frames, rng)
    print(f"wrote {args.sequences} train + {args.test_sequences} test "
          f"sequences x {args.frames} frames under {args.root}")


if __name__ == "__main__":
    main()
