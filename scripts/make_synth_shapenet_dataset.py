"""Generate a synthetic *learnable* novel-view dataset (ShapeNet HDF5 layout).

Real ShapeNet renders can't be downloaded in this environment, but proving
the view-synthesis head LEARNS needs data where "re-render the source
object at the target viewpoint" has an exact answer. Each object here is a
cartoon car assembled from 3D boxes (body + cabin + four wheels) with
per-identity colors and proportions, rendered with an orthographic camera,
Lambert-shaded faces, and a painter's-algorithm fill — a deterministic
function of (identity, azimuth, elevation), so the target view is exactly
recoverable from the source image + target pose label.

Output follows the reference ShapeNet HDF5 layout consumed by
ShapeNetDataset (reference data/shapenet_dataset.py:44-76):

  root/data_car.hdf5              groups "<base>_<az/10>_<e>" with
                                  datasets image (H, W, 3 uint8) and
                                  pose (2,) = (azimuth/10, e*10)
  root/id_car_train.txt           one view id per line (train objects)
  root/id_car_test.txt            view ids of the test objects
  root/name_car_test.txt          test object base names (for the
                                  18-view azimuth sweeps)

Azimuths are range(0, 360, 20) (ang_skip default), elevation slots
e ∈ {0, 1, 2} map to camera tilts {15°, 25°, 35°}; the stored pose obeys
the reference encoding h = pose[0]//2 ∈ [0, 18), v = pose[1]//10 ∈ [0, 3)
(reference model/shapenet_model.py:116-121).

Usage:
  python scripts/make_synth_shapenet_dataset.py --root /tmp/synthshapenet \
      --train-objects 30 --test-objects 4
"""

from __future__ import annotations

import argparse
import os

import cv2
import numpy as np

AZIMUTHS = list(range(0, 360, 20))
ELEV_DEG = {0: 15.0, 1: 25.0, 2: 35.0}


def _box(cx, cy, cz, lx, ly, lz):
    """8 corners of an axis-aligned box centered at (cx, cy, cz)."""
    s = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float64,
    )
    return np.array([cx, cy, cz]) + s * np.array([lx, ly, lz]) / 2.0


# Faces of the corner ordering above (outward normals +x/-x/+y/-y/+z/-z).
_BOX_FACES = [
    (4, 5, 7, 6),  # +x
    (0, 1, 3, 2),  # -x
    (2, 3, 7, 6),  # +y
    (0, 1, 5, 4),  # -y
    (1, 3, 7, 5),  # +z
    (0, 2, 6, 4),  # -z
]


def make_car(rng: np.random.RandomState):
    """Identity = geometry + palette, all deterministic from rng."""
    L = rng.uniform(1.6, 2.1)      # body length (x)
    W = rng.uniform(0.8, 1.05)     # body width (y)
    Hb = rng.uniform(0.42, 0.58)   # body height (z)
    Hc = rng.uniform(0.34, 0.5)    # cabin height
    Lc = L * rng.uniform(0.42, 0.58)
    wheel_r = rng.uniform(0.18, 0.24)

    def col():
        return rng.uniform(45, 255, 3)

    body_c, cabin_c, wheel_c = col(), col(), rng.uniform(25, 90, 3)
    bumper_c = col()
    bg = rng.uniform(140, 245, 3)
    parts = [
        (_box(0, 0, wheel_r + Hb / 2, L, W, Hb), body_c),
        # cabin sits toward the rear; bumper marks the front so opposite
        # azimuths are visually distinct (no symmetric look-alike views)
        (_box(-L * 0.12, 0, wheel_r + Hb + Hc / 2, Lc, W * 0.82, Hc),
         cabin_c),
        (_box(L * 0.5, 0, wheel_r + Hb * 0.3, L * 0.12, W * 0.7, Hb * 0.5),
         bumper_c),
    ]
    for sx in (-1, 1):
        for sy in (-1, 1):
            parts.append(
                (
                    _box(sx * L * 0.32, sy * (W / 2), wheel_r,
                         wheel_r * 2, 0.12, wheel_r * 2),
                    wheel_c,
                )
            )
    return parts, bg


def render(parts, bg, azimuth_deg: float, elev_deg: float,
           size: int) -> np.ndarray:
    """Orthographic render: rotate world by -azimuth, tilt by elevation,
    project (x, y) of camera space, painter-sort faces by depth."""
    az = np.deg2rad(azimuth_deg)
    el = np.deg2rad(elev_deg)
    # yaw about +z, then pitch the camera down by el
    Rz = np.array(
        [[np.cos(az), -np.sin(az), 0], [np.sin(az), np.cos(az), 0], [0, 0, 1]]
    )
    Rx = np.array(
        [[1, 0, 0],
         [0, np.cos(el), -np.sin(el)],
         [0, np.sin(el), np.cos(el)]]
    )
    img = np.empty((size, size, 3), np.uint8)
    img[:] = bg.astype(np.uint8)
    scale = size * 0.34
    cx = size / 2.0
    cy = size * 0.56
    light = np.array([0.4, -0.5, 0.77])

    faces = []  # (mean camera depth, 2D poly, shaded color)
    for corners, color in parts:
        cam = corners @ Rz.T
        cam = cam @ Rx.T
        # camera looks along -y after the tilt; screen = (x, -z)
        xs = cx + cam[:, 0] * scale
        ys = cy - cam[:, 2] * scale
        for fi, face in enumerate(_BOX_FACES):
            poly = np.stack([xs[list(face)], ys[list(face)]], axis=1)
            depth = cam[list(face), 1].mean()
            # outward normal in camera space for Lambert shading
            n_local = np.zeros(3)
            n_local[fi // 2] = 1.0 if fi % 2 == 0 else -1.0
            n_cam = Rx @ (Rz @ n_local)
            if n_cam[1] <= 0:  # back-facing (camera at +y)
                continue
            lam = 0.55 + 0.45 * max(0.0, float(n_cam @ light))
            faces.append((depth, poly, np.clip(color * lam, 0, 255)))

    faces.sort(key=lambda t: t[0])  # far first
    for _, poly, color in faces:
        cv2.fillPoly(
            img,
            [np.round(poly).astype(np.int32).reshape(-1, 1, 2)],
            tuple(float(c) for c in color),
            lineType=cv2.LINE_AA,
        )
    return img


def main():
    import h5py

    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=str, required=True)
    ap.add_argument("--train-objects", type=int, default=30)
    ap.add_argument("--test-objects", type=int, default=4)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(args.root, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    n_total = args.train_objects + args.test_objects

    train_ids, test_ids, test_names = [], [], []
    path = os.path.join(args.root, "data_car.hdf5")
    with h5py.File(path, "w") as h5:
        for oi in range(n_total):
            base = f"obj{oi:03d}"
            parts, bg = make_car(rng)
            is_test = oi >= args.train_objects
            if is_test:
                test_names.append(base)
            for az in AZIMUTHS:
                for e, el_deg in ELEV_DEG.items():
                    key = f"{base}_{az // 10}_{e}"
                    img = render(parts, bg, az, el_deg, args.size)
                    g = h5.create_group(key)
                    g.create_dataset(
                        "image", data=img, compression="gzip",
                        compression_opts=4,
                    )
                    g.create_dataset(
                        "pose", data=np.array([az // 10, e * 10], np.int64)
                    )
                    (test_ids if is_test else train_ids).append(key)

    def dump(name, rows):
        with open(os.path.join(args.root, name), "w") as f:
            f.write("\n".join(rows) + "\n")

    dump("id_car_train.txt", train_ids)
    dump("id_car_test.txt", test_ids)
    dump("name_car_test.txt", test_names)
    print(
        f"wrote {path} ({n_total} objects x {len(AZIMUTHS)} az x 3 elev = "
        f"{n_total * len(AZIMUTHS) * 3} views), "
        f"{len(train_ids)} train ids, {len(test_names)} test objects"
    )


if __name__ == "__main__":
    main()
