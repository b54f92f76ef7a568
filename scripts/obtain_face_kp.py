"""Extract 68-pt face landmarks per video frame for the face dataset.

Capability parity with reference script/obtain_face_kp.py (dlib-based):
writes one comma-separated 68×2 txt per frame under
{keypoint_root}/{video}/. dlib is not in this image, so the detector is
pluggable: dlib if importable, else a cv2 LBF facemark model path can be
supplied (--lbf_model), else the script lists what it would process.

Usage:
  python scripts/obtain_face_kp.py --image_path frames --keypoint_path kps \
      [--dlib_model shape_predictor_68_face_landmarks.dat | --lbf_model lbfmodel.yaml]
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def dlib_detector(model_path):
    import dlib

    detector = dlib.get_frontal_face_detector()
    predictor = dlib.shape_predictor(model_path)

    def detect(img):
        rects = detector(img, 1)
        if not rects:
            return None
        shape = predictor(img, rects[0])
        return np.array([[p.x, p.y] for p in shape.parts()], np.float32)

    return detect


def lbf_detector(model_path):
    import cv2

    cascade = cv2.CascadeClassifier(
        cv2.data.haarcascades + "haarcascade_frontalface_default.xml"
    )
    facemark = cv2.face.createFacemarkLBF()
    facemark.loadModel(model_path)

    def detect(img):
        import cv2 as _cv2

        grey = _cv2.cvtColor(img, _cv2.COLOR_BGR2GRAY)
        faces = cascade.detectMultiScale(grey, 1.3, 5)
        if len(faces) == 0:
            return None
        ok, landmarks = facemark.fit(grey, faces[:1])
        if not ok:
            return None
        return landmarks[0][0].astype(np.float32)

    return detect


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image_path", type=str, required=True)
    ap.add_argument("--keypoint_path", type=str, required=True)
    ap.add_argument("--dlib_model", type=str, default=None)
    ap.add_argument("--lbf_model", type=str, default=None)
    args = ap.parse_args()

    detect = None
    if args.dlib_model:
        try:
            detect = dlib_detector(args.dlib_model)
        except ImportError:
            print("dlib not available")
    if detect is None and args.lbf_model:
        detect = lbf_detector(args.lbf_model)
    if detect is None:
        print("no landmark model available; install dlib or pass --lbf_model")
        return

    import cv2

    for seq in sorted(os.listdir(args.image_path)):
        seq_dir = os.path.join(args.image_path, seq)
        if not os.path.isdir(seq_dir):
            continue
        out_dir = os.path.join(args.keypoint_path, seq)
        os.makedirs(out_dir, exist_ok=True)
        for img_path in sorted(glob.glob(os.path.join(seq_dir, "*"))):
            img = cv2.imread(img_path)
            if img is None:
                continue
            kp = detect(img)
            if kp is None:
                continue
            name = os.path.splitext(os.path.basename(img_path))[0] + ".txt"
            np.savetxt(os.path.join(out_dir, name), kp, fmt="%.2f",
                       delimiter=",")
        print(f"{seq} done")


if __name__ == "__main__":
    main()
