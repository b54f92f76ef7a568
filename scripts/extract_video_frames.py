"""Video → per-frame 256² image extraction for the animation datasets.

Capability parity with reference script/extract_video_frames.py (skvideo →
cv2, which is available in this image): for every {video_path}/*.mp4, write
one png per annotated frame under {frame_root}/{video_name}/, center-cropped
to square and resized to 256².

Usage:
  python scripts/extract_video_frames.py --frame_root out --video_path vids \
      --anno_path skeletons
"""

from __future__ import annotations

import argparse
import glob
import os

import cv2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frame_root", type=str, required=True)
    ap.add_argument("--video_path", type=str, required=True)
    ap.add_argument("--anno_path", type=str, default=None,
                    help="skeleton JSON dirs; limits frame count per video")
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    videos = sorted(glob.glob(os.path.join(args.video_path, "*.mp4")))
    for video in videos:
        name = os.path.splitext(os.path.basename(video))[0]
        out_dir = os.path.join(args.frame_root, name)
        os.makedirs(out_dir, exist_ok=True)
        limit = None
        if args.anno_path:
            annos = glob.glob(os.path.join(args.anno_path, name, "*.json"))
            limit = len(annos)
        cap = cv2.VideoCapture(video)
        i = 0
        while True:
            ok, frame = cap.read()
            if not ok or (limit is not None and i >= limit):
                break
            h, w = frame.shape[:2]
            s = min(h, w)
            y0, x0 = (h - s) // 2, (w - s) // 2
            crop = frame[y0 : y0 + s, x0 : x0 + s]
            crop = cv2.resize(crop, (args.size, args.size),
                              interpolation=cv2.INTER_AREA)
            cv2.imwrite(os.path.join(out_dir, f"{i:05d}.png"), crop)
            i += 1
        cap.release()
        print(f"{name}: {i} frames")


if __name__ == "__main__":
    main()
