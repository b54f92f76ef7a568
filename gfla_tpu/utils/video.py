"""Video stitching: per-frame image sequences → mp4 (cv2).

Capability parity with reference write2video (dance_model.py:191-218):
collect `*_{name}.{ext}` frames per requested stream, concatenate streams
side-by-side, write `{results_dir}_{names}.mp4` at 15 fps.
"""

from __future__ import annotations

import glob
import os
from typing import List, Sequence

import cv2
import numpy as np


def write2video(results_dir: str, name_list: Sequence[str],
                ext: str = "png", fps: int = 15) -> str:
    streams = [
        sorted(glob.glob(os.path.join(results_dir, f"*_{name}.{ext}")))
        for name in name_list
    ]
    n = min(len(s) for s in streams)
    if n == 0:
        return ""
    frames = []
    for i in range(n):
        row = None
        for stream in streams:
            im = cv2.imread(stream[i])
            row = im if row is None else np.concatenate((row, im), axis=1)
        frames.append(row)
    h, w = frames[0].shape[:2]
    out_name = results_dir + "_" + "_".join(name_list) + "_.mp4"
    writer = cv2.VideoWriter(
        out_name, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for f in frames:
        writer.write(f)
    writer.release()
    print(f"write video {out_name}")
    return out_name
