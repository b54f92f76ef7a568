"""Test-time drivers per task family.

Each task exposes run_test(opt, state, loader) with the reference's output
contracts:
* pose/shapenet: `{src}_2_{tgt}_vis.jpg` (+ref/gt/all panels in val phase)
  — pose_model.py:113-121, shapenet test sweep shapenet_model.py:129-151
* dance/face: per-frame pngs streamed chunk-by-chunk with recurrent carry
  across set_input calls, stitched to mp4 at sequence end —
  dance_model.py:250-294, face_model.py:209-237
* keypoint: denoised sequences emitted as OpenPose-format JSONs +
  optional skeleton renders — keypoint_model.py:100-187
"""

from __future__ import annotations

import json
import os
from typing import Dict

import jax
import numpy as np

from gfla_tpu.utils.images import tensor2im
from gfla_tpu.utils.video import write2video


def _save(path: str, img: np.ndarray):
    import imageio

    os.makedirs(os.path.dirname(path), exist_ok=True)
    imageio.imwrite(path, img)


def run_test_pose(task, opt, state, loader, prepare_batch) -> int:
    out_dir = os.path.join(opt.results_dir, opt.name)
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for batch in loader:
        dev = prepare_batch(batch)
        out = task.test_step(state, dev)
        img_gen = out[0] if isinstance(out, tuple) else out
        for i in range(img_gen.shape[0]):
            # reference contract: name = splitext( splitext(src)[0] + '_2_'
            # + tgt )[0] + '_{suffix}.jpg' — the target's extension is
            # stripped before the suffix (pose_model.py:108-110 +
            # base_model.py:224-237); the metrics CLI depends on this.
            src = os.path.splitext(batch["P1_path"][i])[0]
            base = os.path.splitext(f"{src}_2_{batch['P2_path'][i]}")[0]
            _save(os.path.join(out_dir, f"{base}_vis.jpg"),
                  tensor2im(img_gen, i))
            if getattr(opt, "save_input", False) or opt.phase == "val":
                _save(os.path.join(out_dir, f"{base}_ref.jpg"),
                      tensor2im(dev["P1"], i))
                _save(os.path.join(out_dir, f"{base}_gt.jpg"),
                      tensor2im(dev["P2"], i))
                panel = np.concatenate(
                    [tensor2im(dev["P1"], i), tensor2im(img_gen, i),
                     tensor2im(dev["P2"], i)], axis=1,
                )
                _save(os.path.join(out_dir, f"{base}_all.jpg"), panel)
            n += 1
        if n >= opt.max_dataset_size:
            break
    print(f"wrote {n} results to {out_dir}")
    return n


def run_test_animation(task, opt, state, loader, prepare_batch) -> int:
    """Streaming chunk generation with carried previous frame."""
    ext = getattr(opt, "write_ext", "png")
    base_dir = os.path.join(opt.results_dir, opt.name)
    carry = None
    n = 0
    for batch in loader:
        dev = prepare_batch(batch)
        frame_idx = batch.get("frame_idx", [0])[0]
        start = getattr(opt, "start_frame", 0)
        preload = getattr(opt, "n_frames_pre_load_test", dev["BP_all"].shape[1])
        first_chunk = frame_idx == start + preload
        if first_chunk:
            carry = None
        pre_i, pre_s = carry if carry is not None else (None, None)
        gen, carry = task.test_step(state, dev, pre_i, pre_s)

        # collate layout: gen_paths[batch][time] (batchSize=1 at test)
        paths = batch["gen_paths"][0]
        seq = os.path.basename(os.path.dirname(paths[0])) or "seq"
        results_dir = os.path.join(base_dir, seq)
        if first_chunk:
            _save(os.path.join(results_dir, f"ref_ref.{ext}"),
                  tensor2im(dev["ref_image"]))
        for t in range(gen.shape[1]):
            name = os.path.splitext(os.path.basename(paths[t]))[0]
            _save(os.path.join(results_dir, f"{name}_vis.{ext}"),
                  tensor2im(gen[:, t]))
            if "P_all" in dev:
                _save(os.path.join(results_dir, f"{name}_gt.{ext}"),
                      tensor2im(dev["P_all"][:, t]))
            n += 1
        if batch.get("change_seq", [False])[0]:
            write2video(results_dir, ["gt", "vis"], ext)
    print(f"wrote {n} frames under {base_dir}")
    return n


def run_test_keypoint(task, opt, state, loader, prepare_batch) -> int:
    """Denoise skeleton sequences → OpenPose-format JSON per frame."""
    out_dir = os.path.join(opt.results_dir, opt.name)
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for batch in loader:
        dev = prepare_batch(batch)
        out = np.asarray(task.test_step(state, dev))  # (B, T, 34) in [-1,1]
        size = getattr(opt, "load_size", 256)
        size = size if isinstance(size, int) else size[0]
        coords = (out + 1) / 2 * size
        paths = batch.get("gen_paths")
        # collate layout: [batch][time]; fall back to synthetic names
        paths = paths[0] if paths else [
            f"seq{n}_f{t}" for t in range(out.shape[1])
        ]
        for t in range(out.shape[1]):
            yx = coords[0, t].reshape(2, -1)  # [y..., x...]
            kp = []
            for j in range(yx.shape[1]):
                kp += [float(yx[1, j]), float(yx[0, j]), 1.0]
            name = os.path.splitext(os.path.basename(
                paths[min(t, len(paths) - 1)]
            ))[0]
            with open(os.path.join(out_dir, f"{name}_keypoints.json"), "w") as f:
                json.dump({"people": [{"pose_keypoints_2d": kp}]}, f)
            n += 1
        if getattr(opt, "write_image", False):
            # render denoised skeletons (keypoint_model.py:100-130)
            from gfla_tpu.data.openpose_utils import tensor2skeleton

            renders = tensor2skeleton(image_size=(size, size))(
                np.asarray(out[0]).T, "human36m_17"
            )
            for t, frame in enumerate(renders):
                name = os.path.splitext(os.path.basename(
                    paths[min(t, len(paths) - 1)]
                ))[0]
                _save(os.path.join(out_dir, f"{name}_skeleton_out.png"),
                      frame)
    print(f"wrote {n} keypoint JSONs to {out_dir}")
    return n
