"""Demo entry point — test.py with the val phase (reference demo.py:9-20):
writes vis/ref/gt/all panels for quick qualitative inspection.

`--walkthrough` runs the reference Colab notebook's flow (demo.ipynb:
environment check → build → download → per-task demo cells) end-to-end as
an executable script: sanity-check the backend, fetch assets if possible,
train a tiny pose model on synthetic data, write demo panels, and score
them with the metrics CLI — each step echoed like a notebook cell. No
dataset or checkpoint downloads required; finishes in a few minutes on CPU.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))


def _cell(n, title, cmd=None):
    print(f"\n[{n}] {title}")
    if cmd is not None:
        print("    $", " ".join(cmd), flush=True)
        res = subprocess.run(cmd, cwd=REPO)
        if res.returncode != 0:
            print(f"    cell [{n}] FAILED (rc={res.returncode})")
            sys.exit(res.returncode)


def walkthrough(work="/tmp/gfla_demo"):
    """The demo.ipynb flow, TPU-native (reference demo.ipynb cells 2-17:
    nvidia-smi → clone → pip install → setup.sh CUDA build → download.sh →
    three task demos). Here cells 3-8 collapse into nothing — the compute
    path is JAX/XLA, there is nothing to clone or compile — and the task
    demo runs without downloaded checkpoints via the synthetic dataset."""
    py = sys.executable
    ck, out = os.path.join(work, "ckpt"), os.path.join(work, "results")

    _cell(1, "Environment — the notebook's `nvidia-smi` cell, TPU-native",
          [py, "-c",
           "from gfla_tpu.runtime import setup_runtime; setup_runtime(); "
           "import jax; print('backend:', jax.default_backend(), "
           "jax.devices())"])

    print("\n[2] Build — the notebook's `pip install` + `setup.sh` CUDA "
          "cells: nothing to do.\n    The custom ops (block extract, local "
          "attention, resample) are XLA/Pallas —\n    no compilation step "
          "exists in this framework.")

    assets = os.path.join(REPO, "assets", "vgg19_features.npz")
    if os.path.exists(assets):
        print("\n[3] Assets — already present (assets/*.npz).")
    else:
        print("\n[3] Assets — the notebook's `download.sh` cell. Optional "
              "here: without\n    network the demo continues on "
              "clearly-labeled fallback weights\n    (run "
              "`bash scripts/download.sh` later for loss/metric parity).")

    _cell(4, "Pose demo, part 1 — train a tiny model on synthetic data "
             "(the notebook\n    uses downloaded checkpoints; this stays "
             "self-contained)",
          [py, os.path.join(REPO, "train.py"), "--name=demo",
           "--model=pose", "--dataset_mode=synthetic", "--load_size=64",
           "--batchSize=2", "--max_iters=20", "--print_freq=5",
           f"--checkpoints_dir={ck}"])

    _cell(5, "Pose demo, part 2 — write {src}_2_{tgt}_vis.jpg panels "
             "(demo.ipynb cell 13)",
          [py, os.path.join(REPO, "demo.py"), "--name=demo",
           "--model=pose", "--dataset_mode=synthetic", "--load_size=64",
           "--batchSize=2", f"--checkpoints_dir={ck}",
           f"--results_dir={out}", "--max_dataset_size=4"])

    demo_dir = os.path.join(out, "demo")
    panels = [f for f in os.listdir(demo_dir)
              if f.endswith("_vis.jpg")] if os.path.isdir(demo_dir) else []
    print(f"    wrote {len(panels)} panels under {demo_dir}")

    # Stage the val-phase outputs into the metrics CLI's expected layout:
    # generated `{src}_2_{tgt}_vis.jpg` in one dir, ground truth `{tgt}.jpg`
    # in another (the `_2_` pairing contract, script/metrics.py:414-439).
    import shutil

    gt_dir, gen_dir = os.path.join(work, "gt"), os.path.join(work, "gen")
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(gen_dir, exist_ok=True)
    for f in os.listdir(demo_dir):
        if f.endswith("_vis.jpg"):
            shutil.copyfile(os.path.join(demo_dir, f),
                            os.path.join(gen_dir, f))
        elif f.endswith("_gt.jpg"):
            tgt = f.split("_2_")[-1][: -len("_gt.jpg")] + ".jpg"
            shutil.copyfile(os.path.join(demo_dir, f),
                            os.path.join(gt_dir, tgt))

    _cell(6, "Quantitative check — the metrics CLI on the demo outputs "
             "(script/metrics.py CLI)",
          [py, "-m", "gfla_tpu.metrics",
           f"--gt_path={gt_dir}", f"--distorated_path={gen_dir}",
           f"--fid_real_path={gt_dir}", "--name=demo_walkthrough",
           f"--out_dir={work}/eval", "--allow_fallback_weights"])

    print("\n[7] Animation / face / view-synthesis demos (demo.ipynb cells "
          "15-17) follow the\n    same shape with --model=dance/face/"
          "shapenet — see docs/PERSON_IMAGE_ANIMATION.md,\n    "
          "FACE_IMAGE_ANIMATION.md, VIEW_SYNTHESIS.md, and docs/DEMO.md "
          "§3 for running against\n    the reference's published "
          "checkpoints via scripts/convert_torch_checkpoint.py.")
    print("\nwalkthrough OK")


def main():
    if "--walkthrough" in sys.argv:
        sys.argv.remove("--walkthrough")
        walkthrough()
        return
    # demo = test with phase val + save_input semantics
    if "--phase" not in " ".join(sys.argv):
        sys.argv += ["--phase", "val"]
    import test as test_entry

    test_entry.main()


if __name__ == "__main__":
    main()
