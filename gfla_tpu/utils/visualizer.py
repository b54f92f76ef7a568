"""Training observability: console/loss-log/TensorBoard/HTML gallery.

Capability parity with the reference Visualizer (util/visualizer.py:9-175):
loss lines appended to loss_log.txt in the same format, eval lines to
eval_log.txt, image dumps to web/images with an HTML index. visdom is
replaced by TensorBoard (tensorboardX) — TPU pods have no visdom server.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np


class Visualizer:
    def __init__(self, opt):
        self.opt = opt
        self.name = opt.name
        self.log_dir = os.path.join(opt.checkpoints_dir, opt.name)
        os.makedirs(self.log_dir, exist_ok=True)
        self.log_name = os.path.join(self.log_dir, "loss_log.txt")
        self.eval_log_name = os.path.join(self.log_dir, "eval_log.txt")
        with open(self.log_name, "a") as f:
            f.write(f"================ Training Loss ({time.strftime('%c')}) ================\n")
        self.use_html = not getattr(opt, "no_html", False)
        self.win_size = getattr(opt, "display_winsize", 256)
        if self.use_html:
            self.web_dir = os.path.join(self.log_dir, "web")
            self.img_dir = os.path.join(self.web_dir, "images")
            os.makedirs(self.img_dir, exist_ok=True)
        self._tb = None
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(os.path.join(self.log_dir, "tb"))
        except Exception:
            pass

    # ------------------------------------------------------------------
    def print_current_errors(self, epoch: int, iters: int,
                             errors: Dict[str, float], t: float):
        """Reference loss-line format (util/visualizer.py:138-145)."""
        message = f"(epoch: {epoch}, iters: {iters}, time: {t:.3f}) "
        for k, v in errors.items():
            message += f"{k}: {float(v):.3f} "
        print(message, flush=True)
        with open(self.log_name, "a") as f:
            f.write(message + "\n")
        if self._tb is not None:
            for k, v in errors.items():
                self._tb.add_scalar(f"loss/{k}", float(v), iters)

    def print_current_eval(self, epoch: int, iters: int,
                           eval_results: Dict[str, float]):
        message = f"(epoch: {epoch}, iters: {iters}) "
        for k, v in eval_results.items():
            message += f"{k}: {float(v):.5f} "
        print(message, flush=True)
        with open(self.eval_log_name, "a") as f:
            f.write(message + "\n")
        if self._tb is not None:
            for k, v in eval_results.items():
                self._tb.add_scalar(f"eval/{k}", float(v), iters)

    def plot_current_distribution(self, distribution: Dict[str, np.ndarray],
                                  iters: int = 0):
        """Latent statistics-distribution hook (reference
        util/visualizer.py:127-140, fired from train.py:41-42 when a model
        exposes `distribution`). visdom boxplots become TB histograms."""
        if self._tb is not None:
            for k, v in distribution.items():
                self._tb.add_histogram(f"dist/{k}", np.asarray(v), iters)

    # ------------------------------------------------------------------
    def display_current_results(self, visuals: Dict[str, np.ndarray],
                                iters: int):
        """Dump uint8 HWC images + refresh a simple HTML gallery."""
        if not self.use_html:
            return
        import imageio

        entries = []
        for label, img in visuals.items():
            path = f"iter{iters:08d}_{label}.png"
            imageio.imwrite(os.path.join(self.img_dir, path), img)
            entries.append((label, path))
            if self._tb is not None:
                self._tb.add_image(
                    f"img/{label}", img.transpose(2, 0, 1), iters
                )
        self._write_html()

    def _write_html(self):
        imgs = sorted(os.listdir(self.img_dir), reverse=True)[:200]
        rows = "\n".join(
            f'<div style="display:inline-block;margin:4px;text-align:center">'
            f'<img src="images/{p}" width="{self.win_size}"><br>{p}</div>'
            for p in imgs
        )
        with open(os.path.join(self.web_dir, "index.html"), "w") as f:
            f.write(
                f"<html><head><title>{self.name}</title></head>"
                f"<body><h1>{self.name}</h1>{rows}</body></html>"
            )
