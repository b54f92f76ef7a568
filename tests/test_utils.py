"""Utility layer tests: video stitching, visualizer logs, image conversion."""

import os

import numpy as np

from gfla_tpu.utils.images import flow2color, tensor2im
from gfla_tpu.utils.video import write2video
from gfla_tpu.utils.visualizer import Visualizer


class _Opt:
    name = "exp"
    no_html = False
    display_winsize = 64

    def __init__(self, d):
        self.checkpoints_dir = d


def test_tensor2im_range():
    x = np.linspace(-1, 1, 48).reshape(1, 4, 4, 3)
    img = tensor2im(x)
    assert img.dtype == np.uint8
    assert img.min() == 0 and img.max() == 255


def test_flow2color_shapes():
    flow = np.random.RandomState(0).randn(1, 8, 8, 2)
    img = flow2color(flow)
    assert img.shape == (8, 8, 3)
    assert img.dtype == np.uint8


def test_write2video(tmp_path):
    import imageio

    d = str(tmp_path / "seq")
    os.makedirs(d)
    rng = np.random.RandomState(0)
    for i in range(4):
        for name in ("gt", "vis"):
            imageio.imwrite(
                os.path.join(d, f"{i:03d}_{name}.png"),
                (rng.rand(32, 32, 3) * 255).astype(np.uint8),
            )
    out = write2video(d, ["gt", "vis"], "png")
    assert out and os.path.exists(out)
    assert os.path.getsize(out) > 0


def test_visualizer_logs_and_html(tmp_path):
    vis = Visualizer(_Opt(str(tmp_path)))
    vis.print_current_errors(1, 100, {"app_gen": 0.5, "ad_gen": 1.2}, 0.1)
    vis.print_current_eval(1, 100, {"fid": 12.3})
    log = open(os.path.join(str(tmp_path), "exp", "loss_log.txt")).read()
    assert "app_gen: 0.500" in log and "iters: 100" in log
    vis.display_current_results(
        {"img": np.zeros((16, 16, 3), np.uint8)}, 100
    )
    web = os.path.join(str(tmp_path), "exp", "web")
    assert os.path.exists(os.path.join(web, "index.html"))
    assert os.path.exists(os.path.join(web, "images", "iter00000100_img.png"))
    # latent distribution hook (reference util/visualizer.py:127-140) —
    # must accept {name: samples} whether or not TB is available
    vis.plot_current_distribution(
        {"z": np.random.RandomState(0).randn(64)}, 100
    )
