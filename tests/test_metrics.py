"""Metrics layer tests: reconstruction math, Frechet distance, LPIPS
mechanics, filename pairing convention."""

import os

import numpy as np
import pytest

from gfla_tpu.metrics import (
    calculate_frechet_distance,
    compare_l1,
    compare_mae,
    compare_psnr,
    compare_ssim,
    preprocess_path_for_deform_task,
)


class TestReconstruction:
    def test_identical_images(self):
        rng = np.random.RandomState(0)
        img = rng.rand(64, 64, 3).astype(np.float32)
        assert compare_ssim(img, img) == pytest.approx(1.0, abs=1e-5)
        assert compare_psnr(img, img) == float("inf")
        assert compare_l1(img, img) == 0.0
        assert compare_mae(img, img) == 0.0

    def test_noise_degrades(self):
        rng = np.random.RandomState(1)
        img = rng.rand(64, 64, 3).astype(np.float32)
        noisy = np.clip(img + rng.randn(64, 64, 3) * 0.1, 0, 1)
        assert compare_ssim(img, noisy) < 0.95
        assert 10 < compare_psnr(img, noisy.astype(np.float32)) < 25
        assert compare_l1(img, noisy) > 0.01

    def test_psnr_known_value(self):
        a = np.zeros((8, 8), np.float32)
        b = np.full((8, 8), 0.1, np.float32)
        # MSE = 0.01 → PSNR = 10·log10(1/0.01) = 20
        assert compare_psnr(a, b, 1.0) == pytest.approx(20.0, abs=1e-4)


class TestFrechet:
    def test_identical_distributions(self):
        rng = np.random.RandomState(2)
        mu = rng.randn(16)
        a = rng.randn(200, 16)
        sigma = np.cov(a, rowvar=False)
        assert calculate_frechet_distance(mu, sigma, mu, sigma) == \
            pytest.approx(0.0, abs=1e-4)

    def test_mean_shift(self):
        rng = np.random.RandomState(3)
        a = rng.randn(500, 8)
        mu, sigma = a.mean(0), np.cov(a, rowvar=False)
        d = calculate_frechet_distance(mu, sigma, mu + 1.0, sigma)
        assert d == pytest.approx(8.0, rel=0.01)  # |Δμ|² = 8


class TestLPIPS:
    def test_zero_for_identical(self):
        import jax.numpy as jnp

        from gfla_tpu.metrics.lpips import load_lpips_params, lpips_distance

        variables, lins, _ = load_lpips_params()
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
        d = lpips_distance(variables, lins, x, x)
        assert float(d[0]) == pytest.approx(0.0, abs=1e-6)
        y = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
        assert float(lpips_distance(variables, lins, x, y)[0]) > 0


class TestPairing:
    def test_deform_task_pairing(self, tmp_path):
        gt = tmp_path / "gt"
        gen = tmp_path / "gen"
        gt.mkdir()
        gen.mkdir()
        for name in ["imgA.jpg", "imgB.jpg"]:
            (gt / name).write_bytes(b"x")
        # generated names follow the reference contract: target extension
        # stripped before the _vis suffix
        (gen / "src1_2_imgA_vis.jpg").write_bytes(b"x")
        (gen / "src2_2_imgB_vis.jpg").write_bytes(b"x")
        (gen / "src3_2_missing_vis.jpg").write_bytes(b"x")
        gt_list, gen_list = preprocess_path_for_deform_task(str(gt), str(gen))
        assert len(gt_list) == 2
        assert os.path.basename(gt_list[0]) == "imgA.jpg"
