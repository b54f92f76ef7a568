"""End-to-end golden test of the metrics CLI (`python -m gfla_tpu.metrics`)
against a pure-torch oracle on the SAME on-disk images.

Converter parity per-net exists (tests/test_metric_parity.py); this closes
the remaining seam — the CLI glue: image decode, resize/uint8 I/O, the
`{src}_2_{tgt}_vis` pairing, the statistics.npz cache, and the Frechet /
LPIPS reductions (reference script/metrics.py:619-665). Assets are
converter-produced npz from synthetic torchvision-key state_dicts, so the
whole chain converter → loader → feature net → CLI reduction is checked
without network access.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(__file__))
import torch_metric_ref as tref  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")


def _run(cmd, env=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    res = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                         timeout=1200, env=e)
    assert res.returncode == 0, \
        f"{cmd} failed:\n{res.stdout[-3000:]}\n{res.stderr[-3000:]}"
    return res


def _make_images(tmp_path, n=8, size=64, seed=11):
    """gt dir with p{i}.jpg + generated dir with ref_2_p{i}_vis.jpg."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    gt_dir = tmp_path / "gt"
    gen_dir = tmp_path / "gen"
    gt_dir.mkdir()
    gen_dir.mkdir()
    for i in range(n):
        a = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        # systematically different distribution (contrast + brightness
        # shift + noise): FID must be non-degenerate — with gen ≈ gt the
        # true FID is ~1e-6 through a singular sqrtm and the jax-f32 vs
        # torch-f64 comparison is pure noise; a distribution shift makes
        # the mean term dominate so the values are stable and a CLI
        # feature/resize/pairing bug actually moves the number.
        b = np.clip(a * 0.55 + 40.0 + rng.randn(size, size, 3) * 15,
                    0, 255).astype(np.uint8)
        Image.fromarray(a).save(str(gt_dir / f"p{i}.jpg"), quality=95)
        Image.fromarray(b).save(str(gen_dir / f"ref_2_p{i}_vis.jpg"),
                                quality=95)
    return gt_dir, gen_dir


def _load_299(path):
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((299, 299), Image.BILINEAR)
    return np.asarray(img, np.float64) / 255.0


def _load_pm1(path):
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), np.float64)
    return img / 127.5 - 1.0


@pytest.mark.slow
class TestMetricsCLIGolden:
    def test_cli_matches_torch_oracle(self, tmp_path):
        # --- converter-produced synthetic assets ---
        assets = tmp_path / "assets"
        assets.mkdir()
        inc_sd = tref.build_inception_sd(seed=0)
        alex_sd = tref.build_alexnet_sd(seed=1)
        lin_sd = tref.build_lpips_lin_sd(seed=2)
        torch.save(inc_sd, str(tmp_path / "inception_v3.pth"))
        torch.save(alex_sd, str(tmp_path / "alexnet.pth"))
        torch.save(lin_sd, str(tmp_path / "alex_lin.pth"))
        _run([sys.executable,
              os.path.join(SCRIPTS, "convert_inception_weights.py"),
              f"--state_dict={tmp_path / 'inception_v3.pth'}",
              f"--out={assets / 'inception_v3.npz'}"])
        _run([sys.executable,
              os.path.join(SCRIPTS, "convert_lpips_weights.py"),
              f"--alexnet={tmp_path / 'alexnet.pth'}",
              f"--linear={tmp_path / 'alex_lin.pth'}",
              f"--out={assets / 'lpips_alex.npz'}"])

        gt_dir, gen_dir = _make_images(tmp_path)

        # --- the actual CLI, subprocess, synthetic assets via env ---
        out_dir = tmp_path / "eval_results"
        _run([sys.executable, "-m", "gfla_tpu.metrics",
              "--gt_path", str(gt_dir),
              "--distorated_path", str(gen_dir),
              "--fid_real_path", str(gt_dir),
              "--name", "golden", "--out_dir", str(out_dir)],
             env={"GFLA_ASSETS_DIR": str(assets), "JAX_PLATFORMS": "cpu"})

        import pandas as pd

        csvs = sorted(os.listdir(out_dir))
        assert csvs == ["golden.csv"], (
            f"expected a non-FALLBACK csv, got {csvs}")
        row = pd.read_csv(out_dir / "golden.csv").iloc[0]
        assert "FALLBACK_WEIGHTS" not in row.index

        # stats cache written next to the real set (script/metrics.py:199)
        assert (gt_dir / "statistics.npz").exists()

        # --- torch oracle on the SAME files ---
        gt_files = sorted(str(gt_dir / f) for f in os.listdir(gt_dir)
                          if f.endswith(".jpg"))
        gen_files = sorted(str(gen_dir / f) for f in os.listdir(gen_dir)
                           if f.endswith(".jpg"))  # CLI drops metrics.npz here

        def pool3(files):
            x = np.stack([_load_299(f) for f in files])
            t = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
            return tref.inception_pool3_torch(t, inc_sd).numpy()

        from gfla_tpu.metrics.fid import calculate_frechet_distance

        a_gt, a_gen = pool3(gt_files), pool3(gen_files)
        mu_gt, sig_gt = a_gt.mean(0), np.cov(a_gt, rowvar=False)
        mu_gen, sig_gen = a_gen.mean(0), np.cov(a_gen, rowvar=False)
        fid_oracle = calculate_frechet_distance(mu_gt, sig_gt,
                                                mu_gen, sig_gen)

        # The strong check is at the FEATURE level: the CLI's real-set
        # statistics cache (decode → resize → jax inception → pooling →
        # μ/Σ) must match the torch-f64 oracle on the same files. The
        # scalar FID through a rank-deficient sqrtm (8 samples × 2048
        # features) amplifies f32-vs-f64 feature noise unboundedly, so it
        # only gets a feature-scale-aware absolute band.
        stats = np.load(gt_dir / "statistics.npz")
        scale = float(np.abs(mu_gt).max())
        np.testing.assert_allclose(stats["mu"], mu_gt,
                                   rtol=1e-3, atol=1e-4 * scale)
        np.testing.assert_allclose(stats["sigma"], sig_gt,
                                   rtol=1e-2, atol=1e-4 * scale ** 2)
        fid_band = max(1e-3 * float(np.trace(sig_gt) + np.trace(sig_gen)),
                       0.05 * fid_oracle)
        assert row["fid"] == pytest.approx(fid_oracle, abs=fid_band), (
            row["fid"], fid_oracle, fid_band)

        x = np.stack([_load_pm1(f) for f in gen_files])
        y = np.stack([_load_pm1(f) for f in gt_files])
        lp = tref.lpips_torch(
            torch.tensor(np.transpose(x, (0, 3, 1, 2))),
            torch.tensor(np.transpose(y, (0, 3, 1, 2))),
            alex_sd, lin_sd).numpy()
        assert row["lpips"] == pytest.approx(float(lp.mean()), rel=1e-3), (
            row["lpips"], float(lp.mean()))

        # reconstruction block sanity: identical-loader L1 cross-check
        l1_oracle = float(np.mean(np.abs(
            (x + 1.0) / 2.0 - (y + 1.0) / 2.0)))
        assert row["l1"] == pytest.approx(l1_oracle, rel=1e-3)
