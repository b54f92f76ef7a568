"""End-to-end torch parity for the metric nets THROUGH the converter
scripts (VERDICT r3 items 3+5): build a synthetic torchvision-key
state_dict, run scripts/convert_*_weights.py on it, load the produced
.npz into the flax consumers, and assert f64 agreement with a pure-torch
oracle of the torchvision architecture (tests/torch_metric_ref.py).

A key-mapping or transpose bug in any converter fails these tests today,
instead of silently destroying FID/LPIPS comparability the day the real
pretrained assets arrive (reference consumers: script/inception.py,
script/metrics.py:443-507, external_function.py:333-344).
"""

import contextlib
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

import jax

sys.path.insert(0, os.path.dirname(__file__))
import torch_metric_ref as tref  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")


@contextlib.contextmanager
def x64():
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)


def _run_converter(script, *args):
    cmd = [sys.executable, os.path.join(SCRIPTS, script), *args]
    res = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                         timeout=300)
    assert res.returncode == 0, f"{script} failed:\n{res.stdout}\n{res.stderr}"


def _cast_tree_f64(tree):
    return jax.tree_util.tree_map(
        lambda a: jax.numpy.asarray(np.asarray(a), jax.numpy.float64), tree)


@pytest.mark.slow
class TestVGGConverter:
    def test_vgg_converter_feature_parity(self, tmp_path):
        sd = tref.build_vgg19_tv_sd(seed=3)
        pth = tmp_path / "vgg19.pth"
        out = tmp_path / "vgg19_features.npz"
        torch.save(sd, str(pth))
        _run_converter("convert_vgg_weights.py",
                       f"--state_dict={pth}", f"--out={out}")

        from gfla_tpu.models.vgg import load_vgg19_params, vgg19_features

        with x64():
            params = _cast_tree_f64(load_vgg19_params(str(out)))
            rng = np.random.RandomState(11)
            x = rng.rand(2, 32, 32, 3).astype(np.float64) * 2 - 1
            jx = vgg19_features(params, jax.numpy.asarray(x))
            tx = tref.vgg19_taps_torch(
                torch.tensor(np.transpose(x, (0, 3, 1, 2))), sd)
            assert set(jx) >= set(tx)
            for name, tv in tx.items():
                jv = np.asarray(jx[name])
                tvn = np.transpose(tv.numpy(), (0, 2, 3, 1))
                np.testing.assert_allclose(jv, tvn, rtol=1e-9, atol=1e-9,
                                           err_msg=name)

    def test_vgg_converter_accepts_bare_features_keys(self, tmp_path):
        """A .features-only state_dict (no 'features.' prefix) converts."""
        sd = tref.build_vgg19_tv_sd(seed=4)
        bare = {k[len("features."):]: v for k, v in sd.items()}
        pth = tmp_path / "vgg19_feat.pth"
        out = tmp_path / "v.npz"
        torch.save(bare, str(pth))
        _run_converter("convert_vgg_weights.py",
                       f"--state_dict={pth}", f"--out={out}")
        data = np.load(out)
        assert data["conv1_1_kernel"].shape == (3, 3, 3, 64)
        np.testing.assert_array_equal(
            data["conv5_4_bias"], sd["features.34.bias"].numpy())


@pytest.mark.slow
class TestInceptionConverter:
    def test_inception_converter_pool3_parity(self, tmp_path):
        sd = tref.build_inception_sd(seed=0)
        pth = tmp_path / "inception_v3.pth"
        out = tmp_path / "inception_v3.npz"
        torch.save(sd, str(pth))
        _run_converter("convert_inception_weights.py",
                       f"--state_dict={pth}", f"--out={out}")

        from gfla_tpu.metrics.inception import (
            inception_features,
            load_inception_params,
        )

        with x64():
            variables, ok = load_inception_params(str(out))
            assert ok
            variables = _cast_tree_f64(variables)
            rng = np.random.RandomState(5)
            # 75×75 is the smallest valid input; parity is size-independent
            x = rng.rand(2, 75, 75, 3).astype(np.float64)
            jf = np.asarray(
                inception_features(variables, jax.numpy.asarray(x)))
            tf = tref.inception_pool3_torch(
                torch.tensor(np.transpose(x, (0, 3, 1, 2))), sd).numpy()
            assert jf.shape == (2, 2048)
            np.testing.assert_allclose(jf, tf, rtol=1e-7, atol=1e-8)


@pytest.mark.slow
class TestLPIPSConverter:
    def test_lpips_converter_distance_parity(self, tmp_path):
        alex_sd = tref.build_alexnet_sd(seed=1)
        lin_sd = tref.build_lpips_lin_sd(seed=2)
        alex_pth = tmp_path / "alexnet.pth"
        lin_pth = tmp_path / "alex_lin.pth"
        out = tmp_path / "lpips_alex.npz"
        torch.save(alex_sd, str(alex_pth))
        torch.save(lin_sd, str(lin_pth))
        _run_converter("convert_lpips_weights.py",
                       f"--alexnet={alex_pth}", f"--linear={lin_pth}",
                       f"--out={out}")

        from gfla_tpu.metrics.lpips import load_lpips_params, lpips_distance

        with x64():
            variables, lins, ok = load_lpips_params(str(out))
            assert ok
            variables = _cast_tree_f64(variables)
            lins = [jax.numpy.asarray(np.asarray(l), jax.numpy.float64)
                    for l in lins]
            rng = np.random.RandomState(6)
            x = rng.rand(2, 64, 64, 3).astype(np.float64) * 2 - 1
            y = rng.rand(2, 64, 64, 3).astype(np.float64) * 2 - 1
            jd = np.asarray(lpips_distance(
                variables, lins, jax.numpy.asarray(x), jax.numpy.asarray(y)))
            td = tref.lpips_torch(
                torch.tensor(np.transpose(x, (0, 3, 1, 2))),
                torch.tensor(np.transpose(y, (0, 3, 1, 2))),
                alex_sd, lin_sd).numpy()
            np.testing.assert_allclose(jd, td, rtol=1e-9, atol=1e-10)
            assert (jd > 0).all()


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))
