"""FID — Frechet Inception Distance.

Capability parity with reference script/metrics.py:22-250: InceptionV3
pool3 (2048-d) activations over generated and real image directories,
statistics (μ, Σ) cached to statistics.npz for the real set, Frechet
distance via scipy matrix sqrt. Batched activation extraction runs jitted
on the accelerator.
"""

from __future__ import annotations

import os
import warnings
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg

from gfla_tpu.metrics.inception import inception_features, load_inception_params
from gfla_tpu.metrics.reconstruction import get_image_list


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6) -> float:
    """d² = |μ1−μ2|² + Tr(Σ1 + Σ2 − 2√(Σ1Σ2)) (script/metrics.py:150-198)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            warnings.warn(f"FID sqrtm has imaginary component {m}")
        covmean = covmean.real
    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
        - 2 * np.trace(covmean)
    )


class FID:
    def __init__(self, batch_size: int = 64, allow_fallback: bool = False):
        self.batch_size = batch_size
        self.variables, self.has_weights = load_inception_params()
        self.fallback = not self.has_weights
        if self.fallback:
            msg = (
                "inception_v3.npz asset missing — FID values would use a "
                "deterministic random feature net and are NOT comparable "
                "to published numbers. Run "
                "scripts/convert_inception_weights.py once."
            )
            if not allow_fallback:
                raise RuntimeError(
                    msg + " Pass --allow_fallback_weights (CLI) or "
                    "allow_fallback=True to proceed anyway; outputs will "
                    "be stamped FALLBACK-WEIGHTS."
                )
            warnings.warn(msg)
        self._features = jax.jit(
            lambda x: inception_features(self.variables, x)
        )

    def _load_batch(self, paths: List[str]) -> np.ndarray:
        from PIL import Image

        imgs = []
        for p in paths:
            img = Image.open(p).convert("RGB").resize((299, 299),
                                                      Image.BILINEAR)
            imgs.append(np.asarray(img, np.float32) / 255.0)
        return np.stack(imgs)

    def get_activations(self, image_list: List[str], verbose=False) -> np.ndarray:
        acts = []
        bs = self.batch_size
        for s in range(0, len(image_list), bs):
            chunk = image_list[s : s + bs]
            batch = self._load_batch(chunk)
            if len(chunk) < bs:  # pad to keep one compiled shape
                batch = np.concatenate(
                    [batch, np.zeros((bs - len(chunk), 299, 299, 3),
                                     np.float32)]
                )
            out = np.asarray(self._features(jnp.asarray(batch)))
            acts.append(out[: len(chunk)])
            if verbose:
                print(f"\rFID activations {s + len(chunk)}/{len(image_list)}",
                      end="", flush=True)
        if verbose:
            print()
        return np.concatenate(acts)

    def calculate_activation_statistics(self, image_list, verbose=False):
        act = self.get_activations(image_list, verbose)
        return act.mean(axis=0), np.cov(act, rowvar=False)

    def compute_statistics_of_path(self, path: str, verbose=False,
                                   cache: bool = True):
        """Real-set statistics cached next to the images
        (script/metrics.py:199-250: statistics.npz)."""
        npz = os.path.join(path, "statistics.npz") if os.path.isdir(path) \
            else None
        if npz and os.path.exists(npz):
            f = np.load(npz)
            return f["mu"], f["sigma"]
        mu, sigma = self.calculate_activation_statistics(
            sorted(get_image_list(path)), verbose
        )
        if npz and cache:
            try:
                np.savez(npz, mu=mu, sigma=sigma)
            except OSError:
                pass
        return mu, sigma

    def calculate_from_disk(self, generated_path: str, gt_path: str,
                            verbose: bool = True) -> float:
        m1, s1 = self.compute_statistics_of_path(gt_path, verbose)
        m2, s2 = self.calculate_activation_statistics(
            sorted(get_image_list(generated_path)), verbose
        )
        fid = calculate_frechet_distance(m1, s1, m2, s2)
        if verbose:
            print(f"FID: {fid:.4f}")
        return fid
