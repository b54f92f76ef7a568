"""Native host library tests (skipped when no toolchain)."""

import numpy as np
import pytest

from gfla_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_identity_normalize_exact():
    rng = np.random.RandomState(0)
    src = (rng.rand(40, 30, 3) * 255).astype(np.uint8)
    out = native.affine_resize_normalize(src, (40, 30))
    np.testing.assert_array_equal(out, src.astype(np.float32) / 127.5 - 1.0)


def test_resize_matches_manual_bilinear():
    rng = np.random.RandomState(1)
    src = (rng.rand(8, 8, 3) * 255).astype(np.uint8)
    out = native.affine_resize_normalize(src, (4, 4))
    # manual bilinear at the same sample positions (x*sw/dw, y*sh/dh)
    f = src.astype(np.float64)
    for y in range(4):
        for x in range(4):
            fy, fx = y * 2.0, x * 2.0
            want = f[int(fy), int(fx)] / 127.5 - 1.0
            np.testing.assert_allclose(out[y, x], want, atol=1e-5)


def test_affine_shift():
    src = np.zeros((16, 16, 3), np.uint8)
    src[4, 6] = 255
    # pure translation by (+2, +1): output px maps back to src px -2,-1
    inv = np.array([1, 0, -2, 0, 1, -1], np.float32)
    out = native.affine_resize_normalize(src, (16, 16), inv, fill=(0, 0, 0))
    got = np.unravel_index(np.argmax(out[..., 0]), (16, 16))
    assert got == (5, 8)


def test_animation_transform_image_matches_pil(monkeypatch):
    """AnimationDatasetBase.transform_image: fused native path ≈ PIL path.

    Bicubic-resize-then-bilinear-warp (PIL) vs one fused bilinear warp
    (native) differ per pixel, so compare on a smooth gradient where both
    resamplers agree, for identity and a shifted/scaled/rotated affine.
    """
    from PIL import Image

    from gfla_tpu.data import animation_data

    ds = animation_data.AnimationDatasetBase.__new__(
        animation_data.AnimationDatasetBase
    )
    ds.load_size = (32, 24)
    yy, xx = np.meshgrid(np.linspace(0, 255, 48), np.linspace(0, 255, 40),
                         indexing="ij")
    smooth = np.stack([yy, xx, (yy + xx) / 2], -1).astype(np.uint8)
    img = Image.fromarray(smooth)
    for affine in (None, {"angle": 5.0, "shift": (2.0, -1.0), "scale": 1.1}):
        got = ds.transform_image(img, affine=affine)
        monkeypatch.setattr(native, "available", lambda: False)
        want = ds.transform_image(img, affine=affine)
        monkeypatch.undo()
        assert got.shape == want.shape == (32, 24, 3)
        # ignore a 2px border (fill handling at the warp edge differs)
        d = np.abs(got - want)[2:-2, 2:-2]
        assert d.mean() < 0.02 and np.percentile(d, 99) < 0.1


def test_heatmaps_match_numpy():
    coords = np.array([[3.0, 4.0], [10.0, 2.0], [-1.0, 5.0]], np.float32)
    hm = native.gaussian_heatmaps(coords, 16, 16, sigma=2.0)
    yy, xx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
    for i, (y, x) in enumerate(coords):
        if y < 0:
            assert hm[..., i].max() == 0
            continue
        ref = np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / 8.0)
        np.testing.assert_allclose(hm[..., i], ref, atol=1e-5)
