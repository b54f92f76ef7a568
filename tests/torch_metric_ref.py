"""Pure-torch oracles for the metric networks (FID InceptionV3, LPIPS
AlexNet, VGG19 taps) + synthetic torchvision-key state_dict builders.

These re-implement the torchvision architectures functionally (no
torchvision dependency) so the converter scripts
(scripts/convert_{vgg,inception,lpips}_weights.py) can be validated
end-to-end against the flax consumers with random-but-correctly-shaped
weights. Architecture sources: torchvision inception_v3 as consumed by the
reference FID script (reference script/inception.py:1-138), torchvision
alexnet + LPIPS net-lin taps (reference script/metrics.py:443-507),
torchvision vgg19.features (reference external_function.py:333-344).
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

# ---------------------------------------------------------------------------
# InceptionV3 (torchvision graph, BN eps=1e-3, conv bias-free)
# ---------------------------------------------------------------------------

# branch conv specs per block type: name → list of
#   (submodule, in_ch, out_ch, (kh, kw), stride, (ph, pw))
# in_ch None = block input channels.


def _conv_bn(x, sd, path, stride=1, pad=(0, 0)):
    w = sd[f"{path}.conv.weight"]
    x = F.conv2d(x, w, None, stride=stride, padding=pad)
    x = F.batch_norm(
        x, sd[f"{path}.bn.running_mean"], sd[f"{path}.bn.running_var"],
        sd[f"{path}.bn.weight"], sd[f"{path}.bn.bias"],
        training=False, eps=1e-3,
    )
    return F.relu(x)


def _mixed_a(x, sd, p):
    b1 = _conv_bn(x, sd, f"{p}.branch1x1")
    b5 = _conv_bn(x, sd, f"{p}.branch5x5_1")
    b5 = _conv_bn(b5, sd, f"{p}.branch5x5_2", pad=2)
    bd = _conv_bn(x, sd, f"{p}.branch3x3dbl_1")
    bd = _conv_bn(bd, sd, f"{p}.branch3x3dbl_2", pad=1)
    bd = _conv_bn(bd, sd, f"{p}.branch3x3dbl_3", pad=1)
    bp = F.avg_pool2d(x, 3, stride=1, padding=1)
    bp = _conv_bn(bp, sd, f"{p}.branch_pool")
    return torch.cat([b1, b5, bd, bp], dim=1)


def _mixed_b(x, sd, p):
    b3 = _conv_bn(x, sd, f"{p}.branch3x3", stride=2)
    bd = _conv_bn(x, sd, f"{p}.branch3x3dbl_1")
    bd = _conv_bn(bd, sd, f"{p}.branch3x3dbl_2", pad=1)
    bd = _conv_bn(bd, sd, f"{p}.branch3x3dbl_3", stride=2)
    bp = F.max_pool2d(x, 3, stride=2)
    return torch.cat([b3, bd, bp], dim=1)


def _mixed_c(x, sd, p):
    b1 = _conv_bn(x, sd, f"{p}.branch1x1")
    b7 = _conv_bn(x, sd, f"{p}.branch7x7_1")
    b7 = _conv_bn(b7, sd, f"{p}.branch7x7_2", pad=(0, 3))
    b7 = _conv_bn(b7, sd, f"{p}.branch7x7_3", pad=(3, 0))
    bd = _conv_bn(x, sd, f"{p}.branch7x7dbl_1")
    bd = _conv_bn(bd, sd, f"{p}.branch7x7dbl_2", pad=(3, 0))
    bd = _conv_bn(bd, sd, f"{p}.branch7x7dbl_3", pad=(0, 3))
    bd = _conv_bn(bd, sd, f"{p}.branch7x7dbl_4", pad=(3, 0))
    bd = _conv_bn(bd, sd, f"{p}.branch7x7dbl_5", pad=(0, 3))
    bp = F.avg_pool2d(x, 3, stride=1, padding=1)
    bp = _conv_bn(bp, sd, f"{p}.branch_pool")
    return torch.cat([b1, b7, bd, bp], dim=1)


def _mixed_d(x, sd, p):
    b3 = _conv_bn(x, sd, f"{p}.branch3x3_1")
    b3 = _conv_bn(b3, sd, f"{p}.branch3x3_2", stride=2)
    b7 = _conv_bn(x, sd, f"{p}.branch7x7x3_1")
    b7 = _conv_bn(b7, sd, f"{p}.branch7x7x3_2", pad=(0, 3))
    b7 = _conv_bn(b7, sd, f"{p}.branch7x7x3_3", pad=(3, 0))
    b7 = _conv_bn(b7, sd, f"{p}.branch7x7x3_4", stride=2)
    bp = F.max_pool2d(x, 3, stride=2)
    return torch.cat([b3, b7, bp], dim=1)


def _mixed_e(x, sd, p):
    b1 = _conv_bn(x, sd, f"{p}.branch1x1")
    b3 = _conv_bn(x, sd, f"{p}.branch3x3_1")
    b3a = _conv_bn(b3, sd, f"{p}.branch3x3_2a", pad=(0, 1))
    b3b = _conv_bn(b3, sd, f"{p}.branch3x3_2b", pad=(1, 0))
    b3 = torch.cat([b3a, b3b], dim=1)
    bd = _conv_bn(x, sd, f"{p}.branch3x3dbl_1")
    bd = _conv_bn(bd, sd, f"{p}.branch3x3dbl_2", pad=1)
    bda = _conv_bn(bd, sd, f"{p}.branch3x3dbl_3a", pad=(0, 1))
    bdb = _conv_bn(bd, sd, f"{p}.branch3x3dbl_3b", pad=(1, 0))
    bd = torch.cat([bda, bdb], dim=1)
    bp = F.avg_pool2d(x, 3, stride=1, padding=1)
    bp = _conv_bn(bp, sd, f"{p}.branch_pool")
    return torch.cat([b1, b3, bd, bp], dim=1)


def inception_pool3_torch(x: torch.Tensor, sd) -> torch.Tensor:
    """x (B, 3, H, W) in [0,1] → (B, 2048); H=W≥75."""
    x = 2 * x - 1
    x = _conv_bn(x, sd, "Conv2d_1a_3x3", stride=2)
    x = _conv_bn(x, sd, "Conv2d_2a_3x3")
    x = _conv_bn(x, sd, "Conv2d_2b_3x3", pad=1)
    x = F.max_pool2d(x, 3, stride=2)
    x = _conv_bn(x, sd, "Conv2d_3b_1x1")
    x = _conv_bn(x, sd, "Conv2d_4a_3x3")
    x = F.max_pool2d(x, 3, stride=2)
    x = _mixed_a(x, sd, "Mixed_5b")
    x = _mixed_a(x, sd, "Mixed_5c")
    x = _mixed_a(x, sd, "Mixed_5d")
    x = _mixed_b(x, sd, "Mixed_6a")
    x = _mixed_c(x, sd, "Mixed_6b")
    x = _mixed_c(x, sd, "Mixed_6c")
    x = _mixed_c(x, sd, "Mixed_6d")
    x = _mixed_c(x, sd, "Mixed_6e")
    x = _mixed_d(x, sd, "Mixed_7a")
    x = _mixed_e(x, sd, "Mixed_7b")
    x = _mixed_e(x, sd, "Mixed_7c")
    return x.mean(dim=(2, 3))


# (path, in_ch, out_ch, (kh, kw)) for every conv in the feature extractor —
# used to build a synthetic torchvision-key state_dict.
def _inception_conv_table():
    t = []

    def c(p, i, o, k):
        t.append((p, i, o, (k, k) if isinstance(k, int) else k))

    c("Conv2d_1a_3x3", 3, 32, 3)
    c("Conv2d_2a_3x3", 32, 32, 3)
    c("Conv2d_2b_3x3", 32, 64, 3)
    c("Conv2d_3b_1x1", 64, 80, 1)
    c("Conv2d_4a_3x3", 80, 192, 3)
    for p, cin, pool in (("Mixed_5b", 192, 32), ("Mixed_5c", 256, 64),
                         ("Mixed_5d", 288, 64)):
        c(f"{p}.branch1x1", cin, 64, 1)
        c(f"{p}.branch5x5_1", cin, 48, 1)
        c(f"{p}.branch5x5_2", 48, 64, 5)
        c(f"{p}.branch3x3dbl_1", cin, 64, 1)
        c(f"{p}.branch3x3dbl_2", 64, 96, 3)
        c(f"{p}.branch3x3dbl_3", 96, 96, 3)
        c(f"{p}.branch_pool", cin, pool, 1)
    c("Mixed_6a.branch3x3", 288, 384, 3)
    c("Mixed_6a.branch3x3dbl_1", 288, 64, 1)
    c("Mixed_6a.branch3x3dbl_2", 64, 96, 3)
    c("Mixed_6a.branch3x3dbl_3", 96, 96, 3)
    for p, c7 in (("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160),
                  ("Mixed_6e", 192)):
        c(f"{p}.branch1x1", 768, 192, 1)
        c(f"{p}.branch7x7_1", 768, c7, 1)
        c(f"{p}.branch7x7_2", c7, c7, (1, 7))
        c(f"{p}.branch7x7_3", c7, 192, (7, 1))
        c(f"{p}.branch7x7dbl_1", 768, c7, 1)
        c(f"{p}.branch7x7dbl_2", c7, c7, (7, 1))
        c(f"{p}.branch7x7dbl_3", c7, c7, (1, 7))
        c(f"{p}.branch7x7dbl_4", c7, c7, (7, 1))
        c(f"{p}.branch7x7dbl_5", c7, 192, (1, 7))
        c(f"{p}.branch_pool", 768, 192, 1)
    c("Mixed_7a.branch3x3_1", 768, 192, 1)
    c("Mixed_7a.branch3x3_2", 192, 320, 3)
    c("Mixed_7a.branch7x7x3_1", 768, 192, 1)
    c("Mixed_7a.branch7x7x3_2", 192, 192, (1, 7))
    c("Mixed_7a.branch7x7x3_3", 192, 192, (7, 1))
    c("Mixed_7a.branch7x7x3_4", 192, 192, 3)
    for p, cin in (("Mixed_7b", 1280), ("Mixed_7c", 2048)):
        c(f"{p}.branch1x1", cin, 320, 1)
        c(f"{p}.branch3x3_1", cin, 384, 1)
        c(f"{p}.branch3x3_2a", 384, 384, (1, 3))
        c(f"{p}.branch3x3_2b", 384, 384, (3, 1))
        c(f"{p}.branch3x3dbl_1", cin, 448, 1)
        c(f"{p}.branch3x3dbl_2", 448, 384, 3)
        c(f"{p}.branch3x3dbl_3a", 384, 384, (1, 3))
        c(f"{p}.branch3x3dbl_3b", 384, 384, (3, 1))
        c(f"{p}.branch_pool", cin, 192, 1)
    return t


def build_inception_sd(seed: int = 0, dtype=torch.float64):
    """Synthetic torchvision-key inception_v3 state_dict (feature convs)."""
    rng = np.random.RandomState(seed)
    sd = {}
    for path, cin, cout, (kh, kw) in _inception_conv_table():
        fan = cin * kh * kw
        sd[f"{path}.conv.weight"] = torch.tensor(
            rng.standard_normal((cout, cin, kh, kw)) / np.sqrt(fan),
            dtype=dtype)
        sd[f"{path}.bn.weight"] = torch.tensor(
            0.5 + rng.rand(cout), dtype=dtype)
        sd[f"{path}.bn.bias"] = torch.tensor(
            rng.standard_normal(cout) * 0.1, dtype=dtype)
        sd[f"{path}.bn.running_mean"] = torch.tensor(
            rng.standard_normal(cout) * 0.1, dtype=dtype)
        sd[f"{path}.bn.running_var"] = torch.tensor(
            0.5 + rng.rand(cout), dtype=dtype)
        sd[f"{path}.bn.num_batches_tracked"] = torch.tensor(0)
    return sd


# ---------------------------------------------------------------------------
# LPIPS (net-lin, alex)
# ---------------------------------------------------------------------------

_ALEX = [  # (tv features index, in, out, kernel, stride, pad)
    (0, 3, 64, 11, 4, 2),
    (3, 64, 192, 5, 1, 2),
    (6, 192, 384, 3, 1, 1),
    (8, 384, 256, 3, 1, 1),
    (10, 256, 256, 3, 1, 1),
]
_LPIPS_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_LPIPS_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def build_alexnet_sd(seed: int = 1, dtype=torch.float64):
    rng = np.random.RandomState(seed)
    sd = {}
    for idx, cin, cout, k, _, _ in _ALEX:
        fan = cin * k * k
        sd[f"features.{idx}.weight"] = torch.tensor(
            rng.standard_normal((cout, cin, k, k)) / np.sqrt(fan), dtype=dtype)
        sd[f"features.{idx}.bias"] = torch.tensor(
            rng.standard_normal(cout) * 0.1, dtype=dtype)
    return sd


def build_lpips_lin_sd(seed: int = 2, dtype=torch.float64):
    rng = np.random.RandomState(seed)
    sd = {}
    for i, (_, _, cout, _, _, _) in enumerate(_ALEX):
        sd[f"lin{i}.model.1.weight"] = torch.tensor(
            np.abs(rng.standard_normal((1, cout, 1, 1))) / np.sqrt(cout),
            dtype=dtype)
    return sd


def alexnet_taps_torch(x, sd):
    taps = []
    for i, (idx, _, _, _, s, p) in enumerate(_ALEX):
        x = F.conv2d(x, sd[f"features.{idx}.weight"],
                     sd[f"features.{idx}.bias"], stride=s, padding=p)
        x = F.relu(x)
        taps.append(x)
        if i in (0, 1):
            x = F.max_pool2d(x, 3, stride=2)
    return taps


def lpips_torch(x, y, alex_sd, lin_sd):
    """x, y (B, 3, H, W) in [-1,1] → (B,) LPIPS distances
    (reference script/metrics.py:443-507 semantics)."""
    dtype = x.dtype
    xin = (x - _LPIPS_SHIFT.to(dtype)) / _LPIPS_SCALE.to(dtype)
    yin = (y - _LPIPS_SHIFT.to(dtype)) / _LPIPS_SCALE.to(dtype)
    fx = alexnet_taps_torch(xin, alex_sd)
    fy = alexnet_taps_torch(yin, alex_sd)
    total = 0.0
    for i, (tx, ty) in enumerate(zip(fx, fy)):
        nx = tx / (tx.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        ny = ty / (ty.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        d = (nx - ny) ** 2
        lin = lin_sd[f"lin{i}.model.1.weight"].view(1, -1, 1, 1).to(dtype)
        total = total + (d * lin).sum(dim=1).mean(dim=(1, 2))
    return total


# ---------------------------------------------------------------------------
# VGG19 (torchvision .features keys)
# ---------------------------------------------------------------------------

_VGG_IDX = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]
_VGG_CH = [64, 64, 128, 128, 256, 256, 256, 256,
           512, 512, 512, 512, 512, 512, 512, 512]
_VGG_NAMES = [
    "relu1_1", "relu1_2", "relu2_1", "relu2_2",
    "relu3_1", "relu3_2", "relu3_3", "relu3_4",
    "relu4_1", "relu4_2", "relu4_3", "relu4_4",
    "relu5_1", "relu5_2", "relu5_3", "relu5_4",
]
_VGG_POOL_AFTER = {1, 3, 7, 11}   # maxpool after these conv indices


def build_vgg19_tv_sd(seed: int = 3, dtype=torch.float64):
    rng = np.random.RandomState(seed)
    sd = {}
    cin = 3
    for idx, cout in zip(_VGG_IDX, _VGG_CH):
        fan = cin * 9
        sd[f"features.{idx}.weight"] = torch.tensor(
            rng.standard_normal((cout, cin, 3, 3)) / np.sqrt(fan), dtype=dtype)
        sd[f"features.{idx}.bias"] = torch.tensor(
            rng.standard_normal(cout) * 0.1, dtype=dtype)
        cin = cout
    return sd


def vgg19_taps_torch(x, sd):
    """x (B, 3, H, W) → {relu1_1 … relu5_4} (reference feeds [-1,1] raw,
    external_function.py:333-344)."""
    taps = {}
    for i, (idx, name) in enumerate(zip(_VGG_IDX, _VGG_NAMES)):
        x = F.conv2d(x, sd[f"features.{idx}.weight"],
                     sd[f"features.{idx}.bias"], padding=1)
        x = F.relu(x)
        taps[name] = x
        if i in _VGG_POOL_AFTER:
            x = F.max_pool2d(x, 2, stride=2)
    return taps
