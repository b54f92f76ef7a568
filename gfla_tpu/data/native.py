"""ctypes binding for the native host data-path library (native/gfla_host.cc).

Builds the .so on first use (make -C native) and falls back to the pure
Python/PIL pipeline when a toolchain is unavailable. The fused
affine+resize+normalize pass replaces the loader's 4-pass PIL chain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgfla_host.so")


@lru_cache(maxsize=1)
def load_library() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.affine_resize_normalize.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int,
        f32p, ctypes.c_int, ctypes.c_int,
        f32p, ctypes.c_float, ctypes.c_float, ctypes.c_float,
    ]
    lib.gaussian_heatmaps.argtypes = [
        f32p, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
    ]
    return lib


def available() -> bool:
    return load_library() is not None


_IDENTITY = np.array([1, 0, 0, 0, 1, 0], np.float32)


def affine_resize_normalize(
    src: np.ndarray,
    out_hw: Tuple[int, int],
    inverse_matrix: Optional[np.ndarray] = None,
    fill=(128, 128, 128),
) -> np.ndarray:
    """uint8 (H, W, 3) → float32 (dh, dw, 3) in [-1, 1], one fused pass.

    inverse_matrix: 2×3 output→input mapping in output-scale coordinates
    (the torchvision inverse-affine convention used by
    gfla_tpu.data.affine.inverse_affine_matrix); None = plain resize.
    """
    lib = load_library()
    assert lib is not None, "native library unavailable"
    src = np.ascontiguousarray(src, np.uint8)
    dh, dw = out_hw
    dst = np.empty((dh, dw, 3), np.float32)
    inv = np.ascontiguousarray(
        inverse_matrix if inverse_matrix is not None else _IDENTITY,
        np.float32,
    ).reshape(-1)
    lib.affine_resize_normalize(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        src.shape[0], src.shape[1],
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dh, dw,
        inv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        float(fill[0]), float(fill[1]), float(fill[2]),
    )
    return dst


def gaussian_heatmaps(coords: np.ndarray, h: int, w: int,
                      sigma: float = 6.0) -> np.ndarray:
    """(K, 2) (y, x) coords (negative = missing) → (H, W, K) float32."""
    lib = load_library()
    assert lib is not None, "native library unavailable"
    coords = np.ascontiguousarray(coords, np.float32)
    k = coords.shape[0]
    dst = np.empty((h, w, k), np.float32)
    lib.gaussian_heatmaps(
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), k,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        float(sigma),
    )
    return dst
