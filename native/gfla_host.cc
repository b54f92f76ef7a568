// gfla_host — native host-side data-path kernels for the gfla_tpu loader.
//
// The reference's native code is CUDA compute kernels (replaced by
// XLA/Pallas on TPU); on the host side its torch DataLoader workers did
// PIL resize → PIL affine → ToTensor → Normalize as four separate passes.
// This library fuses the whole image pipeline into one cache-friendly
// OpenMP pass over the output, and provides batched Gaussian-heatmap
// rendering for torch-format consumers (the TPU path encodes heatmaps
// on-device instead).
//
// Build: make -C native   (g++ -O3 -fopenmp -shared)
// Python binding: gfla_tpu/data/native.py via ctypes.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Fused inverse-affine warp + bilinear resize + [-1,1] normalization.
//   src: HxWx3 uint8, dst: dh x dw x 3 float32
//   inv: row-major 2x3 matrix mapping OUTPUT pixel (x, y, 1) -> source
//        coords in *output-scale* units; the source lookup additionally
//        rescales by (sw/dw, sh/dh). Pass identity for plain resize.
//   fill: RGB fill value (0..255) for out-of-bounds samples.
void affine_resize_normalize(
    const uint8_t* src, int sh, int sw,
    float* dst, int dh, int dw,
    const float* inv, float fill_r, float fill_g, float fill_b) {
  const float sx = static_cast<float>(sw) / dw;
  const float sy = static_cast<float>(sh) / dh;
  const float fill[3] = {fill_r, fill_g, fill_b};
#pragma omp parallel for schedule(static)
  for (int y = 0; y < dh; ++y) {
    float* row = dst + static_cast<int64_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      // output px -> pre-resize coords (output scale)
      const float ox = inv[0] * x + inv[1] * y + inv[2];
      const float oy = inv[3] * x + inv[4] * y + inv[5];
      // -> source pixel coords
      const float fxs = ox * sx;
      const float fys = oy * sy;
      const int x0 = static_cast<int>(std::floor(fxs));
      const int y0 = static_cast<int>(std::floor(fys));
      const float ax = fxs - x0;
      const float ay = fys - y0;
      float out[3];
      if (x0 < -1 || y0 < -1 || x0 >= sw || y0 >= sh) {
        out[0] = fill[0]; out[1] = fill[1]; out[2] = fill[2];
      } else {
        for (int c = 0; c < 3; ++c) {
          auto tap = [&](int yy, int xx) -> float {
            if (xx < 0 || yy < 0 || xx >= sw || yy >= sh) return fill[c];
            return static_cast<float>(
                src[(static_cast<int64_t>(yy) * sw + xx) * 3 + c]);
          };
          out[c] = (1 - ay) * ((1 - ax) * tap(y0, x0) + ax * tap(y0, x0 + 1))
                 + ay * ((1 - ax) * tap(y0 + 1, x0) + ax * tap(y0 + 1, x0 + 1));
        }
      }
      float* px = row + x * 3;
      px[0] = out[0] / 127.5f - 1.0f;
      px[1] = out[1] / 127.5f - 1.0f;
      px[2] = out[2] / 127.5f - 1.0f;
    }
  }
}

// Batched Gaussian keypoint heatmaps: coords (K, 2) as (y, x); missing
// joints marked with coord < 0 produce zero maps. dst: (H, W, K).
void gaussian_heatmaps(
    const float* coords, int k,
    float* dst, int h, int w, float sigma) {
  const float inv2s2 = 1.0f / (2.0f * sigma * sigma);
#pragma omp parallel for schedule(static)
  for (int y = 0; y < h; ++y) {
    float* row = dst + static_cast<int64_t>(y) * w * k;
    for (int x = 0; x < w; ++x) {
      float* px = row + static_cast<int64_t>(x) * k;
      for (int j = 0; j < k; ++j) {
        const float ky = coords[2 * j];
        const float kx = coords[2 * j + 1];
        if (ky < 0.0f || kx < 0.0f) {
          px[j] = 0.0f;
          continue;
        }
        const float dy = y - ky;
        const float dx = x - kx;
        px[j] = std::exp(-(dy * dy + dx * dx) * inv2s2);
      }
    }
  }
}

}  // extern "C"
