// Native host-side kernels for the synthetic-data degradation pipeline.
//
// The reference's data loader runs its hot loops through scipy/numpy
// (kernel blurs with mirror padding, blocked DCT JPEG round-trips) —
// single-threaded per worker. These C++ kernels (OpenMP-parallel,
// exposed via a C ABI for ctypes) keep the host synthesis pipeline fast
// enough to feed TPU training without oversubscribing worker processes.
//
// Build: make -C native        (produces libtextdegrade.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Mirror-padded (reflect-101) 2D convolution of an HxWxC float image with
// a KxK kernel. Matches scipy.ndimage.convolve(mode='mirror') for
// symmetric kernels (the pipelines only use centro-symmetric kernels).
void conv2d_mirror(const float* img, int h, int w, int c,
                   const float* kernel, int k, float* out) {
  const int r = k / 2;
#pragma omp parallel for schedule(static)
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      for (int ch = 0; ch < c; ++ch) {
        double acc = 0.0;
        for (int ky = 0; ky < k; ++ky) {
          int sy = y + ky - r;
          if (sy < 0) sy = -sy;                    // reflect-101
          if (sy >= h) sy = 2 * h - 2 - sy;
          for (int kx = 0; kx < k; ++kx) {
            int sx = x + kx - r;
            if (sx < 0) sx = -sx;
            if (sx >= w) sx = 2 * w - 2 - sx;
            acc += static_cast<double>(img[(sy * w + sx) * c + ch]) *
                   kernel[ky * k + kx];
          }
        }
        out[(y * w + x) * c + ch] = static_cast<float>(acc);
      }
    }
  }
}

namespace {

// 8x8 DCT-II basis, D[u][x] = 0.5 * a(u) * cos((2x+1) u pi / 16)
struct DctBasis {
  double d[8][8];
  DctBasis() {
    for (int u = 0; u < 8; ++u) {
      double a = (u == 0) ? 1.0 / std::sqrt(2.0) : 1.0;
      for (int x = 0; x < 8; ++x)
        d[u][x] = 0.5 * a * std::cos((2 * x + 1) * u * M_PI / 16.0);
    }
  }
};
const DctBasis kDct;

// One plane pass: blockwise DCT -> quantize(round) -> dequantize -> IDCT.
// plane is HxW (multiples of 8); q is the 8x8 table already scaled.
void plane_pass(float* plane, int h, int w, const float* q) {
#pragma omp parallel for schedule(static)
  for (int by = 0; by < h / 8; ++by) {
    for (int bx = 0; bx < w / 8; ++bx) {
      double blk[8][8], tmp[8][8], coef[8][8];
      for (int y = 0; y < 8; ++y)
        for (int x = 0; x < 8; ++x)
          blk[y][x] = plane[(by * 8 + y) * w + bx * 8 + x] - 128.0;
      // coef = D * blk * D^T
      for (int u = 0; u < 8; ++u)
        for (int x = 0; x < 8; ++x) {
          double s = 0;
          for (int y = 0; y < 8; ++y) s += kDct.d[u][y] * blk[y][x];
          tmp[u][x] = s;
        }
      for (int u = 0; u < 8; ++u)
        for (int v = 0; v < 8; ++v) {
          double s = 0;
          for (int x = 0; x < 8; ++x) s += tmp[u][x] * kDct.d[v][x];
          double qq = q[u * 8 + v];
          coef[u][v] = std::nearbyint(s / qq) * qq;  // round-half-even
        }
      // blk = D^T * coef * D
      for (int x = 0; x < 8; ++x)
        for (int v = 0; v < 8; ++v) {
          double s = 0;
          for (int u = 0; u < 8; ++u) s += kDct.d[u][x] * coef[u][v];
          tmp[x][v] = s;
        }
      for (int y = 0; y < 8; ++y)
        for (int x = 0; x < 8; ++x) {
          double s = 0;
          for (int v = 0; v < 8; ++v) s += tmp[y][v] * kDct.d[v][x];
          plane[(by * 8 + y) * w + bx * 8 + x] =
              static_cast<float>(s + 128.0);
        }
    }
  }
}

}  // namespace

// JPEG round trip of an HxWx3 RGB [0,1] image (H, W multiples of 16).
// y_q / c_q: quality-scaled 8x8 quantization tables. In/out: img.
void jpeg_roundtrip(float* img, int h, int w, const float* y_q,
                    const float* c_q) {
  const int hw = h * w;
  float* y = new float[hw];
  float* cb = new float[hw / 4];
  float* cr = new float[hw / 4];

  // RGB -> YCbCr (JPEG) with 2x2 chroma average pooling
#pragma omp parallel for schedule(static)
  for (int i = 0; i < hw; ++i) {
    float r = img[i * 3] * 255.f, g = img[i * 3 + 1] * 255.f,
          b = img[i * 3 + 2] * 255.f;
    y[i] = 0.299f * r + 0.587f * g + 0.114f * b;
    img[i * 3] = -0.168736f * r - 0.331264f * g + 0.5f * b + 128.f;  // cb
    img[i * 3 + 1] = 0.5f * r - 0.418688f * g - 0.081312f * b + 128.f;
  }
#pragma omp parallel for schedule(static)
  for (int yy = 0; yy < h / 2; ++yy)
    for (int xx = 0; xx < w / 2; ++xx) {
      int i00 = (2 * yy) * w + 2 * xx, i01 = i00 + 1;
      int i10 = i00 + w, i11 = i10 + 1;
      cb[yy * (w / 2) + xx] = 0.25f * (img[i00 * 3] + img[i01 * 3] +
                                       img[i10 * 3] + img[i11 * 3]);
      cr[yy * (w / 2) + xx] =
          0.25f * (img[i00 * 3 + 1] + img[i01 * 3 + 1] +
                   img[i10 * 3 + 1] + img[i11 * 3 + 1]);
    }

  plane_pass(y, h, w, y_q);
  plane_pass(cb, h / 2, w / 2, c_q);
  plane_pass(cr, h / 2, w / 2, c_q);

  // upsample chroma (nearest), YCbCr -> RGB, clamp
#pragma omp parallel for schedule(static)
  for (int yy = 0; yy < h; ++yy)
    for (int xx = 0; xx < w; ++xx) {
      int i = yy * w + xx;
      float Y = y[i];
      float Cb = cb[(yy / 2) * (w / 2) + xx / 2] - 128.f;
      float Cr = cr[(yy / 2) * (w / 2) + xx / 2] - 128.f;
      float r = Y + 1.402f * Cr;
      float g = Y - 0.344136f * Cb - 0.714136f * Cr;
      float b = Y + 1.772f * Cb;
      img[i * 3] = std::min(std::max(r / 255.f, 0.f), 1.f);
      img[i * 3 + 1] = std::min(std::max(g / 255.f, 0.f), 1.f);
      img[i * 3 + 2] = std::min(std::max(b / 255.f, 0.f), 1.f);
    }

  delete[] y;
  delete[] cb;
  delete[] cr;
}

}  // extern "C"
