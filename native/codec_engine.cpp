// Native host codec engine: batched, multithreaded codec-surrogate round-trips.
//
// Role in the framework: the reference's only native code is third-party codec
// libraries reached through PIL one image at a time (SURVEY.md §2). This
// engine is the framework's own native component: it applies the same
// DCT-quantisation degradation model as the on-device JAX surrogate
// (ddpm_image_restoration_tpu/codecs/surrogate.py) on the host, batched and
// threaded, so the input pipeline can synthesise training pairs without
// entering Python per image and with numerics consistent with the in-sampler
// consistency step.
//
// ABI (ctypes):
//   int codec_surrogate_batch(const float* x, float* out, const int* quality,
//                             const float* strength_mult,
//                             const float* deblock_s, const float* deblock_t,
//                             int b, int h, int w, int codec,
//                             int subsample420, int n_threads);
//     x/out: float32 [B,H,W,3] NHWC in [-1,1]; quality: int32 [B];
//     strength_mult: float32 [B] calibration multipliers (1.0 = uncalibrated);
//     deblock_s/deblock_t: float32 [B] in-loop deblocking strength/threshold
//       per sample (nullptr or s=0 disables — JPEG has no loop filter);
//     codec: 0=jpeg(8x8 Annex-K tables) 1=webp(4x4 flat-ish) 2=avif(8x8 smooth)
//     returns 0 on success.
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC -pthread).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr float kJpegLuma[64] = {
    16, 11, 10, 16, 24,  40,  51,  61,  12, 12, 14, 19, 26,  58,  60,  55,
    14, 13, 16, 24, 40,  57,  69,  56,  14, 17, 22, 29, 51,  87,  80,  62,
    18, 22, 37, 56, 68,  109, 103, 77,  24, 35, 55, 64, 81,  104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99};
constexpr float kJpegChroma[64] = {
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99};

// Orthonormal DCT-II matrix, rows = frequencies (matches surrogate.dct_matrix).
void dct_matrix(int n, float* m) {
  for (int k = 0; k < n; ++k) {
    for (int j = 0; j < n; ++j) {
      double v = std::cos(M_PI * (2 * j + 1) * k / (2.0 * n)) *
                 std::sqrt(2.0 / n);
      if (k == 0) v = std::sqrt(1.0 / n);
      m[k * n + j] = static_cast<float>(v);
    }
  }
}

float quality_scale(int q) {  // libjpeg formula, in percent
  q = std::max(1, std::min(100, q));
  return q < 50 ? 5000.0f / q : 200.0f - 2.0f * q;
}

struct Tables {
  int block;
  std::vector<float> luma, chroma;  // base tables, block*block
  std::vector<float> dct;           // block*block orthonormal DCT
};

Tables make_tables(int codec) {
  Tables t;
  if (codec == 0) {  // jpeg
    t.block = 8;
    t.luma.assign(kJpegLuma, kJpegLuma + 64);
    t.chroma.assign(kJpegChroma, kJpegChroma + 64);
  } else if (codec == 1) {  // webp-like: 4x4, 12 + 6*(i+j), chroma *1.4
    t.block = 4;
    t.luma.resize(16);
    t.chroma.resize(16);
    for (int i = 0; i < 4; ++i)
      for (int j = 0; j < 4; ++j) {
        t.luma[i * 4 + j] = 12.0f + 6.0f * (i + j);
        t.chroma[i * 4 + j] = t.luma[i * 4 + j] * 1.4f;
      }
  } else {  // avif-like: 8x8, 14 + 4.5*(i+j), chroma *1.3
    t.block = 8;
    t.luma.resize(64);
    t.chroma.resize(64);
    for (int i = 0; i < 8; ++i)
      for (int j = 0; j < 8; ++j) {
        t.luma[i * 8 + j] = 14.0f + 4.5f * (i + j);
        t.chroma[i * 8 + j] = t.luma[i * 8 + j] * 1.3f;
      }
  }
  t.dct.resize(t.block * t.block);
  dct_matrix(t.block, t.dct.data());
  return t;
}

// plane [h*w] centered; quantise per bxb block: X <- D^T round((D X D^T)/T) T D
void quantise_plane(float* plane, int h, int w, const Tables& tb,
                    const float* qtable) {
  const int b = tb.block;
  const float* d = tb.dct.data();
  std::vector<float> tmp(b * b), coeff(b * b);
  for (int by = 0; by < h; by += b) {
    for (int bx = 0; bx < w; bx += b) {
      // tmp = D * X   (tmp[k][j] = sum_i d[k][i] * X[i][j])
      for (int k = 0; k < b; ++k)
        for (int j = 0; j < b; ++j) {
          float s = 0.f;
          for (int i = 0; i < b; ++i)
            s += d[k * b + i] * plane[(by + i) * w + bx + j];
          tmp[k * b + j] = s;
        }
      // coeff = tmp * D^T ; quantise
      for (int k = 0; k < b; ++k)
        for (int l = 0; l < b; ++l) {
          float s = 0.f;
          for (int j = 0; j < b; ++j) s += tmp[k * b + j] * d[l * b + j];
          float q = qtable[k * b + l];
          coeff[k * b + l] = std::nearbyint(s / q) * q;
        }
      // tmp = D^T * coeff
      for (int i = 0; i < b; ++i)
        for (int l = 0; l < b; ++l) {
          float s = 0.f;
          for (int k = 0; k < b; ++k) s += d[k * b + i] * coeff[k * b + l];
          tmp[i * b + l] = s;
        }
      // X = tmp * D
      for (int i = 0; i < b; ++i)
        for (int j = 0; j < b; ++j) {
          float s = 0.f;
          for (int l = 0; l < b; ++l) s += tmp[i * b + l] * d[l * b + j];
          plane[(by + i) * w + bx + j] = s;
        }
    }
  }
}

// In-loop deblocking approximation, bit-matching surrogate.py::_deblock:
// at every b-aligned boundary, pull the two pixels each side toward the
// boundary average by (s/2, s/4), gated by g = T^2/(T^2 + d^2) so genuine
// edges pass through. Column boundaries first, then row boundaries — the
// same pass order as the jnp twin (axis 2 then axis 1); within a pass all
// four taps are read before any is written.
void deblock_plane(float* p, int h, int w, int b, float s, float t) {
  if (s <= 0.f) return;
  const float t2 = t * t;
  for (int i = 0; i < h; ++i) {  // column (vertical) boundaries
    float* row = p + static_cast<size_t>(i) * w;
    for (int j = b; j <= w - b; j += b) {
      float p1 = row[j - 2], p0 = row[j - 1], q0 = row[j], q1 = row[j + 1];
      float d = q0 - p0;
      float adj = s * (t2 / (t2 + d * d)) * d;
      row[j - 2] = p1 + 0.25f * adj;
      row[j - 1] = p0 + 0.5f * adj;
      row[j] = q0 - 0.5f * adj;
      row[j + 1] = q1 - 0.25f * adj;
    }
  }
  for (int i = b; i <= h - b; i += b) {  // row (horizontal) boundaries
    for (int j = 0; j < w; ++j) {
      float p1 = p[(i - 2) * w + j], p0 = p[(i - 1) * w + j];
      float q0 = p[i * w + j], q1 = p[(i + 1) * w + j];
      float d = q0 - p0;
      float adj = s * (t2 / (t2 + d * d)) * d;
      p[(i - 2) * w + j] = p1 + 0.25f * adj;
      p[(i - 1) * w + j] = p0 + 0.5f * adj;
      p[i * w + j] = q0 - 0.5f * adj;
      p[(i + 1) * w + j] = q1 - 0.25f * adj;
    }
  }
}

void process_image(const float* x, float* out, int h, int w, int quality,
                   float strength_mult, float deblock_s, float deblock_t,
                   const Tables& tb, bool subsample) {
  const int n = h * w;
  std::vector<float> y(n), cb(n), cr(n);
  // RGB [-1,1] -> YCbCr in [0,255] gauge (Y centered at 0 for the DCT)
  for (int i = 0; i < n; ++i) {
    float r = (x[i * 3 + 0] + 1.f) * 0.5f * 255.f;
    float g = (x[i * 3 + 1] + 1.f) * 0.5f * 255.f;
    float b_ = (x[i * 3 + 2] + 1.f) * 0.5f * 255.f;
    y[i] = 0.299f * r + 0.587f * g + 0.114f * b_ - 128.f;
    cb[i] = -0.168736f * r - 0.331264f * g + 0.5f * b_;
    cr[i] = 0.5f * r - 0.418688f * g - 0.081312f * b_;
  }
  if (subsample) {  // smooth 4:2:0 blend, matching the jnp surrogate
    float w420 = std::min(1.0f, std::max(0.0f, (75.0f - quality) / 50.0f));
    if (w420 > 0.f) {
      for (auto* c : {&cb, &cr}) {
        std::vector<float>& ch = *c;
        for (int i = 0; i < h; i += 2)
          for (int j = 0; j < w; j += 2) {
            float m = (ch[i * w + j] + ch[i * w + j + 1] + ch[(i + 1) * w + j] +
                       ch[(i + 1) * w + j + 1]) *
                      0.25f;
            for (int di = 0; di < 2; ++di)
              for (int dj = 0; dj < 2; ++dj) {
                float& v = ch[(i + di) * w + j + dj];
                v = w420 * m + (1.f - w420) * v;
              }
          }
      }
    }
  }
  // scaled tables: floor(base*scale/100 + .5) clipped [1,255], times b/8 gauge
  const int bsq = tb.block * tb.block;
  const float gauge = tb.block / 8.0f;
  std::vector<float> ql(bsq), qc(bsq);
  float s = quality_scale(quality) / 100.0f;
  const float g = gauge * strength_mult;
  for (int i = 0; i < bsq; ++i) {
    ql[i] = std::min(255.f, std::max(1.f, std::floor(tb.luma[i] * s + .5f))) * g;
    qc[i] = std::min(255.f, std::max(1.f, std::floor(tb.chroma[i] * s + .5f))) * g;
  }
  quantise_plane(y.data(), h, w, tb, ql.data());
  quantise_plane(cb.data(), h, w, tb, qc.data());
  quantise_plane(cr.data(), h, w, tb, qc.data());
  deblock_plane(y.data(), h, w, tb.block, deblock_s, deblock_t);
  deblock_plane(cb.data(), h, w, tb.block, deblock_s, deblock_t);
  deblock_plane(cr.data(), h, w, tb.block, deblock_s, deblock_t);
  // back to RGB [-1,1]
  for (int i = 0; i < n; ++i) {
    float yy = y[i] + 128.f;
    float r = yy + 1.402f * cr[i];
    float g = yy - 0.344136f * cb[i] - 0.714136f * cr[i];
    float b_ = yy + 1.772f * cb[i];
    out[i * 3 + 0] = std::min(1.f, std::max(-1.f, r / 255.f * 2.f - 1.f));
    out[i * 3 + 1] = std::min(1.f, std::max(-1.f, g / 255.f * 2.f - 1.f));
    out[i * 3 + 2] = std::min(1.f, std::max(-1.f, b_ / 255.f * 2.f - 1.f));
  }
}

}  // namespace

extern "C" int codec_surrogate_batch(const float* x, float* out,
                                     const int32_t* quality,
                                     const float* strength_mult,
                                     const float* deblock_s,
                                     const float* deblock_t, int b, int h,
                                     int w, int codec, int subsample420,
                                     int n_threads) {
  if (b <= 0 || h <= 0 || w <= 0) return 1;
  Tables tb = make_tables(codec);
  if (h % tb.block || w % tb.block || (subsample420 && (h % 2 || w % 2)))
    return 2;
  if (n_threads <= 0)
    n_threads = std::max(1u, std::thread::hardware_concurrency());
  n_threads = std::min(n_threads, b);

  std::vector<std::thread> workers;
  const size_t stride = static_cast<size_t>(h) * w * 3;
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([&, t]() {
      for (int i = t; i < b; i += n_threads)
        process_image(x + i * stride, out + i * stride, h, w, quality[i],
                      strength_mult ? strength_mult[i] : 1.0f,
                      deblock_s ? deblock_s[i] : 0.0f,
                      deblock_t ? deblock_t[i] : 8.0f, tb, subsample420 != 0);
    });
  }
  for (auto& th : workers) th.join();
  return 0;
}

extern "C" int codec_engine_version() { return 3; }
