// mmu_native: C++ host-side data-pipeline kernels.
//
// The reference's host pipeline runs through torchvision/HF-processor native
// code (SURVEY.md §2.9 "torch eager/cuDNN kernels ... image preprocessing").
// This library is the TPU-framework analog: the collator/preprocess hot
// paths as native kernels behind a C ABI (ctypes — no pybind11 in the
// image).  Python fallbacks exist for every entry point.
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>

extern "C" {

// ---------------------------------------------------------------------------
// Batched pad + label-mask (collator core, mm/dataset.py:324-341 semantics).
//
// tokens: concatenated token streams; offsets[i]..offsets[i+1] delimit row i.
// Fills input_ids/attention/labels [B, S]:
//   left padding (pad_left=1) or right; labels = ids with question tokens and
//   padding masked to ignore_index.
// ---------------------------------------------------------------------------
void pad_and_mask(
    const int32_t* tokens, const int64_t* offsets, const int32_t* n_question,
    int64_t batch, int64_t seq_len, int32_t pad_id, int32_t ignore_index,
    int32_t pad_left,
    int32_t* input_ids, int32_t* attention, int32_t* labels) {
  for (int64_t r = 0; r < batch; ++r) {
    const int32_t* row = tokens + offsets[r];
    int64_t n = offsets[r + 1] - offsets[r];
    if (n > seq_len) n = seq_len;
    int64_t start = pad_left ? (seq_len - n) : 0;

    int32_t* ids = input_ids + r * seq_len;
    int32_t* att = attention + r * seq_len;
    int32_t* lab = labels + r * seq_len;
    for (int64_t j = 0; j < seq_len; ++j) {
      ids[j] = pad_id;
      att[j] = 0;
      lab[j] = ignore_index;
    }
    std::memcpy(ids + start, row, n * sizeof(int32_t));
    for (int64_t j = 0; j < n; ++j) att[start + j] = 1;
    int64_t q = std::min<int64_t>(n_question[r], n);
    for (int64_t j = q; j < n; ++j) lab[start + j] = row[j];
  }
}

// ---------------------------------------------------------------------------
// HF-CLIP-exact image preprocessing: shortest-edge bicubic resize (bit-exact
// replication of PIL's fixed-point separable resample, the backend of
// transformers.CLIPImageProcessor used at reference mm/dataset.py:315-322),
// center crop, rescale 1/255, per-channel normalize.  uint8 HWC RGB in,
// float32 HWC out.
// ---------------------------------------------------------------------------
namespace {

constexpr int kPrecisionBits = 32 - 8 - 2;  // PIL 8bpc fixed-point precision

inline double bicubic_filter(double x) {
  // Keys bicubic convolution kernel, a = -0.5 (PIL's BICUBIC).
  constexpr double a = -0.5;
  if (x < 0.0) x = -x;
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

inline uint8_t clip8(int64_t v) {
  if (v >= ((int64_t)1 << (kPrecisionBits + 8))) return 255;
  if (v <= 0) return 0;
  return (uint8_t)(v >> kPrecisionBits);
}

// Per-output-pixel filter taps along one axis.  Weights are normalized to
// sum 1 then quantized to int32 with round-half-away-from-zero, exactly as
// PIL does for 8-bit channels.
struct ResampleCoeffs {
  int ksize = 0;
  int32_t* kk = nullptr;      // [out_size, ksize]
  int32_t* bounds = nullptr;  // [out_size, 2]: (first input index, tap count)
  double* scratch = nullptr;
  ~ResampleCoeffs() { delete[] kk; delete[] bounds; delete[] scratch; }
};

void precompute_coeffs(int64_t in_size, int64_t out_size, ResampleCoeffs* c) {
  const double scale = (double)in_size / (double)out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 2.0 * filterscale;  // bicubic support = 2
  const int ksize = (int)std::ceil(support) * 2 + 1;
  c->ksize = ksize;
  c->kk = new int32_t[out_size * ksize]();
  c->bounds = new int32_t[out_size * 2]();
  c->scratch = new double[ksize];
  const double inv_fs = 1.0 / filterscale;
  for (int64_t xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int64_t xmin = (int64_t)(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int64_t xmax = (int64_t)(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double wsum = 0.0;
    for (int64_t x = 0; x < xmax; ++x) {
      const double w = bicubic_filter((x + xmin - center + 0.5) * inv_fs);
      c->scratch[x] = w;
      wsum += w;
    }
    int32_t* k = c->kk + xx * ksize;
    for (int64_t x = 0; x < xmax; ++x) {
      double w = c->scratch[x];
      if (wsum != 0.0) w /= wsum;
      const double q = w * (double)(1 << kPrecisionBits);
      k[x] = (int32_t)(w < 0 ? q - 0.5 : q + 0.5);
    }
    c->bounds[xx * 2 + 0] = (int32_t)xmin;
    c->bounds[xx * 2 + 1] = (int32_t)xmax;
  }
}

// Horizontal pass: [h, w, 3] u8 -> [h, out_w, 3] u8.
void resample_horizontal(const uint8_t* src, int64_t h, int64_t w,
                         uint8_t* dst, int64_t out_w,
                         const ResampleCoeffs& c) {
  const int64_t half = (int64_t)1 << (kPrecisionBits - 1);
  for (int64_t y = 0; y < h; ++y) {
    const uint8_t* row = src + y * w * 3;
    uint8_t* out = dst + y * out_w * 3;
    for (int64_t xx = 0; xx < out_w; ++xx) {
      const int32_t xmin = c.bounds[xx * 2 + 0];
      const int32_t xmax = c.bounds[xx * 2 + 1];
      const int32_t* k = c.kk + xx * c.ksize;
      int64_t s0 = half, s1 = half, s2 = half;
      for (int32_t x = 0; x < xmax; ++x) {
        const uint8_t* px = row + (int64_t)(xmin + x) * 3;
        s0 += (int64_t)px[0] * k[x];
        s1 += (int64_t)px[1] * k[x];
        s2 += (int64_t)px[2] * k[x];
      }
      out[xx * 3 + 0] = clip8(s0);
      out[xx * 3 + 1] = clip8(s1);
      out[xx * 3 + 2] = clip8(s2);
    }
  }
}

// Vertical pass: [h, w, 3] u8 -> [out_h, w, 3] u8.
void resample_vertical(const uint8_t* src, int64_t h, int64_t w,
                       uint8_t* dst, int64_t out_h,
                       const ResampleCoeffs& c) {
  const int64_t half = (int64_t)1 << (kPrecisionBits - 1);
  for (int64_t yy = 0; yy < out_h; ++yy) {
    const int32_t ymin = c.bounds[yy * 2 + 0];
    const int32_t ymax = c.bounds[yy * 2 + 1];
    const int32_t* k = c.kk + yy * c.ksize;
    uint8_t* out = dst + yy * w * 3;
    for (int64_t x = 0; x < w * 3; ++x) {
      int64_t s = half;
      for (int32_t y = 0; y < ymax; ++y)
        s += (int64_t)src[((int64_t)(ymin + y)) * w * 3 + x] * k[y];
      out[x] = clip8(s);
    }
  }
}

}  // namespace

// One image: src [h, w, 3] u8 -> dst [out_size, out_size, 3] f32 normalized.
// Matches transformers.CLIPImageProcessor(size={'shortest_edge': out_size},
// crop_size=out_size) bit-for-bit on RGB uint8 inputs.
void clip_preprocess(
    const uint8_t* src, int64_t h, int64_t w,
    float* dst, int64_t out_size,
    const float* mean, const float* stddev) {
  // shortest-edge target size (int() truncation, as HF computes it)
  int64_t nh, nw;
  if (h <= w) {
    nh = out_size;
    nw = (int64_t)((double)out_size * (double)w / (double)h);
  } else {
    nw = out_size;
    nh = (int64_t)((double)out_size * (double)h / (double)w);
  }

  const uint8_t* cur = src;
  int64_t ch = h, cw = w;
  uint8_t* tmp_h = nullptr;
  uint8_t* tmp_v = nullptr;
  if (nw != w) {  // horizontal pass first, as PIL does
    ResampleCoeffs cx;
    precompute_coeffs(w, nw, &cx);
    tmp_h = new uint8_t[h * nw * 3];
    resample_horizontal(cur, h, w, tmp_h, nw, cx);
    cur = tmp_h;
    cw = nw;
  }
  if (nh != h) {
    ResampleCoeffs cy;
    precompute_coeffs(h, nh, &cy);
    tmp_v = new uint8_t[nh * cw * 3];
    resample_vertical(cur, ch, cw, tmp_v, nh, cy);
    cur = tmp_v;
    ch = nh;
  }

  // center crop (shortest edge == out_size, so both dims >= out_size)
  const int64_t top = (ch - out_size) / 2;
  const int64_t left = (cw - out_size) / 2;
  for (int64_t y = 0; y < out_size; ++y) {
    const uint8_t* row = cur + ((top + y) * cw + left) * 3;
    float* orow = dst + y * out_size * 3;
    for (int64_t x = 0; x < out_size; ++x) {
      for (int64_t c = 0; c < 3; ++c) {
        orow[x * 3 + c] =
            ((float)row[x * 3 + c] / 255.0f - mean[c]) / stddev[c];
      }
    }
  }
  delete[] tmp_h;
  delete[] tmp_v;
}

// Batched variant (uniform input size): [B, h, w, 3] u8 -> [B, S, S, 3] f32.
void clip_preprocess_batch(
    const uint8_t* src, int64_t batch, int64_t h, int64_t w,
    float* dst, int64_t out_size,
    const float* mean, const float* stddev) {
  for (int64_t b = 0; b < batch; ++b) {
    clip_preprocess(src + b * h * w * 3, h, w,
                    dst + b * out_size * out_size * 3, out_size, mean, stddev);
  }
}

// ---------------------------------------------------------------------------
// Byte-level tokenizer encode (ByteTokenizer hot path): utf-8 bytes -> ids
// with byte_base offset and wraparound span, image token id untouched
// (substitution handled in Python).  Returns number of ids written.
// ---------------------------------------------------------------------------
int64_t byte_encode(
    const uint8_t* text, int64_t n, int32_t byte_base, int32_t span,
    int32_t image_token_id, int32_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    int32_t v = byte_base + (text[i] % span);
    if (v == image_token_id) v = byte_base;
    out[i] = v;
  }
  return n;
}

}  // extern "C"
