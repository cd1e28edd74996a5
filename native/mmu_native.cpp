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
// Bilinear resize + per-channel normalize: uint8 HWC -> float32 HWC.
// (host analog of the CLIP/torchvision resize+normalize path)
// ---------------------------------------------------------------------------
void resize_normalize(
    const uint8_t* src, int64_t sh, int64_t sw,
    float* dst, int64_t dh, int64_t dw,
    const float* mean, const float* stddev) {
  const float sy = (float)sh / (float)dh;
  const float sx = (float)sw / (float)dw;
  for (int64_t y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int64_t y0 = (int64_t)std::floor(fy);
    float wy = fy - y0;
    int64_t y1 = std::min(y0 + 1, sh - 1);
    y0 = std::max<int64_t>(y0, 0);
    for (int64_t x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int64_t x0 = (int64_t)std::floor(fx);
      float wx = fx - x0;
      int64_t x1 = std::min(x0 + 1, sw - 1);
      x0 = std::max<int64_t>(x0, 0);
      for (int64_t c = 0; c < 3; ++c) {
        float v00 = src[(y0 * sw + x0) * 3 + c];
        float v01 = src[(y0 * sw + x1) * 3 + c];
        float v10 = src[(y1 * sw + x0) * 3 + c];
        float v11 = src[(y1 * sw + x1) * 3 + c];
        float v = (1 - wy) * ((1 - wx) * v00 + wx * v01)
                + wy * ((1 - wx) * v10 + wx * v11);
        dst[(y * dw + x) * 3 + c] = (v / 255.0f - mean[c]) / stddev[c];
      }
    }
  }
}

// Batched variant: src [B, sh, sw, 3] u8 -> dst [B, dh, dw, 3] f32.
void resize_normalize_batch(
    const uint8_t* src, int64_t batch, int64_t sh, int64_t sw,
    float* dst, int64_t dh, int64_t dw,
    const float* mean, const float* stddev) {
  for (int64_t b = 0; b < batch; ++b) {
    resize_normalize(src + b * sh * sw * 3, sh, sw,
                     dst + b * dh * dw * 3, dh, dw, mean, stddev);
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
