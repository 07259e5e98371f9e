// Native host-side image preprocessing for the prpe_tpu input pipeline.
//
// The reference delegates this work to albumentations/cv2/PIL Python stacks
// (reference: training/lightning/object_detection/datamodule.py:93-100,
// pose_estimation/datamodule.py:125-145). Here the hot per-sample path —
// bilinear resize, letterbox padding, dtype conversion, mean/std
// normalization, optional BGR swap — is one fused C++ pass over the pixels,
// exposed through a C ABI consumed via ctypes (prpe_tpu/native.py).
//
// Semantics: standard half-pixel-center bilinear (align_corners=False),
// closely matching the numpy fallback in prpe_tpu/data/image.py (fp32 here
// vs numpy's float64 promotion: tests assert atol=1e-4, not bit equality).
//
// Build: g++ -O3 -shared -fPIC -o libprpe_host.so host_ops.cpp

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>

extern "C" {

// Bilinear resize uint8 HWC -> uint8 HWC.
void resize_bilinear_u8(const uint8_t* src, int64_t sh, int64_t sw, int64_t c,
                        uint8_t* dst, int64_t dh, int64_t dw) {
  const float scale_y = static_cast<float>(sh) / dh;
  const float scale_x = static_cast<float>(sw) / dw;
  for (int64_t oy = 0; oy < dh; ++oy) {
    float fy = (oy + 0.5f) * scale_y - 0.5f;
    fy = std::min(std::max(fy, 0.0f), static_cast<float>(sh - 1));
    const int64_t y0 = static_cast<int64_t>(fy);
    const int64_t y1 = std::min(y0 + 1, sh - 1);
    const float wy = fy - y0;
    for (int64_t ox = 0; ox < dw; ++ox) {
      float fx = (ox + 0.5f) * scale_x - 0.5f;
      fx = std::min(std::max(fx, 0.0f), static_cast<float>(sw - 1));
      const int64_t x0 = static_cast<int64_t>(fx);
      const int64_t x1 = std::min(x0 + 1, sw - 1);
      const float wx = fx - x0;
      const uint8_t* p00 = src + (y0 * sw + x0) * c;
      const uint8_t* p01 = src + (y0 * sw + x1) * c;
      const uint8_t* p10 = src + (y1 * sw + x0) * c;
      const uint8_t* p11 = src + (y1 * sw + x1) * c;
      uint8_t* out = dst + (oy * dw + ox) * c;
      for (int64_t ch = 0; ch < c; ++ch) {
        const float top = p00[ch] + (p01[ch] - p00[ch]) * wx;
        const float bot = p10[ch] + (p11[ch] - p10[ch]) * wx;
        out[ch] = static_cast<uint8_t>(top + (bot - top) * wy + 0.5f);
      }
    }
  }
}

// Fused: uint8 HWC -> letterbox to (size, size) -> f32 normalize.
//   out = (pixel/255 - mean[ch]) / std[ch], channels optionally BGR-swapped.
// Returns scale and pad offsets so annotations can be mapped.
void letterbox_normalize_f32(const uint8_t* src, int64_t sh, int64_t sw,
                             int64_t c, float* dst, int64_t size,
                             const float* mean, const float* stddev,
                             int bgr, const float* pad_value,
                             float* out_scale, int64_t* out_top,
                             int64_t* out_left) {
  const float scale =
      static_cast<float>(size) / static_cast<float>(std::max(sh, sw));
  const int64_t nh = static_cast<int64_t>(std::lround(sh * scale));
  const int64_t nw = static_cast<int64_t>(std::lround(sw * scale));
  const int64_t top = (size - nh) / 2;
  const int64_t left = (size - nw) / 2;
  *out_scale = scale;
  *out_top = top;
  *out_left = left;

  // fill padding (per-channel value: the reference normalizes the zero
  // padding too, so pad = (0 - mean) / std)
  for (int64_t i = 0; i < size * size; ++i)
    for (int64_t ch = 0; ch < c; ++ch) dst[i * c + ch] = pad_value[ch];

  const float scale_y = static_cast<float>(sh) / nh;
  const float scale_x = static_cast<float>(sw) / nw;
  for (int64_t oy = 0; oy < nh; ++oy) {
    float fy = (oy + 0.5f) * scale_y - 0.5f;
    fy = std::min(std::max(fy, 0.0f), static_cast<float>(sh - 1));
    const int64_t y0 = static_cast<int64_t>(fy);
    const int64_t y1 = std::min(y0 + 1, sh - 1);
    const float wy = fy - y0;
    for (int64_t ox = 0; ox < nw; ++ox) {
      float fx = (ox + 0.5f) * scale_x - 0.5f;
      fx = std::min(std::max(fx, 0.0f), static_cast<float>(sw - 1));
      const int64_t x0 = static_cast<int64_t>(fx);
      const int64_t x1 = std::min(x0 + 1, sw - 1);
      const float wx = fx - x0;
      const uint8_t* p00 = src + (y0 * sw + x0) * c;
      const uint8_t* p01 = src + (y0 * sw + x1) * c;
      const uint8_t* p10 = src + (y1 * sw + x0) * c;
      const uint8_t* p11 = src + (y1 * sw + x1) * c;
      float* out = dst + ((top + oy) * size + (left + ox)) * c;
      for (int64_t ch = 0; ch < c; ++ch) {
        const float top_v = p00[ch] + (p01[ch] - p00[ch]) * wx;
        const float bot_v = p10[ch] + (p11[ch] - p10[ch]) * wx;
        const float v = (top_v + (bot_v - top_v) * wy) / 255.0f;
        const int64_t oc = bgr ? (c - 1 - ch) : ch;
        out[oc] = (v - mean[oc]) / stddev[oc];
      }
    }
  }
}

// Plain resize + normalize without letterboxing (square-stretch), used by the
// detection/face pipelines (reference resizes without aspect preservation,
// object_detection/datamodule.py:93-100).
void resize_normalize_f32(const uint8_t* src, int64_t sh, int64_t sw,
                          int64_t c, float* dst, int64_t dh, int64_t dw,
                          const float* mean, const float* stddev, int bgr) {
  const float scale_y = static_cast<float>(sh) / dh;
  const float scale_x = static_cast<float>(sw) / dw;
  for (int64_t oy = 0; oy < dh; ++oy) {
    float fy = (oy + 0.5f) * scale_y - 0.5f;
    fy = std::min(std::max(fy, 0.0f), static_cast<float>(sh - 1));
    const int64_t y0 = static_cast<int64_t>(fy);
    const int64_t y1 = std::min(y0 + 1, sh - 1);
    const float wy = fy - y0;
    for (int64_t ox = 0; ox < dw; ++ox) {
      float fx = (ox + 0.5f) * scale_x - 0.5f;
      fx = std::min(std::max(fx, 0.0f), static_cast<float>(sw - 1));
      const int64_t x0 = static_cast<int64_t>(fx);
      const int64_t x1 = std::min(x0 + 1, sw - 1);
      const float wx = fx - x0;
      const uint8_t* p00 = src + (y0 * sw + x0) * c;
      const uint8_t* p01 = src + (y0 * sw + x1) * c;
      const uint8_t* p10 = src + (y1 * sw + x0) * c;
      const uint8_t* p11 = src + (y1 * sw + x1) * c;
      float* out = dst + (oy * dw + ox) * c;
      for (int64_t ch = 0; ch < c; ++ch) {
        const float top_v = p00[ch] + (p01[ch] - p00[ch]) * wx;
        const float bot_v = p10[ch] + (p11[ch] - p10[ch]) * wx;
        const float v = (top_v + (bot_v - top_v) * wy) / 255.0f;
        const int64_t oc = bgr ? (c - 1 - ch) : ch;
        out[oc] = (v - mean[oc]) / stddev[oc];
      }
    }
  }
}

// Inverse-mapped affine warp, uint8 HWC, bilinear sampling with a black
// (zero) border — the hot op of the random_perspective augmentation
// (reference behavior: cv2.warpAffine defaults, training/yolopt/
// dataset.py:355-357). ``inv`` is the row-major 2x3 INVERSE matrix mapping
// output pixel coords to source coords: the caller (prpe_tpu/data/
// augment.py) inverts the forward 3x3 on the numpy side. Out-of-bounds
// taps contribute zero. NOTE: this kernel interpolates with fp32 two-stage
// lerps while the numpy fallback's weighted sums promote to float64, so
// outputs can differ by 1 intensity level where the two land on opposite
// sides of a .5 rounding boundary — tests/test_native.py asserts 99.9%
// within 1, not exact equality. Do not build exact-match goldens on it.
void warp_affine_u8(const uint8_t* src, int64_t sh, int64_t sw, int64_t c,
                    uint8_t* dst, int64_t dh, int64_t dw, const float* inv) {
  const float a = inv[0], b = inv[1], tx = inv[2];
  const float d = inv[3], e = inv[4], ty = inv[5];
  for (int64_t oy = 0; oy < dh; ++oy) {
    for (int64_t ox = 0; ox < dw; ++ox) {
      const float sx = a * ox + b * oy + tx;
      const float sy = d * ox + e * oy + ty;
      const float fx0 = std::floor(sx);
      const float fy0 = std::floor(sy);
      const int64_t x0 = static_cast<int64_t>(fx0);
      const int64_t y0 = static_cast<int64_t>(fy0);
      const float wx = sx - fx0;
      const float wy = sy - fy0;
      uint8_t* out = dst + (oy * dw + ox) * c;
      // fast path: all four taps inside
      if (x0 >= 0 && y0 >= 0 && x0 + 1 < sw && y0 + 1 < sh) {
        const uint8_t* p00 = src + (y0 * sw + x0) * c;
        const uint8_t* p01 = p00 + c;
        const uint8_t* p10 = p00 + sw * c;
        const uint8_t* p11 = p10 + c;
        for (int64_t ch = 0; ch < c; ++ch) {
          const float top = p00[ch] * (1.0f - wx) + p01[ch] * wx;
          const float bot = p10[ch] * (1.0f - wx) + p11[ch] * wx;
          const float v = top * (1.0f - wy) + bot * wy;
          out[ch] = static_cast<uint8_t>(
              std::min(std::max(v + 0.5f, 0.0f), 255.0f));
        }
        continue;
      }
      // border path: per-tap validity, zero outside
      const bool in00 = y0 >= 0 && y0 < sh && x0 >= 0 && x0 < sw;
      const bool in01 = y0 >= 0 && y0 < sh && x0 + 1 >= 0 && x0 + 1 < sw;
      const bool in10 = y0 + 1 >= 0 && y0 + 1 < sh && x0 >= 0 && x0 < sw;
      const bool in11 = y0 + 1 >= 0 && y0 + 1 < sh && x0 + 1 >= 0 && x0 + 1 < sw;
      if (!(in00 || in01 || in10 || in11)) {
        for (int64_t ch = 0; ch < c; ++ch) out[ch] = 0;
        continue;
      }
      const int64_t cy0 = std::min(std::max(y0, int64_t{0}), sh - 1);
      const int64_t cy1 = std::min(std::max(y0 + 1, int64_t{0}), sh - 1);
      const int64_t cx0 = std::min(std::max(x0, int64_t{0}), sw - 1);
      const int64_t cx1 = std::min(std::max(x0 + 1, int64_t{0}), sw - 1);
      const uint8_t* p00 = src + (cy0 * sw + cx0) * c;
      const uint8_t* p01 = src + (cy0 * sw + cx1) * c;
      const uint8_t* p10 = src + (cy1 * sw + cx0) * c;
      const uint8_t* p11 = src + (cy1 * sw + cx1) * c;
      for (int64_t ch = 0; ch < c; ++ch) {
        const float v = (in00 ? p00[ch] : 0.0f) * (1.0f - wx) * (1.0f - wy)
                      + (in01 ? p01[ch] : 0.0f) * wx * (1.0f - wy)
                      + (in10 ? p10[ch] : 0.0f) * (1.0f - wx) * wy
                      + (in11 ? p11[ch] : 0.0f) * wx * wy;
        out[ch] = static_cast<uint8_t>(
            std::min(std::max(v + 0.5f, 0.0f), 255.0f));
      }
    }
  }
}

// cv2-exact HSV LUT color jitter, in place on uint8 RGB
// (reference: training/yolopt/dataset.py augment_hsv -> util ...py:274-289:
// cvtColor BGR2HSV, per-channel uint8 LUTs h*(x%180) / clip(s*x) / clip(v*x),
// cvtColor back). cv2's uint8 HSV: H in [0,180), S,V in [0,255], with
// H = round(deg/2), S = round(255*(V-min)/V).
void hsv_lut_u8(uint8_t* img, int64_t n_px, float rh, float rs, float rv) {
  // build the three LUTs once (exactly the reference's numpy LUT math)
  uint8_t lut_h[256], lut_s[256], lut_v[256];
  for (int i = 0; i < 256; ++i) {
    lut_h[i] = static_cast<uint8_t>(std::fmod(i * rh, 180.0f));
    lut_s[i] = static_cast<uint8_t>(
        std::min(std::max(i * rs, 0.0f), 255.0f));
    lut_v[i] = static_cast<uint8_t>(
        std::min(std::max(i * rv, 0.0f), 255.0f));
  }
  for (int64_t p = 0; p < n_px; ++p) {
    uint8_t* px = img + p * 3;
    const float r = px[0], g = px[1], b = px[2];
    const float v = std::max({r, g, b});
    const float mn = std::min({r, g, b});
    const float diff = v - mn;
    float h = 0.0f, s = 0.0f;
    if (v > 0.0f) s = 255.0f * diff / v;
    if (diff > 0.0f) {
      if (v == r)      h = 60.0f * (g - b) / diff;
      else if (v == g) h = 120.0f + 60.0f * (b - r) / diff;
      else             h = 240.0f + 60.0f * (r - g) / diff;
      if (h < 0.0f) h += 360.0f;
    }
    uint8_t hu = static_cast<uint8_t>(h / 2.0f + 0.5f);
    if (hu >= 180) hu = 0;  // cv2 wraps round(360/2) back to 0
    const uint8_t su = static_cast<uint8_t>(s + 0.5f);
    const uint8_t vu = static_cast<uint8_t>(v + 0.5f);

    const float h2 = lut_h[hu] * 2.0f;   // degrees
    const float s2 = lut_s[su] / 255.0f;
    const float v2 = static_cast<float>(lut_v[vu]);

    // cv2 HSV -> RGB sector math
    const float hh = h2 / 60.0f;
    const int sector = static_cast<int>(hh) % 6;
    const float f = hh - static_cast<int>(hh);
    const float pch = v2 * (1.0f - s2);
    const float qch = v2 * (1.0f - s2 * f);
    const float tch = v2 * (1.0f - s2 * (1.0f - f));
    float ro, go, bo;
    switch (sector) {
      case 0: ro = v2; go = tch; bo = pch; break;
      case 1: ro = qch; go = v2; bo = pch; break;
      case 2: ro = pch; go = v2; bo = tch; break;
      case 3: ro = pch; go = qch; bo = v2; break;
      case 4: ro = tch; go = pch; bo = v2; break;
      default: ro = v2; go = pch; bo = qch; break;
    }
    px[0] = static_cast<uint8_t>(std::min(std::max(ro + 0.5f, 0.0f), 255.0f));
    px[1] = static_cast<uint8_t>(std::min(std::max(go + 0.5f, 0.0f), 255.0f));
    px[2] = static_cast<uint8_t>(std::min(std::max(bo + 0.5f, 0.0f), 255.0f));
  }
}

}  // extern "C"
