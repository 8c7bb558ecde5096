// mmi_native — native data-path kernels for the input pipeline.
//
// The reference leans on torch DataLoader worker processes for image
// preprocessing throughput; our pipeline is in-process Python, so the pixel
// loops live here instead (bicubic resize on the decode-side crops is the
// hottest host op).  Zero external dependencies; built on demand with
// g++ -O3 and loaded via ctypes (see mm_interleaved_tpu/data/native.py).
//
// The resampler is PIL-compatible: separable, antialiased (kernel support
// scales with the downscale factor), Catmull-Rom bicubic (a = -0.5), which is
// what the reference's torchvision/PIL transforms produce.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>
#include <vector>

namespace {

inline float cubic_weight(float x) {
    const float a = -0.5f;  // Catmull-Rom / PIL BICUBIC
    x = std::fabs(x);
    if (x < 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
    if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
    return 0.0f;
}

inline int clampi(int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

struct Weights {
    std::vector<float> w;     // [out * ksize]
    std::vector<int> bounds;  // [out * 2] (xmin, count)
    int ksize;
};

// PIL-style weight table for resampling `span` input pixels starting at
// `offset` (float crop origin) down/up to `out` pixels.
Weights make_weights(float offset, float span, int in_size, int out) {
    const float support = 2.0f;  // bicubic
    float scale = span / out;
    float filterscale = std::max(scale, 1.0f);
    float ss = support * filterscale;
    int ksize = static_cast<int>(std::ceil(ss)) * 2 + 1;

    Weights W;
    W.ksize = ksize;
    W.w.assign(static_cast<size_t>(out) * ksize, 0.0f);
    W.bounds.assign(static_cast<size_t>(out) * 2, 0);

    for (int i = 0; i < out; ++i) {
        float center = offset + (i + 0.5f) * scale;
        int xmin = static_cast<int>(center - ss + 0.5f);
        if (xmin < 0) xmin = 0;
        int xmax = static_cast<int>(center + ss + 0.5f);
        if (xmax > in_size) xmax = in_size;
        int count = xmax - xmin;
        float* wrow = &W.w[static_cast<size_t>(i) * ksize];
        float sum = 0.0f;
        for (int j = 0; j < count; ++j) {
            float wv = cubic_weight((xmin + j + 0.5f - center) / filterscale);
            wrow[j] = wv;
            sum += wv;
        }
        if (sum != 0.0f)
            for (int j = 0; j < count; ++j) wrow[j] /= sum;
        W.bounds[2 * i] = xmin;
        W.bounds[2 * i + 1] = count;
    }
    return W;
}

// Generic separable resample of an HWC uint8 crop into float32 HWC.
void resample(const uint8_t* src, int sh, int sw, int c,
              float top, float left, float crop_h, float crop_w,
              float* dst, int dh, int dw, float out_scale) {
    Weights Wx = make_weights(left, crop_w, sw, dw);
    Weights Wy = make_weights(top, crop_h, sh, dh);

    // horizontal pass: [sh, dw, c] float
    std::vector<float> tmp(static_cast<size_t>(sh) * dw * c);
    for (int y = 0; y < sh; ++y) {
        const uint8_t* srow = src + static_cast<size_t>(y) * sw * c;
        float* trow = &tmp[static_cast<size_t>(y) * dw * c];
        for (int x = 0; x < dw; ++x) {
            int xmin = Wx.bounds[2 * x], count = Wx.bounds[2 * x + 1];
            const float* w = &Wx.w[static_cast<size_t>(x) * Wx.ksize];
            for (int k = 0; k < c; ++k) {
                float acc = 0.0f;
                for (int j = 0; j < count; ++j)
                    acc += w[j] * srow[(xmin + j) * c + k];
                trow[x * c + k] = acc;
            }
        }
    }
    // vertical pass
    for (int y = 0; y < dh; ++y) {
        int ymin = Wy.bounds[2 * y], count = Wy.bounds[2 * y + 1];
        const float* w = &Wy.w[static_cast<size_t>(y) * Wy.ksize];
        float* drow = dst + static_cast<size_t>(y) * dw * c;
        for (int x = 0; x < dw; ++x) {
            for (int k = 0; k < c; ++k) {
                float acc = 0.0f;
                for (int j = 0; j < count; ++j)
                    acc += w[j] * tmp[(static_cast<size_t>(ymin + j) * dw
                                       + x) * c + k];
                drow[x * c + k] = acc * out_scale;
            }
        }
    }
}

}  // namespace

extern "C" {

// Bicubic (PIL-compatible antialiased) resize, HWC uint8 -> HWC uint8.
void resize_bicubic_u8(const uint8_t* src, int sh, int sw, int c,
                       uint8_t* dst, int dh, int dw) {
    std::vector<float> out(static_cast<size_t>(dh) * dw * c);
    resample(src, sh, sw, c, 0.0f, 0.0f,
             static_cast<float>(sh), static_cast<float>(sw),
             out.data(), dh, dw, 1.0f);
    for (size_t i = 0; i < out.size(); ++i) {
        dst[i] = static_cast<uint8_t>(
            clampi(static_cast<int>(out[i] + 0.5f), 0, 255));
    }
}

// HWC uint8 -> HWC float32 in [0, 1].
void u8_to_f32(const uint8_t* src, float* dst, int64_t n) {
    const float inv = 1.0f / 255.0f;
    for (int64_t i = 0; i < n; ++i) dst[i] = src[i] * inv;
}

// Fused: crop (top, left, crop_h, crop_w) + bicubic resize to (dh, dw) +
// float32 [0, 1] conversion.
void crop_resize_to_f32(const uint8_t* src, int sh, int sw, int c,
                        int top, int left, int crop_h, int crop_w,
                        float* dst, int dh, int dw) {
    resample(src, sh, sw, c,
             static_cast<float>(top), static_cast<float>(left),
             static_cast<float>(crop_h), static_cast<float>(crop_w),
             dst, dh, dw, 1.0f / 255.0f);
    size_t n = static_cast<size_t>(dh) * dw * c;
    for (size_t i = 0; i < n; ++i)
        dst[i] = std::max(0.0f, std::min(1.0f, dst[i]));
}

}  // extern "C"
