// dphost — native host-side data-plane kernels for dualpixelface_tpu.
//
// The reference's per-sample host loop (crop -> photometric aug -> float
// conversion -> normalize, dataloader/preprocess/*, SURVEY.md §3.5 #4) is the
// CPU hot path that has to keep TPU chips fed. This single-pass C++ version
// fuses those stages: one read of the uint8 crop, a 256-entry LUT for the
// brightness/gamma/contrast tone curve, fused PCA-lighting + ImageNet
// normalization, OpenMP across rows. Exposed through ctypes
// (dualpixelface_tpu/data/preprocess/native.py); the numpy pipeline remains
// the reference implementation and fallback, and both are tested equivalent.
//
// Build: make -C native   (produces libdphost.so; no external deps)

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Fused crop + photometric + normalize for one RGB uint8 image.
//   src:  [H, W, 3] uint8, row-major
//   dst:  [ch, cw, 3] float32
//   oy/ox: crop origin; brightness/gamma/contrast: 0 disables (ref
//   augmentation.py:207-227 semantics, torchvision math)
//   light: 3 additive RGB values applied AFTER the /255 scale (PCA lighting)
//   mean/stdinv: per-channel normalization ((v - mean) * stdinv)
void crop_photo_normalize(
    const uint8_t* src, int64_t H, int64_t W,
    float* dst, int64_t ch, int64_t cw, int64_t oy, int64_t ox,
    float brightness, float gamma, float contrast,
    const float* light, const float* mean, const float* stdinv) {
  // grayscale mean of the *cropped*, brightness-adjusted region for the
  // contrast op (torchvision: mean of L channel, rounded)
  float lut_b[256];
  for (int i = 0; i < 256; ++i) {
    float v = (float)i;
    if (brightness != 0.0f) {
      v *= brightness;
      if (v > 255.0f) v = 255.0f;
    }
    if (gamma != 0.0f) {
      float t = v / 255.0f;
      v = 255.0f * powf(t < 0.0f ? 0.0f : (t > 1.0f ? 1.0f : t), gamma);
      if (v > 255.0f) v = 255.0f;
      if (v < 0.0f) v = 0.0f;
    }
    lut_b[i] = v;
  }

  float cmean = 0.0f;
  if (contrast != 0.0f) {
    double acc = 0.0;
#pragma omp parallel for reduction(+ : acc)
    for (int64_t y = 0; y < ch; ++y) {
      const uint8_t* row = src + ((oy + y) * W + ox) * 3;
      double racc = 0.0;
      for (int64_t x = 0; x < cw; ++x) {
        float r = lut_b[row[x * 3 + 0]];
        float g = lut_b[row[x * 3 + 1]];
        float b = lut_b[row[x * 3 + 2]];
        racc += 0.299f * r + 0.587f * g + 0.114f * b;
      }
      acc += racc;
    }
    cmean = roundf((float)(acc / (double)(ch * cw)));
  }

  // full per-channel LUT straight to normalized float
  float lut[3][256];
  for (int c = 0; c < 3; ++c) {
    for (int i = 0; i < 256; ++i) {
      float v = lut_b[i];
      if (contrast != 0.0f) {
        v = (1.0f - contrast) * cmean + contrast * v;
        if (v > 255.0f) v = 255.0f;
        if (v < 0.0f) v = 0.0f;
      }
      // uint8 round-trip with truncation — bit-matching the numpy pipeline's
      // final .astype(np.uint8) (augmentation.py PhotometricAug._apply)
      v = (float)(uint8_t)(v > 255.0f ? 255.0f : (v < 0.0f ? 0.0f : v));
      v = v / 255.0f + light[c];
      lut[c][i] = (v - mean[c]) * stdinv[c];
    }
  }

#pragma omp parallel for
  for (int64_t y = 0; y < ch; ++y) {
    const uint8_t* row = src + ((oy + y) * W + ox) * 3;
    float* out = dst + y * cw * 3;
    for (int64_t x = 0; x < cw; ++x) {
      out[x * 3 + 0] = lut[0][row[x * 3 + 0]];
      out[x * 3 + 1] = lut[1][row[x * 3 + 1]];
      out[x * 3 + 2] = lut[2][row[x * 3 + 2]];
    }
  }
}

// Fused crop + scale for float32 target maps (depth/disp/idepth/mask):
// dst = src[oy:oy+ch, ox:ox+cw] (optionally with channel dim C).
void crop_f32(const float* src, int64_t H, int64_t W, int64_t C,
              float* dst, int64_t ch, int64_t cw, int64_t oy, int64_t ox) {
#pragma omp parallel for
  for (int64_t y = 0; y < ch; ++y) {
    std::memcpy(dst + y * cw * C, src + ((oy + y) * W + ox) * C,
                sizeof(float) * (size_t)(cw * C));
  }
}

}  // extern "C"
