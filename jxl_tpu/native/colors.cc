// Fused XYB -> linear RGB -> sRGB -> dithered u8, row-buffered passes.
//
// Same math as color/xyb.py xyb_to_linear + color/tf.py linear_to_srgb +
// render/stages/core.py f32_to_u8 (capability ref render/stages/xyb.rs,
// color/tf.rs, stages/convert.rs:549-607), fused so the three planes are
// read once and the interleaved u8 output written once — the numpy chain
// makes ~12 whole-plane passes. Compiled with -ffast-math/-fopenmp-simd
// (separately from the exact-semantics kernels) so powf vectorizes
// through libmvec; the ~4-ulp powf error is far below the u8 dither
// quantum. Each pass is a branch-free simd loop over one row (the pow
// branch computes both sides and selects, so gcc if-converts it).
//
// Rounding: nearbyintf under the default FE_TONEAREST mode = round half
// to even, matching numpy's np.round.

#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

void jxl_xyb_srgb_u8(const float* xp, const float* yp, const float* bp,
                     int64_t h, int64_t w,
                     const float* mat,      // 9: inverse opsin (maybe adapted)
                     const float* biases,   // 3: opsin biases (raw)
                     float intensity_scale, // 255 / intensity_target
                     const float* dither,   // 32*32 blue-noise table
                     uint8_t* out) {        // (h, w, 3) interleaved
  const float cb0 = cbrtf(biases[0]);
  const float cb1 = cbrtf(biases[1]);
  const float cb2 = cbrtf(biases[2]);
  const float sb0 = biases[0] * intensity_scale;
  const float sb1 = biases[1] * intensity_scale;
  const float sb2 = biases[2] * intensity_scale;
  const float p = 1.0f / 2.4f;
  const float m00 = mat[0], m01 = mat[1], m02 = mat[2];
  const float m10 = mat[3], m11 = mat[4], m12 = mat[5];
  const float m20 = mat[6], m21 = mat[7], m22 = mat[8];
  std::vector<float> buf(3 * (size_t)w);
  float* r0 = buf.data();
  float* r1 = r0 + w;
  float* r2 = r1 + w;
  for (int64_t yy = 0; yy < h; ++yy) {
    const float* xr = xp + yy * w;
    const float* yr = yp + yy * w;
    const float* br = bp + yy * w;
#pragma omp simd
    for (int64_t i = 0; i < w; ++i) {
      float l = yr[i] + xr[i] - cb0;
      float m = yr[i] - xr[i] - cb1;
      float s = br[i] - cb2;
      l = l * l * (l * intensity_scale) + sb0;
      m = m * m * (m * intensity_scale) + sb1;
      s = s * s * (s * intensity_scale) + sb2;
      r0[i] = m00 * l + m01 * m + m02 * s;
      r1[i] = m10 * l + m11 * m + m12 * s;
      r2[i] = m20 * l + m21 * m + m22 * s;
    }
    float* rows[3] = {r0, r1, r2};
    for (int c = 0; c < 3; ++c) {
      float* rc = rows[c];
#pragma omp simd
      for (int64_t i = 0; i < w; ++i) {
        float v = rc[i];
        float a = fabsf(v);
        float pw = 1.055f * powf(a, p) - 0.055f;
        float lin = a * 12.92f;
        float t = a <= 0.0031308f ? lin : pw;
        rc[i] = copysignf(t, v) * 255.0f;
      }
    }
    // dither + clamp + round + interleave (3 bytes/px; scalar is fine)
    const float* d0 = dither + (yy % 32) * 32;
    const float* d1 = dither + ((yy + 13) % 32) * 32;
    const float* d2 = dither + ((yy + 26) % 32) * 32;
    uint8_t* o = out + yy * w * 3;
    for (int64_t i = 0; i < w; ++i) {
      const int i32 = (int)(i & 31);
      float u0 = r0[i] + d0[i32];
      float u1 = r1[i] + d1[(i32 + 23) & 31];
      float u2 = r2[i] + d2[(i32 + 46) & 31];
      u0 = u0 < 0.0f ? 0.0f : (u0 > 255.0f ? 255.0f : u0);
      u1 = u1 < 0.0f ? 0.0f : (u1 > 255.0f ? 255.0f : u1);
      u2 = u2 < 0.0f ? 0.0f : (u2 > 255.0f ? 255.0f : u2);
      o[i * 3 + 0] = (uint8_t)nearbyintf(u0);
      o[i * 3 + 1] = (uint8_t)nearbyintf(u1);
      o[i * 3 + 2] = (uint8_t)nearbyintf(u2);
    }
  }
}

}  // extern "C"
