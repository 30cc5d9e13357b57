// ao_tpu host-side native kernels: bit-packing and load-time quantization.
//
// (ref analog: torchao/csrc/cpu/torch_free_kernels/ — bit-packing for
// uint1..7, groupwise low-bit quantize/pack; re-designed for the TPU
// framework's layouts: int4 "group-local split-half" packing along K and a
// little-endian bit-stream for uintx. These run on the HOST at checkpoint
// load / quantize time — the device compute path is Pallas/XLA — so the
// goal is single-pass cache-friendly loops that beat numpy's multi-pass
// temporaries on the one-core loader box.)
//
// Build: g++ -O3 -shared -fPIC -std=c++17 ao_tpu_host.cpp -o libao_tpu_host.so
// ABI: plain C, everything row-major contiguous.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// int4 group-local split-half packing (matches
// ao_tpu/quantization/qarrays/int4.py pack_int4/unpack_int4):
//   u (K, N) nibbles 0..15, groups of g rows; within each group, byte j of
//   the packed group holds rows j (low nibble) and j + g/2 (high nibble).
//   packed (K/2, N).
// ---------------------------------------------------------------------------

void pack_int4_splithalf(const uint8_t* u, uint8_t* out,
                         int64_t k, int64_t n, int64_t g) {
  const int64_t gh = g / 2;
  for (int64_t kb = 0; kb < k / g; ++kb) {
    const uint8_t* lo = u + (kb * g) * n;
    const uint8_t* hi = lo + gh * n;
    uint8_t* dst = out + (kb * gh) * n;
    for (int64_t j = 0; j < gh * n; ++j) {
      dst[j] = (uint8_t)(lo[j] | (hi[j] << 4));
    }
  }
}

void unpack_int4_splithalf(const uint8_t* packed, uint8_t* out,
                           int64_t k, int64_t n, int64_t g) {
  const int64_t gh = g / 2;
  for (int64_t kb = 0; kb < k / g; ++kb) {
    const uint8_t* src = packed + (kb * gh) * n;
    uint8_t* lo = out + (kb * g) * n;
    uint8_t* hi = lo + gh * n;
    for (int64_t j = 0; j < gh * n; ++j) {
      lo[j] = (uint8_t)(src[j] & 0xF);
      hi[j] = (uint8_t)(src[j] >> 4);
    }
  }
}

// ---------------------------------------------------------------------------
// Generic 1..7-bit little-endian bit-stream pack/unpack (ref:
// torch_free_kernels bitpacking; layout: value i occupies bits
// [i*b, (i+1)*b) of the output stream, LSB-first).
// ---------------------------------------------------------------------------

void pack_bits(const uint8_t* vals, uint8_t* out, int64_t count, int bits) {
  const int64_t nbytes = (count * bits + 7) / 8;
  std::memset(out, 0, (size_t)nbytes);
  for (int64_t i = 0; i < count; ++i) {
    const int64_t bit = i * bits;
    const uint32_t v = (uint32_t)(vals[i] & ((1u << bits) - 1));
    const int64_t byte = bit >> 3;
    const int off = (int)(bit & 7);
    out[byte] |= (uint8_t)(v << off);
    if (off + bits > 8) out[byte + 1] |= (uint8_t)(v >> (8 - off));
  }
}

void unpack_bits(const uint8_t* packed, uint8_t* out, int64_t count,
                 int bits) {
  const uint32_t mask = (1u << bits) - 1;
  for (int64_t i = 0; i < count; ++i) {
    const int64_t bit = i * bits;
    const int64_t byte = bit >> 3;
    const int off = (int)(bit & 7);
    uint32_t v = (uint32_t)packed[byte] >> off;
    if (off + bits > 8) v |= (uint32_t)packed[byte + 1] << (8 - off);
    out[i] = (uint8_t)(v & mask);
  }
}

// ---------------------------------------------------------------------------
// Fused groupwise int4 quantize + pack, tinygemm float-zero-point scheme.
// Matches Int4Array.from_hp / choose_qparams_affine_tinygemm exactly
// (ao_tpu/quantization/primitives.py:256): per group of g rows per column
//   scale = max((max-min)/15, fp32_eps), rounded to bf16
//   zp    = min (mid_point for int4 [-8,7] is 0), rounded to bf16
//   u     = clamp(round((w - zp_bf16)/scale_bf16), 0, 15); split-half pack.
// w is (K, N) float32; scale/zp returned as float32 holding bf16-exact
// values; packed (K/2, N). Single pass over each cached group block.
// ---------------------------------------------------------------------------

static inline float bf16_round(float x) {
  uint32_t u;
  std::memcpy(&u, &x, 4);
  const uint32_t lsb = (u >> 16) & 1u;
  u += 0x7FFFu + lsb;  // round-to-nearest-even on the bf16 boundary
  u &= 0xFFFF0000u;
  float r;
  std::memcpy(&r, &u, 4);
  return r;
}

void quantize_int4_tinygemm(const float* w, uint8_t* packed, float* scale,
                            float* zp, int64_t k, int64_t n, int64_t g) {
  const int64_t gh = g / 2;
  constexpr float kEps = 1.1920928955078125e-07f;  // fp32 machine eps
  for (int64_t kb = 0; kb < k / g; ++kb) {
    const float* blk = w + (kb * g) * n;
    float* s_row = scale + kb * n;
    float* z_row = zp + kb * n;
    uint8_t* dst = packed + (kb * gh) * n;
    // column-tiled to keep the group block in L1
    constexpr int64_t TILE = 256;
    for (int64_t c0 = 0; c0 < n; c0 += TILE) {
      const int64_t c1 = std::min(n, c0 + TILE);
      // pass 1: min/max per column (s_row holds max, z_row holds min)
      for (int64_t c = c0; c < c1; ++c) {
        s_row[c] = blk[c];
        z_row[c] = blk[c];
      }
      for (int64_t r = 1; r < g; ++r) {
        const float* row = blk + r * n;
        for (int64_t c = c0; c < c1; ++c) {
          const float v = row[c];
          s_row[c] = std::max(s_row[c], v);
          z_row[c] = std::min(z_row[c], v);
        }
      }
      for (int64_t c = c0; c < c1; ++c) {
        const float mx = s_row[c], mn = z_row[c];
        s_row[c] = bf16_round(std::max((mx - mn) / 15.0f, kEps));
        z_row[c] = bf16_round(mn);
      }
      // pass 2: quantize against the bf16-rounded qparams + pack
      for (int64_t r = 0; r < gh; ++r) {
        const float* rl = blk + r * n;
        const float* rh = blk + (r + gh) * n;
        uint8_t* d = dst + r * n;
        for (int64_t c = c0; c < c1; ++c) {
          const float sc = s_row[c];
          const float mn = z_row[c];
          float ul = std::nearbyint((rl[c] - mn) / sc);
          float uh = std::nearbyint((rh[c] - mn) / sc);
          ul = std::min(15.0f, std::max(0.0f, ul));
          uh = std::min(15.0f, std::max(0.0f, uh));
          d[c] = (uint8_t)((uint8_t)ul | ((uint8_t)uh << 4));
        }
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Groupwise symmetric int8 quantize (per (g,1) block along K):
//   scale = max(absmax/127.5, fp32_eps); q = clamp(round(w/scale), -128, 127)
// (127.5 = (qmax-qmin)/2 — the reference's symmetric convention,
//  choose_qparams_affine quant_primitives.py:1230)
// ---------------------------------------------------------------------------

void quantize_int8_symmetric(const float* w, int8_t* q, float* scale,
                             int64_t k, int64_t n, int64_t g) {
  for (int64_t kb = 0; kb < k / g; ++kb) {
    const float* blk = w + (kb * g) * n;
    float* s_row = scale + kb * n;
    int8_t* dst = q + (kb * g) * n;
    for (int64_t c = 0; c < n; ++c) s_row[c] = 0.0f;
    for (int64_t r = 0; r < g; ++r) {
      const float* row = blk + r * n;
      for (int64_t c = 0; c < n; ++c)
        s_row[c] = std::max(s_row[c], std::fabs(row[c]));
    }
    constexpr float kEps8 = 1.1920928955078125e-07f;
    for (int64_t c = 0; c < n; ++c) {
      s_row[c] = std::max(s_row[c] / 127.5f, kEps8);
    }
    for (int64_t r = 0; r < g; ++r) {
      const float* row = blk + r * n;
      int8_t* drow = dst + r * n;
      for (int64_t c = 0; c < n; ++c) {
        float v = std::nearbyint(row[c] / s_row[c]);
        v = std::min(127.0f, std::max(-128.0f, v));
        drow[c] = (int8_t)v;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// NF4 nearest-code quantize: codebook must be sorted ascending (16 entries).
// Returns nibble codes packed split-half with group g along K.
// ---------------------------------------------------------------------------

void quantize_nf4(const float* w, const float* codebook, uint8_t* codes,
                  int64_t count) {
  // boundaries between adjacent codes
  float bounds[15];
  for (int i = 0; i < 15; ++i) bounds[i] = 0.5f * (codebook[i] + codebook[i + 1]);
  for (int64_t i = 0; i < count; ++i) {
    const float v = w[i];
    // branchless-ish binary search over 16 codes
    int lo = 0, hi = 15;
    while (lo < hi) {
      const int mid = (lo + hi) >> 1;
      if (v > bounds[mid]) lo = mid + 1; else hi = mid;
    }
    codes[i] = (uint8_t)lo;
  }
}

// ---------------------------------------------------------------------------
// Repack split-half int4 into the device kernels' int32-word layouts
// (matches ao_tpu/quantization/qarrays/int4.py pack_int4_magic /
// pack_int4_magic8). Runs at load time so quantize_on_load ships the
// FAST layout to the device — one pass over the split-half bytes, word-
// row-major with the column loop innermost (contiguous stores).
//
//   "magic"  (bf16 weight-only kernel): word row (g/2)*t + r' holds, at
//   bits [4j + 16h : +4), the nibble of logical row (4t+j)*g + 2r' + h.
//   Requires (K/g) % 4 == 0.
//
//   "magic8" (W4A8 int8-MXU kernel): plane A = even groups concatenated,
//   plane B = odd; word row r byte b = plane row 4r+b, A in the low
//   nibble, B in the high. Requires K % 8 == 0, (K/g) % 2 == 0, g % 8 == 0.
// ---------------------------------------------------------------------------

void repack_int4_magic(const uint8_t* ph, int32_t* out,
                       int64_t k, int64_t n, int64_t g) {
  const int64_t gh = g / 2, words = k / 8;
  for (int64_t wr = 0; wr < words; ++wr) {
    const int64_t t = wr / gh, rp = wr % gh;
    const uint8_t* src[8];
    int in_shift[8], out_shift[8];
    int idx = 0;
    for (int j = 0; j < 4; ++j) {
      for (int h = 0; h < 2; ++h, ++idx) {
        const int64_t row = (4 * t + j) * g + 2 * rp + h;  // logical K row
        const int64_t grp = row / g, w = row % g;
        src[idx] = ph + (grp * gh + (w % gh)) * n;
        in_shift[idx] = (w < gh) ? 0 : 4;
        out_shift[idx] = 4 * j + 16 * h;
      }
    }
    int32_t* orow = out + wr * n;
    for (int64_t c = 0; c < n; ++c) {
      int32_t v = 0;
      for (int s = 0; s < 8; ++s)
        v |= (int32_t)((src[s][c] >> in_shift[s]) & 0xF) << out_shift[s];
      orow[c] = v;
    }
  }
}

void repack_int4_magic8(const uint8_t* ph, int32_t* out,
                        int64_t k, int64_t n, int64_t g) {
  const int64_t gh = g / 2, words = k / 8;
  for (int64_t wr = 0; wr < words; ++wr) {
    const uint8_t* src[8];
    int in_shift[8], out_shift[8];
    int idx = 0;
    for (int b = 0; b < 4; ++b) {
      const int64_t p = 4 * wr + b;        // plane row in [0, K/2)
      const int64_t pi = p / g, w = p % g;  // group pair, row within group
      for (int plane = 0; plane < 2; ++plane, ++idx) {
        const int64_t grp = 2 * pi + plane;
        src[idx] = ph + (grp * gh + (w % gh)) * n;
        in_shift[idx] = (w < gh) ? 0 : 4;
        out_shift[idx] = 8 * b + 4 * plane;
      }
    }
    int32_t* orow = out + wr * n;
    for (int64_t c = 0; c < n; ++c) {
      int32_t v = 0;
      for (int s = 0; s < 8; ++s)
        v |= (int32_t)((src[s][c] >> in_shift[s]) & 0xF) << out_shift[s];
      orow[c] = v;
    }
  }
}

int ao_tpu_host_abi_version(void) { return 1; }

}  // extern "C"
