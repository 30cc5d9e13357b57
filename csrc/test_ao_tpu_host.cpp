// Native unit tests for ao_tpu_host.cpp — dependency-free (no gtest in the
// image), plain CHECK macros + main(). Built and run by
// tests/test_native.py::test_cpp_unit_tests.
//
// (ref analog: the reference's C++ gtest suites under csrc/cpu/*/tests/ —
// bitpacking roundtrip, quantize kernels, fallback compatibility.)
//
// Build: g++ -O3 -std=c++17 csrc/test_ao_tpu_host.cpp csrc/ao_tpu_host.cpp
//            -o test_ao_tpu_host && ./test_ao_tpu_host

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

extern "C" {
void pack_int4_splithalf(const uint8_t*, uint8_t*, int64_t, int64_t, int64_t);
void unpack_int4_splithalf(const uint8_t*, uint8_t*, int64_t, int64_t,
                           int64_t);
void pack_bits(const uint8_t*, uint8_t*, int64_t, int);
void unpack_bits(const uint8_t*, uint8_t*, int64_t, int);
void quantize_int4_tinygemm(const float*, uint8_t*, float*, float*, int64_t,
                            int64_t, int64_t);
void quantize_int8_symmetric(const float*, int8_t*, float*, int64_t, int64_t,
                             int64_t);
void quantize_nf4(const float*, const float*, uint8_t*, int64_t);
void repack_int4_magic(const uint8_t*, int32_t*, int64_t, int64_t, int64_t);
void repack_int4_magic8(const uint8_t*, int32_t*, int64_t, int64_t, int64_t);
int ao_tpu_host_abi_version(void);
}

static int g_failures = 0;

#define CHECK(cond)                                                        \
  do {                                                                     \
    if (!(cond)) {                                                         \
      std::fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond); \
      ++g_failures;                                                        \
    }                                                                      \
  } while (0)

#define CHECK_NEAR(a, b, tol) CHECK(std::fabs((a) - (b)) <= (tol))

static std::mt19937 rng(1234);

static void test_int4_pack_roundtrip() {
  const int64_t k = 128, n = 48;
  for (int64_t g : {32L, 64L, 128L}) {
    std::vector<uint8_t> u(k * n), out(k * n), packed(k / 2 * n);
    for (auto& v : u) v = rng() % 16;
    pack_int4_splithalf(u.data(), packed.data(), k, n, g);
    unpack_int4_splithalf(packed.data(), out.data(), k, n, g);
    for (int64_t i = 0; i < k * n; ++i) CHECK(out[i] == u[i]);
  }
}

static void test_pack_bits_roundtrip() {
  for (int bits = 1; bits <= 7; ++bits) {
    const int64_t count = 1000;
    std::vector<uint8_t> vals(count), out(count);
    std::vector<uint8_t> packed((count * bits + 7) / 8 + 1, 0);
    for (auto& v : vals) v = rng() % (1u << bits);
    pack_bits(vals.data(), packed.data(), count, bits);
    unpack_bits(packed.data(), out.data(), count, bits);
    for (int64_t i = 0; i < count; ++i) CHECK(out[i] == vals[i]);
  }
}

static void test_quantize_int8_symmetric() {
  const int64_t k = 64, n = 8, g = 32;
  std::vector<float> w(k * n), scale(k / g * n);
  std::vector<int8_t> q(k * n);
  std::normal_distribution<float> nd(0.f, 1.f);
  for (auto& v : w) v = nd(rng);
  quantize_int8_symmetric(w.data(), q.data(), scale.data(), k, n, g);
  for (int64_t kb = 0; kb < k / g; ++kb) {
    for (int64_t j = 0; j < n; ++j) {
      float amax = 0.f;
      for (int64_t r = 0; r < g; ++r)
        amax = std::max(amax, std::fabs(w[(kb * g + r) * n + j]));
      const float s = scale[kb * n + j];
      // device-parity scale: max(absmax/127.5, fp32 eps)
      CHECK_NEAR(s, std::max(amax / 127.5f, 1.1920929e-07f), 1e-6f * amax);
      for (int64_t r = 0; r < g; ++r) {
        const float deq = q[(kb * g + r) * n + j] * s;
        CHECK_NEAR(deq, w[(kb * g + r) * n + j], 0.51f * s);
      }
    }
  }
}

static void test_quantize_int4_tinygemm() {
  const int64_t k = 64, n = 16, g = 32;
  std::vector<float> w(k * n), scale(k / g * n), zp(k / g * n);
  std::vector<uint8_t> packed(k / 2 * n);
  std::normal_distribution<float> nd(0.f, 1.f);
  for (auto& v : w) v = nd(rng);
  quantize_int4_tinygemm(w.data(), packed.data(), scale.data(), zp.data(), k,
                         n, g);
  std::vector<uint8_t> codes(k * n);
  unpack_int4_splithalf(packed.data(), codes.data(), k, n, g);
  for (int64_t i = 0; i < k; ++i) {
    for (int64_t j = 0; j < n; ++j) {
      const int64_t gi = i / g;
      const float s = scale[gi * n + j], mn = zp[gi * n + j];
      const float deq = codes[i * n + j] * s + mn;
      // s/2 rounding + bf16-rounded qparams slack (code≤15 amplifies Δs)
      CHECK_NEAR(deq, w[i * n + j], 0.6f * s + 0.03f);
    }
  }
}

static void test_repack_int4_magic() {
  // repack split-half -> int32-word layouts; verify each word nibble
  // against the documented bit formulas applied to the raw nibbles
  const int64_t k = 256, n = 24, g = 32;
  std::vector<uint8_t> u(k * n), packed(k / 2 * n);
  for (auto& v : u) v = rng() % 16;
  pack_int4_splithalf(u.data(), packed.data(), k, n, g);

  std::vector<int32_t> magic(k / 8 * n), magic8(k / 8 * n);
  repack_int4_magic(packed.data(), magic.data(), k, n, g);
  repack_int4_magic8(packed.data(), magic8.data(), k, n, g);

  const int64_t gh = g / 2;
  for (int64_t wr = 0; wr < k / 8; ++wr) {
    const int64_t t = wr / gh, rp = wr % gh;
    for (int64_t c = 0; c < n; ++c) {
      int32_t expA = 0, expB = 0;
      for (int j = 0; j < 4; ++j)
        for (int h = 0; h < 2; ++h) {
          const int64_t row = (4 * t + j) * g + 2 * rp + h;
          expA |= (int32_t)u[row * n + c] << (4 * j + 16 * h);
        }
      for (int b = 0; b < 4; ++b)
        for (int plane = 0; plane < 2; ++plane) {
          const int64_t p = 4 * wr + b;
          const int64_t row = (2 * (p / g) + plane) * g + (p % g);
          expB |= (int32_t)u[row * n + c] << (8 * b + 4 * plane);
        }
      CHECK(magic[wr * n + c] == expA);
      CHECK(magic8[wr * n + c] == expB);
    }
  }
}

static void test_quantize_nf4() {
  // nearest-code assignment against a sorted 16-entry codebook
  const float cb[16] = {-1.0f, -0.6962f, -0.5251f, -0.3949f, -0.2844f,
                        -0.1848f, -0.0911f, 0.0f, 0.0796f, 0.1609f,
                        0.2461f, 0.3379f, 0.4407f, 0.5626f, 0.7230f, 1.0f};
  const int64_t count = 4096;
  std::vector<float> w(count);
  std::vector<uint8_t> codes(count);
  std::uniform_real_distribution<float> ud(-1.2f, 1.2f);
  for (auto& v : w) v = ud(rng);
  quantize_nf4(w.data(), cb, codes.data(), count);
  for (int64_t i = 0; i < count; ++i) {
    CHECK(codes[i] < 16);
    float best = 1e9f;
    for (int t = 0; t < 16; ++t) best = std::min(best, std::fabs(cb[t] - w[i]));
    CHECK_NEAR(std::fabs(cb[codes[i]] - w[i]), best, 1e-6f);
  }
}

int main() {
  CHECK(ao_tpu_host_abi_version() == 1);
  test_int4_pack_roundtrip();
  test_pack_bits_roundtrip();
  test_quantize_int8_symmetric();
  test_quantize_int4_tinygemm();
  test_repack_int4_magic();
  test_quantize_nf4();
  if (g_failures) {
    std::fprintf(stderr, "%d native test failures\n", g_failures);
    return 1;
  }
  std::printf("all native tests passed\n");
  return 0;
}
