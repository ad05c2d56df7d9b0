// Native host-side codec for the TPU TFHE framework.
//
// The reference's runtime tier is C/C++ (its wrapper base64 codec at
// /root/reference/ao-tfhe/eoc-tfhe-run.cpp:48-90 and the upstream tfhe_io
// record streams it wraps, call sites :236,264,294,331,372,409,444-454).
// This library is the equivalent native tier here: bulk UID-framed record
// packing for LWE/TLWE sample arrays (the keyswitch key alone is 32,768
// records at the default 128-bit parameters) and the wrapper-compatible
// truncating base64. Compute stays on the TPU; this accelerates the host
// serialization boundary.
//
// ABI: little-endian host (x86-64 / aarch64 Linux). All sizes are element
// counts, not bytes; callers allocate exact-size buffers (see record_bytes
// helpers in the Python wrapper).

#include <cstdint>
#include <cstring>

namespace {

constexpr int32_t kLweSampleUid = 42;
constexpr int32_t kTlweSampleUid = 169;

inline void put_i32(uint8_t*& p, int32_t v) {
  std::memcpy(p, &v, 4);
  p += 4;
}

inline int32_t get_i32(const uint8_t*& p) {
  int32_t v;
  std::memcpy(&v, p, 4);
  p += 4;
  return v;
}

inline void put_f64(uint8_t*& p, double v) {
  std::memcpy(p, &v, 8);
  p += 8;
}

inline double get_f64(const uint8_t*& p) {
  double v;
  std::memcpy(&v, p, 8);
  p += 8;
  return v;
}

const char kB64Alpha[] =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Base64. Encode is standard (padded). Decode mirrors the reference wrapper:
// stop at the first non-alphabet character, tolerate missing padding
// (eoc-tfhe-run.cpp:70-90). Returns bytes written.
// ---------------------------------------------------------------------------

int64_t eoc_b64_encode(const uint8_t* in, int64_t n, char* out) {
  char* o = out;
  int64_t i = 0;
  for (; i + 3 <= n; i += 3) {
    uint32_t v = (uint32_t(in[i]) << 16) | (uint32_t(in[i + 1]) << 8) | in[i + 2];
    *o++ = kB64Alpha[(v >> 18) & 63];
    *o++ = kB64Alpha[(v >> 12) & 63];
    *o++ = kB64Alpha[(v >> 6) & 63];
    *o++ = kB64Alpha[v & 63];
  }
  int64_t rem = n - i;
  if (rem == 1) {
    uint32_t v = uint32_t(in[i]) << 16;
    *o++ = kB64Alpha[(v >> 18) & 63];
    *o++ = kB64Alpha[(v >> 12) & 63];
    *o++ = '=';
    *o++ = '=';
  } else if (rem == 2) {
    uint32_t v = (uint32_t(in[i]) << 16) | (uint32_t(in[i + 1]) << 8);
    *o++ = kB64Alpha[(v >> 18) & 63];
    *o++ = kB64Alpha[(v >> 12) & 63];
    *o++ = kB64Alpha[(v >> 6) & 63];
    *o++ = '=';
  }
  return o - out;
}

int64_t eoc_b64_decode(const char* in, int64_t n, uint8_t* out) {
  static int8_t lut[256];
  static bool init = false;
  if (!init) {
    std::memset(lut, -1, sizeof(lut));
    for (int i = 0; i < 64; ++i) lut[uint8_t(kB64Alpha[i])] = int8_t(i);
    init = true;
  }
  uint8_t* o = out;
  uint32_t acc = 0;
  int bits = 0;
  for (int64_t i = 0; i < n; ++i) {
    int8_t v = lut[uint8_t(in[i])];
    if (v < 0) break;  // '=' padding or any non-alphabet char terminates
    acc = (acc << 6) | uint32_t(v);
    bits += 6;
    if (bits >= 8) {
      bits -= 8;
      *o++ = uint8_t((acc >> bits) & 0xFF);
    }
  }
  return o - out;
}

// ---------------------------------------------------------------------------
// LWE sample array: B records of [uid=42 i32 | a[n] i32 | b i32 | var f64].
// a is (B, n) row-major, b and var are length-B.
// ---------------------------------------------------------------------------

void eoc_pack_lwe_array(const int32_t* a, const int32_t* b, const double* var,
                        int64_t B, int64_t n, uint8_t* out) {
  uint8_t* p = out;
  for (int64_t s = 0; s < B; ++s) {
    put_i32(p, kLweSampleUid);
    std::memcpy(p, a + s * n, size_t(n) * 4);
    p += n * 4;
    put_i32(p, b[s]);
    put_f64(p, var[s]);
  }
}

// Returns 0 on success, or (index + 1) of the first record with a bad UID.
int64_t eoc_unpack_lwe_array(const uint8_t* in, int64_t B, int64_t n,
                             int32_t* a, int32_t* b, double* var) {
  const uint8_t* p = in;
  for (int64_t s = 0; s < B; ++s) {
    if (get_i32(p) != kLweSampleUid) return s + 1;
    std::memcpy(a + s * n, p, size_t(n) * 4);
    p += n * 4;
    b[s] = get_i32(p);
    var[s] = get_f64(p);
  }
  return 0;
}

// ---------------------------------------------------------------------------
// TLWE sample array: B records of [uid=169 i32 | polys[(k+1)*N] i32 | var f64].
// ---------------------------------------------------------------------------

void eoc_pack_tlwe_array(const int32_t* polys, const double* var, int64_t B,
                         int64_t m, uint8_t* out) {
  uint8_t* p = out;
  for (int64_t s = 0; s < B; ++s) {
    put_i32(p, kTlweSampleUid);
    std::memcpy(p, polys + s * m, size_t(m) * 4);
    p += m * 4;
    put_f64(p, var[s]);
  }
}

int64_t eoc_unpack_tlwe_array(const uint8_t* in, int64_t B, int64_t m,
                              int32_t* polys, double* var) {
  const uint8_t* p = in;
  for (int64_t s = 0; s < B; ++s) {
    if (get_i32(p) != kTlweSampleUid) return s + 1;
    std::memcpy(polys + s * m, p, size_t(m) * 4);
    p += m * 4;
    var[s] = get_f64(p);
  }
  return 0;
}

}  // extern "C"
