// Full MPEG-2 video decoder (ISO/IEC 13818-2, 4:2:0 / 4:2:2) — the native
// twin of the Python oracle amatsukaze_tpu/video/mpeg2_ref.py.
//
// Every arithmetic step mirrors the oracle exactly (shared generated
// tables incl. the defined fixed-point IDCT matrix; identical dequant /
// saturation / mismatch control / prediction clamping), so the
// differential fuzz suite holds the two engines byte-equal on decoded
// frames. The reference project decodes via FFmpeg (reference
// Amatsukaze/AMTSource.hpp:97-152); this is the standalone equivalent.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <memory>
#include <unordered_map>
#include <mutex>
#include <algorithm>
#include <thread>
#include <vector>

#ifdef __AVX2__
#include <immintrin.h>
#endif

#include "mpeg2_tables.inc"

namespace m2dec {

static const uint8_t NONLINEAR_QSCALE[32] = {
    0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 18, 20, 22,
    24, 28, 32, 36, 40, 44, 48, 52, 56, 64, 72, 80, 88, 96, 104, 112};

constexpr int MBT_QUANT = 0x10;
constexpr int MBT_MOTION_F = 0x08;
constexpr int MBT_MOTION_B = 0x04;
constexpr int MBT_PATTERN = 0x02;
constexpr int MBT_INTRA = 0x01;

// ---------------------------------------------------------------------------
// Bit reader mirroring utils/bits.py semantics: reads past the end are
// errors (no zero padding), flagged via err.
// ---------------------------------------------------------------------------

struct BitReader {
  const uint8_t* data = nullptr;
  int64_t pos = 0, end = 0;  // bit offsets
  bool err = false;
  // Cached 64-bit big-endian window starting at byte-aligned bit wbit.
  // peek_raw serves from the register copy and reloads only when pos
  // walks past it (~every 7 consumed bytes), instead of one unaligned
  // load + bswap per decoded symbol.
  mutable uint64_t win = 0;
  mutable int64_t wbit = INT64_MIN;

  int64_t left() const { return end - pos; }

  void refill() const {
    int64_t byte = pos >> 3;
    int64_t nbytes = (end + 7) >> 3;
    uint64_t v;
    if (byte + 8 <= nbytes) {  // one unaligned load + bswap
      std::memcpy(&v, data + byte, 8);
      v = __builtin_bswap64(v);
    } else {
      v = 0;
      for (int i = 0; i < 8; i++) {
        v <<= 8;
        if (byte + i < nbytes) v |= data[byte + i];
      }
    }
    win = v;
    wbit = byte << 3;
  }

  uint32_t peek_raw(int n) const {  // caller guarantees n <= left()
    int64_t off = pos - wbit;
    if ((uint64_t)off > (uint64_t)(64 - n)) {  // also catches off < 0
      refill();
      off = pos & 7;  // <= 7, so any n <= 57 is now servable
    }
    return (uint32_t)((win >> (64 - off - n)) &
                      ((n >= 32) ? 0xFFFFFFFFu : ((1u << n) - 1)));
  }
  uint32_t peek(int n) {
    if (n == 0) return 0;
    if (pos + n > end) { err = true; return 0; }
    return peek_raw(n);
  }
  uint32_t read(int n) {
    uint32_t v = peek(n);
    if (!err) pos += n;
    return v;
  }
  void skip(int n) {
    if (pos + n > end) { err = true; pos = end; return; }
    pos += n;
  }
};

struct Vlc {
  static constexpr int PRIM = 10;  // cache-resident primary LUT width
  int maxlen = 0;
  std::vector<uint32_t> lut;   // full-length: (len << 20) | (idx+1)
  std::vector<uint32_t> plut;  // primary (codes with len <= PRIM)
  const VlcEntry* entries = nullptr;

  void build(const VlcEntry* e, int n) {
    entries = e;
    maxlen = 0;
    for (int i = 0; i < n; i++) maxlen = std::max(maxlen, (int)e[i].len);
    lut.assign((size_t)1 << maxlen, 0);
    for (int i = 0; i < n; i++) {
      uint32_t base = e[i].code << (maxlen - e[i].len);
      uint32_t span = 1u << (maxlen - e[i].len);
      for (uint32_t p = 0; p < span; p++)
        lut[base | p] = ((uint32_t)e[i].len << 20) | (uint32_t)(i + 1);
    }
    int pb = std::min(maxlen, PRIM);
    plut.assign((size_t)1 << pb, 0);
    for (int i = 0; i < n; i++) {
      if ((int)e[i].len > pb) continue;
      uint32_t base = e[i].code << (pb - e[i].len);
      uint32_t span = 1u << (pb - e[i].len);
      for (uint32_t p = 0; p < span; p++)
        plut[base | p] = ((uint32_t)e[i].len << 20) | (uint32_t)(i + 1);
    }
  }
  // Graft an extra code (the DCT escape) into both LUTs mapped to a
  // virtual index, so the coefficient loop needs no separate probe.
  void add_code(uint32_t code, int len, int idx) {
    uint32_t base = code << (maxlen - len);
    uint32_t span = 1u << (maxlen - len);
    for (uint32_t p = 0; p < span; p++)
      lut[base | p] = ((uint32_t)len << 20) | (uint32_t)(idx + 1);
    int pb = std::min(maxlen, PRIM);
    if (len <= pb) {
      uint32_t pbase = code << (pb - len);
      uint32_t pspan = 1u << (pb - len);
      for (uint32_t p = 0; p < pspan; p++)
        plut[pbase | p] = ((uint32_t)len << 20) | (uint32_t)(idx + 1);
    }
  }
  int decode(BitReader& r) const {  // mirrors mpeg2_ref._Vlc.decode
    int pb = std::min(maxlen, PRIM);
    if (r.left() >= pb) {  // hot path: short codes, tiny table
      uint32_t hit = plut[r.peek_raw(pb)];
      if (hit) {
        r.pos += (int)(hit >> 20);
        return (int)(hit & 0xFFFFF) - 1;
      }
    }
    int avail = (int)std::min<int64_t>(maxlen, r.left());
    if (avail <= 0) { r.err = true; return -1; }
    uint32_t word = r.peek_raw(avail) << (maxlen - avail);
    uint32_t hit = lut[word];
    if (!hit || (int)(hit >> 20) > avail) { r.err = true; return -1; }
    r.pos += (int)(hit >> 20);
    return (int)(hit & 0xFFFFF) - 1;
  }
};

// Combined run/level/sign LUT for the DCT coefficient loop: one 11-bit
// probe decodes code+sign for every short code (the overwhelming
// majority), plus EOB and the escape prefix. Entry packing:
// bits 0-4 total length, 5-10 run (62 = EOB, 63 = escape), 11-17
// level+64. 0 = miss (long code) -> fall back to the exact Vlc path.
struct RlVlc {
  static constexpr int BITS = 11;
  std::vector<uint32_t> lut;
  void build(const VlcEntry* e, int n) {
    lut.assign((size_t)1 << BITS, 0);
    auto put = [&](uint32_t code, int len, uint32_t val) {
      uint32_t base = code << (BITS - len);
      uint32_t span = 1u << (BITS - len);
      for (uint32_t p = 0; p < span; p++) lut[base | p] = val;
    };
    for (int i = 0; i < n; i++) {
      if (e[i].v0 < 0) {  // EOB: no sign bit
        if ((int)e[i].len <= BITS)
          put(e[i].code, e[i].len, (uint32_t)e[i].len | (62u << 5));
        continue;
      }
      int len = e[i].len + 1;  // + sign bit
      if (len > BITS || e[i].v0 > 61 || e[i].v1 > 63) continue;
      uint32_t run = (uint32_t)e[i].v0;
      put((e[i].code << 1) | 0, len,
          (uint32_t)len | (run << 5) | ((uint32_t)(e[i].v1 + 64) << 11));
      put((e[i].code << 1) | 1, len,
          (uint32_t)len | (run << 5) | ((uint32_t)(-e[i].v1 + 64) << 11));
    }
    put(DCT_ESCAPE_CODE, DCT_ESCAPE_LEN, 6u | (63u << 5));
  }
};

static Vlc g_addr, g_mbt[4], g_cbp, g_mc, g_dmv, g_dcl, g_dcc, g_b14,
    g_b15;
static RlVlc g_rl14, g_rl15;
static std::once_flag g_once;

#ifdef __AVX2__
// int16 pair-interleaved IDCT matrix for the madd_epi16 pass 1:
// IDCT_A16P[p] lane pair (2m, 2m+1) = (A[2p][m], A[2p+1][m]).  Exact:
// coefficients saturate to [-2048,2047] and |A| <= 8035, so each i16
// product is < 2^25 and the pair sum fits int32 with no wrap —
// madd_epi16 + add_epi32 is arithmetically identical to the int32
// mullo chain (one instruction instead of two per column pair).
alignas(32) static int16_t IDCT_A16P[4][16];
#endif

static void init_tables() {
#ifdef __AVX2__
  for (int p = 0; p < 4; p++)
    for (int m = 0; m < 8; m++) {
      IDCT_A16P[p][2 * m] = (int16_t)IDCT_A[(2 * p) * 8 + m];
      IDCT_A16P[p][2 * m + 1] = (int16_t)IDCT_A[(2 * p + 1) * 8 + m];
    }
#endif
  g_addr.build(B1_ADDR_INC, B1_ADDR_INC_N);
  g_mbt[1].build(B2_MB_TYPE_I, B2_MB_TYPE_I_N);
  g_mbt[2].build(B3_MB_TYPE_P, B3_MB_TYPE_P_N);
  g_mbt[3].build(B4_MB_TYPE_B, B4_MB_TYPE_B_N);
  g_cbp.build(B9_CBP, B9_CBP_N);
  g_mc.build(B10_MOTION_CODE, B10_MOTION_CODE_N);
  g_dmv.build(B11_DMVECTOR, B11_DMVECTOR_N);
  g_dcl.build(B12_DC_LUMA, B12_DC_LUMA_N);
  g_dcc.build(B13_DC_CHROMA, B13_DC_CHROMA_N);
  g_b14.build(B14_DCT, B14_DCT_N);
  g_b15.build(B15_DCT, B15_DCT_N);
  g_b14.add_code(DCT_ESCAPE_CODE, DCT_ESCAPE_LEN, B14_DCT_N);
  g_b15.add_code(DCT_ESCAPE_CODE, DCT_ESCAPE_LEN, B15_DCT_N);
  g_rl14.build(B14_DCT, B14_DCT_N);
  g_rl15.build(B15_DCT, B15_DCT_N);
}

// Optional section timers for single-thread profiling builds
// (-DM2V_TIMERS, AMATSUKAZE_DECODE_THREADS=1). Zero footprint otherwise.
#ifdef M2V_TIMERS
#include <x86intrin.h>
enum { T_BLOCK, T_IDCT, T_STORE, T_MOTION, T_SKIP, T_EMIT, T_N };
static uint64_t g_tm[T_N];
static const char* g_tm_names[T_N] = {"block", "idct", "store",
                                      "motion", "skip", "emit"};
struct M2vTimer {
  int k;
  uint64_t t0;
  M2vTimer(int k_) : k(k_), t0(__rdtsc()) {}
  ~M2vTimer() { g_tm[k] += __rdtsc() - t0; }
};
#define M2VT(k) M2vTimer _tm##__LINE__(k)
struct M2vTimerReport {
  ~M2vTimerReport() {
    uint64_t tot = 0;
    for (int i = 0; i < T_N; i++) tot += g_tm[i];
    for (int i = 0; i < T_N; i++)
      fprintf(stderr, "M2V %-6s %12llu (%.1f%%)\n", g_tm_names[i],
              (unsigned long long)g_tm[i], 100.0 * g_tm[i] / (tot ? tot : 1));
  }
} g_tm_report;
#else
#define M2VT(k)
#endif

// ---------------------------------------------------------------------------
// Fixed-point IDCT — identical matrix + shifts as the oracle idct8x8().
// ---------------------------------------------------------------------------

// rowmask bit i set => coefficient row i of f may be nonzero. Zero rows
// produce exactly-zero t rows ((0+1024)>>11 == 0), so skipping them is
// arithmetic-identical to the oracle's dense evaluation. colmask is the
// same superset for columns: a zero column contributes f[u]*A[u][m] == 0
// to every pass-1 sum, so truncating the u loop to the live-column
// prefix is exact (typical inter blocks live entirely in columns 0-3).
static void idct8x8(const int32_t f[64], int32_t out[64],
                    unsigned rowmask = 0xFF, unsigned colmask = 0xFF) {
  // DC-only fast path: A row 0 is the constant 5793, so both passes
  // collapse to scalars and the output is uniform — arithmetic
  // identical to the dense evaluation with one live coefficient.
  if (rowmask == 1 && !(f[1] | f[2] | f[3] | f[4] | f[5] | f[6] | f[7])) {
    int32_t t0 = (1024 + f[0] * 5793) >> 11;
    int32_t v = (int32_t)((65536 + (int64_t)5793 * t0) >> 17);
    for (int i = 0; i < 64; i++) out[i] = v;
    return;
  }
#ifdef __AVX2__
  // Single live coefficient row: t has one live row, and A's row 0 is
  // the constant 5793, so every output row is identical — compute the
  // row once and broadcast (exact: dead t rows are (0+1024)>>11 == 0).
  if (rowmask == 1) {
    auto dot = [&](auto uc) {
      __m256i acc = _mm256_set1_epi32(1024);
      for (int p = 0; p < decltype(uc)::value / 2; p++) {
        uint32_t fp2 = (uint32_t)(uint16_t)f[2 * p]
                       | ((uint32_t)(uint16_t)f[2 * p + 1] << 16);
        acc = _mm256_add_epi32(
            acc, _mm256_madd_epi16(
                     _mm256_set1_epi32((int)fp2),
                     _mm256_load_si256((const __m256i*)IDCT_A16P[p])));
      }
      return acc;
    };
    __m256i acc = (colmask & 0xF0)
                      ? dot(std::integral_constant<int, 8>{})
                      : (colmask & 0x0C)
                            ? dot(std::integral_constant<int, 4>{})
                            : dot(std::integral_constant<int, 2>{});
    __m256i t0 = _mm256_srai_epi32(acc, 11);
    __m256i v = _mm256_srai_epi32(
        _mm256_add_epi32(_mm256_set1_epi32(65536),
                         _mm256_mullo_epi32(t0, _mm256_set1_epi32(5793))),
        17);
    for (int m = 0; m < 8; m++)
      _mm256_storeu_si256((__m256i*)(out + m * 8), v);
    return;
  }
#endif
  int32_t t[64];
  int rows[8];
  int nrows = 0;
#ifdef __AVX2__
  // t_row[m] = (1024 + sum_u fr[u]*A[u][m]) >> 11 — one madd_epi16 per
  // live column PAIR (exact in int32, see IDCT_A16P), unrolled per
  // live-column-prefix tier
  auto pass1 = [&](auto uc) {
    for (int i = 0; i < 8; i++) {
      if (!(rowmask & (1u << i))) continue;
      rows[nrows++] = i;
      const int32_t* fr = f + i * 8;
      __m256i acc = _mm256_set1_epi32(1024);
      for (int p = 0; p < decltype(uc)::value / 2; p++) {
        uint32_t fp2 = (uint32_t)(uint16_t)fr[2 * p]
                       | ((uint32_t)(uint16_t)fr[2 * p + 1] << 16);
        acc = _mm256_add_epi32(
            acc, _mm256_madd_epi16(
                     _mm256_set1_epi32((int)fp2),
                     _mm256_load_si256((const __m256i*)IDCT_A16P[p])));
      }
      _mm256_storeu_si256((__m256i*)(t + i * 8),
                          _mm256_srai_epi32(acc, 11));
    }
  };
  if (colmask & 0xF0) pass1(std::integral_constant<int, 8>{});
  else if (colmask & 0x0C) pass1(std::integral_constant<int, 4>{});
  else pass1(std::integral_constant<int, 2>{});
  // out[m][n] = (65536 + sum_u A[u][m]*t[u][n]) >> 17.  Pure int32 is
  // exact here: coefficients saturate to [-2048,2047] before the IDCT,
  // so |t| <= 43284 and the worst-case accumulator (even/odd partials
  // and their sum/difference) is < 1.88e9 < 2^31 — no wrap can occur,
  // making mullo_epi32 + add_epi32 arithmetically identical to the
  // oracle's int64 evaluation.  A's even rows are symmetric in m and
  // odd rows antisymmetric, so out[m] = E+O and out[7-m] = E-O share
  // both partial sums — half the multiplies.
  for (int m = 0; m < 4; m++) {
    __m256i e = _mm256_set1_epi32(65536), o = _mm256_setzero_si256();
    for (int k = 0; k < nrows; k++) {
      int u = rows[k];
      __m256i a = _mm256_set1_epi32(IDCT_A[u * 8 + m]);
      __m256i tv = _mm256_loadu_si256((const __m256i*)(t + u * 8));
      __m256i p = _mm256_mullo_epi32(tv, a);
      if (u & 1) o = _mm256_add_epi32(o, p);
      else e = _mm256_add_epi32(e, p);
    }
    _mm256_storeu_si256((__m256i*)(out + m * 8),
                        _mm256_srai_epi32(_mm256_add_epi32(e, o), 17));
    _mm256_storeu_si256(
        (__m256i*)(out + (7 - m) * 8),
        _mm256_srai_epi32(_mm256_sub_epi32(e, o), 17));
  }
#else
  for (int i = 0; i < 8; i++) {
    if (!(rowmask & (1u << i))) continue;
    rows[nrows++] = i;
    const int32_t* fr = f + i * 8;
    int32_t* tr = t + i * 8;
    for (int m = 0; m < 8; m++) {  // t = (F @ A + 1024) >> 11, fits i32
      int32_t acc = 1024;
      for (int u = 0; u < 8; u++) acc += fr[u] * IDCT_A[u * 8 + m];
      tr[m] = acc >> 11;
    }
  }
  // out = (A^T @ t + 65536) >> 17 over the live t rows only
  for (int m = 0; m < 8; m++) {
    int32_t* om = out + m * 8;
    int64_t acc[8];
    for (int n = 0; n < 8; n++) acc[n] = 65536;
    for (int k = 0; k < nrows; k++) {
      int u = rows[k];
      int64_t a = IDCT_A[u * 8 + m];
      const int32_t* tr = t + u * 8;
      for (int n = 0; n < 8; n++) acc[n] += a * tr[n];
    }
    for (int n = 0; n < 8; n++) om[n] = (int32_t)(acc[n] >> 17);
  }
#endif
}

static inline int div2_trunc(int v) {       // toward zero
  return v < 0 ? -((-v) >> 1) : v >> 1;
}
static inline int dp_half(int v) { return (v + (v > 0 ? 1 : 0)) >> 1; }
static inline int trunc_div32(int64_t n) {  // "/" 7.4.2.3: toward zero
  return (int)(n < 0 ? -((-n) >> 5) : n >> 5);
}
static inline int trunc_shr5(int v) {       // int32 variant of the above
  return v < 0 ? -((-v) >> 5) : v >> 5;
}
static inline uint8_t clip255(int v) {
  return (uint8_t)(v < 0 ? 0 : v > 255 ? 255 : v);
}

// 8-pixel residual stores: packs/packus saturation == clip255 exactly
static inline void set_clip8(uint8_t* dst, const int32_t* sr) {
#ifdef __AVX2__
  __m256i s = _mm256_loadu_si256((const __m256i*)sr);
  __m128i w = _mm_packs_epi32(_mm256_castsi256_si128(s),
                              _mm256_extracti128_si256(s, 1));
  _mm_storel_epi64((__m128i*)dst, _mm_packus_epi16(w, w));
#else
  for (int c = 0; c < 8; c++) dst[c] = clip255(sr[c]);
#endif
}
static inline void add_clip8(uint8_t* dst, const int32_t* sr) {
#ifdef __AVX2__
  __m256i p = _mm256_cvtepu8_epi32(_mm_loadl_epi64((const __m128i*)dst));
  __m256i s =
      _mm256_add_epi32(p, _mm256_loadu_si256((const __m256i*)sr));
  __m128i w = _mm_packs_epi32(_mm256_castsi256_si128(s),
                              _mm256_extracti128_si256(s, 1));
  _mm_storel_epi64((__m128i*)dst, _mm_packus_epi16(w, w));
#else
  for (int c = 0; c < 8; c++) dst[c] = clip255(dst[c] + sr[c]);
#endif
}

// ---------------------------------------------------------------------------
// Stream state
// ---------------------------------------------------------------------------

struct Seq {
  int width = 0, height = 0;
  int chroma_format = 1;
  bool mpeg1 = true;  // until a sequence extension arrives (11172-2)
  bool progressive = false;
  int32_t intra_q[64];
  int32_t non_intra_q[64];
  bool valid = false;
  Seq() {
    for (int i = 0; i < 64; i++) intra_q[i] = DEFAULT_INTRA_Q[i];
    for (int i = 0; i < 64; i++) non_intra_q[i] = 16;
  }
};

struct Pic {
  int coding_type = 0;
  int temporal_reference = 0;
  bool full_pel[2] = {false, false};  // MPEG-1 only
  int f_code[2][2] = {{15, 15}, {15, 15}};
  int intra_dc_precision = 0;
  int structure = 3;
  bool top_field_first = false;
  bool frame_pred_frame_dct = true;
  bool concealment = false;
  bool q_scale_type = false;
  bool intra_vlc_format = false;
  bool alternate_scan = false;
  bool repeat_first_field = false;
  bool progressive_frame = false;
};

struct FrameBuf {
  int mbw = 0, mbh = 0;  // frame-sized, in 16x16 units
  int crows = 8;         // chroma rows per MB (8 = 4:2:0, 16 = 4:2:2)
  std::vector<uint8_t> y, u, v;
  // output metadata (captured from the frame / first-field picture)
  int coding_type = 0, temporal_reference = 0;
  bool progressive_frame = false, top_field_first = false,
       repeat_first_field = false;

  FrameBuf(int w, int h, int chroma_format) : mbw(w), mbh(h) {
    crows = chroma_format == 1 ? 8 : 16;
    y.assign((size_t)mbh * 16 * mbw * 16, 0);
    u.assign((size_t)mbh * crows * mbw * 8, 0);
    v.assign((size_t)mbh * crows * mbw * 8, 0);
  }
  int yw() const { return mbw * 16; }
  int yh() const { return mbh * 16; }
  int cw() const { return mbw * 8; }
  int ch() const { return mbh * crows; }

  void clear() {  // oracle-identical zero state for reuse
    std::memset(y.data(), 0, y.size());
    std::memset(u.data(), 0, u.size());
    std::memset(v.data(), 0, v.size());
  }
};

// A "view" of one plane, optionally a single field (stride doubling).
struct PlaneView {
  uint8_t* p = nullptr;
  int h = 0, w = 0;      // logical rows/cols
  int stride = 0;        // elements between logical rows
  uint8_t at(int r, int c) const { return p[(int64_t)r * stride + c]; }
  uint8_t* row(int r) const { return p + (int64_t)r * stride; }
};

static PlaneView full_view(std::vector<uint8_t>& v, int h, int w) {
  return PlaneView{v.data(), h, w, w};
}
static PlaneView field_view(std::vector<uint8_t>& v, int h, int w,
                            int parity) {
  return PlaneView{v.data() + (int64_t)parity * w, h / 2, w, 2 * w};
}

// Half-sample bilinear fetch mirroring mpeg2_ref._fetch (incl. the
// clamp-into-picture policy for non-conformant vectors).
static void fetch(const PlaneView& pv, int sy, int sx, int h, int w,
                  uint8_t* out, int ostride) {
  int fy = sy & 1, fx = sx & 1;
  int iy = sy >> 1, ix = sx >> 1;
  int maxy = pv.h - h - fy; if (maxy < 0) maxy = 0;
  int maxx = pv.w - w - fx; if (maxx < 0) maxx = 0;
  iy = std::min(std::max(iy, 0), maxy);
  ix = std::min(std::max(ix, 0), maxx);
  if (iy + h + fy <= pv.h && ix + w + fx <= pv.w) {
    // fast path (every conformant fetch): direct row pointers, no
    // per-pixel clamping — the compiler vectorizes these loops
    const uint8_t* r0 = pv.p + (int64_t)iy * pv.stride + ix;
#ifdef __AVX2__
    // Bit-exact SIMD: _mm_avg_epu8 is exactly (a+b+1)>>1 on bytes, and
    // the quarter-sample case runs in 16-bit lanes (max 4*255+2 fits).
    if (w == 16) {
      if (!fy && !fx) {
        for (int r = 0; r < h; r++, r0 += pv.stride, out += ostride)
          _mm_storeu_si128((__m128i*)out,
                           _mm_loadu_si128((const __m128i*)r0));
      } else if (fy && fx) {
        for (int r = 0; r < h; r++, r0 += pv.stride, out += ostride) {
          const uint8_t* r1 = r0 + pv.stride;
          __m256i a0 = _mm256_cvtepu8_epi16(_mm_loadu_si128((const __m128i*)r0));
          __m256i a1 = _mm256_cvtepu8_epi16(_mm_loadu_si128((const __m128i*)(r0 + 1)));
          __m256i b0 = _mm256_cvtepu8_epi16(_mm_loadu_si128((const __m128i*)r1));
          __m256i b1 = _mm256_cvtepu8_epi16(_mm_loadu_si128((const __m128i*)(r1 + 1)));
          __m256i s = _mm256_add_epi16(_mm256_add_epi16(a0, a1),
                                       _mm256_add_epi16(b0, b1));
          s = _mm256_srli_epi16(_mm256_add_epi16(s, _mm256_set1_epi16(2)), 2);
          _mm_storeu_si128(
              (__m128i*)out,
              _mm_packus_epi16(_mm256_castsi256_si128(s),
                               _mm256_extracti128_si256(s, 1)));
        }
      } else {
        int step = fy ? pv.stride : 1;
        for (int r = 0; r < h; r++, r0 += pv.stride, out += ostride)
          _mm_storeu_si128(
              (__m128i*)out,
              _mm_avg_epu8(_mm_loadu_si128((const __m128i*)r0),
                           _mm_loadu_si128((const __m128i*)(r0 + step))));
      }
      return;
    }
    if (w == 8) {
      if (!fy && !fx) {
        for (int r = 0; r < h; r++, r0 += pv.stride, out += ostride)
          std::memcpy(out, r0, 8);
      } else if (fy && fx) {
        for (int r = 0; r < h; r++, r0 += pv.stride, out += ostride) {
          const uint8_t* r1 = r0 + pv.stride;
          __m128i a0 = _mm_cvtepu8_epi16(_mm_loadl_epi64((const __m128i*)r0));
          __m128i a1 = _mm_cvtepu8_epi16(_mm_loadl_epi64((const __m128i*)(r0 + 1)));
          __m128i b0 = _mm_cvtepu8_epi16(_mm_loadl_epi64((const __m128i*)r1));
          __m128i b1 = _mm_cvtepu8_epi16(_mm_loadl_epi64((const __m128i*)(r1 + 1)));
          __m128i s = _mm_add_epi16(_mm_add_epi16(a0, a1), _mm_add_epi16(b0, b1));
          s = _mm_srli_epi16(_mm_add_epi16(s, _mm_set1_epi16(2)), 2);
          _mm_storel_epi64((__m128i*)out, _mm_packus_epi16(s, s));
        }
      } else {
        int step = fy ? pv.stride : 1;
        for (int r = 0; r < h; r++, r0 += pv.stride, out += ostride)
          _mm_storel_epi64(
              (__m128i*)out,
              _mm_avg_epu8(_mm_loadl_epi64((const __m128i*)r0),
                           _mm_loadl_epi64((const __m128i*)(r0 + step))));
      }
      return;
    }
#endif
    if (!fy && !fx) {
      for (int r = 0; r < h; r++, r0 += pv.stride)
        for (int c = 0; c < w; c++) out[r * ostride + c] = r0[c];
    } else if (fy && fx) {
      for (int r = 0; r < h; r++, r0 += pv.stride) {
        const uint8_t* r1 = r0 + pv.stride;
        for (int c = 0; c < w; c++)
          out[r * ostride + c] =
              (r0[c] + r0[c + 1] + r1[c] + r1[c + 1] + 2) >> 2;
      }
    } else if (fy) {
      for (int r = 0; r < h; r++, r0 += pv.stride) {
        const uint8_t* r1 = r0 + pv.stride;
        for (int c = 0; c < w; c++)
          out[r * ostride + c] = (r0[c] + r1[c] + 1) >> 1;
      }
    } else {
      for (int r = 0; r < h; r++, r0 += pv.stride)
        for (int c = 0; c < w; c++)
          out[r * ostride + c] = (r0[c] + r0[c + 1] + 1) >> 1;
    }
    return;
  }
  // degenerate tiny planes only; guard reads (oracle relies on numpy
  // slicing semantics there only for non-conformant input, where any
  // in-picture content is acceptable)
  auto px = [&](int r, int c) -> int {
    r = std::min(r, pv.h - 1); c = std::min(c, pv.w - 1);
    return pv.at(r, c);
  };
  for (int r = 0; r < h; r++)
    for (int c = 0; c < w; c++) {
      int v;
      if (fy && fx)
        v = (px(iy + r, ix + c) + px(iy + r, ix + c + 1) +
             px(iy + r + 1, ix + c) + px(iy + r + 1, ix + c + 1) + 2) >> 2;
      else if (fy)
        v = (px(iy + r, ix + c) + px(iy + r + 1, ix + c) + 1) >> 1;
      else if (fx)
        v = (px(iy + r, ix + c) + px(iy + r, ix + c + 1) + 1) >> 1;
      else
        v = px(iy + r, ix + c);
      out[r * ostride + c] = v;
    }
}

struct Pred {  // one macroblock prediction (chroma sized for 4:2:2)
  uint8_t y[256];
  uint8_t u[128];
  uint8_t v[128];
  void zero() {
    std::memset(y, 0, sizeof y);
    std::memset(u, 0, sizeof u);
    std::memset(v, 0, sizeof v);
  }
};

// Strided per-macroblock destination: points either straight into the
// current frame (hot path — prediction fetch and residual add land in
// place, no intermediate copy) or at a packed Pred temp (ys=16, cs=8).
struct Dst {
  uint8_t *y = nullptr, *u = nullptr, *v = nullptr;
  int ys = 16, cs = 8;
};

static inline Dst pred_dst(Pred& p) { return Dst{p.y, p.u, p.v, 16, 8}; }

// row average a = avg(a, b): _mm_avg_epu8 is exactly (a+b+1)>>1 per byte
static inline void avg_row16(uint8_t* a, const uint8_t* b) {
#ifdef __AVX2__
  _mm_storeu_si128((__m128i*)a,
                   _mm_avg_epu8(_mm_loadu_si128((const __m128i*)a),
                                _mm_loadu_si128((const __m128i*)b)));
#else
  for (int i = 0; i < 16; i++) a[i] = (a[i] + b[i] + 1) >> 1;
#endif
}
static inline void avg_row8(uint8_t* a, const uint8_t* b) {
#ifdef __AVX2__
  _mm_storel_epi64((__m128i*)a,
                   _mm_avg_epu8(_mm_loadl_epi64((const __m128i*)a),
                                _mm_loadl_epi64((const __m128i*)b)));
#else
  for (int i = 0; i < 8; i++) a[i] = (a[i] + b[i] + 1) >> 1;
#endif
}

// d = avg(d, packed Pred temp) over a whole macroblock (c_rows chroma rows)
static void avg_into_dst(const Dst& d, const Pred& t, int c_rows) {
  for (int r = 0; r < 16; r++) avg_row16(d.y + r * d.ys, t.y + r * 16);
  for (int r = 0; r < c_rows; r++) {
    avg_row8(d.u + r * d.cs, t.u + r * 8);
    avg_row8(d.v + r * d.cs, t.v + r * 8);
  }
}

// ---------------------------------------------------------------------------
// Decoder
// ---------------------------------------------------------------------------

// Display-order output entry. Holds a reference to the decoded FrameBuf
// (stable once its picture completes) instead of a cropped copy:
// M2V_PopFrame copies rows straight from the padded planes into the
// caller's buffers — one copy per frame instead of two (the emit-time
// crop copy was 14% of decode time at 1080i).
struct OutFrame {
  int width = 0, height = 0;    // display crop
  int cwidth = 0, cheight = 0;  // chroma crop
  std::shared_ptr<FrameBuf> buf;
  int coding_type = 0, temporal_reference = 0;
  int progressive_frame = 0, top_field_first = 0, repeat_first_field = 0;
};

struct Decoder {
  Seq seq;
  Pic pic;
  std::shared_ptr<FrameBuf> ref_old, ref_new, pending, cur;
  int cur_first_parity = 0;
  bool in_second_field = false;
  bool have_i = false;
  std::atomic<int64_t> errors{0};  // slices may decode concurrently
  std::deque<std::unique_ptr<OutFrame>> outq;
  // FrameBuf pool: a fresh make_shared + zero-assign per picture costs
  // ~12% of 1080i decode in allocator traffic (brk + page faults +
  // double zeroing: the kernel zeroes fresh pages AND assign() memsets
  // them).  Retired frames (only the pool holds them) are reused with
  // one warm-page memset instead.
  std::vector<std::shared_ptr<FrameBuf>> fb_pool;

  std::shared_ptr<FrameBuf> alloc_frame(int mbw, int mbh, int cf) {
    int crows = cf == 1 ? 8 : 16;
    size_t idle = 0;
    for (size_t i = 0; i < fb_pool.size(); i++) {
      auto& f = fb_pool[i];
      if (f.use_count() != 1) continue;
      if (f->mbw == mbw && f->mbh == mbh && f->crows == crows) {
        f->clear();
        return f;
      }
      idle++;
    }
    // geometry changed: drop idle buffers of the wrong size
    if (idle) {
      fb_pool.erase(
          std::remove_if(fb_pool.begin(), fb_pool.end(),
                         [&](const std::shared_ptr<FrameBuf>& f) {
                           return f.use_count() == 1 &&
                                  !(f->mbw == mbw && f->mbh == mbh &&
                                    f->crows == crows);
                         }),
          fb_pool.end());
    }
    auto f = std::make_shared<FrameBuf>(mbw, mbh, cf);
    fb_pool.push_back(f);
    return f;
  }

  Decoder() { std::call_once(g_once, init_tables); }

  // ---- per-slice / per-picture decode state ----
  struct SliceState {
    int mbw = 0, mbh = 0;
    int cur_parity = -1;  // -1 for frame pictures
    bool frame_pic = true;
    const uint8_t* scan = SCAN_ZIGZAG;
    int dc_mult = 8, dc_reset = 128;
    int pmv[2][2][2] = {};
    int dc_pred[3] = {};
    int qs = 2;
    int prev_flags = 0;
    int cf = 1;          // chroma format (1 = 4:2:0, 2 = 4:2:2)
    int c_rows = 8;      // chroma rows per MB
    int c_len = 64;      // chroma samples per MB plane
    int nblocks = 6;
    // weight*qscale dequant tables, refreshed whenever qs changes;
    // products fit int32 (max 2*2048*255*112 < 2^31) so the dequant
    // arithmetic is unchanged, just pre-multiplied
    int32_t wq_intra[64];
    int32_t wq_non[64];
  };

  // decode worker count: AMATSUKAZE_DECODE_THREADS, else the hardware
  // concurrency (slice-parallel decode; 1 disables threading)
  static int slice_threads() {
    static int n = [] {
      const char* e = std::getenv("AMATSUKAZE_DECODE_THREADS");
      if (e && *e) return std::max(1, std::atoi(e));
      return (int)std::max(1u, std::thread::hardware_concurrency());
    }();
    return n;
  }

  void refresh_wq(SliceState& st) {
    for (int i = 0; i < 64; i++) {
      st.wq_intra[i] = seq.intra_q[i] * st.qs;
      st.wq_non[i] = seq.non_intra_q[i] * st.qs;
    }
  }

  int qscale(uint32_t code, BitReader& r) {
    if (code < 1 || code > 31) { r.err = true; return 2; }
    return pic.q_scale_type ? NONLINEAR_QSCALE[code] : (int)code * 2;
  }

  // ---- headers (mirroring mpeg2_ref) ----
  void sequence_header(BitReader& r) {
    seq.width = r.read(12);
    seq.height = r.read(12);
    r.skip(4 + 4 + 18 + 1 + 10 + 1);
    if (r.read(1)) load_matrix(r, seq.intra_q);
    else for (int i = 0; i < 64; i++) seq.intra_q[i] = DEFAULT_INTRA_Q[i];
    if (r.read(1)) load_matrix(r, seq.non_intra_q);
    else for (int i = 0; i < 64; i++) seq.non_intra_q[i] = 16;
    seq.mpeg1 = true;  // MPEG-2 iff a sequence extension follows
    seq.valid = true;
  }

  void load_matrix(BitReader& r, int32_t* m) {
    for (int i = 0; i < 64; i++) m[SCAN_ZIGZAG[i]] = r.read(8);
  }

  void extension(BitReader& r) {
    int ext = r.read(4);
    if (ext == 1) {
      seq.mpeg1 = false;
      r.skip(8);
      seq.progressive = r.read(1);
      seq.chroma_format = r.read(2);
      seq.width |= r.read(2) << 12;
      seq.height |= r.read(2) << 12;
      r.skip(12 + 1 + 8 + 1 + 2 + 5);
    } else if (ext == 8) {
      Pic& p = pic;
      p.f_code[0][0] = r.read(4);
      p.f_code[0][1] = r.read(4);
      p.f_code[1][0] = r.read(4);
      p.f_code[1][1] = r.read(4);
      p.intra_dc_precision = r.read(2);
      p.structure = r.read(2);
      p.top_field_first = r.read(1);
      p.frame_pred_frame_dct = r.read(1);
      p.concealment = r.read(1);
      p.q_scale_type = r.read(1);
      p.intra_vlc_format = r.read(1);
      p.alternate_scan = r.read(1);
      p.repeat_first_field = r.read(1);
      r.skip(1);
      p.progressive_frame = r.read(1);
    } else if (ext == 3) {
      if (r.read(1)) load_matrix(r, seq.intra_q);
      if (r.read(1)) load_matrix(r, seq.non_intra_q);
      if (r.read(1)) { int32_t t[64]; load_matrix(r, t); }
      if (r.read(1)) { int32_t t[64]; load_matrix(r, t); }
    }
  }

  void picture_header(BitReader& r) {
    Pic p;
    p.temporal_reference = r.read(10);
    p.coding_type = r.read(3);
    r.skip(16);
    if (p.coding_type >= 2 && p.coding_type <= 4) {
      p.full_pel[0] = r.read(1);
      int fc = r.read(3);
      p.f_code[0][0] = p.f_code[0][1] = fc;  // MPEG-2 ext overwrites
    }
    if (p.coding_type == 3) {
      p.full_pel[1] = r.read(1);
      int fc = r.read(3);
      p.f_code[1][0] = p.f_code[1][1] = fc;
    }
    if (seq.mpeg1) {  // 11172-2 fixed coding context
      p.structure = 3;
      p.frame_pred_frame_dct = true;
      p.intra_dc_precision = 0;
      p.q_scale_type = false;
      p.intra_vlc_format = false;
      p.alternate_scan = false;
      p.progressive_frame = true;
      p.top_field_first = false;
    }
    pic = p;
  }

  // ---- motion vectors (mirrors _SliceState._mv / _mv_delta) ----
  int mv_delta(BitReader& r, int fcode) {
    int e = g_mc.decode(r);
    if (e < 0) return 0;
    int mag = B10_MOTION_CODE[e].v0;
    if (mag == 0) return 0;
    int sign = r.read(1);
    int r_size = fcode - 1;
    int residual = r_size ? (int)r.read(r_size) : 0;
    int delta = ((mag - 1) << r_size) + residual + 1;
    return sign ? -delta : delta;
  }

  struct Mv { int x = 0, y = 0, dmx = 0, dmy = 0; };

  Mv mv(BitReader& r, SliceState& st, int rr, int s, bool vertical_field,
        bool dmv) {
    Mv out;
    int v[2] = {0, 0};
    for (int t = 0; t < 2; t++) {
      int fcode = pic.f_code[s][t];
      if (fcode == 15) { r.err = true; return out; }
      int delta = mv_delta(r, fcode);
      int pred = st.pmv[rr][s][t];
      if (t == 1 && vertical_field && st.frame_pic)
        pred = div2_trunc(pred);
      int f = 1 << (fcode - 1);
      int val = pred + delta;
      int rng = 32 * f;
      if (val < -16 * f) val += rng;
      else if (val > 16 * f - 1) val -= rng;
      st.pmv[rr][s][t] = (t == 1 && vertical_field && st.frame_pic)
                             ? 2 * val : val;
      v[t] = val;
      if (dmv) {
        int e = g_dmv.decode(r);
        int dv = e < 0 ? 0 : B11_DMVECTOR[e].v0;
        if (t == 0) out.dmx = dv; else out.dmy = dv;
      }
    }
    out.x = v[0];
    out.y = v[1];
    return out;
  }

  // ---- block decode (mirrors _SliceState._block) ----
  // Returns false on desync (r.err set). rowmask accumulates which
  // coefficient rows may be nonzero (superset), for the sparse IDCT.
  //
  // Two-phase + template-specialized (the M2V_TIMERS profile put ~50%
  // of decode in this function): phase 1 is the minimal serial VLC
  // loop — the bit position -> symbol-length dependency chain that
  // cannot be parallelized — recording only (pos, level) pairs; phase
  // 2 dequantizes/saturates/stores off the critical path, where the
  // compiler can overlap the independent per-coefficient work.  The
  // INTRA/MPEG1/B15 flags are template constants, so the per-symbol
  // branches on them vanish; the dispatch runs once per block.
  // Arithmetic is unchanged: run-level coding writes each position
  // exactly once, and clamp/oddify/sum commute across coefficients, so
  // splitting the passes is identical to the oracle's order.  The
  // whole-block zero (256 B, two cache lines) replaces the lazy
  // per-row zeroing — rows outside rowmask are zero either way, and
  // the sparse IDCT still only walks live rows.
  template <bool INTRA, bool MPEG1, bool B15>
  bool block_t(BitReader& r, SliceState& st, int cc, int32_t coeffs[64],
               unsigned& rowmask, unsigned& colmask) {
    M2VT(T_BLOCK);
    rowmask = 0;
    colmask = 0;
    uint8_t poss[64];
    int16_t lvls[64];
    int cnt = 0;
    int n = 0;
    int32_t dc = 0;
    if (INTRA) {
      const Vlc& dct = cc == 0 ? g_dcl : g_dcc;
      const VlcEntry* dents = cc == 0 ? B12_DC_LUMA : B13_DC_CHROMA;
      int e = dct.decode(r);
      if (e < 0) return false;
      int size = dents[e].v0;
      int diff = 0;
      if (size) {
        uint32_t bits = r.read(size);
        diff = bits >= (1u << (size - 1)) ? (int)bits
                                          : (int)bits - (1 << size) + 1;
      }
      st.dc_pred[cc] += diff;
      dc = st.dc_pred[cc] * st.dc_mult;
      if (dc < -2048) dc = -2048;
      else if (dc > 2047) dc = 2047;
      std::memset(coeffs, 0, 8 * sizeof(int32_t));
      coeffs[0] = dc;
      rowmask |= 1;
      colmask |= 1;
      n = 1;
    }
    const Vlc& table = B15 ? g_b15 : g_b14;
    const VlcEntry* ents = B15 ? B15_DCT : B14_DCT;
    const int esc = B15 ? B15_DCT_N : B14_DCT_N;
    const uint32_t* rl = (B15 ? g_rl15 : g_rl14).lut.data();
    // exact-table fallback (long codes, near-end reads):
    // 0 = run/level decoded, 1 = escape, 2 = EOB, 3 = error
    int run = 0, level = 0;
    auto exact = [&]() -> int {
      int e = table.decode(r);
      if (e < 0) return 3;
      if (e == esc) return 1;
      if (ents[e].v0 < 0) return 2;  // EOB
      run = ents[e].v0;
      int mag = ents[e].v1;
      level = r.read(1) ? -mag : mag;
      return 0;
    };
    // first symbol of a non-intra block: "1s" codes level +/-1 (B14's
    // "10" is EOB everywhere else) — hoisted so the loop is branch-free
    // on `first`
    if (!INTRA && r.peek(1) == 1) {
      if (r.err) return false;
      r.skip(1);
      int sign = r.read(1);
      if (r.err) return false;
      poss[0] = (uint8_t)st.scan[0];
      lvls[0] = sign ? -1 : 1;
      cnt = 1;
      n = 1;
    }
    while (true) {
      if (r.err) return false;
      bool is_esc = false;
      if (r.left() >= RlVlc::BITS) {
        uint32_t hit = rl[r.peek_raw(RlVlc::BITS)];
        if (hit) {
          uint32_t rn = (hit >> 5) & 63;
          r.pos += hit & 31;
          if (rn == 62) break;  // EOB
          if (rn == 63) is_esc = true;
          else {
            run = (int)rn;
            level = (int)((hit >> 11) & 127) - 64;
          }
        } else {
          int rc = exact();
          if (rc == 3) return false;
          if (rc == 2) break;
          is_esc = rc == 1;
        }
      } else {
        int rc = exact();
        if (rc == 3) return false;
        if (rc == 2) break;
        is_esc = rc == 1;
      }
      if (is_esc) {
        run = r.read(6);
        if (MPEG1) {  // 11172-2: 8-bit level, double byte ext.
          int b0 = r.read(8);
          if (b0 == 0) level = r.read(8);
          else if (b0 == 128) level = (int)r.read(8) - 256;
          else level = b0 > 128 ? b0 - 256 : b0;
          if (level == 0) { r.err = true; return false; }
        } else {
          int lv = r.read(12);
          if (lv == 0 || lv == 2048) { r.err = true; return false; }
          level = lv >= 2048 ? lv - 4096 : lv;
        }
        if (r.err) return false;
      }
      n += run;
      if (n > 63) { r.err = true; return false; }
      poss[cnt] = (uint8_t)st.scan[n];
      lvls[cnt] = (int16_t)level;
      cnt++;
      n++;
    }
    // phase 2a: zero exactly the live rows (lazy zeroing kept — a
    // whole-block memset costs ~36k x 256 B per 1080i frame and most
    // B-frame blocks are sparse)
    for (int i = 0; i < cnt; i++) rowmask |= 1u << (poss[i] >> 3);
    unsigned zr = rowmask & ~(INTRA ? 1u : 0u);
    while (zr) {
      int row = __builtin_ctz(zr);
      zr &= zr - 1;
      std::memset(coeffs + row * 8, 0, 8 * sizeof(int32_t));
    }
    // phase 2b: dequant + saturate + mismatch sum, off the VLC chain
    const int32_t* wq = INTRA ? st.wq_intra : st.wq_non;
    int32_t sum = dc;
    for (int i = 0; i < cnt; i++) {
      int pos = poss[i];
      int lv = lvls[i];
      int32_t c;
      if (INTRA) {
        // scan[n>=1] != 0, so pos != 0 here (DC handled above)
        c = trunc_shr5(2 * lv * wq[pos]);
      } else {
        int k = lv > 0 ? 1 : -1;
        c = trunc_shr5((2 * lv + k) * wq[pos]);
      }
      if (MPEG1 && pos != 0) {
        // 11172-2: per-coefficient oddification (DC exempt), applied
        // before saturation exactly as in the oracle's pass order
        if (c && (c & 1) == 0) c = c > 0 ? c - 1 : c + 1;
      }
      if (c < -2048) c = -2048;
      else if (c > 2047) c = 2047;
      coeffs[pos] = c;
      sum += c;
      colmask |= 1u << (pos & 7);
    }
    // mismatch control (MPEG-1 oddifies instead)
    if (!MPEG1 && (sum & 1) == 0) {
      if (!(rowmask & 0x80)) {  // row 7 going live via the toggle
        std::memset(coeffs + 56, 0, 8 * sizeof(int32_t));
        rowmask |= 0x80;
      }
      coeffs[63] ^= 1;
      colmask |= 0x80;
    }
    return true;
  }

  bool block(BitReader& r, SliceState& st, bool intra, int cc,
             int32_t coeffs[64], unsigned& rowmask, unsigned& colmask) {
    if (seq.mpeg1) {
      // MPEG-1 has no intra_vlc_format; B14 always
      return intra
          ? block_t<true, true, false>(r, st, cc, coeffs, rowmask, colmask)
          : block_t<false, true, false>(r, st, cc, coeffs, rowmask,
                                        colmask);
    }
    if (intra) {
      return pic.intra_vlc_format
          ? block_t<true, false, true>(r, st, cc, coeffs, rowmask, colmask)
          : block_t<true, false, false>(r, st, cc, coeffs, rowmask,
                                        colmask);
    }
    return block_t<false, false, false>(r, st, cc, coeffs, rowmask,
                                        colmask);
  }

  // ---- reference selection (mirrors _ref_frame / _ref_field) ----
  FrameBuf* ref_frame(int s) {
    if (pic.coding_type == 2) return ref_new.get();
    if (s == 0) return ref_old ? ref_old.get() : ref_new.get();
    return ref_new.get();
  }

  void ref_field(int s, int parity, PlaneView out[3]) {
    FrameBuf* frame = ref_frame(s);
    if (pic.coding_type == 2 && s == 0 && in_second_field &&
        parity == cur_first_parity)
      frame = cur.get();
    if (!frame) frame = cur.get();
    out[0] = field_view(frame->y, frame->yh(), frame->yw(), parity);
    out[1] = field_view(frame->u, frame->ch(), frame->cw(), parity);
    out[2] = field_view(frame->v, frame->ch(), frame->cw(), parity);
  }

  void frame_views(FrameBuf* f, PlaneView out[3]) {
    out[0] = full_view(f->y, f->yh(), f->yw());
    out[1] = full_view(f->u, f->ch(), f->cw());
    out[2] = full_view(f->v, f->ch(), f->cw());
  }

  void field_views(FrameBuf* f, int parity, PlaneView out[3]) {
    out[0] = field_view(f->y, f->yh(), f->yw(), parity);
    out[1] = field_view(f->u, f->ch(), f->cw(), parity);
    out[2] = field_view(f->v, f->ch(), f->cw(), parity);
  }

  // frame-based 16x16 prediction (mirrors _frame_pred), fetched straight
  // into the (strided) destination
  void frame_pred(FrameBuf* frame, int mby, int mbx, int mvx, int mvy,
                  const Dst& d) {
    PlaneView pv[3];
    frame_views(frame, pv);
    fetch(pv[0], mby * 32 + mvy, mbx * 32 + mvx, 16, 16, d.y, d.ys);
    int cf = seq.chroma_format;
    int cr = cf == 1 ? 8 : 16;
    int cx = div2_trunc(mvx);
    int cy = cf == 1 ? div2_trunc(mvy) : mvy;  // 4:2:2: full vertical
    fetch(pv[1], mby * 2 * cr + cy, mbx * 16 + cx, cr, 8, d.u, d.cs);
    fetch(pv[2], mby * 2 * cr + cy, mbx * 16 + cx, cr, 8, d.v, d.cs);
  }

  // field prediction of h luma rows into strided destinations (mirrors
  // _field_pred_views); interleaved placement = ty offset + 2x stride.
  void field_pred(const PlaneView pv[3], int fy_mb, int mbx, int mvx,
                  int mvy, int h, int y_off, uint8_t* ty, int ys,
                  uint8_t* tu, uint8_t* tv, int cs) {
    fetch(pv[0], (fy_mb + y_off) * 2 + mvy, mbx * 32 + mvx, h, 16, ty, ys);
    int cx = div2_trunc(mvx);
    if (seq.chroma_format == 1) {
      int cy = div2_trunc(mvy);
      fetch(pv[1], (fy_mb + y_off) + cy, mbx * 16 + cx, h / 2, 8, tu, cs);
      fetch(pv[2], (fy_mb + y_off) + cy, mbx * 16 + cx, h / 2, 8, tv, cs);
    } else {  // 4:2:2: chroma fields have luma's vertical resolution
      fetch(pv[1], (fy_mb + y_off) * 2 + mvy, mbx * 16 + cx, h, 8, tu, cs);
      fetch(pv[2], (fy_mb + y_off) * 2 + mvy, mbx * 16 + cx, h, 8, tv, cs);
    }
  }

  // Destination window of one macroblock inside the current picture
  // (frame pictures: frame stride; field pictures: 2x stride + parity
  // offset).  Prediction fetch and residual add land here directly —
  // the oracle's separate _store_mb copy is the identity on the result.
  Dst mb_dst(const SliceState& st, int mb_row, int mb_x) {
    Dst d;
    if (st.frame_pic) {
      d.ys = cur->yw();
      d.cs = cur->cw();
      d.y = cur->y.data() + (size_t)mb_row * 16 * d.ys + mb_x * 16;
      d.u = cur->u.data() + (size_t)mb_row * st.c_rows * d.cs + mb_x * 8;
      d.v = cur->v.data() + (size_t)mb_row * st.c_rows * d.cs + mb_x * 8;
    } else {
      int yw = cur->yw(), cw = cur->cw();
      d.ys = 2 * yw;
      d.cs = 2 * cw;
      d.y = cur->y.data() + st.cur_parity * yw +
            (size_t)mb_row * 16 * d.ys + mb_x * 16;
      d.u = cur->u.data() + st.cur_parity * cw +
            (size_t)mb_row * st.c_rows * d.cs + mb_x * 8;
      d.v = cur->v.data() + st.cur_parity * cw +
            (size_t)mb_row * st.c_rows * d.cs + mb_x * 8;
    }
    return d;
  }

  // ---- skipped macroblocks (mirrors _skipped_mb) ----
  bool skipped_mb(SliceState& st, int mb_row, int mb_x) {
    M2VT(T_SKIP);
    for (int i = 0; i < 3; i++) st.dc_pred[i] = st.dc_reset;
    if (pic.coding_type == 1) return false;  // error
    int flags;
    int mvs[2][2] = {{0, 0}, {0, 0}};
    if (pic.coding_type == 2) {
      std::memset(st.pmv, 0, sizeof st.pmv);
      flags = MBT_MOTION_F;
    } else {
      flags = st.prev_flags & (MBT_MOTION_F | MBT_MOTION_B);
      if (flags == 0) flags = MBT_MOTION_F;
      for (int s = 0; s < 2; s++) {
        int sc = (seq.mpeg1 && pic.full_pel[s]) ? 2 : 1;
        mvs[s][0] = st.pmv[0][s][0] * sc;
        mvs[s][1] = st.pmv[0][s][1] * sc;
      }
    }
    // P-frame skips in frame pictures are exact zero-vector forward
    // copies with no residual: bytes move ref -> cur directly (the
    // fetch/clip/store roundtrip is the identity on them)
    if (pic.coding_type == 2 && st.frame_pic) {
      FrameBuf* frame = ref_frame(0);
      // the raw copy needs matching geometry; a mid-stream size/chroma
      // change (corrupt TS) keeps mismatched refs -> general clamped path
      if (frame && frame->mbw == cur->mbw && frame->mbh == cur->mbh &&
          frame->crows == cur->crows) {
        for (int r = 0; r < 16; r++) {
          size_t off = (size_t)(mb_row * 16 + r) * cur->yw() + mb_x * 16;
          std::memcpy(cur->y.data() + off, frame->y.data() + off, 16);
        }
        for (int r = 0; r < st.c_rows; r++) {
          size_t off = (size_t)(mb_row * st.c_rows + r) * cur->cw()
                       + mb_x * 8;
          std::memcpy(cur->u.data() + off, frame->u.data() + off, 8);
          std::memcpy(cur->v.data() + off, frame->v.data() + off, 8);
        }
        st.prev_flags = flags;
        return true;
      }
    }
    Dst d = mb_dst(st, mb_row, mb_x);
    Pred tmp;
    Dst td = pred_dst(tmp);
    int npred = 0;
    for (int s = 0; s < 2; s++) {
      if (!(flags & (s == 0 ? MBT_MOTION_F : MBT_MOTION_B))) continue;
      int mvx = mvs[s][0], mvy = mvs[s][1];
      const Dst& p = npred == 0 ? d : td;
      if (st.frame_pic) {
        FrameBuf* frame = ref_frame(s);
        if (!frame) continue;
        frame_pred(frame, mb_row, mb_x, mvx, mvy, p);
      } else {
        PlaneView pv[3];
        ref_field(s, st.cur_parity, pv);
        field_pred(pv, mb_row * 16, mb_x, mvx, mvy, 16, 0, p.y, p.ys,
                   p.u, p.v, p.cs);
      }
      if (npred > 0) avg_into_dst(d, tmp, st.c_rows);
      npred++;
    }
    if (npred == 0) return true;  // no refs: leave prev_flags untouched
    st.prev_flags = flags;
    return true;
  }

  // ---- one decoded motion direction (mirrors _motion + its closures) ----
  // Writes the prediction into the strided destination (the picture
  // itself for the first direction, a packed Pred temp for the second).
  // Returns false on bitstream error.
  bool motion(BitReader& r, SliceState& st, int s, int motion_type,
              int mb_row, int mb_x, const Dst& out) {
    M2VT(T_MOTION);
    if (st.frame_pic) {
      if (motion_type == 2) {  // frame-based
        Mv m = mv(r, st, 0, s, false, false);
        if (r.err) return false;
        std::memcpy(st.pmv[1][s], st.pmv[0][s], sizeof st.pmv[1][s]);
        FrameBuf* frame = ref_frame(s);
        if (!frame) return false;
        if (seq.mpeg1 && pic.full_pel[s]) {  // PMV keeps coded scale
          m.x *= 2;
          m.y *= 2;
        }
        frame_pred(frame, mb_row, mb_x, m.x, m.y, out);
        return true;
      }
      if (motion_type == 1) {  // field-based in frame picture
        for (int rr = 0; rr < 2; rr++) {
          int fs = r.read(1);
          Mv m = mv(r, st, rr, s, true, false);
          if (r.err) return false;
          FrameBuf* frame = ref_frame(s);
          if (!frame) return false;
          PlaneView pv[3];
          field_views(frame, fs, pv);
          // parity rr rows land interleaved: offset rr, stride doubled
          field_pred(pv, mb_row * 8, mb_x, m.x, m.y, 8, 0,
                     out.y + rr * out.ys, 2 * out.ys,
                     out.u + rr * out.cs, out.v + rr * out.cs,
                     2 * out.cs);
        }
        return true;
      }
      if (motion_type == 3) {  // dual prime, frame picture
        Mv m = mv(r, st, 0, s, true, true);
        if (r.err) return false;
        std::memcpy(st.pmv[1][s], st.pmv[0][s], sizeof st.pmv[1][s]);
        FrameBuf* frame = ref_frame(s);
        if (!frame) return false;
        bool tff = pic.top_field_first;
        for (int dest_par = 0; dest_par < 2; dest_par++) {
          PlaneView same[3], opp[3];
          field_views(frame, dest_par, same);
          field_views(frame, 1 - dest_par, opp);
          uint8_t* dy = out.y + dest_par * out.ys;
          uint8_t* du = out.u + dest_par * out.cs;
          uint8_t* dv = out.v + dest_par * out.cs;
          field_pred(same, mb_row * 8, mb_x, m.x, m.y, 8, 0, dy,
                     2 * out.ys, du, dv, 2 * out.cs);
          int mfac, corr;
          if (dest_par == 0) { mfac = tff ? 1 : 3; corr = -1; }
          else { mfac = tff ? 3 : 1; corr = 1; }
          int ox = dp_half(m.x * mfac) + m.dmx;
          int oy = dp_half(m.y * mfac) + m.dmy + corr;
          uint8_t by[128], bu[64], bv[64];
          field_pred(opp, mb_row * 8, mb_x, ox, oy, 8, 0, by, 16, bu, bv,
                     8);
          int hc = st.c_rows / 2;
          for (int rr = 0; rr < 8; rr++)
            avg_row16(dy + rr * 2 * out.ys, by + rr * 16);
          for (int rr = 0; rr < hc; rr++) {
            avg_row8(du + rr * 2 * out.cs, bu + rr * 8);
            avg_row8(dv + rr * 2 * out.cs, bv + rr * 8);
          }
        }
        return true;
      }
      r.err = true;
      return false;
    }
    // ---- field pictures ----
    int cur_par = st.cur_parity;
    if (motion_type == 1) {  // field-based
      int fs = r.read(1);
      Mv m = mv(r, st, 0, s, false, false);
      if (r.err) return false;
      std::memcpy(st.pmv[1][s], st.pmv[0][s], sizeof st.pmv[1][s]);
      PlaneView pv[3];
      ref_field(s, fs, pv);
      field_pred(pv, mb_row * 16, mb_x, m.x, m.y, 16, 0, out.y, out.ys,
                 out.u, out.v, out.cs);
      return true;
    }
    if (motion_type == 2) {  // 16x8
      int hc = st.c_rows / 2;
      for (int half = 0; half < 2; half++) {
        int fs = r.read(1);
        Mv m = mv(r, st, half, s, false, false);
        if (r.err) return false;
        PlaneView pv[3];
        ref_field(s, fs, pv);
        field_pred(pv, mb_row * 16, mb_x, m.x, m.y, 8, half * 8,
                   out.y + half * 8 * out.ys, out.ys,
                   out.u + half * hc * out.cs,
                   out.v + half * hc * out.cs, out.cs);
      }
      return true;
    }
    if (motion_type == 3) {  // dual prime, field picture
      Mv m = mv(r, st, 0, s, false, true);
      if (r.err) return false;
      std::memcpy(st.pmv[1][s], st.pmv[0][s], sizeof st.pmv[1][s]);
      PlaneView same[3], opp[3];
      ref_field(s, cur_par, same);
      ref_field(s, 1 - cur_par, opp);
      field_pred(same, mb_row * 16, mb_x, m.x, m.y, 16, 0, out.y, out.ys,
                 out.u, out.v, out.cs);
      int ox = dp_half(m.x) + m.dmx;
      int oy = dp_half(m.y) + m.dmy + (cur_par == 1 ? 1 : -1);
      uint8_t by[256], bu[128], bv[128];
      field_pred(opp, mb_row * 16, mb_x, ox, oy, 16, 0, by, 16, bu, bv,
                 8);
      for (int rr = 0; rr < 16; rr++)
        avg_row16(out.y + rr * out.ys, by + rr * 16);
      for (int rr = 0; rr < st.c_rows; rr++) {
        avg_row8(out.u + rr * out.cs, bu + rr * 8);
        avg_row8(out.v + rr * out.cs, bv + rr * 8);
      }
      return true;
    }
    r.err = true;
    return false;
  }

  // ---- macroblock (mirrors _macroblock) ----
  bool macroblock(BitReader& r, SliceState& st, int mb_row, int mb_x) {
    int e = g_mbt[pic.coding_type].decode(r);
    if (e < 0) return false;
    const VlcEntry* mbt_ents = pic.coding_type == 1 ? B2_MB_TYPE_I
                               : pic.coding_type == 2 ? B3_MB_TYPE_P
                                                      : B4_MB_TYPE_B;
    int flags = mbt_ents[e].v0;
    bool intra = flags & MBT_INTRA;
    bool motion_f = flags & MBT_MOTION_F;
    bool motion_b = flags & MBT_MOTION_B;
    bool pattern = flags & MBT_PATTERN;

    int motion_type = 2;
    if (motion_f || motion_b) {
      if (st.frame_pic)
        motion_type = pic.frame_pred_frame_dct ? 2 : (int)r.read(2);
      else
        motion_type = r.read(2);
    } else if (intra && pic.concealment) {
      motion_type = st.frame_pic ? 2 : 1;
    }

    int dct_type = 0;
    if (st.frame_pic && !pic.frame_pred_frame_dct && (intra || pattern))
      dct_type = r.read(1);
    if (flags & MBT_QUANT) { st.qs = qscale(r.read(5), r); refresh_wq(st); }
    if (r.err) return false;

    Dst d = mb_dst(st, mb_row, mb_x);
    Pred tmp;
    Dst td = pred_dst(tmp);
    int npred = 0;
    if (intra) {
      if (pic.concealment) {
        if (!st.frame_pic) r.skip(1);
        mv(r, st, 0, 0, false, false);
        std::memcpy(st.pmv[1][0], st.pmv[0][0], sizeof st.pmv[1][0]);
        r.skip(1);  // marker
        if (r.err) return false;
      } else {
        std::memset(st.pmv, 0, sizeof st.pmv);
      }
    } else {
      for (int i = 0; i < 3; i++) st.dc_pred[i] = st.dc_reset;
      for (int s = 0; s < 2; s++) {
        bool has = s == 0 ? motion_f : motion_b;
        if (!has) continue;
        const Dst& p = npred == 0 ? d : td;
        if (!motion(r, st, s, motion_type, mb_row, mb_x, p)) return false;
        if (npred > 0) avg_into_dst(d, tmp, st.c_rows);
        npred++;
      }
      if (pic.coding_type == 2 && !motion_f && !intra) {
        // pattern-only P macroblock: zero vector + PMV reset
        std::memset(st.pmv, 0, sizeof st.pmv);
        const Dst& p = npred == 0 ? d : td;
        if (st.frame_pic) {
          FrameBuf* frame = ref_frame(0);
          if (!frame) return false;
          frame_pred(frame, mb_row, mb_x, 0, 0, p);
        } else {
          PlaneView pv[3];
          ref_field(0, st.cur_parity, pv);
          field_pred(pv, mb_row * 16, mb_x, 0, 0, 16, 0, p.y, p.ys, p.u,
                     p.v, p.cs);
        }
        if (npred > 0) avg_into_dst(d, tmp, st.c_rows);
        npred++;
      }
    }

    int cbp = 0;
    if (pattern) {
      int ce = g_cbp.decode(r);
      if (ce < 0) return false;
      cbp = B9_CBP[ce].v0;
      if (seq.chroma_format == 2) cbp = (cbp << 2) | r.read(2);
      else if (seq.chroma_format == 3) cbp = (cbp << 6) | r.read(6);
    } else if (intra) {
      cbp = (1 << st.nblocks) - 1;
    }

    // intra MBs code every block (cbp all-ones) and set_clip8 overwrites,
    // so only the missing-reference inter case needs explicit zeros
    if (!intra && npred == 0) {
      for (int rr = 0; rr < 16; rr++) std::memset(d.y + rr * d.ys, 0, 16);
      for (int rr = 0; rr < st.c_rows; rr++) {
        std::memset(d.u + rr * d.cs, 0, 8);
        std::memset(d.v + rr * d.cs, 0, 8);
      }
    }

    for (int b = 0; b < st.nblocks; b++) {
      if (!((cbp >> (st.nblocks - 1 - b)) & 1)) continue;
      int cc = b < 4 ? 0 : 1 + (b & 1);
      int32_t coeffs[64], res[64];
      unsigned rowmask, colmask;
      if (!block(r, st, intra, cc, coeffs, rowmask, colmask)) return false;
      // every block layout is (row0 pointer, row stride); measured: the
      // separate res[64] round trip beats a fused IDCT-pass2+store (344
      // vs 331 fps 1080i) — the independent store loop pipelines better
      {
        M2VT(T_IDCT);
        idct8x8(coeffs, res, rowmask, colmask);
      }
      M2VT(T_STORE);
      uint8_t* dst0;
      int rstride;
      if (b < 4) {
        int cs = (b & 1) * 8;
        if (dct_type) {  // field DCT interleave
          dst0 = d.y + (b / 2) * d.ys + cs;
          rstride = 2 * d.ys;
        } else {
          dst0 = d.y + (b / 2) * 8 * d.ys + cs;
          rstride = d.ys;
        }
      } else {
        uint8_t* base = (b & 1) == 0 ? d.u : d.v;
        int k2 = (b - 4) / 2;
        if (dct_type && st.cf == 2) {  // 4:2:2 chroma is field-organised
          dst0 = base + k2 * d.cs;
          rstride = 2 * d.cs;
        } else {
          dst0 = base + k2 * 8 * d.cs;
          rstride = d.cs;
        }
      }
      // each pixel receives exactly one residual, so clipping here is
      // identical to the oracle's clip-at-store
      if (intra)
        for (int rr = 0; rr < 8; rr++)
          set_clip8(dst0 + rr * rstride, res + rr * 8);
      else
        for (int rr = 0; rr < 8; rr++)
          add_clip8(dst0 + rr * rstride, res + rr * 8);
    }

    if (!intra && !pattern)
      for (int i = 0; i < 3; i++) st.dc_pred[i] = st.dc_reset;
    st.prev_flags = intra ? 0 : flags;
    return true;
  }

  // ---- slice (mirrors decode_slice) ----
  // flatten: inline the whole hot path (macroblock/block/mv/motion/VLC)
  // so the slice-local reader below stays register-resident across the
  // symbol loops — by-reference cursor fields would otherwise be
  // spilled around every data[] byte load (char may alias them).
  __attribute__((flatten))
  void decode_slice(BitReader& r_, SliceState& st, int vertical_pos) {
    BitReader r = r_;
    struct Commit {
      BitReader &dst, &src;
      ~Commit() { dst = src; }
    } commit_{r_, r};
    int mb_row = vertical_pos - 1;
    if (seq.height > 2800) mb_row = ((int)r.read(3) << 7) + vertical_pos - 1;
    if (mb_row >= st.mbh) { errors++; return; }
    st.qs = qscale(r.read(5), r);
    refresh_wq(st);
    if (r.peek(1) == 1 && !r.err) {
      r.skip(1 + 1 + 7);
      while (!r.err && r.peek(1) == 1) r.skip(9);
    }
    r.skip(1);  // extra_bit_slice
    if (r.err) { errors++; return; }

    std::memset(st.pmv, 0, sizeof st.pmv);
    for (int i = 0; i < 3; i++) st.dc_pred[i] = st.dc_reset;
    st.prev_flags = 0;
    bool mpeg1 = seq.mpeg1;
    // MPEG-1 slices may cross macroblock rows; MPEG-2 slices are
    // confined to the row named by the start code.
    int addr = mb_row * st.mbw - 1;
    int bound = mpeg1 ? st.mbw * st.mbh : (mb_row + 1) * st.mbw;
    bool first_in_slice = true;

    while (true) {
      int64_t left = r.left();
      if (left <= 0) break;
      int probe = (int)std::min<int64_t>(23, left);
      if (r.peek_raw(probe) == 0) break;
      while (mpeg1 && r.left() >= 11 && r.peek_raw(11) == 0x00F) {
        r.skip(11);  // macroblock_stuffing (11172-2 only)
      }
      int inc = 0;
      while (r.left() >= ADDR_INC_ESCAPE_LEN &&
             r.peek_raw(ADDR_INC_ESCAPE_LEN) == ADDR_INC_ESCAPE_CODE) {
        r.skip(ADDR_INC_ESCAPE_LEN);
        inc += 33;
      }
      int e = g_addr.decode(r);
      if (e < 0) { errors++; return; }
      inc += B1_ADDR_INC[e].v0;
      if (first_in_slice) {
        addr += inc;
        first_in_slice = false;
      } else {
        for (int i = 0; i < inc - 1; i++) {
          addr += 1;
          if (addr >= bound) { errors++; return; }
          if (!skipped_mb(st, addr / st.mbw, addr % st.mbw)) {
            errors++;
            return;
          }
        }
        addr += 1;
      }
      if (addr >= bound) { errors++; return; }
      if (!macroblock(r, st, addr / st.mbw, addr % st.mbw)) {
        errors++;
        return;
      }
    }
  }

  // ---- picture-level machinery (mirrors decode_picture/_decode_slices) ---

  void mb_dims(int& mbw, int& mbh) {
    mbw = (seq.width + 15) / 16;
    int h = pic.structure == 3 ? seq.height : (seq.height + 1) / 2;
    mbh = (h + 15) / 16;
  }

  void emit(std::shared_ptr<FrameBuf> buf) {
    M2VT(T_EMIT);
    auto f = std::make_unique<OutFrame>();
    int h = seq.height, w = seq.width;
    f->width = w;
    f->height = h;
    f->cheight = seq.chroma_format == 1 ? (h + 1) / 2 : h;
    f->cwidth = (w + 1) / 2;
    f->coding_type = buf->coding_type;
    f->temporal_reference = buf->temporal_reference;
    f->progressive_frame = buf->progressive_frame;
    f->top_field_first = buf->top_field_first;
    f->repeat_first_field = buf->repeat_first_field;
    f->buf = std::move(buf);
    outq.push_back(std::move(f));
  }

  // returns true when a full frame completed
  bool decode_slices(const uint8_t* data,
                     const std::vector<std::pair<int, std::pair<int64_t,
                         int64_t>>>& slices) {
    bool frame_pic = pic.structure == 3;
    int mbw, mbh;
    mb_dims(mbw, mbh);

    if (frame_pic || !in_second_field) {
      cur = alloc_frame(mbw, frame_pic ? mbh : 2 * mbh,
                        seq.chroma_format);
      cur->coding_type = pic.coding_type;
      cur->temporal_reference = pic.temporal_reference;
      cur->progressive_frame = pic.progressive_frame;
      cur->top_field_first = frame_pic ? pic.top_field_first
                                       : (pic.structure == 1);
      cur->repeat_first_field = pic.repeat_first_field;
      if (!frame_pic) cur_first_parity = pic.structure == 1 ? 0 : 1;
    }

    SliceState st;
    st.mbw = mbw;
    st.mbh = mbh;
    st.frame_pic = frame_pic;
    st.cur_parity = frame_pic ? -1 : (pic.structure == 1 ? 0 : 1);
    st.scan = pic.alternate_scan ? SCAN_ALTERNATE : SCAN_ZIGZAG;
    st.cf = seq.chroma_format;
    st.c_rows = st.cf == 1 ? 8 : 16;
    st.c_len = st.c_rows * 8;
    st.nblocks = st.cf == 1 ? 6 : 8;
    st.dc_mult = 8 >> pic.intra_dc_precision;
    st.dc_reset = 1 << (pic.intra_dc_precision + 7);
    st.qs = 2;
    refresh_wq(st);

    int nthreads = std::min<int>((int)slices.size(), slice_threads());
    bool par = nthreads > 1 && !seq.mpeg1 && seq.height <= 2800;
    if (par) {
      // parallel only when every slice names a DISTINCT macroblock row
      // (one slice per row is the conformant broadcast shape): each
      // thread then writes its own rows exclusively and the output is
      // bit-identical to the serial order. Multi-slice rows, MPEG-1
      // row-crossing slices and tall (>2800) pictures decode serially.
      std::vector<char> seen((size_t)st.mbh + 1, 0);
      for (auto& s : slices) {
        int vp = s.first;
        if (vp < 1 || vp > st.mbh || seen[vp]) { par = false; break; }
        seen[vp] = 1;
      }
    }
    if (par) {
      std::atomic<size_t> next{0};
      std::vector<std::thread> pool;
      pool.reserve(nthreads);
      for (int t = 0; t < nthreads; t++)
        pool.emplace_back([&]() {
          SliceState lst = st;  // all prediction state resets per slice
          for (size_t k = next.fetch_add(1); k < slices.size();
               k = next.fetch_add(1)) {
            BitReader r{data, slices[k].second.first,
                        slices[k].second.second, false};
            decode_slice(r, lst, slices[k].first);
          }
        });
      for (auto& th : pool) th.join();
    } else {
      for (auto& s : slices) {
        BitReader r{data, s.second.first, s.second.second, false};
        decode_slice(r, st, s.first);
      }
    }

    if (frame_pic) {
      in_second_field = false;
      return true;
    }
    if (in_second_field) {
      in_second_field = false;
      return true;
    }
    in_second_field = true;
    return false;
  }

  // Feed one coded picture chunk (ES bytes incl. leading headers);
  // appends 0+ display-order frames to outq.
  void decode_picture(const uint8_t* data, int64_t len) {
    bool saw_picture = false;
    std::vector<std::pair<int, std::pair<int64_t, int64_t>>> slices;
    int64_t i = 0;
    while (i + 4 <= len) {
      if (!(data[i] == 0 && data[i + 1] == 0 && data[i + 2] == 1)) {
        i++;
        continue;
      }
      int code = data[i + 3];
      int64_t payload = i + 4;
      int64_t j = payload;
      while (j + 3 <= len &&
             !(data[j] == 0 && data[j + 1] == 0 && data[j + 2] == 1))
        j++;
      int64_t unit_end = (j + 3 <= len) ? j : len;
      BitReader r{data, payload * 8, unit_end * 8, false};
      if (code == 0xB3) {
        sequence_header(r);
        if (r.err) errors++;
      } else if (code == 0xB5) {
        extension(r);
        if (r.err) errors++;
      } else if (code == 0x00) {
        if (saw_picture) break;
        picture_header(r);
        if (r.err) errors++;
        saw_picture = true;
      } else if (code >= 0x01 && code <= 0xAF) {
        if (saw_picture)
          slices.push_back({code, {payload * 8, unit_end * 8}});
      }
      i = unit_end;
    }
    if (!saw_picture || !seq.valid) return;
    if (seq.chroma_format != 1 && seq.chroma_format != 2) {
      errors++;
      return;  // 4:2:0 / 4:2:2 only
    }
    int ct = pic.coding_type;
    if (ct < 1 || ct > 3) { errors++; return; }
    if (!in_second_field) {
      if (!have_i && ct != 1) return;
      if ((ct == 2 || ct == 3) && !ref_new) return;
    }

    bool frame_done = decode_slices(data, slices);
    if (ct == 1) have_i = true;
    if (!frame_done) return;

    std::shared_ptr<FrameBuf> fin = cur;
    cur.reset();
    if (ct == 3) {
      emit(fin);
    } else {
      if (pending) emit(pending);
      pending = fin;
      ref_old = ref_new;
      ref_new = fin;
    }
  }

  void flush() {
    if (pending) {
      emit(pending);
      pending.reset();
    }
  }
};

struct Handle {
  Decoder dec;
  // borrow-emit: frames handed to the caller without the copy-out;
  // kept alive here until M2V_ReleaseBorrow.  Releases may come from a
  // different thread (consumer GC), hence the mutex.
  std::mutex borrow_mu;
  std::unordered_map<long long, std::unique_ptr<OutFrame>> borrows;
  long long next_borrow = 1;
};

}  // namespace m2dec

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------

extern "C" {

void* M2V_Create() { return new m2dec::Handle(); }
void M2V_Destroy(void* h) { delete static_cast<m2dec::Handle*>(h); }

// Feed one coded picture chunk; returns frames now queued for output.
int M2V_DecodePicture(void* hp, const uint8_t* data, long long len) {
  auto& d = static_cast<m2dec::Handle*>(hp)->dec;
  d.decode_picture(data, len);
  return (int)d.outq.size();
}

int M2V_Flush(void* hp) {
  auto& d = static_cast<m2dec::Handle*>(hp)->dec;
  d.flush();
  return (int)d.outq.size();
}

// info[10] = {width, height, coding_type, temporal_reference,
//             progressive_frame, top_field_first, repeat_first_field,
//             errors_so_far, chroma_width, chroma_height};
// returns 1 when a frame is queued, else 0.
int M2V_NextInfo(void* hp, int* info) {
  auto& d = static_cast<m2dec::Handle*>(hp)->dec;
  if (d.outq.empty()) return 0;
  auto& f = *d.outq.front();
  info[0] = f.width;
  info[1] = f.height;
  info[2] = f.coding_type;
  info[3] = f.temporal_reference;
  info[4] = f.progressive_frame;
  info[5] = f.top_field_first;
  info[6] = f.repeat_first_field;
  info[7] = (int)d.errors;
  info[8] = f.cheight;
  info[9] = f.cwidth;
  return 1;
}

// Pop the front frame into caller buffers (y: h*w, u/v: ceil(h/2)*ceil(w/2)).
// Rows are copied straight from the padded decode planes (display crop).
int M2V_PopFrame(void* hp, uint8_t* y, uint8_t* u, uint8_t* v) {
  auto& d = static_cast<m2dec::Handle*>(hp)->dec;
  if (d.outq.empty()) return 0;
  auto f = std::move(d.outq.front());
  d.outq.pop_front();
  const m2dec::FrameBuf& b = *f->buf;
  int h = f->height, w = f->width;
  int ch = f->cheight, cw = f->cwidth;
  if (w == b.yw()) {
    std::memcpy(y, b.y.data(), (size_t)h * w);
  } else {
    for (int r = 0; r < h; r++)
      std::memcpy(y + (size_t)r * w, b.y.data() + (size_t)r * b.yw(), w);
  }
  if (cw == b.cw()) {
    std::memcpy(u, b.u.data(), (size_t)ch * cw);
    std::memcpy(v, b.v.data(), (size_t)ch * cw);
  } else {
    for (int r = 0; r < ch; r++) {
      std::memcpy(u + (size_t)r * cw, b.u.data() + (size_t)r * b.cw(), cw);
      std::memcpy(v + (size_t)r * cw, b.v.data() + (size_t)r * b.cw(), cw);
    }
  }
  return 1;
}

long long M2V_Errors(void* hp) {
  return static_cast<m2dec::Handle*>(hp)->dec.errors;
}

// Zero-copy emit: pop the front frame and hand out raw plane pointers
// into the padded decode planes (strides = padded widths).  The planes
// stay valid — and the FrameBuf may keep serving as a reference frame —
// until M2V_ReleaseBorrow(id).  The caller must treat them read-only.
int M2V_BorrowFrame(void* hp, long long* id, unsigned char** planes,
                    int* strides) {
  auto* H = static_cast<m2dec::Handle*>(hp);
  auto& d = H->dec;
  if (d.outq.empty()) return 0;
  auto f = std::move(d.outq.front());
  d.outq.pop_front();
  m2dec::FrameBuf& b = *f->buf;
  planes[0] = b.y.data();
  planes[1] = b.u.data();
  planes[2] = b.v.data();
  strides[0] = b.yw();
  strides[1] = b.cw();
  strides[2] = b.cw();
  std::lock_guard<std::mutex> lk(H->borrow_mu);
  long long bid = H->next_borrow++;
  H->borrows.emplace(bid, std::move(f));
  *id = bid;
  return 1;
}

void M2V_ReleaseBorrow(void* hp, long long id) {
  auto* H = static_cast<m2dec::Handle*>(hp);
  std::lock_guard<std::mutex> lk(H->borrow_mu);
  H->borrows.erase(id);
}

}  // extern "C"
