// Field-match cost host twin (KFM pass-1 metrics on the CPU).
//
// Used when the device link is slow (utils/device.device_link_is_slow):
// the numpy twin moves ~10x the data through temporaries; this kernel
// streams the uint8 frames once with exact integer products (the float32
// device kernel differs only by reduction rounding; decisions compare
// costs with wide margins). Mirrors ops/deint.field_match_costs:
//   out[3i+0] = comb(top_i, bot_i)        (frame as-is)
//   out[3i+1] = comb(top_i, bot_{i-1})    (top matches previous bottom)
//   out[3i+2] = comb(top_{i-1}, bot_i)    (bottom matches previous top)
// comb per ops/deint.combing_metric_fields: mean over rows of
// relu((W[r-1]-W[r]) * (W[r+1]-W[r])) of the woven frame.

#include <cmath>
#include <cstddef>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef __AVX2__
#include <immintrin.h>
#endif
using std::size_t;

namespace {

// one frame's combing energy for the weave of top rows (from ft) with
// bottom rows (from fb); frames are [h][w] uint8, top row y = 2y,
// bottom row y = 2y+1
static int64_t comb_energy(const uint8_t* ft, const uint8_t* fb,
                           int h, int w) {
  const int h2 = h / 2;
  int64_t total = 0;
  // odd rows r=2y+1: (t[y]-b[y]) * (t[y+1]-b[y]),  y = 0..h2-2
  // even rows r=2y:  (b[y-1]-t[y]) * (b[y]-t[y]),  y = 1..h2-1
  for (int y = 0; y + 1 < h2; y++) {
    const uint8_t* t0 = ft + (size_t)(2 * y) * w;
    const uint8_t* t1 = ft + (size_t)(2 * y + 2) * w;
    const uint8_t* b0 = fb + (size_t)(2 * y + 1) * w;
    const uint8_t* b1 = fb + (size_t)(2 * y + 3) * w;
    int64_t acc = 0;
    for (int x = 0; x < w; x++) {
      int odd = (t0[x] - b0[x]) * (t1[x] - b0[x]);
      int even = (b0[x] - t1[x]) * (b1[x] - t1[x]);
      acc += (odd > 0 ? odd : 0) + (even > 0 ? even : 0);
    }
    total += acc;
  }
  return total;
}

}  // namespace

extern "C" {

// frames: b contiguous [h][w] uint8 planes; out: [b][3] doubles.
void Amt_FieldMatchCosts(const uint8_t* frames, int b, int h, int w,
                         double* out) {
  const double div = (double)(h - 2) * w;
  const size_t fsz = (size_t)h * w;
  for (int i = 0; i < b; i++) {
    const uint8_t* cur = frames + i * fsz;
    const uint8_t* prev = i > 0 ? cur - fsz : cur;
    out[3 * i + 0] = comb_energy(cur, cur, h, w) / div;
    out[3 * i + 1] = comb_energy(cur, prev, h, w) / div;
    out[3 * i + 2] = comb_energy(prev, cur, h, w) / div;
  }
}

// KFM pass-3 host synthesis on uint8 (exact vs the float device path +
// round-to-uint8: weave/merge are copies, bob's missing line is
// (a+b+1)>>1 == clip(floor((a+b)*0.5 + 0.5))).
// ops: 0=WEAVE, 1=MERGE_PREV (top of src + bottom of src-1),
//      2=BOB_T, 3=BOB_B  (models/kfm.VFRPlan op codes)
void Amt_KfmSynth(const uint8_t* frames, const uint8_t* prev_frame,
                  int h, int w, const int32_t* src_idx,
                  const uint8_t* ops, int n_out, uint8_t* out) {
  const size_t fsz = (size_t)h * w;
  const int h2 = h / 2;
  for (int o = 0; o < n_out; o++) {
    int s = src_idx[o];
    const uint8_t* src = frames + (size_t)s * fsz;
    const uint8_t* prv = s > 0 ? src - fsz
                               : (prev_frame ? prev_frame : src);
    uint8_t* dst = out + (size_t)o * fsz;
    switch (ops[o]) {
      case 0:  // weave: verbatim
        for (size_t i = 0; i < fsz; i++) dst[i] = src[i];
        break;
      case 1:  // merge_prev: top field of src + bottom field of prev
        for (int y = 0; y < h2; y++) {
          const uint8_t* t = src + (size_t)(2 * y) * w;
          const uint8_t* pb = prv + (size_t)(2 * y + 1) * w;
          uint8_t* d0 = dst + (size_t)(2 * y) * w;
          uint8_t* d1 = dst + (size_t)(2 * y + 1) * w;
          for (int x = 0; x < w; x++) {
            d0[x] = t[x];
            d1[x] = pb[x];
          }
        }
        break;
      case 2:  // bob top field: missing odd line = avg(kept y, y+1)
        for (int y = 0; y < h2; y++) {
          const uint8_t* f0 = src + (size_t)(2 * y) * w;
          const uint8_t* f1 =
              src + (size_t)(2 * (y + 1 < h2 ? y + 1 : y)) * w;
          uint8_t* d0 = dst + (size_t)(2 * y) * w;
          uint8_t* d1 = dst + (size_t)(2 * y + 1) * w;
          for (int x = 0; x < w; x++) {
            d0[x] = f0[x];
            d1[x] = (uint8_t)((f0[x] + f1[x] + 1) >> 1);
          }
        }
        break;
      default:  // 3: bob bottom field: missing even line = avg(y-1, y)
        for (int y = 0; y < h2; y++) {
          const uint8_t* f0 = src + (size_t)(2 * (y > 0 ? y - 1 : 0)) * w + w;
          const uint8_t* f1 = src + (size_t)(2 * y) * w + w;
          uint8_t* d0 = dst + (size_t)(2 * y) * w;
          uint8_t* d1 = dst + (size_t)(2 * y + 1) * w;
          for (int x = 0; x < w; x++) {
            d0[x] = (uint8_t)((f0[x] + f1[x] + 1) >> 1);
            d1[x] = f1[x];
          }
        }
        break;
    }
  }
}

// Scene-metrics host twin (ops/cm.scene_metrics_batch_host): per frame
// the mean abs diff to the previous frame and a `bins`-bin normalised
// luma histogram, in one streaming pass over the uint8 planes.
void Amt_SceneMetrics(const uint8_t* frames, const uint8_t* prev_frame,
                      int b, int h, int w, int bins, double* diffs,
                      float* hists) {
  const size_t fsz = (size_t)h * w;
  for (int i = 0; i < b; i++) {
    const uint8_t* cur = frames + i * fsz;
    const uint8_t* prv = i > 0 ? cur - fsz : prev_frame;
    int64_t acc = 0;
    // 4 partial histograms: consecutive bytes hit different tables, so
    // the increment chains don't stall on store-to-load forwarding
    int64_t hist[4][256] = {};
    size_t j = 0;
#ifdef __AVX2__
    // |cur-prv| summed by SAD (8 byte-lanes -> one u64 per 8 bytes)
    __m256i vacc = _mm256_setzero_si256();
    for (; j + 32 <= fsz; j += 32) {
      __m256i a = _mm256_loadu_si256((const __m256i*)(cur + j));
      __m256i p = _mm256_loadu_si256((const __m256i*)(prv + j));
      vacc = _mm256_add_epi64(vacc, _mm256_sad_epu8(a, p));
      // histogram: scalar via a 64-bit register window (the scatter
      // increment can't vectorize; partials keep it ~1 byte/cycle)
      uint64_t q0, q1, q2, q3;
      std::memcpy(&q0, cur + j, 8);
      std::memcpy(&q1, cur + j + 8, 8);
      std::memcpy(&q2, cur + j + 16, 8);
      std::memcpy(&q3, cur + j + 24, 8);
      for (int k = 0; k < 8; k++) {
        hist[0][q0 & 0xFF]++; q0 >>= 8;
        hist[1][q1 & 0xFF]++; q1 >>= 8;
        hist[2][q2 & 0xFF]++; q2 >>= 8;
        hist[3][q3 & 0xFF]++; q3 >>= 8;
      }
    }
    alignas(32) int64_t sv[4];
    _mm256_store_si256((__m256i*)sv, vacc);
    acc = sv[0] + sv[1] + sv[2] + sv[3];
#endif
    for (; j < fsz; j++) {
      int d = (int)cur[j] - (int)prv[j];
      acc += d > 0 ? d : -d;
      hist[0][cur[j]]++;
    }
    diffs[i] = (double)acc / (double)fsz;
    // fold value counts into bins as integers FIRST, divide once —
    // bit-identical to the oracle's int64-count / fsz float conversion
    int64_t bh[256] = {};
    for (int v = 0; v < 256; v++)
      bh[(v * bins) >> 8] += hist[0][v] + hist[1][v] + hist[2][v]
                             + hist[3][v];
    float* hrow = hists + (size_t)i * bins;
    for (int k = 0; k < bins; k++)
      hrow[k] = (float)((double)bh[k] / (double)fsz);
  }
}

}  // extern "C"

// Yadif host twin: exact-integer mirror of ops/deint.yadif_deinterlace
// + the round-to-uint8 download. The float graph's values are all exact
// halves of integers here: track 2x everything (spatial candidate =
// pa+pc, temporal clamp bounds = 2*min/2*max of the neighbours, final
// round (v+1)>>1 == floor(v/2 + 0.5)), so the select chain runs in int
// arithmetic — identical results, and the compiler vectorises it.
// parity_top=1 keeps the top field of cur and reconstructs odd lines.
extern "C" void Amt_Yadif(const uint8_t* prev, const uint8_t* cur,
                          const uint8_t* next, int h, int w,
                          int parity_top, uint8_t* out) {
  const int h2 = h / 2;
  for (int y = 0; y < h2; y++) {
    int keep_row = parity_top ? 2 * y : 2 * y + 1;
    int miss_row = parity_top ? 2 * y + 1 : 2 * y;
    const uint8_t* k = cur + (size_t)keep_row * w;
    std::memcpy(out + (size_t)keep_row * w, k, w);
    const uint8_t* above;
    const uint8_t* below;
    if (parity_top) {
      above = cur + (size_t)(2 * y) * w;
      int yb = y + 1 < h2 ? y + 1 : y;
      below = cur + (size_t)(2 * yb) * w;
    } else {
      int ya = y > 0 ? y - 1 : 0;
      above = cur + (size_t)(2 * ya + 1) * w;
      below = cur + (size_t)(2 * y + 1) * w;
    }
    const uint8_t* tp = prev + (size_t)miss_row * w;
    const uint8_t* tn = next + (size_t)miss_row * w;
    uint8_t* dst = out + (size_t)miss_row * w;
    auto pixel = [&](int x, int xm2, int xm1, int xp1, int xp2) {
      int a0 = above[x], c0 = below[x];
      int best2 = a0 + c0;
      int bs = a0 > c0 ? a0 - c0 : c0 - a0;
      // candidate order mirrors _spatial_pred: +1, -1, +2, -2
      int pa, pc, sc;
      pa = above[xp1]; pc = below[xm1];
      sc = pa > pc ? pa - pc : pc - pa;
      if (sc < bs) { best2 = pa + pc; bs = sc; }
      pa = above[xm1]; pc = below[xp1];
      sc = pa > pc ? pa - pc : pc - pa;
      if (sc < bs) { best2 = pa + pc; bs = sc; }
      pa = above[xp2]; pc = below[xm2];
      sc = pa > pc ? pa - pc : pc - pa;
      if (sc < bs) { best2 = pa + pc; bs = sc; }
      pa = above[xm2]; pc = below[xp2];
      sc = pa > pc ? pa - pc : pc - pa;
      if (sc < bs) { best2 = pa + pc; bs = sc; }
      int tpv = tp[x], tnv = tn[x];
      int lo2 = 2 * (tpv < tnv ? tpv : tnv);
      int hi2 = 2 * (tpv > tnv ? tpv : tnv);
      int r2 = best2 < lo2 ? lo2 : (best2 > hi2 ? hi2 : best2);
      dst[x] = (uint8_t)((r2 + 1) >> 1);
    };
    for (int x = 2; x < w - 2; x++) pixel(x, x - 2, x - 1, x + 1, x + 2);
    // borders with edge-replicated column indexing
    auto cl = [&](int v) { return v < 0 ? 0 : (v >= w ? w - 1 : v); };
    for (int xi = 0; xi < 4; xi++) {
      int x = xi < 2 ? xi : w - 4 + xi;
      if (x < 0 || x >= w || (x >= 2 && x < w - 2)) continue;
      pixel(x, cl(x - 2), cl(x - 1), cl(x + 1), cl(x + 2));
    }
  }
}

// Motion-adaptive bob (qtgmc mode) host twin: exact-integer mirror of
// ops/deint.motion_adaptive_bob + round-to-uint8. Every intermediate of
// the float graph is an exact multiple of 1/16 here: spatial/MC
// candidates are halves (track 2x), the blend weight w =
// clip((12-m)/8, 0, 1) has an exact numerator w8 = clip(12-m, 0, 8),
// and the blended output lives in sixteenths: out16 = w8*weave2 +
// (8-w8)*moving2, rounded as (out16+8)>>4 == floor(out16/16 + 0.5).
namespace {

static inline int mab_pixel_fast(const uint8_t* above,
                                 const uint8_t* below, const uint8_t* tp,
                                 const uint8_t* tn, int x, int weave2,
                                 int m_dil) {
  int a0 = above[x], c0 = below[x];
  int sp2 = a0 + c0;
  int bs = a0 > c0 ? a0 - c0 : c0 - a0;
  int pa, pc, sc;
  pa = above[x + 1]; pc = below[x - 1];
  sc = pa > pc ? pa - pc : pc - pa;
  if (sc < bs) { sp2 = pa + pc; bs = sc; }
  pa = above[x - 1]; pc = below[x + 1];
  sc = pa > pc ? pa - pc : pc - pa;
  if (sc < bs) { sp2 = pa + pc; bs = sc; }
  pa = above[x + 2]; pc = below[x - 2];
  sc = pa > pc ? pa - pc : pc - pa;
  if (sc < bs) { sp2 = pa + pc; bs = sc; }
  pa = above[x - 2]; pc = below[x + 2];
  sc = pa > pc ? pa - pc : pc - pa;
  if (sc < bs) { sp2 = pa + pc; bs = sc; }
  int mc2 = tp[x] + tn[x];
  int me = tp[x] > tn[x] ? tp[x] - tn[x] : tn[x] - tp[x];
  int a, c, e;
  a = tp[x + 1]; c = tn[x - 1];
  e = a > c ? a - c : c - a;
  if (e < me) { mc2 = a + c; me = e; }
  a = tp[x - 1]; c = tn[x + 1];
  e = a > c ? a - c : c - a;
  if (e < me) { mc2 = a + c; me = e; }
  a = tp[x + 2]; c = tn[x - 2];
  e = a > c ? a - c : c - a;
  if (e < me) { mc2 = a + c; me = e; }
  a = tp[x - 2]; c = tn[x + 2];
  e = a > c ? a - c : c - a;
  if (e < me) { mc2 = a + c; me = e; }
  a = tp[x + 3]; c = tn[x - 3];
  e = a > c ? a - c : c - a;
  if (e < me) { mc2 = a + c; me = e; }
  a = tp[x - 3]; c = tn[x + 3];
  e = a > c ? a - c : c - a;
  if (e < me) { mc2 = a + c; me = e; }
  int lo2 = mc2 - 2 * me, hi2 = mc2 + 2 * me;
  int mv2 = sp2 < lo2 ? lo2 : (sp2 > hi2 ? hi2 : sp2);
  int w8 = 12 - m_dil;
  if (w8 < 0) w8 = 0;
  if (w8 > 8) w8 = 8;
  int out16 = w8 * weave2 + (8 - w8) * mv2;
  return (out16 + 8) >> 4;
}

}  // namespace

namespace {

// one 60p output frame's reconstruction (free function: every buffer is
// an explicit parameter so the autovectorizer can reason about aliasing)
static void mab_run_field(const uint8_t* prev, const uint8_t* cur,
                          const uint8_t* next, int h2, int W, int tff,
                          bool second, int* vm, uint8_t* dst) {
  const bool keep_top = second ? !tff : !!tff;
  const bool missing_top = !keep_top;
  for (int y = 0; y < h2; y++) {
    const uint8_t* k = cur + (size_t)(2 * y + (keep_top ? 0 : 1)) * W;
    std::memcpy(dst + (size_t)(2 * y + (keep_top ? 0 : 1)) * W, k, W);
  }
  const uint8_t* src_a = second ? cur : prev;
  const uint8_t* src_b = second ? next : cur;
  const int weave_mode = second ? 1 : 0;
  auto row = [&](const uint8_t* f, bool top, int y) {
    int yy = y < 0 ? 0 : (y >= h2 ? h2 - 1 : y);
    return f + (size_t)(2 * yy + (top ? 0 : 1)) * W;
  };
  for (int y = 0; y < h2; y++) {
    const uint8_t* above;
    const uint8_t* below;
    if (!missing_top) {
      above = row(cur, true, y);
      below = row(cur, true, y + 1);
    } else {
      above = row(cur, false, y - 1);
      below = row(cur, false, y);
    }
    const uint8_t* tp = row(src_a, missing_top, y);
    const uint8_t* tn = row(src_b, missing_top, y);
    {  // vertical max of |src_a - src_b| over field rows y-1..y+1
      const uint8_t* a0 = row(src_a, missing_top, y - 1);
      const uint8_t* b0 = row(src_b, missing_top, y - 1);
      const uint8_t* a2 = row(src_a, missing_top, y + 1);
      const uint8_t* b2 = row(src_b, missing_top, y + 1);
      for (int x = 0; x < W; x++) {
        int d0 = (int)a0[x] - (int)b0[x];
        if (d0 < 0) d0 = -d0;
        int d1 = (int)tp[x] - (int)tn[x];
        if (d1 < 0) d1 = -d1;
        int d2 = (int)a2[x] - (int)b2[x];
        if (d2 < 0) d2 = -d2;
        int m = d0 > d1 ? d0 : d1;
        vm[x] = m > d2 ? m : d2;
      }
    }
    uint8_t* d = dst + (size_t)(2 * y + (missing_top ? 0 : 1)) * W;
    // interior: fixed-offset accesses only (autovectorizable)
    if (weave_mode) {
      for (int x = 3; x < W - 3; x++) {
        int v = vm[x - 1] > vm[x] ? vm[x - 1] : vm[x];
        int m_dil = v > vm[x + 1] ? v : vm[x + 1];
        d[x] = (uint8_t)mab_pixel_fast(above, below, tp, tn, x,
                                       tp[x] + tn[x], m_dil);
      }
    } else {
      for (int x = 3; x < W - 3; x++) {
        int v = vm[x - 1] > vm[x] ? vm[x - 1] : vm[x];
        int m_dil = v > vm[x + 1] ? v : vm[x + 1];
        d[x] = (uint8_t)mab_pixel_fast(above, below, tp, tn, x,
                                       2 * tn[x], m_dil);
      }
    }
    // borders: clamped copies into small stack windows
    auto cl = [&](int v) { return v < 0 ? 0 : (v >= W ? W - 1 : v); };
    for (int xi = 0; xi < 6; xi++) {
      int x = xi < 3 ? xi : W - 6 + xi;
      if (x < 0 || x >= W || (x >= 3 && x < W - 3)) continue;
      uint8_t ab[7], bb[7], tpb[7], tnb[7];
      for (int i = 0; i < 7; i++) {
        int xx = cl(x - 3 + i);
        ab[i] = above[xx];
        bb[i] = below[xx];
        tpb[i] = tp[xx];
        tnb[i] = tn[xx];
      }
      int v = vm[cl(x - 1)] > vm[x] ? vm[cl(x - 1)] : vm[x];
      int m_dil = v > vm[cl(x + 1)] ? v : vm[cl(x + 1)];
      int weave2 = weave_mode ? tpb[3] + tnb[3] : 2 * tnb[3];
      d[x] = (uint8_t)mab_pixel_fast(ab, bb, tpb, tnb, 3, weave2, m_dil);
    }
  }
}

}  // namespace

// prev/cur/next: [h][w] uint8; out: [2][h][w] (two 60p frames per input
// frame, TFF: top-kept frame first).
extern "C" void Amt_MotionBob(const uint8_t* prev, const uint8_t* cur,
                              const uint8_t* next, int h, int w, int tff,
                              uint8_t* out) {
  const int h2 = h / 2;
  if (w < 8 || w > 16384) return;
  static thread_local std::vector<int> vm_buf;
  vm_buf.resize(w);
  mab_run_field(prev, cur, next, h2, w, tff, false, vm_buf.data(), out);
  mab_run_field(prev, cur, next, h2, w, tff, true, vm_buf.data(),
                out + (size_t)h * w);
}
