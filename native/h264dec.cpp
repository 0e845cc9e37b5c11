// native/h264dec.cpp -- from-scratch H.264 (ISO/IEC 14496-10) decoder.
//
// Bit-exact C++ twin of the pure-Python oracle
// amatsukaze_tpu/video/h264_ref.py + h264_cabac.py (functions cite the
// oracle they mirror; the oracle is cross-validated bit-exactly against
// libavcodec on libx264 streams in tests/test_h264_decode.py, and the
// native/oracle differential runs in tests/test_h264_native.py).  The
// reference project decodes H.264 via FFmpeg (reference
// Amatsukaze/ReaderWriterFFmpeg.hpp:256-483, AMTSource.hpp:97-152); there
// is no reference decoder to port -- this is an independent implementation.
//
// Scope: Baseline/Main/High frame, field (PAFF) and MBAFF coding
// (CAVLC + CABAC, I/P/B slices, 8x8 transform, scaling matrices,
// weighted prediction, full deblocking), 4:2:0 8-bit — validated
// native-vs-oracle incl. field/MBAFF streams (tests/test_h264_native,
// test_h264_paff, test_h264_mbaff).

#include <algorithm>
#include <array>
#include <cstdint>
#include <cstring>
#include <atomic>
#include <cstdlib>
#include <deque>
#include <map>
#include <memory>
#include <stdexcept>
#include <thread>
#include <vector>

#include "h264_tables.inc"

#if defined(__AVX2__)
#include <immintrin.h>
#define H264_SIMD 1
#endif

namespace h264 {

struct DecodeError : std::runtime_error {
  explicit DecodeError(const char* m) : std::runtime_error(m) {}
};

static inline int clamp_i(int v, int lo, int hi) {
  return v < lo ? lo : v > hi ? hi : v;
}
static inline int clip1(int v) { return v < 0 ? 0 : v > 255 ? 255 : v; }
static inline int median3(int a, int b, int c) {
  return a + b + c - std::min(a, std::min(b, c)) - std::max(a, std::max(b, c));
}
// Python floor division (needed where the oracle divides by negatives,
// h264_ref.py:3043 _implicit_weights)
static inline int floordiv(int a, int b) {
  int q = a / b, r = a % b;
  return (r != 0 && ((r < 0) != (b < 0))) ? q - 1 : q;
}

// ---------------------------------------------------------------------------
// Scan orders + normAdjust (h264_ref.py:36-88)
// ---------------------------------------------------------------------------

static int NORM4[6][3];
static int NORM8[6][6];
static const struct InitNorm {
  InitNorm() {
    for (int m = 0; m < 6; ++m) {
      for (int c = 0; c < 3; ++c) NORM4[m][c] = kDequant4Init[3 * m + c];
      for (int c = 0; c < 6; ++c) NORM8[m][c] = kDequant8Init[6 * m + c];
    }
  }
} g_init_norm;

// ---------------------------------------------------------------------------
// BitReader (utils/bits.py BitReader: MSB-first, exp-golomb)
// ---------------------------------------------------------------------------

struct BitReader {
  const uint8_t* data;
  size_t size;   // bytes
  size_t pos;    // bits
  BitReader(const uint8_t* d, size_t n, size_t bitpos = 0)
      : data(d), size(n), pos(bitpos) {}
  size_t total() const { return size * 8; }
  long bits_left() const { return (long)total() - (long)pos; }
  // zero-padded peek (never throws; used by the VLC prefix LUTs).
  // Hot path: one unaligned 8-byte load + bswap (same trick as
  // mpeg2dec.cpp peek_raw); byte loop only near the buffer tail.
  uint32_t peek_pad(int n) const {
    if (n == 0) return 0;
    uint64_t w;
    size_t byte = pos >> 3;
    if (byte + 8 <= size) {
      std::memcpy(&w, data + byte, 8);
      w = __builtin_bswap64(w);
    } else {
      w = 0;
      for (int i = 0; i < 8; ++i)
        w = (w << 8) | (byte + i < size ? data[byte + i] : 0);
    }
    int off = (int)(pos & 7);
    return (uint32_t)((w << off) >> (64 - n));
  }
  int read1() {
    if (pos >= total()) throw DecodeError("EOF");
    int v = (data[pos >> 3] >> (7 - (pos & 7))) & 1;
    ++pos;
    return v;
  }
  uint32_t read(int n) {
    if ((long)(pos + n) > (long)total()) throw DecodeError("EOF");
    uint32_t v = peek_pad(n);
    pos += n;
    return v;
  }
  void skip(int n) {
    if ((long)(pos + n) > (long)total()) throw DecodeError("EOF skip");
    pos += n;
  }
  void byte_align() { pos = (pos + 7) & ~(size_t)7; }
  int ue() {
    // Fast path: codes with <=15 leading zeros fit in a 32-bit peek
    // and decode as (first 2z+1 bits) - 1; identical to the bit loop.
    uint32_t w = peek_pad(32);
    if (w) {
      int z = __builtin_clz(w);
      if (z <= 15) {
        int len = 2 * z + 1;
        if ((long)(pos + len) > (long)total()) throw DecodeError("EOF");
        pos += len;
        return (int)((w >> (32 - len)) - 1);
      }
    }
    int zeros = 0;
    while (read1() == 0)
      if (++zeros > 32) throw DecodeError("bad exp-golomb");
    if (!zeros) return 0;
    int64_t v = ((int64_t)1 << zeros) - 1 + read(zeros);
    if (v > 0x7FFFFFF) throw DecodeError("exp-golomb out of range");
    return (int)v;
  }
  int se() {
    int k = ue();
    return (k & 1) ? (k + 1) / 2 : -(k / 2);
  }
};

// more_rbsp_data() (h264_ref.py:425-440): syntax remains before
// rbsp_trailing_bits().  True iff a set bit exists strictly after pos
// and before the final stop-one-bit, i.e. last set bit index > pos.
static bool more_rbsp_data(const BitReader& r) {
  if (r.bits_left() <= 0) return false;
  long last_one = -1;
  for (long byte = (long)r.size - 1; byte >= 0; --byte) {
    uint8_t v = r.data[byte];
    if (v) {
      int lsb = __builtin_ctz(v);
      last_one = byte * 8 + (7 - lsb);
      break;
    }
  }
  if (last_one < (long)r.pos) return false;  // tail is all-zero (malformed)
  return (long)r.pos < last_one;
}

// ---------------------------------------------------------------------------
// CAVLC prefix LUTs built from the flat normative tables
// (h264_ref.py:95-153 _vlc_dict/_read_vlc; prefix-free so a full-prefix
// LUT probe decodes identically to the oracle's shortest-match loop)
// ---------------------------------------------------------------------------

struct VlcLut {
  int maxlen = 0;
  std::vector<uint16_t> lut;  // (k << 5) | len; 0 = invalid
  void build(const uint8_t* len_tab, const uint16_t* bits_tab, int lo, int n) {
    maxlen = 0;
    for (int k = 0; k < n; ++k)
      maxlen = std::max(maxlen, (int)len_tab[lo + k]);
    lut.assign((size_t)1 << maxlen, 0);
    for (int k = 0; k < n; ++k) {
      int ln = len_tab[lo + k];
      if (!ln) continue;
      uint32_t base = (uint32_t)bits_tab[lo + k] << (maxlen - ln);
      uint32_t cnt = 1u << (maxlen - ln);
      for (uint32_t i = 0; i < cnt; ++i)
        lut[base + i] = (uint16_t)((k << 5) | ln);
    }
  }
};

static VlcLut COEFF_TOKEN[4];
static VlcLut COEFF_TOKEN_CDC;
static VlcLut TOTAL_ZEROS[15];
static VlcLut TOTAL_ZEROS_CDC[3];
static VlcLut RUN_BEFORE[7];
static const struct InitVlc {
  InitVlc() {
    for (int c = 0; c < 4; ++c)
      COEFF_TOKEN[c].build(kCoeffTokenLen, kCoeffTokenBits, 68 * c, 68);
    COEFF_TOKEN_CDC.build(kCdcCoeffTokenLen, kCdcCoeffTokenBits, 0, 20);
    for (int row = 0; row < 15; ++row)
      TOTAL_ZEROS[row].build(kTotalZerosLen, kTotalZerosBits, 16 * row, 16);
    for (int row = 0; row < 3; ++row)
      TOTAL_ZEROS_CDC[row].build(kCdcTotalZerosLen, kCdcTotalZerosBits,
                                 4 * row, 4);
    for (int row = 0; row < 7; ++row)
      RUN_BEFORE[row].build(kRunBeforeLen, kRunBeforeBits, 16 * row, 16);
  }
} g_init_vlc;

static int read_vlc(BitReader& r, const VlcLut& t) {
  uint16_t e = t.lut[r.peek_pad(t.maxlen)];
  if (!e) throw DecodeError("invalid VLC code");
  int ln = e & 31;
  if ((long)(r.pos + ln) > (long)r.total()) throw DecodeError("EOF in VLC");
  r.pos += ln;
  return e >> 5;
}

// ---------------------------------------------------------------------------
// NAL / RBSP (h264_ref.py:160-190)
// ---------------------------------------------------------------------------

static void ebsp_to_rbsp(const uint8_t* d, size_t n, std::vector<uint8_t>& out) {
  out.clear();
  out.reserve(n);
  size_t i = 0;
  while (i + 2 < n) {
    if (d[i] == 0 && d[i + 1] == 0 && d[i + 2] == 3) {
      out.push_back(0);
      out.push_back(0);
      i += 3;
    } else {
      out.push_back(d[i]);
      ++i;
    }
  }
  while (i < n) out.push_back(d[i++]);
}

// split_annexb: (start, len) pairs of NAL payloads (no start codes),
// trailing_zero_8bits stripped (h264_ref.py:175-190)
static void split_annexb(const uint8_t* d, size_t n,
                         std::vector<std::pair<size_t, size_t>>& nals) {
  nals.clear();
  size_t i = 0;
  // find first start code
  size_t sc = (size_t)-1;
  for (size_t k = 0; k + 2 < n; ++k)
    if (d[k] == 0 && d[k + 1] == 0 && d[k + 2] == 1) {
      sc = k;
      break;
    }
  if (sc == (size_t)-1) return;
  i = sc;
  while (true) {
    size_t j = (size_t)-1;
    for (size_t k = i + 3; k + 2 < n; ++k)
      if (d[k] == 0 && d[k + 1] == 0 && d[k + 2] == 1) {
        j = k;
        break;
      }
    size_t end = (j == (size_t)-1) ? n : j;
    while (end > i + 3 && d[end - 1] == 0) --end;
    if (end > i + 3) nals.emplace_back(i + 3, end - (i + 3));
    if (j == (size_t)-1) break;
    i = j;
  }
}

// ---------------------------------------------------------------------------
// Parameter sets (h264_ref.py:197-440)
// ---------------------------------------------------------------------------

typedef std::vector<std::vector<int>> ScalingMatrix;  // lists in zigzag order

static const uint8_t* default_list(int i, int* size) {
  if (i < 6) {
    *size = 16;
    return i < 3 ? kDefault4Intra : kDefault4Inter;
  }
  *size = 64;
  return ((i - 6) % 2 == 0) ? kDefault8Intra : kDefault8Inter;
}

static void parse_scaling_list(BitReader& r, int size, std::vector<int>& scale,
                               bool* use_default) {
  scale.assign(size, 0);
  int last = 8, nxt = 8;
  *use_default = false;
  for (int j = 0; j < size; ++j) {
    if (nxt != 0) {
      int delta = r.se();
      nxt = ((last + delta) % 256 + 256) % 256;
      if (j == 0 && nxt == 0) *use_default = true;
    }
    scale[j] = (nxt == 0) ? last : nxt;
    last = scale[j];
  }
}

// fallback(i, parsed) supplied as a callable; rule A chains defaults,
// rule B falls back to the SPS matrices (h264_ref.py:225-256)
template <typename FB>
static void read_scaling_matrices(BitReader& r, int n_lists, FB fallback,
                                  ScalingMatrix& out) {
  out.clear();
  for (int i = 0; i < n_lists; ++i) {
    int size = (i < 6) ? 16 : 64;
    std::vector<int> lst;
    if (r.read1()) {
      bool use_def;
      parse_scaling_list(r, size, lst, &use_def);
      if (use_def) {
        int sz;
        const uint8_t* dl = default_list(i, &sz);
        lst.assign(dl, dl + sz);
      }
    } else {
      fallback(i, out, lst);
    }
    out.push_back(std::move(lst));
  }
}

struct SPS {
  int profile_idc = 0, level_idc = 0, sps_id = 0;
  int chroma_format_idc = 1, separate_colour_plane = 0;
  int bit_depth_luma = 8, bit_depth_chroma = 8;
  int qpprime_y_zero_transform_bypass = 0;
  bool has_scaling = false;
  ScalingMatrix scaling_matrix;
  int log2_max_frame_num = 4;
  int poc_type = 0, log2_max_poc_lsb = 4;
  int delta_pic_order_always_zero = 0;
  int offset_for_non_ref_pic = 0, offset_for_top_to_bottom_field = 0;
  std::vector<int> offset_for_ref_frame;
  int max_num_ref_frames = 0, gaps_in_frame_num_allowed = 0;
  int pic_width_in_mbs = 0, pic_height_in_map_units = 0;
  int frame_mbs_only = 1, mb_adaptive_frame_field = 0;
  int direct_8x8_inference = 0;
  int crop[4] = {0, 0, 0, 0};
  int width() const { return pic_width_in_mbs * 16; }
  int height() const {
    return pic_height_in_map_units * 16 * (2 - frame_mbs_only);
  }
};

static void parse_sps(const std::vector<uint8_t>& rbsp, SPS& s) {
  BitReader r(rbsp.data(), rbsp.size());
  s = SPS();
  s.profile_idc = (int)r.read(8);
  r.skip(8);
  s.level_idc = (int)r.read(8);
  s.sps_id = r.ue();
  static const int kHigh[] = {100, 110, 122, 244, 44,  83, 86,
                              118, 128, 138, 139, 134, 135};
  bool high = false;
  for (int p : kHigh) high |= (s.profile_idc == p);
  if (high) {
    s.chroma_format_idc = r.ue();
    if (s.chroma_format_idc == 3) s.separate_colour_plane = r.read1();
    s.bit_depth_luma = 8 + r.ue();
    s.bit_depth_chroma = 8 + r.ue();
    s.qpprime_y_zero_transform_bypass = r.read1();
    if (r.read1()) {  // seq_scaling_matrix_present
      int n = (s.chroma_format_idc != 3) ? 8 : 12;
      // fallback rule A (h264_ref.py:252-256)
      auto fb = [](int i, const ScalingMatrix& parsed, std::vector<int>& lst) {
        if (i == 0 || i == 3 || i >= 6) {
          int sz;
          const uint8_t* dl = default_list(i, &sz);
          lst.assign(dl, dl + sz);
        } else {
          lst = parsed[i - 1];
        }
      };
      read_scaling_matrices(r, n, fb, s.scaling_matrix);
      s.has_scaling = true;
    }
  }
  s.log2_max_frame_num = 4 + r.ue();
  if (s.log2_max_frame_num > 16) throw DecodeError("bad log2_max_frame_num");
  s.poc_type = r.ue();
  if (s.poc_type == 0) {
    s.log2_max_poc_lsb = 4 + r.ue();
    if (s.log2_max_poc_lsb > 16) throw DecodeError("bad log2_max_poc_lsb");
  } else if (s.poc_type == 1) {
    s.delta_pic_order_always_zero = r.read1();
    s.offset_for_non_ref_pic = r.se();
    s.offset_for_top_to_bottom_field = r.se();
    int n = r.ue();
    s.offset_for_ref_frame.clear();
    for (int i = 0; i < n; ++i) s.offset_for_ref_frame.push_back(r.se());
  }
  s.max_num_ref_frames = r.ue();
  s.gaps_in_frame_num_allowed = r.read1();
  s.pic_width_in_mbs = r.ue() + 1;
  s.pic_height_in_map_units = r.ue() + 1;
  if (s.pic_width_in_mbs > 1024 || s.pic_height_in_map_units > 1024)
    throw DecodeError("absurd picture dimensions");
  s.frame_mbs_only = r.read1();
  if (!s.frame_mbs_only) s.mb_adaptive_frame_field = r.read1();
  s.direct_8x8_inference = r.read1();
  if (r.read1())
    for (int i = 0; i < 4; ++i) s.crop[i] = r.ue();
  // VUI ignored for pixel decode (timing lives in ts/video_h264.py)
}

struct PPS {
  int pps_id = 0, sps_id = 0;
  int entropy_coding_mode = 0;
  int bottom_field_pic_order_in_frame_present = 0;
  int num_slice_groups = 1;
  int num_ref_idx_default[2] = {1, 1};
  int weighted_pred = 0, weighted_bipred_idc = 0;
  int pic_init_qp = 26, pic_init_qs = 26;
  int chroma_qp_index_offset = 0;
  int deblocking_filter_control_present = 0;
  int constrained_intra_pred = 0, redundant_pic_cnt_present = 0;
  int transform_8x8_mode = 0;
  bool has_scaling = false;
  ScalingMatrix scaling_matrix;  // resolved final lists (zigzag)
  int second_chroma_qp_index_offset = 0;
};

static void parse_pps(const std::vector<uint8_t>& rbsp,
                      const std::map<int, SPS>& sps_map, PPS& p) {
  BitReader r(rbsp.data(), rbsp.size());
  p = PPS();
  p.pps_id = r.ue();
  p.sps_id = r.ue();
  const SPS* sps = nullptr;
  auto it = sps_map.find(p.sps_id);
  if (it != sps_map.end()) sps = &it->second;
  p.entropy_coding_mode = r.read1();
  p.bottom_field_pic_order_in_frame_present = r.read1();
  p.num_slice_groups = r.ue() + 1;
  if (p.num_slice_groups > 8) throw DecodeError("bad num_slice_groups");
  if (p.num_slice_groups > 1) {  // FMO -- not used by broadcast/x264
    int map_type = r.ue();
    if (map_type == 0) {
      for (int i = 0; i < p.num_slice_groups; ++i) r.ue();
    } else if (map_type == 2) {
      for (int i = 0; i < p.num_slice_groups - 1; ++i) {
        r.ue();
        r.ue();
      }
    } else if (map_type >= 3 && map_type <= 5) {
      r.read1();
      r.ue();
    } else if (map_type == 6) {
      int n = r.ue() + 1;
      int bits = 1;
      while ((1 << bits) < p.num_slice_groups) ++bits;
      if (p.num_slice_groups - 1 == 0) bits = 1;
      else {
        bits = 0;
        int v = p.num_slice_groups - 1;
        while (v) { ++bits; v >>= 1; }
        if (bits == 0) bits = 1;
      }
      for (int i = 0; i < n; ++i) r.read(bits);
    }
  }
  p.num_ref_idx_default[0] = r.ue() + 1;
  p.num_ref_idx_default[1] = r.ue() + 1;
  p.weighted_pred = r.read1();
  p.weighted_bipred_idc = (int)r.read(2);
  p.pic_init_qp = 26 + r.se();
  p.pic_init_qs = 26 + r.se();
  p.chroma_qp_index_offset = r.se();
  p.deblocking_filter_control_present = r.read1();
  p.constrained_intra_pred = r.read1();
  p.redundant_pic_cnt_present = r.read1();
  p.second_chroma_qp_index_offset = p.chroma_qp_index_offset;
  if (sps && sps->has_scaling) {
    p.scaling_matrix = sps->scaling_matrix;
    p.has_scaling = true;
  }
  if (more_rbsp_data(r)) {
    p.transform_8x8_mode = r.read1();
    if (r.read1()) {  // pic_scaling_matrix_present
      int n = 6 + ((sps && sps->chroma_format_idc == 3) ? 6 : 2) *
                      p.transform_8x8_mode;
      const ScalingMatrix* sps_mat =
          (sps && sps->has_scaling) ? &sps->scaling_matrix : nullptr;
      // fallback rule B (h264_ref.py:403-408)
      auto fb = [sps_mat](int i, const ScalingMatrix& parsed,
                          std::vector<int>& lst) {
        if (i == 0 || i == 3 || i >= 6) {
          if (sps_mat && i < (int)sps_mat->size()) {
            lst = (*sps_mat)[i];
          } else {
            int sz;
            const uint8_t* dl = default_list(i, &sz);
            lst.assign(dl, dl + sz);
          }
        } else {
          lst = parsed[i - 1];
        }
      };
      read_scaling_matrices(r, n, fb, p.scaling_matrix);
      p.has_scaling = true;
    }
    p.second_chroma_qp_index_offset = r.se();
  } else {
    p.second_chroma_qp_index_offset = p.chroma_qp_index_offset;
  }
}

// ---------------------------------------------------------------------------
// Slice header (h264_ref.py:447-604)
// ---------------------------------------------------------------------------

enum { SLICE_P = 0, SLICE_B = 1, SLICE_I = 2, SLICE_SP = 3, SLICE_SI = 4 };

struct PredWeights {
  bool present = false;
  int luma_log2 = 0, chroma_log2 = 0;
  // weights[list][ref] = {wY, oY, wCb, oCb, wCr, oCr}
  std::vector<std::array<int, 6>> w[2];
};

struct SliceHeader {
  int first_mb = 0;
  int slice_type = 0;
  bool all_equal = false;
  int pps_id = 0, frame_num = 0;
  int field_pic_flag = 0, bottom_field_flag = 0;
  bool idr = false;
  int idr_pic_id = 0;
  int poc_lsb = 0, delta_poc_bottom = 0;
  int delta_poc[2] = {0, 0};
  int redundant_pic_cnt = 0;
  int direct_spatial_mv_pred = 0;
  int num_ref_idx[2] = {0, 0};
  std::vector<std::pair<int, int>> ref_list_mods[2];
  PredWeights pred_weights;
  std::vector<std::array<int, 3>> mmco;  // (op, v1, v2)
  int no_output_of_prior_pics = 0, long_term_reference_flag = 0;
  bool adaptive_ref_pic_marking = false;
  int cabac_init_idc = 0;
  int slice_qp = 26;
  int disable_deblocking_filter_idc = 0;
  int slice_alpha_c0_offset_div2 = 0, slice_beta_offset_div2 = 0;
  int nal_ref_idc = 0;
  size_t data_bit_pos = 0;
};

static void parse_pred_weights(BitReader& r, SliceHeader& h, const SPS& sps) {
  PredWeights& pw = h.pred_weights;
  pw.present = true;
  pw.luma_log2 = r.ue();
  pw.chroma_log2 = (sps.chroma_format_idc != 0) ? r.ue() : 0;
  if (pw.luma_log2 > 7 || pw.chroma_log2 > 7)
    throw DecodeError("bad weight denominator");
  int n_lists = (h.slice_type == SLICE_B) ? 2 : 1;
  for (int lx = 0; lx < n_lists; ++lx) {
    int cnt = (lx == 1) ? h.num_ref_idx[1] : h.num_ref_idx[0];
    for (int i = 0; i < cnt; ++i) {
      std::array<int, 6> wt;
      wt[0] = 1 << pw.luma_log2;
      wt[1] = 0;
      if (r.read1()) {
        wt[0] = r.se();
        wt[1] = r.se();
      }
      wt[2] = wt[4] = 1 << pw.chroma_log2;
      wt[3] = wt[5] = 0;
      if (sps.chroma_format_idc != 0 && r.read1()) {
        wt[2] = r.se();
        wt[3] = r.se();
        wt[4] = r.se();
        wt[5] = r.se();
      }
      pw.w[lx].push_back(wt);
    }
  }
}

static void parse_slice_header(const std::vector<uint8_t>& rbsp,
                               int nal_ref_idc, int nal_type,
                               const std::map<int, SPS>& sps_map,
                               const std::map<int, PPS>& pps_map,
                               SliceHeader& h, const SPS** sps_out,
                               const PPS** pps_out) {
  BitReader r(rbsp.data(), rbsp.size());
  h = SliceHeader();
  h.nal_ref_idc = nal_ref_idc;
  h.idr = (nal_type == 5);
  h.first_mb = r.ue();
  int st = r.ue();
  h.all_equal = st >= 5;
  h.slice_type = st % 5;
  h.pps_id = r.ue();
  auto pit = pps_map.find(h.pps_id);
  if (pit == pps_map.end()) throw DecodeError("unknown PPS");
  const PPS& pps = pit->second;
  auto sit = sps_map.find(pps.sps_id);
  if (sit == sps_map.end()) throw DecodeError("unknown SPS");
  const SPS& sps = sit->second;
  *sps_out = &sps;
  *pps_out = &pps;
  if (sps.separate_colour_plane) r.read(2);
  h.frame_num = (int)r.read(sps.log2_max_frame_num);
  if (!sps.frame_mbs_only) {
    h.field_pic_flag = r.read1();
    if (h.field_pic_flag) h.bottom_field_flag = r.read1();
  }
  if (h.idr) h.idr_pic_id = r.ue();
  if (sps.poc_type == 0) {
    h.poc_lsb = (int)r.read(sps.log2_max_poc_lsb);
    if (pps.bottom_field_pic_order_in_frame_present && !h.field_pic_flag)
      h.delta_poc_bottom = r.se();
  } else if (sps.poc_type == 1 && !sps.delta_pic_order_always_zero) {
    h.delta_poc[0] = r.se();
    h.delta_poc[1] =
        (pps.bottom_field_pic_order_in_frame_present && !h.field_pic_flag)
            ? r.se()
            : 0;
  }
  if (pps.redundant_pic_cnt_present) h.redundant_pic_cnt = r.ue();
  if (h.slice_type == SLICE_B) h.direct_spatial_mv_pred = r.read1();
  int n0 = pps.num_ref_idx_default[0], n1 = pps.num_ref_idx_default[1];
  if (h.slice_type == SLICE_P || h.slice_type == SLICE_SP ||
      h.slice_type == SLICE_B) {
    if (r.read1()) {
      n0 = r.ue() + 1;
      if (h.slice_type == SLICE_B) n1 = r.ue() + 1;
    }
  }
  if (n0 > 32 || n1 > 32) throw DecodeError("bad num_ref_idx");
  h.num_ref_idx[0] = n0;
  h.num_ref_idx[1] = (h.slice_type == SLICE_B) ? n1 : 0;
  int n_lists = 0;
  if (h.slice_type == SLICE_P || h.slice_type == SLICE_SP) n_lists = 1;
  if (h.slice_type == SLICE_B) n_lists = 2;
  for (int lx = 0; lx < n_lists; ++lx) {
    if (r.read1()) {
      while (true) {
        int op = r.ue();
        if (op == 3) break;
        if (h.ref_list_mods[lx].size() > 64)
          throw DecodeError("runaway ref_pic_list_modification");
        h.ref_list_mods[lx].emplace_back(op, r.ue());
      }
    }
  }
  if ((pps.weighted_pred &&
       (h.slice_type == SLICE_P || h.slice_type == SLICE_SP)) ||
      (pps.weighted_bipred_idc == 1 && h.slice_type == SLICE_B))
    parse_pred_weights(r, h, sps);
  if (nal_ref_idc) {
    if (h.idr) {
      h.no_output_of_prior_pics = r.read1();
      h.long_term_reference_flag = r.read1();
    } else {
      if (r.read1()) {
        h.adaptive_ref_pic_marking = true;
        while (true) {
          int op = r.ue();
          if (op == 0) break;
          if (h.mmco.size() > 64) throw DecodeError("runaway MMCO");
          std::array<int, 3> vals = {op, 0, 0};
          int vi = 1;
          if (op == 1 || op == 3) vals[vi++] = r.ue();
          if (op == 2) vals[vi++] = r.ue();
          if (op == 3 || op == 6) vals[vi++] = r.ue();
          if (op == 4) vals[vi++] = r.ue();
          h.mmco.push_back(vals);
        }
      }
    }
  }
  if (pps.entropy_coding_mode && h.slice_type != SLICE_I &&
      h.slice_type != SLICE_SI) {
    h.cabac_init_idc = r.ue();
    if (h.cabac_init_idc > 2) throw DecodeError("bad cabac_init_idc");
  }
  h.slice_qp = pps.pic_init_qp + r.se();
  if (h.slice_type == SLICE_SP || h.slice_type == SLICE_SI) {
    if (h.slice_type == SLICE_SP) r.read1();
    r.se();
  }
  if (pps.deblocking_filter_control_present) {
    h.disable_deblocking_filter_idc = r.ue();
    if (h.disable_deblocking_filter_idc != 1) {
      h.slice_alpha_c0_offset_div2 = r.se();
      h.slice_beta_offset_div2 = r.se();
    }
  }
  h.data_bit_pos = r.pos;
}

// ---------------------------------------------------------------------------
// CAVLC residual block decode (9.2; h264_ref.py:611-675)
// ---------------------------------------------------------------------------

// nc >= 0: luma/chroma-AC context class; nc == -1: chroma DC (4:2:0).
// Returns total_coeff; coeffs[0..max_coeff) in scan order.
static int cavlc_block(BitReader& r, int nc, int max_coeff, int* coeffs) {
  int k;
  if (nc >= 0) {
    int cls = nc < 2 ? 0 : nc < 4 ? 1 : nc < 8 ? 2 : 3;
    k = read_vlc(r, COEFF_TOKEN[cls]);
  } else {
    k = read_vlc(r, COEFF_TOKEN_CDC);
  }
  int tc = k >> 2, t1 = k & 3;
  std::memset(coeffs, 0, sizeof(int) * max_coeff);
  if (tc == 0) return 0;
  int suffix_len = (tc > 10 && t1 < 3) ? 1 : 0;
  int levels[16];
  for (int i = 0; i < tc; ++i) {
    if (i < t1) {
      levels[i] = 1 - 2 * r.read1();
      continue;
    }
    // level_prefix: count leading zeros via one 32-bit peek (identical
    // to the bit loop for prefixes <= 31; the all-zero window falls back)
    int prefix = 0;
    uint32_t pw = r.peek_pad(32);
    if (pw) {
      prefix = __builtin_clz(pw);
      if ((long)(r.pos + prefix + 1) > (long)r.total())
        throw DecodeError("EOF");
      r.pos += prefix + 1;
    } else {
      while (r.read1() == 0) {
        if (++prefix > 32) throw DecodeError("bad level_prefix");
      }
    }
    long lcode = (long)std::min(15, prefix) << suffix_len;
    int sz = suffix_len;
    if (prefix >= 15)
      sz = prefix - 3;
    else if (prefix == 14 && suffix_len == 0)
      sz = 4;
    if (sz) lcode += r.read(sz);
    if (prefix >= 15 && suffix_len == 0) lcode += 15;
    if (prefix >= 16) lcode += (1L << (prefix - 3)) - 4096;
    if (i == t1 && t1 < 3) lcode += 2;
    int level = ((lcode & 1) == 0) ? (int)((lcode + 2) >> 1)
                                   : -(int)((lcode + 1) >> 1);
    if (suffix_len == 0) suffix_len = 1;
    if (std::abs(level) > (3 << (suffix_len - 1)) && suffix_len < 6)
      ++suffix_len;
    levels[i] = level;
  }
  int total_zeros = 0;
  if (tc < max_coeff) {
    if (nc == -1)
      total_zeros = read_vlc(r, TOTAL_ZEROS_CDC[tc - 1]);
    else
      total_zeros = read_vlc(r, TOTAL_ZEROS[tc - 1]);
  }
  int zeros_left = total_zeros;
  int idx = tc + total_zeros - 1;
  for (int i = 0; i < tc; ++i) {
    if (idx < 0 || idx >= max_coeff)
      throw DecodeError("corrupt run_before");
    coeffs[idx] = levels[i];
    if (i == tc - 1) break;
    int run = 0;
    if (zeros_left > 0)
      run = read_vlc(r, RUN_BEFORE[std::min(zeros_left, 7) - 1]);
    zeros_left -= run;
    idx -= 1 + run;
  }
  return tc;
}

// ---------------------------------------------------------------------------
// Dequantisation + transforms (8.5; h264_ref.py:686-969)
// ---------------------------------------------------------------------------

static void dequant4_tab(int qp, const int* weight_raster, int32_t* out16) {
  const int* na = NORM4[qp % 6];
  for (int k = 0; k < 16; ++k)
    out16[k] = weight_raster[k] * na[kPosClass4[k]];
}

static inline int dequant4_apply(int c, int ls, int qp) {
  // 8.5.12.1 (h264_ref.py:695-700)
  if (qp >= 24) return (int)((int64_t)c * ls * ((int64_t)1 << (qp / 6 - 4)));
  return (int)(((int64_t)c * ls + (1 << (3 - qp / 6))) >> (4 - qp / 6));
}

static void dequant8_tab(int qp, const int* weight_raster, int32_t* out64) {
  const int* na = NORM8[qp % 6];
  for (int k = 0; k < 64; ++k)
    out64[k] = weight_raster[k] * na[kPosClass8[k]];
}

static inline int dequant8_apply(int c, int ls, int qp) {
  // FFmpeg-probed rounding (h264_ref.py:737-742)
  if (qp >= 36) return (int)((int64_t)c * ls * ((int64_t)1 << (qp / 6 - 6)));
  return (int)(((int64_t)c * ls + (1 << (5 - qp / 6))) >> (6 - qp / 6));
}

// exact 8.5.12.2 inverse 4x4 (h264_ref.py:703-728); in-place raster d[16]
static void idct4x4(int* d, int* out) {
  int e[16];
  for (int i = 0; i < 4; ++i) {
    int d0 = d[4 * i], d1 = d[4 * i + 1], d2 = d[4 * i + 2], d3 = d[4 * i + 3];
    int a0 = d0 + d2, a1 = d0 - d2;
    int a2 = (d1 >> 1) - d3, a3 = d1 + (d3 >> 1);
    e[4 * i] = a0 + a3;
    e[4 * i + 1] = a1 + a2;
    e[4 * i + 2] = a1 - a2;
    e[4 * i + 3] = a0 - a3;
  }
  for (int j = 0; j < 4; ++j) {
    int d0 = e[j], d1 = e[4 + j], d2 = e[8 + j], d3 = e[12 + j];
    int a0 = d0 + d2, a1 = d0 - d2;
    int a2 = (d1 >> 1) - d3, a3 = d1 + (d3 >> 1);
    out[j] = (a0 + a3 + 32) >> 6;
    out[4 + j] = (a1 + a2 + 32) >> 6;
    out[8 + j] = (a1 - a2 + 32) >> 6;
    out[12 + j] = (a0 - a3 + 32) >> 6;
  }
}

static void idct8_1d(const int* d, int* o) {
  // h264_ref.py:745-764
  int d0 = d[0], d1 = d[1], d2 = d[2], d3 = d[3];
  int d4 = d[4], d5 = d[5], d6 = d[6], d7 = d[7];
  int a0 = d0 + d4, a2 = d0 - d4;
  int a4 = (d2 >> 1) - d6, a6 = d2 + (d6 >> 1);
  int b0 = a0 + a6, b2 = a2 + a4, b4 = a2 - a4, b6 = a0 - a6;
  int a1 = -d3 + d5 - d7 - (d7 >> 1);
  int a3 = d1 + d7 - d3 - (d3 >> 1);
  int a5 = -d1 + d7 + d5 + (d5 >> 1);
  int a7 = d3 + d5 + d1 + (d1 >> 1);
  int b1 = a1 + (a7 >> 2), b3 = a3 + (a5 >> 2);
  int b5 = (a3 >> 2) - a5, b7 = a7 - (a1 >> 2);
  o[0] = b0 + b7;
  o[1] = b2 + b5;
  o[2] = b4 + b3;
  o[3] = b6 + b1;
  o[4] = b6 - b1;
  o[5] = b4 - b3;
  o[6] = b2 - b5;
  o[7] = b0 - b7;
}

// rows then columns, FFmpeg-matched pass order (h264_ref.py:767-778)
static void idct8x8(int* d, int* out) {
  int e[64];
  for (int i = 0; i < 8; ++i) idct8_1d(d + 8 * i, e + 8 * i);
  int col[8], res[8];
  for (int j = 0; j < 8; ++j) {
    for (int i = 0; i < 8; ++i) col[i] = e[8 * i + j];
    idct8_1d(col, res);
    for (int i = 0; i < 8; ++i) out[8 * i + j] = (res[i] + 32) >> 6;
  }
}

// inverse 4x4 Hadamard for Intra_16x16 luma DC (8.5.10; h264_ref.py:925-949)
static void hadamard4x4(const int* c, int* out) {
  int e[16];
  for (int i = 0; i < 4; ++i) {
    int c0 = c[4 * i], c1 = c[4 * i + 1], c2 = c[4 * i + 2], c3 = c[4 * i + 3];
    int a0 = c0 + c2, a1 = c0 - c2, a2 = c1 - c3, a3 = c1 + c3;
    e[4 * i] = a0 + a3;
    e[4 * i + 1] = a1 + a2;
    e[4 * i + 2] = a1 - a2;
    e[4 * i + 3] = a0 - a3;
  }
  for (int j = 0; j < 4; ++j) {
    int c0 = e[j], c1 = e[4 + j], c2 = e[8 + j], c3 = e[12 + j];
    int a0 = c0 + c2, a1 = c0 - c2, a2 = c1 - c3, a3 = c1 + c3;
    out[j] = a0 + a3;
    out[4 + j] = a1 + a2;
    out[8 + j] = a1 - a2;
    out[12 + j] = a0 - a3;
  }
}

// h264_ref.py:952-959 (rounding +32, arithmetic shifts)
static void luma_dc_dequant(const int* f, int qp, int w0, int* out16) {
  int64_t ls = ((int64_t)w0 * NORM4[qp % 6][0]) << (qp / 6);
  for (int i = 0; i < 16; ++i) out16[i] = (int)((f[i] * ls + 32) >> 6);
}

// h264_ref.py:962-969 (plain floor shift, no rounding)
static void chroma_dc_dequant(const int* f, int qp, int w0, int* out4) {
  int64_t ls = (int64_t)w0 * NORM4[qp % 6][0];
  int sh = qp / 6;
  for (int i = 0; i < 4; ++i)
    out4[i] = (int)((f[i] * ls * ((int64_t)1 << sh)) >> 5);
}

static inline int chroma_qp_map(int qp_luma, int offset) {
  return kChromaQp[clamp_i(qp_luma + offset, 0, 51)];
}

// z-scan geometry (h264_ref.py:982-984): kZtoX/kZtoY from the .inc
static inline int xy_to_z(int x4, int y4) {
  return (x4 & 1) | ((y4 & 1) << 1) | ((x4 & 2) << 1) | ((y4 & 2) << 2);
}

// ---------------------------------------------------------------------------
// Intra prediction (8.3; h264_ref.py:781-1175)
// ---------------------------------------------------------------------------

// 4x4 intra (8.3.1.2).  P(x,y): neighbour sample for x -1..7, y -1..3.
struct Nbr4 {
  int l[4], t[4], tr[4], tl;
  int P(int x, int y) const {
    if (y == -1) {
      if (x == -1) return tl;
      return x < 4 ? t[x] : tr[x - 4];
    }
    return l[y];
  }
};

static void pred4x4(int mode, const Nbr4& n, bool avail_l, bool avail_t,
                    bool avail_tl, int pred[4][4]) {
  switch (mode) {
    case 0:  // Vertical
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) pred[y][x] = n.P(x, -1);
      break;
    case 1:  // Horizontal
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) pred[y][x] = n.P(-1, y);
      break;
    case 2: {  // DC
      int v;
      if (avail_l && avail_t) {
        int s = 0;
        for (int x = 0; x < 4; ++x) s += n.P(x, -1);
        for (int y = 0; y < 4; ++y) s += n.P(-1, y);
        v = (s + 4) >> 3;
      } else if (avail_l) {
        int s = 0;
        for (int y = 0; y < 4; ++y) s += n.P(-1, y);
        v = (s + 2) >> 2;
      } else if (avail_t) {
        int s = 0;
        for (int x = 0; x < 4; ++x) s += n.P(x, -1);
        v = (s + 2) >> 2;
      } else {
        v = 128;
      }
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) pred[y][x] = v;
      break;
    }
    case 3:  // Diagonal down-left
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) {
          if (x == 3 && y == 3)
            pred[y][x] = (n.P(6, -1) + 3 * n.P(7, -1) + 2) >> 2;
          else
            pred[y][x] = (n.P(x + y, -1) + 2 * n.P(x + y + 1, -1) +
                          n.P(x + y + 2, -1) + 2) >> 2;
        }
      break;
    case 4:  // Diagonal down-right
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) {
          if (x > y)
            pred[y][x] = (n.P(x - y - 2, -1) + 2 * n.P(x - y - 1, -1) +
                          n.P(x - y, -1) + 2) >> 2;
          else if (x < y)
            pred[y][x] = (n.P(-1, y - x - 2) + 2 * n.P(-1, y - x - 1) +
                          n.P(-1, y - x) + 2) >> 2;
          else
            pred[y][x] = (n.P(0, -1) + 2 * n.P(-1, -1) + n.P(-1, 0) + 2) >> 2;
        }
      break;
    case 5:  // Vertical right
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) {
          int z = 2 * x - y;
          if (z >= 0 && z % 2 == 0)
            pred[y][x] =
                (n.P(x - (y >> 1) - 1, -1) + n.P(x - (y >> 1), -1) + 1) >> 1;
          else if (z >= 0)
            pred[y][x] = (n.P(x - (y >> 1) - 2, -1) +
                          2 * n.P(x - (y >> 1) - 1, -1) +
                          n.P(x - (y >> 1), -1) + 2) >> 2;
          else if (z == -1)
            pred[y][x] = (n.P(-1, 0) + 2 * n.P(-1, -1) + n.P(0, -1) + 2) >> 2;
          else
            pred[y][x] = (n.P(-1, y - 2 * x - 1) + 2 * n.P(-1, y - 2 * x - 2) +
                          n.P(-1, y - 2 * x - 3) + 2) >> 2;
        }
      break;
    case 6:  // Horizontal down
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) {
          int z = 2 * y - x;
          if (z >= 0 && z % 2 == 0)
            pred[y][x] =
                (n.P(-1, y - (x >> 1) - 1) + n.P(-1, y - (x >> 1)) + 1) >> 1;
          else if (z >= 0)
            pred[y][x] = (n.P(-1, y - (x >> 1) - 2) +
                          2 * n.P(-1, y - (x >> 1) - 1) +
                          n.P(-1, y - (x >> 1)) + 2) >> 2;
          else if (z == -1)
            pred[y][x] = (n.P(-1, 0) + 2 * n.P(-1, -1) + n.P(0, -1) + 2) >> 2;
          else
            pred[y][x] = (n.P(x - 2 * y - 1, -1) + 2 * n.P(x - 2 * y - 2, -1) +
                          n.P(x - 2 * y - 3, -1) + 2) >> 2;
        }
      break;
    case 7:  // Vertical left
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) {
          if (y % 2 == 0)
            pred[y][x] =
                (n.P(x + (y >> 1), -1) + n.P(x + (y >> 1) + 1, -1) + 1) >> 1;
          else
            pred[y][x] = (n.P(x + (y >> 1), -1) +
                          2 * n.P(x + (y >> 1) + 1, -1) +
                          n.P(x + (y >> 1) + 2, -1) + 2) >> 2;
        }
      break;
    case 8:  // Horizontal up
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) {
          int z = x + 2 * y;
          if (z % 2 == 0 && z < 6)
            pred[y][x] =
                (n.P(-1, y + (x >> 1)) + n.P(-1, y + (x >> 1) + 1) + 1) >> 1;
          else if (z < 5)
            pred[y][x] = (n.P(-1, y + (x >> 1)) +
                          2 * n.P(-1, y + (x >> 1) + 1) +
                          n.P(-1, y + (x >> 1) + 2) + 2) >> 2;
          else if (z == 5)
            pred[y][x] = (n.P(-1, 2) + 3 * n.P(-1, 3) + 2) >> 2;
          else
            pred[y][x] = n.P(-1, 3);
        }
      break;
    default:
      throw DecodeError("bad intra4x4 mode");
  }
}

// Intra 8x8 on FILTERED reference samples (8.3.2.2; h264_ref.py:781-922).
// top: 16 filtered samples (with top-right extension), left: 8.
static void pred8x8(int mode, const int* l, const int* t, int tl, bool avail_l,
                    bool avail_t, bool avail_tl, int pred[8][8]) {
  auto tx = [&](int i) { return i < 0 ? tl : t[i]; };
  auto lx = [&](int i) { return i < 0 ? tl : l[i]; };
  switch (mode) {
    case 0:
      for (int y = 0; y < 8; ++y)
        for (int x = 0; x < 8; ++x) pred[y][x] = t[x];
      break;
    case 1:
      for (int y = 0; y < 8; ++y)
        for (int x = 0; x < 8; ++x) pred[y][x] = l[y];
      break;
    case 2: {
      int v;
      if (avail_l && avail_t) {
        int s = 0;
        for (int x = 0; x < 8; ++x) s += t[x];
        for (int y = 0; y < 8; ++y) s += l[y];
        v = (s + 8) >> 4;
      } else if (avail_l) {
        int s = 0;
        for (int y = 0; y < 8; ++y) s += l[y];
        v = (s + 4) >> 3;
      } else if (avail_t) {
        int s = 0;
        for (int x = 0; x < 8; ++x) s += t[x];
        v = (s + 4) >> 3;
      } else {
        v = 128;
      }
      for (int y = 0; y < 8; ++y)
        for (int x = 0; x < 8; ++x) pred[y][x] = v;
      break;
    }
    case 3:
      for (int y = 0; y < 8; ++y)
        for (int x = 0; x < 8; ++x) {
          if (x == 7 && y == 7)
            pred[y][x] = (t[14] + 3 * t[15] + 2) >> 2;
          else
            pred[y][x] = (t[x + y] + 2 * t[x + y + 1] + t[x + y + 2] + 2) >> 2;
        }
      break;
    case 4:
      for (int y = 0; y < 8; ++y)
        for (int x = 0; x < 8; ++x) {
          if (x > y)
            pred[y][x] =
                (tx(x - y - 2) + 2 * tx(x - y - 1) + t[x - y] + 2) >> 2;
          else if (x < y)
            pred[y][x] =
                (lx(y - x - 2) + 2 * lx(y - x - 1) + l[y - x] + 2) >> 2;
          else
            pred[y][x] = (t[0] + 2 * tl + l[0] + 2) >> 2;
        }
      break;
    case 5:
      for (int y = 0; y < 8; ++y)
        for (int x = 0; x < 8; ++x) {
          int z = 2 * x - y;
          if (z >= 0 && z % 2 == 0)
            pred[y][x] = (tx(x - (y >> 1) - 1) + t[x - (y >> 1)] + 1) >> 1;
          else if (z >= 0)
            pred[y][x] = (tx(x - (y >> 1) - 2) + 2 * tx(x - (y >> 1) - 1) +
                          t[x - (y >> 1)] + 2) >> 2;
          else if (z == -1)
            pred[y][x] = (l[0] + 2 * tl + t[0] + 2) >> 2;
          else
            pred[y][x] = (lx(y - 2 * x - 1) + 2 * lx(y - 2 * x - 2) +
                          lx(y - 2 * x - 3) + 2) >> 2;
        }
      break;
    case 6:
      for (int y = 0; y < 8; ++y)
        for (int x = 0; x < 8; ++x) {
          int z = 2 * y - x;
          if (z >= 0 && z % 2 == 0)
            pred[y][x] = (lx(y - (x >> 1) - 1) + l[y - (x >> 1)] + 1) >> 1;
          else if (z >= 0)
            pred[y][x] = (lx(y - (x >> 1) - 2) + 2 * lx(y - (x >> 1) - 1) +
                          l[y - (x >> 1)] + 2) >> 2;
          else if (z == -1)
            pred[y][x] = (l[0] + 2 * tl + t[0] + 2) >> 2;
          else
            pred[y][x] = (tx(x - 2 * y - 1) + 2 * tx(x - 2 * y - 2) +
                          tx(x - 2 * y - 3) + 2) >> 2;
        }
      break;
    case 7:
      for (int y = 0; y < 8; ++y)
        for (int x = 0; x < 8; ++x) {
          if (y % 2 == 0)
            pred[y][x] = (t[x + (y >> 1)] + t[x + (y >> 1) + 1] + 1) >> 1;
          else
            pred[y][x] = (t[x + (y >> 1)] + 2 * t[x + (y >> 1) + 1] +
                          t[x + (y >> 1) + 2] + 2) >> 2;
        }
      break;
    case 8:
      for (int y = 0; y < 8; ++y)
        for (int x = 0; x < 8; ++x) {
          int z = x + 2 * y;
          if (z % 2 == 0 && z < 14)
            pred[y][x] = (l[y + (x >> 1)] + l[y + (x >> 1) + 1] + 1) >> 1;
          else if (z < 13)
            pred[y][x] = (l[y + (x >> 1)] + 2 * l[y + (x >> 1) + 1] +
                          l[y + (x >> 1) + 2] + 2) >> 2;
          else if (z == 13)
            pred[y][x] = (l[6] + 3 * l[7] + 2) >> 2;
          else
            pred[y][x] = l[7];
        }
      break;
    default:
      throw DecodeError("bad intra8x8 mode");
  }
}

// Reference sample filtering for intra 8x8 (8.3.2.2.1; h264_ref.py:889-922).
// left: 8 raw (valid iff avail_l); top: 16 raw with top-right substitution
// already applied (valid iff avail_t); topleft raw (valid iff avail_tl).
static void filter_i8_refs(const int* left, const int* top, int topleft,
                           bool avail_l, bool avail_t, bool avail_tl,
                           int* fl, int* ft, int* ftl) {
  *ftl = 0;
  if (avail_t) {
    if (avail_tl)
      ft[0] = (topleft + 2 * top[0] + top[1] + 2) >> 2;
    else
      ft[0] = (3 * top[0] + top[1] + 2) >> 2;
    for (int x = 1; x < 15; ++x)
      ft[x] = (top[x - 1] + 2 * top[x] + top[x + 1] + 2) >> 2;
    ft[15] = (top[14] + 3 * top[15] + 2) >> 2;
  }
  if (avail_tl) {
    if (avail_l && avail_t)
      *ftl = (top[0] + 2 * topleft + left[0] + 2) >> 2;
    else if (avail_t)
      *ftl = (3 * topleft + top[0] + 2) >> 2;
    else if (avail_l)
      *ftl = (3 * topleft + left[0] + 2) >> 2;
    else
      *ftl = topleft;
  }
  if (avail_l) {
    if (avail_tl)
      fl[0] = (topleft + 2 * left[0] + left[1] + 2) >> 2;
    else
      fl[0] = (3 * left[0] + left[1] + 2) >> 2;
    for (int y = 1; y < 7; ++y)
      fl[y] = (left[y - 1] + 2 * left[y] + left[y + 1] + 2) >> 2;
    fl[7] = (left[6] + 3 * left[7] + 2) >> 2;
  }
}

// 16x16 luma intra (8.3.3; h264_ref.py:1097-1125). pred: 16x16 int.
static void pred16x16(int mode, const int* left, const int* top, int tl,
                      bool avail_l, bool avail_t, int* pred /*256*/) {
  if (mode == 0) {
    for (int y = 0; y < 16; ++y)
      for (int x = 0; x < 16; ++x) pred[16 * y + x] = top[x];
  } else if (mode == 1) {
    for (int y = 0; y < 16; ++y)
      for (int x = 0; x < 16; ++x) pred[16 * y + x] = left[y];
  } else if (mode == 2) {
    int v;
    if (avail_l && avail_t) {
      int s = 0;
      for (int i = 0; i < 16; ++i) s += top[i] + left[i];
      v = (s + 16) >> 5;
    } else if (avail_l) {
      int s = 0;
      for (int i = 0; i < 16; ++i) s += left[i];
      v = (s + 8) >> 4;
    } else if (avail_t) {
      int s = 0;
      for (int i = 0; i < 16; ++i) s += top[i];
      v = (s + 8) >> 4;
    } else {
      v = 128;
    }
    for (int i = 0; i < 256; ++i) pred[i] = v;
  } else {  // Plane
    int H = 0, V = 0;
    for (int i = 0; i < 8; ++i) {
      H += (i + 1) * (top[8 + i] - (i == 7 ? tl : top[6 - i]));
      V += (i + 1) * (left[8 + i] - (i == 7 ? tl : left[6 - i]));
    }
    int a = 16 * (left[15] + top[15]);
    int b = (5 * H + 32) >> 6;
    int c = (5 * V + 32) >> 6;
    for (int y = 0; y < 16; ++y)
      for (int x = 0; x < 16; ++x)
        pred[16 * y + x] =
            clamp_i((a + b * (x - 7) + c * (y - 7) + 16) >> 5, 0, 255);
  }
}

// 8x8 chroma intra (8.3.4; h264_ref.py:1128-1175)
static void pred_chroma8x8(int mode, const int* left, const int* top, int tl,
                           bool avail_l, bool avail_t, int* pred /*64*/) {
  if (mode == 0) {  // DC per 4x4 sub-block
    for (int by = 0; by < 8; by += 4)
      for (int bx = 0; bx < 8; bx += 4) {
        int v;
        bool has_t = avail_t, has_l = avail_l;
        int st = 0, sl = 0;
        if (has_t)
          for (int i = 0; i < 4; ++i) st += top[bx + i];
        if (has_l)
          for (int i = 0; i < 4; ++i) sl += left[by + i];
        if (bx == by) {
          if (has_t && has_l)
            v = (st + sl + 4) >> 3;
          else if (has_l)
            v = (sl + 2) >> 2;
          else if (has_t)
            v = (st + 2) >> 2;
          else
            v = 128;
        } else if (bx > by) {  // prefer top
          if (has_t)
            v = (st + 2) >> 2;
          else if (has_l)
            v = (sl + 2) >> 2;
          else
            v = 128;
        } else {  // prefer left
          if (has_l)
            v = (sl + 2) >> 2;
          else if (has_t)
            v = (st + 2) >> 2;
          else
            v = 128;
        }
        for (int y = 0; y < 4; ++y)
          for (int x = 0; x < 4; ++x) pred[8 * (by + y) + bx + x] = v;
      }
  } else if (mode == 1) {
    for (int y = 0; y < 8; ++y)
      for (int x = 0; x < 8; ++x) pred[8 * y + x] = left[y];
  } else if (mode == 2) {
    for (int y = 0; y < 8; ++y)
      for (int x = 0; x < 8; ++x) pred[8 * y + x] = top[x];
  } else {  // Plane
    int H = 0, V = 0;
    for (int i = 0; i < 4; ++i) {
      H += (i + 1) * (top[4 + i] - (i == 3 ? tl : top[2 - i]));
      V += (i + 1) * (left[4 + i] - (i == 3 ? tl : left[2 - i]));
    }
    int a = 16 * (left[7] + top[7]);
    int b = (34 * H + 32) >> 6;
    int c = (34 * V + 32) >> 6;
    for (int y = 0; y < 8; ++y)
      for (int x = 0; x < 8; ++x)
        pred[8 * y + x] =
            clamp_i((a + b * (x - 3) + c * (y - 3) + 16) >> 5, 0, 255);
  }
}

// ---------------------------------------------------------------------------
// Inter prediction: quarter-pel luma / eighth-pel chroma (8.4.2.2;
// h264_ref.py:1182-1279).  out: tight h*w int32.
// ---------------------------------------------------------------------------

static inline int six(int a, int b, int c, int d, int e, int f) {
  return a - 5 * b + 20 * c + 20 * d - 5 * e + f;
}

// stride-aware (field views pass stride = 2*W with the field's H)
static void mc_luma_s(const uint8_t* refY, int W, int H, long stride, int x0,
                      int y0, int w, int h, int mvx, int mvy, int* out);

static void mc_luma(const uint8_t* refY, int W, int H, int x0, int y0, int w,
                    int h, int mvx, int mvy, int* out) {
  mc_luma_s(refY, W, H, W, x0, y0, w, h, mvx, mvy, out);
}

// SIMD kernels (AVX2): the MC inner loops dominate decode time.  Pixel
// data is staged into small fixed-stride uint8 scratch blocks first, so
// one code path serves interior and frame-edge partitions and vector
// loads can never leave the scratch buffer.  Lanes >= w compute garbage
// from unstaged scratch bytes but are never stored (16-bit intrinsics
// wrap, no UB).  Scalar twins keep non-AVX2 builds bit-exact.
#if H264_SIMD
// six-tap a-5b+20c+20d-5e+f over 16 horizontal u8 lanes (p[0..20] read);
// range [-2550, 10710] fits int16
static inline __m256i six_h16(const uint8_t* p) {
  __m256i A = _mm256_cvtepu8_epi16(_mm_loadu_si128((const __m128i*)p));
  __m256i B = _mm256_cvtepu8_epi16(_mm_loadu_si128((const __m128i*)(p + 1)));
  __m256i C = _mm256_cvtepu8_epi16(_mm_loadu_si128((const __m128i*)(p + 2)));
  __m256i D = _mm256_cvtepu8_epi16(_mm_loadu_si128((const __m128i*)(p + 3)));
  __m256i E = _mm256_cvtepu8_epi16(_mm_loadu_si128((const __m128i*)(p + 4)));
  __m256i F = _mm256_cvtepu8_epi16(_mm_loadu_si128((const __m128i*)(p + 5)));
  __m256i af = _mm256_add_epi16(A, F);
  __m256i be = _mm256_mullo_epi16(_mm256_add_epi16(B, E),
                                  _mm256_set1_epi16(5));
  __m256i cd = _mm256_mullo_epi16(_mm256_add_epi16(C, D),
                                  _mm256_set1_epi16(20));
  return _mm256_add_epi16(_mm256_sub_epi16(af, be), cd);
}
// same six-tap vertically: rows p, p+st, .., p+5*st at one column run
static inline __m256i six_v16(const uint8_t* p, long st) {
  __m256i A = _mm256_cvtepu8_epi16(_mm_loadu_si128((const __m128i*)p));
  __m256i B =
      _mm256_cvtepu8_epi16(_mm_loadu_si128((const __m128i*)(p + st)));
  __m256i C =
      _mm256_cvtepu8_epi16(_mm_loadu_si128((const __m128i*)(p + 2 * st)));
  __m256i D =
      _mm256_cvtepu8_epi16(_mm_loadu_si128((const __m128i*)(p + 3 * st)));
  __m256i E =
      _mm256_cvtepu8_epi16(_mm_loadu_si128((const __m128i*)(p + 4 * st)));
  __m256i F =
      _mm256_cvtepu8_epi16(_mm_loadu_si128((const __m128i*)(p + 5 * st)));
  __m256i af = _mm256_add_epi16(A, F);
  __m256i be = _mm256_mullo_epi16(_mm256_add_epi16(B, E),
                                  _mm256_set1_epi16(5));
  __m256i cd = _mm256_mullo_epi16(_mm256_add_epi16(C, D),
                                  _mm256_set1_epi16(20));
  return _mm256_add_epi16(_mm256_sub_epi16(af, be), cd);
}
// clip1((v + 16) >> 5) on 16 int16 lanes
static inline __m256i clip_half16(__m256i v) {
  __m256i t = _mm256_srai_epi16(_mm256_add_epi16(v, _mm256_set1_epi16(16)), 5);
  t = _mm256_max_epi16(t, _mm256_setzero_si256());
  return _mm256_min_epi16(t, _mm256_set1_epi16(255));
}
static inline __m256i cvt16(const uint8_t* p) {
  return _mm256_cvtepu8_epi16(_mm_loadu_si128((const __m128i*)p));
}
// pred+res, clip to 0..255, store one 4-px row (saturating packs == clip1)
static inline void add_clip_row4(uint8_t* dst, const int* pred,
                                 const int* res) {
  __m128i s = _mm_add_epi32(_mm_loadu_si128((const __m128i*)pred),
                            _mm_loadu_si128((const __m128i*)res));
  s = _mm_packus_epi16(_mm_packs_epi32(s, s), s);
  int v = _mm_cvtsi128_si32(s);
  std::memcpy(dst, &v, 4);
}
static inline void add_clip_row8(uint8_t* dst, const int* pred,
                                 const int* res) {
  __m128i a = _mm_add_epi32(_mm_loadu_si128((const __m128i*)pred),
                            _mm_loadu_si128((const __m128i*)res));
  __m128i b = _mm_add_epi32(_mm_loadu_si128((const __m128i*)(pred + 4)),
                            _mm_loadu_si128((const __m128i*)(res + 4)));
  __m128i s = _mm_packs_epi32(a, b);
  _mm_storel_epi64((__m128i*)dst, _mm_packus_epi16(s, s));
}
// store an in-range int32 row as bytes (saturating, matches (uint8_t) cast
// on already-clipped prediction samples)
static inline void pack_row4(uint8_t* dst, const int* pred) {
  __m128i s = _mm_loadu_si128((const __m128i*)pred);
  s = _mm_packus_epi16(_mm_packs_epi32(s, s), s);
  int v = _mm_cvtsi128_si32(s);
  std::memcpy(dst, &v, 4);
}
static inline void pack_row8(uint8_t* dst, const int* pred) {
  __m128i s = _mm_packs_epi32(_mm_loadu_si128((const __m128i*)pred),
                              _mm_loadu_si128((const __m128i*)(pred + 4)));
  _mm_storel_epi64((__m128i*)dst, _mm_packus_epi16(s, s));
}
#endif

#if H264_SIMD
// widen the low w 16-bit lanes (values 0..255) to int32 and store
static inline void store_i32_from_u16(int* dst, __m256i v, int w) {
  __m128i lo = _mm256_castsi256_si128(v);
  if (w >= 8) {
    _mm256_storeu_si256((__m256i*)dst, _mm256_cvtepu16_epi32(lo));
    if (w == 16)
      _mm256_storeu_si256(
          (__m256i*)(dst + 8),
          _mm256_cvtepu16_epi32(_mm256_extracti128_si256(v, 1)));
  } else if (w == 4) {
    _mm_storeu_si128((__m128i*)dst, _mm_cvtepu16_epi32(lo));
  } else {  // w == 2 (chroma)
    _mm_storel_epi64((__m128i*)dst, _mm_cvtepu16_epi32(lo));
  }
}
#endif

static void mc_luma_s(const uint8_t* refY, int W, int H, long stride, int x0,
                      int y0, int w, int h, int mvx, int mvy, int* out) {
  int fx = mvx & 3, fy = mvy & 3;
  int ix = x0 + (mvx >> 2), iy = y0 + (mvy >> 2);
  bool interior = ix >= 2 && iy >= 2 && ix + w + 3 <= W && iy + h + 3 <= H;
  if (fx == 0 && fy == 0 && interior) {
    for (int y = 0; y < h; ++y) {
      const uint8_t* row = refY + (size_t)(iy + y) * stride + ix;
      int* dst = out + (size_t)y * w;
#if H264_SIMD
      store_i32_from_u16(dst, cvt16(row), w);
#else
      for (int x = 0; x < w; ++x) dst[x] = row[x];
#endif
    }
    return;
  }
  int eh = h + 5, ew = w + 5;
  // each case reads only a sub-range of the padded block:
  // fy==0 -> rows 2..h+1 only; fx==0 -> cols 2..w+1 only
  int r0 = 0, r1 = eh, c0 = 0, c1 = ew;
  if (fy == 0) {
    r0 = 2;
    r1 = 2 + h;
  }
  if (fx == 0) {
    c0 = 2;
    c1 = 2 + w;
  }
  // fixed 32-byte row stride so 16-byte vector loads at any used column
  // offset stay inside the scratch block
  enum { XS = 32 };
  uint8_t ext[21 * XS];
  if (interior) {
    for (int r = r0; r < r1; ++r)
      std::memcpy(ext + r * XS + c0,
                  refY + (size_t)(iy - 2 + r) * stride + (ix - 2) + c0,
                  (size_t)(c1 - c0));
  } else {
    for (int r = r0; r < r1; ++r) {
      int sy = clamp_i(iy - 2 + r, 0, H - 1);
      const uint8_t* row = refY + (size_t)sy * stride;
      for (int c = c0; c < c1; ++c)
        ext[r * XS + c] = row[clamp_i(ix - 2 + c, 0, W - 1)];
    }
  }
  auto E = [&](int r, int c) { return (int)ext[r * XS + c]; };
  if (fx == 0 && fy == 0) {
    for (int y = 0; y < h; ++y) {
#if H264_SIMD
      store_i32_from_u16(out + y * w, cvt16(ext + (y + 2) * XS + 2), w);
#else
      for (int x = 0; x < w; ++x) out[y * w + x] = E(y + 2, x + 2);
#endif
    }
    return;
  }
  if (fy == 0) {
    for (int y = 0; y < h; ++y) {
      const uint8_t* p = ext + (y + 2) * XS;
#if H264_SIMD
      __m256i b = clip_half16(six_h16(p));
      __m256i v = fx == 1   ? _mm256_avg_epu16(b, cvt16(p + 2))
                  : fx == 2 ? b
                            : _mm256_avg_epu16(b, cvt16(p + 3));
      store_i32_from_u16(out + y * w, v, w);
#else
      for (int x = 0; x < w; ++x) {
        int b1 = six(p[x], p[x + 1], p[x + 2], p[x + 3], p[x + 4], p[x + 5]);
        int b = clip1((b1 + 16) >> 5);
        int v;
        if (fx == 1)
          v = (p[x + 2] + b + 1) >> 1;
        else if (fx == 2)
          v = b;
        else
          v = (p[x + 3] + b + 1) >> 1;
        out[y * w + x] = v;
      }
#endif
    }
    return;
  }
  if (fx == 0) {
    for (int y = 0; y < h; ++y) {
      const uint8_t* p = ext + y * XS + 2;
#if H264_SIMD
      __m256i hh = clip_half16(six_v16(p, XS));
      __m256i v = fy == 1   ? _mm256_avg_epu16(hh, cvt16(p + 2 * XS))
                  : fy == 2 ? hh
                            : _mm256_avg_epu16(hh, cvt16(p + 3 * XS));
      store_i32_from_u16(out + y * w, v, w);
#else
      for (int x = 0; x < w; ++x) {
        int h1 = six(p[x], p[XS + x], p[2 * XS + x], p[3 * XS + x],
                     p[4 * XS + x], p[5 * XS + x]);
        int hh = clip1((h1 + 16) >> 5);
        int v;
        if (fy == 1)
          v = (p[2 * XS + x] + hh + 1) >> 1;
        else if (fy == 2)
          v = hh;
        else
          v = (p[3 * XS + x] + hh + 1) >> 1;
        out[y * w + x] = v;
      }
#endif
    }
    return;
  }
  // both fractional (h264_ref.py:1236-1266)
#if H264_SIMD
  alignas(32) int16_t b1_all[21 * 16];  // rows 0..h+4 x 16 lanes (six_h)
  for (int r = 0; r < eh; ++r)
    _mm256_store_si256((__m256i*)(b1_all + r * 16), six_h16(ext + r * XS));
  alignas(32) int16_t h1_all[16 * XS];  // rows 0..h-1, cols 0..w+4 (six_v)
  for (int y = 0; y < h; ++y) {
    _mm256_store_si256((__m256i*)(h1_all + y * XS),
                       six_v16(ext + y * XS, XS));
    if (w > 11)
      _mm256_store_si256((__m256i*)(h1_all + y * XS + 16),
                         six_v16(ext + y * XS + 16, XS));
  }
  const __m256i v512 = _mm256_set1_epi32(512);
  const __m256i v255 = _mm256_set1_epi32(255);
  for (int y = 0; y < h; ++y) {
    // j1 = six over b1_all rows y..y+5, widened to int32
    __m256i r16[6];
    for (int k = 0; k < 6; ++k)
      r16[k] = _mm256_load_si256((const __m256i*)(b1_all + (y + k) * 16));
    __m256i jq[2];
    for (int half = 0; half < 2; ++half) {
      __m256i q[6];
      for (int k = 0; k < 6; ++k) {
        __m128i part = half ? _mm256_extracti128_si256(r16[k], 1)
                            : _mm256_castsi256_si128(r16[k]);
        q[k] = _mm256_cvtepi16_epi32(part);
      }
      __m256i af = _mm256_add_epi32(q[0], q[5]);
      __m256i be = _mm256_mullo_epi32(_mm256_add_epi32(q[1], q[4]),
                                      _mm256_set1_epi32(5));
      __m256i cd = _mm256_mullo_epi32(_mm256_add_epi32(q[2], q[3]),
                                      _mm256_set1_epi32(20));
      __m256i j1 = _mm256_add_epi32(_mm256_sub_epi32(af, be), cd);
      __m256i j = _mm256_srai_epi32(_mm256_add_epi32(j1, v512), 10);
      j = _mm256_max_epi32(j, _mm256_setzero_si256());
      jq[half] = _mm256_min_epi32(j, v255);
    }
    // pack both int32 halves back into 16 ordered int16 lanes
    __m256i jv = _mm256_permute4x64_epi64(_mm256_packs_epi32(jq[0], jq[1]),
                                          0xD8);
    __m256i v;
    if (fx == 2 && fy == 2) {
      v = jv;
    } else {
      __m256i b = clip_half16(
          _mm256_load_si256((const __m256i*)(b1_all + (y + 2) * 16)));
      __m256i s = clip_half16(
          _mm256_load_si256((const __m256i*)(b1_all + (y + 3) * 16)));
      __m256i hh = clip_half16(
          _mm256_loadu_si256((const __m256i*)(h1_all + y * XS + 2)));
      __m256i m = clip_half16(
          _mm256_loadu_si256((const __m256i*)(h1_all + y * XS + 3)));
      if (fy == 1)
        v = fx == 1   ? _mm256_avg_epu16(b, hh)
            : fx == 2 ? _mm256_avg_epu16(b, jv)
                      : _mm256_avg_epu16(b, m);
      else if (fy == 2)
        v = fx == 1 ? _mm256_avg_epu16(hh, jv) : _mm256_avg_epu16(jv, m);
      else
        v = fx == 1   ? _mm256_avg_epu16(hh, s)
            : fx == 2 ? _mm256_avg_epu16(jv, s)
                      : _mm256_avg_epu16(m, s);
    }
    store_i32_from_u16(out + y * w, v, w);
  }
#else
  int b1_all[21 * 16];  // rows 0..h+4, cols 0..w-1  (six_h of ext)
  for (int r = 0; r < eh; ++r)
    for (int x = 0; x < w; ++x)
      b1_all[r * w + x] = six(E(r, x), E(r, x + 1), E(r, x + 2), E(r, x + 3),
                              E(r, x + 4), E(r, x + 5));
  int h1_all[16 * 21];  // rows 0..h-1, cols 0..w+4  (six_v of ext)
  for (int y = 0; y < h; ++y)
    for (int c = 0; c < ew; ++c)
      h1_all[y * ew + c] = six(E(y, c), E(y + 1, c), E(y + 2, c), E(y + 3, c),
                               E(y + 4, c), E(y + 5, c));
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      int j1 = six(b1_all[y * w + x], b1_all[(y + 1) * w + x],
                   b1_all[(y + 2) * w + x], b1_all[(y + 3) * w + x],
                   b1_all[(y + 4) * w + x], b1_all[(y + 5) * w + x]);
      int j = clip1((j1 + 512) >> 10);
      int v;
      if (fx == 2 && fy == 2) {
        v = j;
      } else {
        int b = clip1((b1_all[(y + 2) * w + x] + 16) >> 5);
        int s = clip1((b1_all[(y + 3) * w + x] + 16) >> 5);
        int hh = clip1((h1_all[y * ew + x + 2] + 16) >> 5);
        int m = clip1((h1_all[y * ew + x + 3] + 16) >> 5);
        if (fy == 1) {
          if (fx == 1)
            v = (b + hh + 1) >> 1;
          else if (fx == 2)
            v = (b + j + 1) >> 1;
          else
            v = (b + m + 1) >> 1;
        } else if (fy == 2) {
          if (fx == 1)
            v = (hh + j + 1) >> 1;
          else
            v = (j + m + 1) >> 1;
        } else {
          if (fx == 1)
            v = (hh + s + 1) >> 1;
          else if (fx == 2)
            v = (j + s + 1) >> 1;
          else
            v = (m + s + 1) >> 1;
        }
      }
      out[y * w + x] = v;
    }
#endif
}

static void mc_chroma_s(const uint8_t* refC, int W, int H, long stride,
                        int cx0, int cy0, int w, int h, int mvx, int mvy,
                        int* out);

static void mc_chroma(const uint8_t* refC, int W, int H, int cx0, int cy0,
                      int w, int h, int mvx, int mvy, int* out) {
  mc_chroma_s(refC, W, H, W, cx0, cy0, w, h, mvx, mvy, out);
}

static void mc_chroma_s(const uint8_t* refC, int W, int H, long stride,
                        int cx0, int cy0, int w, int h, int mvx, int mvy,
                        int* out) {
  int dx = mvx & 7, dy = mvy & 7;
  int ix = cx0 + (mvx >> 3), iy = cy0 + (mvy >> 3);
  // fixed 16-byte row stride scratch (w+1 <= 9 used columns) so vector
  // loads stay inside the block; lanes >= w are never stored
  enum { CS = 16 };
  uint8_t A[10 * CS];
  if (ix >= 0 && iy >= 0 && ix + w + 1 <= W && iy + h + 1 <= H) {
    for (int r = 0; r <= h; ++r)
      std::memcpy(A + r * CS, refC + (size_t)(iy + r) * stride + ix, w + 1);
  } else {
    for (int r = 0; r <= h; ++r) {
      int sy = clamp_i(iy + r, 0, H - 1);
      const uint8_t* row = refC + (size_t)sy * stride;
      for (int c = 0; c <= w; ++c)
        A[r * CS + c] = row[clamp_i(ix + c, 0, W - 1)];
    }
  }
#if H264_SIMD
  // bilinear in 16-bit lanes: t = (8-dx)*A[x] + dx*A[x+1] (<= 2040),
  // out = ((8-dy)*t0 + dy*t1 + 32) >> 6 (<= 16352, fits int16)
  const __m128i vdx = _mm_set1_epi16((short)dx);
  const __m128i vix = _mm_set1_epi16((short)(8 - dx));
  const __m128i vdy = _mm_set1_epi16((short)dy);
  const __m128i viy = _mm_set1_epi16((short)(8 - dy));
  const __m128i v32 = _mm_set1_epi16(32);
  auto hrow = [&](const uint8_t* p) {
    __m128i b = _mm_loadu_si128((const __m128i*)p);
    __m128i a0 = _mm_cvtepu8_epi16(b);
    __m128i a1 = _mm_cvtepu8_epi16(_mm_srli_si128(b, 1));
    return _mm_add_epi16(_mm_mullo_epi16(a0, vix), _mm_mullo_epi16(a1, vdx));
  };
  __m128i t0 = hrow(A);
  for (int y = 0; y < h; ++y) {
    __m128i t1 = hrow(A + (y + 1) * CS);
    __m128i s = _mm_add_epi16(
        _mm_add_epi16(_mm_mullo_epi16(t0, viy), _mm_mullo_epi16(t1, vdy)),
        v32);
    s = _mm_srli_epi16(s, 6);
    int* dst = out + (size_t)y * w;
    if (w == 8) {
      _mm256_storeu_si256((__m256i*)dst, _mm256_cvtepu16_epi32(s));
    } else if (w == 4) {
      _mm_storeu_si128((__m128i*)dst, _mm_cvtepu16_epi32(s));
    } else {  // w == 2
      _mm_storel_epi64((__m128i*)dst, _mm_cvtepu16_epi32(s));
    }
    t0 = t1;
  }
#else
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x)
      out[y * w + x] = ((8 - dx) * (8 - dy) * A[y * CS + x] +
                        dx * (8 - dy) * A[y * CS + x + 1] +
                        (8 - dx) * dy * A[(y + 1) * CS + x] +
                        dx * dy * A[(y + 1) * CS + x + 1] + 32) >> 6;
#endif
}

// ---------------------------------------------------------------------------
// Decoded picture (h264_ref.py:1294-1352 _Picture)
// ---------------------------------------------------------------------------

enum { MB_I4 = 0, MB_I16 = 1, MB_IPCM = 2, MB_I8 = 3, MB_P = 4, MB_B = 5 };

struct MbaffState;  // per-picture MBAFF side state (defined below)

struct Picture {
  int w = 0, h = 0, mb_w = 0, mb_h = 0, n4w = 0, n4h = 0, cw = 0, ch = 0;
  std::vector<uint8_t> Y, U, V;
  std::vector<int8_t> nnz_y;       // n4h x n4w (AC-only counts where noted)
  std::vector<int8_t> nnz_c;       // 2 x (n4h/2) x (n4w/2)
  std::vector<int8_t> i4_modes;    // init 2
  std::vector<int32_t> mb_slice;   // init -1
  // mb_slice is the only cell crossing threads during slice-parallel
  // decode (writers set their own MBs; readers only compare against
  // their own sid, so any racing value reads as "unavailable").
  // Relaxed atomics make that well-defined and TSAN-clean.
  int32_t slice_of(size_t mi) const {
    return __atomic_load_n(&mb_slice[mi], __ATOMIC_RELAXED);
  }
  void set_slice_of(size_t mi, int32_t v) {
    __atomic_store_n(&mb_slice[mi], v, __ATOMIC_RELAXED);
  }
  std::vector<int8_t> mb_class, mb_qp, mb_cbp, mb_dc_flag, mb_tf8;
  std::vector<int8_t> mb_alpha_off, mb_beta_off, mb_disable;
  std::vector<int16_t> mv;         // [2][n4h][n4w][2]
  std::vector<int32_t> ref_id;     // [2][n4h][n4w], init -1
  std::vector<int8_t> ref_idx;     // [2][n4h][n4w], init -1
  std::vector<int8_t> cbf_y;       // n4h x n4w
  std::vector<int8_t> cbf_c;       // 2 x (n4h/2) x (n4w/2)
  std::vector<int8_t> mb_skip, mb_chroma_mode, mb_bdirect;
  std::vector<int16_t> mvd;        // [2][n4h][n4w][2]
  std::vector<int8_t> cell_direct;
  int poc = 0, frame_num = 0;
  int field_poc[2] = {0, 0};
  std::shared_ptr<MbaffState> mbaff;  // set when MBAFF slices decode
  // PAFF (h264_paff.py): coded FIELD pictures decode as contiguous
  // half-height Pictures (the oracle uses numpy strided views; contiguous
  // fields + a weave at pair completion keep every sample path unchanged
  // in C++ and are cache-friendlier).  A frame container owns its two
  // fields; a field points back at its frame for marking-level state
  // (frame_num wrap, long_term).
  bool is_field_pic = false;
  int parity = 0;
  std::shared_ptr<Picture> paff_fields[2];  // on the FRAME container
  Picture* parent = nullptr;                // field -> owning frame
  bool is_ref = false, is_idr = false;
  int qp_y = 0;
  int pic_id = -1, epoch = 0;
  bool long_term = false;
  int long_term_idx = -1;
  std::vector<std::array<int, 3>> mmco_ops;
  int long_term_ref_flag = 0;
  // deblock needs the owning PPS's chroma offsets (h264_ref.py:1889)
  int coff[2] = {0, 0};
  // reference marking needs the owning SPS (oracle keeps pic.sps,
  // h264_ref.py:1459-1521)
  int log2_max_frame_num = 4, max_num_ref_frames = 0;

  void init(const SPS& sps, const PPS& pps) {
    init_dims(sps.width(), sps.height(), sps, pps);
  }

  // Steal a retired picture's heap storage (capacity only; init_dims'
  // assign() re-fills every element).  Used by the decoder's picture
  // pool so steady-state decode does no large allocations; this keeps
  // the fresh-Picture default-field semantics with recycled buffers.
  void take_storage(Picture& o) {
    Y = std::move(o.Y); U = std::move(o.U); V = std::move(o.V);
    nnz_y = std::move(o.nnz_y); nnz_c = std::move(o.nnz_c);
    i4_modes = std::move(o.i4_modes); mb_slice = std::move(o.mb_slice);
    mb_class = std::move(o.mb_class); mb_qp = std::move(o.mb_qp);
    mb_cbp = std::move(o.mb_cbp); mb_dc_flag = std::move(o.mb_dc_flag);
    mb_tf8 = std::move(o.mb_tf8); mb_alpha_off = std::move(o.mb_alpha_off);
    mb_beta_off = std::move(o.mb_beta_off);
    mb_disable = std::move(o.mb_disable);
    mv = std::move(o.mv); ref_id = std::move(o.ref_id);
    ref_idx = std::move(o.ref_idx); cbf_y = std::move(o.cbf_y);
    cbf_c = std::move(o.cbf_c); mb_skip = std::move(o.mb_skip);
    mb_chroma_mode = std::move(o.mb_chroma_mode);
    mb_bdirect = std::move(o.mb_bdirect); mvd = std::move(o.mvd);
    cell_direct = std::move(o.cell_direct);
  }

  // half-height allocation for a PAFF coded field (h264_paff.py
  // _FieldSpsShim + _make_field_pic)
  void init_dims(int w_, int h_, const SPS& sps, const PPS& pps) {
    w = w_;
    h = h_;
    mb_w = w / 16;
    mb_h = h / 16;
    n4w = mb_w * 4;
    n4h = mb_h * 4;
    cw = w / 2;
    ch = h / 2;
    Y.assign((size_t)w * h, 0);
    U.assign((size_t)cw * ch, 0);
    V.assign((size_t)cw * ch, 0);
    size_t n4 = (size_t)n4w * n4h;
    size_t nmb = (size_t)mb_w * mb_h;
    size_t nc = (size_t)(n4w / 2) * (n4h / 2);
    nnz_y.assign(n4, 0);
    nnz_c.assign(2 * nc, 0);
    i4_modes.assign(n4, 2);
    mb_slice.assign(nmb, -1);
    mb_class.assign(nmb, 0);
    mb_qp.assign(nmb, 0);
    mb_cbp.assign(nmb, 0);
    mb_dc_flag.assign(nmb, 0);
    mb_tf8.assign(nmb, 0);
    mb_alpha_off.assign(nmb, 0);
    mb_beta_off.assign(nmb, 0);
    mb_disable.assign(nmb, 0);
    mv.assign(2 * n4 * 2, 0);
    ref_id.assign(2 * n4, -1);
    ref_idx.assign(2 * n4, -1);
    cbf_y.assign(n4, 0);
    cbf_c.assign(2 * nc, 0);
    mb_skip.assign(nmb, 0);
    mb_chroma_mode.assign(nmb, 0);
    mb_bdirect.assign(nmb, 0);
    mvd.assign(2 * n4 * 2, 0);
    cell_direct.assign(n4, 0);
    coff[0] = pps.chroma_qp_index_offset;
    coff[1] = pps.second_chroma_qp_index_offset;
    log2_max_frame_num = sps.log2_max_frame_num;
    max_num_ref_frames = sps.max_num_ref_frames;
  }
  // index helpers
  size_t mbi(int mbx, int mby) const { return (size_t)mby * mb_w + mbx; }
  size_t c4(int gx, int gy) const { return (size_t)gy * n4w + gx; }
  size_t cc(int comp, int cx, int cy) const {
    return (size_t)comp * (n4w / 2) * (n4h / 2) + (size_t)cy * (n4w / 2) + cx;
  }
  size_t mvix(int l, int gy, int gx) const {
    return ((size_t)l * n4h + gy) * n4w + gx;
  }
  bool is_intra_mb(int mbx, int mby) const {
    return mb_class[mbi(mbx, mby)] <= MB_I8;
  }
};

typedef std::shared_ptr<Picture> PicPtr;

// ---------------------------------------------------------------------------
// Deblocking filter (8.7; h264_ref.py:1738-1950)
// ---------------------------------------------------------------------------

// bS in {0,1} from motion (8.7.2.1; h264_ref.py:1753-1787)
static int bs_mv(const Picture& pic, int gxp, int gyp, int gxq, int gyq) {
  int upr[2], upx[2], upy[2], nup = 0;
  int uqr[2], uqx[2], uqy[2], nuq = 0;
  size_t plane = (size_t)pic.n4h * pic.n4w;
  size_t ip = pic.c4(gxp, gyp), iq = pic.c4(gxq, gyq);
  for (int l = 0; l < 2; ++l) {
    size_t ixp = l * plane + ip, ixq = l * plane + iq;
    int rp = pic.ref_id[ixp];
    if (rp >= 0) {
      upr[nup] = rp;
      upx[nup] = pic.mv[2 * ixp];
      upy[nup] = pic.mv[2 * ixp + 1];
      ++nup;
    }
    int rq = pic.ref_id[ixq];
    if (rq >= 0) {
      uqr[nuq] = rq;
      uqx[nuq] = pic.mv[2 * ixq];
      uqy[nuq] = pic.mv[2 * ixq + 1];
      ++nuq;
    }
  }
  if (nup != nuq) return 1;
  // sorted ref-id multisets must match
  int sp0 = nup > 1 ? std::min(upr[0], upr[1]) : (nup ? upr[0] : -1);
  int sp1 = nup > 1 ? std::max(upr[0], upr[1]) : -1;
  int sq0 = nuq > 1 ? std::min(uqr[0], uqr[1]) : (nuq ? uqr[0] : -1);
  int sq1 = nuq > 1 ? std::max(uqr[0], uqr[1]) : -1;
  if (sp0 != sq0 || sp1 != sq1) return 1;
  // field pictures use the 2-quarter-field vertical threshold
  // (h264_ref.py:1800-1804)
  const int vth = pic.is_field_pic ? 2 : 4;
  auto far_ = [vth](int ax, int ay, int bx, int by) {
    return std::abs(ax - bx) >= 4 || std::abs(ay - by) >= vth;
  };
  if (nup == 1) return far_(upx[0], upy[0], uqx[0], uqy[0]) ? 1 : 0;
  if (nup == 0) return 0;
  if (upr[0] != upr[1]) {
    for (int i = 0; i < 2; ++i) {
      int jm = (uqr[0] == upr[i]) ? 0 : 1;
      if (far_(upx[i], upy[i], uqx[jm], uqy[jm])) return 1;
    }
    return 0;
  }
  bool a = !far_(upx[0], upy[0], uqx[0], uqy[0]) &&
           !far_(upx[1], upy[1], uqx[1], uqy[1]);
  bool b = !far_(upx[0], upy[0], uqx[1], uqy[1]) &&
           !far_(upx[1], upy[1], uqx[0], uqy[0]);
  return (a || b) ? 0 : 1;
}

// coefficient presence for bS (h264_ref.py:1790-1798)
static int nnz_for_bs(const Picture& pic, int gx, int gy) {
  int mbx = gx >> 2, mby = gy >> 2;
  if (pic.mb_tf8[pic.mbi(mbx, mby)]) {
    int x0 = gx & ~1, y0 = gy & ~1;
    return pic.nnz_y[pic.c4(x0, y0)] + pic.nnz_y[pic.c4(x0 + 1, y0)] +
           pic.nnz_y[pic.c4(x0, y0 + 1)] + pic.nnz_y[pic.c4(x0 + 1, y0 + 1)];
  }
  return pic.nnz_y[pic.c4(gx, gy)];
}

// Per-picture precompute of nnz_for_bs over every 4x4 cell, built once
// before deblocking (values identical to per-call nnz_for_bs; the
// whole-picture pass replaces ~64 branchy lookups per MB).
static void build_bs_nnz(const Picture& pic, std::vector<uint8_t>& out) {
  out.assign((size_t)pic.n4h * pic.n4w, 0);
  for (int mby = 0; mby < pic.mb_h; ++mby)
    for (int mbx = 0; mbx < pic.mb_w; ++mbx) {
      bool tf8 = pic.mb_tf8[pic.mbi(mbx, mby)] != 0;
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) {
          int gx = mbx * 4 + x, gy = mby * 4 + y;
          int v;
          if (tf8) {
            int x0 = gx & ~1, y0 = gy & ~1;
            v = pic.nnz_y[pic.c4(x0, y0)] + pic.nnz_y[pic.c4(x0 + 1, y0)] +
                pic.nnz_y[pic.c4(x0, y0 + 1)] +
                pic.nnz_y[pic.c4(x0 + 1, y0 + 1)];
          } else {
            v = pic.nnz_y[pic.c4(gx, gy)];
          }
          out[pic.c4(gx, gy)] = (uint8_t)(v ? 1 : 0);
        }
    }
}

static int bs_for(const Picture& pic, const uint8_t* bs_nnz, int gxp, int gyp,
                  int gxq, int gyq, bool mb_edge, bool vertical) {
  int pmbx = gxp >> 2, pmby = gyp >> 2;
  int qmbx = gxq >> 2, qmby = gyq >> 2;
  if (pic.is_intra_mb(pmbx, pmby) || pic.is_intra_mb(qmbx, qmby))
    // field pictures: bS 4 only on vertical MB edges (8.7.2.1;
    // h264_ref.py:1856-1860)
    return (mb_edge && (vertical || !pic.is_field_pic)) ? 4 : 3;
  if (bs_nnz[pic.c4(gxp, gyp)] || bs_nnz[pic.c4(gxq, gyq)]) return 2;
  // fast path: bit-identical per-list motion on both sides -> bS 0
  // (pairwise-equal predictions always pass 8.7.2.1's checks)
  {
    size_t plane = (size_t)pic.n4h * pic.n4w;
    size_t ip = pic.c4(gxp, gyp), iq = pic.c4(gxq, gyq);
    if (pic.ref_id[ip] == pic.ref_id[iq] &&
        pic.ref_id[plane + ip] == pic.ref_id[plane + iq]) {
      const int16_t* mp = &pic.mv[2 * ip];
      const int16_t* mq = &pic.mv[2 * iq];
      if (mp[0] == mq[0] && mp[1] == mq[1] &&
          pic.mv[2 * (plane + ip)] == pic.mv[2 * (plane + iq)] &&
          pic.mv[2 * (plane + ip) + 1] == pic.mv[2 * (plane + iq) + 1])
        return 0;
    }
  }
  return bs_mv(pic, gxp, gyp, gxq, gyq);
}

// filter one sample line across an edge (h264_ref.py:1811-1862)
// q0 at `p`; samples at p + k*step (p side negative k)
static void deblock_line_p(uint8_t* p, int step, int bs, int alpha, int beta,
                           int tc0, bool luma) {
  auto S = [&](int k) -> uint8_t& { return p[k * step]; };
  int p0 = S(-1), p1 = S(-2), p2 = S(-3);
  int q0 = S(0), q1 = S(1), q2 = S(2);
  if (std::abs(p0 - q0) >= alpha || std::abs(p1 - p0) >= beta ||
      std::abs(q1 - q0) >= beta)
    return;
  int ap = std::abs(p2 - p0);
  int aq = std::abs(q2 - q0);
  if (bs < 4) {
    int tc = luma ? tc0 + (ap < beta ? 1 : 0) + (aq < beta ? 1 : 0) : tc0 + 1;
    int delta = ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3;
    delta = clamp_i(delta, -tc, tc);
    S(-1) = (uint8_t)clip1(p0 + delta);
    S(0) = (uint8_t)clip1(q0 - delta);
    if (luma && ap < beta) {
      int d = (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1;
      d = clamp_i(d, -tc0, tc0);
      S(-2) = (uint8_t)(p1 + d);
    }
    if (luma && aq < beta) {
      int d = (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1;
      d = clamp_i(d, -tc0, tc0);
      S(1) = (uint8_t)(q1 + d);
    }
  } else {
    if (luma) {
      bool strong = std::abs(p0 - q0) < (alpha >> 2) + 2;
      if (strong && ap < beta) {
        int p3 = S(-4);
        S(-1) = (uint8_t)((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3);
        S(-2) = (uint8_t)((p2 + p1 + p0 + q0 + 2) >> 2);
        S(-3) = (uint8_t)((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3);
      } else {
        S(-1) = (uint8_t)((2 * p1 + p0 + q1 + 2) >> 2);
      }
      if (strong && aq < beta) {
        int q3 = S(3);
        S(0) = (uint8_t)((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3);
        S(1) = (uint8_t)((q2 + q1 + q0 + p0 + 2) >> 2);
        S(2) = (uint8_t)((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3);
      } else {
        S(0) = (uint8_t)((2 * q1 + q0 + p1 + 2) >> 2);
      }
    } else {
      S(-1) = (uint8_t)((2 * p1 + p0 + q1 + 2) >> 2);
      S(0) = (uint8_t)((2 * q1 + q0 + p1 + 2) >> 2);
    }
  }
}

static void deblock_mb(Picture& pic, const uint8_t* bs_nnz, int mbx,
                       int mby) {
  // h264_ref.py:1882-1950
  size_t mi = pic.mbi(mbx, mby);
  int aoff = pic.mb_alpha_off[mi];
  int boff = pic.mb_beta_off[mi];
  int disable = pic.mb_disable[mi];
  int tf8 = pic.mb_tf8[mi];
  int sid = pic.mb_slice[mi];
  auto thresholds = [&](int qpp, int qpq, int bs, int chroma_comp, int* alpha,
                        int* beta, int* tc0) {
    int qav;
    if (chroma_comp < 0)
      qav = (qpp + qpq + 1) >> 1;
    else
      qav = (chroma_qp_map(qpp, pic.coff[chroma_comp]) +
             chroma_qp_map(qpq, pic.coff[chroma_comp]) + 1) >> 1;
    int ia = clamp_i(qav + aoff, 0, 51);
    int ib = clamp_i(qav + boff, 0, 51);
    *alpha = kAlpha[ia];
    *beta = kBeta[ib];
    *tc0 = (bs < 4) ? kTc0[52 * (bs - 1) + ia] : 0;
  };
  for (int vertical = 1; vertical >= 0; --vertical) {
    for (int e = 0; e < 4; ++e) {
      if (e == 0) {
        int nmbx = vertical ? mbx - 1 : mbx;
        int nmby = vertical ? mby : mby - 1;
        if (nmbx < 0 || nmby < 0) continue;
        if (pic.mb_slice[pic.mbi(nmbx, nmby)] < 0) continue;
        if (disable == 2 && pic.mb_slice[pic.mbi(nmbx, nmby)] != sid) continue;
      } else if (tf8 && (e & 1)) {
        continue;
      }
      int segs_bs[4], segs_qpp[4], segs_qpq[4];
      for (int seg = 0; seg < 4; ++seg) {
        int gxq, gyq, gxp, gyp;
        if (vertical) {
          gxq = mbx * 4 + e;
          gyq = mby * 4 + seg;
          gxp = gxq - 1;
          gyp = gyq;
        } else {
          gxq = mbx * 4 + seg;
          gyq = mby * 4 + e;
          gxp = gxq;
          gyp = gyq - 1;
        }
        segs_bs[seg] =
            bs_for(pic, bs_nnz, gxp, gyp, gxq, gyq, e == 0, vertical != 0);
        segs_qpp[seg] = pic.mb_qp[pic.mbi(gxp >> 2, gyp >> 2)];
        segs_qpq[seg] = pic.mb_qp[pic.mbi(gxq >> 2, gyq >> 2)];
      }
      for (int seg = 0; seg < 4; ++seg) {
        int bs = segs_bs[seg];
        if (bs == 0) continue;
        int alpha, beta, tc0;
        thresholds(segs_qpp[seg], segs_qpq[seg], bs, -1, &alpha, &beta, &tc0);
        if (alpha == 0 || beta == 0) continue;
        if (vertical) {
          uint8_t* p = pic.Y.data() +
                       (size_t)(mby * 16 + seg * 4) * pic.w + mbx * 16 + e * 4;
          for (int i = 0; i < 4; ++i, p += pic.w)
            deblock_line_p(p, 1, bs, alpha, beta, tc0, true);
        } else {
          uint8_t* p = pic.Y.data() +
                       (size_t)(mby * 16 + e * 4) * pic.w + mbx * 16 + seg * 4;
          for (int i = 0; i < 4; ++i, ++p)
            deblock_line_p(p, pic.w, bs, alpha, beta, tc0, true);
        }
      }
      if (e == 0 || e == 2) {
        for (int comp = 0; comp < 2; ++comp) {
          uint8_t* plane = comp ? pic.V.data() : pic.U.data();
          for (int seg = 0; seg < 4; ++seg) {
            int bs = segs_bs[seg];
            if (bs == 0) continue;
            int alpha, beta, tc0;
            thresholds(segs_qpp[seg], segs_qpq[seg], bs, comp, &alpha, &beta,
                       &tc0);
            if (alpha == 0 || beta == 0) continue;
            if (vertical) {
              uint8_t* p = plane + (size_t)(mby * 8 + seg * 2) * pic.cw +
                           mbx * 8 + e * 2;
              for (int i = 0; i < 2; ++i, p += pic.cw)
                deblock_line_p(p, 1, bs, alpha, beta, tc0, false);
            } else {
              uint8_t* p = plane + (size_t)(mby * 8 + e * 2) * pic.cw +
                           mbx * 8 + seg * 2;
              for (int i = 0; i < 2; ++i, ++p)
                deblock_line_p(p, pic.cw, bs, alpha, beta, tc0, false);
            }
          }
        }
      }
    }
  }
}

static void deblock_picture(Picture& pic) {
  std::vector<uint8_t> bs_nnz;
  build_bs_nnz(pic, bs_nnz);
  for (int mby = 0; mby < pic.mb_h; ++mby)
    for (int mbx = 0; mbx < pic.mb_w; ++mbx) {
      size_t mi = pic.mbi(mbx, mby);
      if (pic.mb_slice[mi] < 0) continue;
      if (pic.mb_disable[mi] == 1) continue;
      deblock_mb(pic, bs_nnz.data(), mbx, mby);
    }
}

}  // namespace h264

namespace h264 {

// ---------------------------------------------------------------------------
// CABAC arithmetic engine (9.3; h264_cabac.py:48-130)
// ---------------------------------------------------------------------------

struct CabacEngine {
  const uint8_t* data;
  size_t size;   // bytes
  size_t pos;    // bits
  int range_, offset;
  uint8_t state[1024], mps[1024];

  void init_ctx(bool slice_i, int cabac_init_idc, int qp) {
    const int16_t* tab =
        slice_i ? kCabacInitI : kCabacInitPB + 2048 * cabac_init_idc;
    int q = clamp_i(qp, 0, 51);
    for (int i = 0; i < 1024; ++i) {
      int m = tab[2 * i], n = tab[2 * i + 1];
      int pre = clamp_i(((m * q) >> 4) + n, 1, 126);
      if (pre <= 63) {
        state[i] = (uint8_t)(63 - pre);
        mps[i] = 0;
      } else {
        state[i] = (uint8_t)(pre - 64);
        mps[i] = 1;
      }
    }
  }
  void start(const uint8_t* d, size_t n, size_t bit_pos) {
    if (bit_pos & 7) bit_pos += 8 - (bit_pos & 7);
    data = d;
    size = n;
    pos = bit_pos;
    range_ = 510;
    int off = 0;
    for (int i = 0; i < 9; ++i) off = (off << 1) | bit();
    offset = off;
  }
  int bit() {
    size_t p = pos++;
    size_t byte = p >> 3;
    if (byte >= size) return 0;
    return (data[byte] >> (7 - (p & 7))) & 1;
  }
  // next k bits MSB-first (k <= 24); bits past the buffer end read as 0,
  // matching bit().  One 8-byte big-endian window load in the fast path.
  uint32_t read_bits(int k) {
    if (k == 0) return 0;
    size_t p = pos;
    pos += k;
    size_t byte = p >> 3;
    if (byte + 8 <= size) {
      uint64_t w;
      std::memcpy(&w, data + byte, 8);
      w = __builtin_bswap64(w);
      return (uint32_t)((w >> (64 - (p & 7) - k)) &
                        (((uint64_t)1 << k) - 1));
    }
    uint32_t v = 0;
    for (int i = 0; i < k; ++i) {
      size_t b = (p + i) >> 3;
      int bv = b >= size ? 0 : (data[b] >> (7 - ((p + i) & 7))) & 1;
      v = (v << 1) | (uint32_t)bv;
    }
    return v;
  }
  int decision(int idx) {
    int pstate = state[idx];
    int rng = range_;
    int lps = kRangeLps[4 * pstate + ((rng >> 6) & 3)];
    rng -= lps;
    int b;
    if (offset >= rng) {
      b = 1 - mps[idx];
      offset -= rng;
      rng = lps;
      if (pstate == 0) mps[idx] = (uint8_t)(1 - mps[idx]);
      state[idx] = kTransIdxLps[pstate];
    } else {
      b = mps[idx];
      state[idx] = kTransIdxMps[pstate];
    }
    if (rng < 256) {
      // one-step renormalization: smallest k with rng<<k >= 256
      int k = 8 - (31 - __builtin_clz((unsigned)rng));
      rng <<= k;
      offset = (offset << k) | (int)read_bits(k);
    }
    range_ = rng;
    return b;
  }
  int bypass() {
    offset = (offset << 1) | (int)read_bits(1);
    if (offset >= range_) {
      offset -= range_;
      return 1;
    }
    return 0;
  }
  int terminate() {
    range_ -= 2;
    if (offset >= range_) return 1;
    int rng = range_;
    while (rng < 256) {
      rng <<= 1;
      offset = (offset << 1) | bit();
    }
    range_ = rng;
    return 0;
  }
};

struct CabacSlice;  // fwd (macroblock-layer parser, defined below)

// ---------------------------------------------------------------------------
// Per-slice decode state + MB decode/reconstruction
// (h264_ref.py:1953-3531 _SliceCtx)
// ---------------------------------------------------------------------------

struct PredBlk {
  int y[256];  // tight (h4*4) x (w4*4)
  int u[64];   // tight (h4*2) x (w4*2)
  int v[64];
};

struct SliceCtx {
  Picture* pic;
  const SliceHeader* h;
  const SPS* sps;
  const PPS* pps;
  int sid;
  int qp;
  int w4[6][16];   // raster-order scaling weights (4x4 lists 0..5)
  int w8[2][64];   // 8x8 lists
  int32_t dq4c[52][6][16];
  uint8_t dq4ok[52][6];
  int32_t dq8c[52][2][64];
  uint8_t dq8ok[52][2];
  std::vector<Picture*> ref_l0, ref_l1;
  int cur_mbx = 0, cur_mby = 0, cur_z = 0;
  int pred_chromaU[64], pred_chromaV[64];
  // per-MB spatial-direct cache (h264_ref.py:3312-3335)
  bool dc_valid = false;
  int dc_refs[2] = {-1, -1};
  int dc_mvps[2][2] = {{0, 0}, {0, 0}};
  bool dc_dzp = false;

  // residual scans: field pictures (PAFF) use the field scans
  // (h264_ref.py:2026-2032); scaling matrices stay in frame zigzag order
  const uint8_t* zz4 = kZigzag4;
  const uint8_t* zz8 = kZigzag8;

  SliceCtx(Picture* pic_, const SliceHeader* h_, const SPS* sps_,
           const PPS* pps_, int slice_id)
      : pic(pic_), h(h_), sps(sps_), pps(pps_), sid(slice_id) {
    qp = h->slice_qp;
    if (pic->is_field_pic) {
      zz4 = kFieldScan4;
      zz8 = kFieldScan8;
    }
    std::memset(dq4ok, 0, sizeof(dq4ok));
    std::memset(dq8ok, 0, sizeof(dq8ok));
    // resolve scaling weights (h264_ref.py:1960-1971)
    if (!pps->has_scaling) {
      for (int i = 0; i < 6; ++i)
        for (int k = 0; k < 16; ++k) w4[i][k] = 16;
      for (int i = 0; i < 2; ++i)
        for (int k = 0; k < 64; ++k) w8[i][k] = 16;
    } else {
      const ScalingMatrix& mats = pps->scaling_matrix;
      for (int i = 0; i < 6; ++i)
        for (int k = 0; k < 16; ++k) w4[i][kZigzag4[k]] = mats[i][k];
      if (mats.size() > 6) {
        for (int i = 0; i < 2; ++i)
          for (int k = 0; k < 64; ++k) w8[i][kZigzag8[k]] = mats[6 + i][k];
      } else {
        for (int i = 0; i < 2; ++i)
          for (int k = 0; k < 64; ++k) w8[i][k] = 16;
      }
    }
  }

  // -- availability helpers (h264_ref.py:1982-2007) -----------------------
  bool mb_avail(int mbx, int mby) const {
    if (mbx < 0 || mby < 0 || mbx >= pic->mb_w || mby >= pic->mb_h)
      return false;
    return pic->slice_of(pic->mbi(mbx, mby)) == sid;
  }
  bool mb_avail_intra(int mbx, int mby) const {
    if (!mb_avail(mbx, mby)) return false;
    if (pps->constrained_intra_pred && !pic->is_intra_mb(mbx, mby))
      return false;
    return true;
  }
  bool blk_avail_intra(int gx, int gy, int cur_z_, int cur_mbx_,
                       int cur_mby_) const {
    if (gx < 0 || gy < 0) return false;
    int mbx = gx >> 2, mby = gy >> 2;
    if (mbx == cur_mbx_ && mby == cur_mby_)
      return xy_to_z(gx & 3, gy & 3) < cur_z_;
    if (!mb_avail_intra(mbx, mby)) return false;
    return mby < cur_mby_ || (mby == cur_mby_ && mbx < cur_mbx_);
  }

  // -- nC (9.2.1; h264_ref.py:2011-2035).  -1000 = unavailable ------------
  int nnz_luma(int gx, int gy) const {
    if (gx < 0 || gy < 0 || gx >= pic->n4w || gy >= pic->n4h) return -1000;
    if (pic->slice_of(pic->mbi(gx >> 2, gy >> 2)) != sid) return -1000;
    return pic->nnz_y[pic->c4(gx, gy)];
  }
  int nnz_chroma(int comp, int cx, int cy) const {
    if (cx < 0 || cy < 0 || cx >= pic->n4w / 2 || cy >= pic->n4h / 2)
      return -1000;
    if (pic->slice_of(pic->mbi(cx >> 1, cy >> 1)) != sid) return -1000;
    return pic->nnz_c[pic->cc(comp, cx, cy)];
  }
  static int combine_nc(int na, int nb) {
    bool ha = na != -1000, hb = nb != -1000;
    if (ha && hb) return (na + nb + 1) >> 1;
    if (ha) return na;
    if (hb) return nb;
    return 0;
  }

  // -- dequant caches (h264_ref.py:2039-2053) -----------------------------
  const int32_t* dq4(int qp_, int list_idx) {
    if (!dq4ok[qp_][list_idx]) {
      dequant4_tab(qp_, w4[list_idx], dq4c[qp_][list_idx]);
      dq4ok[qp_][list_idx] = 1;
    }
    return dq4c[qp_][list_idx];
  }
  const int32_t* dq8(int qp_, int list_idx) {
    if (!dq8ok[qp_][list_idx]) {
      dequant8_tab(qp_, w8[list_idx], dq8c[qp_][list_idx]);
      dq8ok[qp_][list_idx] = 1;
    }
    return dq8c[qp_][list_idx];
  }

  // four interleaved 4x4 CAVLC blocks -> 64 coeffs in 8x8 scan order
  // (h264_ref.py:2055-2074)
  void parse_luma8x8_cavlc(BitReader& r, int b, int* scan64) {
    int gx0 = cur_mbx * 4, gy0 = cur_mby * 4;
    std::memset(scan64, 0, 64 * sizeof(int));
    int blk[16];
    for (int i = 0; i < 4; ++i) {
      int z = 4 * b + i;
      int gx = gx0 + kZtoX[z], gy = gy0 + kZtoY[z];
      int nc = combine_nc(nnz_luma(gx - 1, gy), nnz_luma(gx, gy - 1));
      int tc = cavlc_block(r, nc, 16, blk);
      pic->nnz_y[pic->c4(gx, gy)] = (int8_t)tc;
      for (int k = 0; k < 16; ++k) scan64[4 * k + i] = blk[k];
    }
  }

  // dequant + inverse 8x8 transform (h264_ref.py:2076-2085)
  void residual8x8(const int* scan64, int qp_, int list_idx, int* out64) {
    const int32_t* ls = dq8(qp_, list_idx);
    int d[64];
    std::memset(d, 0, sizeof(d));
    for (int s = 0; s < 64; ++s) {
      int c = scan64[s];
      if (c) {
        int posn = zz8[s];
        d[posn] = dequant8_apply(c, ls[posn], qp_);
      }
    }
    idct8x8(d, out64);
  }

  Picture* refp(int l, int idx) const {
    const std::vector<Picture*>& lst = l == 0 ? ref_l0 : ref_l1;
    if (idx < 0 || (size_t)idx >= lst.size())
      throw DecodeError("reference index out of range");
    return lst[idx];
  }

  void mark_mb(int mbx, int mby) {
    size_t mi = pic->mbi(mbx, mby);
    pic->set_slice_of(mi, sid);
    pic->mb_alpha_off[mi] = (int8_t)(h->slice_alpha_c0_offset_div2 * 2);
    pic->mb_beta_off[mi] = (int8_t)(h->slice_beta_offset_div2 * 2);
    pic->mb_disable[mi] = (int8_t)h->disable_deblocking_filter_idc;
  }

  // -- CAVLC MB decode (h264_ref.py:2096-2114) ----------------------------
  void decode_mb_cavlc(BitReader& r, int mb_idx) {
    int mbx = mb_idx % pic->mb_w, mby = mb_idx / pic->mb_w;
    mark_mb(mbx, mby);
    int mb_type = r.ue();
    if (h->slice_type == SLICE_P) {
      if (mb_type < 5)
        decode_p_mb(r, mbx, mby, mb_type);
      else
        decode_intra_mb(r, mbx, mby, mb_type - 5);
      return;
    }
    if (h->slice_type == SLICE_B) {
      if (mb_type < 23)
        decode_b_mb(r, mbx, mby, mb_type);
      else
        decode_intra_mb(r, mbx, mby, mb_type - 23);
      return;
    }
    decode_intra_mb(r, mbx, mby, mb_type);
  }

  void decode_intra_mb(BitReader& r, int mbx, int mby, int imb) {
    if (imb == 25) {
      decode_ipcm(r, mbx, mby);
      return;
    }
    if (imb == 0)
      decode_i4x4(r, mbx, mby);
    else
      decode_i16x16(r, mbx, mby, imb - 1);
  }

  void set_ipcm_state(int mbx, int mby) {
    size_t mi = pic->mbi(mbx, mby);
    pic->mb_class[mi] = MB_IPCM;
    for (int y = 0; y < 4; ++y)
      for (int x = 0; x < 4; ++x) {
        pic->nnz_y[pic->c4(mbx * 4 + x, mby * 4 + y)] = 16;
        pic->cbf_y[pic->c4(mbx * 4 + x, mby * 4 + y)] = 1;
      }
    for (int comp = 0; comp < 2; ++comp)
      for (int y = 0; y < 2; ++y)
        for (int x = 0; x < 2; ++x) {
          pic->nnz_c[pic->cc(comp, mbx * 2 + x, mby * 2 + y)] = 16;
          pic->cbf_c[pic->cc(comp, mbx * 2 + x, mby * 2 + y)] = 1;
        }
    pic->mb_qp[mi] = 0;
    pic->mb_cbp[mi] = 0x2F;
  }

  void decode_ipcm(BitReader& r, int mbx, int mby) {
    // h264_ref.py:2565-2580 (CAVLC keeps nnz only; cbf set on CABAC path)
    r.byte_align();
    for (int yy = 0; yy < 16; ++yy)
      for (int xx = 0; xx < 16; ++xx)
        pic->Y[(size_t)(mby * 16 + yy) * pic->w + mbx * 16 + xx] =
            (uint8_t)r.read(8);
    for (int comp = 0; comp < 2; ++comp) {
      uint8_t* plane = comp ? pic->V.data() : pic->U.data();
      for (int yy = 0; yy < 8; ++yy)
        for (int xx = 0; xx < 8; ++xx)
          plane[(size_t)(mby * 8 + yy) * pic->cw + mbx * 8 + xx] =
              (uint8_t)r.read(8);
    }
    size_t mi = pic->mbi(mbx, mby);
    pic->mb_class[mi] = MB_IPCM;
    for (int y = 0; y < 4; ++y)
      for (int x = 0; x < 4; ++x)
        pic->nnz_y[pic->c4(mbx * 4 + x, mby * 4 + y)] = 16;
    for (int comp = 0; comp < 2; ++comp)
      for (int y = 0; y < 2; ++y)
        for (int x = 0; x < 2; ++x)
          pic->nnz_c[pic->cc(comp, mbx * 2 + x, mby * 2 + y)] = 16;
    pic->mb_qp[mi] = 0;
    pic->mb_cbp[mi] = 0x2F;
  }

  // mode of neighbour block for intra-mode inference (h264_ref.py:2603-2616)
  // -1000 = unavailable
  int i4_mode_at(int gx, int gy, int cur_z_, int mbx, int mby) const {
    if (gx < 0 || gy < 0) return -1000;
    int nmbx = gx >> 2, nmby = gy >> 2;
    if (nmbx == mbx && nmby == mby) return pic->i4_modes[pic->c4(gx, gy)];
    if (!mb_avail_intra(nmbx, nmby)) return -1000;
    int cls = pic->mb_class[pic->mbi(nmbx, nmby)];
    if (cls == MB_I4 || cls == MB_I8) return pic->i4_modes[pic->c4(gx, gy)];
    return 2;
  }

  void read_i4x4_modes(BitReader& r, int mbx, int mby, int* modes) {
    // h264_ref.py:2582-2601
    int gx0 = mbx * 4, gy0 = mby * 4;
    for (int k = 0; k < 16; ++k) {
      int gx = gx0 + kZtoX[k], gy = gy0 + kZtoY[k];
      int ma = i4_mode_at(gx - 1, gy, k, mbx, mby);
      int mb_ = i4_mode_at(gx, gy - 1, k, mbx, mby);
      int pred = (ma == -1000 || mb_ == -1000) ? 2 : std::min(ma, mb_);
      int mode;
      if (r.read1()) {
        mode = pred;
      } else {
        int rem = (int)r.read(3);
        mode = rem < pred ? rem : rem + 1;
      }
      modes[k] = mode;
      pic->i4_modes[pic->c4(gx, gy)] = (int8_t)mode;
    }
  }

  void decode_i4x4(BitReader& r, int mbx, int mby) {
    // h264_ref.py:2618-2653
    int tf8 = 0;
    if (pps->transform_8x8_mode) tf8 = r.read1();
    if (tf8) {
      decode_i8x8_mb(r, mbx, mby);
      return;
    }
    size_t mi = pic->mbi(mbx, mby);
    pic->mb_class[mi] = MB_I4;
    int modes[16];
    read_i4x4_modes(r, mbx, mby, modes);
    int chroma_mode = r.ue();
    int gi = r.ue();
    if (gi >= 48) throw DecodeError("bad cbp golomb");
    int cbp = kGolombToIntraCbp[gi];
    int cbp_luma = cbp & 15, cbp_chroma = cbp >> 4;
    if (cbp) qp = ((qp + r.se()) % 52 + 52) % 52;
    pic->mb_qp[mi] = (int8_t)qp;
    pic->mb_cbp[mi] = (int8_t)cbp;
    int gx0 = mbx * 4, gy0 = mby * 4;
    int coeffs[16][16];
    bool has[16] = {};
    for (int k = 0; k < 16; ++k) {
      if (cbp_luma & (1 << (k >> 2))) {
        int gx = gx0 + kZtoX[k], gy = gy0 + kZtoY[k];
        int nc = combine_nc(nnz_luma(gx - 1, gy), nnz_luma(gx, gy - 1));
        int tc = cavlc_block(r, nc, 16, coeffs[k]);
        has[k] = true;
        pic->nnz_y[pic->c4(gx, gy)] = (int8_t)tc;
      }
    }
    for (int k = 0; k < 16; ++k)
      recon_i4_block(mbx, mby, k, modes[k], has[k] ? coeffs[k] : nullptr);
    decode_chroma_cavlc(r, mbx, mby, chroma_mode, cbp_chroma, true);
  }

  void read_i8x8_modes(BitReader& r, int mbx, int mby, int* modes) {
    // h264_ref.py:2655-2676
    int gx0 = mbx * 4, gy0 = mby * 4;
    for (int b = 0; b < 4; ++b) {
      int bx = (b & 1) * 2, by = (b >> 1) * 2;
      int gx = gx0 + bx, gy = gy0 + by;
      int z = xy_to_z(bx, by);
      int ma = i4_mode_at(gx - 1, gy, z, mbx, mby);
      int mb_ = i4_mode_at(gx, gy - 1, z, mbx, mby);
      int pred = (ma == -1000 || mb_ == -1000) ? 2 : std::min(ma, mb_);
      int mode;
      if (r.read1()) {
        mode = pred;
      } else {
        int rem = (int)r.read(3);
        mode = rem < pred ? rem : rem + 1;
      }
      modes[b] = mode;
      for (int dy = 0; dy < 2; ++dy)
        for (int dx = 0; dx < 2; ++dx)
          pic->i4_modes[pic->c4(gx + dx, gy + dy)] = (int8_t)mode;
    }
  }

  void decode_i8x8_mb(BitReader& r, int mbx, int mby) {
    // h264_ref.py:2678-2698
    cur_mbx = mbx;
    cur_mby = mby;
    size_t mi = pic->mbi(mbx, mby);
    pic->mb_class[mi] = MB_I8;
    pic->mb_tf8[mi] = 1;
    int modes[4];
    read_i8x8_modes(r, mbx, mby, modes);
    int chroma_mode = r.ue();
    int gi = r.ue();
    if (gi >= 48) throw DecodeError("bad cbp golomb");
    int cbp = kGolombToIntraCbp[gi];
    int cbp_luma = cbp & 15, cbp_chroma = cbp >> 4;
    if (cbp) qp = ((qp + r.se()) % 52 + 52) % 52;
    pic->mb_qp[mi] = (int8_t)qp;
    pic->mb_cbp[mi] = (int8_t)cbp;
    int coeffs[4][64];
    bool has[4] = {};
    for (int b = 0; b < 4; ++b)
      if (cbp_luma & (1 << b)) {
        parse_luma8x8_cavlc(r, b, coeffs[b]);
        has[b] = true;
      }
    for (int b = 0; b < 4; ++b)
      recon_i8_block(mbx, mby, b, modes[b], has[b] ? coeffs[b] : nullptr);
    decode_chroma_cavlc(r, mbx, mby, chroma_mode, cbp_chroma, true);
  }

  void recon_i8_block(int mbx, int mby, int b, int mode, const int* scan64) {
    // h264_ref.py:2700-2733
    int bx = (b & 1) * 2, by = (b >> 1) * 2;
    int gx = mbx * 4 + bx, gy = mby * 4 + by;
    int z = xy_to_z(bx, by);
    int px = gx * 4, py = gy * 4;
    uint8_t* Y = pic->Y.data();
    int W = pic->w;
    bool avail_l = blk_avail_intra(gx - 1, gy, z, mbx, mby);
    bool avail_t = blk_avail_intra(gx, gy - 1, z, mbx, mby);
    bool avail_tl = blk_avail_intra(gx - 1, gy - 1, z, mbx, mby);
    bool avail_tr = blk_avail_intra(gx + 2, gy - 1, z, mbx, mby);
    int left[8] = {}, top[16] = {}, tl = 0;
    if (avail_l)
      for (int i = 0; i < 8; ++i) left[i] = Y[(size_t)(py + i) * W + px - 1];
    if (avail_t) {
      for (int i = 0; i < 8; ++i) top[i] = Y[(size_t)(py - 1) * W + px + i];
      if (avail_tr)
        for (int i = 0; i < 8; ++i)
          top[8 + i] = Y[(size_t)(py - 1) * W + px + 8 + i];
      else
        for (int i = 0; i < 8; ++i) top[8 + i] = top[7];
    }
    if (avail_tl) tl = Y[(size_t)(py - 1) * W + px - 1];
    int fl[8] = {}, ft[16] = {}, ftl = 0;
    filter_i8_refs(avail_l ? left : nullptr, avail_t ? top : nullptr, tl,
                   avail_l, avail_t, avail_tl, fl, ft, &ftl);
    int pred[8][8];
    pred8x8(mode, fl, ft, ftl, avail_l, avail_t, avail_tl, pred);
    if (!scan64) {
      for (int yy = 0; yy < 8; ++yy)
        for (int xx = 0; xx < 8; ++xx)
          Y[(size_t)(py + yy) * W + px + xx] = (uint8_t)pred[yy][xx];
      return;
    }
    int res[64];
    residual8x8(scan64, qp, 0, res);
    for (int yy = 0; yy < 8; ++yy)
      for (int xx = 0; xx < 8; ++xx)
        Y[(size_t)(py + yy) * W + px + xx] =
            (uint8_t)clip1(pred[yy][xx] + res[8 * yy + xx]);
  }

  void recon_i4_block(int mbx, int mby, int k, int mode, const int* coeffs) {
    // h264_ref.py:2735-2780
    int x4 = kZtoX[k], y4 = kZtoY[k];
    int gx = mbx * 4 + x4, gy = mby * 4 + y4;
    int px = gx * 4, py = gy * 4;
    uint8_t* Y = pic->Y.data();
    int W = pic->w;
    bool avail_l = blk_avail_intra(gx - 1, gy, k, mbx, mby);
    bool avail_t = blk_avail_intra(gx, gy - 1, k, mbx, mby);
    bool avail_tl = blk_avail_intra(gx - 1, gy - 1, k, mbx, mby);
    bool avail_tr = blk_avail_intra(gx + 1, gy - 1, k, mbx, mby);
    Nbr4 n;
    for (int i = 0; i < 4; ++i)
      n.l[i] = avail_l ? Y[(size_t)(py + i) * W + px - 1] : 0;
    for (int i = 0; i < 4; ++i)
      n.t[i] = avail_t ? Y[(size_t)(py - 1) * W + px + i] : 0;
    n.tl = avail_tl ? Y[(size_t)(py - 1) * W + px - 1] : 0;
    if (avail_tr)
      for (int i = 0; i < 4; ++i) n.tr[i] = Y[(size_t)(py - 1) * W + px + 4 + i];
    else if (avail_t)
      for (int i = 0; i < 4; ++i) n.tr[i] = n.t[3];
    else
      for (int i = 0; i < 4; ++i) n.tr[i] = 0;
    int pred[4][4];
    pred4x4(mode, n, avail_l, avail_t, avail_tl, pred);
    if (!coeffs) {
      for (int yy = 0; yy < 4; ++yy)
        for (int xx = 0; xx < 4; ++xx)
          Y[(size_t)(py + yy) * W + px + xx] = (uint8_t)pred[yy][xx];
      return;
    }
    const int32_t* dq = dq4(qp, 0);
    int d[16], res[16];
    std::memset(d, 0, sizeof(d));
    for (int s = 0; s < 16; ++s) {
      int c = coeffs[s];
      if (c) {
        int posn = zz4[s];
        d[posn] = dequant4_apply(c, dq[posn], qp);
      }
    }
    idct4x4(d, res);
    for (int yy = 0; yy < 4; ++yy)
      for (int xx = 0; xx < 4; ++xx)
        Y[(size_t)(py + yy) * W + px + xx] =
            (uint8_t)clip1(pred[yy][xx] + res[4 * yy + xx]);
  }

  void decode_i16x16(BitReader& r, int mbx, int mby, int k) {
    // h264_ref.py:2782-2812
    int pred_mode = k % 4;
    int cbp_chroma = (k / 4) % 3;
    int cbp_luma = k >= 12 ? 15 : 0;
    int chroma_mode = r.ue();
    qp = ((qp + r.se()) % 52 + 52) % 52;
    size_t mi = pic->mbi(mbx, mby);
    pic->mb_class[mi] = MB_I16;
    pic->mb_qp[mi] = (int8_t)qp;
    pic->mb_cbp[mi] = (int8_t)(cbp_luma | (cbp_chroma << 4));
    int gx0 = mbx * 4, gy0 = mby * 4;
    int nc = combine_nc(nnz_luma(gx0 - 1, gy0), nnz_luma(gx0, gy0 - 1));
    int dc_scan[16];
    int dc_tc = cavlc_block(r, nc, 16, dc_scan);
    if (dc_tc) pic->mb_dc_flag[mi] |= 1;
    int coeffs[16][15];
    bool has[16] = {};
    for (int kk = 0; kk < 16; ++kk) {
      if (cbp_luma) {
        int gx = gx0 + kZtoX[kk], gy = gy0 + kZtoY[kk];
        int ncb = combine_nc(nnz_luma(gx - 1, gy), nnz_luma(gx, gy - 1));
        int tc = cavlc_block(r, ncb, 15, coeffs[kk]);
        has[kk] = true;
        pic->nnz_y[pic->c4(gx, gy)] = (int8_t)tc;
      }
    }
    const int* cptr[16];
    for (int kk = 0; kk < 16; ++kk) cptr[kk] = has[kk] ? coeffs[kk] : nullptr;
    recon_i16(mbx, mby, pred_mode, dc_scan, cptr);
    decode_chroma_cavlc(r, mbx, mby, chroma_mode, cbp_chroma, true);
  }

  void recon_i16(int mbx, int mby, int pred_mode, const int* dc_scan,
                 const int* coeffs[16]) {
    // h264_ref.py:2814-2853
    bool avail_l = mb_avail_intra(mbx - 1, mby);
    bool avail_t = mb_avail_intra(mbx, mby - 1);
    bool avail_tl = mb_avail_intra(mbx - 1, mby - 1);
    int px = mbx * 16, py = mby * 16;
    uint8_t* Y = pic->Y.data();
    int W = pic->w;
    int left[16] = {}, top[16] = {}, tl = 0;
    if (avail_l)
      for (int i = 0; i < 16; ++i) left[i] = Y[(size_t)(py + i) * W + px - 1];
    if (avail_t)
      for (int i = 0; i < 16; ++i) top[i] = Y[(size_t)(py - 1) * W + px + i];
    if (avail_tl) tl = Y[(size_t)(py - 1) * W + px - 1];
    int pred[256];
    pred16x16(pred_mode, left, top, tl, avail_l, avail_t, pred);
    int dcr[16];
    for (int s = 0; s < 16; ++s) dcr[zz4[s]] = dc_scan[s];
    int f[16], dc[16];
    hadamard4x4(dcr, f);
    luma_dc_dequant(f, qp, w4[0][0], dc);
    const int32_t* dq = dq4(qp, 0);
    for (int kk = 0; kk < 16; ++kk) {
      int x4 = kZtoX[kk], y4 = kZtoY[kk];
      int d[16], res[16];
      std::memset(d, 0, sizeof(d));
      if (coeffs[kk]) {
        for (int s = 0; s < 15; ++s) {
          int c = coeffs[kk][s];
          if (c) {
            int posn = zz4[s + 1];
            d[posn] = dequant4_apply(c, dq[posn], qp);
          }
        }
      }
      d[0] = dc[4 * y4 + x4];
      idct4x4(d, res);
      int bx = px + 4 * x4, by = py + 4 * y4;
      for (int yy = 0; yy < 4; ++yy)
        for (int xx = 0; xx < 4; ++xx)
          Y[(size_t)(by + yy) * W + bx + xx] = (uint8_t)clip1(
              pred[16 * (by - py + yy) + (bx - px + xx)] + res[4 * yy + xx]);
    }
  }

  void decode_chroma_cavlc(BitReader& r, int mbx, int mby, int chroma_mode,
                           int cbp_chroma, bool intra) {
    // h264_ref.py:2855-2877
    size_t mi = pic->mbi(mbx, mby);
    int dc_scan[2][4] = {{0, 0, 0, 0}, {0, 0, 0, 0}};
    if (cbp_chroma) {
      for (int comp = 0; comp < 2; ++comp) {
        int blk[4];
        int tc = cavlc_block(r, -1, 4, blk);
        for (int i = 0; i < 4; ++i) dc_scan[comp][i] = blk[i];
        if (tc) pic->mb_dc_flag[mi] |= 2 << comp;
      }
    }
    int coeffs[2][4][15];
    bool has[2][4] = {};
    if (cbp_chroma & 2) {
      for (int comp = 0; comp < 2; ++comp)
        for (int b = 0; b < 4; ++b) {
          int cx = mbx * 2 + (b & 1), cy = mby * 2 + (b >> 1);
          int nc = combine_nc(nnz_chroma(comp, cx - 1, cy),
                              nnz_chroma(comp, cx, cy - 1));
          int tc = cavlc_block(r, nc, 15, coeffs[comp][b]);
          has[comp][b] = true;
          pic->nnz_c[pic->cc(comp, cx, cy)] = (int8_t)tc;
        }
    }
    const int* cptr[2][4];
    for (int comp = 0; comp < 2; ++comp)
      for (int b = 0; b < 4; ++b)
        cptr[comp][b] = has[comp][b] ? coeffs[comp][b] : nullptr;
    recon_chroma(mbx, mby, chroma_mode, dc_scan, cptr, intra);
  }

  void recon_chroma(int mbx, int mby, int chroma_mode, int dc_scan[2][4],
                    const int* coeffs[2][4], bool intra) {
    // h264_ref.py:2879-2927
    bool avail_l = mb_avail_intra(mbx - 1, mby);
    bool avail_t = mb_avail_intra(mbx, mby - 1);
    bool avail_tl = mb_avail_intra(mbx - 1, mby - 1);
    int qpc[2] = {chroma_qp_map(qp, pps->chroma_qp_index_offset),
                  chroma_qp_map(qp, pps->second_chroma_qp_index_offset)};
    for (int comp = 0; comp < 2; ++comp) {
      uint8_t* plane = comp ? pic->V.data() : pic->U.data();
      int CW = pic->cw;
      int px = mbx * 8, py = mby * 8;
      int pred[64];
      if (intra) {
        int left[8] = {}, top[8] = {}, tl = 0;
        if (avail_l)
          for (int i = 0; i < 8; ++i)
            left[i] = plane[(size_t)(py + i) * CW + px - 1];
        if (avail_t)
          for (int i = 0; i < 8; ++i)
            top[i] = plane[(size_t)(py - 1) * CW + px + i];
        if (avail_tl) tl = plane[(size_t)(py - 1) * CW + px - 1];
        pred_chroma8x8(chroma_mode, left, top, tl, avail_l, avail_t, pred);
      } else {
        const int* src = comp ? pred_chromaV : pred_chromaU;
        std::memcpy(pred, src, sizeof(pred));
      }
      int qpcc = qpc[comp];
      int list_idx = intra ? (1 + comp) : (4 + comp);
      int c0 = dc_scan[comp][0], c1 = dc_scan[comp][1];
      int c2 = dc_scan[comp][2], c3 = dc_scan[comp][3];
      int f[4] = {c0 + c1 + c2 + c3, c0 - c1 + c2 - c3, c0 + c1 - c2 - c3,
                  c0 - c1 - c2 + c3};
      int dc[4];
      chroma_dc_dequant(f, qpcc, w4[list_idx][0], dc);
      const int32_t* dq = dq4(qpcc, list_idx);
      int out[64];
      std::memcpy(out, pred, sizeof(out));
      for (int b = 0; b < 4; ++b) {
        int bx = 4 * (b & 1), by = 4 * (b >> 1);
        int d[16];
        std::memset(d, 0, sizeof(d));
        if (coeffs[comp][b]) {
          for (int s = 0; s < 15; ++s) {
            int c = coeffs[comp][b][s];
            if (c) {
              int posn = zz4[s + 1];
              d[posn] = dequant4_apply(c, dq[posn], qpcc);
            }
          }
        }
        d[0] = dc[b];
        bool any = false;
        for (int i = 0; i < 16; ++i) any |= d[i] != 0;
        if (any) {
          int res[16];
          idct4x4(d, res);
          for (int yy = 0; yy < 4; ++yy)
            for (int xx = 0; xx < 4; ++xx)
              out[8 * (by + yy) + bx + xx] =
                  clip1(pred[8 * (by + yy) + bx + xx] + res[4 * yy + xx]);
        }
      }
      for (int yy = 0; yy < 8; ++yy)
#if H264_SIMD
        pack_row8(plane + (size_t)(py + yy) * CW + px, out + 8 * yy);
#else
        for (int xx = 0; xx < 8; ++xx)
          plane[(size_t)(py + yy) * CW + px + xx] =
              (uint8_t)clamp_i(out[8 * yy + xx], 0, 255);
#endif
    }
  }

  // -- inter decoding: P slices (h264_ref.py:2932-3264) -------------------

  static int read_te(BitReader& r, int cmax) {
    if (cmax == 0) return 0;
    if (cmax == 1) return 1 - r.read1();
    return r.ue();
  }

  // (avail, ref_idx, mvx, mvy) of the list-l 4x4 motion (h264_ref.py:2941)
  struct MvRef {
    bool avail;
    int ref, mvx, mvy;
  };
  MvRef mv_ref_at(int gx, int gy, int l) const {
    if (gx < 0 || gy < 0 || gx >= pic->n4w || gy >= pic->n4h)
      return {false, -1, 0, 0};
    int mbx = gx >> 2, mby = gy >> 2;
    if (mbx == cur_mbx && mby == cur_mby) {
      if (xy_to_z(gx & 3, gy & 3) >= cur_z) return {false, -1, 0, 0};
    } else if (pic->slice_of(pic->mbi(mbx, mby)) != sid) {
      return {false, -1, 0, 0};
    } else if (!(mby < cur_mby || (mby == cur_mby && mbx < cur_mbx))) {
      return {false, -1, 0, 0};
    }
    size_t ix = pic->mvix(l, gy, gx);
    return {true, (int)pic->ref_idx[ix], (int)pic->mv[2 * ix],
            (int)pic->mv[2 * ix + 1]};
  }

  // median/directional MV prediction (8.4.1.3; h264_ref.py:2960-2993)
  // part_kind: 0 = other, 1 = "16x8", 2 = "8x16"
  void mv_pred(int bx4, int by4, int w4_, int h4_, int ref_idx, int part_kind,
               int part_i, int l, int* px, int* py) {
    (void)h4_;
    int gx0 = cur_mbx * 4 + bx4;
    int gy0 = cur_mby * 4 + by4;
    MvRef A = mv_ref_at(gx0 - 1, gy0, l);
    MvRef B = mv_ref_at(gx0, gy0 - 1, l);
    MvRef C = mv_ref_at(gx0 + w4_, gy0 - 1, l);
    if (!C.avail) C = mv_ref_at(gx0 - 1, gy0 - 1, l);
    int ra = A.ref, rb = B.ref, rc = C.ref;
    if (part_kind == 1) {
      if (part_i == 0 && rb == ref_idx) {
        *px = B.mvx;
        *py = B.mvy;
        return;
      }
      if (part_i == 1 && ra == ref_idx) {
        *px = A.mvx;
        *py = A.mvy;
        return;
      }
    } else if (part_kind == 2) {
      if (part_i == 0 && ra == ref_idx) {
        *px = A.mvx;
        *py = A.mvy;
        return;
      }
      if (part_i == 1 && rc == ref_idx) {
        *px = C.mvx;
        *py = C.mvy;
        return;
      }
    }
    bool ma = ra == ref_idx, mb_ = rb == ref_idx, mc = rc == ref_idx;
    if (ma && !mb_ && !mc) {
      *px = A.mvx;
      *py = A.mvy;
      return;
    }
    if (mb_ && !ma && !mc) {
      *px = B.mvx;
      *py = B.mvy;
      return;
    }
    if (mc && !ma && !mb_) {
      *px = C.mvx;
      *py = C.mvy;
      return;
    }
    if (!B.avail && !C.avail) {
      *px = A.mvx;
      *py = A.mvy;
      return;
    }
    *px = median3(A.mvx, B.mvx, C.mvx);
    *py = median3(A.mvy, B.mvy, C.mvy);
  }

  void store_part_mv(int bx4, int by4, int w4_, int h4_, int ref_idx,
                     const Picture* ref, int mvx, int mvy, int l) {
    int gx0 = cur_mbx * 4 + bx4;
    int gy0 = cur_mby * 4 + by4;
    for (int y = 0; y < h4_; ++y)
      for (int x = 0; x < w4_; ++x) {
        size_t ix = pic->mvix(l, gy0 + y, gx0 + x);
        pic->mv[2 * ix] = (int16_t)mvx;
        pic->mv[2 * ix + 1] = (int16_t)mvy;
        pic->ref_idx[ix] = (int8_t)ref_idx;
        pic->ref_id[ix] = ref->pic_id;
      }
  }

  void store_part_mvd(int bx4, int by4, int w4_, int h4_, int l, int mvdx,
                      int mvdy) {
    int gx0 = cur_mbx * 4 + bx4;
    int gy0 = cur_mby * 4 + by4;
    for (int y = 0; y < h4_; ++y)
      for (int x = 0; x < w4_; ++x) {
        size_t ix = pic->mvix(l, gy0 + y, gx0 + x);
        pic->mvd[2 * ix] = (int16_t)mvdx;
        pic->mvd[2 * ix + 1] = (int16_t)mvdy;
      }
  }

  // explicit single-list weighted prediction (8.4.2.3.2; h264_ref.py:3004)
  // comp: -1 = luma, 0/1 = Cb/Cr
  void wp_apply(int* blk, int n, int l, int ref_idx, int comp) {
    const PredWeights& pw = h->pred_weights;
    if (!pw.present) return;
    if (ref_idx < 0 || (size_t)ref_idx >= pw.w[l].size())
      throw DecodeError("weight index out of range");
    int logwd = comp < 0 ? pw.luma_log2 : pw.chroma_log2;
    const std::array<int, 6>& wt = pw.w[l][ref_idx];
    int w, o;
    if (comp < 0) {
      w = wt[0];
      o = wt[1];
    } else {
      w = wt[2 + 2 * comp];
      o = wt[3 + 2 * comp];
    }
    if (logwd >= 1) {
      for (int i = 0; i < n; ++i)
        blk[i] = clip1(((blk[i] * w + (1 << (logwd - 1))) >> logwd) + o);
    } else {
      for (int i = 0; i < n; ++i) blk[i] = clip1(blk[i] * w + o);
    }
  }

  // raw interpolated (Y, U, V) blocks from list l (h264_ref.py:3023-3032)
  void fetch_pred(int l, int ref_idx, int bx4, int by4, int w4_, int h4_,
                  int mvx, int mvy, PredBlk& out) {
    const std::vector<Picture*>& lst = l == 0 ? ref_l0 : ref_l1;
    if (ref_idx < 0 || (size_t)ref_idx >= lst.size())
      throw DecodeError("reference index out of range");
    const Picture* ref = lst[ref_idx];
    int x0 = cur_mbx * 16 + bx4 * 4, y0 = cur_mby * 16 + by4 * 4;
    int cx0 = cur_mbx * 8 + bx4 * 2, cy0 = cur_mby * 8 + by4 * 2;
    // fields referencing the opposite parity apply the 8.4.1.4 chroma
    // vertical MV adjustment (top->bottom -2, bottom->top +2;
    // h264_ref.py:3085-3100)
    int cmvy = mvy;
    if (pic->is_field_pic && ref->parity != pic->parity)
      cmvy = pic->parity == 0 ? mvy - 2 : mvy + 2;
    mc_luma(ref->Y.data(), ref->w, ref->h, x0, y0, w4_ * 4, h4_ * 4, mvx, mvy,
            out.y);
    mc_chroma(ref->U.data(), ref->cw, ref->ch, cx0, cy0, w4_ * 2, h4_ * 2,
              mvx, cmvy, out.u);
    mc_chroma(ref->V.data(), ref->cw, ref->ch, cx0, cy0, w4_ * 2, h4_ * 2,
              mvx, cmvy, out.v);
  }

  // (w0, w1) per 8.4.2.3.1 implicit mode (h264_ref.py:3034-3048)
  void implicit_weights(int ref_idx0, int ref_idx1, int* w0, int* w1) {
    if (ref_idx0 < 0 || (size_t)ref_idx0 >= ref_l0.size() ||
        ref_idx1 < 0 || (size_t)ref_idx1 >= ref_l1.size())
      throw DecodeError("reference index out of range");
    const Picture* pic0 = ref_l0[ref_idx0];
    const Picture* pic1 = ref_l1[ref_idx1];
    int cur = pic->poc;
    if (pic1->poc == pic0->poc || pic0->long_term || pic1->long_term) {
      *w0 = *w1 = 32;
      return;
    }
    int tb = clamp_i(cur - pic0->poc, -128, 127);
    int td = clamp_i(pic1->poc - pic0->poc, -128, 127);
    int tx = floordiv(16384 + std::abs(td) / 2, td);
    int dsf = clamp_i((tb * tx + 32) >> 6, -1024, 1023);
    int v1 = dsf >> 2;
    if (v1 < -64 || v1 > 128) {
      *w0 = *w1 = 32;
      return;
    }
    *w0 = 64 - v1;
    *w1 = v1;
  }

  // combine per-list predictions into the MB planes (h264_ref.py:3050-3096)
  void combine_store(int* predY, int* predU, int* predV, int bx4, int by4,
                     int w4_, int h4_, PredBlk* p0, PredBlk* p1, int ref_idx0,
                     int ref_idx1) {
    int lw = w4_ * 4, lh = h4_ * 4;
    int cw_ = w4_ * 2, ch_ = h4_ * 2;
    int nl = lw * lh, nc = cw_ * ch_;
    int oy[256], ou[64], ov[64];
    // fast path: single-list unweighted prediction (the dominant case)
    // stores the fetched block straight into the MB planes row-wise;
    // the oy/ou/ov round trip cost ~4M sub-64B libc memcpys per second
    // of 1080p (fixed-size copies inline to vector moves)
    if (!(p0 && p1) &&
        !(h->pred_weights.present &&
          (h->slice_type != SLICE_B || pps->weighted_bipred_idc == 1))) {
      const PredBlk* p = p1 ? p1 : p0;
      auto rows = [](const int* src, int* dstbase, int stride, int x0,
                     int y0, int rw, int rh) {
        for (int y = 0; y < rh; ++y) {
          int* dst = dstbase + stride * (y0 + y) + x0;
          const int* s = src + (size_t)y * rw;
          switch (rw) {
            case 2: std::memcpy(dst, s, 8); break;
            case 4: std::memcpy(dst, s, 16); break;
            case 8: std::memcpy(dst, s, 32); break;
            case 16: std::memcpy(dst, s, 64); break;
            default: std::memcpy(dst, s, (size_t)rw * 4);
          }
        }
      };
      rows(p->y, predY, 16, bx4 * 4, by4 * 4, lw, lh);
      rows(p->u, predU, 8, bx4 * 2, by4 * 2, cw_, ch_);
      rows(p->v, predV, 8, bx4 * 2, by4 * 2, cw_, ch_);
      return;
    }
    if (p0 && p1) {
      if (h->slice_type == SLICE_B && pps->weighted_bipred_idc == 2) {
        int w0, w1;
        implicit_weights(ref_idx0, ref_idx1, &w0, &w1);
        for (int i = 0; i < nl; ++i)
          oy[i] = clip1((p0->y[i] * w0 + p1->y[i] * w1 + 32) >> 6);
        for (int i = 0; i < nc; ++i) {
          ou[i] = clip1((p0->u[i] * w0 + p1->u[i] * w1 + 32) >> 6);
          ov[i] = clip1((p0->v[i] * w0 + p1->v[i] * w1 + 32) >> 6);
        }
      } else if (h->slice_type == SLICE_B && pps->weighted_bipred_idc == 1 &&
                 h->pred_weights.present) {
        const PredWeights& pw = h->pred_weights;
        if (ref_idx0 < 0 || (size_t)ref_idx0 >= pw.w[0].size() ||
            ref_idx1 < 0 || (size_t)ref_idx1 >= pw.w[1].size())
          throw DecodeError("weight index out of range");
        const std::array<int, 6>& wt0 = pw.w[0][ref_idx0];
        const std::array<int, 6>& wt1 = pw.w[1][ref_idx1];
        for (int c = 0; c < 3; ++c) {
          int logwd = c == 0 ? pw.luma_log2 : pw.chroma_log2;
          int w0, o0, w1, o1;
          if (c == 0) {
            w0 = wt0[0];
            o0 = wt0[1];
            w1 = wt1[0];
            o1 = wt1[1];
          } else {
            int k = 2 * c;
            w0 = wt0[k];
            o0 = wt0[k + 1];
            w1 = wt1[k];
            o1 = wt1[k + 1];
          }
          const int* s0 = c == 0 ? p0->y : c == 1 ? p0->u : p0->v;
          const int* s1 = c == 0 ? p1->y : c == 1 ? p1->u : p1->v;
          int* dst = c == 0 ? oy : c == 1 ? ou : ov;
          int n = c == 0 ? nl : nc;
          for (int i = 0; i < n; ++i)
            dst[i] = clip1(((s0[i] * w0 + s1[i] * w1 + (1 << logwd)) >>
                            (logwd + 1)) +
                           ((o0 + o1 + 1) >> 1));
        }
      } else {
        for (int i = 0; i < nl; ++i) oy[i] = (p0->y[i] + p1->y[i] + 1) >> 1;
        for (int i = 0; i < nc; ++i) {
          ou[i] = (p0->u[i] + p1->u[i] + 1) >> 1;
          ov[i] = (p0->v[i] + p1->v[i] + 1) >> 1;
        }
      }
    } else {
      int l = p1 ? 1 : 0;
      PredBlk* p = p1 ? p1 : p0;
      int ref_idx = p1 ? ref_idx1 : ref_idx0;
      bool weighted =
          h->pred_weights.present &&
          (h->slice_type != SLICE_B || pps->weighted_bipred_idc == 1);
      std::memcpy(oy, p->y, nl * sizeof(int));
      std::memcpy(ou, p->u, nc * sizeof(int));
      std::memcpy(ov, p->v, nc * sizeof(int));
      if (weighted) {
        wp_apply(oy, nl, l, ref_idx, -1);
        wp_apply(ou, nc, l, ref_idx, 0);
        wp_apply(ov, nc, l, ref_idx, 1);
      }
    }
    for (int y = 0; y < lh; ++y)
      std::memcpy(predY + 16 * (by4 * 4 + y) + bx4 * 4, oy + y * lw,
                  (size_t)lw * sizeof(int));
    for (int y = 0; y < ch_; ++y) {
      std::memcpy(predU + 8 * (by4 * 2 + y) + bx4 * 2, ou + y * cw_,
                  (size_t)cw_ * sizeof(int));
      std::memcpy(predV + 8 * (by4 * 2 + y) + bx4 * 2, ov + y * cw_,
                  (size_t)cw_ * sizeof(int));
    }
  }

  void mc_part(int* predY, int* predU, int* predV, int bx4, int by4, int w4_,
               int h4_, int ref_idx, int mvx, int mvy) {
    PredBlk p0;
    fetch_pred(0, ref_idx, bx4, by4, w4_, h4_, mvx, mvy, p0);
    combine_store(predY, predU, predV, bx4, by4, w4_, h4_, &p0, nullptr,
                  ref_idx, -1);
  }

  // P_Skip motion (8.4.1.1; h264_ref.py:3105-3117)
  void skip_mv(int* mvx, int* mvy) {
    int gx0 = cur_mbx * 4, gy0 = cur_mby * 4;
    MvRef A = mv_ref_at(gx0 - 1, gy0, 0);
    MvRef B = mv_ref_at(gx0, gy0 - 1, 0);
    if (!A.avail || !B.avail) {
      *mvx = *mvy = 0;
      return;
    }
    if (A.ref == 0 && A.mvx == 0 && A.mvy == 0) {
      *mvx = *mvy = 0;
      return;
    }
    if (B.ref == 0 && B.mvx == 0 && B.mvy == 0) {
      *mvx = *mvy = 0;
      return;
    }
    mv_pred(0, 0, 4, 4, 0, 0, 0, 0, mvx, mvy);
  }

  void decode_skip_mb(int mb_idx);  // dispatches P/B (defined below)

  void decode_p_skip(int mb_idx) {
    // h264_ref.py:3119-3139
    int mbx = mb_idx % pic->mb_w, mby = mb_idx / pic->mb_w;
    mark_mb(mbx, mby);
    cur_mbx = mbx;
    cur_mby = mby;
    cur_z = 0;
    size_t mi = pic->mbi(mbx, mby);
    pic->mb_class[mi] = MB_P;
    pic->mb_qp[mi] = (int8_t)qp;
    pic->mb_cbp[mi] = 0;
    int mvx, mvy;
    skip_mv(&mvx, &mvy);
    cur_z = 16;
    store_part_mv(0, 0, 4, 4, 0, refp(0, 0), mvx, mvy, 0);
    int predY[256], predU[64], predV[64];
    mc_part(predY, predU, predV, 0, 0, 4, 4, 0, mvx, mvy);
    store_mb_planes(mbx, mby, predY, predU, predV);
  }

  void store_mb_planes(int mbx, int mby, const int* predY, const int* predU,
                       const int* predV) {
    uint8_t* Y = pic->Y.data();
    for (int yy = 0; yy < 16; ++yy)
      for (int xx = 0; xx < 16; ++xx)
        Y[(size_t)(mby * 16 + yy) * pic->w + mbx * 16 + xx] =
            (uint8_t)predY[16 * yy + xx];
    for (int yy = 0; yy < 8; ++yy)
      for (int xx = 0; xx < 8; ++xx) {
        pic->U[(size_t)(mby * 8 + yy) * pic->cw + mbx * 8 + xx] =
            (uint8_t)predU[8 * yy + xx];
        pic->V[(size_t)(mby * 8 + yy) * pic->cw + mbx * 8 + xx] =
            (uint8_t)predV[8 * yy + xx];
      }
  }

  // partition geometry (h264_ref.py:3141-3151, 3280-3299)
  struct Part {
    int bx4, by4, w4, h4;
  };
  // P mb_type 0..2 -> (kind, parts); kind 0=16x16, 1=16x8, 2=8x16
  static const Part* p_parts(int mb_type, int* kind, int* n) {
    static const Part P0[] = {{0, 0, 4, 4}};
    static const Part P1[] = {{0, 0, 4, 2}, {0, 2, 4, 2}};
    static const Part P2[] = {{0, 0, 2, 4}, {2, 0, 2, 4}};
    if (mb_type == 0) {
      *kind = 0;
      *n = 1;
      return P0;
    }
    if (mb_type == 1) {
      *kind = 1;
      *n = 2;
      return P1;
    }
    *kind = 2;
    *n = 2;
    return P2;
  }
  static const Part* sub_parts(int st, int* n) {
    static const Part S0[] = {{0, 0, 2, 2}};
    static const Part S1[] = {{0, 0, 2, 1}, {0, 1, 2, 1}};
    static const Part S2[] = {{0, 0, 1, 2}, {1, 0, 1, 2}};
    static const Part S3[] = {{0, 0, 1, 1}, {1, 0, 1, 1}, {0, 1, 1, 1},
                              {1, 1, 1, 1}};
    switch (st) {
      case 0:
        *n = 1;
        return S0;
      case 1:
        *n = 2;
        return S1;
      case 2:
        *n = 2;
        return S2;
      default:
        *n = 4;
        return S3;
    }
  }

  void decode_p_mb(BitReader& r, int mbx, int mby, int mb_type) {
    // h264_ref.py:3153-3197
    cur_mbx = mbx;
    cur_mby = mby;
    cur_z = 0;
    pic->mb_class[pic->mbi(mbx, mby)] = MB_P;
    int n0 = h->num_ref_idx[0];
    int predY[256], predU[64], predV[64];
    std::vector<int> sub_types;
    if (mb_type <= 2) {
      int kind, np;
      const Part* parts = p_parts(mb_type, &kind, &np);
      int refs[2];
      for (int i = 0; i < np; ++i) refs[i] = read_te(r, n0 - 1);
      for (int i = 0; i < np; ++i) {
        int mvdx = r.se(), mvdy = r.se();
        cur_z = xy_to_z(parts[i].bx4, parts[i].by4);
        int px, py;
        mv_pred(parts[i].bx4, parts[i].by4, parts[i].w4, parts[i].h4, refs[i],
                kind, i, 0, &px, &py);
        int mvx = px + mvdx, mvy = py + mvdy;
        store_part_mv(parts[i].bx4, parts[i].by4, parts[i].w4, parts[i].h4,
                      refs[i], refp(0, refs[i]), mvx, mvy, 0);
        mc_part(predY, predU, predV, parts[i].bx4, parts[i].by4, parts[i].w4,
                parts[i].h4, refs[i], mvx, mvy);
      }
    } else {
      // P_8x8 (3) / P_8x8ref0 (4)
      sub_types.resize(4);
      for (int b = 0; b < 4; ++b) {
        sub_types[b] = r.ue();
        if (sub_types[b] > 3) throw DecodeError("bad sub_mb_type");
      }
      int refs[4] = {0, 0, 0, 0};
      if (mb_type == 3)
        for (int b = 0; b < 4; ++b) refs[b] = read_te(r, n0 - 1);
      for (int b = 0; b < 4; ++b) {
        int bx0 = (b & 1) * 2, by0 = (b >> 1) * 2;
        int ns;
        const Part* sp = sub_parts(sub_types[b], &ns);
        for (int s = 0; s < ns; ++s) {
          int bx4 = bx0 + sp[s].bx4, by4 = by0 + sp[s].by4;
          int mvdx = r.se(), mvdy = r.se();
          cur_z = xy_to_z(bx4, by4);
          int px, py;
          mv_pred(bx4, by4, sp[s].w4, sp[s].h4, refs[b], 0, 0, 0, &px, &py);
          int mvx = px + mvdx, mvy = py + mvdy;
          store_part_mv(bx4, by4, sp[s].w4, sp[s].h4, refs[b],
                        refp(0, refs[b]), mvx, mvy, 0);
          mc_part(predY, predU, predV, bx4, by4, sp[s].w4, sp[s].h4, refs[b],
                  mvx, mvy);
        }
      }
    }
    cur_z = 16;
    bool tf8_ok = mb_type <= 2;
    if (!tf8_ok) {
      tf8_ok = true;
      for (int st : sub_types) tf8_ok &= (st == 0);
    }
    inter_residual(r, mbx, mby, predY, predU, predV, tf8_ok);
  }

  void inter_residual(BitReader& r, int mbx, int mby, int* predY, int* predU,
                      int* predV, bool tf8_ok) {
    // h264_ref.py:3199-3264
    size_t mi = pic->mbi(mbx, mby);
    int gi = r.ue();
    if (gi >= 48) throw DecodeError("bad cbp golomb");
    int cbp = kGolombToInterCbp[gi];
    int cbp_luma = cbp & 15, cbp_chroma = cbp >> 4;
    int tf8 = 0;
    if (cbp_luma && tf8_ok && pps->transform_8x8_mode) tf8 = r.read1();
    pic->mb_tf8[mi] = (int8_t)tf8;
    if (cbp) qp = ((qp + r.se()) % 52 + 52) % 52;
    pic->mb_qp[mi] = (int8_t)qp;
    pic->mb_cbp[mi] = (int8_t)cbp;
    int gx0 = mbx * 4, gy0 = mby * 4;
    uint8_t* Y = pic->Y.data();
    int W = pic->w;
    if (tf8) {
      for (int b = 0; b < 4; ++b) {
        int bx = (b & 1) * 2, by = (b >> 1) * 2;
        int px = mbx * 16 + bx * 4, py = mby * 16 + by * 4;
        if (!(cbp_luma & (1 << b))) {
          for (int yy = 0; yy < 8; ++yy)
#if H264_SIMD
            pack_row8(Y + (size_t)(py + yy) * W + px,
                      predY + 16 * (by * 4 + yy) + bx * 4);
#else
            for (int xx = 0; xx < 8; ++xx)
              Y[(size_t)(py + yy) * W + px + xx] =
                  (uint8_t)predY[16 * (by * 4 + yy) + bx * 4 + xx];
#endif
          continue;
        }
        int scan64[64], res[64];
        parse_luma8x8_cavlc(r, b, scan64);
        residual8x8(scan64, qp, 1, res);
        for (int yy = 0; yy < 8; ++yy)
#if H264_SIMD
          add_clip_row8(Y + (size_t)(py + yy) * W + px,
                        predY + 16 * (by * 4 + yy) + bx * 4, res + 8 * yy);
#else
          for (int xx = 0; xx < 8; ++xx)
            Y[(size_t)(py + yy) * W + px + xx] = (uint8_t)clip1(
                predY[16 * (by * 4 + yy) + bx * 4 + xx] + res[8 * yy + xx]);
#endif
      }
      std::memcpy(pred_chromaU, predU, sizeof(pred_chromaU));
      std::memcpy(pred_chromaV, predV, sizeof(pred_chromaV));
      decode_chroma_cavlc(r, mbx, mby, 0, cbp_chroma, false);
      return;
    }
    const int32_t* dq = dq4(qp, 3);
    for (int k = 0; k < 16; ++k) {
      int x4 = kZtoX[k], y4 = kZtoY[k];
      int px = mbx * 16 + x4 * 4, py = mby * 16 + y4 * 4;
      if (!(cbp_luma & (1 << (k >> 2)))) {
        for (int yy = 0; yy < 4; ++yy)
#if H264_SIMD
          pack_row4(Y + (size_t)(py + yy) * W + px,
                    predY + 16 * (y4 * 4 + yy) + x4 * 4);
#else
          for (int xx = 0; xx < 4; ++xx)
            Y[(size_t)(py + yy) * W + px + xx] =
                (uint8_t)predY[16 * (y4 * 4 + yy) + x4 * 4 + xx];
#endif
        continue;
      }
      int gx = gx0 + x4, gy = gy0 + y4;
      int nc = combine_nc(nnz_luma(gx - 1, gy), nnz_luma(gx, gy - 1));
      int blk[16];
      int tc = cavlc_block(r, nc, 16, blk);
      pic->nnz_y[pic->c4(gx, gy)] = (int8_t)tc;
      int d[16], res[16];
      std::memset(d, 0, sizeof(d));
      for (int s = 0; s < 16; ++s) {
        int c = blk[s];
        if (c) {
          int posn = zz4[s];
          d[posn] = dequant4_apply(c, dq[posn], qp);
        }
      }
      idct4x4(d, res);
      for (int yy = 0; yy < 4; ++yy)
#if H264_SIMD
        add_clip_row4(Y + (size_t)(py + yy) * W + px,
                      predY + 16 * (y4 * 4 + yy) + x4 * 4, res + 4 * yy);
#else
        for (int xx = 0; xx < 4; ++xx)
          Y[(size_t)(py + yy) * W + px + xx] = (uint8_t)clip1(
              predY[16 * (y4 * 4 + yy) + x4 * 4 + xx] + res[4 * yy + xx]);
#endif
    }
    std::memcpy(pred_chromaU, predU, sizeof(pred_chromaU));
    std::memcpy(pred_chromaV, predV, sizeof(pred_chromaV));
    decode_chroma_cavlc(r, mbx, mby, 0, cbp_chroma, false);
  }

  // -- B slices: direct modes + bi-prediction (h264_ref.py:3266-3531) -----

  // B mb_type 1..21 -> (kind, pred per part); kind as p_parts
  static void b_type(int mb_type, int* kind, int preds[2], int* np) {
    // h264_ref.py:3268-3284
    static const struct {
      int kind, p0, p1;
    } T[] = {
        {0, 0, -9}, {0, 1, -9}, {0, 2, -9},              // 1..3 16x16
        {1, 0, 0},  {2, 0, 0},  {1, 1, 1},  {2, 1, 1},   // 4..7
        {1, 0, 1},  {2, 0, 1},  {1, 1, 0},  {2, 1, 0},   // 8..11
        {1, 0, 2},  {2, 0, 2},  {1, 1, 2},  {2, 1, 2},   // 12..15
        {1, 2, 0},  {2, 2, 0},  {1, 2, 1},  {2, 2, 1},   // 16..19
        {1, 2, 2},  {2, 2, 2},                           // 20..21
    };
    const auto& t = T[mb_type - 1];
    *kind = t.kind;
    preds[0] = t.p0;
    preds[1] = t.p1;
    *np = t.kind == 0 ? 1 : 2;
  }
  static const Part* geom(int kind, int* n) {
    static const Part G0[] = {{0, 0, 4, 4}};
    static const Part G1[] = {{0, 0, 4, 2}, {0, 2, 4, 2}};
    static const Part G2[] = {{0, 0, 2, 4}, {2, 0, 2, 4}};
    if (kind == 0) {
      *n = 1;
      return G0;
    }
    if (kind == 1) {
      *n = 2;
      return G1;
    }
    *n = 2;
    return G2;
  }
  // B sub_mb_type -> (pred, sub-part list); pred -1 = direct
  static void b_sub(int st, int* pred, const Part** parts, int* n) {
    static const Part SS22[] = {{0, 0, 2, 2}};
    static const Part SS21[] = {{0, 0, 2, 1}, {0, 1, 2, 1}};
    static const Part SS12[] = {{0, 0, 1, 2}, {1, 0, 1, 2}};
    static const Part SS11[] = {{0, 0, 1, 1}, {1, 0, 1, 1}, {0, 1, 1, 1},
                                {1, 1, 1, 1}};
    switch (st) {
      case 0: *pred = -1; *parts = nullptr; *n = 0; return;
      case 1: *pred = 0; *parts = SS22; *n = 1; return;
      case 2: *pred = 1; *parts = SS22; *n = 1; return;
      case 3: *pred = 2; *parts = SS22; *n = 1; return;
      case 4: *pred = 0; *parts = SS21; *n = 2; return;
      case 5: *pred = 0; *parts = SS12; *n = 2; return;
      case 6: *pred = 1; *parts = SS21; *n = 2; return;
      case 7: *pred = 1; *parts = SS12; *n = 2; return;
      case 8: *pred = 2; *parts = SS21; *n = 2; return;
      case 9: *pred = 2; *parts = SS12; *n = 2; return;
      case 10: *pred = 0; *parts = SS11; *n = 4; return;
      case 11: *pred = 1; *parts = SS11; *n = 4; return;
      default: *pred = 2; *parts = SS11; *n = 4; return;
    }
  }

  // colocated 4x4 motion in RefPicList1[0] (h264_ref.py:3301-3310)
  // returns found; outputs (l, ref_idx, ref_pic_id, mv)
  bool col_motion(int gx, int gy, int* ref_idx, int* rid, int* mx, int* my) {
    if (ref_l1.empty()) throw DecodeError("empty L1 list");
    const Picture* col = ref_l1[0];
    for (int l = 0; l < 2; ++l) {
      size_t ix = col->mvix(l, gy, gx);
      if (col->ref_idx[ix] >= 0) {
        *ref_idx = col->ref_idx[ix];
        *rid = col->ref_id[ix];
        *mx = col->mv[2 * ix];
        *my = col->mv[2 * ix + 1];
        return true;
      }
    }
    return false;
  }

  void direct_spatial_cache() {
    // h264_ref.py:3312-3335
    if (dc_valid) return;
    int gx0 = cur_mbx * 4, gy0 = cur_mby * 4;
    for (int l = 0; l < 2; ++l) {
      MvRef A = mv_ref_at(gx0 - 1, gy0, l);
      MvRef B = mv_ref_at(gx0, gy0 - 1, l);
      MvRef C = mv_ref_at(gx0 + 4, gy0 - 1, l);
      if (!C.avail) C = mv_ref_at(gx0 - 1, gy0 - 1, l);
      int best = -1;
      for (const MvRef* m : {&A, &B, &C})
        if (m->ref >= 0) best = best < 0 ? m->ref : std::min(best, m->ref);
      dc_refs[l] = best;
    }
    dc_dzp = dc_refs[0] < 0 && dc_refs[1] < 0;
    if (dc_dzp) {
      dc_refs[0] = dc_refs[1] = 0;
    }
    dc_mvps[0][0] = dc_mvps[0][1] = dc_mvps[1][0] = dc_mvps[1][1] = 0;
    for (int l = 0; l < 2; ++l)
      if (dc_refs[l] >= 0 && !dc_dzp)
        mv_pred(0, 0, 4, 4, dc_refs[l], 0, 0, l, &dc_mvps[l][0],
                &dc_mvps[l][1]);
    dc_valid = true;
  }

  // direct mvs for 8x8 block b (h264_ref.py:3337-3382)
  void direct_mvs_8x8(int b, int refs_out[2], int mvs_out[2][2]) {
    int gx = cur_mbx * 4 + 3 * (b & 1);
    int gy = cur_mby * 4 + 3 * (b >> 1);
    if (h->direct_spatial_mv_pred) {
      direct_spatial_cache();
      if (ref_l1.empty()) throw DecodeError("empty L1 list");
      const Picture* col = ref_l1[0];
      bool cz = false;
      if (!col->long_term) {
        int ridx, rid, mx, my;
        if (col_motion(gx, gy, &ridx, &rid, &mx, &my))
          cz = ridx == 0 && std::abs(mx) <= 1 && std::abs(my) <= 1;
      }
      for (int l = 0; l < 2; ++l) {
        if (dc_refs[l] < 0) {
          refs_out[l] = -1;
          mvs_out[l][0] = mvs_out[l][1] = 0;
        } else if (dc_dzp || (cz && dc_refs[l] == 0)) {
          refs_out[l] = dc_refs[l];
          mvs_out[l][0] = mvs_out[l][1] = 0;
        } else {
          refs_out[l] = dc_refs[l];
          mvs_out[l][0] = dc_mvps[l][0];
          mvs_out[l][1] = dc_mvps[l][1];
        }
      }
      return;
    }
    // temporal direct (8.4.1.2.3)
    int ridx, rid, mcx, mcy;
    int ref0 = 0;
    int mvcol[2] = {0, 0};
    if (col_motion(gx, gy, &ridx, &rid, &mcx, &mcy)) {
      mvcol[0] = mcx;
      mvcol[1] = mcy;
      for (size_t i = 0; i < ref_l0.size(); ++i)
        if (ref_l0[i]->pic_id == rid) {
          ref0 = (int)i;
          break;
        }
    }
    const Picture* refpic = refp(0, ref0);
    if (ref_l1.empty()) throw DecodeError("empty L1 list");
    const Picture* colpic = ref_l1[0];
    int tb = clamp_i(pic->poc - refpic->poc, -128, 127);
    int td = clamp_i(colpic->poc - refpic->poc, -128, 127);
    if (refpic->long_term || td == 0) {
      refs_out[0] = ref0;
      mvs_out[0][0] = mvcol[0];
      mvs_out[0][1] = mvcol[1];
      refs_out[1] = 0;
      mvs_out[1][0] = mvs_out[1][1] = 0;
      return;
    }
    int q = 16384 + std::abs(td) / 2;
    int tx = (q / std::abs(td)) * (td > 0 ? 1 : -1);
    int dsf = clamp_i((tb * tx + 32) >> 6, -1024, 1023);
    int mv0x = (dsf * mvcol[0] + 128) >> 8;
    int mv0y = (dsf * mvcol[1] + 128) >> 8;
    refs_out[0] = ref0;
    mvs_out[0][0] = mv0x;
    mvs_out[0][1] = mv0y;
    refs_out[1] = 0;
    mvs_out[1][0] = mv0x - mvcol[0];
    mvs_out[1][1] = mv0y - mvcol[1];
  }

  void decode_direct_8x8(int b, int* predY, int* predU, int* predV) {
    // h264_ref.py:3384-3402
    int refs[2], mvs[2][2];
    direct_mvs_8x8(b, refs, mvs);
    int bx4 = (b & 1) * 2, by4 = (b >> 1) * 2;
    int gx0 = cur_mbx * 4 + bx4, gy0 = cur_mby * 4 + by4;
    for (int y = 0; y < 2; ++y)
      for (int x = 0; x < 2; ++x)
        pic->cell_direct[pic->c4(gx0 + x, gy0 + y)] = 1;
    if (refs[0] >= 0)
      store_part_mv(bx4, by4, 2, 2, refs[0], refp(0, refs[0]), mvs[0][0],
                    mvs[0][1], 0);
    if (refs[1] >= 0)
      store_part_mv(bx4, by4, 2, 2, refs[1], refp(1, refs[1]), mvs[1][0],
                    mvs[1][1], 1);
    PredBlk p0, p1;
    bool h0 = refs[0] >= 0, h1 = refs[1] >= 0;
    if (h0) fetch_pred(0, refs[0], bx4, by4, 2, 2, mvs[0][0], mvs[0][1], p0);
    if (h1) fetch_pred(1, refs[1], bx4, by4, 2, 2, mvs[1][0], mvs[1][1], p1);
    combine_store(predY, predU, predV, bx4, by4, 2, 2, h0 ? &p0 : nullptr,
                  h1 ? &p1 : nullptr, refs[0], refs[1]);
  }

  // all-direct MB (B_Skip / B_Direct_16x16): derive + store the four 8x8
  // direct motions exactly as four decode_direct_8x8 calls would, but run
  // ONE 16x16 MC when the derived motion is uniform (identical result --
  // the interpolation of any output pixel depends only on its own
  // neighbourhood; most B skip MBs hit this)
  void decode_direct_mb(int* predY, int* predU, int* predV) {
    int refs[4][2], mvs[4][2][2];
    for (int b = 0; b < 4; ++b) direct_mvs_8x8(b, refs[b], mvs[b]);
    for (int b = 0; b < 4; ++b) {
      int bx4 = (b & 1) * 2, by4 = (b >> 1) * 2;
      int gx0 = cur_mbx * 4 + bx4, gy0 = cur_mby * 4 + by4;
      for (int y = 0; y < 2; ++y)
        for (int x = 0; x < 2; ++x)
          pic->cell_direct[pic->c4(gx0 + x, gy0 + y)] = 1;
      if (refs[b][0] >= 0)
        store_part_mv(bx4, by4, 2, 2, refs[b][0], refp(0, refs[b][0]),
                      mvs[b][0][0], mvs[b][0][1], 0);
      if (refs[b][1] >= 0)
        store_part_mv(bx4, by4, 2, 2, refs[b][1], refp(1, refs[b][1]),
                      mvs[b][1][0], mvs[b][1][1], 1);
    }
    bool uniform = true;
    for (int b = 1; b < 4; ++b)
      for (int l = 0; l < 2; ++l)
        uniform &= refs[b][l] == refs[0][l] &&
                   mvs[b][l][0] == mvs[0][l][0] &&
                   mvs[b][l][1] == mvs[0][l][1];
    if (uniform) {
      PredBlk p0, p1;
      bool h0 = refs[0][0] >= 0, h1 = refs[0][1] >= 0;
      if (h0)
        fetch_pred(0, refs[0][0], 0, 0, 4, 4, mvs[0][0][0], mvs[0][0][1], p0);
      if (h1)
        fetch_pred(1, refs[0][1], 0, 0, 4, 4, mvs[0][1][0], mvs[0][1][1], p1);
      combine_store(predY, predU, predV, 0, 0, 4, 4, h0 ? &p0 : nullptr,
                    h1 ? &p1 : nullptr, refs[0][0], refs[0][1]);
      return;
    }
    for (int b = 0; b < 4; ++b) {
      int bx4 = (b & 1) * 2, by4 = (b >> 1) * 2;
      PredBlk p0, p1;
      bool h0 = refs[b][0] >= 0, h1 = refs[b][1] >= 0;
      if (h0)
        fetch_pred(0, refs[b][0], bx4, by4, 2, 2, mvs[b][0][0], mvs[b][0][1],
                   p0);
      if (h1)
        fetch_pred(1, refs[b][1], bx4, by4, 2, 2, mvs[b][1][0], mvs[b][1][1],
                   p1);
      combine_store(predY, predU, predV, bx4, by4, 2, 2, h0 ? &p0 : nullptr,
                    h1 ? &p1 : nullptr, refs[b][0], refs[b][1]);
    }
  }

  void decode_b_skip(int mb_idx) {
    // h264_ref.py:3404-3420
    int mbx = mb_idx % pic->mb_w, mby = mb_idx / pic->mb_w;
    mark_mb(mbx, mby);
    cur_mbx = mbx;
    cur_mby = mby;
    cur_z = 0;
    dc_valid = false;
    size_t mi = pic->mbi(mbx, mby);
    pic->mb_class[mi] = MB_B;
    pic->mb_qp[mi] = (int8_t)qp;
    pic->mb_cbp[mi] = 0;
    int predY[256], predU[64], predV[64];
    decode_direct_mb(predY, predU, predV);
    store_mb_planes(mbx, mby, predY, predU, predV);
  }

  void decode_b_mb(BitReader& r, int mbx, int mby, int mb_type) {
    // h264_ref.py:3422-3531
    cur_mbx = mbx;
    cur_mby = mby;
    cur_z = 0;
    dc_valid = false;
    pic->mb_class[pic->mbi(mbx, mby)] = MB_B;
    const int* n_act = h->num_ref_idx;
    int predY[256], predU[64], predV[64];
    if (mb_type == 0) {  // B_Direct_16x16
      decode_direct_mb(predY, predU, predV);
      cur_z = 16;
      inter_residual(r, mbx, mby, predY, predU, predV,
                     sps->direct_8x8_inference != 0);
      return;
    }
    bool tf8_ok = true;
    if (mb_type < 22) {
      int kind, preds[2], np;
      b_type(mb_type, &kind, preds, &np);
      int ng;
      const Part* parts = geom(kind, &ng);
      int refs[2][2] = {{-1, -1}, {-1, -1}};
      for (int l = 0; l < 2; ++l)
        for (int i = 0; i < np; ++i)
          if (preds[i] == 2 || preds[i] == l) refs[l][i] = read_te(r, n_act[l] - 1);
      int mvds[2][2][2] = {};
      for (int l = 0; l < 2; ++l)
        for (int i = 0; i < np; ++i)
          if (preds[i] == 2 || preds[i] == l) {
            mvds[l][i][0] = r.se();
            mvds[l][i][1] = r.se();
          }
      int mvs[2][2][2];
      bool hasmv[2][2] = {};
      for (int l = 0; l < 2; ++l)
        for (int i = 0; i < np; ++i) {
          if (refs[l][i] < 0) continue;
          cur_z = xy_to_z(parts[i].bx4, parts[i].by4);
          int px, py;
          mv_pred(parts[i].bx4, parts[i].by4, parts[i].w4, parts[i].h4,
                  refs[l][i], kind, i, l, &px, &py);
          mvs[l][i][0] = px + mvds[l][i][0];
          mvs[l][i][1] = py + mvds[l][i][1];
          hasmv[l][i] = true;
          store_part_mv(parts[i].bx4, parts[i].by4, parts[i].w4, parts[i].h4,
                        refs[l][i], refp(l, refs[l][i]),
                        mvs[l][i][0], mvs[l][i][1], l);
        }
      for (int i = 0; i < np; ++i) {
        PredBlk p0, p1;
        bool h0 = refs[0][i] >= 0, h1 = refs[1][i] >= 0;
        if (h0)
          fetch_pred(0, refs[0][i], parts[i].bx4, parts[i].by4, parts[i].w4,
                     parts[i].h4, mvs[0][i][0], mvs[0][i][1], p0);
        if (h1)
          fetch_pred(1, refs[1][i], parts[i].bx4, parts[i].by4, parts[i].w4,
                     parts[i].h4, mvs[1][i][0], mvs[1][i][1], p1);
        combine_store(predY, predU, predV, parts[i].bx4, parts[i].by4,
                      parts[i].w4, parts[i].h4, h0 ? &p0 : nullptr,
                      h1 ? &p1 : nullptr, refs[0][i], refs[1][i]);
      }
      (void)hasmv;
    } else {  // B_8x8
      int sub_types[4];
      for (int b = 0; b < 4; ++b) {
        sub_types[b] = r.ue();
        if (sub_types[b] > 12) throw DecodeError("bad B sub_mb_type");
      }
      // direct sub-blocks derive/store both lists first, in order
      for (int b = 0; b < 4; ++b) {
        int pm, ns;
        const Part* sp;
        b_sub(sub_types[b], &pm, &sp, &ns);
        if (pm == -1) {
          cur_z = xy_to_z((b & 1) * 2, (b >> 1) * 2);
          decode_direct_8x8(b, predY, predU, predV);
        }
      }
      int refs[2][4] = {{-1, -1, -1, -1}, {-1, -1, -1, -1}};
      for (int l = 0; l < 2; ++l)
        for (int b = 0; b < 4; ++b) {
          int pm, ns;
          const Part* sp;
          b_sub(sub_types[b], &pm, &sp, &ns);
          if (pm == 2 || pm == l) refs[l][b] = read_te(r, n_act[l] - 1);
        }
      // mvds read in (l, b, sp) order, then derive/store in the same order
      int submv[2][4][4][2];
      int mvd_list[2][16][4];  // per l: (b, sp_index, mvdx, mvdy)
      int nmvd[2] = {0, 0};
      for (int l = 0; l < 2; ++l)
        for (int b = 0; b < 4; ++b) {
          int pm, ns;
          const Part* sp;
          b_sub(sub_types[b], &pm, &sp, &ns);
          if (pm == -1 || !(pm == 2 || pm == l)) continue;
          for (int s = 0; s < ns; ++s) {
            mvd_list[l][nmvd[l]][0] = b;
            mvd_list[l][nmvd[l]][1] = s;
            mvd_list[l][nmvd[l]][2] = r.se();
            mvd_list[l][nmvd[l]][3] = r.se();
            ++nmvd[l];
          }
        }
      for (int l = 0; l < 2; ++l)
        for (int i = 0; i < nmvd[l]; ++i) {
          int b = mvd_list[l][i][0], s = mvd_list[l][i][1];
          int pm, ns;
          const Part* sp;
          b_sub(sub_types[b], &pm, &sp, &ns);
          int bx4 = (b & 1) * 2 + sp[s].bx4;
          int by4 = (b >> 1) * 2 + sp[s].by4;
          cur_z = xy_to_z(bx4, by4);
          int px, py;
          mv_pred(bx4, by4, sp[s].w4, sp[s].h4, refs[l][b], 0, 0, l, &px, &py);
          submv[l][b][s][0] = px + mvd_list[l][i][2];
          submv[l][b][s][1] = py + mvd_list[l][i][3];
          store_part_mv(bx4, by4, sp[s].w4, sp[s].h4, refs[l][b],
                        refp(l, refs[l][b]),
                        submv[l][b][s][0], submv[l][b][s][1], l);
        }
      for (int b = 0; b < 4; ++b) {
        int pm, ns;
        const Part* sp;
        b_sub(sub_types[b], &pm, &sp, &ns);
        if (pm == -1) continue;
        for (int s = 0; s < ns; ++s) {
          int bx4 = (b & 1) * 2 + sp[s].bx4;
          int by4 = (b >> 1) * 2 + sp[s].by4;
          PredBlk p0, p1;
          bool h0 = refs[0][b] >= 0, h1 = refs[1][b] >= 0;
          if (h0)
            fetch_pred(0, refs[0][b], bx4, by4, sp[s].w4, sp[s].h4,
                       submv[0][b][s][0], submv[0][b][s][1], p0);
          if (h1)
            fetch_pred(1, refs[1][b], bx4, by4, sp[s].w4, sp[s].h4,
                       submv[1][b][s][0], submv[1][b][s][1], p1);
          combine_store(predY, predU, predV, bx4, by4, sp[s].w4, sp[s].h4,
                        h0 ? &p0 : nullptr, h1 ? &p1 : nullptr, refs[0][b],
                        refs[1][b]);
        }
      }
      tf8_ok = true;
      for (int b = 0; b < 4; ++b)
        tf8_ok &= ((sub_types[b] == 0 && sps->direct_8x8_inference) ||
                   (sub_types[b] >= 1 && sub_types[b] <= 3));
    }
    cur_z = 16;
    inter_residual(r, mbx, mby, predY, predU, predV, tf8_ok);
  }

  // -- CABAC MB layer (parse via CabacSlice; defined after it) ------------
  void decode_mb_cabac(CabacSlice& cb, int mb_idx);
  void decode_intra_mb_cabac(CabacSlice& cb, int mbx, int mby, int imb);
  void decode_ipcm_cabac(CabacSlice& cb, int mbx, int mby);
  void qp_delta_cabac(CabacSlice& cb, int mbx, int mby, int cbp, bool always);
  bool luma4_residual_cabac(CabacSlice& cb, int k, int cat, int* blk);
  void decode_i4x4_cabac(CabacSlice& cb, int mbx, int mby);
  void decode_i8x8_cabac(CabacSlice& cb, int mbx, int mby);
  void decode_i16_cabac(CabacSlice& cb, int mbx, int mby, int k);
  void decode_chroma_cabac(CabacSlice& cb, int mbx, int mby, int chroma_mode,
                           int cbp_chroma, bool intra);
  void part_motion_cabac(CabacSlice& cb, int l, int bx4, int by4, int w4_,
                         int h4_, int ref_idx, int kind, int part_i, int* mvx,
                         int* mvy);
  void decode_p_mb_cabac(CabacSlice& cb, int mbx, int mby, int mb_type);
  void decode_b_mb_cabac(CabacSlice& cb, int mbx, int mby, int mb_type);
  void inter_residual_cabac(CabacSlice& cb, int mbx, int mby, int* predY,
                            int* predU, int* predV, bool tf8_ok);
};

void SliceCtx::decode_skip_mb(int mb_idx) {
  if (h->slice_type == SLICE_B)
    decode_b_skip(mb_idx);
  else
    decode_p_skip(mb_idx);
}

}  // namespace h264

namespace h264 {

// ---------------------------------------------------------------------------
// CABAC macroblock-layer parser (h264_cabac.py:133-552 CabacSlice)
// ---------------------------------------------------------------------------

// ctxIdxOffset deltas per ctxBlockCat (h264_cabac.py:39-41)
static const int CBF_OFF[5] = {0, 4, 8, 12, 16};
static const int SIG_OFF[5] = {0, 15, 29, 44, 47};
static const int ABS_OFF[5] = {0, 10, 20, 30, 39};

struct CabacSlice {
  CabacEngine e;
  SliceCtx* sl;
  Picture* pic;
  const SliceHeader* h;
  int prev_qp_delta_nz = 0;

  // PAFF coded fields select the field residual context blocks
  // (h264_cabac.py CabacSlice.field_pic)
  bool field = false;

  CabacSlice(SliceCtx* sl_, const uint8_t* rbsp, size_t n,
             const SliceHeader* h_)
      : sl(sl_), pic(sl_->pic), h(h_) {
    field = pic->is_field_pic;
    e.init_ctx(h->slice_type == SLICE_I, h->cabac_init_idc, h->slice_qp);
    e.start(rbsp, n, h->data_bit_pos);
  }

  bool mb_nbr(int mbx, int mby, int* nx, int* ny) const {
    if (mbx < 0 || mby < 0) return false;
    if (!sl->mb_avail(mbx, mby)) return false;
    *nx = mbx;
    *ny = mby;
    return true;
  }

  int mb_skip_flag(int mbx, int mby) {
    int base = h->slice_type == SLICE_P ? 11 : 24;
    int ctx = 0;
    int nx, ny;
    if (mb_nbr(mbx - 1, mby, &nx, &ny) && !pic->mb_skip[pic->mbi(nx, ny)])
      ++ctx;
    if (mb_nbr(mbx, mby - 1, &nx, &ny) && !pic->mb_skip[pic->mbi(nx, ny)])
      ++ctx;
    return e.decision(base + ctx);
  }

  int intra_mb_type(int ctx_base, bool intra_slice, int mbx, int mby) {
    // h264_cabac.py:169-196
    int base = ctx_base;
    if (intra_slice) {
      int ctx = 0;
      int nx, ny;
      if (mb_nbr(mbx - 1, mby, &nx, &ny)) {
        int cls = pic->mb_class[pic->mbi(nx, ny)];
        if (cls == MB_I16 || cls == MB_IPCM) ++ctx;
      }
      if (mb_nbr(mbx, mby - 1, &nx, &ny)) {
        int cls = pic->mb_class[pic->mbi(nx, ny)];
        if (cls == MB_I16 || cls == MB_IPCM) ++ctx;
      }
      if (e.decision(base + ctx) == 0) return 0;
      base += 2;
    } else {
      if (e.decision(base) == 0) return 0;
    }
    if (e.terminate()) return 25;
    int t = 1;
    t += 12 * e.decision(base + 1);
    if (e.decision(base + 2))
      t += 4 + 4 * e.decision(base + 2 + (intra_slice ? 1 : 0));
    int off = 3 + (intra_slice ? 1 : 0);
    t += 2 * e.decision(base + off);
    t += e.decision(base + 3 + (intra_slice ? 2 : 0));
    return t;
  }

  int mb_type_i(int mbx, int mby) { return intra_mb_type(3, true, mbx, mby); }

  int mb_type_p(int mbx, int mby) {
    if (e.decision(14)) return 5 + intra_mb_type(17, false, mbx, mby);
    if (e.decision(15) == 0) return 3 * e.decision(16);
    return 2 - e.decision(17);
  }

  int mb_type_b(int mbx, int mby) {
    // h264_cabac.py:209-233
    int ctx = 0;
    int nx, ny;
    if (mb_nbr(mbx - 1, mby, &nx, &ny) && !pic->mb_bdirect[pic->mbi(nx, ny)])
      ++ctx;
    if (mb_nbr(mbx, mby - 1, &nx, &ny) && !pic->mb_bdirect[pic->mbi(nx, ny)])
      ++ctx;
    if (!e.decision(27 + ctx)) return 0;
    if (!e.decision(27 + 3)) return 1 + e.decision(27 + 5);
    int bits = e.decision(27 + 4) << 3;
    bits |= e.decision(27 + 5) << 2;
    bits |= e.decision(27 + 5) << 1;
    bits |= e.decision(27 + 5);
    if (bits < 8) return bits + 3;
    if (bits == 13) return 23 + intra_mb_type(32, false, mbx, mby);
    if (bits == 14) return 11;
    if (bits == 15) return 22;
    bits = (bits << 1) | e.decision(27 + 5);
    return bits - 4;
  }

  int sub_mb_type_p() {
    if (e.decision(21)) return 0;
    if (!e.decision(22)) return 1;
    return e.decision(23) ? 2 : 3;
  }

  int sub_mb_type_b() {
    // h264_cabac.py:243-256
    if (!e.decision(36)) return 0;
    if (!e.decision(37)) return 1 + e.decision(39);
    int t = 3;
    if (e.decision(38)) {
      if (e.decision(39)) return 11 + e.decision(39);
      t += 4;
    }
    t += 2 * e.decision(39);
    t += e.decision(39);
    return t;
  }

  int intra_pred_mode(int pred) {
    if (e.decision(68)) return pred;
    int rem = e.decision(69);
    rem |= e.decision(69) << 1;
    rem |= e.decision(69) << 2;
    return rem < pred ? rem : rem + 1;
  }

  int chroma_pred_mode(int mbx, int mby) {
    int ctx = 0;
    int nx, ny;
    if (mb_nbr(mbx - 1, mby, &nx, &ny) &&
        pic->mb_chroma_mode[pic->mbi(nx, ny)] != 0)
      ++ctx;
    if (mb_nbr(mbx, mby - 1, &nx, &ny) &&
        pic->mb_chroma_mode[pic->mbi(nx, ny)] != 0)
      ++ctx;
    if (!e.decision(64 + ctx)) return 0;
    if (!e.decision(67)) return 1;
    return e.decision(67) ? 3 : 2;
  }

  int transform_size_8x8(int mbx, int mby) {
    int ctx = 0;
    int nx, ny;
    if (mb_nbr(mbx - 1, mby, &nx, &ny) && pic->mb_tf8[pic->mbi(nx, ny)]) ++ctx;
    if (mb_nbr(mbx, mby - 1, &nx, &ny) && pic->mb_tf8[pic->mbi(nx, ny)]) ++ctx;
    return e.decision(399 + ctx);
  }

  int cbp_luma_bit(int mbx, int mby, int b, int cur_bits) {
    // h264_cabac.py:289-313
    auto cond = [&](int nmbx, int nmby, int nb, bool within) -> int {
      if (within) return (cur_bits & (1 << nb)) ? 0 : 1;
      int nx, ny;
      if (!mb_nbr(nmbx, nmby, &nx, &ny)) return 0;
      if (pic->mb_class[pic->mbi(nx, ny)] == MB_IPCM) return 0;
      return ((int)(uint8_t)pic->mb_cbp[pic->mbi(nx, ny)] & (1 << nb)) ? 0 : 1;
    };
    int ca = (b & 1) ? cond(0, 0, b - 1, true) : cond(mbx - 1, mby, b + 1, false);
    int cb = (b & 2) ? cond(0, 0, b - 2, true) : cond(mbx, mby - 1, b + 2, false);
    return e.decision(73 + ca + 2 * cb);
  }

  int cbp(int mbx, int mby) {
    int bits = 0;
    for (int b = 0; b < 4; ++b) bits |= cbp_luma_bit(mbx, mby, b, bits) << b;
    auto cchroma = [&](int nmbx, int nmby, bool want2) -> int {
      int nx, ny;
      if (!mb_nbr(nmbx, nmby, &nx, &ny)) return 0;
      if (pic->mb_class[pic->mbi(nx, ny)] == MB_IPCM) return 1;
      int cc = (int)(uint8_t)pic->mb_cbp[pic->mbi(nx, ny)] >> 4;
      return (want2 ? cc == 2 : cc != 0) ? 1 : 0;
    };
    int ca = cchroma(mbx - 1, mby, false);
    int cb = cchroma(mbx, mby - 1, false);
    int chroma = 0;
    if (e.decision(77 + ca + 2 * cb)) {
      ca = cchroma(mbx - 1, mby, true);
      cb = cchroma(mbx, mby - 1, true);
      chroma = e.decision(81 + ca + 2 * cb) ? 2 : 1;
    }
    return bits | (chroma << 4);
  }

  int mb_qp_delta() {
    if (!e.decision(60 + (prev_qp_delta_nz ? 1 : 0))) {
      prev_qp_delta_nz = 0;
      return 0;
    }
    int k = 1;
    if (e.decision(62)) {
      k = 2;
      while (k < 90 && e.decision(63)) ++k;
    }
    prev_qp_delta_nz = 1;
    return (k & 1) ? (k + 1) >> 1 : -(k >> 1);
  }

  int ref_idx(int l, int bx4, int by4) {
    // h264_cabac.py:356-378
    bool is_b = h->slice_type == SLICE_B;
    int gx0 = sl->cur_mbx * 4 + bx4;
    int gy0 = sl->cur_mby * 4 + by4;
    int ctx = 0;
    SliceCtx::MvRef A = sl->mv_ref_at(gx0 - 1, gy0, l);
    if (A.avail && A.ref > 0 &&
        !(is_b && pic->cell_direct[pic->c4(gx0 - 1, gy0)]))
      ctx += 1;
    SliceCtx::MvRef B = sl->mv_ref_at(gx0, gy0 - 1, l);
    if (B.avail && B.ref > 0 &&
        !(is_b && pic->cell_direct[pic->c4(gx0, gy0 - 1)]))
      ctx += 2;
    int ref = 0;
    while (e.decision(54 + ctx)) {
      if (++ref > 32) throw DecodeError("bad ref_idx");
      ctx = (ctx >> 2) + 4;
    }
    return ref;
  }

  int mvd_nbr_abs(int l, int gx, int gy, int comp) const {
    // h264_cabac.py:380-394
    if (gx < 0 || gy < 0 || gx >= pic->n4w || gy >= pic->n4h) return 0;
    int mbx = gx >> 2, mby = gy >> 2;
    if (mbx == sl->cur_mbx && mby == sl->cur_mby) {
      if (xy_to_z(gx & 3, gy & 3) >= sl->cur_z) return 0;
    } else if (pic->slice_of(pic->mbi(mbx, mby)) != sl->sid) {
      return 0;
    } else if (!(mby < sl->cur_mby ||
                 (mby == sl->cur_mby && mbx < sl->cur_mbx))) {
      return 0;
    }
    return std::abs((int)pic->mvd[2 * pic->mvix(l, gy, gx) + comp]);
  }

  int mvd(int l, int bx4, int by4, int comp) {
    // h264_cabac.py:396-423
    int gx0 = sl->cur_mbx * 4 + bx4;
    int gy0 = sl->cur_mby * 4 + by4;
    int amvd = mvd_nbr_abs(l, gx0 - 1, gy0, comp) +
               mvd_nbr_abs(l, gx0, gy0 - 1, comp);
    int base = comp == 0 ? 40 : 47;
    int ctx = amvd < 3 ? 0 : (amvd > 32 ? 2 : 1);
    if (!e.decision(base + ctx)) return 0;
    int v = 1;
    ctx = 3;
    while (v < 9 && e.decision(base + ctx)) {
      if (v < 4) ++ctx;
      ++v;
    }
    if (v >= 9) {
      int k = 3;
      while (e.bypass()) {
        v += 1 << k;
        if (++k > 24) throw DecodeError("bad mvd");
      }
      while (k) {
        --k;
        v += e.bypass() << k;
      }
    }
    return e.bypass() ? -v : v;
  }

  // condTermFlagN for coded_block_flag (h264_cabac.py:427-482)
  int cbf_nbr(int cat, int i0, int i1, int i2, int side) {
    bool cur_intra = pic->is_intra_mb(sl->cur_mbx, sl->cur_mby);
    if (cat == 0) {
      int nmbx = sl->cur_mbx - (side == 0 ? 1 : 0);
      int nmby = sl->cur_mby - (side == 0 ? 0 : 1);
      int nx, ny;
      if (!mb_nbr(nmbx, nmby, &nx, &ny)) return cur_intra ? 1 : 0;
      int cls = pic->mb_class[pic->mbi(nx, ny)];
      if (cls == MB_IPCM) return 1;
      if (cls != MB_I16) return 0;
      return (pic->mb_dc_flag[pic->mbi(nx, ny)] & 1) ? 1 : 0;
    }
    if (cat == 3) {
      int comp = i0;
      int nmbx = sl->cur_mbx - (side == 0 ? 1 : 0);
      int nmby = sl->cur_mby - (side == 0 ? 0 : 1);
      int nx, ny;
      if (!mb_nbr(nmbx, nmby, &nx, &ny)) return cur_intra ? 1 : 0;
      int cls = pic->mb_class[pic->mbi(nx, ny)];
      if (cls == MB_IPCM) return 1;
      return (pic->mb_dc_flag[pic->mbi(nx, ny)] & (2 << comp)) ? 1 : 0;
    }
    if (cat == 1 || cat == 2) {
      int gx = i0, gy = i1;
      int ngx = gx - (side == 0 ? 1 : 0);
      int ngy = gy - (side == 0 ? 0 : 1);
      if (ngx < 0 || ngy < 0) return cur_intra ? 1 : 0;
      int nmbx = ngx >> 2, nmby = ngy >> 2;
      if (!sl->mb_avail(nmbx, nmby)) return cur_intra ? 1 : 0;
      int cls = pic->mb_class[pic->mbi(nmbx, nmby)];
      if (cls == MB_IPCM) return 1;
      return pic->cbf_y[pic->c4(ngx, ngy)];
    }
    // cat 4: chroma AC
    int comp = i0, cx = i1, cy = i2;
    int ncx = cx - (side == 0 ? 1 : 0);
    int ncy = cy - (side == 0 ? 0 : 1);
    if (ncx < 0 || ncy < 0) return cur_intra ? 1 : 0;
    int nmbx = ncx >> 1, nmby = ncy >> 1;
    if (!sl->mb_avail(nmbx, nmby)) return cur_intra ? 1 : 0;
    int cls = pic->mb_class[pic->mbi(nmbx, nmby)];
    if (cls == MB_IPCM) return 1;
    return pic->cbf_c[pic->cc(comp, ncx, ncy)];
  }

  // parse one residual block (h264_cabac.py:484-549); returns false when
  // coded_block_flag is 0 (cat != 5)
  bool residual(int cat, int maxcoeff, int i0, int i1, int i2, int* coeffs) {
    if (cat != 5) {
      int inc = cbf_nbr(cat, i0, i1, i2, 0) + 2 * cbf_nbr(cat, i0, i1, i2, 1);
      if (!e.decision(85 + CBF_OFF[cat] + inc)) return false;
    }
    int sig_base, last_base, abs_base;
    if (cat == 5) {
      sig_base = field ? 436 : 402;
      last_base = field ? 451 : 417;
      abs_base = 426;
    } else {
      sig_base = (field ? 277 : 105) + SIG_OFF[cat];
      last_base = (field ? 338 : 166) + SIG_OFF[cat];
      abs_base = 227 + ABS_OFF[cat];
    }
    const uint8_t* sig8 = field ? kSigCoeff8x8Field : kSigCoeff8x8;
    std::memset(coeffs, 0, maxcoeff * sizeof(int));
    bool sig[64] = {};
    int last_idx = maxcoeff - 1;
    bool broke = false;
    for (int i = 0; i < maxcoeff - 1; ++i) {
      int s_inc, l_inc;
      if (cat == 5) {
        s_inc = sig8[i];
        l_inc = kLastCoeff8x8[i];
      } else if (cat == 3) {
        s_inc = l_inc = std::min(i, 2);
      } else {
        s_inc = l_inc = i;
      }
      if (e.decision(sig_base + s_inc)) {
        sig[i] = true;
        if (e.decision(last_base + l_inc)) {
          last_idx = i;
          broke = true;
          break;
        }
      }
    }
    if (!broke) sig[maxcoeff - 1] = true;
    if (last_idx == maxcoeff - 1 && !sig[maxcoeff - 1])
      sig[maxcoeff - 1] = true;
    int num_eq1 = 0, num_gt1 = 0;
    for (int pos = last_idx; pos >= 0; --pos) {
      if (!sig[pos]) continue;
      int ctx0 = num_gt1 ? 0 : std::min(4, 1 + num_eq1);
      int level;
      if (!e.decision(abs_base + ctx0)) {
        level = 1;
      } else {
        int ctxn = abs_base + 5 + std::min(4 - (cat == 3 ? 1 : 0), num_gt1);
        level = 2;
        while (level < 15 && e.decision(ctxn)) ++level;
        if (level == 15) {
          int k = 0;
          while (e.bypass()) {
            level += 1 << k;
            if (++k > 30) throw DecodeError("bad coeff level");
          }
          while (k) {
            --k;
            level += e.bypass() << k;
          }
        }
      }
      if (level > 1)
        ++num_gt1;
      else
        ++num_eq1;
      coeffs[pos] = e.bypass() ? -level : level;
    }
    return true;
  }

  int end_of_slice() { return e.terminate(); }
};

// ---------------------------------------------------------------------------
// SliceCtx CABAC-path methods (h264_ref.py:2119-2552)
// ---------------------------------------------------------------------------

void SliceCtx::decode_mb_cabac(CabacSlice& cb, int mb_idx) {
  int mbx = mb_idx % pic->mb_w, mby = mb_idx / pic->mb_w;
  mark_mb(mbx, mby);
  cur_mbx = mbx;
  cur_mby = mby;
  cur_z = 0;
  int st = h->slice_type;
  if (st == SLICE_P) {
    int mb_type = cb.mb_type_p(mbx, mby);
    if (mb_type < 5)
      decode_p_mb_cabac(cb, mbx, mby, mb_type);
    else
      decode_intra_mb_cabac(cb, mbx, mby, mb_type - 5);
  } else if (st == SLICE_B) {
    int mb_type = cb.mb_type_b(mbx, mby);
    if (mb_type < 23)
      decode_b_mb_cabac(cb, mbx, mby, mb_type);
    else
      decode_intra_mb_cabac(cb, mbx, mby, mb_type - 23);
  } else {
    int mb_type = cb.mb_type_i(mbx, mby);
    decode_intra_mb_cabac(cb, mbx, mby, mb_type);
  }
}

void SliceCtx::decode_intra_mb_cabac(CabacSlice& cb, int mbx, int mby,
                                     int imb) {
  if (imb == 25) {
    decode_ipcm_cabac(cb, mbx, mby);
    return;
  }
  if (imb == 0) {
    int tf8 = 0;
    if (pps->transform_8x8_mode) tf8 = cb.transform_size_8x8(mbx, mby);
    if (tf8)
      decode_i8x8_cabac(cb, mbx, mby);
    else
      decode_i4x4_cabac(cb, mbx, mby);
    return;
  }
  decode_i16_cabac(cb, mbx, mby, imb - 1);
}

void SliceCtx::decode_ipcm_cabac(CabacSlice& cb, int mbx, int mby) {
  // h264_ref.py:2158-2189
  CabacEngine& e = cb.e;
  if (e.pos & 7) e.pos += 8 - (e.pos & 7);
  size_t p = e.pos >> 3;
  for (int yy = 0; yy < 16; ++yy)
    for (int xx = 0; xx < 16; ++xx)
      pic->Y[(size_t)(mby * 16 + yy) * pic->w + mbx * 16 + xx] =
          p < e.size ? e.data[p++] : (++p, 0);
  for (int comp = 0; comp < 2; ++comp) {
    uint8_t* plane = comp ? pic->V.data() : pic->U.data();
    for (int yy = 0; yy < 8; ++yy)
      for (int xx = 0; xx < 8; ++xx)
        plane[(size_t)(mby * 8 + yy) * pic->cw + mbx * 8 + xx] =
            p < e.size ? e.data[p++] : (++p, 0);
  }
  e.pos = p << 3;
  // re-initialise the arithmetic engine (9.3.1.2)
  e.range_ = 510;
  int off = 0;
  for (int i = 0; i < 9; ++i) off = (off << 1) | e.bit();
  e.offset = off;
  set_ipcm_state(mbx, mby);
  cb.prev_qp_delta_nz = 0;
}

void SliceCtx::qp_delta_cabac(CabacSlice& cb, int mbx, int mby, int cbp,
                              bool always) {
  size_t mi = pic->mbi(mbx, mby);
  if (cbp || always)
    qp = ((qp + cb.mb_qp_delta()) % 52 + 52) % 52;
  else
    cb.prev_qp_delta_nz = 0;
  pic->mb_qp[mi] = (int8_t)qp;
  pic->mb_cbp[mi] = (int8_t)cbp;
}

bool SliceCtx::luma4_residual_cabac(CabacSlice& cb, int k, int cat,
                                    int* blk) {
  // h264_ref.py:2200-2213
  int gx = cur_mbx * 4 + kZtoX[k];
  int gy = cur_mby * 4 + kZtoY[k];
  bool ok = cb.residual(cat, cat == 1 ? 15 : 16, gx, gy, 0, blk);
  if (!ok) {
    pic->cbf_y[pic->c4(gx, gy)] = 0;
    pic->nnz_y[pic->c4(gx, gy)] = 0;
    return false;
  }
  pic->cbf_y[pic->c4(gx, gy)] = 1;
  int nz = 0;
  int n = cat == 1 ? 15 : 16;
  for (int i = 0; i < n; ++i) nz += blk[i] != 0;
  pic->nnz_y[pic->c4(gx, gy)] = (int8_t)nz;
  return true;
}

void SliceCtx::decode_i4x4_cabac(CabacSlice& cb, int mbx, int mby) {
  // h264_ref.py:2215-2240
  size_t mi = pic->mbi(mbx, mby);
  pic->mb_class[mi] = MB_I4;
  int modes[16];
  int gx0 = mbx * 4, gy0 = mby * 4;
  for (int k = 0; k < 16; ++k) {
    int gx = gx0 + kZtoX[k], gy = gy0 + kZtoY[k];
    int ma = i4_mode_at(gx - 1, gy, k, mbx, mby);
    int mb_ = i4_mode_at(gx, gy - 1, k, mbx, mby);
    int pred = (ma == -1000 || mb_ == -1000) ? 2 : std::min(ma, mb_);
    int mode = cb.intra_pred_mode(pred);
    modes[k] = mode;
    pic->i4_modes[pic->c4(gx, gy)] = (int8_t)mode;
  }
  int chroma_mode = cb.chroma_pred_mode(mbx, mby);
  pic->mb_chroma_mode[mi] = (int8_t)chroma_mode;
  int cbp = cb.cbp(mbx, mby);
  int cbp_luma = cbp & 15, cbp_chroma = cbp >> 4;
  qp_delta_cabac(cb, mbx, mby, cbp, false);
  int coeffs[16][16];
  bool has[16] = {};
  for (int k = 0; k < 16; ++k)
    if (cbp_luma & (1 << (k >> 2)))
      has[k] = luma4_residual_cabac(cb, k, 2, coeffs[k]);
  for (int k = 0; k < 16; ++k)
    recon_i4_block(mbx, mby, k, modes[k], has[k] ? coeffs[k] : nullptr);
  decode_chroma_cabac(cb, mbx, mby, chroma_mode, cbp_chroma, true);
}

void SliceCtx::decode_i8x8_cabac(CabacSlice& cb, int mbx, int mby) {
  // h264_ref.py:2242-2274
  size_t mi = pic->mbi(mbx, mby);
  pic->mb_class[mi] = MB_I8;
  pic->mb_tf8[mi] = 1;
  int modes[4];
  int gx0 = mbx * 4, gy0 = mby * 4;
  for (int b = 0; b < 4; ++b) {
    int bx = (b & 1) * 2, by = (b >> 1) * 2;
    int gx = gx0 + bx, gy = gy0 + by;
    int z = xy_to_z(bx, by);
    int ma = i4_mode_at(gx - 1, gy, z, mbx, mby);
    int mb_ = i4_mode_at(gx, gy - 1, z, mbx, mby);
    int pred = (ma == -1000 || mb_ == -1000) ? 2 : std::min(ma, mb_);
    int mode = cb.intra_pred_mode(pred);
    modes[b] = mode;
    for (int dy = 0; dy < 2; ++dy)
      for (int dx = 0; dx < 2; ++dx)
        pic->i4_modes[pic->c4(gx + dx, gy + dy)] = (int8_t)mode;
  }
  int chroma_mode = cb.chroma_pred_mode(mbx, mby);
  pic->mb_chroma_mode[mi] = (int8_t)chroma_mode;
  int cbp = cb.cbp(mbx, mby);
  int cbp_luma = cbp & 15, cbp_chroma = cbp >> 4;
  qp_delta_cabac(cb, mbx, mby, cbp, false);
  int coeffs[4][64];
  bool has[4] = {};
  for (int b = 0; b < 4; ++b) {
    int bx = (b & 1) * 2, by = (b >> 1) * 2;
    if (cbp_luma & (1 << b)) {
      cb.residual(5, 64, 0, 0, 0, coeffs[b]);
      has[b] = true;
      int nz = 0;
      for (int i = 0; i < 64; ++i) nz += coeffs[b][i] != 0;
      for (int dy = 0; dy < 2; ++dy)
        for (int dx = 0; dx < 2; ++dx) {
          pic->cbf_y[pic->c4(gx0 + bx + dx, gy0 + by + dy)] = 1;
          pic->nnz_y[pic->c4(gx0 + bx + dx, gy0 + by + dy)] = (int8_t)nz;
        }
    }
  }
  for (int b = 0; b < 4; ++b)
    recon_i8_block(mbx, mby, b, modes[b], has[b] ? coeffs[b] : nullptr);
  decode_chroma_cabac(cb, mbx, mby, chroma_mode, cbp_chroma, true);
}

void SliceCtx::decode_i16_cabac(CabacSlice& cb, int mbx, int mby, int k) {
  // h264_ref.py:2276-2294
  size_t mi = pic->mbi(mbx, mby);
  int pred_mode = k % 4;
  int cbp_chroma = (k / 4) % 3;
  int cbp_luma = k >= 12 ? 15 : 0;
  pic->mb_class[mi] = MB_I16;
  int chroma_mode = cb.chroma_pred_mode(mbx, mby);
  pic->mb_chroma_mode[mi] = (int8_t)chroma_mode;
  qp_delta_cabac(cb, mbx, mby, cbp_luma | (cbp_chroma << 4), true);
  int dc_scan[16];
  bool has_dc = cb.residual(0, 16, 0, 0, 0, dc_scan);
  if (has_dc) pic->mb_dc_flag[mi] |= 1;
  if (!has_dc) std::memset(dc_scan, 0, sizeof(dc_scan));
  int coeffs[16][15];
  bool has[16] = {};
  if (cbp_luma)
    for (int kk = 0; kk < 16; ++kk)
      has[kk] = luma4_residual_cabac(cb, kk, 1, coeffs[kk]);
  const int* cptr[16];
  for (int kk = 0; kk < 16; ++kk) cptr[kk] = has[kk] ? coeffs[kk] : nullptr;
  recon_i16(mbx, mby, pred_mode, dc_scan, cptr);
  decode_chroma_cabac(cb, mbx, mby, chroma_mode, cbp_chroma, true);
}

void SliceCtx::decode_chroma_cabac(CabacSlice& cb, int mbx, int mby,
                                   int chroma_mode, int cbp_chroma,
                                   bool intra) {
  // h264_ref.py:2296-2320
  size_t mi = pic->mbi(mbx, mby);
  int dc_scan[2][4] = {{0, 0, 0, 0}, {0, 0, 0, 0}};
  if (cbp_chroma) {
    for (int comp = 0; comp < 2; ++comp) {
      int blk[4];
      if (cb.residual(3, 4, comp, 0, 0, blk)) {
        for (int i = 0; i < 4; ++i) dc_scan[comp][i] = blk[i];
        pic->mb_dc_flag[mi] |= 2 << comp;
      }
    }
  }
  int coeffs[2][4][15];
  bool has[2][4] = {};
  if (cbp_chroma & 2) {
    for (int comp = 0; comp < 2; ++comp)
      for (int b = 0; b < 4; ++b) {
        int cx = mbx * 2 + (b & 1), cy = mby * 2 + (b >> 1);
        bool ok = cb.residual(4, 15, comp, cx, cy, coeffs[comp][b]);
        has[comp][b] = ok;
        if (!ok) {
          pic->cbf_c[pic->cc(comp, cx, cy)] = 0;
          pic->nnz_c[pic->cc(comp, cx, cy)] = 0;
        } else {
          pic->cbf_c[pic->cc(comp, cx, cy)] = 1;
          int nz = 0;
          for (int i = 0; i < 15; ++i) nz += coeffs[comp][b][i] != 0;
          pic->nnz_c[pic->cc(comp, cx, cy)] = (int8_t)nz;
        }
      }
  }
  const int* cptr[2][4];
  for (int comp = 0; comp < 2; ++comp)
    for (int b = 0; b < 4; ++b)
      cptr[comp][b] = has[comp][b] ? coeffs[comp][b] : nullptr;
  recon_chroma(mbx, mby, chroma_mode, dc_scan, cptr, intra);
}

void SliceCtx::part_motion_cabac(CabacSlice& cb, int l, int bx4, int by4,
                                 int w4_, int h4_, int ref_idx, int kind,
                                 int part_i, int* mvx, int* mvy) {
  // h264_ref.py:2328-2341
  cur_z = xy_to_z(bx4, by4);
  int mvdx = cb.mvd(l, bx4, by4, 0);
  int mvdy = cb.mvd(l, bx4, by4, 1);
  int px, py;
  mv_pred(bx4, by4, w4_, h4_, ref_idx, kind, part_i, l, &px, &py);
  *mvx = px + mvdx;
  *mvy = py + mvdy;
  const std::vector<Picture*>& refs = l == 0 ? ref_l0 : ref_l1;
  if (ref_idx < 0 || (size_t)ref_idx >= refs.size())
    throw DecodeError("reference index out of range");
  store_part_mv(bx4, by4, w4_, h4_, ref_idx, refs[ref_idx], *mvx, *mvy, l);
  store_part_mvd(bx4, by4, w4_, h4_, l, mvdx, mvdy);
}

void SliceCtx::decode_p_mb_cabac(CabacSlice& cb, int mbx, int mby,
                                 int mb_type) {
  // h264_ref.py:2343-2387
  pic->mb_class[pic->mbi(mbx, mby)] = MB_P;
  int n0 = h->num_ref_idx[0];
  int predY[256], predU[64], predV[64];
  int gx0 = mbx * 4, gy0 = mby * 4;
  std::vector<int> sub_types;
  if (mb_type <= 2) {
    int kind, np;
    const Part* parts = p_parts(mb_type, &kind, &np);
    int refs[2];
    for (int i = 0; i < np; ++i) {
      cur_z = xy_to_z(parts[i].bx4, parts[i].by4);
      refs[i] = n0 > 1 ? cb.ref_idx(0, parts[i].bx4, parts[i].by4) : 0;
      // earlier partitions' refs are visible to later ref ctx
      for (int y = 0; y < parts[i].h4; ++y)
        for (int x = 0; x < parts[i].w4; ++x)
          pic->ref_idx[pic->mvix(0, gy0 + parts[i].by4 + y,
                                 gx0 + parts[i].bx4 + x)] = (int8_t)refs[i];
    }
    for (int i = 0; i < np; ++i) {
      int mvx, mvy;
      part_motion_cabac(cb, 0, parts[i].bx4, parts[i].by4, parts[i].w4,
                        parts[i].h4, refs[i], kind, i, &mvx, &mvy);
      mc_part(predY, predU, predV, parts[i].bx4, parts[i].by4, parts[i].w4,
              parts[i].h4, refs[i], mvx, mvy);
    }
  } else {
    sub_types.resize(4);
    for (int b = 0; b < 4; ++b) sub_types[b] = cb.sub_mb_type_p();
    int refs[4] = {0, 0, 0, 0};
    for (int b = 0; b < 4; ++b) {
      int bx0 = (b & 1) * 2, by0 = (b >> 1) * 2;
      if (mb_type == 3 && n0 > 1) {
        cur_z = xy_to_z(bx0, by0);
        refs[b] = cb.ref_idx(0, bx0, by0);
      }
      for (int y = 0; y < 2; ++y)
        for (int x = 0; x < 2; ++x)
          pic->ref_idx[pic->mvix(0, gy0 + by0 + y, gx0 + bx0 + x)] =
              (int8_t)refs[b];
    }
    for (int b = 0; b < 4; ++b) {
      int bx0 = (b & 1) * 2, by0 = (b >> 1) * 2;
      int ns;
      const Part* sp = sub_parts(sub_types[b], &ns);
      for (int s = 0; s < ns; ++s) {
        int bx4 = bx0 + sp[s].bx4, by4 = by0 + sp[s].by4;
        int mvx, mvy;
        part_motion_cabac(cb, 0, bx4, by4, sp[s].w4, sp[s].h4, refs[b], 0, 0,
                          &mvx, &mvy);
        mc_part(predY, predU, predV, bx4, by4, sp[s].w4, sp[s].h4, refs[b],
                mvx, mvy);
      }
    }
  }
  cur_z = 16;
  bool tf8_ok = mb_type <= 2;
  if (!tf8_ok) {
    tf8_ok = true;
    for (int st : sub_types) tf8_ok &= (st == 0);
  }
  inter_residual_cabac(cb, mbx, mby, predY, predU, predV, tf8_ok);
}

void SliceCtx::decode_b_mb_cabac(CabacSlice& cb, int mbx, int mby,
                                 int mb_type) {
  // h264_ref.py:2389-2488
  dc_valid = false;
  pic->mb_class[pic->mbi(mbx, mby)] = MB_B;
  const int* n_act = h->num_ref_idx;
  int predY[256], predU[64], predV[64];
  if (mb_type == 0) {  // B_Direct_16x16
    pic->mb_bdirect[pic->mbi(mbx, mby)] = 1;
    decode_direct_mb(predY, predU, predV);
    cur_z = 16;
    inter_residual_cabac(cb, mbx, mby, predY, predU, predV,
                         sps->direct_8x8_inference != 0);
    return;
  }
  bool tf8_ok = true;
  int gx0 = mbx * 4, gy0 = mby * 4;
  if (mb_type < 22) {
    int kind, preds[2], np;
    b_type(mb_type, &kind, preds, &np);
    int ng;
    const Part* parts = geom(kind, &ng);
    int refs[2][2] = {{-1, -1}, {-1, -1}};
    for (int l = 0; l < 2; ++l)
      for (int i = 0; i < np; ++i)
        if (preds[i] == 2 || preds[i] == l) {
          cur_z = xy_to_z(parts[i].bx4, parts[i].by4);
          int rr = n_act[l] > 1 ? cb.ref_idx(l, parts[i].bx4, parts[i].by4) : 0;
          refs[l][i] = rr;
          for (int y = 0; y < parts[i].h4; ++y)
            for (int x = 0; x < parts[i].w4; ++x)
              pic->ref_idx[pic->mvix(l, gy0 + parts[i].by4 + y,
                                     gx0 + parts[i].bx4 + x)] = (int8_t)rr;
        }
    int mvs[2][2][2];
    for (int l = 0; l < 2; ++l)
      for (int i = 0; i < np; ++i) {
        if (refs[l][i] < 0) continue;
        part_motion_cabac(cb, l, parts[i].bx4, parts[i].by4, parts[i].w4,
                          parts[i].h4, refs[l][i], kind, i, &mvs[l][i][0],
                          &mvs[l][i][1]);
      }
    for (int i = 0; i < np; ++i) {
      PredBlk p0, p1;
      bool h0 = refs[0][i] >= 0, h1 = refs[1][i] >= 0;
      if (h0)
        fetch_pred(0, refs[0][i], parts[i].bx4, parts[i].by4, parts[i].w4,
                   parts[i].h4, mvs[0][i][0], mvs[0][i][1], p0);
      if (h1)
        fetch_pred(1, refs[1][i], parts[i].bx4, parts[i].by4, parts[i].w4,
                   parts[i].h4, mvs[1][i][0], mvs[1][i][1], p1);
      combine_store(predY, predU, predV, parts[i].bx4, parts[i].by4,
                    parts[i].w4, parts[i].h4, h0 ? &p0 : nullptr,
                    h1 ? &p1 : nullptr, refs[0][i], refs[1][i]);
    }
  } else {  // B_8x8
    int sub_types[4];
    for (int b = 0; b < 4; ++b) {
      sub_types[b] = cb.sub_mb_type_b();
      if (sub_types[b] > 12) throw DecodeError("bad B sub_mb_type");
    }
    for (int b = 0; b < 4; ++b) {
      int pm, ns;
      const Part* sp;
      b_sub(sub_types[b], &pm, &sp, &ns);
      if (pm == -1) {
        cur_z = xy_to_z((b & 1) * 2, (b >> 1) * 2);
        decode_direct_8x8(b, predY, predU, predV);
      }
    }
    int refs[2][4] = {{-1, -1, -1, -1}, {-1, -1, -1, -1}};
    for (int l = 0; l < 2; ++l)
      for (int b = 0; b < 4; ++b) {
        int pm, ns;
        const Part* sp;
        b_sub(sub_types[b], &pm, &sp, &ns);
        if (pm == 2 || pm == l) {
          int bx0 = (b & 1) * 2, by0 = (b >> 1) * 2;
          cur_z = xy_to_z(bx0, by0);
          int rr = n_act[l] > 1 ? cb.ref_idx(l, bx0, by0) : 0;
          refs[l][b] = rr;
          for (int y = 0; y < 2; ++y)
            for (int x = 0; x < 2; ++x)
              pic->ref_idx[pic->mvix(l, gy0 + by0 + y, gx0 + bx0 + x)] =
                  (int8_t)rr;
        }
      }
    int submv[2][4][4][2];
    for (int l = 0; l < 2; ++l)
      for (int b = 0; b < 4; ++b) {
        int pm, ns;
        const Part* sp;
        b_sub(sub_types[b], &pm, &sp, &ns);
        if (pm == -1 || !(pm == 2 || pm == l)) continue;
        for (int s = 0; s < ns; ++s) {
          int bx4 = (b & 1) * 2 + sp[s].bx4;
          int by4 = (b >> 1) * 2 + sp[s].by4;
          part_motion_cabac(cb, l, bx4, by4, sp[s].w4, sp[s].h4, refs[l][b], 0,
                            0, &submv[l][b][s][0], &submv[l][b][s][1]);
        }
      }
    for (int b = 0; b < 4; ++b) {
      int pm, ns;
      const Part* sp;
      b_sub(sub_types[b], &pm, &sp, &ns);
      if (pm == -1) continue;
      for (int s = 0; s < ns; ++s) {
        int bx4 = (b & 1) * 2 + sp[s].bx4;
        int by4 = (b >> 1) * 2 + sp[s].by4;
        PredBlk p0, p1;
        bool h0 = refs[0][b] >= 0, h1 = refs[1][b] >= 0;
        if (h0)
          fetch_pred(0, refs[0][b], bx4, by4, sp[s].w4, sp[s].h4,
                     submv[0][b][s][0], submv[0][b][s][1], p0);
        if (h1)
          fetch_pred(1, refs[1][b], bx4, by4, sp[s].w4, sp[s].h4,
                     submv[1][b][s][0], submv[1][b][s][1], p1);
        combine_store(predY, predU, predV, bx4, by4, sp[s].w4, sp[s].h4,
                      h0 ? &p0 : nullptr, h1 ? &p1 : nullptr, refs[0][b],
                      refs[1][b]);
      }
    }
    tf8_ok = true;
    for (int b = 0; b < 4; ++b)
      tf8_ok &= ((sub_types[b] == 0 && sps->direct_8x8_inference) ||
                 (sub_types[b] >= 1 && sub_types[b] <= 3));
  }
  cur_z = 16;
  inter_residual_cabac(cb, mbx, mby, predY, predU, predV, tf8_ok);
}

void SliceCtx::inter_residual_cabac(CabacSlice& cb, int mbx, int mby,
                                    int* predY, int* predU, int* predV,
                                    bool tf8_ok) {
  // h264_ref.py:2490-2552
  size_t mi = pic->mbi(mbx, mby);
  int cbp = cb.cbp(mbx, mby);
  int cbp_luma = cbp & 15, cbp_chroma = cbp >> 4;
  int tf8 = 0;
  if (cbp_luma && tf8_ok && pps->transform_8x8_mode)
    tf8 = cb.transform_size_8x8(mbx, mby);
  pic->mb_tf8[mi] = (int8_t)tf8;
  qp_delta_cabac(cb, mbx, mby, cbp, false);
  int gx0 = mbx * 4, gy0 = mby * 4;
  uint8_t* Y = pic->Y.data();
  int W = pic->w;
  if (tf8) {
    for (int b = 0; b < 4; ++b) {
      int bx = (b & 1) * 2, by = (b >> 1) * 2;
      int px = mbx * 16 + bx * 4, py = mby * 16 + by * 4;
      if (!(cbp_luma & (1 << b))) {
        for (int yy = 0; yy < 8; ++yy)
          for (int xx = 0; xx < 8; ++xx)
            Y[(size_t)(py + yy) * W + px + xx] =
                (uint8_t)predY[16 * (by * 4 + yy) + bx * 4 + xx];
        continue;
      }
      int scan64[64], res[64];
      cb.residual(5, 64, 0, 0, 0, scan64);
      int nz = 0;
      for (int i = 0; i < 64; ++i) nz += scan64[i] != 0;
      for (int dy = 0; dy < 2; ++dy)
        for (int dx = 0; dx < 2; ++dx) {
          pic->cbf_y[pic->c4(gx0 + bx + dx, gy0 + by + dy)] = 1;
          pic->nnz_y[pic->c4(gx0 + bx + dx, gy0 + by + dy)] = (int8_t)nz;
        }
      residual8x8(scan64, qp, 1, res);
      for (int yy = 0; yy < 8; ++yy)
        for (int xx = 0; xx < 8; ++xx)
          Y[(size_t)(py + yy) * W + px + xx] = (uint8_t)clip1(
              predY[16 * (by * 4 + yy) + bx * 4 + xx] + res[8 * yy + xx]);
    }
    std::memcpy(pred_chromaU, predU, sizeof(pred_chromaU));
    std::memcpy(pred_chromaV, predV, sizeof(pred_chromaV));
    decode_chroma_cabac(cb, mbx, mby, 0, cbp_chroma, false);
    return;
  }
  const int32_t* dq = dq4(qp, 3);
  for (int k = 0; k < 16; ++k) {
    int x4 = kZtoX[k], y4 = kZtoY[k];
    int px = mbx * 16 + x4 * 4, py = mby * 16 + y4 * 4;
    int blk[16];
    bool has = false;
    if (cbp_luma & (1 << (k >> 2)))
      has = luma4_residual_cabac(cb, k, 2, blk);
    if (!has) {
      for (int yy = 0; yy < 4; ++yy)
        for (int xx = 0; xx < 4; ++xx)
          Y[(size_t)(py + yy) * W + px + xx] =
              (uint8_t)predY[16 * (y4 * 4 + yy) + x4 * 4 + xx];
      continue;
    }
    int d[16], res[16];
    std::memset(d, 0, sizeof(d));
    for (int s = 0; s < 16; ++s) {
      int c = blk[s];
      if (c) {
        int posn = zz4[s];
        d[posn] = dequant4_apply(c, dq[posn], qp);
      }
    }
    idct4x4(d, res);
    for (int yy = 0; yy < 4; ++yy)
      for (int xx = 0; xx < 4; ++xx)
        Y[(size_t)(py + yy) * W + px + xx] = (uint8_t)clip1(
            predY[16 * (y4 * 4 + yy) + x4 * 4 + xx] + res[4 * yy + xx]);
  }
  std::memcpy(pred_chromaU, predU, sizeof(pred_chromaU));
  std::memcpy(pred_chromaV, predV, sizeof(pred_chromaV));
  decode_chroma_cabac(cb, mbx, mby, 0, cbp_chroma, false);
}

}  // namespace h264

namespace h264 {

// ---------------------------------------------------------------------------
// Decoder: NAL dispatch, picture/reference management, display order
// (h264_ref.py:1354-1745 H264RefDecoder)
// ---------------------------------------------------------------------------

static void deblock_picture_mbaff(Picture& pic);

struct Decoder {
  void decode_slice_mbaff(const std::vector<uint8_t>& rbsp_,
                          const SliceHeader& h, const SPS& sps,
                          const PPS& pps);  // defined with the MBAFF code
  std::map<int, SPS> sps_map;
  std::map<int, PPS> pps_map;
  PicPtr cur;
  SliceHeader cur_hdr;
  bool has_hdr = false;
  int slice_counter = 0;
  std::vector<PicPtr> pending;  // _out: finished, awaiting display order
  std::deque<PicPtr> outq;      // drained display frames
  std::vector<PicPtr> dpb;
  int prev_poc_msb = 0, prev_poc_lsb = 0;
  int prev_frame_num = 0, prev_frame_num_offset = 0;
  int hold = 5;
  int pic_counter = 0;
  // PAFF field-pairing state (h264_paff.py _paff_st / _paff_pending)
  struct PaffSt {
    PicPtr fp, frame;
    int parity;
    SliceHeader hdr;
    int slices = 0;
    bool second = false;
    int first_parity;
  };
  struct PaffPending {
    PicPtr frame;
    int fn, first_parity, idr, idr_pic_id;
  };
  std::unique_ptr<PaffSt> paff_st;
  std::unique_ptr<PaffPending> paff_pending;

  // Picture pool: recycles retired pictures' heap storage so steady-state
  // decode performs no large allocations.  A pooled entry with
  // use_count()==1 is referenced by nobody (not DPB, not output, not a
  // PAFF pair) — its buffers are free to steal.  The new Picture is
  // default-constructed (fresh field semantics) and only adopts capacity.
  std::vector<PicPtr> pic_pool;
  PicPtr alloc_picture() {
    PicPtr fresh = std::make_shared<Picture>();
    for (auto& q : pic_pool) {
      if (q.use_count() == 1) {
        fresh->take_storage(*q);
        q = fresh;
        return fresh;
      }
    }
    if (pic_pool.size() < 64) pic_pool.push_back(fresh);
    return fresh;
  }
  int max_long_term_idx = -1;
  int epoch = 0;
  long long errors = 0;
  std::vector<uint8_t> rbsp;  // scratch

  void decode(const uint8_t* d, size_t n) {
    std::vector<std::pair<size_t, size_t>> nals;
    split_annexb(d, n, nals);
    for (auto& nl : nals) {
      try {
        nal(d + nl.first, nl.second);
      } catch (const std::exception&) {
        ++errors;
      }
    }
    drain(hold);
  }

  void flush() {
    try {
      finish_picture();
      paff_finish_field();
      paff_finalize_frame();
    } catch (const std::exception&) {
      ++errors;
    }
    drain(0);
  }

  void nal(const uint8_t* d, size_t n) {
    if (n == 0) return;
    uint8_t hdr = d[0];
    if (hdr & 0x80) return;  // forbidden_zero_bit: corrupt
    int ref_idc = (hdr >> 5) & 3;
    int typ = hdr & 0x1F;
    if (typ == 7) {
      ebsp_to_rbsp(d + 1, n - 1, rbsp);
      SPS s;
      parse_sps(rbsp, s);
      sps_map[s.sps_id] = s;
    } else if (typ == 8) {
      ebsp_to_rbsp(d + 1, n - 1, rbsp);
      PPS p;
      parse_pps(rbsp, sps_map, p);
      pps_map[p.pps_id] = p;
    } else if (typ == 1 || typ == 5) {
      ebsp_to_rbsp(d + 1, n - 1, rbsp);
      SliceHeader h;
      const SPS* sps;
      const PPS* pps;
      parse_slice_header(rbsp, ref_idc, typ, sps_map, pps_map, h, &sps, &pps);
      decode_slice(rbsp, h, *sps, *pps);
    }
    // SEI (6), AUD (9), filler: ignored for pixel decode
  }

  // -- picture management (h264_ref.py:1416-1451) -------------------------

  bool is_new_picture(const SliceHeader& h) const {
    if (!cur || !has_hdr) return true;
    const SliceHeader& prev = cur_hdr;
    if (h.first_mb == 0) return true;
    return h.frame_num != prev.frame_num || h.pps_id != prev.pps_id ||
           h.field_pic_flag != prev.field_pic_flag || h.idr != prev.idr;
  }

  void start_picture(const SliceHeader& h, const SPS& sps, const PPS& pps) {
    finish_picture();
    // a frame-coded picture closes any in-progress PAFF field pair
    paff_finish_field();
    paff_finalize_frame();
    PicPtr pic = alloc_picture();
    pic->init(sps, pps);
    pic->frame_num = h.frame_num;
    pic->is_ref = h.nal_ref_idc != 0;
    pic->is_idr = h.idr;
    {
      // both field order counts (8.2.1; mirrors h264_ref._start_picture)
      int top = compute_poc(h, sps);
      int bottom;
      if (sps.poc_type == 0)
        bottom = top + h.delta_poc_bottom;
      else if (sps.poc_type == 1)
        bottom = top + sps.offset_for_top_to_bottom_field + h.delta_poc[1];
      else
        bottom = top;
      pic->field_poc[0] = top;
      pic->field_poc[1] = bottom;
      pic->poc = std::min(top, bottom);
    }
    pic->pic_id = pic_counter++;
    if (h.idr) ++epoch;
    pic->epoch = epoch;
    pic->mmco_ops = h.mmco;
    pic->long_term_ref_flag = h.long_term_reference_flag;
    cur = pic;
    slice_counter = 0;
  }

  void finish_picture() {
    if (!cur) return;
    flush_slice_batch();
    PicPtr pic = cur;
    cur.reset();
    has_hdr = false;
    if (pic->mbaff)
      deblock_picture_mbaff(*pic);
    else
      deblock_picture(*pic);
    mark_references(pic);
    pending.push_back(pic);
  }

  // ---- slice-parallel decode (frame, non-MBAFF pictures) ----------------
  // Slices of one picture are fully independent before deblocking:
  // intra/MV/nnz availability is gated on mb_slice == sid (so no
  // cross-slice reads occur during MB decode), each slice writes a
  // disjoint MB set, and deblocking runs as a separate per-picture pass
  // after the join. Slices are buffered as they arrive and decoded at
  // picture completion — in a worker pool when the picture has several
  // slices and cores exist, serially (arrival order) otherwise. Output
  // is bit-identical either way. Same switch as mpeg2dec/h265dec:
  // AMATSUKAZE_DECODE_THREADS, default hardware concurrency.
  struct PendingSlice {
    std::vector<uint8_t> rbsp;
    SliceHeader h;
    SPS sps;  // own copies: a mid-picture parameter-set rewrite must
    PPS pps;  // not retarget an already-buffered slice
    int sid;
  };
  std::vector<PendingSlice> slice_batch;

  static int decode_threads() {
    static int n = [] {
      const char* e = std::getenv("AMATSUKAZE_DECODE_THREADS");
      if (e && *e) return std::max(1, std::atoi(e));
      return (int)std::max(1u, std::thread::hardware_concurrency());
    }();
    return n;
  }

  void flush_slice_batch() {
    if (slice_batch.empty()) return;
    Picture* pic = cur.get();
    auto run_one = [&](PendingSlice& ps) {
      auto ctx = std::unique_ptr<SliceCtx>(
          new SliceCtx(pic, &ps.h, &ps.sps, &ps.pps, ps.sid));
      if (ps.h.slice_type == SLICE_P) {
        ctx->ref_l0 = build_ref_list_p(ps.h, ps.sps);
      } else if (ps.h.slice_type == SLICE_B) {
        build_ref_lists_b(ps.h, ps.sps, pic->poc, ctx->ref_l0, ctx->ref_l1);
      }
      run_slice(pic, ctx.get(), ps.rbsp, ps.h, ps.pps);
    };
    const int nt =
        std::min<int>((int)slice_batch.size(), decode_threads());
    if (nt <= 1) {
      for (auto& ps : slice_batch) {
        try {
          run_one(ps);
        } catch (const std::exception&) {
          ++errors;
        }
      }
    } else {
      std::atomic<size_t> next{0};
      std::atomic<long long> errs{0};
      std::vector<std::thread> pool;
      pool.reserve(nt);
      for (int t = 0; t < nt; ++t)
        pool.emplace_back([&]() {
          for (size_t k = next.fetch_add(1); k < slice_batch.size();
               k = next.fetch_add(1)) {
            try {
              run_one(slice_batch[k]);
            } catch (const std::exception&) {
              ++errs;
            }
          }
        });
      for (auto& th : pool) th.join();
      errors += errs.load();
    }
    slice_batch.clear();
  }

  // -- reference marking (8.2.5; h264_ref.py:1455-1521) -------------------

  static int frame_num_wrap(const Picture& p, int cur_frame_num,
                            const SPS& sps) {
    int max_fn = 1 << sps.log2_max_frame_num;
    return p.frame_num > cur_frame_num ? p.frame_num - max_fn : p.frame_num;
  }

  static int frame_num_wrap_pic(const Picture& p, int cur_frame_num,
                                int log2_max_fn) {
    int max_fn = 1 << log2_max_fn;
    return p.frame_num > cur_frame_num ? p.frame_num - max_fn : p.frame_num;
  }

  void mark_references(PicPtr pic) {
    if (!pic->is_ref) return;
    int lmfn = pic->log2_max_frame_num;  // oracle: pic.sps (h264_ref.py:1461)
    if (pic->is_idr) {
      dpb.clear();
      if (pic->long_term_ref_flag) {
        pic->long_term = true;
        pic->long_term_idx = 0;
        max_long_term_idx = 0;
      } else {
        max_long_term_idx = -1;
      }
      dpb.push_back(pic);
      return;
    }
    if (!pic->mmco_ops.empty()) {
      int cur_pn = pic->frame_num;
      for (auto& op_vals : pic->mmco_ops) {
        int op = op_vals[0];
        if (op == 1) {
          int pn = cur_pn - (op_vals[1] + 1);
          std::vector<PicPtr> keep;
          for (auto& p : dpb)
            if (p->long_term || frame_num_wrap_pic(*p, cur_pn, lmfn) != pn)
              keep.push_back(p);
          dpb = keep;
        } else if (op == 2) {
          std::vector<PicPtr> keep;
          for (auto& p : dpb)
            if (!(p->long_term && p->long_term_idx == op_vals[1]))
              keep.push_back(p);
          dpb = keep;
        } else if (op == 3) {
          int pn = cur_pn - (op_vals[1] + 1);
          int idx = op_vals[2];
          std::vector<PicPtr> keep;
          for (auto& p : dpb)
            if (!(p->long_term && p->long_term_idx == idx)) keep.push_back(p);
          dpb = keep;
          for (auto& p : dpb)
            if (!p->long_term && frame_num_wrap_pic(*p, cur_pn, lmfn) == pn) {
              p->long_term = true;
              p->long_term_idx = idx;
            }
        } else if (op == 4) {
          max_long_term_idx = op_vals[1] - 1;
          std::vector<PicPtr> keep;
          for (auto& p : dpb)
            if (!p->long_term || p->long_term_idx <= max_long_term_idx)
              keep.push_back(p);
          dpb = keep;
        } else if (op == 5) {
          dpb.clear();
          max_long_term_idx = -1;
          pic->frame_num = 0;
          prev_frame_num = 0;
          prev_poc_msb = prev_poc_lsb = 0;
        } else if (op == 6) {
          int idx = op_vals[1];
          std::vector<PicPtr> keep;
          for (auto& p : dpb)
            if (!(p->long_term && p->long_term_idx == idx)) keep.push_back(p);
          dpb = keep;
          pic->long_term = true;
          pic->long_term_idx = idx;
        }
      }
    } else {
      // sliding window
      int cap = std::max(1, pic->max_num_ref_frames);
      while ((int)dpb.size() >= cap) {
        int victim = -1, victim_w = 0;
        for (size_t i = 0; i < dpb.size(); ++i) {
          if (dpb[i]->long_term) continue;
          int w = frame_num_wrap_pic(*dpb[i], pic->frame_num, lmfn);
          if (victim < 0 || w < victim_w) {
            victim = (int)i;
            victim_w = w;
          }
        }
        if (victim < 0) break;
        dpb.erase(dpb.begin() + victim);
      }
    }
    dpb.push_back(pic);
  }

  // -- reference list construction (8.2.4; h264_ref.py:1525-1607) ---------

  std::vector<Picture*> build_ref_list_p(const SliceHeader& h,
                                         const SPS& sps) {
    int cur_pn = h.frame_num;
    int max_fn = 1 << sps.log2_max_frame_num;
    std::vector<Picture*> shorts, longs;
    for (auto& p : dpb)
      (p->long_term ? longs : shorts).push_back(p.get());
    std::stable_sort(shorts.begin(), shorts.end(),
                     [&](Picture* a, Picture* b) {
                       return frame_num_wrap(*a, cur_pn, sps) >
                              frame_num_wrap(*b, cur_pn, sps);
                     });
    std::stable_sort(longs.begin(), longs.end(), [](Picture* a, Picture* b) {
      return a->long_term_idx < b->long_term_idx;
    });
    std::vector<Picture*> lst = shorts;
    lst.insert(lst.end(), longs.begin(), longs.end());
    return modify_ref_list(lst, h.ref_list_mods[0], cur_pn, max_fn,
                           h.num_ref_idx[0]);
  }

  void build_ref_lists_b(const SliceHeader& h, const SPS& sps, int cur_poc,
                         std::vector<Picture*>& l0,
                         std::vector<Picture*>& l1) {
    int cur_pn = h.frame_num;
    int max_fn = 1 << sps.log2_max_frame_num;
    std::vector<Picture*> shorts, longs;
    for (auto& p : dpb)
      (p->long_term ? longs : shorts).push_back(p.get());
    std::stable_sort(longs.begin(), longs.end(), [](Picture* a, Picture* b) {
      return a->long_term_idx < b->long_term_idx;
    });
    std::vector<Picture*> before, after;
    for (auto* p : shorts)
      if (p->poc < cur_poc) before.push_back(p);
    for (auto* p : shorts)
      if (p->poc > cur_poc) after.push_back(p);
    std::stable_sort(before.begin(), before.end(),
                     [](Picture* a, Picture* b) { return a->poc > b->poc; });
    std::stable_sort(after.begin(), after.end(),
                     [](Picture* a, Picture* b) { return a->poc < b->poc; });
    l0 = before;
    l0.insert(l0.end(), after.begin(), after.end());
    l0.insert(l0.end(), longs.begin(), longs.end());
    l1 = after;
    l1.insert(l1.end(), before.begin(), before.end());
    l1.insert(l1.end(), longs.begin(), longs.end());
    if (l1.size() > 1 && l0 == l1) std::swap(l1[0], l1[1]);
    l0 = modify_ref_list(l0, h.ref_list_mods[0], cur_pn, max_fn,
                         h.num_ref_idx[0]);
    l1 = modify_ref_list(l1, h.ref_list_mods[1], cur_pn, max_fn,
                         h.num_ref_idx[1]);
  }

  // 8.2.4.3.1/.2 exactly (h264_ref.py:1559-1603)
  std::vector<Picture*> modify_ref_list(
      const std::vector<Picture*>& lst,
      const std::vector<std::pair<int, int>>& mods, int cur_pn, int max_fn,
      int num_active) {
    std::vector<Picture*> work(
        lst.begin(), lst.begin() + std::min((size_t)num_active, lst.size()));
    if (mods.empty()) return work;
    int pred = cur_pn;
    int ref_idx = 0;
    for (auto& m : mods) {
      int op = m.first, val = m.second;
      Picture* target = nullptr;
      if (op == 0 || op == 1) {
        int adp = val + 1;
        int nw;
        if (op == 0) {
          nw = pred - adp;
          if (nw < 0) nw += max_fn;
        } else {
          nw = pred + adp;
          if (nw >= max_fn) nw -= max_fn;
        }
        pred = nw;
        int pn = nw > cur_pn ? nw - max_fn : nw;
        for (auto& p : dpb)
          if (!p->long_term &&
              (p->frame_num > cur_pn ? p->frame_num - max_fn : p->frame_num) ==
                  pn) {
            target = p.get();
            break;
          }
      } else {  // op == 2: long-term
        for (auto& p : dpb)
          if (p->long_term && p->long_term_idx == val) {
            target = p.get();
            break;
          }
      }
      if (!target) continue;  // non-conformant; be tolerant
      work.insert(work.begin() + ref_idx, target);
      ++ref_idx;
      for (size_t i = ref_idx; i < work.size();) {
        if (work[i] == target)
          work.erase(work.begin() + i);
        else
          ++i;
      }
    }
    if ((int)work.size() > num_active) work.resize(num_active);
    return work;
  }

  void drain(int hold_) {
    while ((int)pending.size() > hold_) {
      size_t k = 0;
      for (size_t i = 1; i < pending.size(); ++i) {
        if (pending[i]->epoch < pending[k]->epoch ||
            (pending[i]->epoch == pending[k]->epoch &&
             pending[i]->poc < pending[k]->poc))
          k = i;
      }
      outq.push_back(pending[k]);
      pending.erase(pending.begin() + k);
    }
  }

  // -- POC (8.2.1; h264_ref.py:1620-1673) ---------------------------------

  int compute_poc(const SliceHeader& h, const SPS& sps) {
    if (sps.poc_type == 0) {
      int max_lsb = 1 << sps.log2_max_poc_lsb;
      if (h.idr) {
        prev_poc_msb = 0;
        prev_poc_lsb = 0;
      }
      int lsb = h.poc_lsb;
      int msb;
      if (lsb < prev_poc_lsb && prev_poc_lsb - lsb >= max_lsb / 2)
        msb = prev_poc_msb + max_lsb;
      else if (lsb > prev_poc_lsb && lsb - prev_poc_lsb > max_lsb / 2)
        msb = prev_poc_msb - max_lsb;
      else
        msb = prev_poc_msb;
      if (h.nal_ref_idc) {
        prev_poc_msb = msb;
        prev_poc_lsb = lsb;
      }
      return msb + lsb;
    }
    if (sps.poc_type == 2) {
      int off;
      if (h.idr) {
        prev_frame_num_offset = 0;
        off = 0;
      } else {
        int max_fn = 1 << sps.log2_max_frame_num;
        off = prev_frame_num_offset;
        if (h.frame_num < prev_frame_num) off += max_fn;
        prev_frame_num_offset = off;
      }
      prev_frame_num = h.frame_num;
      int n = off + h.frame_num;
      return 2 * n - (h.nal_ref_idc ? 0 : 1);
    }
    // poc_type 1
    int off;
    if (h.idr) {
      prev_frame_num_offset = 0;
      off = 0;
    } else {
      int max_fn = 1 << sps.log2_max_frame_num;
      off = prev_frame_num_offset;
      if (h.frame_num < prev_frame_num) off += max_fn;
      prev_frame_num_offset = off;
    }
    prev_frame_num = h.frame_num;
    int abs_frame_num = off + h.frame_num;
    if (!h.nal_ref_idc && abs_frame_num > 0) --abs_frame_num;
    int ncyc = (int)sps.offset_for_ref_frame.size();
    int expected = 0;
    if (abs_frame_num > 0 && ncyc) {
      int cycle_sum = 0;
      for (int v : sps.offset_for_ref_frame) cycle_sum += v;
      int cnt = (abs_frame_num - 1) / ncyc;
      int in_cycle = (abs_frame_num - 1) % ncyc;
      expected = cnt * cycle_sum;
      for (int i = 0; i <= in_cycle; ++i)
        expected += sps.offset_for_ref_frame[i];
    }
    if (!h.nal_ref_idc) expected += sps.offset_for_non_ref_pic;
    return expected + h.delta_poc[0];
  }

  // -- slice decode (h264_ref.py:1677-1734) -------------------------------

  void decode_slice(const std::vector<uint8_t>& rbsp_, const SliceHeader& h,
                    const SPS& sps, const PPS& pps) {
    if (h.slice_type != SLICE_I && h.slice_type != SLICE_P &&
        h.slice_type != SLICE_B)
      throw DecodeError("SP/SI slices not supported");
    if (sps.chroma_format_idc != 1)
      throw DecodeError("only 4:2:0 supported");
    if (h.slice_qp < 0 || h.slice_qp > 51)
      throw DecodeError("slice QP out of range");
    if (h.field_pic_flag) {
      decode_field_slice(rbsp_, h, sps, pps);
      return;
    }
    if (is_new_picture(h)) start_picture(h, sps, pps);
    cur_hdr = h;
    has_hdr = true;
    ++slice_counter;
    if (sps.mb_adaptive_frame_field) {
      decode_slice_mbaff(rbsp_, h, sps, pps);
      return;
    }
    // buffered for slice-parallel decode at picture completion (the
    // DPB and marking state are stable between a picture's slices, so
    // deferred ref-list construction sees identical state)
    slice_batch.push_back({rbsp_, h, sps, pps, slice_counter});
  }

  // shared MB loop for frame and field pictures (the oracle's
  // module-level run_slice_data, h264_ref.py)
  void run_slice(Picture* pic, SliceCtx* ctx,
                 const std::vector<uint8_t>& rbsp_, const SliceHeader& h,
                 const PPS& pps) {
    int n_mbs = pic->mb_w * pic->mb_h;
    if (pps.entropy_coding_mode) {
      CabacSlice cb(ctx, rbsp_.data(), rbsp_.size(), &h);
      int mb_idx = h.first_mb;
      while (mb_idx < n_mbs) {
        int mbx = mb_idx % pic->mb_w, mby = mb_idx / pic->mb_w;
        if ((h.slice_type == SLICE_P || h.slice_type == SLICE_B) &&
            cb.mb_skip_flag(mbx, mby)) {
          ctx->decode_skip_mb(mb_idx);
          pic->mb_skip[pic->mbi(mbx, mby)] = 1;
          if (h.slice_type == SLICE_B) pic->mb_bdirect[pic->mbi(mbx, mby)] = 1;
          cb.prev_qp_delta_nz = 0;
        } else {
          ctx->decode_mb_cabac(cb, mb_idx);
        }
        ++mb_idx;
        if (cb.end_of_slice()) break;
      }
      return;
    }
    BitReader r(rbsp_.data(), rbsp_.size(), h.data_bit_pos);
    int mb_idx = h.first_mb;
    if (h.slice_type == SLICE_I) {
      while (mb_idx < n_mbs) {
        ctx->decode_mb_cavlc(r, mb_idx);
        ++mb_idx;
        if (!more_rbsp_data(r)) break;
      }
      return;
    }
    bool more = true;
    while (more && mb_idx < n_mbs) {
      int skip_run = r.ue();
      for (int i = 0; i < skip_run; ++i) {
        if (mb_idx >= n_mbs) break;
        ctx->decode_skip_mb(mb_idx);
        ++mb_idx;
      }
      more = more_rbsp_data(r);
      if (more && mb_idx < n_mbs) {
        ctx->decode_mb_cavlc(r, mb_idx);
        ++mb_idx;
        more = more_rbsp_data(r);
      }
    }
  }

  // =========================================================================
  // PAFF: coded FIELD pictures (field_pic_flag = 1) -- C++ twin of
  // amatsukaze_tpu/video/h264_paff.py.  Each field decodes as an
  // independent contiguous half-height Picture; the two fields of a pair
  // weave into the output frame at completion.  Field reference lists
  // derive from the frame DPB by parity alternation (8.2.4.2.2-2.5) with
  // per-field reference marking (8.2.5: the first field's sliding window
  // can evict frames before the second field decodes).
  // =========================================================================

  static Picture* paff_field_of(Picture* frame, int parity) {
    Picture* f = frame->paff_fields[parity].get();
    return (f && f->is_ref) ? f : nullptr;
  }

  // 8.2.4.2.5: alternate same-parity / opposite-parity fields taken from
  // the ordered frame sequence (h264_paff.py _interleave_fields)
  std::vector<Picture*> paff_interleave(const std::vector<Picture*>& frames,
                                        int cur_parity,
                                        const Picture* excl) const {
    std::vector<Picture*> same, opp, out;
    for (auto* fr : frames) {
      Picture* f = paff_field_of(fr, cur_parity);
      if (f && f != excl) same.push_back(f);
    }
    for (auto* fr : frames) {
      Picture* f = paff_field_of(fr, 1 - cur_parity);
      if (f && f != excl) opp.push_back(f);
    }
    size_t i = 0, j = 0;
    bool take_same = true;
    while (i < same.size() || j < opp.size()) {
      if (take_same && i < same.size())
        out.push_back(same[i++]);
      else if (!take_same && j < opp.size())
        out.push_back(opp[j++]);
      else if (i < same.size())
        out.push_back(same[i++]);
      else
        out.push_back(opp[j++]);
      take_same = !take_same;
    }
    return out;
  }

  std::vector<Picture*> paff_all_ref_fields(const Picture* excl) const {
    std::vector<Picture*> out;
    for (int lt = 0; lt < 2; ++lt)
      for (auto& p : dpb) {
        if ((p->long_term ? 1 : 0) != lt) continue;
        for (int par = 0; par < 2; ++par) {
          Picture* f = paff_field_of(p.get(), par);
          if (f && f != excl) out.push_back(f);
        }
      }
    return out;
  }

  // 8.2.4.3.1 in FIELD units: maxPicNum = 2*MaxFrameNum, currPicNum =
  // 2*frame_num + 1, short-term field PicNumF = 2*FrameNumWrap +
  // (same parity ? 1 : 0)  (h264_paff.py _modify_field_list)
  std::vector<Picture*> modify_field_list(
      const std::vector<Picture*>& lst,
      const std::vector<std::pair<int, int>>& mods, const SliceHeader& h,
      const SPS& sps, int num_active, int cur_parity, const Picture* excl) {
    std::vector<Picture*> work(
        lst.begin(), lst.begin() + std::min((size_t)num_active, lst.size()));
    if (mods.empty()) return work;
    int cur_fn = h.frame_num;
    int max_fn = 1 << sps.log2_max_frame_num;
    int max_pn = 2 * max_fn;
    int cur_pn = 2 * cur_fn + 1;
    std::vector<Picture*> avail = paff_all_ref_fields(excl);
    int pred = cur_pn;
    int ref_idx = 0;
    for (auto& m : mods) {
      int op = m.first, val = m.second;
      Picture* target = nullptr;
      if (op == 0 || op == 1) {
        int adp = val + 1;
        int nw;
        if (op == 0) {
          nw = pred - adp;
          if (nw < 0) nw += max_pn;
        } else {
          nw = pred + adp;
          if (nw >= max_pn) nw -= max_pn;
        }
        pred = nw;
        int pn = nw > cur_pn ? nw - max_pn : nw;
        for (auto* f : avail) {
          if (f->parent->long_term) continue;
          int w = frame_num_wrap_pic(*f->parent, cur_fn,
                                     sps.log2_max_frame_num);
          int pnf = 2 * w + (f->parity == cur_parity ? 1 : 0);
          if (pnf == pn) {
            target = f;
            break;
          }
        }
      } else {  // op == 2: long-term field
        for (auto* f : avail) {
          if (!f->parent->long_term) continue;
          int ltp = 2 * f->parent->long_term_idx +
                    (f->parity == cur_parity ? 1 : 0);
          if (ltp == val) {
            target = f;
            break;
          }
        }
      }
      if (!target) continue;
      work.insert(work.begin() + ref_idx, target);
      ++ref_idx;
      for (size_t i = ref_idx; i < work.size();) {
        if (work[i] == target)
          work.erase(work.begin() + i);
        else
          ++i;
      }
    }
    if ((int)work.size() > num_active) work.resize(num_active);
    return work;
  }

  std::vector<Picture*> build_field_list_p(const SliceHeader& h,
                                           const SPS& sps,
                                           const Picture* curfp,
                                           int cur_parity) {
    int cur_fn = h.frame_num;
    std::vector<Picture*> shorts, longs;
    for (auto& p : dpb)
      (p->long_term ? longs : shorts).push_back(p.get());
    std::stable_sort(shorts.begin(), shorts.end(),
                     [&](Picture* a, Picture* b) {
                       return frame_num_wrap(*a, cur_fn, sps) >
                              frame_num_wrap(*b, cur_fn, sps);
                     });
    std::stable_sort(longs.begin(), longs.end(), [](Picture* a, Picture* b) {
      return a->long_term_idx < b->long_term_idx;
    });
    std::vector<Picture*> lst = paff_interleave(shorts, cur_parity, curfp);
    std::vector<Picture*> l2 = paff_interleave(longs, cur_parity, curfp);
    lst.insert(lst.end(), l2.begin(), l2.end());
    return modify_field_list(lst, h.ref_list_mods[0], h, sps,
                             h.num_ref_idx[0], cur_parity, curfp);
  }

  void build_field_lists_b(const SliceHeader& h, const SPS& sps, int cur_poc,
                           const Picture* curfp, int cur_parity,
                           std::vector<Picture*>& l0,
                           std::vector<Picture*>& l1) {
    std::vector<Picture*> shorts, longs;
    for (auto& p : dpb)
      (p->long_term ? longs : shorts).push_back(p.get());
    std::stable_sort(longs.begin(), longs.end(), [](Picture* a, Picture* b) {
      return a->long_term_idx < b->long_term_idx;
    });
    auto frame_poc = [](Picture* p) {
      int best = 0;
      bool any = false;
      for (int par = 0; par < 2; ++par)
        if (p->paff_fields[par]) {
          int v = p->paff_fields[par]->poc;
          best = any ? std::min(best, v) : v;
          any = true;
        }
      return any ? best : p->poc;
    };
    std::vector<Picture*> before, after;
    for (auto* p : shorts)
      (frame_poc(p) <= cur_poc ? before : after).push_back(p);
    std::stable_sort(before.begin(), before.end(), [&](Picture* a,
                                                       Picture* b) {
      return frame_poc(a) > frame_poc(b);
    });
    std::stable_sort(after.begin(), after.end(), [&](Picture* a,
                                                     Picture* b) {
      return frame_poc(a) < frame_poc(b);
    });
    std::vector<Picture*> f0 = before, f1 = after;
    f0.insert(f0.end(), after.begin(), after.end());
    f0.insert(f0.end(), longs.begin(), longs.end());
    f1.insert(f1.end(), before.begin(), before.end());
    f1.insert(f1.end(), longs.begin(), longs.end());
    l0 = paff_interleave(f0, cur_parity, curfp);
    l1 = paff_interleave(f1, cur_parity, curfp);
    if (l1.size() > 1 && l0 == l1) std::swap(l1[0], l1[1]);
    l0 = modify_field_list(l0, h.ref_list_mods[0], h, sps, h.num_ref_idx[0],
                           cur_parity, curfp);
    l1 = modify_field_list(l1, h.ref_list_mods[1], h, sps, h.num_ref_idx[1],
                           cur_parity, curfp);
  }

  void decode_field_slice(const std::vector<uint8_t>& rbsp_,
                          const SliceHeader& h, const SPS& sps,
                          const PPS& pps) {
    finish_picture();  // close any in-progress frame-coded picture
    bool new_pic = !paff_st || h.first_mb == 0 ||
                   h.frame_num != paff_st->hdr.frame_num ||
                   h.bottom_field_flag != paff_st->hdr.bottom_field_flag ||
                   h.pps_id != paff_st->hdr.pps_id;
    if (new_pic) {
      paff_finish_field();
      paff_start_field(h, sps, pps);
    }
    paff_st->hdr = h;
    ++paff_st->slices;
    Picture* fp = paff_st->fp.get();
    auto ctx = std::unique_ptr<SliceCtx>(
        new SliceCtx(fp, &h, &sps, &pps, paff_st->slices));
    if (h.slice_type == SLICE_P) {
      ctx->ref_l0 =
          build_field_list_p(h, sps, fp, paff_st->parity);
    } else if (h.slice_type == SLICE_B) {
      build_field_lists_b(h, sps, fp->poc, fp, paff_st->parity, ctx->ref_l0,
                          ctx->ref_l1);
    }
    run_slice(fp, ctx.get(), rbsp_, h, pps);
  }

  void paff_start_field(const SliceHeader& h, const SPS& sps,
                        const PPS& pps) {
    int parity = h.bottom_field_flag;
    // an IDR first field normally pairs with a NON-IDR second field
    // (which references it); two consecutive IDR fields pair only when
    // they share idr_pic_id (7.4.3)
    bool pairable = paff_pending && h.frame_num == paff_pending->fn &&
                    parity != paff_pending->first_parity &&
                    (!(h.idr && paff_pending->idr) ||
                     h.idr_pic_id == paff_pending->idr_pic_id);
    if (paff_pending && !pairable) paff_finalize_frame();
    PicPtr frame;
    bool second;
    int first_parity;
    if (pairable) {
      frame = paff_pending->frame;
      second = true;
      first_parity = paff_pending->first_parity;
    } else {
      frame = alloc_picture();
      frame->init(sps, pps);
      frame->frame_num = h.frame_num;
      frame->is_idr = h.idr;
      frame->pic_id = pic_counter++;
      if (h.idr) ++epoch;
      frame->epoch = epoch;
      frame->mmco_ops = h.mmco;
      frame->long_term_ref_flag = h.long_term_reference_flag;
      second = false;
      first_parity = parity;
    }
    PicPtr fp = alloc_picture();
    fp->init_dims(sps.width(), sps.height() / 2, sps, pps);
    fp->is_field_pic = true;
    fp->parity = parity;
    fp->parent = frame.get();
    fp->pic_id = pic_counter++;
    fp->poc = compute_poc(h, sps);
    fp->is_ref = h.nal_ref_idc != 0;
    fp->frame_num = h.frame_num;
    frame->paff_fields[parity] = fp;
    if (fp->is_ref) frame->is_ref = true;
    frame->field_poc[parity] = fp->poc;
    {
      int best = fp->poc;
      for (int par = 0; par < 2; ++par)
        if (frame->paff_fields[par])
          best = std::min(best, frame->paff_fields[par]->poc);
      frame->poc = best;
    }
    paff_st.reset(new PaffSt());
    paff_st->fp = fp;
    paff_st->frame = frame;
    paff_st->parity = parity;
    paff_st->hdr = h;
    paff_st->second = second;
    paff_st->first_parity = first_parity;
    if (!second) {
      paff_pending.reset(new PaffPending());
      paff_pending->frame = frame;
      paff_pending->fn = h.frame_num;
      paff_pending->first_parity = parity;
      paff_pending->idr = h.idr;
      paff_pending->idr_pic_id = h.idr_pic_id;
    }
  }

  void paff_finish_field() {
    if (!paff_st) return;
    std::unique_ptr<PaffSt> st(std::move(paff_st));
    deblock_picture(*st->fp);
    if (st->fp->is_ref) {
      bool in_dpb = false;
      for (auto& p : dpb)
        if (p == st->frame) {
          in_dpb = true;
          break;
        }
      if (!in_dpb) mark_references(st->frame);
    }
    if (st->second) paff_finalize_frame();
  }

  void paff_finalize_frame() {
    if (!paff_pending) return;
    std::unique_ptr<PaffPending> pend(std::move(paff_pending));
    Picture* frame = pend->frame.get();
    // weave the decoded fields into the frame planes
    for (int par = 0; par < 2; ++par) {
      Picture* f = frame->paff_fields[par].get();
      if (!f) continue;
      for (int y = 0; y < f->h; ++y)
        std::memcpy(&frame->Y[(size_t)(2 * y + par) * frame->w],
                    &f->Y[(size_t)y * f->w], f->w);
      for (int y = 0; y < f->ch; ++y) {
        std::memcpy(&frame->U[(size_t)(2 * y + par) * frame->cw],
                    &f->U[(size_t)y * f->cw], f->cw);
        std::memcpy(&frame->V[(size_t)(2 * y + par) * frame->cw],
                    &f->V[(size_t)y * f->cw], f->cw);
      }
    }
    pending.push_back(pend->frame);
  }
};

}  // namespace h264

// ---------------------------------------------------------------------------
// C ABI (mirrors native/mpeg2dec.cpp M2V_*; bound by video/native.py)
// ---------------------------------------------------------------------------

extern "C" {

void* H264_Create() { return new h264::Decoder(); }
void H264_Destroy(void* h) { delete static_cast<h264::Decoder*>(h); }

// Feed Annex B bytes (complete NALs -- cut at the last start code, like
// the oracle's decode()); returns frames now queued for display.
int H264_Decode(void* hp, const uint8_t* data, long long len) {
  auto* d = static_cast<h264::Decoder*>(hp);
  d->decode(data, (size_t)len);
  return (int)d->outq.size();
}

int H264_Flush(void* hp) {
  auto* d = static_cast<h264::Decoder*>(hp);
  d->flush();
  return (int)d->outq.size();
}

// info[4] = {width, height, poc, errors_so_far}; 1 when a frame is queued.
int H264_NextInfo(void* hp, int* info) {
  auto* d = static_cast<h264::Decoder*>(hp);
  if (d->outq.empty()) return 0;
  auto& f = *d->outq.front();
  info[0] = f.w;
  info[1] = f.h;
  info[2] = f.poc;
  info[3] = (int)d->errors;
  return 1;
}

// Pop the front frame (y: h*w, u/v: (h/2)*(w/2)).
int H264_PopFrame(void* hp, uint8_t* y, uint8_t* u, uint8_t* v) {
  auto* d = static_cast<h264::Decoder*>(hp);
  if (d->outq.empty()) return 0;
  auto f = d->outq.front();
  d->outq.pop_front();
  std::memcpy(y, f->Y.data(), f->Y.size());
  std::memcpy(u, f->U.data(), f->U.size());
  std::memcpy(v, f->V.data(), f->V.size());
  return 1;
}

long long H264_Errors(void* hp) {
  return static_cast<h264::Decoder*>(hp)->errors;
}

}  // extern "C"

namespace h264 {

// ===========================================================================
// MBAFF (macroblock-adaptive frame/field) decoding — C++ twin of
// amatsukaze_tpu/video/h264_mbaff.py (which is held bit-exact against
// libavcodec on x264 interlaced streams; the native/oracle differential
// runs in tests/test_h264_native.py::TestMbaff*).  Neighbour derivation
// is the same geometric line-map form; state is per-mbAddr.
// ===========================================================================

struct MbaffState {
  int mb_w = 0, mb_h = 0, n_pairs = 0, pair_rows = 0;
  std::vector<int8_t> field_flag;   // per pair
  std::vector<int32_t> slice_id;    // per addr, init -1
  std::vector<int8_t> mb_class, mb_tf8, mb_dc_flag, mb_skip, mb_bdirect,
      mb_chroma_mode;
  std::vector<int8_t> mb_qp, mb_cbp, mb_alpha_off, mb_beta_off, mb_disable;
  std::vector<int8_t> i4_modes, nnz_y, cbf_y;  // n*16 (cell = 4*y + x)
  std::vector<int8_t> nnz_c, cbf_c;            // n*2*4
  std::vector<int16_t> mv;                     // n*2*16*2
  std::vector<int8_t> ref_idx;                 // n*2*16, init -1
  std::vector<int32_t> ref_id;                 // n*2*16, init -1
  std::vector<int16_t> mvd;                    // n*2*16*2
  std::vector<int8_t> cell_direct;             // n*16

  void init(const Picture& pic) {
    mb_w = pic.mb_w;
    mb_h = pic.mb_h;
    int n = mb_w * mb_h;
    n_pairs = n / 2;
    pair_rows = mb_h / 2;
    field_flag.assign(n_pairs, 0);
    slice_id.assign(n, -1);
    mb_class.assign(n, 0);
    mb_tf8.assign(n, 0);
    mb_dc_flag.assign(n, 0);
    mb_skip.assign(n, 0);
    mb_bdirect.assign(n, 0);
    mb_chroma_mode.assign(n, 0);
    mb_qp.assign(n, 0);
    mb_cbp.assign(n, 0);
    mb_alpha_off.assign(n, 0);
    mb_beta_off.assign(n, 0);
    mb_disable.assign(n, 0);
    i4_modes.assign((size_t)n * 16, 2);
    nnz_y.assign((size_t)n * 16, 0);
    cbf_y.assign((size_t)n * 16, 0);
    nnz_c.assign((size_t)n * 8, 0);
    cbf_c.assign((size_t)n * 8, 0);
    mv.assign((size_t)n * 64, 0);
    ref_idx.assign((size_t)n * 32, -1);
    ref_id.assign((size_t)n * 32, -1);
    mvd.assign((size_t)n * 64, 0);
    cell_direct.assign((size_t)n * 16, 0);
  }
  // flat index helpers
  size_t cell(int addr, int c) const { return (size_t)addr * 16 + c; }
  size_t ccell(int addr, int comp, int c) const {
    return (size_t)addr * 8 + comp * 4 + c;
  }
  size_t mref(int addr, int l, int c) const {
    return (size_t)addr * 32 + l * 16 + c;
  }
  size_t mmv(int addr, int l, int c, int comp) const {
    return (size_t)addr * 64 + l * 32 + c * 2 + comp;
  }
  int pair_of(int addr) const { return addr >> 1; }
  bool is_field(int addr) const { return field_flag[addr >> 1] != 0; }
  bool is_intra(int addr) const { return mb_class[addr] <= MB_I8; }
  int pair_x(int addr) const { return (addr >> 1) % mb_w; }
  int pair_y(int addr) const { return (addr >> 1) / mb_w; }
  int luma_y(int addr, int y) const {
    int py = pair_y(addr);
    if (is_field(addr)) return py * 32 + (addr & 1) + 2 * y;
    return py * 32 + 16 * (addr & 1) + y;
  }
  int chroma_y(int addr, int y) const {
    int py = pair_y(addr);
    if (is_field(addr)) return py * 16 + (addr & 1) + 2 * y;
    return py * 16 + 8 * (addr & 1) + y;
  }
  int luma_x0(int addr) const { return pair_x(addr) * 16; }
};

struct MbaffCabac;  // fwd

struct MbaffSlice {
  Decoder* dec;
  Picture* pic;
  MbaffState* st;
  const SliceHeader* h;
  const SPS* sps;
  const PPS* pps;
  int sid;
  int qp;
  int w4[6][16];
  int w8[2][64];
  int32_t dq4c[52][6][16];
  uint8_t dq4ok[52][6];
  int32_t dq8c[52][2][64];
  uint8_t dq8ok[52][2];
  std::vector<Picture*> ref_l0, ref_l1;
  int cur_addr = 0, cur_z = 0;
  int pred_chromaU[64], pred_chromaV[64];
  bool dc_valid = false;
  int dc_refs[2] = {-1, -1};
  int dc_mvps[2][2] = {{0, 0}, {0, 0}};
  bool dc_dzp = false;

  MbaffSlice(Decoder* dec_, Picture* pic_, const SliceHeader* h_,
             const SPS* sps_, const PPS* pps_, int slice_id)
      : dec(dec_), pic(pic_), h(h_), sps(sps_), pps(pps_), sid(slice_id) {
    if (!pic->mbaff) {
      pic->mbaff = std::make_shared<MbaffState>();
      pic->mbaff->init(*pic);
    }
    st = pic->mbaff.get();
    qp = h->slice_qp;
    std::memset(dq4ok, 0, sizeof(dq4ok));
    std::memset(dq8ok, 0, sizeof(dq8ok));
    if (!pps->has_scaling) {
      for (int i = 0; i < 6; ++i)
        for (int k = 0; k < 16; ++k) w4[i][k] = 16;
      for (int i = 0; i < 2; ++i)
        for (int k = 0; k < 64; ++k) w8[i][k] = 16;
    } else {
      const ScalingMatrix& mats = pps->scaling_matrix;
      for (int i = 0; i < 6; ++i)
        for (int k = 0; k < 16; ++k) w4[i][kZigzag4[k]] = mats[i][k];
      if (mats.size() > 6) {
        for (int i = 0; i < 2; ++i)
          for (int k = 0; k < 64; ++k) w8[i][kZigzag8[k]] = mats[6 + i][k];
      } else {
        for (int i = 0; i < 2; ++i)
          for (int k = 0; k < 64; ++k) w8[i][k] = 16;
      }
    }
  }

  const uint8_t* scan4(int addr) const {
    return st->is_field(addr) ? kFieldScan4 : kZigzag4;
  }
  const uint8_t* scan8(int addr) const {
    return st->is_field(addr) ? kFieldScan8 : kZigzag8;
  }
  const int32_t* dq4(int qp_, int li) {
    if (!dq4ok[qp_][li]) {
      dequant4_tab(qp_, w4[li], dq4c[qp_][li]);
      dq4ok[qp_][li] = 1;
    }
    return dq4c[qp_][li];
  }
  const int32_t* dq8(int qp_, int li) {
    if (!dq8ok[qp_][li]) {
      dequant8_tab(qp_, w8[li], dq8c[qp_][li]);
      dq8ok[qp_][li] = 1;
    }
    return dq8c[qp_][li];
  }

  // -- neighbour derivation (geometric 6.4.10) ----------------------------
  struct Nbr {
    bool ok;
    int addr, xW, yW;
  };
  // wsh: log2 sample width of an MB (4 luma, 3 chroma); bsh: log2 pair
  // band height (5 luma, 4 chroma) — shifts instead of runtime division
  Nbr nbr_impl(int addr, int xN, int yN, int line, int wsh,
               int bsh) const {
    int px = st->pair_x(addr);
    int xAbs = (px << wsh) + xN;
    if ((unsigned)xAbs >= (unsigned)(st->mb_w << wsh))
      return {false, 0, 0, 0};
    if ((unsigned)line >= (unsigned)(st->pair_rows << bsh))
      return {false, 0, 0, 0};
    int pair_yN = line >> bsh;
    int pair = pair_yN * st->mb_w + (xAbs >> wsh);
    int local = line - (pair_yN << bsh);
    int addrN, yW;
    if (st->field_flag[pair]) {
      addrN = 2 * pair + (local & 1);
      yW = local >> 1;
    } else {
      int half = 1 << (bsh - 1);
      if (local < half) {
        addrN = 2 * pair;
        yW = local;
      } else {
        addrN = 2 * pair + 1;
        yW = local - half;
      }
    }
    if (addrN != addr) {
      if (addrN >= cur_addr) return {false, 0, 0, 0};
      if (st->slice_id[addrN] != sid) return {false, 0, 0, 0};
    }
    return {true, addrN, xAbs & ((1 << wsh) - 1), yW};
  }
  Nbr nbr(int addr, int xN, int yN, bool chroma) const {
    if (chroma)
      return nbr_impl(addr, xN, yN, st->chroma_y(addr, yN), 3, 4);
    return nbr_impl(addr, xN, yN, st->luma_y(addr, yN), 4, 5);
  }
  Nbr nbr_intra(int addr, int xN, int yN, bool chroma) const {
    Nbr r = nbr(addr, xN, yN, chroma);
    if (!r.ok) return r;
    if (r.addr == addr) {
      if (!chroma && xy_to_z(r.xW >> 2, r.yW >> 2) >= cur_z)
        return {false, 0, 0, 0};
      return r;
    }
    if (pps->constrained_intra_pred && !st->is_intra(r.addr))
      return {false, 0, 0, 0};
    return r;
  }
  int luma_sample(const Nbr& r) const {
    return pic->Y[(size_t)st->luma_y(r.addr, r.yW) * pic->w +
                  st->luma_x0(r.addr) + r.xW];
  }
  int chroma_sample(const uint8_t* plane, const Nbr& r) const {
    return plane[(size_t)st->chroma_y(r.addr, r.yW) * pic->cw +
                 st->pair_x(r.addr) * 8 + r.xW];
  }

  // -- CAVLC nC -----------------------------------------------------------
  int nc_luma(int addr, int x4, int y4) const {
    int na = -1000, nb = -1000;
    Nbr r = nbr(addr, 4 * x4 - 1, 4 * y4, false);
    if (r.ok) na = st->nnz_y[st->cell(r.addr, 4 * (r.yW >> 2) + (r.xW >> 2))];
    r = nbr(addr, 4 * x4, 4 * y4 - 1, false);
    if (r.ok) nb = st->nnz_y[st->cell(r.addr, 4 * (r.yW >> 2) + (r.xW >> 2))];
    bool ha = na != -1000, hb = nb != -1000;
    if (ha && hb) return (na + nb + 1) >> 1;
    if (ha) return na;
    if (hb) return nb;
    return 0;
  }
  int nc_chroma(int addr, int comp, int cx, int cy) const {
    int na = -1000, nb = -1000;
    Nbr r = nbr(addr, 4 * cx - 1, 4 * cy, true);
    if (r.ok)
      na = st->nnz_c[st->ccell(r.addr, comp, 2 * (r.yW >> 2) + (r.xW >> 2))];
    r = nbr(addr, 4 * cx, 4 * cy - 1, true);
    if (r.ok)
      nb = st->nnz_c[st->ccell(r.addr, comp, 2 * (r.yW >> 2) + (r.xW >> 2))];
    bool ha = na != -1000, hb = nb != -1000;
    if (ha && hb) return (na + nb + 1) >> 1;
    if (ha) return na;
    if (hb) return nb;
    return 0;
  }

  // -- intra mode inference ----------------------------------------------
  int i4_mode_nbr(int addr, int xN, int yN) const {
    Nbr r = nbr_intra(addr, xN, yN, false);
    if (!r.ok) return -1000;
    int cellix = 4 * (r.yW >> 2) + (r.xW >> 2);
    if (r.addr == addr) return st->i4_modes[st->cell(addr, cellix)];
    int cls = st->mb_class[r.addr];
    if (cls == MB_I4 || cls == MB_I8)
      return st->i4_modes[st->cell(r.addr, cellix)];
    return 2;
  }

  void mark_mb(int addr) {
    st->slice_id[addr] = sid;
    st->mb_alpha_off[addr] = h->slice_alpha_c0_offset_div2 * 2;
    st->mb_beta_off[addr] = h->slice_beta_offset_div2 * 2;
    st->mb_disable[addr] = h->disable_deblocking_filter_idc;
  }

  int infer_field_flag(int pair) const {
    int px = pair % st->mb_w, py = pair / st->mb_w;
    if (px > 0 && st->slice_id[2 * (pair - 1)] == sid)
      return st->field_flag[pair - 1];
    if (py > 0 && st->slice_id[2 * (pair - st->mb_w)] == sid)
      return st->field_flag[pair - st->mb_w];
    return 0;
  }

  // -- intra reconstruction ----------------------------------------------
  void recon_i4_block(int addr, int k, int mode, const int* coeffs) {
    int x4 = kZtoX[k], y4 = kZtoY[k];
    int xN0 = 4 * x4, yN0 = 4 * y4;
    bool avail_l = nbr_intra(addr, xN0 - 1, yN0, false).ok;
    bool avail_t = nbr_intra(addr, xN0, yN0 - 1, false).ok;
    bool avail_tl = nbr_intra(addr, xN0 - 1, yN0 - 1, false).ok;
    bool avail_tr = nbr_intra(addr, xN0 + 4, yN0 - 1, false).ok;
    Nbr4 n;
    for (int i = 0; i < 4; ++i) {
      Nbr r = nbr_intra(addr, xN0 - 1, yN0 + i, false);
      n.l[i] = r.ok ? luma_sample(r) : 0;
    }
    for (int i = 0; i < 4; ++i) {
      Nbr r = nbr_intra(addr, xN0 + i, yN0 - 1, false);
      n.t[i] = r.ok ? luma_sample(r) : 0;
    }
    {
      Nbr r = nbr_intra(addr, xN0 - 1, yN0 - 1, false);
      n.tl = r.ok ? luma_sample(r) : 0;
    }
    if (avail_tr) {
      for (int i = 0; i < 4; ++i) {
        Nbr r = nbr_intra(addr, xN0 + 4 + i, yN0 - 1, false);
        n.tr[i] = r.ok ? luma_sample(r) : 0;
      }
    } else if (avail_t) {
      for (int i = 0; i < 4; ++i) n.tr[i] = n.t[3];
    } else {
      for (int i = 0; i < 4; ++i) n.tr[i] = 0;
    }
    int pred[4][4];
    pred4x4(mode, n, avail_l, avail_t, avail_tl, pred);
    int x0 = st->luma_x0(addr) + xN0;
    uint8_t* Y = pic->Y.data();
    if (!coeffs) {
      for (int yy = 0; yy < 4; ++yy) {
        uint8_t* row = Y + (size_t)st->luma_y(addr, yN0 + yy) * pic->w;
        for (int xx = 0; xx < 4; ++xx) row[x0 + xx] = (uint8_t)pred[yy][xx];
      }
      return;
    }
    const uint8_t* scan = scan4(addr);
    const int32_t* dq = dq4(qp, 0);
    int d[16], res[16];
    std::memset(d, 0, sizeof(d));
    for (int s = 0; s < 16; ++s) {
      int c = coeffs[s];
      if (c) {
        int pos = scan[s];
        d[pos] = dequant4_apply(c, dq[pos], qp);
      }
    }
    idct4x4(d, res);
    for (int yy = 0; yy < 4; ++yy) {
      uint8_t* row = Y + (size_t)st->luma_y(addr, yN0 + yy) * pic->w;
      for (int xx = 0; xx < 4; ++xx)
        row[x0 + xx] = (uint8_t)clip1(pred[yy][xx] + res[4 * yy + xx]);
    }
  }

  void recon_i8_block(int addr, int b, int mode, const int* scan64) {
    int bx = (b & 1) * 2, by = (b >> 1) * 2;
    int xN0 = 4 * bx, yN0 = 4 * by;
    bool avail_l = nbr_intra(addr, xN0 - 1, yN0, false).ok;
    bool avail_t = nbr_intra(addr, xN0, yN0 - 1, false).ok;
    bool avail_tl = nbr_intra(addr, xN0 - 1, yN0 - 1, false).ok;
    bool avail_tr = nbr_intra(addr, xN0 + 8, yN0 - 1, false).ok;
    int left[8] = {}, top[16] = {}, tl = 0;
    if (avail_l)
      for (int i = 0; i < 8; ++i) {
        Nbr r = nbr_intra(addr, xN0 - 1, yN0 + i, false);
        left[i] = r.ok ? luma_sample(r) : 0;
      }
    if (avail_t) {
      for (int i = 0; i < 8; ++i) {
        Nbr r = nbr_intra(addr, xN0 + i, yN0 - 1, false);
        top[i] = r.ok ? luma_sample(r) : 0;
      }
      if (avail_tr)
        for (int i = 0; i < 8; ++i) {
          Nbr r = nbr_intra(addr, xN0 + 8 + i, yN0 - 1, false);
          top[8 + i] = r.ok ? luma_sample(r) : 0;
        }
      else
        for (int i = 0; i < 8; ++i) top[8 + i] = top[7];
    }
    if (avail_tl) {
      Nbr r = nbr_intra(addr, xN0 - 1, yN0 - 1, false);
      tl = r.ok ? luma_sample(r) : 0;
    }
    int fl[8] = {}, ft[16] = {}, ftl = 0;
    filter_i8_refs(avail_l ? left : nullptr, avail_t ? top : nullptr, tl,
                   avail_l, avail_t, avail_tl, fl, ft, &ftl);
    int pred[8][8];
    pred8x8(mode, fl, ft, ftl, avail_l, avail_t, avail_tl, pred);
    int x0 = st->luma_x0(addr) + xN0;
    uint8_t* Y = pic->Y.data();
    if (!scan64) {
      for (int yy = 0; yy < 8; ++yy) {
        uint8_t* row = Y + (size_t)st->luma_y(addr, yN0 + yy) * pic->w;
        for (int xx = 0; xx < 8; ++xx) row[x0 + xx] = (uint8_t)pred[yy][xx];
      }
      return;
    }
    const uint8_t* scan = scan8(addr);
    const int32_t* ls = dq8(qp, 0);
    int d[64], res[64];
    std::memset(d, 0, sizeof(d));
    for (int s = 0; s < 64; ++s) {
      int c = scan64[s];
      if (c) {
        int pos = scan[s];
        d[pos] = dequant8_apply(c, ls[pos], qp);
      }
    }
    idct8x8(d, res);
    for (int yy = 0; yy < 8; ++yy) {
      uint8_t* row = Y + (size_t)st->luma_y(addr, yN0 + yy) * pic->w;
      for (int xx = 0; xx < 8; ++xx)
        row[x0 + xx] = (uint8_t)clip1(pred[yy][xx] + res[8 * yy + xx]);
    }
  }

  void recon_i16(int addr, int pred_mode, const int* dc_scan,
                 const int* coeffs[16]) {
    bool avail_l = nbr_intra(addr, -1, 0, false).ok;
    bool avail_t = nbr_intra(addr, 0, -1, false).ok;
    int left[16] = {}, top[16] = {}, tl = 0;
    if (avail_l)
      for (int i = 0; i < 16; ++i) {
        Nbr r = nbr_intra(addr, -1, i, false);
        left[i] = r.ok ? luma_sample(r) : 0;
      }
    if (avail_t)
      for (int i = 0; i < 16; ++i) {
        Nbr r = nbr_intra(addr, i, -1, false);
        top[i] = r.ok ? luma_sample(r) : 0;
      }
    {
      Nbr r = nbr_intra(addr, -1, -1, false);
      tl = r.ok ? luma_sample(r) : 0;
    }
    int pred[256];
    pred16x16(pred_mode, left, top, tl, avail_l, avail_t, pred);
    const uint8_t* scan = scan4(addr);
    int dcr[16];
    for (int s = 0; s < 16; ++s) dcr[scan[s]] = dc_scan[s];
    int f[16], dc[16];
    hadamard4x4(dcr, f);
    luma_dc_dequant(f, qp, w4[0][0], dc);
    const int32_t* dq = dq4(qp, 0);
    int x0 = st->luma_x0(addr);
    uint8_t* Y = pic->Y.data();
    for (int kk = 0; kk < 16; ++kk) {
      int x4 = kZtoX[kk], y4 = kZtoY[kk];
      int d[16], res[16];
      std::memset(d, 0, sizeof(d));
      if (coeffs[kk]) {
        for (int s = 0; s < 15; ++s) {
          int c = coeffs[kk][s];
          if (c) {
            int pos = scan[s + 1];
            d[pos] = dequant4_apply(c, dq[pos], qp);
          }
        }
      }
      d[0] = dc[4 * y4 + x4];
      idct4x4(d, res);
      for (int yy = 0; yy < 4; ++yy) {
        uint8_t* row =
            Y + (size_t)st->luma_y(addr, 4 * y4 + yy) * pic->w;
        for (int xx = 0; xx < 4; ++xx)
          row[x0 + 4 * x4 + xx] = (uint8_t)clip1(
              pred[16 * (4 * y4 + yy) + 4 * x4 + xx] + res[4 * yy + xx]);
      }
    }
  }

  void recon_chroma(int addr, int chroma_mode, int dc_scan[2][4],
                    const int* coeffs[2][4], bool intra) {
    int qpc[2] = {chroma_qp_map(qp, pps->chroma_qp_index_offset),
                  chroma_qp_map(qp, pps->second_chroma_qp_index_offset)};
    int cx0 = st->pair_x(addr) * 8;
    const uint8_t* scan = scan4(addr);
    for (int comp = 0; comp < 2; ++comp) {
      uint8_t* plane = comp ? pic->V.data() : pic->U.data();
      int pred[64];
      if (intra) {
        bool avail_l = nbr_intra(addr, -1, 0, true).ok;
        bool avail_t = nbr_intra(addr, 0, -1, true).ok;
        int left[8] = {}, top[8] = {}, tl = 0;
        if (avail_l)
          for (int i = 0; i < 8; ++i) {
            Nbr r = nbr_intra(addr, -1, i, true);
            left[i] = r.ok ? chroma_sample(plane, r) : 0;
          }
        if (avail_t)
          for (int i = 0; i < 8; ++i) {
            Nbr r = nbr_intra(addr, i, -1, true);
            top[i] = r.ok ? chroma_sample(plane, r) : 0;
          }
        {
          Nbr r = nbr_intra(addr, -1, -1, true);
          tl = r.ok ? chroma_sample(plane, r) : 0;
        }
        pred_chroma8x8(chroma_mode, left, top, tl, avail_l, avail_t, pred);
      } else {
        const int* src = comp ? pred_chromaV : pred_chromaU;
        std::memcpy(pred, src, sizeof(pred));
      }
      int qpcc = qpc[comp];
      int li = intra ? (1 + comp) : (4 + comp);
      int c0 = dc_scan[comp][0], c1 = dc_scan[comp][1];
      int c2 = dc_scan[comp][2], c3 = dc_scan[comp][3];
      int f[4] = {c0 + c1 + c2 + c3, c0 - c1 + c2 - c3, c0 + c1 - c2 - c3,
                  c0 - c1 - c2 + c3};
      int dc[4];
      chroma_dc_dequant(f, qpcc, w4[li][0], dc);
      const int32_t* dq = dq4(qpcc, li);
      int out[64];
      std::memcpy(out, pred, sizeof(out));
      for (int b = 0; b < 4; ++b) {
        int bx = 4 * (b & 1), by = 4 * (b >> 1);
        int d[16];
        std::memset(d, 0, sizeof(d));
        if (coeffs[comp][b]) {
          for (int s = 0; s < 15; ++s) {
            int c = coeffs[comp][b][s];
            if (c) {
              int pos = scan[s + 1];
              d[pos] = dequant4_apply(c, dq[pos], qpcc);
            }
          }
        }
        d[0] = dc[b];
        bool any = false;
        for (int i = 0; i < 16; ++i) any |= d[i] != 0;
        if (any) {
          int res[16];
          idct4x4(d, res);
          for (int yy = 0; yy < 4; ++yy)
            for (int xx = 0; xx < 4; ++xx)
              out[8 * (by + yy) + bx + xx] =
                  clip1(pred[8 * (by + yy) + bx + xx] + res[4 * yy + xx]);
        }
      }
      for (int yy = 0; yy < 8; ++yy) {
        uint8_t* row = plane + (size_t)st->chroma_y(addr, yy) * pic->cw;
        for (int xx = 0; xx < 8; ++xx)
          row[cx0 + xx] = (uint8_t)clamp_i(out[8 * yy + xx], 0, 255);
      }
    }
  }

  // -- CAVLC I macroblocks ------------------------------------------------
  void parse_luma8x8_cavlc(BitReader& r, int addr, int b, int* scan64) {
    std::memset(scan64, 0, 64 * sizeof(int));
    int blk[16];
    for (int i = 0; i < 4; ++i) {
      int z = 4 * b + i;
      int x4 = kZtoX[z], y4 = kZtoY[z];
      cur_z = z;
      int nc = nc_luma(addr, x4, y4);
      int tc = cavlc_block(r, nc, 16, blk);
      st->nnz_y[st->cell(addr, 4 * y4 + x4)] = (int8_t)tc;
      for (int k = 0; k < 16; ++k) scan64[4 * k + i] = blk[k];
    }
  }

  void decode_ipcm(BitReader& r, int addr) {
    r.byte_align();
    int x0 = st->luma_x0(addr);
    for (int yy = 0; yy < 16; ++yy) {
      uint8_t* row = pic->Y.data() + (size_t)st->luma_y(addr, yy) * pic->w;
      for (int xx = 0; xx < 16; ++xx) row[x0 + xx] = (uint8_t)r.read(8);
    }
    int cx0 = st->pair_x(addr) * 8;
    for (int comp = 0; comp < 2; ++comp) {
      uint8_t* plane = comp ? pic->V.data() : pic->U.data();
      for (int yy = 0; yy < 8; ++yy) {
        uint8_t* row = plane + (size_t)st->chroma_y(addr, yy) * pic->cw;
        for (int xx = 0; xx < 8; ++xx) row[cx0 + xx] = (uint8_t)r.read(8);
      }
    }
    set_ipcm_state(addr);
  }

  void set_ipcm_state(int addr) {
    st->mb_class[addr] = MB_IPCM;
    for (int c = 0; c < 16; ++c) {
      st->nnz_y[st->cell(addr, c)] = 16;
      st->cbf_y[st->cell(addr, c)] = 1;
    }
    for (int comp = 0; comp < 2; ++comp)
      for (int c = 0; c < 4; ++c) {
        st->nnz_c[st->ccell(addr, comp, c)] = 16;
        st->cbf_c[st->ccell(addr, comp, c)] = 1;
      }
    st->mb_qp[addr] = 0;
    st->mb_cbp[addr] = 0x2F;
  }

  void read_i4x4_modes(BitReader& r, int addr, int* modes) {
    for (int k = 0; k < 16; ++k) {
      int x4 = kZtoX[k], y4 = kZtoY[k];
      cur_z = k;
      int ma = i4_mode_nbr(addr, 4 * x4 - 1, 4 * y4);
      int mb_ = i4_mode_nbr(addr, 4 * x4, 4 * y4 - 1);
      int pred = (ma == -1000 || mb_ == -1000) ? 2 : std::min(ma, mb_);
      int mode;
      if (r.read1()) {
        mode = pred;
      } else {
        int rem = (int)r.read(3);
        mode = rem < pred ? rem : rem + 1;
      }
      modes[k] = mode;
      st->i4_modes[st->cell(addr, 4 * y4 + x4)] = (int8_t)mode;
    }
  }

  void read_i8x8_modes(BitReader& r, int addr, int* modes) {
    for (int b = 0; b < 4; ++b) {
      int bx = (b & 1) * 2, by = (b >> 1) * 2;
      cur_z = xy_to_z(bx, by);
      int ma = i4_mode_nbr(addr, 4 * bx - 1, 4 * by);
      int mb_ = i4_mode_nbr(addr, 4 * bx, 4 * by - 1);
      int pred = (ma == -1000 || mb_ == -1000) ? 2 : std::min(ma, mb_);
      int mode;
      if (r.read1()) {
        mode = pred;
      } else {
        int rem = (int)r.read(3);
        mode = rem < pred ? rem : rem + 1;
      }
      modes[b] = mode;
      for (int dy = 0; dy < 2; ++dy)
        for (int dx = 0; dx < 2; ++dx)
          st->i4_modes[st->cell(addr, 4 * (by + dy) + bx + dx)] =
              (int8_t)mode;
    }
  }

  void decode_chroma_cavlc(BitReader& r, int addr, int chroma_mode,
                           int cbp_chroma, bool intra) {
    int dc_scan[2][4] = {{0, 0, 0, 0}, {0, 0, 0, 0}};
    if (cbp_chroma) {
      for (int comp = 0; comp < 2; ++comp) {
        int blk[4];
        int tc = cavlc_block(r, -1, 4, blk);
        for (int i = 0; i < 4; ++i) dc_scan[comp][i] = blk[i];
        if (tc) st->mb_dc_flag[addr] |= 2 << comp;
      }
    }
    int coeffs[2][4][15];
    bool has[2][4] = {};
    if (cbp_chroma & 2) {
      for (int comp = 0; comp < 2; ++comp)
        for (int b = 0; b < 4; ++b) {
          int cx = b & 1, cy = b >> 1;
          int nc = nc_chroma(addr, comp, cx, cy);
          int tc = cavlc_block(r, nc, 15, coeffs[comp][b]);
          has[comp][b] = true;
          st->nnz_c[st->ccell(addr, comp, 2 * cy + cx)] = (int8_t)tc;
        }
    }
    const int* cptr[2][4];
    for (int comp = 0; comp < 2; ++comp)
      for (int b = 0; b < 4; ++b)
        cptr[comp][b] = has[comp][b] ? coeffs[comp][b] : nullptr;
    recon_chroma(addr, chroma_mode, dc_scan, cptr, intra);
  }

  void decode_i4x4(BitReader& r, int addr) {
    int tf8 = 0;
    if (pps->transform_8x8_mode) tf8 = r.read1();
    if (tf8) {
      decode_i8x8_mb(r, addr);
      return;
    }
    st->mb_class[addr] = MB_I4;
    int modes[16];
    read_i4x4_modes(r, addr, modes);
    int chroma_mode = r.ue();
    int gi = r.ue();
    if (gi >= 48) throw DecodeError("bad cbp golomb");
    int cbp = kGolombToIntraCbp[gi];
    int cbp_luma = cbp & 15, cbp_chroma = cbp >> 4;
    if (cbp) qp = ((qp + r.se()) % 52 + 52) % 52;
    st->mb_qp[addr] = qp;
    st->mb_cbp[addr] = cbp;
    st->mb_chroma_mode[addr] = (int8_t)chroma_mode;
    int coeffs[16][16];
    bool has[16] = {};
    for (int k = 0; k < 16; ++k) {
      if (cbp_luma & (1 << (k >> 2))) {
        int x4 = kZtoX[k], y4 = kZtoY[k];
        cur_z = k;
        int nc = nc_luma(addr, x4, y4);
        int tc = cavlc_block(r, nc, 16, coeffs[k]);
        has[k] = true;
        st->nnz_y[st->cell(addr, 4 * y4 + x4)] = (int8_t)tc;
      }
    }
    for (int k = 0; k < 16; ++k) {
      cur_z = k;
      recon_i4_block(addr, k, modes[k], has[k] ? coeffs[k] : nullptr);
    }
    cur_z = 16;
    decode_chroma_cavlc(r, addr, chroma_mode, cbp_chroma, true);
  }

  void decode_i8x8_mb(BitReader& r, int addr) {
    st->mb_class[addr] = MB_I8;
    st->mb_tf8[addr] = 1;
    int modes[4];
    read_i8x8_modes(r, addr, modes);
    int chroma_mode = r.ue();
    int gi = r.ue();
    if (gi >= 48) throw DecodeError("bad cbp golomb");
    int cbp = kGolombToIntraCbp[gi];
    int cbp_luma = cbp & 15, cbp_chroma = cbp >> 4;
    if (cbp) qp = ((qp + r.se()) % 52 + 52) % 52;
    st->mb_qp[addr] = qp;
    st->mb_cbp[addr] = cbp;
    st->mb_chroma_mode[addr] = (int8_t)chroma_mode;
    int coeffs[4][64];
    bool has[4] = {};
    for (int b = 0; b < 4; ++b)
      if (cbp_luma & (1 << b)) {
        parse_luma8x8_cavlc(r, addr, b, coeffs[b]);
        has[b] = true;
      }
    for (int b = 0; b < 4; ++b) {
      cur_z = xy_to_z((b & 1) * 2, (b >> 1) * 2);
      recon_i8_block(addr, b, modes[b], has[b] ? coeffs[b] : nullptr);
    }
    cur_z = 16;
    decode_chroma_cavlc(r, addr, chroma_mode, cbp_chroma, true);
  }

  void decode_i16x16(BitReader& r, int addr, int k) {
    int pred_mode = k % 4;
    int cbp_chroma = (k / 4) % 3;
    int cbp_luma = k >= 12 ? 15 : 0;
    int chroma_mode = r.ue();
    qp = ((qp + r.se()) % 52 + 52) % 52;
    st->mb_class[addr] = MB_I16;
    st->mb_qp[addr] = qp;
    st->mb_cbp[addr] = cbp_luma | (cbp_chroma << 4);
    st->mb_chroma_mode[addr] = (int8_t)chroma_mode;
    cur_z = 0;
    int nc = nc_luma(addr, 0, 0);
    int dc_scan[16];
    int dc_tc = cavlc_block(r, nc, 16, dc_scan);
    if (dc_tc) st->mb_dc_flag[addr] |= 1;
    int coeffs[16][15];
    bool has[16] = {};
    for (int kk = 0; kk < 16; ++kk) {
      if (cbp_luma) {
        int x4 = kZtoX[kk], y4 = kZtoY[kk];
        cur_z = kk;
        int ncb = nc_luma(addr, x4, y4);
        int tc = cavlc_block(r, ncb, 15, coeffs[kk]);
        has[kk] = true;
        st->nnz_y[st->cell(addr, 4 * y4 + x4)] = (int8_t)tc;
      }
    }
    cur_z = 16;
    const int* cptr[16];
    for (int kk = 0; kk < 16; ++kk) cptr[kk] = has[kk] ? coeffs[kk] : nullptr;
    recon_i16(addr, pred_mode, dc_scan, cptr);
    decode_chroma_cavlc(r, addr, chroma_mode, cbp_chroma, true);
  }

  void decode_intra_mb_cavlc(BitReader& r, int addr, int imb) {
    if (imb == 25) {
      decode_ipcm(r, addr);
      return;
    }
    if (imb == 0)
      decode_i4x4(r, addr);
    else
      decode_i16x16(r, addr, imb - 1);
  }

  // -- inter (defined out-of-line below) ----------------------------------
  void field_ref(int l, int ref_idx, int addr, Picture** frm, int* parity);
  int32_t ref_identity(int l, int ref_idx, int addr);
  struct MvN {
    bool avail;
    int ref, mvx, mvy;
  };
  MvN mv_nbr(int addr, int xN, int yN, int l);
  void mv_pred(int addr, int bx4, int by4, int w4_, int h4_, int ref_idx,
               int part_kind, int part_i, int l, int* px, int* py);
  void store_part_mv(int addr, int bx4, int by4, int w4_, int h4_,
                     int ref_idx, int mvx, int mvy, int l);
  void store_part_mvd(int addr, int bx4, int by4, int w4_, int h4_, int l,
                      int mvdx, int mvdy);
  void fetch_pred(int addr, int l, int ref_idx, int bx4, int by4, int w4_,
                  int h4_, int mvx, int mvy, PredBlk& out);
  void wp_apply(int* blk, int n, int l, int ref_idx, int comp, int addr);
  void implicit_weights(int addr, int r0, int r1, int* w0, int* w1);
  void combine_store(int addr, int* predY, int* predU, int* predV, int bx4,
                     int by4, int w4_, int h4_, PredBlk* p0, PredBlk* p1,
                     int ref_idx0, int ref_idx1);
  void mc_part(int addr, int* predY, int* predU, int* predV, int bx4,
               int by4, int w4_, int h4_, int ref_idx, int mvx, int mvy);
  void store_mb(int addr, const int* predY, const int* predU,
                const int* predV);
  int n_act(int addr, int l) const;
  void skip_mv(int addr, int* mvx, int* mvy);
  void decode_skip_mb(int addr);
  void decode_p_skip(int addr);
  void decode_p_mb(BitReader& r, int addr, int mb_type);
  void inter_residual(BitReader& r, int addr, int* predY, int* predU,
                      int* predV, bool tf8_ok);
  bool col_zero(int addr, int b);
  // colocated corner-4x4 motion with MBAFF selection + vertMvScale
  // (8.4.1.2.2); false when intra. rid uses the ref_identity encoding.
  bool col_fetch(int addr, int b, int* ref, int32_t* rid, int mv[2]);
  int map_col_ref(int addr, int32_t rid);
  void direct_temporal_8x8(int addr, int b, int refs_out[2],
                           int mvs_out[2][2]);
  void direct_spatial_cache(int addr);
  void direct_mvs_8x8(int addr, int b, int refs_out[2], int mvs_out[2][2]);
  void decode_direct_8x8(int addr, int b, int* predY, int* predU,
                         int* predV);
  void decode_b_skip(int addr);
  void decode_b_mb(BitReader& r, int addr, int mb_type);
  void decode_cavlc(BitReader& r);
  // CABAC
  void decode_cabac(const std::vector<uint8_t>& rbsp);
  void decode_mb_cabac(MbaffCabac& cb, int addr);
  void decode_intra_mb_cabac(MbaffCabac& cb, int addr, int imb);
  void decode_ipcm_cabac(MbaffCabac& cb, int addr);
  void qp_delta_cabac(MbaffCabac& cb, int addr, int cbp, bool always);
  bool luma4_res_cabac(MbaffCabac& cb, int addr, int k, int cat, int* blk);
  void decode_i4x4_cabac(MbaffCabac& cb, int addr);
  void decode_i8x8_cabac(MbaffCabac& cb, int addr);
  void decode_i16_cabac(MbaffCabac& cb, int addr, int k);
  void decode_chroma_cabac(MbaffCabac& cb, int addr, int chroma_mode,
                           int cbp_chroma, bool intra);
  void part_motion_cabac(MbaffCabac& cb, int addr, int l, int bx4, int by4,
                         int w4_, int h4_, int ref_idx, int kind, int part_i,
                         int* mvx, int* mvy);
  void decode_p_mb_cabac(MbaffCabac& cb, int addr, int mb_type);
  void decode_b_mb_cabac(MbaffCabac& cb, int addr, int mb_type);
  void inter_residual_cabac(MbaffCabac& cb, int addr, int* predY,
                            int* predU, int* predV, bool tf8_ok);
};

}  // namespace h264

namespace h264 {

// ---------------------------------------------------------------------------
// MbaffSlice inter machinery (h264_mbaff.py P/B stages)
// ---------------------------------------------------------------------------

void MbaffSlice::field_ref(int l, int ref_idx, int addr, Picture** frm,
                           int* parity) {
  const std::vector<Picture*>& lst = l == 0 ? ref_l0 : ref_l1;
  if (ref_idx < 0 || (size_t)(ref_idx >> 1) >= lst.size())
    throw DecodeError("field reference index out of range");
  *frm = lst[ref_idx >> 1];
  int cur_parity = addr & 1;
  *parity = (ref_idx & 1) == 0 ? cur_parity : 1 - cur_parity;
}

int32_t MbaffSlice::ref_identity(int l, int ref_idx, int addr) {
  if (st->is_field(addr)) {
    Picture* frm;
    int parity;
    field_ref(l, ref_idx, addr, &frm, &parity);
    return 4 * frm->pic_id + parity;
  }
  const std::vector<Picture*>& lst = l == 0 ? ref_l0 : ref_l1;
  if (ref_idx < 0 || (size_t)ref_idx >= lst.size())
    throw DecodeError("reference index out of range");
  return 4 * lst[ref_idx]->pic_id + 3;
}

MbaffSlice::MvN MbaffSlice::mv_nbr(int addr, int xN, int yN, int l) {
  Nbr r = nbr(addr, xN, yN, false);
  if (!r.ok) return {false, -1, 0, 0};
  if (r.addr == addr && xy_to_z(r.xW >> 2, r.yW >> 2) >= cur_z)
    return {false, -1, 0, 0};
  int c = 4 * (r.yW >> 2) + (r.xW >> 2);
  int ref = st->ref_idx[st->mref(r.addr, l, c)];
  int mvx = st->mv[st->mmv(r.addr, l, c, 0)];
  int mvy = st->mv[st->mmv(r.addr, l, c, 1)];
  bool nf = st->is_field(r.addr);
  bool cf = st->is_field(addr);
  if (nf && !cf) {
    if (ref >= 0) ref >>= 1;
    mvy *= 2;
  } else if (cf && !nf) {
    if (ref >= 0) ref *= 2;
    mvy = mvy / 2;  // truncation toward zero (spec's '/')
  }
  return {true, ref, mvx, mvy};
}

void MbaffSlice::mv_pred(int addr, int bx4, int by4, int w4_, int h4_,
                         int ref_idx, int part_kind, int part_i, int l,
                         int* px, int* py) {
  int xN0 = 4 * bx4, yN0 = 4 * by4;
  MvN A = mv_nbr(addr, xN0 - 1, yN0, l);
  MvN B = mv_nbr(addr, xN0, yN0 - 1, l);
  MvN C = mv_nbr(addr, xN0 + 4 * w4_, yN0 - 1, l);
  if (!C.avail) C = mv_nbr(addr, xN0 - 1, yN0 - 1, l);
  int ra = A.ref, rb = B.ref, rc = C.ref;
  if (part_kind == 1) {
    if (part_i == 0 && rb == ref_idx) {
      *px = B.mvx;
      *py = B.mvy;
      return;
    }
    if (part_i == 1 && ra == ref_idx) {
      *px = A.mvx;
      *py = A.mvy;
      return;
    }
  } else if (part_kind == 2) {
    if (part_i == 0 && ra == ref_idx) {
      *px = A.mvx;
      *py = A.mvy;
      return;
    }
    if (part_i == 1 && rc == ref_idx) {
      *px = C.mvx;
      *py = C.mvy;
      return;
    }
  }
  bool ma = ra == ref_idx, mb_ = rb == ref_idx, mc = rc == ref_idx;
  if (ma && !mb_ && !mc) {
    *px = A.mvx;
    *py = A.mvy;
    return;
  }
  if (mb_ && !ma && !mc) {
    *px = B.mvx;
    *py = B.mvy;
    return;
  }
  if (mc && !ma && !mb_) {
    *px = C.mvx;
    *py = C.mvy;
    return;
  }
  if (!B.avail && !C.avail) {
    *px = A.mvx;
    *py = A.mvy;
    return;
  }
  *px = median3(A.mvx, B.mvx, C.mvx);
  *py = median3(A.mvy, B.mvy, C.mvy);
}

void MbaffSlice::store_part_mv(int addr, int bx4, int by4, int w4_, int h4_,
                               int ref_idx, int mvx, int mvy, int l) {
  int32_t rid = ref_identity(l, ref_idx, addr);
  for (int y = by4; y < by4 + h4_; ++y)
    for (int x = bx4; x < bx4 + w4_; ++x) {
      int c = 4 * y + x;
      st->mv[st->mmv(addr, l, c, 0)] = (int16_t)mvx;
      st->mv[st->mmv(addr, l, c, 1)] = (int16_t)mvy;
      st->ref_idx[st->mref(addr, l, c)] = (int8_t)ref_idx;
      st->ref_id[st->mref(addr, l, c)] = rid;
    }
}

void MbaffSlice::store_part_mvd(int addr, int bx4, int by4, int w4_, int h4_,
                                int l, int mvdx, int mvdy) {
  for (int y = by4; y < by4 + h4_; ++y)
    for (int x = bx4; x < bx4 + w4_; ++x) {
      int c = 4 * y + x;
      st->mvd[st->mmv(addr, l, c, 0)] = (int16_t)mvdx;
      st->mvd[st->mmv(addr, l, c, 1)] = (int16_t)mvdy;
    }
}

void MbaffSlice::fetch_pred(int addr, int l, int ref_idx, int bx4, int by4,
                            int w4_, int h4_, int mvx, int mvy,
                            PredBlk& out) {
  int py = st->pair_y(addr);
  int cmvy = mvy;
  const uint8_t *refY, *refU, *refV;
  long strideY, strideC;
  int H, CH, y0, cy0;
  if (st->is_field(addr)) {
    Picture* frm;
    int parity;
    field_ref(l, ref_idx, addr, &frm, &parity);
    refY = frm->Y.data() + (size_t)parity * frm->w;
    refU = frm->U.data() + (size_t)parity * frm->cw;
    refV = frm->V.data() + (size_t)parity * frm->cw;
    strideY = 2L * frm->w;
    strideC = 2L * frm->cw;
    H = frm->h / 2;
    CH = frm->ch / 2;
    y0 = py * 16 + 4 * by4;
    cy0 = py * 8 + 2 * by4;
    int cur_parity = addr & 1;
    if (cur_parity == 0 && parity == 1)
      cmvy = mvy - 2;
    else if (cur_parity == 1 && parity == 0)
      cmvy = mvy + 2;
  } else {
    const std::vector<Picture*>& lst = l == 0 ? ref_l0 : ref_l1;
    if (ref_idx < 0 || (size_t)ref_idx >= lst.size())
      throw DecodeError("reference index out of range");
    Picture* frm = lst[ref_idx];
    refY = frm->Y.data();
    refU = frm->U.data();
    refV = frm->V.data();
    strideY = frm->w;
    strideC = frm->cw;
    H = frm->h;
    CH = frm->ch;
    y0 = py * 32 + 16 * (addr & 1) + 4 * by4;
    cy0 = py * 16 + 8 * (addr & 1) + 2 * by4;
  }
  int x0 = st->luma_x0(addr) + 4 * bx4;
  int cx0 = st->pair_x(addr) * 8 + 2 * bx4;
  mc_luma_s(refY, pic->w, H, strideY, x0, y0, w4_ * 4, h4_ * 4, mvx, mvy,
            out.y);
  mc_chroma_s(refU, pic->cw, CH, strideC, cx0, cy0, w4_ * 2, h4_ * 2, mvx,
              cmvy, out.u);
  mc_chroma_s(refV, pic->cw, CH, strideC, cx0, cy0, w4_ * 2, h4_ * 2, mvx,
              cmvy, out.v);
}

void MbaffSlice::wp_apply(int* blk, int n, int l, int ref_idx, int comp,
                          int addr) {
  const PredWeights& pw = h->pred_weights;
  if (!pw.present) return;
  int widx = st->is_field(addr) ? (ref_idx >> 1) : ref_idx;
  if (widx < 0 || (size_t)widx >= pw.w[l].size())
    throw DecodeError("weight index out of range");
  int logwd = comp < 0 ? pw.luma_log2 : pw.chroma_log2;
  const std::array<int, 6>& wt = pw.w[l][widx];
  int w, o;
  if (comp < 0) {
    w = wt[0];
    o = wt[1];
  } else {
    w = wt[2 + 2 * comp];
    o = wt[3 + 2 * comp];
  }
  if (logwd >= 1) {
    for (int i = 0; i < n; ++i)
      blk[i] = clip1(((blk[i] * w + (1 << (logwd - 1))) >> logwd) + o);
  } else {
    for (int i = 0; i < n; ++i) blk[i] = clip1(blk[i] * w + o);
  }
}

void MbaffSlice::implicit_weights(int addr, int ref_idx0, int ref_idx1,
                                  int* w0, int* w1) {
  int poc0, poc1, cur;
  bool lt0, lt1;
  if (st->is_field(addr)) {
    Picture *f0, *f1;
    int p0, p1;
    field_ref(0, ref_idx0, addr, &f0, &p0);
    field_ref(1, ref_idx1, addr, &f1, &p1);
    poc0 = f0->field_poc[p0];
    poc1 = f1->field_poc[p1];
    cur = pic->field_poc[addr & 1];
    lt0 = f0->long_term;
    lt1 = f1->long_term;
  } else {
    if (ref_idx0 < 0 || (size_t)ref_idx0 >= ref_l0.size() ||
        ref_idx1 < 0 || (size_t)ref_idx1 >= ref_l1.size())
      throw DecodeError("reference index out of range");
    Picture* pic0 = ref_l0[ref_idx0];
    Picture* pic1 = ref_l1[ref_idx1];
    poc0 = pic0->poc;
    poc1 = pic1->poc;
    cur = pic->poc;
    lt0 = pic0->long_term;
    lt1 = pic1->long_term;
  }
  if (poc1 == poc0 || lt0 || lt1) {
    *w0 = *w1 = 32;
    return;
  }
  int tb = clamp_i(cur - poc0, -128, 127);
  int td = clamp_i(poc1 - poc0, -128, 127);
  int tx = floordiv(16384 + std::abs(td) / 2, td);
  int dsf = clamp_i((tb * tx + 32) >> 6, -1024, 1023);
  int v1 = dsf >> 2;
  if (v1 < -64 || v1 > 128) {
    *w0 = *w1 = 32;
    return;
  }
  *w0 = 64 - v1;
  *w1 = v1;
}

void MbaffSlice::combine_store(int addr, int* predY, int* predU, int* predV,
                               int bx4, int by4, int w4_, int h4_,
                               PredBlk* p0, PredBlk* p1, int ref_idx0,
                               int ref_idx1) {
  int lw = w4_ * 4, lh = h4_ * 4;
  int cw_ = w4_ * 2, ch_ = h4_ * 2;
  int nl = lw * lh, nc = cw_ * ch_;
  int oy[256], ou[64], ov[64];
  if (p0 && p1) {
    if (h->slice_type == SLICE_B && pps->weighted_bipred_idc == 2) {
      int w0, w1;
      implicit_weights(addr, ref_idx0, ref_idx1, &w0, &w1);
      for (int i = 0; i < nl; ++i)
        oy[i] = clip1((p0->y[i] * w0 + p1->y[i] * w1 + 32) >> 6);
      for (int i = 0; i < nc; ++i) {
        ou[i] = clip1((p0->u[i] * w0 + p1->u[i] * w1 + 32) >> 6);
        ov[i] = clip1((p0->v[i] * w0 + p1->v[i] * w1 + 32) >> 6);
      }
    } else if (h->slice_type == SLICE_B && pps->weighted_bipred_idc == 1 &&
               h->pred_weights.present) {
      const PredWeights& pw = h->pred_weights;
      bool fld = st->is_field(addr);
      int i0 = fld ? (ref_idx0 >> 1) : ref_idx0;
      int i1 = fld ? (ref_idx1 >> 1) : ref_idx1;
      if (i0 < 0 || (size_t)i0 >= pw.w[0].size() || i1 < 0 ||
          (size_t)i1 >= pw.w[1].size())
        throw DecodeError("weight index out of range");
      const std::array<int, 6>& wt0 = pw.w[0][i0];
      const std::array<int, 6>& wt1 = pw.w[1][i1];
      for (int c = 0; c < 3; ++c) {
        int logwd = c == 0 ? pw.luma_log2 : pw.chroma_log2;
        int w0, o0, w1, o1;
        if (c == 0) {
          w0 = wt0[0];
          o0 = wt0[1];
          w1 = wt1[0];
          o1 = wt1[1];
        } else {
          int k = 2 * c;
          w0 = wt0[k];
          o0 = wt0[k + 1];
          w1 = wt1[k];
          o1 = wt1[k + 1];
        }
        const int* s0 = c == 0 ? p0->y : c == 1 ? p0->u : p0->v;
        const int* s1 = c == 0 ? p1->y : c == 1 ? p1->u : p1->v;
        int* dst = c == 0 ? oy : c == 1 ? ou : ov;
        int n = c == 0 ? nl : nc;
        for (int i = 0; i < n; ++i)
          dst[i] = clip1(((s0[i] * w0 + s1[i] * w1 + (1 << logwd)) >>
                          (logwd + 1)) +
                         ((o0 + o1 + 1) >> 1));
      }
    } else {
      for (int i = 0; i < nl; ++i) oy[i] = (p0->y[i] + p1->y[i] + 1) >> 1;
      for (int i = 0; i < nc; ++i) {
        ou[i] = (p0->u[i] + p1->u[i] + 1) >> 1;
        ov[i] = (p0->v[i] + p1->v[i] + 1) >> 1;
      }
    }
  } else {
    int l = p1 ? 1 : 0;
    PredBlk* p = p1 ? p1 : p0;
    int ref_idx = p1 ? ref_idx1 : ref_idx0;
    bool weighted =
        h->pred_weights.present &&
        (h->slice_type != SLICE_B || pps->weighted_bipred_idc == 1);
    std::memcpy(oy, p->y, nl * sizeof(int));
    std::memcpy(ou, p->u, nc * sizeof(int));
    std::memcpy(ov, p->v, nc * sizeof(int));
    if (weighted) {
      wp_apply(oy, nl, l, ref_idx, -1, addr);
      wp_apply(ou, nc, l, ref_idx, 0, addr);
      wp_apply(ov, nc, l, ref_idx, 1, addr);
    }
  }
  for (int y = 0; y < lh; ++y)
    for (int x = 0; x < lw; ++x)
      predY[16 * (by4 * 4 + y) + bx4 * 4 + x] = oy[y * lw + x];
  for (int y = 0; y < ch_; ++y)
    for (int x = 0; x < cw_; ++x) {
      predU[8 * (by4 * 2 + y) + bx4 * 2 + x] = ou[y * cw_ + x];
      predV[8 * (by4 * 2 + y) + bx4 * 2 + x] = ov[y * cw_ + x];
    }
}

void MbaffSlice::mc_part(int addr, int* predY, int* predU, int* predV,
                         int bx4, int by4, int w4_, int h4_, int ref_idx,
                         int mvx, int mvy) {
  PredBlk p0;
  fetch_pred(addr, 0, ref_idx, bx4, by4, w4_, h4_, mvx, mvy, p0);
  combine_store(addr, predY, predU, predV, bx4, by4, w4_, h4_, &p0, nullptr,
                ref_idx, -1);
}

void MbaffSlice::store_mb(int addr, const int* predY, const int* predU,
                          const int* predV) {
  int x0 = st->luma_x0(addr);
  uint8_t* Y = pic->Y.data();
  for (int yy = 0; yy < 16; ++yy) {
    uint8_t* row = Y + (size_t)st->luma_y(addr, yy) * pic->w;
    for (int xx = 0; xx < 16; ++xx)
      row[x0 + xx] = (uint8_t)clamp_i(predY[16 * yy + xx], 0, 255);
  }
  int cx0 = st->pair_x(addr) * 8;
  for (int comp = 0; comp < 2; ++comp) {
    uint8_t* plane = comp ? pic->V.data() : pic->U.data();
    const int* pred = comp ? predV : predU;
    for (int yy = 0; yy < 8; ++yy) {
      uint8_t* row = plane + (size_t)st->chroma_y(addr, yy) * pic->cw;
      for (int xx = 0; xx < 8; ++xx)
        row[cx0 + xx] = (uint8_t)clamp_i(pred[8 * yy + xx], 0, 255);
    }
  }
}

int MbaffSlice::n_act(int addr, int l) const {
  int n = h->num_ref_idx[l];
  return st->is_field(addr) ? 2 * n : n;
}

void MbaffSlice::skip_mv(int addr, int* mvx, int* mvy) {
  MvN A = mv_nbr(addr, -1, 0, 0);
  MvN B = mv_nbr(addr, 0, -1, 0);
  if (!A.avail || !B.avail) {
    *mvx = *mvy = 0;
    return;
  }
  if (A.ref == 0 && A.mvx == 0 && A.mvy == 0) {
    *mvx = *mvy = 0;
    return;
  }
  if (B.ref == 0 && B.mvx == 0 && B.mvy == 0) {
    *mvx = *mvy = 0;
    return;
  }
  mv_pred(addr, 0, 0, 4, 4, 0, 0, 0, 0, mvx, mvy);
}

void MbaffSlice::decode_skip_mb(int addr) {
  if (h->slice_type == SLICE_B) {
    decode_b_skip(addr);
    return;
  }
  decode_p_skip(addr);
}

void MbaffSlice::decode_p_skip(int addr) {
  mark_mb(addr);
  cur_addr = addr;
  cur_z = 0;
  st->mb_class[addr] = MB_P;
  st->mb_qp[addr] = qp;
  st->mb_cbp[addr] = 0;
  st->mb_skip[addr] = 1;
  int mvx, mvy;
  skip_mv(addr, &mvx, &mvy);
  cur_z = 16;
  store_part_mv(addr, 0, 0, 4, 4, 0, mvx, mvy, 0);
  int predY[256], predU[64], predV[64];
  mc_part(addr, predY, predU, predV, 0, 0, 4, 4, 0, mvx, mvy);
  store_mb(addr, predY, predU, predV);
}

void MbaffSlice::decode_p_mb(BitReader& r, int addr, int mb_type) {
  st->mb_class[addr] = MB_P;
  int n0 = n_act(addr, 0);
  int predY[256], predU[64], predV[64];
  std::vector<int> sub_types;
  if (mb_type <= 2) {
    int kind, np;
    const SliceCtx::Part* parts = SliceCtx::p_parts(mb_type, &kind, &np);
    int refs[2];
    for (int i = 0; i < np; ++i) refs[i] = SliceCtx::read_te(r, n0 - 1);
    for (int i = 0; i < np; ++i) {
      int mvdx = r.se(), mvdy = r.se();
      cur_z = xy_to_z(parts[i].bx4, parts[i].by4);
      int px, py;
      mv_pred(addr, parts[i].bx4, parts[i].by4, parts[i].w4, parts[i].h4,
              refs[i], kind, i, 0, &px, &py);
      int mvx = px + mvdx, mvy = py + mvdy;
      store_part_mv(addr, parts[i].bx4, parts[i].by4, parts[i].w4,
                    parts[i].h4, refs[i], mvx, mvy, 0);
      store_part_mvd(addr, parts[i].bx4, parts[i].by4, parts[i].w4,
                     parts[i].h4, 0, mvdx, mvdy);
      mc_part(addr, predY, predU, predV, parts[i].bx4, parts[i].by4,
              parts[i].w4, parts[i].h4, refs[i], mvx, mvy);
    }
  } else {
    sub_types.resize(4);
    for (int b = 0; b < 4; ++b) {
      sub_types[b] = r.ue();
      if (sub_types[b] > 3) throw DecodeError("bad sub_mb_type");
    }
    int refs[4] = {0, 0, 0, 0};
    if (mb_type == 3)
      for (int b = 0; b < 4; ++b) refs[b] = SliceCtx::read_te(r, n0 - 1);
    for (int b = 0; b < 4; ++b) {
      int bx0 = (b & 1) * 2, by0 = (b >> 1) * 2;
      int ns;
      const SliceCtx::Part* sp = SliceCtx::sub_parts(sub_types[b], &ns);
      for (int s = 0; s < ns; ++s) {
        int bx4 = bx0 + sp[s].bx4, by4 = by0 + sp[s].by4;
        int mvdx = r.se(), mvdy = r.se();
        cur_z = xy_to_z(bx4, by4);
        int px, py;
        mv_pred(addr, bx4, by4, sp[s].w4, sp[s].h4, refs[b], 0, 0, 0, &px,
                &py);
        int mvx = px + mvdx, mvy = py + mvdy;
        store_part_mv(addr, bx4, by4, sp[s].w4, sp[s].h4, refs[b], mvx, mvy,
                      0);
        store_part_mvd(addr, bx4, by4, sp[s].w4, sp[s].h4, 0, mvdx, mvdy);
        mc_part(addr, predY, predU, predV, bx4, by4, sp[s].w4, sp[s].h4,
                refs[b], mvx, mvy);
      }
    }
  }
  cur_z = 16;
  bool tf8_ok = mb_type <= 2;
  if (!tf8_ok) {
    tf8_ok = true;
    for (int stp : sub_types) tf8_ok &= (stp == 0);
  }
  inter_residual(r, addr, predY, predU, predV, tf8_ok);
}

void MbaffSlice::inter_residual(BitReader& r, int addr, int* predY,
                                int* predU, int* predV, bool tf8_ok) {
  int gi = r.ue();
  if (gi >= 48) throw DecodeError("bad cbp golomb");
  int cbp = kGolombToInterCbp[gi];
  int cbp_luma = cbp & 15, cbp_chroma = cbp >> 4;
  int tf8 = 0;
  if (cbp_luma && tf8_ok && pps->transform_8x8_mode) tf8 = r.read1();
  st->mb_tf8[addr] = (int8_t)tf8;
  if (cbp) qp = ((qp + r.se()) % 52 + 52) % 52;
  st->mb_qp[addr] = qp;
  st->mb_cbp[addr] = cbp;
  int x0 = st->luma_x0(addr);
  uint8_t* Y = pic->Y.data();
  if (tf8) {
    const uint8_t* scan = scan8(addr);
    for (int b = 0; b < 4; ++b) {
      int bx = (b & 1) * 2, by = (b >> 1) * 2;
      if (!(cbp_luma & (1 << b))) {
        for (int yy = 0; yy < 8; ++yy) {
          uint8_t* row =
              Y + (size_t)st->luma_y(addr, by * 4 + yy) * pic->w;
          for (int xx = 0; xx < 8; ++xx)
            row[x0 + bx * 4 + xx] = (uint8_t)clamp_i(
                predY[16 * (by * 4 + yy) + bx * 4 + xx], 0, 255);
        }
        continue;
      }
      int scan64[64];
      parse_luma8x8_cavlc(r, addr, b, scan64);
      const int32_t* ls = dq8(qp, 1);
      int d[64], res[64];
      std::memset(d, 0, sizeof(d));
      for (int s = 0; s < 64; ++s) {
        int c = scan64[s];
        if (c) {
          int pos = scan[s];
          d[pos] = dequant8_apply(c, ls[pos], qp);
        }
      }
      idct8x8(d, res);
      for (int yy = 0; yy < 8; ++yy) {
        uint8_t* row = Y + (size_t)st->luma_y(addr, by * 4 + yy) * pic->w;
        for (int xx = 0; xx < 8; ++xx)
          row[x0 + bx * 4 + xx] = (uint8_t)clip1(
              predY[16 * (by * 4 + yy) + bx * 4 + xx] + res[8 * yy + xx]);
      }
    }
    std::memcpy(pred_chromaU, predU, sizeof(pred_chromaU));
    std::memcpy(pred_chromaV, predV, sizeof(pred_chromaV));
    decode_chroma_cavlc(r, addr, 0, cbp_chroma, false);
    return;
  }
  const uint8_t* scan = scan4(addr);
  const int32_t* dq = dq4(qp, 3);
  for (int k = 0; k < 16; ++k) {
    int x4 = kZtoX[k], y4 = kZtoY[k];
    if (!(cbp_luma & (1 << (k >> 2)))) {
      for (int yy = 0; yy < 4; ++yy) {
        uint8_t* row = Y + (size_t)st->luma_y(addr, y4 * 4 + yy) * pic->w;
        for (int xx = 0; xx < 4; ++xx)
          row[x0 + x4 * 4 + xx] = (uint8_t)clamp_i(
              predY[16 * (y4 * 4 + yy) + x4 * 4 + xx], 0, 255);
      }
      continue;
    }
    cur_z = k;
    int nc = nc_luma(addr, x4, y4);
    int blk[16];
    int tc = cavlc_block(r, nc, 16, blk);
    st->nnz_y[st->cell(addr, 4 * y4 + x4)] = (int8_t)tc;
    int d[16], res[16];
    std::memset(d, 0, sizeof(d));
    for (int s = 0; s < 16; ++s) {
      int c = blk[s];
      if (c) {
        int pos = scan[s];
        d[pos] = dequant4_apply(c, dq[pos], qp);
      }
    }
    idct4x4(d, res);
    for (int yy = 0; yy < 4; ++yy) {
      uint8_t* row = Y + (size_t)st->luma_y(addr, y4 * 4 + yy) * pic->w;
      for (int xx = 0; xx < 4; ++xx)
        row[x0 + x4 * 4 + xx] = (uint8_t)clip1(
            predY[16 * (y4 * 4 + yy) + x4 * 4 + xx] + res[4 * yy + xx]);
    }
  }
  cur_z = 16;
  std::memcpy(pred_chromaU, predU, sizeof(pred_chromaU));
  std::memcpy(pred_chromaV, predV, sizeof(pred_chromaV));
  decode_chroma_cavlc(r, addr, 0, cbp_chroma, false);
}

// -- B slices ---------------------------------------------------------------

bool MbaffSlice::col_fetch(int addr, int b, int* ref_out, int32_t* rid_out,
                           int mv_out[2]) {
  Picture* col_frm;
  int col_parity;
  if (st->is_field(addr)) {
    field_ref(1, 0, addr, &col_frm, &col_parity);
  } else {
    if (ref_l1.empty()) throw DecodeError("empty L1 list");
    col_frm = ref_l1[0];
  }
  MbaffState* colst = col_frm->mbaff.get();
  int px = st->pair_x(addr), py = st->pair_y(addr);
  int xs4 = 3 * (b & 1);
  int ys4 = 3 * (b >> 1);
  bool cur_field = st->is_field(addr);
  int scale = 1;
  bool halve = false;
  if (!colst) {
    // colocated picture is progressive (frame grids)
    int gx4 = px * 4 + xs4;
    int gy4;
    if (!cur_field)
      gy4 = py * 8 + 4 * (addr & 1) + ys4;
    else {
      gy4 = py * 8 + 2 * ys4;
      halve = true;
    }
    int l = 0;
    int ref = col_frm->ref_idx[col_frm->mvix(0, gy4, gx4)];
    if (ref < 0) {
      ref = col_frm->ref_idx[col_frm->mvix(1, gy4, gx4)];
      l = 1;
    }
    if (ref < 0) return false;
    int mx = col_frm->mv[2 * col_frm->mvix(l, gy4, gx4)];
    int my = col_frm->mv[2 * col_frm->mvix(l, gy4, gx4) + 1];
    if (halve) my = my / 2;
    *ref_out = ref;
    // progressive grids store plain pic_id (frame references)
    *rid_out = 4 * col_frm->ref_id[col_frm->mvix(l, gy4, gx4)] + 3;
    mv_out[0] = mx;
    mv_out[1] = my;
    return true;
  }
  int pair = py * st->mb_w + px;
  bool col_field = colst->field_flag[pair] != 0;
  int col_addr, cellix;
  if (cur_field == col_field) {
    col_addr = 2 * pair + (addr & 1);
    cellix = 4 * ys4 + xs4;
  } else if (cur_field) {
    int line4 = 2 * ys4;
    col_addr = 2 * pair + (line4 >= 4 ? 1 : 0);
    cellix = 4 * (line4 & 3) + xs4;
    halve = true;
  } else {
    int cur_poc = pic->poc;
    int parity = (std::abs(col_frm->field_poc[0] - cur_poc) >=
                  std::abs(col_frm->field_poc[1] - cur_poc))
                     ? 1
                     : 0;
    col_addr = 2 * pair + parity;
    int band_row = 4 * (addr & 1) + ys4;
    cellix = 4 * (band_row >> 1) + xs4;
    scale = 2;
  }
  int l = 0;
  int ref = colst->ref_idx[colst->mref(col_addr, 0, cellix)];
  if (ref < 0) {
    ref = colst->ref_idx[colst->mref(col_addr, 1, cellix)];
    l = 1;
  }
  if (ref < 0) return false;
  int mx = colst->mv[colst->mmv(col_addr, l, cellix, 0)];
  int my = colst->mv[colst->mmv(col_addr, l, cellix, 1)] * scale;
  if (halve) my = my / 2;
  *ref_out = ref;
  *rid_out = colst->ref_id[colst->mref(col_addr, l, cellix)];
  mv_out[0] = mx;
  mv_out[1] = my;
  return true;
}

bool MbaffSlice::col_zero(int addr, int b) {
  Picture* col_frm;
  int col_parity;
  if (st->is_field(addr)) {
    field_ref(1, 0, addr, &col_frm, &col_parity);
  } else {
    if (ref_l1.empty()) throw DecodeError("empty L1 list");
    col_frm = ref_l1[0];
  }
  if (col_frm->long_term) return false;
  int ref, mv[2];
  int32_t rid;
  if (!col_fetch(addr, b, &ref, &rid, mv)) return false;
  return ref == 0 && std::abs(mv[0]) <= 1 && std::abs(mv[1]) <= 1;
}

// 8.4.1.2.3 refIdxL0: lowest current-list-0 index referencing the frame
// (or the field of it) containing refPicCol. For field macroblocks the
// index space is the relative field list; a frame-referencing colocated
// block maps to the field with the current macroblock's parity
// (libavcodec fill_colmap).
int MbaffSlice::map_col_ref(int addr, int32_t rid) {
  int pic_id = rid >> 2, par = rid & 3;
  if (!st->is_field(addr)) {
    for (size_t i = 0; i < ref_l0.size(); ++i)
      if (ref_l0[i]->pic_id == pic_id) return (int)i;
    return 0;
  }
  int want_par = par == 3 ? (addr & 1) : par;
  for (int r = 0; r < 2 * (int)ref_l0.size(); ++r) {
    Picture* f;
    int pr;
    field_ref(0, r, addr, &f, &pr);
    if (f->pic_id == pic_id && pr == want_par) return r;
  }
  return 0;
}

// Temporal direct (8.4.1.2.3) with the MBAFF colocated mapping: POC
// distances use the current field's parity when the macroblock is
// field-coded (currPicOrField / pic0 / pic1 are fields).
void MbaffSlice::direct_temporal_8x8(int addr, int b, int refs_out[2],
                                     int mvs_out[2][2]) {
  int ref0 = 0, mvcol[2] = {0, 0};
  int refc;
  int32_t rid;
  if (col_fetch(addr, b, &refc, &rid, mvcol))
    ref0 = map_col_ref(addr, rid);
  else
    mvcol[0] = mvcol[1] = 0;
  int p = addr & 1;
  int cur_poc, poc0, poc1;
  bool lt0;
  if (st->is_field(addr)) {
    cur_poc = pic->field_poc[p];
    Picture* f0;
    int p0;
    field_ref(0, ref0, addr, &f0, &p0);
    poc0 = f0->field_poc[p0];
    Picture* f1;
    int p1;
    field_ref(1, 0, addr, &f1, &p1);
    poc1 = f1->field_poc[p1];
    lt0 = f0->long_term;
  } else {
    if (ref_l0.empty() || ref_l1.empty())
      throw DecodeError("empty reference list");
    cur_poc = pic->poc;
    poc0 = ref_l0[ref0]->poc;
    poc1 = ref_l1[0]->poc;
    lt0 = ref_l0[ref0]->long_term;
  }
  int tb = std::min(127, std::max(-128, cur_poc - poc0));
  int td = std::min(127, std::max(-128, poc1 - poc0));
  refs_out[0] = ref0;
  refs_out[1] = 0;
  if (lt0 || td == 0) {
    mvs_out[0][0] = mvcol[0];
    mvs_out[0][1] = mvcol[1];
    mvs_out[1][0] = mvs_out[1][1] = 0;
    return;
  }
  int q = 16384 + std::abs(td) / 2;
  int tx = (q / std::abs(td)) * (td > 0 ? 1 : -1);
  int dsf = std::min(1023, std::max(-1024, (tb * tx + 32) >> 6));
  mvs_out[0][0] = (dsf * mvcol[0] + 128) >> 8;
  mvs_out[0][1] = (dsf * mvcol[1] + 128) >> 8;
  mvs_out[1][0] = mvs_out[0][0] - mvcol[0];
  mvs_out[1][1] = mvs_out[0][1] - mvcol[1];
}

void MbaffSlice::direct_spatial_cache(int addr) {
  if (dc_valid) return;
  for (int l = 0; l < 2; ++l) {
    MvN A = mv_nbr(addr, -1, 0, l);
    MvN B = mv_nbr(addr, 0, -1, l);
    MvN C = mv_nbr(addr, 16, -1, l);
    if (!C.avail) C = mv_nbr(addr, -1, -1, l);
    int best = -1;
    for (const MvN* m : {&A, &B, &C})
      if (m->ref >= 0) best = best < 0 ? m->ref : std::min(best, m->ref);
    dc_refs[l] = best;
  }
  dc_dzp = dc_refs[0] < 0 && dc_refs[1] < 0;
  if (dc_dzp) dc_refs[0] = dc_refs[1] = 0;
  dc_mvps[0][0] = dc_mvps[0][1] = dc_mvps[1][0] = dc_mvps[1][1] = 0;
  for (int l = 0; l < 2; ++l)
    if (dc_refs[l] >= 0 && !dc_dzp)
      mv_pred(addr, 0, 0, 4, 4, dc_refs[l], 0, 0, l, &dc_mvps[l][0],
              &dc_mvps[l][1]);
  dc_valid = true;
}

void MbaffSlice::direct_mvs_8x8(int addr, int b, int refs_out[2],
                                int mvs_out[2][2]) {
  if (!h->direct_spatial_mv_pred) {
    direct_temporal_8x8(addr, b, refs_out, mvs_out);
    return;
  }
  direct_spatial_cache(addr);
  bool cz = col_zero(addr, b);
  for (int l = 0; l < 2; ++l) {
    if (dc_refs[l] < 0) {
      refs_out[l] = -1;
      mvs_out[l][0] = mvs_out[l][1] = 0;
    } else if (dc_dzp || (cz && dc_refs[l] == 0)) {
      refs_out[l] = dc_refs[l];
      mvs_out[l][0] = mvs_out[l][1] = 0;
    } else {
      refs_out[l] = dc_refs[l];
      mvs_out[l][0] = dc_mvps[l][0];
      mvs_out[l][1] = dc_mvps[l][1];
    }
  }
}

void MbaffSlice::decode_direct_8x8(int addr, int b, int* predY, int* predU,
                                   int* predV) {
  int refs[2], mvs[2][2];
  direct_mvs_8x8(addr, b, refs, mvs);
  int bx4 = (b & 1) * 2, by4 = (b >> 1) * 2;
  for (int y = by4; y < by4 + 2; ++y)
    for (int x = bx4; x < bx4 + 2; ++x)
      st->cell_direct[st->cell(addr, 4 * y + x)] = 1;
  if (refs[0] >= 0)
    store_part_mv(addr, bx4, by4, 2, 2, refs[0], mvs[0][0], mvs[0][1], 0);
  if (refs[1] >= 0)
    store_part_mv(addr, bx4, by4, 2, 2, refs[1], mvs[1][0], mvs[1][1], 1);
  PredBlk p0, p1;
  bool h0 = refs[0] >= 0, h1 = refs[1] >= 0;
  if (h0) fetch_pred(addr, 0, refs[0], bx4, by4, 2, 2, mvs[0][0], mvs[0][1],
                     p0);
  if (h1) fetch_pred(addr, 1, refs[1], bx4, by4, 2, 2, mvs[1][0], mvs[1][1],
                     p1);
  combine_store(addr, predY, predU, predV, bx4, by4, 2, 2, h0 ? &p0 : nullptr,
                h1 ? &p1 : nullptr, refs[0], refs[1]);
}

void MbaffSlice::decode_b_skip(int addr) {
  mark_mb(addr);
  cur_addr = addr;
  cur_z = 0;
  dc_valid = false;
  st->mb_class[addr] = MB_B;
  st->mb_qp[addr] = qp;
  st->mb_cbp[addr] = 0;
  st->mb_skip[addr] = 1;
  st->mb_bdirect[addr] = 1;
  int predY[256], predU[64], predV[64];
  for (int b = 0; b < 4; ++b) decode_direct_8x8(addr, b, predY, predU, predV);
  store_mb(addr, predY, predU, predV);
}

void MbaffSlice::decode_b_mb(BitReader& r, int addr, int mb_type) {
  dc_valid = false;
  st->mb_class[addr] = MB_B;
  int predY[256], predU[64], predV[64];
  if (mb_type == 0) {
    st->mb_bdirect[addr] = 1;
    for (int b = 0; b < 4; ++b)
      decode_direct_8x8(addr, b, predY, predU, predV);
    cur_z = 16;
    inter_residual(r, addr, predY, predU, predV,
                   sps->direct_8x8_inference != 0);
    return;
  }
  bool tf8_ok = true;
  if (mb_type < 22) {
    int kind, preds[2], np;
    SliceCtx::b_type(mb_type, &kind, preds, &np);
    int ng;
    const SliceCtx::Part* parts = SliceCtx::geom(kind, &ng);
    int refs[2][2] = {{-1, -1}, {-1, -1}};
    for (int l = 0; l < 2; ++l)
      for (int i = 0; i < np; ++i)
        if (preds[i] == 2 || preds[i] == l)
          refs[l][i] = SliceCtx::read_te(r, n_act(addr, l) - 1);
    int mvds[2][2][2] = {};
    for (int l = 0; l < 2; ++l)
      for (int i = 0; i < np; ++i)
        if (preds[i] == 2 || preds[i] == l) {
          mvds[l][i][0] = r.se();
          mvds[l][i][1] = r.se();
        }
    int mvs[2][2][2];
    for (int l = 0; l < 2; ++l)
      for (int i = 0; i < np; ++i) {
        if (refs[l][i] < 0) continue;
        cur_z = xy_to_z(parts[i].bx4, parts[i].by4);
        int px, py;
        mv_pred(addr, parts[i].bx4, parts[i].by4, parts[i].w4, parts[i].h4,
                refs[l][i], kind, i, l, &px, &py);
        mvs[l][i][0] = px + mvds[l][i][0];
        mvs[l][i][1] = py + mvds[l][i][1];
        store_part_mv(addr, parts[i].bx4, parts[i].by4, parts[i].w4,
                      parts[i].h4, refs[l][i], mvs[l][i][0], mvs[l][i][1],
                      l);
        store_part_mvd(addr, parts[i].bx4, parts[i].by4, parts[i].w4,
                       parts[i].h4, l, mvds[l][i][0], mvds[l][i][1]);
      }
    for (int i = 0; i < np; ++i) {
      PredBlk p0, p1;
      bool h0 = refs[0][i] >= 0, h1 = refs[1][i] >= 0;
      if (h0)
        fetch_pred(addr, 0, refs[0][i], parts[i].bx4, parts[i].by4,
                   parts[i].w4, parts[i].h4, mvs[0][i][0], mvs[0][i][1], p0);
      if (h1)
        fetch_pred(addr, 1, refs[1][i], parts[i].bx4, parts[i].by4,
                   parts[i].w4, parts[i].h4, mvs[1][i][0], mvs[1][i][1], p1);
      combine_store(addr, predY, predU, predV, parts[i].bx4, parts[i].by4,
                    parts[i].w4, parts[i].h4, h0 ? &p0 : nullptr,
                    h1 ? &p1 : nullptr, refs[0][i], refs[1][i]);
    }
  } else {
    int sub_types[4];
    for (int b = 0; b < 4; ++b) {
      sub_types[b] = r.ue();
      if (sub_types[b] > 12) throw DecodeError("bad B sub_mb_type");
    }
    for (int b = 0; b < 4; ++b) {
      int pm, ns;
      const SliceCtx::Part* sp;
      SliceCtx::b_sub(sub_types[b], &pm, &sp, &ns);
      if (pm == -1) {
        cur_z = xy_to_z((b & 1) * 2, (b >> 1) * 2);
        decode_direct_8x8(addr, b, predY, predU, predV);
      }
    }
    int refs[2][4] = {{-1, -1, -1, -1}, {-1, -1, -1, -1}};
    for (int l = 0; l < 2; ++l)
      for (int b = 0; b < 4; ++b) {
        int pm, ns;
        const SliceCtx::Part* sp;
        SliceCtx::b_sub(sub_types[b], &pm, &sp, &ns);
        if (pm == 2 || pm == l)
          refs[l][b] = SliceCtx::read_te(r, n_act(addr, l) - 1);
      }
    // mvds in (l, b, sp) order, then derive/store in the same order
    int submv[2][4][4][2];
    int mvd_list[2][16][4];
    int nmvd[2] = {0, 0};
    for (int l = 0; l < 2; ++l)
      for (int b = 0; b < 4; ++b) {
        int pm, ns;
        const SliceCtx::Part* sp;
        SliceCtx::b_sub(sub_types[b], &pm, &sp, &ns);
        if (pm == -1 || !(pm == 2 || pm == l)) continue;
        for (int s = 0; s < ns; ++s) {
          mvd_list[l][nmvd[l]][0] = b;
          mvd_list[l][nmvd[l]][1] = s;
          mvd_list[l][nmvd[l]][2] = r.se();
          mvd_list[l][nmvd[l]][3] = r.se();
          ++nmvd[l];
        }
      }
    for (int l = 0; l < 2; ++l)
      for (int i = 0; i < nmvd[l]; ++i) {
        int b = mvd_list[l][i][0], s = mvd_list[l][i][1];
        int pm, ns;
        const SliceCtx::Part* sp;
        SliceCtx::b_sub(sub_types[b], &pm, &sp, &ns);
        int bx4 = (b & 1) * 2 + sp[s].bx4;
        int by4 = (b >> 1) * 2 + sp[s].by4;
        cur_z = xy_to_z(bx4, by4);
        int px, py;
        mv_pred(addr, bx4, by4, sp[s].w4, sp[s].h4, refs[l][b], 0, 0, l, &px,
                &py);
        submv[l][b][s][0] = px + mvd_list[l][i][2];
        submv[l][b][s][1] = py + mvd_list[l][i][3];
        store_part_mv(addr, bx4, by4, sp[s].w4, sp[s].h4, refs[l][b],
                      submv[l][b][s][0], submv[l][b][s][1], l);
        store_part_mvd(addr, bx4, by4, sp[s].w4, sp[s].h4, l,
                       mvd_list[l][i][2], mvd_list[l][i][3]);
      }
    for (int b = 0; b < 4; ++b) {
      int pm, ns;
      const SliceCtx::Part* sp;
      SliceCtx::b_sub(sub_types[b], &pm, &sp, &ns);
      if (pm == -1) continue;
      for (int s = 0; s < ns; ++s) {
        int bx4 = (b & 1) * 2 + sp[s].bx4;
        int by4 = (b >> 1) * 2 + sp[s].by4;
        PredBlk p0, p1;
        bool h0 = refs[0][b] >= 0, h1 = refs[1][b] >= 0;
        if (h0)
          fetch_pred(addr, 0, refs[0][b], bx4, by4, sp[s].w4, sp[s].h4,
                     submv[0][b][s][0], submv[0][b][s][1], p0);
        if (h1)
          fetch_pred(addr, 1, refs[1][b], bx4, by4, sp[s].w4, sp[s].h4,
                     submv[1][b][s][0], submv[1][b][s][1], p1);
        combine_store(addr, predY, predU, predV, bx4, by4, sp[s].w4,
                      sp[s].h4, h0 ? &p0 : nullptr, h1 ? &p1 : nullptr,
                      refs[0][b], refs[1][b]);
      }
    }
    tf8_ok = true;
    for (int b = 0; b < 4; ++b)
      tf8_ok &= ((sub_types[b] == 0 && sps->direct_8x8_inference) ||
                 (sub_types[b] >= 1 && sub_types[b] <= 3));
  }
  cur_z = 16;
  inter_residual(r, addr, predY, predU, predV, tf8_ok);
}

// -- CAVLC slice loop -------------------------------------------------------

void MbaffSlice::decode_cavlc(BitReader& r) {
  int n_mbs = st->mb_w * st->mb_h;
  if (h->slice_type == SLICE_I) {
    int addr = h->first_mb * 2;
    while (addr < n_mbs) {
      if ((addr & 1) == 0) st->field_flag[addr >> 1] = (int8_t)r.read1();
      mark_mb(addr);
      cur_addr = addr;
      cur_z = 0;
      int mb_type = r.ue();
      decode_intra_mb_cavlc(r, addr, mb_type);
      ++addr;
      if (!more_rbsp_data(r)) break;
    }
    return;
  }
  int addr = h->first_mb * 2;
  bool more = true;
  int pending_top = -1;
  while (more && addr < n_mbs) {
    int skip_run = r.ue();
    for (int i = 0; i < skip_run; ++i) {
      if (addr >= n_mbs) break;
      if ((addr & 1) == 0) {
        pending_top = addr;
      } else {
        if (pending_top >= 0) {
          st->field_flag[addr >> 1] = (int8_t)infer_field_flag(addr >> 1);
          decode_skip_mb(pending_top);
          pending_top = -1;
        }
        decode_skip_mb(addr);
      }
      ++addr;
    }
    more = more_rbsp_data(r);
    if (more && addr < n_mbs) {
      if ((addr & 1) == 0 || pending_top >= 0)
        st->field_flag[addr >> 1] = (int8_t)r.read1();
      if (pending_top >= 0) {
        decode_skip_mb(pending_top);
        pending_top = -1;
      }
      mark_mb(addr);
      cur_addr = addr;
      cur_z = 0;
      int mb_type = r.ue();
      if (h->slice_type == SLICE_P) {
        if (mb_type < 5)
          decode_p_mb(r, addr, mb_type);
        else
          decode_intra_mb_cavlc(r, addr, mb_type - 5);
      } else {
        if (mb_type < 23)
          decode_b_mb(r, addr, mb_type);
        else
          decode_intra_mb_cavlc(r, addr, mb_type - 23);
      }
      ++addr;
      more = more_rbsp_data(r);
    }
  }
  if (pending_top >= 0) {
    st->field_flag[pending_top >> 1] =
        (int8_t)infer_field_flag(pending_top >> 1);
    decode_skip_mb(pending_top);
  }
}

}  // namespace h264

namespace h264 {

// ---------------------------------------------------------------------------
// MBAFF CABAC (h264_mbaff.py MbaffCabac)
// ---------------------------------------------------------------------------

struct MbaffCabac {
  CabacEngine e;
  MbaffSlice* sl;
  MbaffState* st;
  const SliceHeader* h;
  int prev_qp_delta_nz = 0;

  MbaffCabac(MbaffSlice* sl_, const uint8_t* rbsp, size_t n,
             const SliceHeader* h_)
      : sl(sl_), st(sl_->st), h(h_) {
    e.init_ctx(h->slice_type == SLICE_I, h->cabac_init_idc, h->slice_qp);
    e.start(rbsp, n, h->data_bit_pos);
  }

  int mb_nbr(int addr, int xN, int yN) {
    MbaffSlice::Nbr r = sl->nbr(addr, xN, yN, false);
    return r.ok ? r.addr : -1;
  }

  int mb_skip_flag(int addr) {
    int base = h->slice_type == SLICE_P ? 11 : 24;
    int ctx = 0;
    int n = mb_nbr(addr, -1, 0);
    if (n >= 0 && !st->mb_skip[n]) ++ctx;
    n = mb_nbr(addr, 0, -1);
    if (n >= 0 && !st->mb_skip[n]) ++ctx;
    return e.decision(base + ctx);
  }

  int mb_field_decoding_flag(int addr) {
    int pair = addr >> 1;
    int px = pair % st->mb_w, py = pair / st->mb_w;
    int ctx = 0;
    if (px > 0 && st->slice_id[2 * (pair - 1)] == sl->sid)
      ctx += st->field_flag[pair - 1];
    if (py > 0 && st->slice_id[2 * (pair - st->mb_w)] == sl->sid)
      ctx += st->field_flag[pair - st->mb_w];
    return e.decision(70 + ctx);
  }

  int intra_mb_type(int ctx_base, bool intra_slice, int addr) {
    int base = ctx_base;
    if (intra_slice) {
      int ctx = 0;
      for (int side = 0; side < 2; ++side) {
        int n = side == 0 ? mb_nbr(addr, -1, 0) : mb_nbr(addr, 0, -1);
        if (n >= 0) {
          int cls = st->mb_class[n];
          if (cls == MB_I16 || cls == MB_IPCM) ++ctx;
        }
      }
      if (e.decision(base + ctx) == 0) return 0;
      base += 2;
    } else {
      if (e.decision(base) == 0) return 0;
    }
    if (e.terminate()) return 25;
    int t = 1;
    t += 12 * e.decision(base + 1);
    if (e.decision(base + 2))
      t += 4 + 4 * e.decision(base + 2 + (intra_slice ? 1 : 0));
    int off = 3 + (intra_slice ? 1 : 0);
    t += 2 * e.decision(base + off);
    t += e.decision(base + 3 + (intra_slice ? 2 : 0));
    return t;
  }

  int mb_type_i(int addr) { return intra_mb_type(3, true, addr); }
  int mb_type_p(int addr) {
    if (e.decision(14)) return 5 + intra_mb_type(17, false, addr);
    if (e.decision(15) == 0) return 3 * e.decision(16);
    return 2 - e.decision(17);
  }
  int mb_type_b(int addr) {
    int ctx = 0;
    int n = mb_nbr(addr, -1, 0);
    if (n >= 0 && !st->mb_bdirect[n]) ++ctx;
    n = mb_nbr(addr, 0, -1);
    if (n >= 0 && !st->mb_bdirect[n]) ++ctx;
    if (!e.decision(27 + ctx)) return 0;
    if (!e.decision(27 + 3)) return 1 + e.decision(27 + 5);
    int bits = e.decision(27 + 4) << 3;
    bits |= e.decision(27 + 5) << 2;
    bits |= e.decision(27 + 5) << 1;
    bits |= e.decision(27 + 5);
    if (bits < 8) return bits + 3;
    if (bits == 13) return 23 + intra_mb_type(32, false, addr);
    if (bits == 14) return 11;
    if (bits == 15) return 22;
    bits = (bits << 1) | e.decision(27 + 5);
    return bits - 4;
  }
  int sub_mb_type_p() {
    if (e.decision(21)) return 0;
    if (!e.decision(22)) return 1;
    return e.decision(23) ? 2 : 3;
  }
  int sub_mb_type_b() {
    if (!e.decision(36)) return 0;
    if (!e.decision(37)) return 1 + e.decision(39);
    int t = 3;
    if (e.decision(38)) {
      if (e.decision(39)) return 11 + e.decision(39);
      t += 4;
    }
    t += 2 * e.decision(39);
    t += e.decision(39);
    return t;
  }
  int intra_pred_mode(int pred) {
    if (e.decision(68)) return pred;
    int rem = e.decision(69);
    rem |= e.decision(69) << 1;
    rem |= e.decision(69) << 2;
    return rem < pred ? rem : rem + 1;
  }
  int chroma_pred_mode(int addr) {
    int ctx = 0;
    int n = mb_nbr(addr, -1, 0);
    if (n >= 0 && st->mb_chroma_mode[n] != 0) ++ctx;
    n = mb_nbr(addr, 0, -1);
    if (n >= 0 && st->mb_chroma_mode[n] != 0) ++ctx;
    if (!e.decision(64 + ctx)) return 0;
    if (!e.decision(67)) return 1;
    return e.decision(67) ? 3 : 2;
  }
  int transform_size_8x8(int addr) {
    int ctx = 0;
    int n = mb_nbr(addr, -1, 0);
    if (n >= 0 && st->mb_tf8[n]) ++ctx;
    n = mb_nbr(addr, 0, -1);
    if (n >= 0 && st->mb_tf8[n]) ++ctx;
    return e.decision(399 + ctx);
  }

  int cbp_luma_bit(int addr, int b, int cur_bits) {
    int x8 = b & 1, y8 = b >> 1;
    auto cond = [&](int xN, int yN) -> int {
      MbaffSlice::Nbr r = sl->nbr(addr, xN, yN, false);
      if (!r.ok) return 0;
      int nb = (r.xW >> 3) + 2 * (r.yW >> 3);
      if (r.addr == addr) return (cur_bits & (1 << nb)) ? 0 : 1;
      if (st->mb_class[r.addr] == MB_IPCM) return 0;
      return (st->mb_cbp[r.addr] & (1 << nb)) ? 0 : 1;
    };
    int ca = cond(8 * x8 - 1, 8 * y8);
    int cb = cond(8 * x8, 8 * y8 - 1);
    return e.decision(73 + ca + 2 * cb);
  }

  int cbp(int addr) {
    int bits = 0;
    for (int b = 0; b < 4; ++b) bits |= cbp_luma_bit(addr, b, bits) << b;
    auto cchroma = [&](int n, bool want2) -> int {
      if (n < 0) return 0;
      if (st->mb_class[n] == MB_IPCM) return 1;
      int cc = st->mb_cbp[n] >> 4;
      return (want2 ? cc == 2 : cc != 0) ? 1 : 0;
    };
    int na = mb_nbr(addr, -1, 0);
    int nb = mb_nbr(addr, 0, -1);
    int chroma = 0;
    if (e.decision(77 + cchroma(na, false) + 2 * cchroma(nb, false)))
      chroma = e.decision(81 + cchroma(na, true) + 2 * cchroma(nb, true))
                   ? 2
                   : 1;
    return bits | (chroma << 4);
  }

  int mb_qp_delta() {
    if (!e.decision(60 + (prev_qp_delta_nz ? 1 : 0))) {
      prev_qp_delta_nz = 0;
      return 0;
    }
    int k = 1;
    if (e.decision(62)) {
      k = 2;
      while (k < 90 && e.decision(63)) ++k;
    }
    prev_qp_delta_nz = 1;
    return (k & 1) ? (k + 1) >> 1 : -(k >> 1);
  }

  int ref_idx(int addr, int l, int bx4, int by4) {
    bool is_b = h->slice_type == SLICE_B;
    int ctx = 0;
    for (int side = 0; side < 2; ++side) {
      int xN = 4 * bx4 - (side == 0 ? 1 : 0);
      int yN = 4 * by4 - (side == 0 ? 0 : 1);
      MbaffSlice::Nbr r = sl->nbr(addr, xN, yN, false);
      if (!r.ok) continue;
      if (r.addr == addr && xy_to_z(r.xW >> 2, r.yW >> 2) >= sl->cur_z)
        continue;
      int c = 4 * (r.yW >> 2) + (r.xW >> 2);
      int ref = st->ref_idx[st->mref(r.addr, l, c)];
      if (ref < 0) continue;
      if (st->is_field(r.addr) && !st->is_field(addr))
        ref >>= 1;
      else if (st->is_field(addr) && !st->is_field(r.addr))
        ref *= 2;
      if (ref > 0 && !(is_b && st->cell_direct[st->cell(r.addr, c)]))
        ctx += 1 << side;
    }
    int ref = 0;
    while (e.decision(54 + ctx)) {
      if (++ref > 32) throw DecodeError("bad ref_idx");
      ctx = (ctx >> 2) + 4;
    }
    return ref;
  }

  int mvd_nbr_abs(int addr, int xN, int yN, int l, int comp) {
    MbaffSlice::Nbr r = sl->nbr(addr, xN, yN, false);
    if (!r.ok) return 0;
    if (r.addr == addr && xy_to_z(r.xW >> 2, r.yW >> 2) >= sl->cur_z)
      return 0;
    int c = 4 * (r.yW >> 2) + (r.xW >> 2);
    int v = std::abs((int)st->mvd[st->mmv(r.addr, l, c, comp)]);
    if (comp == 1) {
      if (st->is_field(r.addr) && !st->is_field(addr))
        v <<= 1;
      else if (st->is_field(addr) && !st->is_field(r.addr))
        v >>= 1;
    }
    return v;
  }

  int mvd(int addr, int l, int bx4, int by4, int comp) {
    int amvd = mvd_nbr_abs(addr, 4 * bx4 - 1, 4 * by4, l, comp) +
               mvd_nbr_abs(addr, 4 * bx4, 4 * by4 - 1, l, comp);
    int base = comp == 0 ? 40 : 47;
    int ctx = amvd < 3 ? 0 : (amvd > 32 ? 2 : 1);
    if (!e.decision(base + ctx)) return 0;
    int v = 1;
    ctx = 3;
    while (v < 9 && e.decision(base + ctx)) {
      if (v < 4) ++ctx;
      ++v;
    }
    if (v >= 9) {
      int k = 3;
      while (e.bypass()) {
        v += 1 << k;
        if (++k > 24) throw DecodeError("bad mvd");
      }
      while (k) {
        --k;
        v += e.bypass() << k;
      }
    }
    return e.bypass() ? -v : v;
  }

  int cbf_nbr(int addr, int cat, int i0, int i1, int i2, int side) {
    bool cur_intra = st->is_intra(addr);
    if (cat == 0 || cat == 3) {
      int n = side == 0 ? mb_nbr(addr, -1, 0) : mb_nbr(addr, 0, -1);
      if (n < 0) return cur_intra ? 1 : 0;
      int cls = st->mb_class[n];
      if (cls == MB_IPCM) return 1;
      if (cat == 0) {
        if (cls != MB_I16) return 0;
        return (st->mb_dc_flag[n] & 1) ? 1 : 0;
      }
      return (st->mb_dc_flag[n] & (2 << i0)) ? 1 : 0;
    }
    if (cat == 1 || cat == 2) {
      int xN = 4 * i0 - (side == 0 ? 1 : 0);
      int yN = 4 * i1 - (side == 0 ? 0 : 1);
      MbaffSlice::Nbr r = sl->nbr(addr, xN, yN, false);
      if (!r.ok) return cur_intra ? 1 : 0;
      if (st->mb_class[r.addr] == MB_IPCM) return 1;
      return st->cbf_y[st->cell(r.addr, 4 * (r.yW >> 2) + (r.xW >> 2))];
    }
    int xN = 4 * i1 - (side == 0 ? 1 : 0);
    int yN = 4 * i2 - (side == 0 ? 0 : 1);
    MbaffSlice::Nbr r = sl->nbr(addr, xN, yN, true);
    if (!r.ok) return cur_intra ? 1 : 0;
    if (st->mb_class[r.addr] == MB_IPCM) return 1;
    return st->cbf_c[st->ccell(r.addr, i0, 2 * (r.yW >> 2) + (r.xW >> 2))];
  }

  bool residual(int addr, int cat, int maxcoeff, int i0, int i1, int i2,
                int* coeffs) {
    bool field = st->is_field(addr);
    if (cat != 5) {
      int inc = cbf_nbr(addr, cat, i0, i1, i2, 0) +
                2 * cbf_nbr(addr, cat, i0, i1, i2, 1);
      if (!e.decision(85 + CBF_OFF[cat] + inc)) return false;
    }
    int sig_base, last_base, abs_base;
    if (cat == 5) {
      sig_base = field ? 436 : 402;
      last_base = field ? 451 : 417;
      abs_base = 426;
    } else {
      sig_base = (field ? 277 : 105) + SIG_OFF[cat];
      last_base = (field ? 338 : 166) + SIG_OFF[cat];
      abs_base = 227 + ABS_OFF[cat];
    }
    const uint8_t* sig8 = field ? kSigCoeff8x8Field : kSigCoeff8x8;
    std::memset(coeffs, 0, maxcoeff * sizeof(int));
    bool sig[64] = {};
    int last_idx = maxcoeff - 1;
    bool broke = false;
    for (int i = 0; i < maxcoeff - 1; ++i) {
      int s_inc, l_inc;
      if (cat == 5) {
        s_inc = sig8[i];
        l_inc = kLastCoeff8x8[i];
      } else if (cat == 3) {
        s_inc = l_inc = std::min(i, 2);
      } else {
        s_inc = l_inc = i;
      }
      if (e.decision(sig_base + s_inc)) {
        sig[i] = true;
        if (e.decision(last_base + l_inc)) {
          last_idx = i;
          broke = true;
          break;
        }
      }
    }
    if (!broke) sig[maxcoeff - 1] = true;
    if (last_idx == maxcoeff - 1 && !sig[maxcoeff - 1])
      sig[maxcoeff - 1] = true;
    int num_eq1 = 0, num_gt1 = 0;
    for (int pos = last_idx; pos >= 0; --pos) {
      if (!sig[pos]) continue;
      int ctx0 = num_gt1 ? 0 : std::min(4, 1 + num_eq1);
      int level;
      if (!e.decision(abs_base + ctx0)) {
        level = 1;
      } else {
        int ctxn = abs_base + 5 + std::min(4 - (cat == 3 ? 1 : 0), num_gt1);
        level = 2;
        while (level < 15 && e.decision(ctxn)) ++level;
        if (level == 15) {
          int k = 0;
          while (e.bypass()) {
            level += 1 << k;
            if (++k > 30) throw DecodeError("bad coeff level");
          }
          while (k) {
            --k;
            level += e.bypass() << k;
          }
        }
      }
      if (level > 1)
        ++num_gt1;
      else
        ++num_eq1;
      coeffs[pos] = e.bypass() ? -level : level;
    }
    return true;
  }

  int end_of_slice() { return e.terminate(); }
};

// ---------------------------------------------------------------------------
// MbaffSlice CABAC MB layer
// ---------------------------------------------------------------------------

void MbaffSlice::decode_mb_cabac(MbaffCabac& cb, int addr) {
  int stp = h->slice_type;
  if (stp == SLICE_P) {
    int mb_type = cb.mb_type_p(addr);
    if (mb_type < 5)
      decode_p_mb_cabac(cb, addr, mb_type);
    else
      decode_intra_mb_cabac(cb, addr, mb_type - 5);
  } else if (stp == SLICE_B) {
    int mb_type = cb.mb_type_b(addr);
    if (mb_type < 23)
      decode_b_mb_cabac(cb, addr, mb_type);
    else
      decode_intra_mb_cabac(cb, addr, mb_type - 23);
  } else {
    int mb_type = cb.mb_type_i(addr);
    decode_intra_mb_cabac(cb, addr, mb_type);
  }
}

void MbaffSlice::decode_intra_mb_cabac(MbaffCabac& cb, int addr, int imb) {
  if (imb == 25) {
    decode_ipcm_cabac(cb, addr);
    return;
  }
  if (imb == 0) {
    int tf8 = 0;
    if (pps->transform_8x8_mode) tf8 = cb.transform_size_8x8(addr);
    if (tf8)
      decode_i8x8_cabac(cb, addr);
    else
      decode_i4x4_cabac(cb, addr);
    return;
  }
  decode_i16_cabac(cb, addr, imb - 1);
}

void MbaffSlice::decode_ipcm_cabac(MbaffCabac& cb, int addr) {
  CabacEngine& e = cb.e;
  if (e.pos & 7) e.pos += 8 - (e.pos & 7);
  size_t p = e.pos >> 3;
  int x0 = st->luma_x0(addr);
  for (int yy = 0; yy < 16; ++yy) {
    uint8_t* row = pic->Y.data() + (size_t)st->luma_y(addr, yy) * pic->w;
    for (int xx = 0; xx < 16; ++xx)
      row[x0 + xx] = p < e.size ? e.data[p++] : (++p, 0);
  }
  int cx0 = st->pair_x(addr) * 8;
  for (int comp = 0; comp < 2; ++comp) {
    uint8_t* plane = comp ? pic->V.data() : pic->U.data();
    for (int yy = 0; yy < 8; ++yy) {
      uint8_t* row = plane + (size_t)st->chroma_y(addr, yy) * pic->cw;
      for (int xx = 0; xx < 8; ++xx)
        row[cx0 + xx] = p < e.size ? e.data[p++] : (++p, 0);
    }
  }
  e.pos = p << 3;
  e.range_ = 510;
  int off = 0;
  for (int i = 0; i < 9; ++i) off = (off << 1) | e.bit();
  e.offset = off;
  set_ipcm_state(addr);
  cb.prev_qp_delta_nz = 0;
}

void MbaffSlice::qp_delta_cabac(MbaffCabac& cb, int addr, int cbp,
                                bool always) {
  if (cbp || always)
    qp = ((qp + cb.mb_qp_delta()) % 52 + 52) % 52;
  else
    cb.prev_qp_delta_nz = 0;
  st->mb_qp[addr] = qp;
  st->mb_cbp[addr] = cbp;
}

bool MbaffSlice::luma4_res_cabac(MbaffCabac& cb, int addr, int k, int cat,
                                 int* blk) {
  int x4 = kZtoX[k], y4 = kZtoY[k];
  bool ok = cb.residual(addr, cat, cat == 1 ? 15 : 16, x4, y4, 0, blk);
  int c = 4 * y4 + x4;
  if (!ok) {
    st->cbf_y[st->cell(addr, c)] = 0;
    st->nnz_y[st->cell(addr, c)] = 0;
    return false;
  }
  st->cbf_y[st->cell(addr, c)] = 1;
  int nz = 0;
  int n = cat == 1 ? 15 : 16;
  for (int i = 0; i < n; ++i) nz += blk[i] != 0;
  st->nnz_y[st->cell(addr, c)] = (int8_t)nz;
  return true;
}

void MbaffSlice::decode_i4x4_cabac(MbaffCabac& cb, int addr) {
  st->mb_class[addr] = MB_I4;
  int modes[16];
  for (int k = 0; k < 16; ++k) {
    int x4 = kZtoX[k], y4 = kZtoY[k];
    cur_z = k;
    int ma = i4_mode_nbr(addr, 4 * x4 - 1, 4 * y4);
    int mb_ = i4_mode_nbr(addr, 4 * x4, 4 * y4 - 1);
    int pred = (ma == -1000 || mb_ == -1000) ? 2 : std::min(ma, mb_);
    int mode = cb.intra_pred_mode(pred);
    modes[k] = mode;
    st->i4_modes[st->cell(addr, 4 * y4 + x4)] = (int8_t)mode;
  }
  int chroma_mode = cb.chroma_pred_mode(addr);
  st->mb_chroma_mode[addr] = (int8_t)chroma_mode;
  int cbp = cb.cbp(addr);
  int cbp_luma = cbp & 15, cbp_chroma = cbp >> 4;
  qp_delta_cabac(cb, addr, cbp, false);
  int coeffs[16][16];
  bool has[16] = {};
  for (int k = 0; k < 16; ++k)
    if (cbp_luma & (1 << (k >> 2))) {
      cur_z = k;
      has[k] = luma4_res_cabac(cb, addr, k, 2, coeffs[k]);
    }
  for (int k = 0; k < 16; ++k) {
    cur_z = k;
    recon_i4_block(addr, k, modes[k], has[k] ? coeffs[k] : nullptr);
  }
  cur_z = 16;
  decode_chroma_cabac(cb, addr, chroma_mode, cbp_chroma, true);
}

void MbaffSlice::decode_i8x8_cabac(MbaffCabac& cb, int addr) {
  st->mb_class[addr] = MB_I8;
  st->mb_tf8[addr] = 1;
  int modes[4];
  for (int b = 0; b < 4; ++b) {
    int bx = (b & 1) * 2, by = (b >> 1) * 2;
    cur_z = xy_to_z(bx, by);
    int ma = i4_mode_nbr(addr, 4 * bx - 1, 4 * by);
    int mb_ = i4_mode_nbr(addr, 4 * bx, 4 * by - 1);
    int pred = (ma == -1000 || mb_ == -1000) ? 2 : std::min(ma, mb_);
    int mode = cb.intra_pred_mode(pred);
    modes[b] = mode;
    for (int dy = 0; dy < 2; ++dy)
      for (int dx = 0; dx < 2; ++dx)
        st->i4_modes[st->cell(addr, 4 * (by + dy) + bx + dx)] = (int8_t)mode;
  }
  int chroma_mode = cb.chroma_pred_mode(addr);
  st->mb_chroma_mode[addr] = (int8_t)chroma_mode;
  int cbp = cb.cbp(addr);
  int cbp_luma = cbp & 15, cbp_chroma = cbp >> 4;
  qp_delta_cabac(cb, addr, cbp, false);
  int coeffs[4][64];
  bool has[4] = {};
  for (int b = 0; b < 4; ++b) {
    int bx = (b & 1) * 2, by = (b >> 1) * 2;
    if (cbp_luma & (1 << b)) {
      cb.residual(addr, 5, 64, 0, 0, 0, coeffs[b]);
      has[b] = true;
      int nz = 0;
      for (int i = 0; i < 64; ++i) nz += coeffs[b][i] != 0;
      for (int dy = 0; dy < 2; ++dy)
        for (int dx = 0; dx < 2; ++dx) {
          st->cbf_y[st->cell(addr, 4 * (by + dy) + bx + dx)] = 1;
          st->nnz_y[st->cell(addr, 4 * (by + dy) + bx + dx)] = (int8_t)nz;
        }
    }
  }
  for (int b = 0; b < 4; ++b) {
    cur_z = xy_to_z((b & 1) * 2, (b >> 1) * 2);
    recon_i8_block(addr, b, modes[b], has[b] ? coeffs[b] : nullptr);
  }
  cur_z = 16;
  decode_chroma_cabac(cb, addr, chroma_mode, cbp_chroma, true);
}

void MbaffSlice::decode_i16_cabac(MbaffCabac& cb, int addr, int k) {
  int pred_mode = k % 4;
  int cbp_chroma = (k / 4) % 3;
  int cbp_luma = k >= 12 ? 15 : 0;
  st->mb_class[addr] = MB_I16;
  int chroma_mode = cb.chroma_pred_mode(addr);
  st->mb_chroma_mode[addr] = (int8_t)chroma_mode;
  qp_delta_cabac(cb, addr, cbp_luma | (cbp_chroma << 4), true);
  int dc_scan[16];
  bool has_dc = cb.residual(addr, 0, 16, 0, 0, 0, dc_scan);
  if (has_dc) st->mb_dc_flag[addr] |= 1;
  if (!has_dc) std::memset(dc_scan, 0, sizeof(dc_scan));
  int coeffs[16][15];
  bool has[16] = {};
  if (cbp_luma)
    for (int kk = 0; kk < 16; ++kk) {
      cur_z = kk;
      has[kk] = luma4_res_cabac(cb, addr, kk, 1, coeffs[kk]);
    }
  cur_z = 16;
  const int* cptr[16];
  for (int kk = 0; kk < 16; ++kk) cptr[kk] = has[kk] ? coeffs[kk] : nullptr;
  recon_i16(addr, pred_mode, dc_scan, cptr);
  decode_chroma_cabac(cb, addr, chroma_mode, cbp_chroma, true);
}

void MbaffSlice::decode_chroma_cabac(MbaffCabac& cb, int addr,
                                     int chroma_mode, int cbp_chroma,
                                     bool intra) {
  int dc_scan[2][4] = {{0, 0, 0, 0}, {0, 0, 0, 0}};
  if (cbp_chroma) {
    for (int comp = 0; comp < 2; ++comp) {
      int blk[4];
      if (cb.residual(addr, 3, 4, comp, 0, 0, blk)) {
        for (int i = 0; i < 4; ++i) dc_scan[comp][i] = blk[i];
        st->mb_dc_flag[addr] |= 2 << comp;
      }
    }
  }
  int coeffs[2][4][15];
  bool has[2][4] = {};
  if (cbp_chroma & 2) {
    for (int comp = 0; comp < 2; ++comp)
      for (int b = 0; b < 4; ++b) {
        int cx = b & 1, cy = b >> 1;
        bool ok = cb.residual(addr, 4, 15, comp, cx, cy, coeffs[comp][b]);
        has[comp][b] = ok;
        int c = 2 * cy + cx;
        if (!ok) {
          st->cbf_c[st->ccell(addr, comp, c)] = 0;
          st->nnz_c[st->ccell(addr, comp, c)] = 0;
        } else {
          st->cbf_c[st->ccell(addr, comp, c)] = 1;
          int nz = 0;
          for (int i = 0; i < 15; ++i) nz += coeffs[comp][b][i] != 0;
          st->nnz_c[st->ccell(addr, comp, c)] = (int8_t)nz;
        }
      }
  }
  const int* cptr[2][4];
  for (int comp = 0; comp < 2; ++comp)
    for (int b = 0; b < 4; ++b)
      cptr[comp][b] = has[comp][b] ? coeffs[comp][b] : nullptr;
  recon_chroma(addr, chroma_mode, dc_scan, cptr, intra);
}

void MbaffSlice::part_motion_cabac(MbaffCabac& cb, int addr, int l, int bx4,
                                   int by4, int w4_, int h4_, int ref_idx,
                                   int kind, int part_i, int* mvx,
                                   int* mvy) {
  cur_z = xy_to_z(bx4, by4);
  int mvdx = cb.mvd(addr, l, bx4, by4, 0);
  int mvdy = cb.mvd(addr, l, bx4, by4, 1);
  int px, py;
  mv_pred(addr, bx4, by4, w4_, h4_, ref_idx, kind, part_i, l, &px, &py);
  *mvx = px + mvdx;
  *mvy = py + mvdy;
  store_part_mv(addr, bx4, by4, w4_, h4_, ref_idx, *mvx, *mvy, l);
  store_part_mvd(addr, bx4, by4, w4_, h4_, l, mvdx, mvdy);
}

void MbaffSlice::decode_p_mb_cabac(MbaffCabac& cb, int addr, int mb_type) {
  st->mb_class[addr] = MB_P;
  int n0 = n_act(addr, 0);
  int predY[256], predU[64], predV[64];
  std::vector<int> sub_types;
  if (mb_type <= 2) {
    int kind, np;
    const SliceCtx::Part* parts = SliceCtx::p_parts(mb_type, &kind, &np);
    int refs[2];
    for (int i = 0; i < np; ++i) {
      cur_z = xy_to_z(parts[i].bx4, parts[i].by4);
      refs[i] = n0 > 1 ? cb.ref_idx(addr, 0, parts[i].bx4, parts[i].by4) : 0;
      for (int y = parts[i].by4; y < parts[i].by4 + parts[i].h4; ++y)
        for (int x = parts[i].bx4; x < parts[i].bx4 + parts[i].w4; ++x)
          st->ref_idx[st->mref(addr, 0, 4 * y + x)] = refs[i];
    }
    for (int i = 0; i < np; ++i) {
      int mvx, mvy;
      part_motion_cabac(cb, addr, 0, parts[i].bx4, parts[i].by4, parts[i].w4,
                        parts[i].h4, refs[i], kind, i, &mvx, &mvy);
      mc_part(addr, predY, predU, predV, parts[i].bx4, parts[i].by4,
              parts[i].w4, parts[i].h4, refs[i], mvx, mvy);
    }
  } else {
    sub_types.resize(4);
    for (int b = 0; b < 4; ++b) sub_types[b] = cb.sub_mb_type_p();
    int refs[4] = {0, 0, 0, 0};
    for (int b = 0; b < 4; ++b) {
      int bx0 = (b & 1) * 2, by0 = (b >> 1) * 2;
      if (mb_type == 3 && n0 > 1) {
        cur_z = xy_to_z(bx0, by0);
        refs[b] = cb.ref_idx(addr, 0, bx0, by0);
      }
      for (int y = by0; y < by0 + 2; ++y)
        for (int x = bx0; x < bx0 + 2; ++x)
          st->ref_idx[st->mref(addr, 0, 4 * y + x)] = refs[b];
    }
    for (int b = 0; b < 4; ++b) {
      int bx0 = (b & 1) * 2, by0 = (b >> 1) * 2;
      int ns;
      const SliceCtx::Part* sp = SliceCtx::sub_parts(sub_types[b], &ns);
      for (int s = 0; s < ns; ++s) {
        int bx4 = bx0 + sp[s].bx4, by4 = by0 + sp[s].by4;
        int mvx, mvy;
        part_motion_cabac(cb, addr, 0, bx4, by4, sp[s].w4, sp[s].h4, refs[b],
                          0, 0, &mvx, &mvy);
        mc_part(addr, predY, predU, predV, bx4, by4, sp[s].w4, sp[s].h4,
                refs[b], mvx, mvy);
      }
    }
  }
  cur_z = 16;
  bool tf8_ok = mb_type <= 2;
  if (!tf8_ok) {
    tf8_ok = true;
    for (int stp : sub_types) tf8_ok &= (stp == 0);
  }
  inter_residual_cabac(cb, addr, predY, predU, predV, tf8_ok);
}

void MbaffSlice::decode_b_mb_cabac(MbaffCabac& cb, int addr, int mb_type) {
  dc_valid = false;
  st->mb_class[addr] = MB_B;
  int predY[256], predU[64], predV[64];
  if (mb_type == 0) {
    st->mb_bdirect[addr] = 1;
    for (int b = 0; b < 4; ++b)
      decode_direct_8x8(addr, b, predY, predU, predV);
    cur_z = 16;
    inter_residual_cabac(cb, addr, predY, predU, predV,
                         sps->direct_8x8_inference != 0);
    return;
  }
  bool tf8_ok = true;
  if (mb_type < 22) {
    int kind, preds[2], np;
    SliceCtx::b_type(mb_type, &kind, preds, &np);
    int ng;
    const SliceCtx::Part* parts = SliceCtx::geom(kind, &ng);
    int refs[2][2] = {{-1, -1}, {-1, -1}};
    for (int l = 0; l < 2; ++l)
      for (int i = 0; i < np; ++i)
        if (preds[i] == 2 || preds[i] == l) {
          cur_z = xy_to_z(parts[i].bx4, parts[i].by4);
          int rr = n_act(addr, l) > 1
                       ? cb.ref_idx(addr, l, parts[i].bx4, parts[i].by4)
                       : 0;
          refs[l][i] = rr;
          for (int y = parts[i].by4; y < parts[i].by4 + parts[i].h4; ++y)
            for (int x = parts[i].bx4; x < parts[i].bx4 + parts[i].w4; ++x)
              st->ref_idx[st->mref(addr, l, 4 * y + x)] = rr;
        }
    int mvs[2][2][2];
    for (int l = 0; l < 2; ++l)
      for (int i = 0; i < np; ++i) {
        if (refs[l][i] < 0) continue;
        part_motion_cabac(cb, addr, l, parts[i].bx4, parts[i].by4,
                          parts[i].w4, parts[i].h4, refs[l][i], kind, i,
                          &mvs[l][i][0], &mvs[l][i][1]);
      }
    for (int i = 0; i < np; ++i) {
      PredBlk p0, p1;
      bool h0 = refs[0][i] >= 0, h1 = refs[1][i] >= 0;
      if (h0)
        fetch_pred(addr, 0, refs[0][i], parts[i].bx4, parts[i].by4,
                   parts[i].w4, parts[i].h4, mvs[0][i][0], mvs[0][i][1], p0);
      if (h1)
        fetch_pred(addr, 1, refs[1][i], parts[i].bx4, parts[i].by4,
                   parts[i].w4, parts[i].h4, mvs[1][i][0], mvs[1][i][1], p1);
      combine_store(addr, predY, predU, predV, parts[i].bx4, parts[i].by4,
                    parts[i].w4, parts[i].h4, h0 ? &p0 : nullptr,
                    h1 ? &p1 : nullptr, refs[0][i], refs[1][i]);
    }
  } else {
    int sub_types[4];
    for (int b = 0; b < 4; ++b) {
      sub_types[b] = cb.sub_mb_type_b();
      if (sub_types[b] > 12) throw DecodeError("bad B sub_mb_type");
    }
    for (int b = 0; b < 4; ++b) {
      int pm, ns;
      const SliceCtx::Part* sp;
      SliceCtx::b_sub(sub_types[b], &pm, &sp, &ns);
      if (pm == -1) {
        cur_z = xy_to_z((b & 1) * 2, (b >> 1) * 2);
        decode_direct_8x8(addr, b, predY, predU, predV);
      }
    }
    int refs[2][4] = {{-1, -1, -1, -1}, {-1, -1, -1, -1}};
    for (int l = 0; l < 2; ++l)
      for (int b = 0; b < 4; ++b) {
        int pm, ns;
        const SliceCtx::Part* sp;
        SliceCtx::b_sub(sub_types[b], &pm, &sp, &ns);
        if (pm == 2 || pm == l) {
          int bx0 = (b & 1) * 2, by0 = (b >> 1) * 2;
          cur_z = xy_to_z(bx0, by0);
          int rr = n_act(addr, l) > 1 ? cb.ref_idx(addr, l, bx0, by0) : 0;
          refs[l][b] = rr;
          for (int y = by0; y < by0 + 2; ++y)
            for (int x = bx0; x < bx0 + 2; ++x)
              st->ref_idx[st->mref(addr, l, 4 * y + x)] = rr;
        }
      }
    int submv[2][4][4][2];
    for (int l = 0; l < 2; ++l)
      for (int b = 0; b < 4; ++b) {
        int pm, ns;
        const SliceCtx::Part* sp;
        SliceCtx::b_sub(sub_types[b], &pm, &sp, &ns);
        if (pm == -1 || !(pm == 2 || pm == l)) continue;
        for (int s = 0; s < ns; ++s) {
          int bx4 = (b & 1) * 2 + sp[s].bx4;
          int by4 = (b >> 1) * 2 + sp[s].by4;
          part_motion_cabac(cb, addr, l, bx4, by4, sp[s].w4, sp[s].h4,
                            refs[l][b], 0, 0, &submv[l][b][s][0],
                            &submv[l][b][s][1]);
        }
      }
    for (int b = 0; b < 4; ++b) {
      int pm, ns;
      const SliceCtx::Part* sp;
      SliceCtx::b_sub(sub_types[b], &pm, &sp, &ns);
      if (pm == -1) continue;
      for (int s = 0; s < ns; ++s) {
        int bx4 = (b & 1) * 2 + sp[s].bx4;
        int by4 = (b >> 1) * 2 + sp[s].by4;
        PredBlk p0, p1;
        bool h0 = refs[0][b] >= 0, h1 = refs[1][b] >= 0;
        if (h0)
          fetch_pred(addr, 0, refs[0][b], bx4, by4, sp[s].w4, sp[s].h4,
                     submv[0][b][s][0], submv[0][b][s][1], p0);
        if (h1)
          fetch_pred(addr, 1, refs[1][b], bx4, by4, sp[s].w4, sp[s].h4,
                     submv[1][b][s][0], submv[1][b][s][1], p1);
        combine_store(addr, predY, predU, predV, bx4, by4, sp[s].w4,
                      sp[s].h4, h0 ? &p0 : nullptr, h1 ? &p1 : nullptr,
                      refs[0][b], refs[1][b]);
      }
    }
    tf8_ok = true;
    for (int b = 0; b < 4; ++b)
      tf8_ok &= ((sub_types[b] == 0 && sps->direct_8x8_inference) ||
                 (sub_types[b] >= 1 && sub_types[b] <= 3));
  }
  cur_z = 16;
  inter_residual_cabac(cb, addr, predY, predU, predV, tf8_ok);
}

void MbaffSlice::inter_residual_cabac(MbaffCabac& cb, int addr, int* predY,
                                      int* predU, int* predV, bool tf8_ok) {
  int cbp = cb.cbp(addr);
  int cbp_luma = cbp & 15, cbp_chroma = cbp >> 4;
  int tf8 = 0;
  if (cbp_luma && tf8_ok && pps->transform_8x8_mode)
    tf8 = cb.transform_size_8x8(addr);
  st->mb_tf8[addr] = (int8_t)tf8;
  qp_delta_cabac(cb, addr, cbp, false);
  int x0 = st->luma_x0(addr);
  uint8_t* Y = pic->Y.data();
  if (tf8) {
    const uint8_t* scan = scan8(addr);
    for (int b = 0; b < 4; ++b) {
      int bx = (b & 1) * 2, by = (b >> 1) * 2;
      if (!(cbp_luma & (1 << b))) {
        for (int yy = 0; yy < 8; ++yy) {
          uint8_t* row =
              Y + (size_t)st->luma_y(addr, by * 4 + yy) * pic->w;
          for (int xx = 0; xx < 8; ++xx)
            row[x0 + bx * 4 + xx] = (uint8_t)clamp_i(
                predY[16 * (by * 4 + yy) + bx * 4 + xx], 0, 255);
        }
        continue;
      }
      int scan64[64];
      cb.residual(addr, 5, 64, 0, 0, 0, scan64);
      int nz = 0;
      for (int i = 0; i < 64; ++i) nz += scan64[i] != 0;
      for (int dy = 0; dy < 2; ++dy)
        for (int dx = 0; dx < 2; ++dx) {
          st->cbf_y[st->cell(addr, 4 * (by + dy) + bx + dx)] = 1;
          st->nnz_y[st->cell(addr, 4 * (by + dy) + bx + dx)] = (int8_t)nz;
        }
      const int32_t* ls = dq8(qp, 1);
      int d[64], res[64];
      std::memset(d, 0, sizeof(d));
      for (int s = 0; s < 64; ++s) {
        int c = scan64[s];
        if (c) {
          int pos = scan[s];
          d[pos] = dequant8_apply(c, ls[pos], qp);
        }
      }
      idct8x8(d, res);
      for (int yy = 0; yy < 8; ++yy) {
        uint8_t* row = Y + (size_t)st->luma_y(addr, by * 4 + yy) * pic->w;
        for (int xx = 0; xx < 8; ++xx)
          row[x0 + bx * 4 + xx] = (uint8_t)clip1(
              predY[16 * (by * 4 + yy) + bx * 4 + xx] + res[8 * yy + xx]);
      }
    }
    std::memcpy(pred_chromaU, predU, sizeof(pred_chromaU));
    std::memcpy(pred_chromaV, predV, sizeof(pred_chromaV));
    decode_chroma_cabac(cb, addr, 0, cbp_chroma, false);
    return;
  }
  const uint8_t* scan = scan4(addr);
  const int32_t* dq = dq4(qp, 3);
  for (int k = 0; k < 16; ++k) {
    int x4 = kZtoX[k], y4 = kZtoY[k];
    int blk[16];
    bool has = false;
    if (cbp_luma & (1 << (k >> 2))) {
      cur_z = k;
      has = luma4_res_cabac(cb, addr, k, 2, blk);
    }
    if (!has) {
      for (int yy = 0; yy < 4; ++yy) {
        uint8_t* row = Y + (size_t)st->luma_y(addr, y4 * 4 + yy) * pic->w;
        for (int xx = 0; xx < 4; ++xx)
          row[x0 + x4 * 4 + xx] = (uint8_t)clamp_i(
              predY[16 * (y4 * 4 + yy) + x4 * 4 + xx], 0, 255);
      }
      continue;
    }
    int d[16], res[16];
    std::memset(d, 0, sizeof(d));
    for (int s = 0; s < 16; ++s) {
      int c = blk[s];
      if (c) {
        int pos = scan[s];
        d[pos] = dequant4_apply(c, dq[pos], qp);
      }
    }
    idct4x4(d, res);
    for (int yy = 0; yy < 4; ++yy) {
      uint8_t* row = Y + (size_t)st->luma_y(addr, y4 * 4 + yy) * pic->w;
      for (int xx = 0; xx < 4; ++xx)
        row[x0 + x4 * 4 + xx] = (uint8_t)clip1(
            predY[16 * (y4 * 4 + yy) + x4 * 4 + xx] + res[4 * yy + xx]);
    }
  }
  cur_z = 16;
  std::memcpy(pred_chromaU, predU, sizeof(pred_chromaU));
  std::memcpy(pred_chromaV, predV, sizeof(pred_chromaV));
  decode_chroma_cabac(cb, addr, 0, cbp_chroma, false);
}

void MbaffSlice::decode_cabac(const std::vector<uint8_t>& rbsp) {
  MbaffCabac cb(this, rbsp.data(), rbsp.size(), h);
  int n_mbs = st->mb_w * st->mb_h;
  int addr = h->first_mb * 2;
  int pending_top = -1;
  bool is_pb = h->slice_type == SLICE_P || h->slice_type == SLICE_B;
  while (addr < n_mbs) {
    if ((addr & 1) == 0)
      st->field_flag[addr >> 1] = (int8_t)infer_field_flag(addr >> 1);
    bool skipped = false;
    if (is_pb) {
      cur_addr = addr;
      if ((addr & 1) == 0) mark_mb(addr);
      skipped = cb.mb_skip_flag(addr) != 0;
    }
    if (skipped) {
      if ((addr & 1) == 0) {
        st->mb_skip[addr] = 1;
        st->slice_id[addr] = sid;
        if (h->slice_type == SLICE_B) st->mb_bdirect[addr] = 1;
        pending_top = addr;
      } else {
        if (pending_top >= 0) {
          decode_skip_mb(pending_top);
          pending_top = -1;
        }
        decode_skip_mb(addr);
      }
      cb.prev_qp_delta_nz = 0;
    } else {
      if ((addr & 1) == 0 || pending_top >= 0)
        st->field_flag[addr >> 1] = (int8_t)cb.mb_field_decoding_flag(addr);
      if (pending_top >= 0) {
        decode_skip_mb(pending_top);
        pending_top = -1;
      }
      mark_mb(addr);
      cur_addr = addr;
      cur_z = 0;
      decode_mb_cabac(cb, addr);
    }
    if ((addr & 1) == 1) {
      if (pending_top >= 0) {
        decode_skip_mb(pending_top);
        pending_top = -1;
      }
      if (cb.end_of_slice()) break;
    }
    ++addr;
  }
  if (pending_top >= 0) decode_skip_mb(pending_top);
}

// ---------------------------------------------------------------------------
// MBAFF deblocking (h264_mbaff.py _MbaffDeblock)
// ---------------------------------------------------------------------------

struct MbaffDeblock {
  Picture& pic;
  MbaffState& st;
  int coff[2];

  MbaffDeblock(Picture& p) : pic(p), st(*p.mbaff) {
    coff[0] = p.coff[0];
    coff[1] = p.coff[1];
  }

  bool coded(int addr, int cx, int cy) const {
    if (st.mb_tf8[addr]) {
      int x0 = cx & ~1, y0 = cy & ~1;
      return st.nnz_y[st.cell(addr, 4 * y0 + x0)] ||
             st.nnz_y[st.cell(addr, 4 * y0 + x0 + 1)] ||
             st.nnz_y[st.cell(addr, 4 * (y0 + 1) + x0)] ||
             st.nnz_y[st.cell(addr, 4 * (y0 + 1) + x0 + 1)];
    }
    return st.nnz_y[st.cell(addr, 4 * cy + cx)] != 0;
  }

  int bs_mv(int addrP, int cellP, int addrQ, int cellQ) const {
    int vth = st.is_field(addrQ) ? 2 : 4;
    int32_t upr[2];
    int upx[2], upy[2], nup = 0;
    int32_t uqr[2];
    int uqx[2], uqy[2], nuq = 0;
    for (int l = 0; l < 2; ++l) {
      int32_t rp = st.ref_id[st.mref(addrP, l, cellP)];
      if (rp >= 0) {
        upr[nup] = rp;
        upx[nup] = st.mv[st.mmv(addrP, l, cellP, 0)];
        upy[nup] = st.mv[st.mmv(addrP, l, cellP, 1)];
        ++nup;
      }
      int32_t rq = st.ref_id[st.mref(addrQ, l, cellQ)];
      if (rq >= 0) {
        uqr[nuq] = rq;
        uqx[nuq] = st.mv[st.mmv(addrQ, l, cellQ, 0)];
        uqy[nuq] = st.mv[st.mmv(addrQ, l, cellQ, 1)];
        ++nuq;
      }
    }
    if (nup != nuq) return 1;
    int32_t sp0 = nup > 1 ? std::min(upr[0], upr[1]) : (nup ? upr[0] : -1);
    int32_t sp1 = nup > 1 ? std::max(upr[0], upr[1]) : -1;
    int32_t sq0 = nuq > 1 ? std::min(uqr[0], uqr[1]) : (nuq ? uqr[0] : -1);
    int32_t sq1 = nuq > 1 ? std::max(uqr[0], uqr[1]) : -1;
    if (sp0 != sq0 || sp1 != sq1) return 1;
    auto far_ = [&](int ax, int ay, int bx, int by) {
      return std::abs(ax - bx) >= 4 || std::abs(ay - by) >= vth;
    };
    if (nup == 1) return far_(upx[0], upy[0], uqx[0], uqy[0]) ? 1 : 0;
    if (nup == 0) return 0;
    if (upr[0] != upr[1]) {
      for (int i = 0; i < 2; ++i) {
        int jm = (uqr[0] == upr[i]) ? 0 : 1;
        if (far_(upx[i], upy[i], uqx[jm], uqy[jm])) return 1;
      }
      return 0;
    }
    bool a = !far_(upx[0], upy[0], uqx[0], uqy[0]) &&
             !far_(upx[1], upy[1], uqx[1], uqy[1]);
    bool b = !far_(upx[0], upy[0], uqx[1], uqy[1]) &&
             !far_(upx[1], upy[1], uqx[0], uqy[0]);
    return (a || b) ? 0 : 1;
  }

  int bs(int addrP, int cellP, int addrQ, int cellQ, bool mb_edge,
         bool vertical) const {
    if (st.is_intra(addrP) || st.is_intra(addrQ)) {
      if (mb_edge &&
          (vertical || (!st.is_field(addrP) && !st.is_field(addrQ))))
        return 4;
      return 3;
    }
    if (coded(addrP, cellP & 3, cellP >> 2) ||
        coded(addrQ, cellQ & 3, cellQ >> 2))
      return 2;
    if (st.is_field(addrP) != st.is_field(addrQ)) return 1;
    return bs_mv(addrP, cellP, addrQ, cellQ);
  }

  void thresholds(int addrP, int addrQ, int bs_, int chroma_comp, int* alpha,
                  int* beta, int* tc0) const {
    int qpp = st.mb_qp[addrP];
    int qpq = st.mb_qp[addrQ];
    int qav;
    if (chroma_comp < 0)
      qav = (qpp + qpq + 1) >> 1;
    else
      qav = (chroma_qp_map(qpp, coff[chroma_comp]) +
             chroma_qp_map(qpq, coff[chroma_comp]) + 1) >> 1;
    int ia = clamp_i(qav + st.mb_alpha_off[addrQ], 0, 51);
    int ib = clamp_i(qav + st.mb_beta_off[addrQ], 0, 51);
    *alpha = kAlpha[ia];
    *beta = kBeta[ib];
    *tc0 = (bs_ < 4) ? kTc0[52 * (bs_ - 1) + ia] : 0;
  }

  // horizontal-edge filter with explicit line lists
  void filter_h(uint8_t* plane, long stride, int x, const int* q_lines,
                const int* p_lines, int bs_, int alpha, int beta, int tc0,
                bool luma) const {
    auto P = [&](int k) -> uint8_t& {
      return plane[(size_t)p_lines[k] * stride + x];
    };
    auto Q = [&](int k) -> uint8_t& {
      return plane[(size_t)q_lines[k] * stride + x];
    };
    int p0 = P(0), p1 = P(1), p2 = P(2);
    int q0 = Q(0), q1 = Q(1), q2 = Q(2);
    if (std::abs(p0 - q0) >= alpha || std::abs(p1 - p0) >= beta ||
        std::abs(q1 - q0) >= beta)
      return;
    int ap = std::abs(p2 - p0);
    int aq = std::abs(q2 - q0);
    if (bs_ < 4) {
      int tc =
          luma ? tc0 + (ap < beta ? 1 : 0) + (aq < beta ? 1 : 0) : tc0 + 1;
      int delta = ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3;
      delta = clamp_i(delta, -tc, tc);
      P(0) = (uint8_t)clip1(p0 + delta);
      Q(0) = (uint8_t)clip1(q0 - delta);
      if (luma && ap < beta) {
        int d = (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1;
        d = clamp_i(d, -tc0, tc0);
        P(1) = (uint8_t)(p1 + d);
      }
      if (luma && aq < beta) {
        int d = (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1;
        d = clamp_i(d, -tc0, tc0);
        Q(1) = (uint8_t)(q1 + d);
      }
      return;
    }
    if (luma) {
      bool strong = std::abs(p0 - q0) < (alpha >> 2) + 2;
      if (strong && ap < beta) {
        int p3 = P(3);
        P(0) = (uint8_t)((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3);
        P(1) = (uint8_t)((p2 + p1 + p0 + q0 + 2) >> 2);
        P(2) = (uint8_t)((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3);
      } else {
        P(0) = (uint8_t)((2 * p1 + p0 + q1 + 2) >> 2);
      }
      if (strong && aq < beta) {
        int q3 = Q(3);
        Q(0) = (uint8_t)((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3);
        Q(1) = (uint8_t)((q2 + q1 + q0 + p0 + 2) >> 2);
        Q(2) = (uint8_t)((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3);
      } else {
        Q(0) = (uint8_t)((2 * q1 + q0 + p1 + 2) >> 2);
      }
    } else {
      P(0) = (uint8_t)((2 * p1 + p0 + q1 + 2) >> 2);
      Q(0) = (uint8_t)((2 * q1 + q0 + p1 + 2) >> 2);
    }
  }

  void p_mb_of_line(int line, int pair_x, bool chroma, int* addrN,
                    int* yW) const {
    int band = chroma ? 16 : 32;
    int pair_y = line / band;
    int pair = pair_y * st.mb_w + pair_x;
    int local = line - pair_y * band;
    if (st.field_flag[pair]) {
      *addrN = 2 * pair + (local & 1);
      *yW = local >> 1;
      return;
    }
    int half = band / 2;
    if (local < half) {
      *addrN = 2 * pair;
      *yW = local;
    } else {
      *addrN = 2 * pair + 1;
      *yW = local - half;
    }
  }

  void deblock_mb(int addr) {
    int px = st.pair_x(addr), py = st.pair_y(addr);
    int disable = st.mb_disable[addr];
    int tf8 = st.mb_tf8[addr];
    int sid = st.slice_id[addr];
    int x0 = st.luma_x0(addr);
    int cx0 = px * 8;
    uint8_t* Y = pic.Y.data();
    auto mb_ok = [&](int addrN) -> bool {
      if (st.slice_id[addrN] < 0) return false;
      if (disable == 2 && st.slice_id[addrN] != sid) return false;
      return true;
    };
    // ---- vertical edges ----
    for (int e = 0; e < 4; ++e) {
      if (e == 0) {
        if (px == 0) continue;
        int left_pair = py * st.mb_w + px - 1;
        bool mixed =
            (st.field_flag[left_pair] != 0) != st.is_field(addr);
        if (mixed) {
          for (int j = 0; j < 2; ++j) {
            int addrP = 2 * left_pair + j;
            if (!mb_ok(addrP)) continue;
            int rows[8];
            if (st.is_field(addr))
              for (int i = 0; i < 8; ++i) rows[i] = 8 * j + i;
            else
              for (int i = 0; i < 8; ++i) rows[i] = j + 2 * i;
            for (int g = 0; g < 4; ++g) {
              int r0 = rows[2 * g], r1 = rows[2 * g + 1];
              int line0 = st.luma_y(addr, r0);
              int dummy, pr;
              p_mb_of_line(line0, px - 1, false, &dummy, &pr);
              int cellQ = 4 * (r0 >> 2);
              int cellP = 4 * (pr >> 2) + 3;
              int b = bs(addrP, cellP, addr, cellQ, true, true);
              if (b == 0) continue;
              int alpha, beta, tc0;
              thresholds(addrP, addr, b, -1, &alpha, &beta, &tc0);
              if (alpha != 0 && beta != 0) {
                for (int rr : {r0, r1})
                  deblock_line_p(
                      Y + (size_t)st.luma_y(addr, rr) * pic.w + x0, 1, b,
                      alpha, beta, tc0, true);
              }
              int crow = st.is_field(addr) ? 4 * j + g : j + 2 * g;
              int cl = st.chroma_y(addr, crow);
              for (int comp = 0; comp < 2; ++comp) {
                uint8_t* plane = comp ? pic.V.data() : pic.U.data();
                int ca, cbeta, ctc0;
                thresholds(addrP, addr, b, comp, &ca, &cbeta, &ctc0);
                if (ca == 0 || cbeta == 0) continue;
                deblock_line_p(plane + (size_t)cl * pic.cw + cx0, 1, b, ca,
                               cbeta, ctc0, false);
              }
            }
          }
          continue;
        }
        int addrP = 2 * left_pair + (addr & 1);
        if (!mb_ok(addrP)) continue;
        for (int seg = 0; seg < 4; ++seg) {
          int cellQ = 4 * seg;
          int cellP = 4 * seg + 3;
          int b = bs(addrP, cellP, addr, cellQ, true, true);
          if (b == 0) continue;
          int alpha, beta, tc0;
          thresholds(addrP, addr, b, -1, &alpha, &beta, &tc0);
          if (alpha != 0 && beta != 0)
            for (int i = 0; i < 4; ++i)
              deblock_line_p(
                  Y + (size_t)st.luma_y(addr, 4 * seg + i) * pic.w + x0, 1,
                  b, alpha, beta, tc0, true);
          for (int comp = 0; comp < 2; ++comp) {
            uint8_t* plane = comp ? pic.V.data() : pic.U.data();
            int ca, cbeta, ctc0;
            thresholds(addrP, addr, b, comp, &ca, &cbeta, &ctc0);
            if (ca == 0 || cbeta == 0) continue;
            for (int i = 0; i < 2; ++i)
              deblock_line_p(
                  plane + (size_t)st.chroma_y(addr, 2 * seg + i) * pic.cw +
                      cx0,
                  1, b, ca, cbeta, ctc0, false);
          }
        }
        continue;
      }
      if (tf8 && (e & 1)) continue;
      for (int seg = 0; seg < 4; ++seg) {
        int cellQ = 4 * seg + e;
        int cellP = 4 * seg + e - 1;
        int b = bs(addr, cellP, addr, cellQ, false, true);
        if (b == 0) continue;
        int alpha, beta, tc0;
        thresholds(addr, addr, b, -1, &alpha, &beta, &tc0);
        if (alpha != 0 && beta != 0)
          for (int i = 0; i < 4; ++i)
            deblock_line_p(
                Y + (size_t)st.luma_y(addr, 4 * seg + i) * pic.w + x0 +
                    4 * e,
                1, b, alpha, beta, tc0, true);
        if (e == 2) {
          for (int comp = 0; comp < 2; ++comp) {
            uint8_t* plane = comp ? pic.V.data() : pic.U.data();
            int ca, cbeta, ctc0;
            thresholds(addr, addr, b, comp, &ca, &cbeta, &ctc0);
            if (ca == 0 || cbeta == 0) continue;
            for (int i = 0; i < 2; ++i)
              deblock_line_p(
                  plane + (size_t)st.chroma_y(addr, 2 * seg + i) * pic.cw +
                      cx0 + 4,
                  1, b, ca, cbeta, ctc0, false);
          }
        }
      }
    }
    // ---- horizontal edges ----
    for (int e = 0; e < 4; ++e) {
      if (e == 0) {
        int top_line = st.luma_y(addr, -1);
        if (top_line < 0) continue;
        bool special = !st.is_field(addr) && (addr & 1) == 0 && py > 0 &&
                       st.field_flag[(py - 1) * st.mb_w + px];
        if (special) {
          int above_pair = (py - 1) * st.mb_w + px;
          for (int f = 0; f < 2; ++f) {
            int addrP = 2 * above_pair + f;
            if (!mb_ok(addrP)) continue;
            int q_lines[4], p_lines[4];
            for (int k = 0; k < 4; ++k) {
              q_lines[k] = st.luma_y(addr, f + 2 * k);
              p_lines[k] = st.luma_y(addrP, 15 - k);
            }
            for (int seg = 0; seg < 4; ++seg) {
              int cellQ = seg;
              int cellP = 12 + seg;
              int b = bs(addrP, cellP, addr, cellQ, true, false);
              if (b == 0) continue;
              int alpha, beta, tc0;
              thresholds(addrP, addr, b, -1, &alpha, &beta, &tc0);
              if (alpha != 0 && beta != 0)
                for (int i = 0; i < 4; ++i)
                  filter_h(Y, pic.w, x0 + 4 * seg + i, q_lines, p_lines, b,
                           alpha, beta, tc0, true);
              int cq[3], cp[3];
              for (int k = 0; k < 3; ++k) {
                cq[k] = st.chroma_y(addr, f + 2 * k);
                cp[k] = st.chroma_y(addrP, 7 - k);
              }
              for (int comp = 0; comp < 2; ++comp) {
                uint8_t* plane = comp ? pic.V.data() : pic.U.data();
                int ca, cbeta, ctc0;
                thresholds(addrP, addr, b, comp, &ca, &cbeta, &ctc0);
                if (ca == 0 || cbeta == 0) continue;
                for (int i = 0; i < 2; ++i)
                  filter_h(plane, pic.cw, cx0 + 2 * seg + i, cq, cp, b, ca,
                           cbeta, ctc0, false);
              }
            }
          }
          continue;
        }
        int addrP, prow;
        p_mb_of_line(top_line, px, false, &addrP, &prow);
        if (!mb_ok(addrP)) continue;
        int q_lines[4], p_lines[4];
        for (int k = 0; k < 4; ++k) {
          q_lines[k] = st.luma_y(addr, k);
          p_lines[k] = st.luma_y(addr, -1 - k);
        }
        bool mb_edge = addrP != addr;
        for (int seg = 0; seg < 4; ++seg) {
          int cellQ = seg;
          int cellP = 4 * (prow >> 2) + seg;
          int b = bs(addrP, cellP, addr, cellQ, mb_edge, false);
          if (b == 0) continue;
          int alpha, beta, tc0;
          thresholds(addrP, addr, b, -1, &alpha, &beta, &tc0);
          if (alpha != 0 && beta != 0)
            for (int i = 0; i < 4; ++i)
              filter_h(Y, pic.w, x0 + 4 * seg + i, q_lines, p_lines, b,
                       alpha, beta, tc0, true);
          int cq[3], cp[3];
          for (int k = 0; k < 3; ++k) {
            cq[k] = st.chroma_y(addr, k);
            cp[k] = st.chroma_y(addr, -1 - k);
          }
          for (int comp = 0; comp < 2; ++comp) {
            uint8_t* plane = comp ? pic.V.data() : pic.U.data();
            int ca, cbeta, ctc0;
            thresholds(addrP, addr, b, comp, &ca, &cbeta, &ctc0);
            if (ca == 0 || cbeta == 0) continue;
            for (int i = 0; i < 2; ++i)
              filter_h(plane, pic.cw, cx0 + 2 * seg + i, cq, cp, b, ca,
                       cbeta, ctc0, false);
          }
        }
        continue;
      }
      if (tf8 && (e & 1)) continue;
      int q_lines[4], p_lines[4];
      for (int k = 0; k < 4; ++k) {
        q_lines[k] = st.luma_y(addr, 4 * e + k);
        p_lines[k] = st.luma_y(addr, 4 * e - 1 - k);
      }
      for (int seg = 0; seg < 4; ++seg) {
        int cellQ = 4 * e + seg;
        int cellP = 4 * (e - 1) + seg;
        int b = bs(addr, cellP, addr, cellQ, false, false);
        if (b == 0) continue;
        int alpha, beta, tc0;
        thresholds(addr, addr, b, -1, &alpha, &beta, &tc0);
        if (alpha != 0 && beta != 0)
          for (int i = 0; i < 4; ++i)
            filter_h(Y, pic.w, x0 + 4 * seg + i, q_lines, p_lines, b, alpha,
                     beta, tc0, true);
        if (e == 2) {
          int cq[3], cp[3];
          for (int k = 0; k < 3; ++k) {
            cq[k] = st.chroma_y(addr, 4 + k);
            cp[k] = st.chroma_y(addr, 3 - k);
          }
          for (int comp = 0; comp < 2; ++comp) {
            uint8_t* plane = comp ? pic.V.data() : pic.U.data();
            int ca, cbeta, ctc0;
            thresholds(addr, addr, b, comp, &ca, &cbeta, &ctc0);
            if (ca == 0 || cbeta == 0) continue;
            for (int i = 0; i < 2; ++i)
              filter_h(plane, pic.cw, cx0 + 2 * seg + i, cq, cp, b, ca,
                       cbeta, ctc0, false);
          }
        }
      }
    }
  }
};

static void deblock_picture_mbaff(Picture& pic) {
  MbaffState& st = *pic.mbaff;
  MbaffDeblock db(pic);
  int n = st.mb_w * st.mb_h;
  for (int addr = 0; addr < n; ++addr) {
    if (st.slice_id[addr] < 0) continue;
    if (st.mb_disable[addr] == 1) continue;
    db.deblock_mb(addr);
  }
}

void Decoder::decode_slice_mbaff(const std::vector<uint8_t>& rbsp_,
                                 const SliceHeader& h, const SPS& sps,
                                 const PPS& pps) {
  Picture* pic = cur.get();
  MbaffSlice sl(this, pic, &h, &sps, &pps, slice_counter);
  if (h.slice_type == SLICE_P) {
    sl.ref_l0 = build_ref_list_p(h, sps);
  } else if (h.slice_type == SLICE_B) {
    build_ref_lists_b(h, sps, pic->poc, sl.ref_l0, sl.ref_l1);
  }
  if (pps.entropy_coding_mode) {
    sl.decode_cabac(rbsp_);
  } else {
    BitReader r(rbsp_.data(), rbsp_.size(), h.data_bit_pos);
    sl.decode_cavlc(r);
  }
}

}  // namespace h264
