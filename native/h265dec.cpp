// native/h265dec.cpp -- from-scratch H.265/HEVC (ITU-T H.265) decoder.
//
// Bit-exact C++ twin of the pure-Python oracle
// amatsukaze_tpu/video/h265_ref.py (functions cite the oracle they
// mirror; the oracle is cross-validated bit-exactly against libavcodec
// on libx265 streams in tests/test_h265_decode.py, and the
// native/oracle differential runs in tests/test_h265_native.py).  The
// reference project decodes HEVC via FFmpeg (reference
// Amatsukaze/ReaderWriterFFmpeg.hpp:355-429); there is no reference
// decoder to port -- this is an independent implementation.
//
// Scope (the oracle's): Main / Main10 (8/10-bit 4:2:0), all slice
// types incl. B pyramids, WPP (with wavefront-parallel decode), tiles,
// multiple/dependent slices, scaling lists, PCM, long-term references,
// transform skip, transquant bypass, sign data hiding, cu_qp_delta,
// deblocking, SAO.
//
// Pixels are stored as uint16_t regardless of depth: broadcast HEVC
// (BS4K, ARIB STD-B32) is Main10, so the 10-bit path is the hot one;
// 8-bit output converts on PopFrame.

#include <algorithm>
#include <array>
#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <map>
#include <memory>
#include <mutex>
#include <stdexcept>
#include <thread>
#include <vector>

#include "h265_tables.inc"

#if defined(__AVX2__)
#include <immintrin.h>
#define H265_SIMD 1
#endif

namespace h265 {

struct DecodeError : std::runtime_error {
  explicit DecodeError(const char* m) : std::runtime_error(m) {}
};

static inline int clamp_i(int v, int lo, int hi) {
  return v < lo ? lo : v > hi ? hi : v;
}

// NAL unit types (Table 7-1)
enum {
  NAL_BLA_W_LP = 16,
  NAL_IDR_W_RADL = 19,
  NAL_IDR_N_LP = 20,
  NAL_CRA = 21,
  NAL_VPS = 32,
  NAL_SPS = 33,
  NAL_PPS = 34,
};
enum { SLICE_B = 0, SLICE_P = 1, SLICE_I = 2 };

// PU partition modes (Table 7-10)
enum {
  PART_2Nx2N = 0,
  PART_2NxN,
  PART_Nx2N,
  PART_NxN,
  PART_2NxnU,
  PART_2NxnD,
  PART_nLx2N,
  PART_nRx2N,
};

// ---------------------------------------------------------------------------
// Annex B split + emulation-prevention removal (h265_ref.py nal_to_rbsp;
// split reused from h264_ref.split_annexb semantics)
// ---------------------------------------------------------------------------

static void split_annexb(const uint8_t* d, size_t n,
                         std::vector<std::pair<size_t, size_t>>& out) {
  out.clear();
  size_t i = 0;
  long start = -1;
  while (i + 2 < n) {
    if (d[i] == 0 && d[i + 1] == 0 && d[i + 2] == 1) {
      if (start >= 0) {
        size_t end = i;
        while (end > (size_t)start && d[end - 1] == 0) --end;
        out.emplace_back((size_t)start, end - (size_t)start);
      }
      start = (long)(i + 3);
      i += 3;
    } else {
      ++i;
    }
  }
  if (start >= 0 && (size_t)start <= n)
    out.emplace_back((size_t)start, n - (size_t)start);
}

// Strip 0x000003 emulation bytes; record RBSP positions where a 0x03
// was removed (entry points count EBSP bytes) -- h265_ref.py:41-58.
static void nal_to_rbsp(const uint8_t* d, size_t n, std::vector<uint8_t>& out,
                        std::vector<size_t>& epb) {
  out.clear();
  epb.clear();
  out.reserve(n);
  size_t i = 0;
  while (i < n) {
    if (i + 2 < n && d[i] == 0 && d[i + 1] == 0 && d[i + 2] == 3) {
      out.push_back(0);
      out.push_back(0);
      epb.push_back(out.size());
      i += 3;
    } else {
      out.push_back(d[i]);
      ++i;
    }
  }
}

static size_t ebsp_off_to_rbsp(size_t off, const std::vector<size_t>& epb) {
  size_t r = off;
  for (size_t p : epb) {
    if (p <= r)
      --r;
    else
      break;
  }
  return r;
}

// ---------------------------------------------------------------------------
// BitReader (utils/bits.py: MSB-first, exp-golomb)
// ---------------------------------------------------------------------------

struct BitReader {
  const uint8_t* data;
  size_t size;  // bytes
  size_t pos;   // bits
  BitReader(const uint8_t* d, size_t n, size_t bitpos = 0)
      : data(d), size(n), pos(bitpos) {}
  size_t total() const { return size * 8; }
  int read1() {
    if (pos >= total()) throw DecodeError("EOF");
    int v = (data[pos >> 3] >> (7 - (pos & 7))) & 1;
    ++pos;
    return v;
  }
  uint32_t read(int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | read1();
    return v;
  }
  void skip(int n) {
    if ((long)(pos + n) > (long)total()) throw DecodeError("EOF skip");
    pos += n;
  }
  bool byte_aligned() const { return (pos & 7) == 0; }
  size_t byte_pos() const { return pos >> 3; }
  int ue() {
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

// ---------------------------------------------------------------------------
// Parameter sets (7.3.2; h265_ref.py parse_sps/parse_pps)
// ---------------------------------------------------------------------------

struct ShortTermRps {
  // (delta_poc, used) closest-first; neg deltas < 0, pos > 0
  std::vector<std::pair<int, int>> neg, pos;
  int num_delta_pocs() const { return (int)(neg.size() + pos.size()); }
};

// profile_tier_level (7.3.3), contents skipped (h265_ref.py:76-86)
static void skip_ptl(BitReader& r, int max_sub) {
  r.skip(8 + 32 + 48 + 8);
  std::vector<std::pair<int, int>> sub;
  for (int i = 0; i < max_sub; ++i) {
    int pp = r.read1();
    int lp = r.read1();
    sub.emplace_back(pp, lp);
  }
  if (max_sub > 0) r.skip(2 * (8 - max_sub));
  for (auto& s : sub) {
    if (s.first) r.skip(88);
    if (s.second) r.skip(8);
  }
}

// st_ref_pic_set (7.3.7 + 7.4.8 derivation; h265_ref.py parse_strps)
static ShortTermRps parse_strps(BitReader& r, int idx,
                                const std::vector<ShortTermRps>& prev,
                                int num_sets) {
  int inter = idx != 0 ? r.read1() : 0;
  ShortTermRps out;
  if (inter) {
    int delta_idx = (idx == num_sets) ? r.ue() + 1 : 1;
    if (delta_idx > idx) throw DecodeError("bad RPS delta_idx");
    const ShortTermRps& ref = prev[idx - delta_idx];
    int sign = r.read1();
    int delta_rps = (1 - 2 * sign) * (r.ue() + 1);
    int nd = ref.num_delta_pocs();
    std::vector<std::pair<int, int>> flags;
    for (int i = 0; i <= nd; ++i) {
      int used = r.read1();
      int use_delta = used ? 1 : r.read1();
      flags.emplace_back(used, use_delta);
    }
    // S0 (7.4.8): ref positives in reverse, deltaRps itself, ref negs
    for (int j = (int)ref.pos.size() - 1; j >= 0; --j) {
      int dpoc = ref.pos[j].first + delta_rps;
      auto [u, ud] = flags[ref.neg.size() + j];
      if (dpoc < 0 && ud) out.neg.emplace_back(dpoc, u);
    }
    if (delta_rps < 0 && flags[nd].second)
      out.neg.emplace_back(delta_rps, flags[nd].first);
    for (size_t j = 0; j < ref.neg.size(); ++j) {
      int dpoc = ref.neg[j].first + delta_rps;
      auto [u, ud] = flags[j];
      if (dpoc < 0 && ud) out.neg.emplace_back(dpoc, u);
    }
    // S1: ref negatives in reverse, deltaRps, ref positives
    for (int j = (int)ref.neg.size() - 1; j >= 0; --j) {
      int dpoc = ref.neg[j].first + delta_rps;
      auto [u, ud] = flags[j];
      if (dpoc > 0 && ud) out.pos.emplace_back(dpoc, u);
    }
    if (delta_rps > 0 && flags[nd].second)
      out.pos.emplace_back(delta_rps, flags[nd].first);
    for (size_t j = 0; j < ref.pos.size(); ++j) {
      int dpoc = ref.pos[j].first + delta_rps;
      auto [u, ud] = flags[ref.neg.size() + j];
      if (dpoc > 0 && ud) out.pos.emplace_back(dpoc, u);
    }
    return out;
  }
  int n_neg = r.ue();
  int n_pos = r.ue();
  if (n_neg > 16 || n_pos > 16) throw DecodeError("bad RPS sizes");
  int d = 0;
  for (int i = 0; i < n_neg; ++i) {
    d -= r.ue() + 1;
    out.neg.emplace_back(d, r.read1());
  }
  d = 0;
  for (int i = 0; i < n_pos; ++i) {
    d += r.ue() + 1;
    out.pos.emplace_back(d, r.read1());
  }
  return out;
}

// ScalingFactor matrices (7.4.5): [sizeId][matrixId][y*blk+x] with the
// 16/32 sizes already upsampled and DC-substituted. Shared: a Frame's
// parameter-set copy keeps the factors alive across corrupt re-parses.
struct ScalingFactors {
  // sizeId 0: 4x4 (16), 1: 8x8 (64), 2: 16x16 (256), 3: 32x32 (1024)
  std::vector<int32_t> m[4][6];
};

// Default scaling lists in up-right diagonal order (Tables 7-5/7-6;
// flat 16 for sizeId 0). kDefaultScalingIntra8/Inter8 are raster 8x8.
static void default_scaling_coefs(int size_id, int mid, int* out) {
  if (size_id == 0) {
    for (int i = 0; i < 16; ++i) out[i] = 16;
    return;
  }
  bool intra = size_id == 3 ? mid < 1 : mid < 3;
  const uint8_t* tab =
      intra ? kDefaultScalingIntra8 : kDefaultScalingInter8;
  const uint8_t* scan = kScan[0][3];
  for (int i = 0; i < 64; ++i)
    out[i] = tab[scan[2 * i + 1] * 8 + scan[2 * i]];
}

// ScalingFactor derivation (7.4.5): diag-order lists to matrices, with
// 2x/4x upsampling and DC substitution for the 16/32 sizes
static void derive_scaling_factors(const int dcs[4][6],
                                   const int coefs[4][6][64],
                                   ScalingFactors& sf) {
  for (int size_id = 0; size_id < 4; ++size_id) {
    int n_mat = size_id == 3 ? 2 : 6;
    int blk = size_id == 0 ? 4 : 8;
    int k = size_id == 0 ? 2 : 3;
    const uint8_t* scan = kScan[0][k];
    int32_t base[64];
    for (int mid = 0; mid < n_mat; ++mid) {
      for (int i = 0; i < blk * blk; ++i)
        base[scan[2 * i + 1] * blk + scan[2 * i]] = coefs[size_id][mid][i];
      int n = 1 << (size_id + 2);
      auto& m = sf.m[size_id][mid];
      m.assign((size_t)n * n, 0);
      if (size_id <= 1) {
        for (int i = 0; i < n * n; ++i) m[i] = base[i];
      } else {
        int rep = n / 8;
        for (int y = 0; y < n; ++y)
          for (int x = 0; x < n; ++x)
            m[y * n + x] = base[(y / rep) * 8 + x / rep];
        m[0] = dcs[size_id][mid];
      }
    }
  }
}

static std::shared_ptr<ScalingFactors> default_scaling_factors() {
  int dcs[4][6];
  int coefs[4][6][64];
  for (int s = 0; s < 4; ++s)
    for (int m = 0; m < 6; ++m) {
      dcs[s][m] = 16;
      default_scaling_coefs(s, m, coefs[s][m]);
    }
  auto sf = std::make_shared<ScalingFactors>();
  derive_scaling_factors(dcs, coefs, *sf);
  return sf;
}

// scaling_list_data (7.3.4)
static std::shared_ptr<ScalingFactors> parse_scaling_list_data(BitReader& r) {
  int dcs[4][6];
  int coefs[4][6][64];
  for (int size_id = 0; size_id < 4; ++size_id) {
    int n_mat = size_id == 3 ? 2 : 6;
    for (int mid = 0; mid < n_mat; ++mid) {
      dcs[size_id][mid] = 16;
      if (!r.read1()) {  // scaling_list_pred_mode_flag == 0
        int delta = r.ue() * (size_id == 3 ? 3 : 1);
        if (delta == 0) {
          default_scaling_coefs(size_id, mid, coefs[size_id][mid]);
        } else {
          int ref = mid - (size_id == 3 ? delta / 3 : delta);
          if (ref < 0) throw DecodeError("bad scaling list pred");
          std::memcpy(coefs[size_id][mid], coefs[size_id][ref],
                      sizeof coefs[size_id][mid]);
          dcs[size_id][mid] = dcs[size_id][ref];
        }
      } else {
        int ncoef = std::min(64, 1 << (4 + (size_id << 1)));
        int nxt = 8;
        if (size_id > 1) {
          int dc = r.se() + 8;
          if (dc < 1 || dc > 255) throw DecodeError("bad scaling dc");
          dcs[size_id][mid] = dc;
          nxt = dc;  // 7.3.4: the delta chain starts at the DC
        }
        for (int i = 0; i < ncoef; ++i) {
          nxt = ((nxt + r.se()) % 256 + 256) % 256;
          coefs[size_id][mid][i] = nxt;
        }
      }
    }
  }
  auto sf = std::make_shared<ScalingFactors>();
  derive_scaling_factors(dcs, coefs, *sf);
  return sf;
}

struct Sps {
  int id = 0;
  int chroma_format_idc = 1;
  int width = 0, height = 0;
  int conf_win[4] = {0, 0, 0, 0};  // l, r, t, b
  int bit_depth = 8, bit_depth_c = 8;
  int log2_max_poc_lsb = 4;
  int max_dec_pic_buffering = 0, num_reorder = 0;
  int log2_min_cb = 3, log2_ctb = 6;
  int log2_min_tb = 2, log2_max_tb = 5;
  int max_trafo_depth_inter = 0, max_trafo_depth_intra = 0;
  int scaling_list_enabled = 0;
  std::shared_ptr<ScalingFactors> scaling_factors;
  int amp_enabled = 0, sao_enabled = 0, pcm_enabled = 0;
  int pcm_bd = 8, pcm_bd_c = 8;
  int log2_min_pcm = 3, log2_max_pcm = 3;
  int pcm_loop_filter_disabled = 0;
  std::vector<ShortTermRps> strps;
  int long_term_present = 0;
  std::vector<int> lt_poc_lsb, lt_used;
  int temporal_mvp_enabled = 0, strong_intra_smoothing = 0;
  int ctb_size = 64, pic_w_ctbs = 0, pic_h_ctbs = 0, pic_size_ctbs = 0;
};

static void parse_sps(const std::vector<uint8_t>& rbsp, Sps& s) {
  BitReader r(rbsp.data(), rbsp.size(), 16);  // 2-byte NAL header
  r.read(4);  // sps_video_parameter_set_id
  int max_sub = r.read(3);
  r.read1();  // temporal_id_nesting
  skip_ptl(r, max_sub);
  s.id = r.ue();
  s.chroma_format_idc = r.ue();
  if (s.chroma_format_idc == 3) r.read1();
  if (s.chroma_format_idc != 1) throw DecodeError("only 4:2:0 supported");
  s.width = r.ue();
  s.height = r.ue();
  if (s.width < 16 || s.height < 16 || s.width > 8192 || s.height > 8192)
    throw DecodeError("bad picture dimensions");
  if (r.read1())
    for (int i = 0; i < 4; ++i) {
      s.conf_win[i] = r.ue();
      if (s.conf_win[i] > 4096) throw DecodeError("bad conformance window");
    }
  if (2 * (s.conf_win[0] + s.conf_win[1]) >= s.width ||
      2 * (s.conf_win[2] + s.conf_win[3]) >= s.height)
    throw DecodeError("conformance window exceeds picture");
  s.bit_depth = r.ue() + 8;
  s.bit_depth_c = r.ue() + 8;
  if (s.bit_depth != s.bit_depth_c || (s.bit_depth != 8 && s.bit_depth != 10))
    throw DecodeError("only 8/10-bit 4:2:0 supported");
  s.log2_max_poc_lsb = r.ue() + 4;
  if (s.log2_max_poc_lsb > 16) throw DecodeError("bad log2_max_poc_lsb");
  int sub_ordering = r.read1();
  for (int i = 0; i < (sub_ordering ? max_sub + 1 : 1); ++i) {
    s.max_dec_pic_buffering = r.ue() + 1;
    s.num_reorder = r.ue();
    r.ue();  // max_latency_increase_plus1
  }
  if (s.num_reorder > 16 || s.max_dec_pic_buffering > 17)
    throw DecodeError("bad DPB sizes");
  s.log2_min_cb = r.ue() + 3;
  s.log2_ctb = s.log2_min_cb + r.ue();
  if (s.log2_min_cb > 6 || s.log2_ctb > 6)
    throw DecodeError("bad coding block sizes");
  if (s.width % (1 << s.log2_min_cb) || s.height % (1 << s.log2_min_cb))
    throw DecodeError("dimensions not min-CB aligned");
  s.log2_min_tb = r.ue() + 2;
  s.log2_max_tb = s.log2_min_tb + r.ue();
  if (s.log2_min_tb >= s.log2_ctb || s.log2_max_tb > 5 ||
      s.log2_max_tb > s.log2_ctb)
    throw DecodeError("bad transform block sizes");
  s.max_trafo_depth_inter = r.ue();
  s.max_trafo_depth_intra = r.ue();
  if (s.max_trafo_depth_inter > 4 || s.max_trafo_depth_intra > 4)
    throw DecodeError("bad transform depth");
  s.scaling_list_enabled = r.read1();
  if (s.scaling_list_enabled) {
    if (r.read1())  // sps_scaling_list_data_present
      s.scaling_factors = parse_scaling_list_data(r);
    else
      s.scaling_factors = default_scaling_factors();
  }
  s.amp_enabled = r.read1();
  s.sao_enabled = r.read1();
  s.pcm_enabled = r.read1();
  if (s.pcm_enabled) {
    // 7.3.2.2.1: IPCM block geometry + sample bit depths
    s.pcm_bd = (int)r.read(4) + 1;
    s.pcm_bd_c = (int)r.read(4) + 1;
    if (s.pcm_bd > s.bit_depth || s.pcm_bd_c > s.bit_depth_c)
      throw DecodeError("bad PCM bit depth");
    s.log2_min_pcm = r.ue() + 3;
    s.log2_max_pcm = s.log2_min_pcm + r.ue();
    if (s.log2_min_pcm < s.log2_min_cb || s.log2_max_pcm > s.log2_ctb ||
        s.log2_max_pcm > 5)
      throw DecodeError("bad PCM block sizes");
    s.pcm_loop_filter_disabled = r.read1();
  }
  int n_sets = r.ue();
  if (n_sets > 64) throw DecodeError("bad num_short_term_ref_pic_sets");
  for (int i = 0; i < n_sets; ++i)
    s.strps.push_back(parse_strps(r, i, s.strps, n_sets));
  s.long_term_present = r.read1();
  if (s.long_term_present) {
    int n = r.ue();
    if (n > 32) throw DecodeError("bad num_long_term_ref_pics_sps");
    for (int i = 0; i < n; ++i) {
      s.lt_poc_lsb.push_back(r.read(s.log2_max_poc_lsb));
      s.lt_used.push_back(r.read1());
    }
  }
  s.temporal_mvp_enabled = r.read1();
  s.strong_intra_smoothing = r.read1();
  // VUI and extensions not needed (timing comes from the TS layer)
  s.ctb_size = 1 << s.log2_ctb;
  s.pic_w_ctbs = (s.width + s.ctb_size - 1) >> s.log2_ctb;
  s.pic_h_ctbs = (s.height + s.ctb_size - 1) >> s.log2_ctb;
  s.pic_size_ctbs = s.pic_w_ctbs * s.pic_h_ctbs;
}

struct Pps {
  int id = 0, sps_id = 0;
  const Sps* sps = nullptr;
  int dependent_slices_enabled = 0, output_flag_present = 0;
  int num_extra_slice_header_bits = 0;
  int sign_data_hiding = 0, cabac_init_present = 0;
  int num_ref_l0_default = 1, num_ref_l1_default = 1;
  int init_qp = 26;
  int constrained_intra_pred = 0, transform_skip_enabled = 0;
  int cu_qp_delta_enabled = 0, diff_cu_qp_delta_depth = 0;
  int cb_qp_offset = 0, cr_qp_offset = 0;
  int slice_chroma_qp_offsets = 0;
  int weighted_pred = 0, weighted_bipred = 0;
  int transquant_bypass_enabled = 0;
  int tiles_enabled = 0, entropy_coding_sync = 0;
  int loop_filter_across_tiles = 1;
  int tile_cols = 1, tile_rows = 1;
  // 6.5.1 scan conversion: tile id per CTB (raster), raster<->tile scan
  std::vector<int32_t> tile_id, rs_to_ts, ts_to_rs;
  int loop_filter_across_slices = 0;
  int deblocking_override_enabled = 0, deblocking_disabled = 0;
  int beta_offset = 0, tc_offset = 0;
  int lists_modification_present = 0;
  int log2_parallel_merge_level = 2;
  int slice_header_extension = 0;
  std::shared_ptr<ScalingFactors> scaling_factors;  // effective (pps|sps)
};

static void parse_pps(const std::vector<uint8_t>& rbsp,
                      const std::map<int, Sps>& sps_map, Pps& p) {
  BitReader r(rbsp.data(), rbsp.size(), 16);
  p.id = r.ue();
  p.sps_id = r.ue();
  auto it = sps_map.find(p.sps_id);
  if (it == sps_map.end()) throw DecodeError("PPS references unknown SPS");
  p.sps = &it->second;
  p.dependent_slices_enabled = r.read1();
  p.output_flag_present = r.read1();
  p.num_extra_slice_header_bits = r.read(3);
  p.sign_data_hiding = r.read1();
  p.cabac_init_present = r.read1();
  p.num_ref_l0_default = r.ue() + 1;
  p.num_ref_l1_default = r.ue() + 1;
  if (p.num_ref_l0_default > 16 || p.num_ref_l1_default > 16)
    throw DecodeError("bad default ref counts");
  p.init_qp = r.se() + 26;
  if (p.init_qp < -62 || p.init_qp > 51) throw DecodeError("bad init_qp");
  p.constrained_intra_pred = r.read1();
  p.transform_skip_enabled = r.read1();
  p.cu_qp_delta_enabled = r.read1();
  p.diff_cu_qp_delta_depth = p.cu_qp_delta_enabled ? r.ue() : 0;
  if (p.diff_cu_qp_delta_depth > 3)
    throw DecodeError("bad diff_cu_qp_delta_depth");
  p.cb_qp_offset = r.se();
  p.cr_qp_offset = r.se();
  p.slice_chroma_qp_offsets = r.read1();
  p.weighted_pred = r.read1();
  p.weighted_bipred = r.read1();
  p.transquant_bypass_enabled = r.read1();
  p.tiles_enabled = r.read1();
  p.entropy_coding_sync = r.read1();
  {
    const Sps& sps = *p.sps;
    int wc = sps.pic_w_ctbs, hc = sps.pic_h_ctbs;
    std::vector<int> col_bd{0}, row_bd{0};
    if (p.tiles_enabled) {
      // 7.3.2.3.1 tile grid; 6.5.1 scan conversion tables
      p.tile_cols = r.ue() + 1;
      p.tile_rows = r.ue() + 1;
      if (p.tile_cols > wc || p.tile_rows > hc)
        throw DecodeError("bad tile grid");
      if (r.read1()) {  // uniform_spacing_flag
        col_bd.clear();
        row_bd.clear();
        for (int i = 0; i <= p.tile_cols; ++i)
          col_bd.push_back((i * wc) / p.tile_cols);
        for (int i = 0; i <= p.tile_rows; ++i)
          row_bd.push_back((i * hc) / p.tile_rows);
      } else {
        for (int i = 0; i < p.tile_cols - 1; ++i) {
          int cwv = r.ue() + 1;
          col_bd.push_back(col_bd.back() + cwv);
          if (col_bd.back() >= wc) throw DecodeError("bad tile columns");
        }
        col_bd.push_back(wc);
        for (int i = 0; i < p.tile_rows - 1; ++i) {
          int rhv = r.ue() + 1;
          row_bd.push_back(row_bd.back() + rhv);
          if (row_bd.back() >= hc) throw DecodeError("bad tile rows");
        }
        row_bd.push_back(hc);
      }
      p.loop_filter_across_tiles = r.read1();
    } else {
      col_bd.push_back(wc);
      row_bd.push_back(hc);
    }
    size_t n = (size_t)wc * hc;
    p.tile_id.assign(n, 0);
    p.rs_to_ts.assign(n, 0);
    p.ts_to_rs.assign(n, 0);
    int ts = 0;
    for (int tj = 0; tj + 1 < (int)row_bd.size(); ++tj)
      for (int ti = 0; ti + 1 < (int)col_bd.size(); ++ti) {
        int tid = tj * p.tile_cols + ti;
        for (int y = row_bd[tj]; y < row_bd[tj + 1]; ++y)
          for (int x = col_bd[ti]; x < col_bd[ti + 1]; ++x) {
            int rs = y * wc + x;
            p.tile_id[rs] = tid;
            p.rs_to_ts[rs] = ts;
            p.ts_to_rs[ts] = rs;
            ++ts;
          }
      }
  }
  p.loop_filter_across_slices = r.read1();
  if (r.read1()) {  // deblocking_filter_control_present
    p.deblocking_override_enabled = r.read1();
    p.deblocking_disabled = r.read1();
    if (!p.deblocking_disabled) {
      p.beta_offset = 2 * r.se();
      p.tc_offset = 2 * r.se();
    }
  }
  p.scaling_factors = p.sps->scaling_factors;
  if (r.read1())  // pps_scaling_list_data_present
    p.scaling_factors = parse_scaling_list_data(r);
  p.lists_modification_present = r.read1();
  p.log2_parallel_merge_level = r.ue() + 2;
  if (p.log2_parallel_merge_level > 6)
    throw DecodeError("bad parallel merge level");
  p.slice_header_extension = r.read1();
}

// ---------------------------------------------------------------------------
// Slice segment header (7.3.6; h265_ref.py parse_slice_header)
// ---------------------------------------------------------------------------

struct WeightEnt {
  int wy, oy, wcb, ocb, wcr, ocr;
};

struct SliceHeader {
  int nal_type = 0;
  int first_slice = 0;
  const Pps* pps = nullptr;
  const Sps* sps = nullptr;
  int dependent = 0;
  int segment_address = 0;
  int slice_type = SLICE_I;
  int poc_lsb = 0;
  ShortTermRps strps;
  // long-term entries: (lsb, used, has_msb, delta_msb)
  std::vector<std::array<int, 4>> lt;
  int temporal_mvp = 0;
  int sao_luma = 0, sao_chroma = 0;
  int num_ref[2] = {0, 0};
  int num_pics_total_curr = 0;
  bool has_rplm[2] = {false, false};
  std::vector<int> rplm[2];
  int mvd_l1_zero = 0;
  int cabac_init_flag = 0;
  int collocated_from_l0 = 1;
  int collocated_ref_idx = 0;
  int max_merge = 5;
  int cb_qp_offset = 0, cr_qp_offset = 0;
  int deblocking_disabled = 0;
  int beta_offset = 0, tc_offset = 0;
  int loop_filter_across_slices = 0;
  bool has_pred_weights = false;
  int luma_log2 = 0, chroma_log2 = 0;
  std::vector<WeightEnt> pred_weights[2];
  int slice_qp = 26;
  std::vector<int> entry_points;
  size_t data_byte_pos = 0;
};

static int bit_length(int v) {
  int n = 0;
  while (v > 0) {
    ++n;
    v >>= 1;
  }
  return n;
}

// pred_weight_table (7.3.6.3; h265_ref.py _parse_pred_weights)
static void parse_pred_weights(BitReader& r, SliceHeader& h) {
  h.luma_log2 = r.ue();
  h.chroma_log2 = h.luma_log2 + r.se();
  if (h.luma_log2 > 7 || h.chroma_log2 > 7 || h.chroma_log2 < 0)
    throw DecodeError("bad weight denominators");
  int nlists = h.slice_type == SLICE_B ? 2 : 1;
  for (int lx = 0; lx < nlists; ++lx) {
    int n = h.num_ref[lx];
    std::vector<int> lflags(n), cflags(n);
    for (int i = 0; i < n; ++i) lflags[i] = r.read1();
    for (int i = 0; i < n; ++i) cflags[i] = r.read1();
    for (int i = 0; i < n; ++i) {
      WeightEnt e;
      e.wy = 1 << h.luma_log2;
      e.oy = 0;
      e.wcb = e.wcr = 1 << h.chroma_log2;
      e.ocb = e.ocr = 0;
      if (lflags[i]) {
        e.wy = (1 << h.luma_log2) + r.se();
        e.oy = r.se();
        if (e.wy < -128 || e.wy > 127 || e.oy < -128 || e.oy > 127)
          throw DecodeError("bad luma weight");
      }
      if (cflags[i]) {
        int dw = r.se();
        int dd = r.se();
        e.wcb = (1 << h.chroma_log2) + dw;
        e.ocb = clamp_i(dd + 128 - ((128 * e.wcb) >> h.chroma_log2),
                        -128, 127);
        dw = r.se();
        dd = r.se();
        e.wcr = (1 << h.chroma_log2) + dw;
        e.ocr = clamp_i(dd + 128 - ((128 * e.wcr) >> h.chroma_log2),
                        -128, 127);
        if (e.wcb < -128 || e.wcb > 127 || e.wcr < -128 || e.wcr > 127)
          throw DecodeError("bad chroma weight");
      }
      h.pred_weights[lx].push_back(e);
    }
  }
  h.has_pred_weights = true;
}

static void parse_slice_header(const std::vector<uint8_t>& rbsp, int nal_type,
                               const std::map<int, Sps>& sps_map,
                               const std::map<int, Pps>& pps_map,
                               SliceHeader& h) {
  (void)sps_map;
  BitReader r(rbsp.data(), rbsp.size(), 16);
  h.nal_type = nal_type;
  h.first_slice = r.read1();
  if (nal_type >= NAL_BLA_W_LP && nal_type <= 23)  // IRAP
    r.read1();  // no_output_of_prior_pics_flag
  auto it = pps_map.find(r.ue());
  if (it == pps_map.end()) throw DecodeError("slice references unknown PPS");
  h.pps = &it->second;
  const Pps& pps = *h.pps;
  const Sps& sps = *pps.sps;
  h.sps = &sps;
  if (!h.first_slice) {
    if (pps.dependent_slices_enabled) h.dependent = r.read1();
    int nbits = std::max(1, bit_length(sps.pic_size_ctbs - 1));
    h.segment_address = r.read(nbits);
    if (h.segment_address >= sps.pic_size_ctbs)
      throw DecodeError("bad slice segment address");
  }
  h.deblocking_disabled = pps.deblocking_disabled;
  h.beta_offset = pps.beta_offset;
  h.tc_offset = pps.tc_offset;
  h.loop_filter_across_slices = pps.loop_filter_across_slices;
  if (!h.dependent) {
    for (int i = 0; i < pps.num_extra_slice_header_bits; ++i) r.read1();
    h.slice_type = r.ue();
    if (pps.output_flag_present) r.read1();
    bool idr = nal_type == NAL_IDR_W_RADL || nal_type == NAL_IDR_N_LP;
    if (!idr) {
      h.poc_lsb = r.read(sps.log2_max_poc_lsb);
      if (r.read1()) {  // short_term_ref_pic_set_sps_flag
        int idxbits = std::max(1, bit_length((int)sps.strps.size() - 1));
        int idx = sps.strps.size() > 1 ? (int)r.read(idxbits) : 0;
        if (idx >= (int)sps.strps.size())
          throw DecodeError("bad st_rps index");
        h.strps = sps.strps[idx];
      } else {
        h.strps = parse_strps(r, (int)sps.strps.size(), sps.strps,
                              (int)sps.strps.size());
      }
      if (sps.long_term_present) {
        int n_sps = sps.lt_poc_lsb.empty() ? 0 : r.ue();
        int n_slice = r.ue();
        if (n_sps > 32 || n_slice > 32)
          throw DecodeError("bad long-term counts");
        int prev_cum = 0;
        for (int i = 0; i < n_sps + n_slice; ++i) {
          int lsb, used;
          if (i < n_sps) {
            int idxbits =
                std::max(1, bit_length((int)sps.lt_poc_lsb.size() - 1));
            int k = sps.lt_poc_lsb.size() > 1 ? (int)r.read(idxbits) : 0;
            if (k >= (int)sps.lt_poc_lsb.size())
              throw DecodeError("bad lt sps index");
            lsb = sps.lt_poc_lsb[k];
            used = sps.lt_used[k];
          } else {
            lsb = r.read(sps.log2_max_poc_lsb);
            used = r.read1();
          }
          int has_msb = r.read1();
          int dmsb = has_msb ? r.ue() : 0;
          // DeltaPocMsbCycleLt is cumulative within each of the
          // SPS-sourced and slice-sourced runs (7.4.7.1)
          int cum = (i == 0 || i == n_sps) ? dmsb : dmsb + prev_cum;
          prev_cum = cum;
          h.lt.push_back(std::array<int, 4>{lsb, used, has_msb, cum});
        }
      }
      if (sps.temporal_mvp_enabled) h.temporal_mvp = r.read1();
    }
    if (sps.sao_enabled) {
      h.sao_luma = r.read1();
      h.sao_chroma = r.read1();
    }
    if (h.slice_type == SLICE_P || h.slice_type == SLICE_B) {
      h.num_ref[0] = pps.num_ref_l0_default;
      h.num_ref[1] = pps.num_ref_l1_default;
      if (r.read1()) {  // num_ref_idx_active_override
        h.num_ref[0] = r.ue() + 1;
        if (h.slice_type == SLICE_B) h.num_ref[1] = r.ue() + 1;
      }
      if (h.num_ref[0] > 16 || h.num_ref[1] > 16)
        throw DecodeError("bad num_ref_idx_active");
      int npics = 0;
      for (auto& e : h.strps.neg) npics += e.second;
      for (auto& e : h.strps.pos) npics += e.second;
      for (auto& e : h.lt) npics += e[1];
      h.num_pics_total_curr = npics;
      if (pps.lists_modification_present && npics > 1) {
        int nb = std::max(1, bit_length(npics - 1));
        int nlists = h.slice_type == SLICE_B ? 2 : 1;
        for (int lx = 0; lx < nlists; ++lx) {
          if (r.read1()) {
            h.has_rplm[lx] = true;
            for (int i = 0; i < h.num_ref[lx]; ++i)
              h.rplm[lx].push_back(r.read(nb));
          }
        }
      }
      if (h.slice_type == SLICE_B) h.mvd_l1_zero = r.read1();
      if (pps.cabac_init_present) h.cabac_init_flag = r.read1();
      if (h.temporal_mvp) {
        if (h.slice_type == SLICE_B) h.collocated_from_l0 = r.read1();
        int lst = h.collocated_from_l0 ? 0 : 1;
        if (h.num_ref[lst] > 1) h.collocated_ref_idx = r.ue();
      }
      if ((pps.weighted_pred && h.slice_type == SLICE_P) ||
          (pps.weighted_bipred && h.slice_type == SLICE_B))
        parse_pred_weights(r, h);
      h.max_merge = 5 - r.ue();
      if (h.max_merge < 1) throw DecodeError("bad max_num_merge_cand");
    }
    h.slice_qp = pps.init_qp + r.se();
    if (h.slice_qp < -(6 * (sps.bit_depth - 8)) || h.slice_qp > 51)
      throw DecodeError("bad slice QP");
    if (pps.slice_chroma_qp_offsets) {
      h.cb_qp_offset = r.se();
      h.cr_qp_offset = r.se();
    }
    if (pps.deblocking_override_enabled && r.read1()) {
      h.deblocking_disabled = r.read1();
      if (!h.deblocking_disabled) {
        h.beta_offset = 2 * r.se();
        h.tc_offset = 2 * r.se();
      }
    }
    if (pps.loop_filter_across_slices &&
        (h.sao_luma || h.sao_chroma || !h.deblocking_disabled))
      h.loop_filter_across_slices = r.read1();
  }
  // (dependent segments carry no slice-level fields: the caller
  // inherits them from the preceding independent segment, 7.4.7.1)
  if (pps.tiles_enabled || pps.entropy_coding_sync) {
    int n = r.ue();
    if (n > sps.pic_size_ctbs) throw DecodeError("bad entry point count");
    if (n) {
      int ob = r.ue() + 1;
      if (ob > 32) throw DecodeError("bad entry point offset length");
      for (int i = 0; i < n; ++i) h.entry_points.push_back(r.read(ob) + 1);
    }
  }
  if (pps.slice_header_extension) {
    int n = r.ue();
    if (n > 4096) throw DecodeError("bad slice header extension");
    for (int i = 0; i < n; ++i) r.read(8);
  }
  // byte_alignment(): alignment_bit_equal_to_one + zeros
  if (r.read1() != 1) throw DecodeError("bad slice header alignment");
  while (!r.byte_aligned()) r.read1();
  h.data_byte_pos = r.byte_pos();
}

// ---------------------------------------------------------------------------
// CABAC (9.3; arithmetic core identical to H.264, HEVC context init)
// ---------------------------------------------------------------------------

struct CabacEngine {
  const uint8_t* data;
  size_t size;  // bytes
  size_t pos;   // bits
  int range_, offset;
  uint8_t state[kNumContexts], mps[kNumContexts];

  // 9.3.2.2 (h265_ref.py init_hevc_contexts)
  void init_ctx(int init_type, int qp) {
    int q = clamp_i(qp, 0, 51);
    const uint8_t* tab = kCtxInit[init_type];
    for (int i = 0; i < kNumContexts; ++i) {
      int iv = tab[i];
      int m = (iv >> 4) * 5 - 45;
      int n = ((iv & 15) << 3) - 16;
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
      // renormalize in one step: smallest k with rng<<k >= 256
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
  int bypass_bits(int n) {
    // n bypass bins == n steps of long division of
    // (offset * 2^n + next n bits) by range_ (offset < range_ invariant:
    // each step's quotient digit is the decoded bin)
    if (n <= 20) {
      uint64_t acc = ((uint64_t)(uint32_t)offset << n) | read_bits(n);
      int v = (int)(acc / (uint32_t)range_);
      offset = (int)(acc % (uint32_t)range_);
      return v;
    }
    uint32_t v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | (uint32_t)bypass();
    return (int)v;
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
  // truncated-rice prefix with cRiceParam=0, bypass bins
  int tr_bypass(int cmax) {
    int v = 0;
    while (v < cmax && bypass()) ++v;
    return v;
  }
  // k-th order Exp-Golomb, bypass bins
  int eg_bypass(int k) {
    int n = 0;
    while (bypass()) {
      if (++n > 30) throw DecodeError("bad exp-golomb bypass");
    }
    int v = (1 << n) - 1;
    return (v << k) + bypass_bits(n + k);
  }
  // -- PCM raw payload (7.3.8.7 / 9.3.1) ---------------------------------
  // pcm_flag==1 (terminate bin, no renorm) leaves the bit position
  // exact; pcm_alignment_zero_bit skips to the byte boundary, samples
  // are f(v) reads, then the engine re-initialises with contexts kept.
  void pcm_begin() {
    if (pos & 7) pos += 8 - (pos & 7);
  }
  int pcm_bits(int n) {
    int v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | bit();
    return v;
  }
  void pcm_end() {
    range_ = 510;
    int off = 0;
    for (int i = 0; i < 9; ++i) off = (off << 1) | bit();
    offset = off;
  }

  // WPP snapshot of the context states only (h265_ref.py Cabac.snapshot)
  struct Snap {
    uint8_t state[kNumContexts], mps[kNumContexts];
  };
  void snapshot(Snap& s) const {
    std::memcpy(s.state, state, sizeof state);
    std::memcpy(s.mps, mps, sizeof mps);
  }
  void restore(const Snap& s) {
    std::memcpy(state, s.state, sizeof state);
    std::memcpy(mps, s.mps, sizeof mps);
  }
};

}  // namespace h265

namespace h265 {

// ---------------------------------------------------------------------------
// Picture state (h265_ref.py _Picture)
// ---------------------------------------------------------------------------

struct Frame {
  // own copies: a corrupt mid-stream SPS/PPS re-parse must not change
  // the geometry of an in-flight picture (the parameter-set maps are
  // updated in place)
  Sps sps_store;
  Pps pps_store;
  const Sps* sps;
  const Pps* pps;
  int wp, hp;        // CTB-padded plane dims
  int gw, gh;        // 4x4 grid dims
  int cw, chh;       // chroma plane dims
  // plane buffers are intentionally uninitialized: slice decode writes
  // every in-picture sample and nothing reads the CTB padding
  struct Plane {
    std::unique_ptr<uint16_t[]> buf;
    size_t n = 0;
    void alloc(size_t count) {
      if (n != count) {
        buf.reset(new uint16_t[count]);
        n = count;
      }
    }
    uint16_t* data() { return buf.get(); }
    const uint16_t* data() const { return buf.get(); }
    size_t size() const { return n; }
    uint16_t& operator[](size_t i) { return buf[i]; }
    const uint16_t& operator[](size_t i) const { return buf[i]; }
  };
  Plane Y, U, V;
  // per-4x4 grids
  std::vector<uint8_t> avail, decided, ctdepth, intra_mode, is_intra, skip;
  std::vector<uint8_t> nnz, bypass, tu_edge_v, tu_edge_h;
  std::vector<uint8_t> pu_edge_v, pu_edge_h;
  std::vector<int32_t> slice_id;
  std::vector<int16_t> qp;
  // motion field (per 4x4): quarter-pel MVs, per-list use, ref POC
  std::vector<int16_t> mv;       // [g][2][2]
  std::vector<uint8_t> mv_used;  // [g][2]
  std::vector<int32_t> ref_poc;  // [g][2]
  std::vector<int8_t> ref_idx;   // [g][2]
  std::vector<uint8_t> ref_lt;   // [g][2]: ref was long-term
  // per-CTB SAO state
  int cgw, cgh;
  std::vector<int8_t> sao_type;      // [ctb][3]
  std::vector<int16_t> sao_offsets;  // [ctb][3][4]
  std::vector<int8_t> sao_band_pos;  // [ctb][3]
  std::vector<int8_t> sao_eo_class;  // [ctb][3]
  int poc = 0;
  int nal_type = 0;
  // set when any CU in the picture uses transquant bypass (or PCM with
  // pcm_loop_filter_disabled): lets the loop filters skip the per-cell
  // bypass[] lookups on the overwhelmingly common all-zero pictures.
  // Written by slice threads (value only ever goes 0->1, relaxed store)
  uint8_t any_bypass = 0;

  explicit Frame(const Sps& s, const Pps& p)
      : sps_store(s), pps_store(p), sps(&sps_store), pps(&pps_store) {
    pps_store.sps = &sps_store;
    init_grids();
  }
  // recycle a display-released frame (decoder frame pool): keeps the
  // pixel-plane allocations warm; grids re-assign to constructor state
  void reinit(const Sps& s, const Pps& p) {
    sps_store = s;
    pps_store = p;
    pps_store.sps = &sps_store;
    poc = 0;
    nal_type = 0;
    any_bypass = 0;
    init_grids();
  }
  void init_grids() {
    const Sps& s = sps_store;
    wp = s.pic_w_ctbs << s.log2_ctb;
    hp = s.pic_h_ctbs << s.log2_ctb;
    gw = wp >> 2;
    gh = hp >> 2;
    cw = wp >> 1;
    chh = hp >> 1;
    Y.alloc((size_t)wp * hp);
    U.alloc((size_t)cw * chh);
    V.alloc((size_t)cw * chh);
    size_t g = (size_t)gw * gh;
    avail.assign(g, 0);
    decided.assign(g, 0);
    ctdepth.assign(g, 0);
    intra_mode.assign(g, 1);
    is_intra.assign(g, 0);
    skip.assign(g, 0);
    nnz.assign(g, 0);
    bypass.assign(g, 0);
    tu_edge_v.assign(g, 0);
    tu_edge_h.assign(g, 0);
    pu_edge_v.assign(g, 0);
    pu_edge_h.assign(g, 0);
    slice_id.assign(g, -1);
    qp.assign(g, 0);
    mv.assign(g * 4, 0);
    mv_used.assign(g * 2, 0);
    ref_poc.assign(g * 2, 0);
    ref_idx.assign(g * 2, 0);
    ref_lt.assign(g * 2, 0);
    cgw = s.pic_w_ctbs;
    cgh = s.pic_h_ctbs;
    size_t c = (size_t)cgw * cgh;
    sao_type.assign(c * 3, 0);
    sao_offsets.assign(c * 12, 0);
    sao_band_pos.assign(c * 3, 0);
    sao_eo_class.assign(c * 3, 0);
  }
  inline int gi(int gy, int gx) const { return gy * gw + gx; }
  inline uint16_t* yrow(int y) { return Y.data() + (size_t)y * wp; }
  inline uint16_t* urow(int y) { return U.data() + (size_t)y * cw; }
  inline uint16_t* vrow(int y) { return V.data() + (size_t)y * cw; }
  // Frames evicted from the DPB can still be display-pending (OutFrame
  // keeps the pixel planes alive zero-copy); the per-4x4 grids and SAO
  // state are reference-/decode-time only, so release the ~40B/cell
  // (e.g. ~20 MB at 4K) as soon as the picture stops being a reference.
  void drop_side_arrays() {
    auto drop = [](auto& v) {
      v.clear();
      v.shrink_to_fit();
    };
    drop(avail); drop(decided); drop(ctdepth); drop(intra_mode);
    drop(is_intra); drop(skip); drop(nnz); drop(bypass);
    drop(tu_edge_v); drop(tu_edge_h); drop(pu_edge_v); drop(pu_edge_h);
    drop(slice_id); drop(qp); drop(mv); drop(mv_used); drop(ref_poc);
    drop(ref_idx); drop(ref_lt); drop(sao_type); drop(sao_offsets);
    drop(sao_band_pos); drop(sao_eo_class);
  }
};

using PicPtr = std::shared_ptr<Frame>;

// ---------------------------------------------------------------------------
// Transforms + dequant (8.6.3 / 8.6.4; h265_ref.py dequant_block /
// inv_transform / residual_from_coeffs). Coefficients in row-major
// size x size int32; residual returned in the caller's int32 buffer.
// ---------------------------------------------------------------------------

// transMatrix for size 1<<log2: kDct32 sub-sampled by row stride,
// repacked contiguous per size for the matmul inner loops
static int16_t g_dct[6][32 * 32];
static const struct InitDct {
  InitDct() {
    for (int log2 = 2; log2 <= 5; ++log2) {
      int n = 1 << log2;
      for (int i = 0; i < n; ++i)
        for (int j = 0; j < n; ++j)
          g_dct[log2][i * n + j] = kDct32[(i << (5 - log2)) * 32 + j];
    }
  }
} g_init_dct;

// Bounded inverse transform: rows > nzh and cols > nzw of d are zero
// (the residual parser tracks the nonzero coefficient extent), so the
// matmul sums stop there.  All intermediates fit int32: |coef| < 2^15,
// |matrix| <= 90, 32-term sums < 2^27; stage-2 inputs are clipped to
// 16 bits.
// 1-D inverse DCT synthesis dst[i] = sum_k M[k][i] c[k] via even-odd
// decomposition: even rows of the normative matrix are symmetric in i,
// odd rows antisymmetric, and the even-row half is exactly the
// half-size matrix -- so dst[i] = E[i] + O[i], dst[n-1-i] = E[i] - O[i]
// with E the recursive half transform of the even coefficients.
// nnz = count of leading coefficients that may be nonzero.
static void idct_1d(const int32_t* src, int sstride, int log2, int nnz,
                    int32_t* out) {
  int n = 1 << log2;
  const int16_t* M = g_dct[log2];
  if (n == 4) {
    for (int i = 0; i < 4; ++i) {
      int32_t acc = 0;
      for (int k = 0; k < nnz; ++k) acc += M[k * 4 + i] * src[k * sstride];
      out[i] = acc;
    }
    return;
  }
  int half = n >> 1;
  int32_t even[16];
  idct_1d(src, sstride * 2, log2 - 1, (nnz + 1) >> 1, even);
  int n_odd = nnz >> 1;  // odd indices 1,3,.. < nnz
  for (int i = 0; i < half; ++i) {
    int32_t odd = 0;
    for (int j = 0; j < n_odd; ++j)
      odd += M[(2 * j + 1) * n + i] * src[(2 * j + 1) * sstride];
    out[i] = even[i] + odd;
    out[n - 1 - i] = even[i] - odd;
  }
}

#if H265_SIMD
// vertical partial-butterfly IDCT over 8 columns at once: column j of
// the coefficient block d (row stride `stride`) starting at column x;
// out = sz rows x 8 lanes.  Same recursion as idct_1d, but each lane
// is one column, so the stride-n column walks become contiguous loads.
static void idct_cols8(const int32_t* d, int stride, int log2, int nnz,
                       int x, int32_t* out) {
  int sz = 1 << log2;
  const int16_t* M = g_dct[log2];
  if (sz == 4) {
    for (int i = 0; i < 4; ++i) {
      __m256i acc = _mm256_setzero_si256();
      for (int k = 0; k < nnz; ++k)
        acc = _mm256_add_epi32(
            acc, _mm256_mullo_epi32(
                     _mm256_set1_epi32(M[k * 4 + i]),
                     _mm256_loadu_si256(
                         (const __m256i*)(d + (size_t)k * stride + x))));
      _mm256_store_si256((__m256i*)(out + i * 8), acc);
    }
    return;
  }
  int half = sz >> 1;
  alignas(32) int32_t even[16 * 8];
  idct_cols8(d, stride * 2, log2 - 1, (nnz + 1) >> 1, x, even);
  int n_odd = nnz >> 1;
  for (int i = 0; i < half; ++i) {
    __m256i odd = _mm256_setzero_si256();
    for (int j = 0; j < n_odd; ++j)
      odd = _mm256_add_epi32(
          odd, _mm256_mullo_epi32(
                   _mm256_set1_epi32(M[(2 * j + 1) * sz + i]),
                   _mm256_loadu_si256((const __m256i*)(
                       d + (size_t)(2 * j + 1) * stride + x))));
    __m256i ev = _mm256_load_si256((const __m256i*)(even + i * 8));
    _mm256_store_si256((__m256i*)(out + i * 8), _mm256_add_epi32(ev, odd));
    _mm256_store_si256((__m256i*)(out + (sz - 1 - i) * 8),
                       _mm256_sub_epi32(ev, odd));
  }
}
#endif

static void inv_transform(const int32_t* d, int log2, bool dst, int bd,
                          int nzw, int nzh, int32_t* out) {
  int n = 1 << log2;
  int32_t tmp[32 * 32];
  int32_t col[32];
  if (dst) {
    // 4x4 DST-VII has no even-odd symmetry: direct
    const int16_t* M = kDst4;
    for (int j = 0; j <= nzw; ++j) {
      for (int i = 0; i < 4; ++i) {
        int32_t acc = 0;
        for (int k = 0; k <= nzh; ++k) acc += M[k * 4 + i] * d[k * 4 + j];
        int32_t v = (acc + 64) >> 7;
        tmp[i * 4 + j] = v < -32768 ? -32768 : v > 32767 ? 32767 : v;
      }
    }
    int rnd = 1 << (19 - bd), sh = 20 - bd;
    for (int i = 0; i < 4; ++i) {
      for (int j = 0; j < 4; ++j) {
        int32_t acc = 0;
        for (int k = 0; k <= nzw; ++k)
          acc += tmp[i * 4 + k] * M[k * 4 + j];
        out[i * 4 + j] = (acc + rnd) >> sh;
      }
    }
    return;
  }
  // stage 1 (vertical): tmp[.][j] = clip((idct(d[.][j]) + 64) >> 7)
#if H265_SIMD
  if (n >= 8) {
    alignas(32) int32_t cols[32 * 8];
    const __m256i v64 = _mm256_set1_epi32(64);
    const __m256i vlo = _mm256_set1_epi32(-32768);
    const __m256i vhi = _mm256_set1_epi32(32767);
    for (int x0 = 0; x0 <= nzw; x0 += 8) {
      int x = x0 + 8 > n ? n - 8 : x0;
      idct_cols8(d, n, log2, nzh + 1, x, cols);
      for (int i = 0; i < n; ++i) {
        __m256i v = _mm256_srai_epi32(
            _mm256_add_epi32(
                _mm256_load_si256((const __m256i*)(cols + i * 8)), v64),
            7);
        v = _mm256_min_epi32(_mm256_max_epi32(v, vlo), vhi);
        _mm256_storeu_si256((__m256i*)(tmp + i * n + x), v);
      }
    }
  } else
#endif
  for (int j = 0; j <= nzw; ++j) {
    idct_1d(d + j, n, log2, nzh + 1, col);
    for (int i = 0; i < n; ++i) {
      int32_t v = (col[i] + 64) >> 7;
      tmp[i * n + j] = v < -32768 ? -32768 : v > 32767 ? 32767 : v;
    }
  }
  // stage 2 (horizontal): out[i][.] = (idct(tmp[i][.]) + rnd) >> sh
  int rnd = 1 << (19 - bd), sh = 20 - bd;
  for (int i = 0; i < n; ++i) {
    idct_1d(tmp + i * n, 1, log2, nzw + 1, col);
    for (int j = 0; j < n; ++j) out[i * n + j] = (col[j] + rnd) >> sh;
  }
}

static void residual_from_coeffs(const int32_t* coef, int qp, int log2,
                                 bool dst, bool ts, bool bypass, int bd,
                                 int nzw, int nzh, const int32_t* sm,
                                 int32_t* out) {
  int n = 1 << log2;
  if (bypass) {
    std::memcpy(out, coef, sizeof(int32_t) * n * n);
    return;
  }
  // dequant (8.6.3) -- only the nonzero extent; sm = per-coefficient
  // ScalingFactor matrix (nullptr = flat 16)
  int shift = bd + log2 - 5;
  int32_t d[32 * 32];
  int64_t rnd = (int64_t)1 << (shift - 1);
  if (sm == nullptr) {
    int64_t scale = (int64_t)16 * kLevelScale[qp % 6] << (qp / 6);
    for (int y = 0; y <= nzh; ++y)
      for (int x = 0; x <= nzw; ++x) {
        int64_t v = ((int64_t)coef[y * n + x] * scale + rnd) >> shift;
        d[y * n + x] =
            (int32_t)(v < -32768 ? -32768 : v > 32767 ? 32767 : v);
      }
  } else {
    int64_t ls = (int64_t)kLevelScale[qp % 6] << (qp / 6);
    for (int y = 0; y <= nzh; ++y)
      for (int x = 0; x <= nzw; ++x) {
        int64_t v =
            ((int64_t)coef[y * n + x] * sm[y * n + x] * ls + rnd) >> shift;
        d[y * n + x] =
            (int32_t)(v < -32768 ? -32768 : v > 32767 ? 32767 : v);
      }
  }
  if (ts) {
    int r2 = 1 << (19 - bd), s2 = 20 - bd;
    std::memset(out, 0, sizeof(int32_t) * n * n);
    for (int y = 0; y <= nzh; ++y)
      for (int x = 0; x <= nzw; ++x)
        out[y * n + x] = ((int32_t)d[y * n + x] * 128 + r2) >> s2;
    return;
  }
  inv_transform(d, log2, dst, bd, nzw, nzh, out);
}

// ---------------------------------------------------------------------------
// Intra prediction (8.4.4.2; h265_ref.py _intra_refs/_filter_refs/
// intra_predict).  Avail is a callable (x, y) -> bool.
// ---------------------------------------------------------------------------

template <typename Avail>
static void intra_refs(const uint16_t* plane, int stride, int pw, int ph,
                       int px, int py, int nT, const Avail& avail_fn, int bd,
                       int32_t* left, int32_t* top, int32_t* tl_out) {
  int n2 = 2 * nT;
  uint8_t la[64] = {0}, ta[64] = {0};
  std::fill(left, left + n2, 0);
  std::fill(top, top + n2, 0);
  for (int i = 0; i < n2; ++i) {
    int y = py + i;
    if (px > 0 && y < ph && avail_fn(px - 1, y)) {
      left[i] = plane[(size_t)y * stride + px - 1];
      la[i] = 1;
    }
    int x = px + i;
    if (py > 0 && x < pw && avail_fn(x, py - 1)) {
      top[i] = plane[(size_t)(py - 1) * stride + x];
      ta[i] = 1;
    }
  }
  int tl = 0, tla = 0;
  if (px > 0 && py > 0 && avail_fn(px - 1, py - 1)) {
    tl = plane[(size_t)(py - 1) * stride + px - 1];
    tla = 1;
  }
  bool any_l = false, any_t = false;
  for (int i = 0; i < n2; ++i) {
    any_l |= la[i];
    any_t |= ta[i];
  }
  if (!tla && !any_l && !any_t) {
    int half = 1 << (bd - 1);
    std::fill(left, left + n2, half);
    std::fill(top, top + n2, half);
    *tl_out = half;
    return;
  }
  // substitution scan: left bottom-up, topleft, top left-to-right
  if (!la[n2 - 1]) {
    long v = -1;
    for (int i = n2 - 1; i >= 0; --i)
      if (la[i]) {
        v = left[i];
        break;
      }
    if (v < 0) {
      if (tla)
        v = tl;
      else {
        for (int i = 0; i < n2; ++i)
          if (ta[i]) {
            v = top[i];
            break;
          }
      }
    }
    left[n2 - 1] = (int32_t)v;
    la[n2 - 1] = 1;
  }
  for (int i = n2 - 2; i >= 0; --i)
    if (!la[i]) left[i] = left[i + 1];
  if (!tla) tl = left[0];
  for (int i = 0; i < n2; ++i)
    if (!ta[i]) top[i] = i > 0 ? top[i - 1] : tl;
  *tl_out = tl;
}

// 8.4.4.2.3 (luma only; caller gates on cIdx/size/mode)
static void filter_refs(int32_t* left, int32_t* top, int32_t* tl, int nT,
                        bool strong, int bd) {
  int n2 = 2 * nT;
  int thr = 1 << (bd - 5);
  int32_t fl[64], ft[64];
  if (strong && nT == 32 &&
      std::abs(*tl + top[n2 - 1] - 2 * top[nT - 1]) < thr &&
      std::abs(*tl + left[n2 - 1] - 2 * left[nT - 1]) < thr) {
    for (int x = 0; x < n2 - 1; ++x) {
      ft[x] = ((63 - x) * *tl + (x + 1) * top[n2 - 1] + 32) >> 6;
      fl[x] = ((63 - x) * *tl + (x + 1) * left[n2 - 1] + 32) >> 6;
    }
    ft[n2 - 1] = top[n2 - 1];
    fl[n2 - 1] = left[n2 - 1];
    std::copy(fl, fl + n2, left);
    std::copy(ft, ft + n2, top);
    return;
  }
  int ftl = (left[0] + 2 * *tl + top[0] + 2) >> 2;
  ft[0] = (*tl + 2 * top[0] + top[1] + 2) >> 2;
  fl[0] = (*tl + 2 * left[0] + left[1] + 2) >> 2;
  for (int i = 1; i < n2 - 1; ++i) {
    ft[i] = (top[i - 1] + 2 * top[i] + top[i + 1] + 2) >> 2;
    fl[i] = (left[i - 1] + 2 * left[i] + left[i + 1] + 2) >> 2;
  }
  ft[n2 - 1] = top[n2 - 1];
  fl[n2 - 1] = left[n2 - 1];
  std::copy(fl, fl + n2, left);
  std::copy(ft, ft + n2, top);
  *tl = ftl;
}

// 8.4.4.2.4-6 -> predicted block (nT x nT int32, row-major)
template <typename Avail>
static void intra_predict(const uint16_t* plane, int stride, int pw, int ph,
                          int px, int py, int nT, int mode, int cIdx,
                          const Avail& avail_fn, bool strong_smoothing,
                          int bd, int32_t* pred) {
  int32_t left[64], top[64];
  int32_t tl;
  intra_refs(plane, stride, pw, ph, px, py, nT, avail_fn, bd, left, top,
             &tl);
  if (cIdx == 0 && mode != 1 && nT > 4) {
    int mindist = std::min(std::abs(mode - 26), std::abs(mode - 10));
    int thr = nT == 8 ? 7 : nT == 16 ? 1 : 0;
    if (mindist > thr) filter_refs(left, top, &tl, nT, strong_smoothing, bd);
  }
  if (mode == 0) {  // planar (8.4.4.2.4)
    int tr = top[nT], bl = left[nT];
    int sh = bit_length(nT);  // log2(nT)+1
    for (int y = 0; y < nT; ++y)
      for (int x = 0; x < nT; ++x)
        pred[y * nT + x] = ((nT - 1 - x) * left[y] + (x + 1) * tr +
                            (nT - 1 - y) * top[x] + (y + 1) * bl + nT) >>
                           sh;
    return;
  }
  if (mode == 1) {  // DC (8.4.4.2.5)
    int sum = nT;
    for (int i = 0; i < nT; ++i) sum += top[i] + left[i];
    int dc = sum >> bit_length(nT);
    for (int i = 0; i < nT * nT; ++i) pred[i] = dc;
    if (cIdx == 0 && nT < 32) {
      pred[0] = (left[0] + 2 * dc + top[0] + 2) >> 2;
      for (int x = 1; x < nT; ++x) pred[x] = (top[x] + 3 * dc + 2) >> 2;
      for (int y = 1; y < nT; ++y)
        pred[y * nT] = (left[y] + 3 * dc + 2) >> 2;
    }
    return;
  }
  // angular (8.4.4.2.6)
  int ang = kIntraPredAngle[mode - 2];
  int mx = (1 << bd) - 1;
  int32_t refbuf[3 * 32 + 1];
  int32_t* ref = refbuf;
  std::fill(ref, ref + 3 * nT + 1, 0);
  if (mode >= 18) {  // near-vertical: main = top
    // index bias nT: ref[nT+i] = p[i-1][-1]
    ref[nT] = tl;
    for (int i = 0; i < 2 * nT; ++i) ref[nT + 1 + i] = top[i];
    if (ang < 0) {
      int inv = kInvAngleByMode[mode - 2];
      int lo = (nT * ang) >> 5;
      for (int x = -1; x > lo; --x) {  // ref[lo] is never read
        int idx = ((x * inv + 128) >> 8) - 1;
        ref[nT + x] = idx < 0 ? tl : left[idx];
      }
    }
    for (int y = 0; y < nT; ++y) {
      int ii = ((y + 1) * ang) >> 5;
      int fact = ((y + 1) * ang) & 31;
      int base = nT + 1 + ii;
      if (fact)
        for (int x = 0; x < nT; ++x)
          pred[y * nT + x] = ((32 - fact) * ref[base + x] +
                              fact * ref[base + 1 + x] + 16) >>
                             5;
      else
        for (int x = 0; x < nT; ++x) pred[y * nT + x] = ref[base + x];
    }
    if (mode == 26 && cIdx == 0 && nT < 32)
      for (int y = 0; y < nT; ++y)
        pred[y * nT] = clamp_i(top[0] + ((left[y] - tl) >> 1), 0, mx);
    return;
  }
  // near-horizontal: main = left (transpose of the vertical case)
  ref[nT] = tl;
  for (int i = 0; i < 2 * nT; ++i) ref[nT + 1 + i] = left[i];
  if (ang < 0) {
    int inv = kInvAngleByMode[mode - 2];
    int lo = (nT * ang) >> 5;
    for (int x = -1; x > lo; --x) {
      int idx = ((x * inv + 128) >> 8) - 1;
      ref[nT + x] = idx < 0 ? tl : top[idx];
    }
  }
  for (int x = 0; x < nT; ++x) {
    int ii = ((x + 1) * ang) >> 5;
    int fact = ((x + 1) * ang) & 31;
    int base = nT + 1 + ii;
    if (fact)
      for (int y = 0; y < nT; ++y)
        pred[y * nT + x] = ((32 - fact) * ref[base + y] +
                            fact * ref[base + 1 + y] + 16) >>
                           5;
    else
      for (int y = 0; y < nT; ++y) pred[y * nT + x] = ref[base + y];
  }
  if (mode == 10 && cIdx == 0 && nT < 32)
    for (int x = 0; x < nT; ++x)
      pred[x] = clamp_i(left[0] + ((top[x] - tl) >> 1), 0, mx);
}

}  // namespace h265

namespace h265 {

// in-subblock significance-context pattern (9.3.4.2.5) per csbf
// neighbour state `prev` = right|below<<1; the caller adds the
// luma/chroma/size base offset
static const uint8_t kSigCtxPos[4][16] = {
    {2, 1, 1, 0, 1, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0},
    {2, 2, 2, 2, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0},
    {2, 1, 0, 0, 2, 1, 0, 0, 2, 1, 0, 0, 2, 1, 0, 0},
    {2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2},
};

// scan position inverse luts: kScanPos[si][k][(y<<k)+x] = scan index n
static uint8_t g_scan_pos[3][4][64];
static const struct InitScanPos {
  InitScanPos() {
    for (int si = 0; si < 3; ++si)
      for (int k = 1; k <= 3; ++k) {
        int n = 1 << (2 * k);
        for (int i = 0; i < n; ++i) {
          int x = kScan[si][k][2 * i];
          int y = kScan[si][k][2 * i + 1];
          g_scan_pos[si][k][(y << k) + x] = (uint8_t)i;
        }
      }
  }
} g_init_scan_pos;

// 8.5.3.2.8 POC-distance MV scaling (h265_ref.py _mv_scale)
static int mv_scale(int mv, int tb, int td) {
  td = clamp_i(td, -128, 127);
  tb = clamp_i(tb, -128, 127);
  int q = (16384 + (std::abs(td) >> 1)) / std::abs(td);
  int tx = td > 0 ? q : -q;
  int dsf = clamp_i((tb * tx + 32) >> 6, -4096, 4095);
  int64_t v = (int64_t)dsf * mv;
  int s = v < 0 ? -1 : 1;
  int64_t r = s * ((std::llabs(v) + 127) >> 8);
  return clamp_i((int)r, -32768, 32767);
}

static inline int wrap16(int v) {
  v &= 0xFFFF;
  return v >= 0x8000 ? v - 0x10000 : v;
}

// PU geometry (Table 7-10; h265_ref.py _pu_geometry)
struct PuRect {
  int dx, dy, w, h;
};
static int pu_geometry(int part, int s, PuRect* out) {
  int h2 = s >> 1, q = s >> 2;
  switch (part) {
    case PART_2Nx2N:
      out[0] = {0, 0, s, s};
      return 1;
    case PART_2NxN:
      out[0] = {0, 0, s, h2};
      out[1] = {0, h2, s, h2};
      return 2;
    case PART_Nx2N:
      out[0] = {0, 0, h2, s};
      out[1] = {h2, 0, h2, s};
      return 2;
    case PART_NxN:
      out[0] = {0, 0, h2, h2};
      out[1] = {h2, 0, h2, h2};
      out[2] = {0, h2, h2, h2};
      out[3] = {h2, h2, h2, h2};
      return 4;
    case PART_2NxnU:
      out[0] = {0, 0, s, q};
      out[1] = {0, q, s, s - q};
      return 2;
    case PART_2NxnD:
      out[0] = {0, 0, s, s - q};
      out[1] = {0, s - q, s, q};
      return 2;
    case PART_nLx2N:
      out[0] = {0, 0, q, s};
      out[1] = {q, 0, s - q, s};
      return 2;
    default:  // PART_nRx2N
      out[0] = {0, 0, s - q, s};
      out[1] = {s - q, 0, q, s};
      return 2;
  }
}

// motion snapshot of one 4x4 block (h265_ref.py _mot_at return shape);
// equality is full structural equality, mirroring the oracle's tuple
// comparison (unused-list values participate!)
struct Mot {
  bool valid = false;
  bool used[2] = {false, false};
  int mv[2][2] = {{0, 0}, {0, 0}};
  int ridx[2] = {0, 0};
  bool operator==(const Mot& o) const {
    if (!valid || !o.valid) return false;
    return used[0] == o.used[0] && used[1] == o.used[1] &&
           mv[0][0] == o.mv[0][0] && mv[0][1] == o.mv[0][1] &&
           mv[1][0] == o.mv[1][0] && mv[1][1] == o.mv[1][1] &&
           ridx[0] == o.ridx[0] && ridx[1] == o.ridx[1];
  }
  bool operator!=(const Mot& o) const { return !(*this == o); }
};

// merge candidate: used/mvs/ridx triple (h265_ref.py _merge_list entries)
struct MergeCand {
  bool used[2];
  int mv[2][2];
  int ridx[2];
};

struct Decoder;  // fwd

// ---------------------------------------------------------------------------
// Per-slice decoder (h265_ref.py _SliceDec)
// ---------------------------------------------------------------------------

struct SliceDec {
  Decoder* dec;
  Frame* pic;
  const SliceHeader* h;
  const Sps* sps;
  const Pps* pps;
  int slice_id;
  const uint8_t* rbsp;
  size_t rbsp_len;
  int init_type;
  std::vector<size_t> substreams;
  int sub_idx = 0;
  CabacEngine c;
  std::map<int, CabacEngine::Snap> wpp_snap;
  int qp_prev, last_cu_qp;
  bool is_delta_coded = false;
  int delta_val = 0;
  int qg_x = 0, qg_y = 0;
  bool has_cur_cu_qp = false;
  int cur_cu_qp_val = 0;
  int log2_min_qg;
  // current CU state
  int cur_cu_x = 0, cur_cu_y = 0, cur_cu_log2 = 0;
  bool cu_bypass = false;
  int cu_depth = 0;
  bool cu_is_intra = true, cu_intra_split = false, cu_inter_split = false;
  int cu_modes[4] = {1, 1, 1, 1};
  int cu_pbs = 0;
  int cu_chroma_mode = 1;
  // reference lists (+ per-entry long-term flags, 8.3.2)
  std::vector<Frame*> refs[2];
  std::vector<uint8_t> refs_lt[2];
  Frame* col_pic = nullptr;
  bool no_backward = true;
  int cur_tile = 0;  // tile id of the CTU being decoded

  SliceDec(Decoder* d, Frame* p, const SliceHeader* hh,
           const std::vector<uint8_t>& rbsp_, const std::vector<size_t>& epb,
           int sid)
      : dec(d), pic(p), h(hh), sps(hh->sps), pps(hh->pps), slice_id(sid),
        rbsp(rbsp_.data()), rbsp_len(rbsp_.size()) {
    if (h->slice_type == SLICE_I)
      init_type = 0;
    else if (h->slice_type == SLICE_P)
      init_type = h->cabac_init_flag ? 2 : 1;
    else
      init_type = h->cabac_init_flag ? 1 : 2;
    // substream RBSP byte offsets (entry points count EBSP bytes)
    size_t ebsp_data = h->data_byte_pos;
    for (size_t pe : epb)
      if (pe <= h->data_byte_pos) ++ebsp_data;
    substreams.push_back(h->data_byte_pos);
    size_t off = ebsp_data;
    for (int ep : h->entry_points) {
      off += ep;
      substreams.push_back(ebsp_off_to_rbsp(off, epb));
    }
    c.init_ctx(init_type, h->slice_qp);
    c.start(rbsp, rbsp_len, substreams[0] * 8);
    qp_prev = h->slice_qp;
    last_cu_qp = h->slice_qp;
    log2_min_qg = sps->log2_ctb - pps->diff_cu_qp_delta_depth;
  }

  int dcd(int ctx, int inc = 0) { return c.decision(ctx + inc); }

  // -- availability (6.4.1; h265_ref.py _zavail) -------------------------

  bool zavail(int x, int y, bool parse) const {
    if (x < 0 || y < 0 || x >= sps->width || y >= sps->height) return false;
    int i = pic->gi(y >> 2, x >> 2);
    const uint8_t* grid = parse ? pic->decided.data() : pic->avail.data();
    if (!grid[i] || pic->slice_id[i] != slice_id) return false;
    if (pps->tiles_enabled) {
      // 6.4.1: blocks in a different tile are unavailable
      int rs = (y >> sps->log2_ctb) * sps->pic_w_ctbs + (x >> sps->log2_ctb);
      if (pps->tile_id[rs] != cur_tile) return false;
    }
    return true;
  }
  bool sample_avail_luma(int x, int y) const {
    if (!zavail(x, y, false)) return false;
    if (pps->constrained_intra_pred)
      return pic->is_intra[pic->gi(y >> 2, x >> 2)] != 0;
    return true;
  }
  bool sample_avail_chroma(int xc, int yc) const {
    return sample_avail_luma(xc << 1, yc << 1);
  }

  // -- QP (h265_ref.py _qg_reset/_cu_qp) ----------------------------------

  void qg_reset(int x0, int y0) {
    is_delta_coded = false;
    delta_val = 0;
    qg_x = x0;
    qg_y = y0;
    qp_prev = last_cu_qp;
  }

  int cu_qp() {
    if (!has_cur_cu_qp) {
      int xq = qg_x, yq = qg_y;
      int ctb = 1 << sps->log2_ctb;
      int qa = qp_prev, qb = qp_prev;
      if ((xq % ctb) && zavail(xq - 1, yq, true))
        qa = pic->qp[pic->gi(yq >> 2, (xq - 1) >> 2)];
      if ((yq % ctb) && zavail(xq, yq - 1, true))
        qb = pic->qp[pic->gi((yq - 1) >> 2, xq >> 2)];
      int pred = (qa + qb + 1) >> 1;
      int qbd = 6 * (sps->bit_depth - 8);
      int m = 52 + qbd;
      int lhs = pred + delta_val + 52 + 2 * qbd;
      cur_cu_qp_val = (((lhs % m) + m) % m) - qbd;
      has_cur_cu_qp = true;
    }
    return cur_cu_qp_val;
  }

  // -- slice data loop (h265_ref.py run) -----------------------------------

  void run() {
    int wctb = sps->pic_w_ctbs;
    bool sync = pps->entropy_coding_sync != 0;
    bool tiles = pps->tiles_enabled != 0;
    // slice_segment_address is in raster scan; decode order is tile
    // scan (6.5.1)
    int ctb_ts = pps->rs_to_ts[h->segment_address];
    while (true) {
      int ctb_addr = pps->ts_to_rs[ctb_ts];
      cur_tile = pps->tile_id[ctb_addr];
      int cx = (ctb_addr % wctb) << sps->log2_ctb;
      int cy = (ctb_addr / wctb) << sps->log2_ctb;
      decode_ctu(cx, cy);
      if (sync &&
          ((ctb_addr % wctb == 1) || (wctb == 1 && ctb_addr % wctb == 0)))
        c.snapshot(wpp_snap[ctb_addr / wctb]);
      int end = c.terminate();
      ++ctb_ts;
      if (end || ctb_ts >= sps->pic_size_ctbs) break;
      int nxt_rs = pps->ts_to_rs[ctb_ts];
      bool new_tile = tiles && pps->tile_id[nxt_rs] != pps->tile_id[ctb_addr];
      bool new_row = sync && nxt_rs % wctb == 0;
      if (new_tile || new_row) {
        // end_of_subset_one_bit + byte alignment -> next substream
        int one = c.terminate();
        if (one != 1) throw DecodeError("missing end_of_subset bit");
        ++sub_idx;
        if (sub_idx >= (int)substreams.size())
          throw DecodeError("entry point underrun");
        // a new tile re-initialises contexts (9.3.1); both reset the
        // QP predictor (8.6.1)
        c.init_ctx(init_type, h->slice_qp);
        c.start(rbsp, rbsp_len, substreams[sub_idx] * 8);
        if (new_row) {
          auto it = wpp_snap.find(nxt_rs / wctb - 1);
          if (it != wpp_snap.end()) c.restore(it->second);
        }
        qp_prev = h->slice_qp;
        last_cu_qp = h->slice_qp;
      }
    }
  }

  void decode_ctu(int x0, int y0) {
    if (h->sao_luma || h->sao_chroma) parse_sao(x0, y0);
    coding_quadtree(x0, y0, sps->log2_ctb, 0);
  }

  // -- SAO syntax (7.3.8.3; h265_ref.py _parse_sao) ------------------------

  void parse_sao(int x0, int y0) {
    int rx = x0 >> sps->log2_ctb;
    int ry = y0 >> sps->log2_ctb;
    int ci_base = (ry * pic->cgw + rx) * 3;
    auto copy_from = [&](int sy, int sx) {
      int src = (sy * pic->cgw + sx) * 3;
      for (int ci = 0; ci < 3; ++ci) {
        pic->sao_type[ci_base + ci] = pic->sao_type[src + ci];
        pic->sao_band_pos[ci_base + ci] = pic->sao_band_pos[src + ci];
        pic->sao_eo_class[ci_base + ci] = pic->sao_eo_class[src + ci];
        for (int k = 0; k < 4; ++k)
          pic->sao_offsets[(ci_base + ci) * 4 + k] =
              pic->sao_offsets[(src + ci) * 4 + k];
      }
    };
    // merge candidates must share the slice AND the tile (7.4.9.3)
    int wc = sps->pic_w_ctbs;
    auto same_tile = [&](int nrx, int nry) {
      return !pps->tiles_enabled ||
             pps->tile_id[nry * wc + nrx] == pps->tile_id[ry * wc + rx];
    };
    if (rx > 0 && same_tile(rx - 1, ry) &&
        pic->slice_id[pic->gi(y0 >> 2, (x0 - 1) >> 2)] == slice_id &&
        dcd(CTX_sao_merge_flag)) {
      copy_from(ry, rx - 1);
      return;
    }
    if (ry > 0 && same_tile(rx, ry - 1) &&
        pic->slice_id[pic->gi((y0 - 1) >> 2, x0 >> 2)] == slice_id &&
        dcd(CTX_sao_merge_flag)) {
      copy_from(ry - 1, rx);
      return;
    }
    for (int ci = 0; ci < 3; ++ci) {
      if (ci == 0 && !h->sao_luma) continue;
      if (ci > 0 && !h->sao_chroma) continue;
      int typ;
      if (ci == 2) {
        // Cr shares type/eo-class with Cb, own offsets/band pos
        typ = pic->sao_type[ci_base + 1];
      } else {
        typ = 0;
        if (dcd(CTX_sao_type_idx)) typ = c.bypass() ? 2 : 1;
      }
      pic->sao_type[ci_base + ci] = (int8_t)typ;
      if (typ == 0) continue;
      int cmax = (1 << (std::min(sps->bit_depth, 10) - 5)) - 1;
      int offs[4];
      for (int i = 0; i < 4; ++i) offs[i] = c.tr_bypass(cmax);
      if (typ == 1) {  // band
        for (int i = 0; i < 4; ++i)
          if (offs[i] && c.bypass()) offs[i] = -offs[i];
        pic->sao_band_pos[ci_base + ci] = (int8_t)c.bypass_bits(5);
      } else {  // edge: offsets 0,1 positive; 2,3 negative
        offs[2] = -offs[2];
        offs[3] = -offs[3];
        if (ci == 2)
          pic->sao_eo_class[ci_base + 2] = pic->sao_eo_class[ci_base + 1];
        else
          pic->sao_eo_class[ci_base + ci] = (int8_t)c.bypass_bits(2);
      }
      for (int k = 0; k < 4; ++k)
        pic->sao_offsets[(ci_base + ci) * 4 + k] = (int16_t)offs[k];
    }
  }

  // -- quadtree (h265_ref.py _coding_quadtree) -----------------------------

  void coding_quadtree(int x0, int y0, int log2, int depth) {
    int size = 1 << log2;
    bool inside = (x0 + size <= sps->width) && (y0 + size <= sps->height);
    int split;
    if (inside && log2 > sps->log2_min_cb) {
      int inc = 0;
      if (zavail(x0 - 1, y0, true) &&
          pic->ctdepth[pic->gi(y0 >> 2, (x0 - 1) >> 2)] > depth)
        ++inc;
      if (zavail(x0, y0 - 1, true) &&
          pic->ctdepth[pic->gi((y0 - 1) >> 2, x0 >> 2)] > depth)
        ++inc;
      split = dcd(CTX_split_cu_flag, inc);
    } else {
      split = log2 > sps->log2_min_cb ? 1 : 0;
    }
    if (pps->cu_qp_delta_enabled && log2 >= log2_min_qg) qg_reset(x0, y0);
    if (split) {
      int half = size >> 1;
      const int off[4][2] = {{0, 0}, {half, 0}, {0, half}, {half, half}};
      for (auto& o : off) {
        int x1 = x0 + o[0], y1 = y0 + o[1];
        if (x1 < sps->width && y1 < sps->height)
          coding_quadtree(x1, y1, log2 - 1, depth + 1);
      }
    } else {
      coding_unit(x0, y0, log2, depth);
    }
  }

  // grid fill helpers. Row runs are 2-16 bytes; std::fill on bytes
  // lowers to a libc memset CALL (libstdc++ __fill_a1), whose overhead
  // dwarfs the stores at these sizes — ~14M calls per 4K second came
  // from here. Fixed-size copies of a replicated pattern inline.
  void grid_fill_u8(std::vector<uint8_t>& g, int x0, int y0, int size,
                    uint8_t v) {
    const int gx0 = x0 >> 2, w = size >> 2;
    const uint64_t pat = (uint64_t)v * 0x0101010101010101ull;
    for (int gy = y0 >> 2; gy < (y0 + size) >> 2; ++gy) {
      uint8_t* row = g.data() + pic->gi(gy, gx0);
      switch (w) {
        case 1: row[0] = v; break;
        case 2: { uint16_t p = (uint16_t)pat; std::memcpy(row, &p, 2); break; }
        case 4: { uint32_t p = (uint32_t)pat; std::memcpy(row, &p, 4); break; }
        case 8: std::memcpy(row, &pat, 8); break;
        case 16:
          std::memcpy(row, &pat, 8);
          std::memcpy(row + 8, &pat, 8);
          break;
        default: std::memset(row, v, (size_t)w);
      }
    }
  }

  // -- coding unit (h265_ref.py _coding_unit) ------------------------------

  void coding_unit(int x0, int y0, int log2, int depth) {
    int size = 1 << log2;
    cur_cu_x = x0;
    cur_cu_y = y0;
    cur_cu_log2 = log2;
    has_cur_cu_qp = false;
    cu_bypass = false;
    cu_depth = depth;
    grid_fill_u8(pic->ctdepth, x0, y0, size, (uint8_t)depth);
    for (int gy = y0 >> 2; gy < (y0 + size) >> 2; ++gy)
      std::fill(pic->slice_id.begin() + pic->gi(gy, x0 >> 2),
                pic->slice_id.begin() + pic->gi(gy, (x0 + size) >> 2),
                slice_id);
    bool skip = false;
    if (h->slice_type != SLICE_I) {
      int inc = 0;
      if (zavail(x0 - 1, y0, true) &&
          pic->skip[pic->gi(y0 >> 2, (x0 - 1) >> 2)])
        ++inc;
      if (zavail(x0, y0 - 1, true) &&
          pic->skip[pic->gi((y0 - 1) >> 2, x0 >> 2)])
        ++inc;
      skip = dcd(CTX_cu_skip_flag, inc) != 0;
    }
    if (skip) {
      grid_fill_u8(pic->skip, x0, y0, size, 1);
      grid_fill_u8(pic->is_intra, x0, y0, size, 0);
      prediction_unit(x0, y0, size, size, 0, PART_2Nx2N, true);
      mark_pu_edges(x0, y0, size, size);
      finish_cu(x0, y0, size);
      return;
    }
    grid_fill_u8(pic->skip, x0, y0, size, 0);
    if (pps->transquant_bypass_enabled)
      cu_bypass = dcd(CTX_cu_transquant_bypass_flag) != 0;
    grid_fill_u8(pic->bypass, x0, y0, size, cu_bypass ? 1 : 0);
    if (cu_bypass) __atomic_store_n(&pic->any_bypass, 1, __ATOMIC_RELAXED);
    bool intra = true;
    if (h->slice_type != SLICE_I) intra = dcd(CTX_pred_mode_flag) != 0;
    if (intra)
      cu_intra(x0, y0, log2, depth);
    else
      cu_inter(x0, y0, log2, depth);
  }

  void finish_cu(int x0, int y0, int size) {
    // CU boundaries are transform-block edges for deblocking even when
    // no residual is coded (skip / rqt_root_cbf=0), 8.7.2.
    for (int gy = y0 >> 2; gy < (y0 + size) >> 2; ++gy)
      pic->tu_edge_v[pic->gi(gy, x0 >> 2)] = 1;
    for (int gx = x0 >> 2; gx < (x0 + size) >> 2; ++gx)
      pic->tu_edge_h[pic->gi(y0 >> 2, gx)] = 1;
    int q = cu_qp();
    for (int gy = y0 >> 2; gy < (y0 + size) >> 2; ++gy)
      for (int gx = x0 >> 2; gx < (x0 + size) >> 2; ++gx)
        pic->qp[pic->gi(gy, gx)] = (int16_t)q;
    last_cu_qp = has_cur_cu_qp ? cur_cu_qp_val : last_cu_qp;
    grid_fill_u8(pic->avail, x0, y0, size, 1);
    grid_fill_u8(pic->decided, x0, y0, size, 1);
  }

  void mark_pu_edges(int xp, int yp, int w, int hh) {
    for (int gy = yp >> 2; gy < (yp + hh) >> 2; ++gy)
      pic->pu_edge_v[pic->gi(gy, xp >> 2)] = 1;
    for (int gx = xp >> 2; gx < (xp + w) >> 2; ++gx)
      pic->pu_edge_h[pic->gi(yp >> 2, gx)] = 1;
  }

  // -- intra CU (h265_ref.py _cu_intra) ------------------------------------

  void cu_intra(int x0, int y0, int log2, int depth) {
    (void)depth;
    int size = 1 << log2;
    grid_fill_u8(pic->is_intra, x0, y0, size, 1);
    bool part_nxn = false;
    if (log2 == sps->log2_min_cb) {
      if (!dcd(CTX_part_mode)) part_nxn = true;
    }
    if (sps->pcm_enabled && !part_nxn && log2 >= sps->log2_min_pcm &&
        log2 <= sps->log2_max_pcm &&
        c.terminate()) {  // pcm_flag (9.3.3.6 terminate bin)
      pcm_cu(x0, y0, log2);
      return;
    }
    int n_pu = part_nxn ? 4 : 1;
    int pbs = size >> (part_nxn ? 1 : 0);
    int prev_flags[4], raw_kind[4], raw_val[4];
    for (int i = 0; i < n_pu; ++i)
      prev_flags[i] = dcd(CTX_prev_intra_luma_pred_flag);
    for (int i = 0; i < n_pu; ++i) {
      if (prev_flags[i]) {
        int idx = 0;
        if (c.bypass()) idx = 1 + c.bypass();
        raw_kind[i] = 0;  // mpm
        raw_val[i] = idx;
      } else {
        raw_kind[i] = 1;  // rem
        raw_val[i] = c.bypass_bits(5);
      }
    }
    for (int i = 0; i < n_pu; ++i) {
      int xp = x0 + (i & 1) * pbs;
      int yp = y0 + (i >> 1) * pbs;
      int cand_a = 1, cand_b = 1;  // DC
      if (zavail(xp - 1, yp, true)) {
        int gi = pic->gi(yp >> 2, (xp - 1) >> 2);
        if (pic->is_intra[gi]) cand_a = pic->intra_mode[gi];
      }
      if ((yp % (1 << sps->log2_ctb)) && zavail(xp, yp - 1, true)) {
        int gi = pic->gi((yp - 1) >> 2, xp >> 2);
        if (pic->is_intra[gi]) cand_b = pic->intra_mode[gi];
      }
      int mpm[3];
      if (cand_a == cand_b) {
        if (cand_a < 2) {
          mpm[0] = 0;
          mpm[1] = 1;
          mpm[2] = 26;
        } else {
          mpm[0] = cand_a;
          mpm[1] = 2 + ((cand_a + 29) % 32);
          mpm[2] = 2 + ((cand_a - 2 + 1) % 32);
        }
      } else {
        mpm[0] = cand_a;
        mpm[1] = cand_b;
        mpm[2] = (cand_a != 0 && cand_b != 0)
                     ? 0
                     : ((cand_a != 1 && cand_b != 1) ? 1 : 26);
      }
      int mode;
      if (raw_kind[i] == 0) {
        mode = mpm[raw_val[i]];
      } else {
        mode = raw_val[i];
        int srt[3] = {mpm[0], mpm[1], mpm[2]};
        std::sort(srt, srt + 3);
        for (int m : srt)
          if (mode >= m) ++mode;
      }
      cu_modes[i] = mode;
      for (int gy = yp >> 2; gy < (yp + pbs) >> 2; ++gy)
        for (int gx = xp >> 2; gx < (xp + pbs) >> 2; ++gx) {
          pic->intra_mode[pic->gi(gy, gx)] = (uint8_t)mode;
          pic->decided[pic->gi(gy, gx)] = 1;
        }
    }
    int chroma_mode;
    if (!dcd(CTX_intra_chroma_pred_mode)) {
      chroma_mode = cu_modes[0];
    } else {
      int idx = c.bypass_bits(2);
      static const int cand_tab[4] = {0, 26, 10, 1};
      int cand = cand_tab[idx];
      chroma_mode = cand == cu_modes[0] ? 34 : cand;
    }
    cu_pbs = pbs;
    cu_chroma_mode = chroma_mode;
    cu_intra_split = part_nxn;
    cu_is_intra = true;
    transform_tree(x0, y0, x0, y0, log2, 0, 0, 1, 1);
    finish_cu(x0, y0, size);
  }

  // pcm_sample (7.3.8.7): raw luma + chroma at the PCM bit depths,
  // left-shifted to the picture depth (8.4.4.1)
  void pcm_cu(int x0, int y0, int log2) {
    int size = 1 << log2;
    c.pcm_begin();
    int sh_y = sps->bit_depth - sps->pcm_bd;
    for (int y = y0; y < y0 + size; ++y) {
      uint16_t* row = pic->yrow(y);
      for (int x = x0; x < x0 + size; ++x)
        row[x] = (uint16_t)(c.pcm_bits(sps->pcm_bd) << sh_y);
    }
    int half = size >> 1;
    int sh_c = sps->bit_depth_c - sps->pcm_bd_c;
    for (int pl = 0; pl < 2; ++pl) {
      for (int y = y0 >> 1; y < (y0 >> 1) + half; ++y) {
        uint16_t* row = pl ? pic->vrow(y) : pic->urow(y);
        for (int x = x0 >> 1; x < (x0 >> 1) + half; ++x)
          row[x] = (uint16_t)(c.pcm_bits(sps->pcm_bd_c) << sh_c);
      }
    }
    c.pcm_end();
    // PCM counts as DC for neighbour MPM (8.4.2); samples are exempt
    // from deblock/SAO when pcm_loop_filter_disabled (8.7)
    grid_fill_u8(pic->intra_mode, x0, y0, size, 1);
    grid_fill_u8(pic->skip, x0, y0, size, 0);
    grid_fill_u8(pic->nnz, x0, y0, size, 0);
    if (sps->pcm_loop_filter_disabled) {
      grid_fill_u8(pic->bypass, x0, y0, size, 1);
      __atomic_store_n(&pic->any_bypass, 1, __ATOMIC_RELAXED);
    }
    finish_cu(x0, y0, size);
  }

  int pu_mode(int x, int y) const {
    if (!cu_intra_split) return cu_modes[0];
    int i = ((y >= cur_cu_y + cu_pbs ? 1 : 0) << 1) |
            (x >= cur_cu_x + cu_pbs ? 1 : 0);
    return cu_modes[i];
  }

  // -- transform tree (h265_ref.py _transform_tree) ------------------------

  void transform_tree(int x0, int y0, int x_base, int y_base, int log2,
                      int depth, int blk_idx, int pcb, int pcr) {
    bool intra_split = cu_is_intra && cu_intra_split;
    bool inter_split = !cu_is_intra && depth == 0 && cu_inter_split;
    int max_depth = cu_is_intra
                        ? sps->max_trafo_depth_intra + (intra_split ? 1 : 0)
                        : sps->max_trafo_depth_inter;
    int split;
    if (log2 <= sps->log2_max_tb && log2 > sps->log2_min_tb &&
        depth < max_depth && !(intra_split && depth == 0)) {
      split = dcd(CTX_split_transform_flag, 5 - log2);
    } else {
      split = (log2 > sps->log2_max_tb || (intra_split && depth == 0) ||
               inter_split)
                  ? 1
                  : 0;
    }
    int cbf_cb = pcb, cbf_cr = pcr;
    if (log2 > 2) {
      if (depth == 0 || pcb) cbf_cb = dcd(CTX_cbf_chroma, depth);
      if (depth == 0 || pcr) cbf_cr = dcd(CTX_cbf_chroma, depth);
    }
    if (split) {
      int half = 1 << (log2 - 1);
      const int off[4][2] = {{0, 0}, {half, 0}, {0, half}, {half, half}};
      for (int i = 0; i < 4; ++i)
        transform_tree(x0 + off[i][0], y0 + off[i][1], x0, y0, log2 - 1,
                       depth + 1, i, cbf_cb, cbf_cr);
      return;
    }
    int cbf_luma;
    if (cu_is_intra || depth != 0 || cbf_cb || cbf_cr)
      cbf_luma = dcd(CTX_cbf_luma, depth == 0 ? 1 : 0);
    else
      cbf_luma = 1;  // inter root with no chroma cbf: inferred
    transform_unit(x0, y0, x_base, y_base, log2, depth, blk_idx, cbf_luma,
                   cbf_cb, cbf_cr);
  }

  // -- transform unit (h265_ref.py _transform_unit) ------------------------

  void transform_unit(int x0, int y0, int x_base, int y_base, int log2,
                      int depth, int blk_idx, int cbf_l, int cbf_cb,
                      int cbf_cr) {
    (void)depth;
    int size = 1 << log2;
    if ((cbf_l || cbf_cb || cbf_cr) && pps->cu_qp_delta_enabled &&
        !is_delta_coded) {
      int pre = dcd(CTX_cu_qp_delta_abs, 0);
      int val = pre;
      if (pre) {
        while (val < 5 && dcd(CTX_cu_qp_delta_abs, 1)) ++val;
        if (val == 5) val = 5 + c.eg_bypass(0);
        if (val > 90) throw DecodeError("bad cu_qp_delta");
        if (c.bypass()) val = -val;
      }
      delta_val = val;
      is_delta_coded = true;
      has_cur_cu_qp = false;
    }
    bool intra = cu_is_intra;
    int bd = sps->bit_depth;
    int qbd = 6 * (bd - 8);
    int mx = (1 << bd) - 1;
    // luma: predict (intra) or take the MC output, add residual.
    // Inter blocks without a coded residual keep the MC output as-is
    // (already in range): no copy needed.
    int mode = -1;
    if (intra || cbf_l) {
      int32_t pred[64 * 64];
      if (intra) {
        mode = pu_mode(x0, y0);
        auto av = [this](int x, int y) { return sample_avail_luma(x, y); };
        intra_predict(pic->Y.data(), pic->wp, sps->width, sps->height, x0,
                      y0, size, mode, 0, av,
                      sps->strong_intra_smoothing != 0, bd, pred);
      } else {
        for (int y = 0; y < size; ++y)
          for (int x = 0; x < size; ++x)
            pred[y * size + x] =
                pic->Y[(size_t)(y0 + y) * pic->wp + x0 + x];
      }
      if (cbf_l) {
        int32_t coef[32 * 32];
        bool ts = false;
        int nzw, nzh;
        residual_coding(log2, 0, intra ? mode : -1, coef, &ts, &nzw, &nzh);
        int32_t res[32 * 32];
        residual_from_coeffs(coef, cu_qp() + qbd, log2,
                             intra && log2 == 2, ts, cu_bypass, bd, nzw,
                             nzh, scaling_m(log2, 0, intra), res);
        for (int i = 0; i < size * size; ++i) pred[i] += res[i];
      }
      for (int y = 0; y < size; ++y)
        for (int x = 0; x < size; ++x)
          pic->Y[(size_t)(y0 + y) * pic->wp + x0 + x] =
              (uint16_t)clamp_i(pred[y * size + x], 0, mx);
    }
    if (intra) grid_fill_u8(pic->avail, x0, y0, size, 1);
    grid_fill_u8(pic->nnz, x0, y0, size, cbf_l ? 1 : 0);
    for (int gy = y0 >> 2; gy < (y0 + size) >> 2; ++gy)
      pic->tu_edge_v[pic->gi(gy, x0 >> 2)] = 1;
    for (int gx = x0 >> 2; gx < (x0 + size) >> 2; ++gx)
      pic->tu_edge_h[pic->gi(y0 >> 2, gx)] = 1;
    // chroma at this node (size>4) or at the last 4x4 luma (blk_idx 3)
    int cx, cy, clog2;
    if (log2 > 2) {
      cx = x0 >> 1;
      cy = y0 >> 1;
      clog2 = log2 - 1;
    } else if (blk_idx == 3) {
      cx = x_base >> 1;
      cy = y_base >> 1;
      clog2 = 2;
    } else {
      return;
    }
    int csize = 1 << clog2;
    int qpy = cu_qp();
    uint16_t* planes[2] = {pic->U.data(), pic->V.data()};
    int cbfs[2] = {cbf_cb, cbf_cr};
    int offsets[2] = {pps->cb_qp_offset + h->cb_qp_offset,
                      pps->cr_qp_offset + h->cr_qp_offset};
    for (int k = 0; k < 2; ++k) {
      int c_idx = k + 1;
      uint16_t* plane = planes[k];
      int cbf = cbfs[k];
      if (!cbf && !intra) continue;  // MC output stays as-is
      int32_t predc[32 * 32];
      int cmode = -1;
      if (intra) {
        cmode = cu_chroma_mode;
        auto av = [this](int x, int y) { return sample_avail_chroma(x, y); };
        intra_predict(plane, pic->cw, sps->width >> 1, sps->height >> 1, cx,
                      cy, csize, cmode, c_idx, av, false, bd, predc);
      } else {
        for (int y = 0; y < csize; ++y)
          for (int x = 0; x < csize; ++x)
            predc[y * csize + x] = plane[(size_t)(cy + y) * pic->cw + cx + x];
      }
      if (cbf) {
        int32_t coef[32 * 32];
        bool ts = false;
        int nzw, nzh;
        residual_coding(clog2, c_idx, intra ? cmode : -1, coef, &ts, &nzw,
                        &nzh);
        int qpi = clamp_i(qpy + offsets[k], -qbd, 57);
        int qpc = qpi < 0 ? qpi : kChromaQpMap[qpi];
        int32_t res[32 * 32];
        residual_from_coeffs(coef, qpc + qbd, clog2, false, ts, cu_bypass,
                             bd, nzw, nzh, scaling_m(clog2, c_idx, intra),
                             res);
        for (int i = 0; i < csize * csize; ++i) predc[i] += res[i];
      }
      if (cbf || intra)
        for (int y = 0; y < csize; ++y)
          for (int x = 0; x < csize; ++x)
            plane[(size_t)(cy + y) * pic->cw + cx + x] =
                (uint16_t)clamp_i(predc[y * csize + x], 0, mx);
    }
  }

  // -- residual coding (7.3.8.11; h265_ref.py _residual_coding) ------------

  // coeff_abs_level_remaining (9.3.3.9), bypass bins
  // ScalingFactor matrix for this TB, or nullptr when lists are off
  // (8.6.3 m[x][y]; Table 7-4 matrixId)
  const int32_t* scaling_m(int log2, int c_idx, bool intra) const {
    const ScalingFactors* sf = pps->scaling_factors.get();
    if (!sf) return nullptr;
    int size_id = log2 - 2;
    int mid = size_id == 3 ? (intra ? 0 : 1)
                           : (intra ? 0 : 3) + c_idx;
    return sf->m[size_id][mid].data();
  }

  int coeff_remaining(int rice) {
    int prefix = 0;
    while (prefix < 32 && c.bypass()) ++prefix;
    if (prefix <= 3) return (prefix << rice) + c.bypass_bits(rice);
    if (prefix - 3 + rice > 30) throw DecodeError("bad coeff remaining");
    return ((((1 << (prefix - 3)) + 3 - 1)) << rice) +
           c.bypass_bits(prefix - 3 + rice);
  }

  void residual_coding(int log2, int c_idx, int pred_mode, int32_t* coef,
                       bool* ts_out, int* nzw, int* nzh) {
    int size = 1 << log2;
    *nzw = *nzh = 0;
    // coefficient writes are collected and scattered at the end so only
    // the nonzero bounding rect needs zero-filling (the transform reads
    // nothing beyond it); transquant-bypass copies the whole block, so
    // it keeps the full clear
    int16_t w_pos[32 * 32];
    int32_t w_val[32 * 32];
    int n_w = 0;
    if (cu_bypass) std::memset(coef, 0, sizeof(int32_t) * size * size);
    bool ts = false;
    if (pps->transform_skip_enabled && !cu_bypass && log2 == 2)
      ts = dcd(CTX_transform_skip_flag, c_idx == 0 ? 0 : 1) != 0;
    *ts_out = ts;
    // scan selection (mode-dependent for small intra TBs)
    int scan_idx = 0;
    if (pred_mode >= 0 && (log2 == 2 || (log2 == 3 && c_idx == 0))) {
      if (pred_mode >= 6 && pred_mode <= 14)
        scan_idx = 2;
      else if (pred_mode >= 22 && pred_mode <= 30)
        scan_idx = 1;
    }
    // last significant coefficient position
    int cmax = (log2 << 1) - 1;
    int coff, cshift;
    if (c_idx == 0) {
      coff = 3 * (log2 - 2) + ((log2 - 1) >> 2);
      cshift = (log2 + 1) >> 2;
    } else {
      coff = 15;
      cshift = log2 - 2;
    }
    int lx = 0;
    while (lx < cmax &&
           dcd(CTX_last_sig_coeff_x_prefix, coff + (lx >> cshift)))
      ++lx;
    int ly = 0;
    while (ly < cmax &&
           dcd(CTX_last_sig_coeff_y_prefix, coff + (ly >> cshift)))
      ++ly;
    if (lx > 3) {
      int nbits = (lx >> 1) - 1;
      lx = (1 << nbits) * (2 + (lx & 1)) + c.bypass_bits(nbits);
    }
    if (ly > 3) {
      int nbits = (ly >> 1) - 1;
      ly = (1 << nbits) * (2 + (ly & 1)) + c.bypass_bits(nbits);
    }
    if (scan_idx == 2) std::swap(lx, ly);
    int log2sb = log2 - 2;
    // sub-block scan (1x1 grid when log2sb == 0)
    int sbw = 1 << log2sb;
    const uint8_t* in_scan = kScan[scan_idx][2];
    int last_sb, last_pos;
    if (log2sb == 0) {
      last_sb = 0;
      last_pos = g_scan_pos[scan_idx][2][((ly & 3) << 2) + (lx & 3)];
    } else {
      last_sb = g_scan_pos[scan_idx][log2sb]
                          [((ly >> 2) << log2sb) + (lx >> 2)];
      last_pos = g_scan_pos[scan_idx][2][((ly & 3) << 2) + (lx & 3)];
    }
    uint8_t csbf[8 * 8] = {0};
    bool sdh = pps->sign_data_hiding && !cu_bypass;
    // base offset of the position-dependent significance context
    // (everything except the in-subblock pattern; (xs||ys) adds 3 for
    // luma, folded in per sub-block below)
    int sig_base0 = c_idx == 0 ? (log2 == 3 ? (scan_idx == 0 ? 9 : 15) : 21)
                               : (log2 == 3 ? 9 : 12);
    bool prev_c1_zero = false;
    for (int i = last_sb; i >= 0; --i) {
      int xs, ys;
      if (log2sb == 0) {
        xs = ys = 0;
      } else {
        xs = kScan[scan_idx][log2sb][2 * i];
        ys = kScan[scan_idx][log2sb][2 * i + 1];
      }
      int sb_coded;
      bool infer_dc;
      if (i == last_sb || i == 0) {
        sb_coded = 1;
        infer_dc = false;
      } else {
        int inc = ((xs + 1 < sbw && csbf[ys * sbw + xs + 1]) ||
                   (ys + 1 < sbw && csbf[(ys + 1) * sbw + xs]))
                      ? 1
                      : 0;
        sb_coded = dcd(CTX_coded_sub_block_flag, inc + (c_idx ? 2 : 0));
        infer_dc = true;
      }
      csbf[ys * sbw + xs] = (uint8_t)(sb_coded != 0);
      if (!sb_coded) continue;
      int sig_base = sig_base0 + ((c_idx == 0 && (xs || ys)) ? 3 : 0);
      // significance flags: scan positions n with sig==1, parse order
      int sig_pos[16];
      int n_sig = 0;
      int start_n = i == last_sb ? last_pos - 1 : 15;
      if (i == last_sb) sig_pos[n_sig++] = last_pos;
      for (int n = start_n; n >= 0; --n) {
        if (n == 0 && infer_dc) {
          sig_pos[n_sig++] = 0;
          break;
        }
        int xp = in_scan[2 * n], yp = in_scan[2 * n + 1];
        int xc = (xs << 2) + xp, yc = (ys << 2) + yp;
        int sctx;
        if (log2 == 2) {
          sctx = kSigCtxMap4x4[(yc << 2) + xc];
        } else if (xc + yc == 0) {
          sctx = 0;
        } else {
          bool right = xs + 1 < sbw && csbf[ys * sbw + xs + 1];
          bool below = ys + 1 < sbw && csbf[(ys + 1) * sbw + xs];
          int prev = (right ? 1 : 0) | (below ? 2 : 0);
          sctx = kSigCtxPos[prev][(yp << 2) + xp] + sig_base;
        }
        int inc = c_idx == 0 ? sctx : 27 + sctx;
        if (dcd(CTX_sig_coeff_flag, inc)) {
          sig_pos[n_sig++] = n;
          infer_dc = false;
        }
      }
      if (!n_sig) continue;
      // greater1 / greater2
      int ctx_set = (i == 0 || c_idx > 0) ? 0 : 2;
      if (prev_c1_zero) ++ctx_set;
      int base1 = (c_idx == 0 ? 0 : 16) + 4 * ctx_set;
      int c1 = 1;
      int gt1[16] = {0};
      int n_g1 = std::min(n_sig, 8);
      for (int j = 0; j < n_g1; ++j) {
        int b = dcd(CTX_coeff_abs_level_greater1_flag,
                    base1 + std::min(c1, 3));
        gt1[j] = b;
        if (b)
          c1 = 0;
        else if (c1 > 0 && c1 < 3)
          ++c1;
      }
      prev_c1_zero = (c1 == 0);
      int gt2_j = -1, gt2_val = 0;
      for (int j = 0; j < n_g1; ++j)
        if (gt1[j]) {
          gt2_j = j;
          break;
        }
      if (gt2_j >= 0)
        gt2_val = dcd(CTX_coeff_abs_level_greater2_flag,
                      (c_idx == 0 ? 0 : 4) + ctx_set);
      // signs (parse order, last one maybe hidden)
      int first_scan = sig_pos[n_sig - 1];
      int last_scan = sig_pos[0];
      bool hidden = sdh && (last_scan - first_scan) > 3;
      int signs[16] = {0};
      int n_signs = hidden ? n_sig - 1 : n_sig;
      for (int j = 0; j < n_signs; ++j) signs[j] = c.bypass();
      // remaining levels
      int rice = 0;
      int levels[16];
      for (int j = 0; j < n_sig; ++j) {
        int g1 = j < 8 ? gt1[j] : 0;
        int g2 = j == gt2_j ? gt2_val : 0;
        int base = 1 + g1 + g2;
        int cap = j >= 8 ? 1 : (j == gt2_j ? 3 : 2);
        int lvl = base;
        if (base == cap) {
          int rem = coeff_remaining(rice);
          lvl = base + rem;
          if (lvl > (3 << rice)) rice = std::min(rice + 1, 4);
        }
        levels[j] = lvl;
      }
      if (hidden) {
        int total = 0;
        for (int j = 0; j < n_sig; ++j) total += levels[j];
        signs[n_sig - 1] = total & 1;
      }
      for (int j = 0; j < n_sig; ++j) {
        int n = sig_pos[j];
        int xp = in_scan[2 * n], yp = in_scan[2 * n + 1];
        int v = signs[j] ? -levels[j] : levels[j];
        int xc2 = (xs << 2) + xp, yc2 = (ys << 2) + yp;
        w_pos[n_w] = (int16_t)(yc2 * size + xc2);
        w_val[n_w++] = v;
        if (xc2 > *nzw) *nzw = xc2;
        if (yc2 > *nzh) *nzh = yc2;
      }
    }
    if (!cu_bypass) {
      // the bounding rect is tiny for most TUs (nzw+1 is 1-4 for
      // sparse blocks); fixed-size memsets inline to stores — the
      // variable-size form was ~23M sub-16-byte libc calls per 4K
      // second, ~10% of decode time in call overhead
      const int nz = *nzw + 1;
      for (int y = 0; y <= *nzh; ++y) {
        int32_t* row = coef + y * size;
        switch (nz) {
          case 1: std::memset(row, 0, 4); break;
          case 2: std::memset(row, 0, 8); break;
          case 3: std::memset(row, 0, 12); break;
          case 4: std::memset(row, 0, 16); break;
          case 5: std::memset(row, 0, 20); break;
          case 6: std::memset(row, 0, 24); break;
          case 7: std::memset(row, 0, 28); break;
          case 8: std::memset(row, 0, 32); break;
          case 12: std::memset(row, 0, 48); break;
          case 16: std::memset(row, 0, 64); break;
          default: std::memset(row, 0, sizeof(int32_t) * nz);
        }
      }
    }
    for (int j = 0; j < n_w; ++j) coef[w_pos[j]] = w_val[j];
  }

  // inter path defined below
  void cu_inter(int x0, int y0, int log2, int depth);
  int part_mode_inter(int log2);
  bool prediction_unit(int xp, int yp, int w, int hh, int part_idx, int part,
                       bool skip_cu = false);
  int inter_pred_idc(int w, int hh);
  void mvd_coding(int out[2]);
  void store_motion(int xp, int yp, int w, int hh, const bool used[2],
                    const int mvs[2][2], const int ridx[2]);
  void mc_pu(int xp, int yp, int w, int hh, const bool used[2],
             const int mvs[2][2], const int ridx[2]);
  Mot mot_at(int x, int y) const;
  int merge_list(int xp, int yp, int w, int hh, int part_idx, int part,
                 MergeCand* cands);  // returns count (== max_merge)
  bool tmvp(int xp, int yp, int w, int hh, int ref_idx, int list_x,
            int out[2]) const;
  bool col_mv(int x, int y, int ref_idx, int list_x, int out[2]) const;
  void amvp(int xp, int yp, int w, int hh, int list_x, int ref_idx,
            int mvp_flag, int out[2]) const;
  bool amvp_noscale(const Mot* cands, int n, int list_x, int target_poc,
                    int out[2]) const;
  bool amvp_scaled(const Mot* cands, int n, int list_x, int target_poc,
                   bool target_lt,
                   int out[2]) const;
};

}  // namespace h265

namespace h265 {

// ---------------------------------------------------------------------------
// Inter: fractional-sample interpolation (8.5.4.2.2; h265_ref.py
// _mc_luma_14bit/_mc_chroma_14bit). 14-bit intermediates; first filter
// stage shifted by BitDepth-8, second by 6, full-pel by 14-BitDepth.
// ---------------------------------------------------------------------------

// Gather a (w+taps-1) x-extended, clamped window row pointer: when the
// whole access window is inside the picture the raw row is used
// directly; otherwise samples are edge-clamped into `scratch`.
static inline const uint16_t* mc_row(const uint16_t* plane, int stride,
                                     int pw, int ph, int y, int x_lo,
                                     int count, uint16_t* scratch) {
  int yc = clamp_i(y, 0, ph - 1);
  const uint16_t* row = plane + (size_t)yc * stride;
  if (x_lo >= 0 && x_lo + count <= pw) return row + x_lo;
  for (int i = 0; i < count; ++i)
    scratch[i] = row[clamp_i(x_lo + i, 0, pw - 1)];
  return scratch;
}

#if H265_SIMD
// N-tap filter over a uint16 row: out[x] = (sum f[i]*row[x+i]) >> s1 for
// x in [0, w), w >= 8 (row has w+N-1 valid entries via mc_row).  Chunks
// of 8 int32 lanes; the tail chunk back-shifts and recomputes overlap.
template <int N>
static inline void filt_row_u16(const uint16_t* row, const int16_t* f,
                                int w, int s1, int32_t* out) {
  __m256i c[N];
  for (int i = 0; i < N; ++i) c[i] = _mm256_set1_epi32(f[i]);
  const __m128i sh = _mm_cvtsi32_si128(s1);
  int x = 0;
  for (;;) {
    if (x + 8 > w) x = w - 8;
    __m256i acc = _mm256_setzero_si256();
    for (int i = 0; i < N; ++i) {
      __m256i v = _mm256_cvtepu16_epi32(
          _mm_loadu_si128((const __m128i*)(row + x + i)));
      acc = _mm256_add_epi32(acc, _mm256_mullo_epi32(v, c[i]));
    }
    _mm256_storeu_si256((__m256i*)(out + x), _mm256_sra_epi32(acc, sh));
    x += 8;
    if (x >= w) break;
  }
}
// same, filtering vertically over an int32 plane of row stride w
template <int N>
static inline void filt_col_i32(const int32_t* tmp, int w, const int16_t* f,
                                int s1, int32_t* out) {
  __m256i c[N];
  for (int i = 0; i < N; ++i) c[i] = _mm256_set1_epi32(f[i]);
  const __m128i sh = _mm_cvtsi32_si128(s1);
  int x = 0;
  for (;;) {
    if (x + 8 > w) x = w - 8;
    __m256i acc = _mm256_setzero_si256();
    for (int i = 0; i < N; ++i) {
      __m256i v = _mm256_loadu_si256((const __m256i*)(tmp + i * w + x));
      acc = _mm256_add_epi32(acc, _mm256_mullo_epi32(v, c[i]));
    }
    _mm256_storeu_si256((__m256i*)(out + x), _mm256_sra_epi32(acc, sh));
    x += 8;
    if (x >= w) break;
  }
}
// same, vertically over N uint16 row pointers
template <int N>
static inline void filt_col_u16(const uint16_t* const* rows, int w,
                                const int16_t* f, int s1, int32_t* out) {
  __m256i c[N];
  for (int i = 0; i < N; ++i) c[i] = _mm256_set1_epi32(f[i]);
  const __m128i sh = _mm_cvtsi32_si128(s1);
  int x = 0;
  for (;;) {
    if (x + 8 > w) x = w - 8;
    __m256i acc = _mm256_setzero_si256();
    for (int i = 0; i < N; ++i) {
      __m256i v = _mm256_cvtepu16_epi32(
          _mm_loadu_si128((const __m128i*)(rows[i] + x)));
      acc = _mm256_add_epi32(acc, _mm256_mullo_epi32(v, c[i]));
    }
    _mm256_storeu_si256((__m256i*)(out + x), _mm256_sra_epi32(acc, sh));
    x += 8;
    if (x >= w) break;
  }
}
#endif

static void mc_luma_14bit(const uint16_t* plane, int stride, int pw, int ph,
                          int x0, int y0, int w, int h, int mvx, int mvy,
                          int bd, int32_t* out) {
  int xi = x0 + (mvx >> 2);
  int yi = y0 + (mvy >> 2);
  int fx = mvx & 3, fy = mvy & 3;
  int s1 = bd - 8;
  uint16_t scratch[64 + 8];
  if (fx == 0 && fy == 0) {
    for (int y = 0; y < h; ++y) {
      const uint16_t* row =
          mc_row(plane, stride, pw, ph, yi + y, xi, w, scratch);
      for (int x = 0; x < w; ++x)
        out[y * w + x] = (int32_t)row[x] << (14 - bd);
    }
    return;
  }
  if (fx && fy) {
    // horizontal into (h+7) x w temp (>> s1), then vertical (>> 6)
    int32_t tmp[(64 + 7) * 64];
    const int16_t* ftab = kLumaFilter + fx * 8;
    for (int y = 0; y < h + 7; ++y) {
      const uint16_t* row =
          mc_row(plane, stride, pw, ph, yi - 3 + y, xi - 3, w + 7, scratch);
#if H265_SIMD
      if (w >= 8) {
        filt_row_u16<8>(row, ftab, w, s1, tmp + y * w);
        continue;
      }
#endif
      for (int x = 0; x < w; ++x) {
        int acc = 0;
        for (int i = 0; i < 8; ++i) acc += ftab[i] * row[x + i];
        tmp[y * w + x] = acc >> s1;
      }
    }
    const int16_t* fv = kLumaFilter + fy * 8;
    for (int y = 0; y < h; ++y) {
#if H265_SIMD
      if (w >= 8) {
        filt_col_i32<8>(tmp + y * w, w, fv, 6, out + y * w);
        continue;
      }
#endif
      for (int x = 0; x < w; ++x) {
        int acc = 0;
        for (int i = 0; i < 8; ++i) acc += fv[i] * tmp[(y + i) * w + x];
        out[y * w + x] = acc >> 6;
      }
    }
    return;
  }
  if (fx) {
    const int16_t* ftab = kLumaFilter + fx * 8;
    for (int y = 0; y < h; ++y) {
      const uint16_t* row =
          mc_row(plane, stride, pw, ph, yi + y, xi - 3, w + 7, scratch);
#if H265_SIMD
      if (w >= 8) {
        filt_row_u16<8>(row, ftab, w, s1, out + y * w);
        continue;
      }
#endif
      for (int x = 0; x < w; ++x) {
        int acc = 0;
        for (int i = 0; i < 8; ++i) acc += ftab[i] * row[x + i];
        out[y * w + x] = acc >> s1;
      }
    }
    return;
  }
  // fy only
  const int16_t* fv = kLumaFilter + fy * 8;
  const uint16_t* rows[64 + 7];
  uint16_t rowbuf[64 + 7][64 + 8];
  for (int y = 0; y < h + 7; ++y)
    rows[y] = mc_row(plane, stride, pw, ph, yi - 3 + y, xi, w, rowbuf[y]);
  for (int y = 0; y < h; ++y) {
#if H265_SIMD
    if (w >= 8) {
      filt_col_u16<8>(rows + y, w, fv, s1, out + y * w);
      continue;
    }
#endif
    for (int x = 0; x < w; ++x) {
      int acc = 0;
      for (int i = 0; i < 8; ++i) acc += fv[i] * rows[y + i][x];
      out[y * w + x] = acc >> s1;
    }
  }
}

// mv in eighth-chroma units (== the luma quarter-pel value)
static void mc_chroma_14bit(const uint16_t* plane, int stride, int pw,
                            int ph, int x0, int y0, int w, int h, int mvx,
                            int mvy, int bd, int32_t* out) {
  int xi = x0 + (mvx >> 3);
  int yi = y0 + (mvy >> 3);
  int fx = mvx & 7, fy = mvy & 7;
  int s1 = bd - 8;
  uint16_t scratch[32 + 4];
  if (fx == 0 && fy == 0) {
    for (int y = 0; y < h; ++y) {
      const uint16_t* row =
          mc_row(plane, stride, pw, ph, yi + y, xi, w, scratch);
      for (int x = 0; x < w; ++x)
        out[y * w + x] = (int32_t)row[x] << (14 - bd);
    }
    return;
  }
  if (fx && fy) {
    int32_t tmp[(32 + 3) * 32];
    const int16_t* ftab = kChromaFilter + fx * 4;
    for (int y = 0; y < h + 3; ++y) {
      const uint16_t* row =
          mc_row(plane, stride, pw, ph, yi - 1 + y, xi - 1, w + 3, scratch);
#if H265_SIMD
      if (w >= 8) {
        filt_row_u16<4>(row, ftab, w, s1, tmp + y * w);
        continue;
      }
#endif
      for (int x = 0; x < w; ++x) {
        int acc = 0;
        for (int i = 0; i < 4; ++i) acc += ftab[i] * row[x + i];
        tmp[y * w + x] = acc >> s1;
      }
    }
    const int16_t* fv = kChromaFilter + fy * 4;
    for (int y = 0; y < h; ++y) {
#if H265_SIMD
      if (w >= 8) {
        filt_col_i32<4>(tmp + y * w, w, fv, 6, out + y * w);
        continue;
      }
#endif
      for (int x = 0; x < w; ++x) {
        int acc = 0;
        for (int i = 0; i < 4; ++i) acc += fv[i] * tmp[(y + i) * w + x];
        out[y * w + x] = acc >> 6;
      }
    }
    return;
  }
  if (fx) {
    const int16_t* ftab = kChromaFilter + fx * 4;
    for (int y = 0; y < h; ++y) {
      const uint16_t* row =
          mc_row(plane, stride, pw, ph, yi + y, xi - 1, w + 3, scratch);
#if H265_SIMD
      if (w >= 8) {
        filt_row_u16<4>(row, ftab, w, s1, out + y * w);
        continue;
      }
#endif
      for (int x = 0; x < w; ++x) {
        int acc = 0;
        for (int i = 0; i < 4; ++i) acc += ftab[i] * row[x + i];
        out[y * w + x] = acc >> s1;
      }
    }
    return;
  }
  const int16_t* fv = kChromaFilter + fy * 4;
  const uint16_t* rows[32 + 3];
  uint16_t rowbuf[32 + 3][32 + 4];
  for (int y = 0; y < h + 3; ++y)
    rows[y] = mc_row(plane, stride, pw, ph, yi - 1 + y, xi, w, rowbuf[y]);
  for (int y = 0; y < h; ++y) {
#if H265_SIMD
    if (w >= 8) {
      filt_col_u16<4>(rows + y, w, fv, s1, out + y * w);
      continue;
    }
#endif
    for (int x = 0; x < w; ++x) {
      int acc = 0;
      for (int i = 0; i < 4; ++i) acc += fv[i] * rows[y + i][x];
      out[y * w + x] = acc >> s1;
    }
  }
}

// 8.5.4.2.2 default / 8.5.4.2.3 explicit weighted prediction
// (h265_ref.py _weighted_uni/_weighted_bi). wp = {w, o, log2wd} or null.
struct Wp {
  bool present;
  int w, o, log2wd;
};

#if H265_SIMD
// clamp 8 int32 lanes to [0, mx] and store as 8 uint16
static inline void pack_clamp8_u16(uint16_t* dst, __m256i v, __m256i vmx) {
  v = _mm256_max_epi32(v, _mm256_setzero_si256());
  v = _mm256_min_epi32(v, vmx);
  __m128i p = _mm_packus_epi32(_mm256_castsi256_si128(v),
                               _mm256_extracti128_si256(v, 1));
  _mm_storeu_si128((__m128i*)dst, p);
}
#endif

static void weighted_uni(const int32_t* pred, int n, const Wp& wp, int bd,
                         int w_, int stride_out, uint16_t* out) {
  int mx = (1 << bd) - 1;
  int s1 = 14 - bd;
  int rows = n / w_;
  if (!wp.present) {
    int rnd = 1 << (s1 - 1);
#if H265_SIMD
    if (w_ >= 8) {
      const __m256i vr = _mm256_set1_epi32(rnd);
      const __m256i vmx = _mm256_set1_epi32(mx);
      const __m128i sh = _mm_cvtsi32_si128(s1);
      for (int y = 0; y < rows; ++y) {
        uint16_t* orow = out + (size_t)y * stride_out;
        const int32_t* prow = pred + (size_t)y * w_;
        int x = 0;
        for (;;) {
          if (x + 8 > w_) x = w_ - 8;
          __m256i v = _mm256_sra_epi32(
              _mm256_add_epi32(
                  _mm256_loadu_si256((const __m256i*)(prow + x)), vr),
              sh);
          pack_clamp8_u16(orow + x, v, vmx);
          x += 8;
          if (x >= w_) break;
        }
      }
      return;
    }
#endif
    for (int y = 0; y < rows; ++y)
      for (int x = 0; x < w_; ++x)
        out[(size_t)y * stride_out + x] =
            (uint16_t)clamp_i((pred[y * w_ + x] + rnd) >> s1, 0, mx);
    return;
  }
  int rnd = 1 << (wp.log2wd - 1);
  for (int y = 0; y < rows; ++y)
    for (int x = 0; x < w_; ++x)
      out[(size_t)y * stride_out + x] = (uint16_t)clamp_i(
          ((pred[y * w_ + x] * wp.w + rnd) >> wp.log2wd) + wp.o, 0, mx);
}

static void weighted_bi(const int32_t* p0, const int32_t* p1, int n,
                        const Wp& wp0, const Wp& wp1, int bd, int w_,
                        int stride_out, uint16_t* out) {
  int mx = (1 << bd) - 1;
  int s1 = 14 - bd;
  int rows = n / w_;
  if (!wp0.present) {
    int rnd = 1 << s1;
#if H265_SIMD
    if (w_ >= 8) {
      const __m256i vr = _mm256_set1_epi32(rnd);
      const __m256i vmx = _mm256_set1_epi32(mx);
      const __m128i sh = _mm_cvtsi32_si128(s1 + 1);
      for (int y = 0; y < rows; ++y) {
        uint16_t* orow = out + (size_t)y * stride_out;
        const int32_t* r0 = p0 + (size_t)y * w_;
        const int32_t* r1 = p1 + (size_t)y * w_;
        int x = 0;
        for (;;) {
          if (x + 8 > w_) x = w_ - 8;
          __m256i v = _mm256_add_epi32(
              _mm256_loadu_si256((const __m256i*)(r0 + x)),
              _mm256_loadu_si256((const __m256i*)(r1 + x)));
          v = _mm256_sra_epi32(_mm256_add_epi32(v, vr), sh);
          pack_clamp8_u16(orow + x, v, vmx);
          x += 8;
          if (x >= w_) break;
        }
      }
      return;
    }
#endif
    for (int y = 0; y < rows; ++y)
      for (int x = 0; x < w_; ++x)
        out[(size_t)y * stride_out + x] = (uint16_t)clamp_i(
            (p0[y * w_ + x] + p1[y * w_ + x] + rnd) >> (s1 + 1), 0, mx);
    return;
  }
  for (int y = 0; y < rows; ++y)
    for (int x = 0; x < w_; ++x) {
      int64_t v = (int64_t)p0[y * w_ + x] * wp0.w +
                  (int64_t)p1[y * w_ + x] * wp1.w +
                  ((int64_t)wp0.o + wp1.o + 1) * ((int64_t)1 << wp0.log2wd);
      out[(size_t)y * stride_out + x] =
          (uint16_t)clamp_i((int)(v >> (wp0.log2wd + 1)), 0, mx);
    }
}

// ---------------------------------------------------------------------------
// Inter CU / PU (h265_ref.py _cu_inter.._amvp_scaled)
// ---------------------------------------------------------------------------

void SliceDec::cu_inter(int x0, int y0, int log2, int depth) {
  (void)depth;
  int size = 1 << log2;
  grid_fill_u8(pic->is_intra, x0, y0, size, 0);
  int part = part_mode_inter(log2);
  bool merged_2n = false;
  PuRect rects[4];
  int n_pu = pu_geometry(part, size, rects);
  for (int i = 0; i < n_pu; ++i) {
    bool merged = prediction_unit(x0 + rects[i].dx, y0 + rects[i].dy,
                                  rects[i].w, rects[i].h, i, part);
    mark_pu_edges(x0 + rects[i].dx, y0 + rects[i].dy, rects[i].w,
                  rects[i].h);
    if (part == PART_2Nx2N) merged_2n = merged;
  }
  int root_cbf = 1;
  if (!(part == PART_2Nx2N && merged_2n)) root_cbf = dcd(CTX_rqt_root_cbf);
  if (root_cbf) {
    cu_is_intra = false;
    cu_intra_split = false;
    cu_inter_split =
        sps->max_trafo_depth_inter == 0 && part != PART_2Nx2N;
    transform_tree(x0, y0, x0, y0, log2, 0, 0, 1, 1);
  }
  finish_cu(x0, y0, size);
}

// part_mode binarisation for inter CUs (9.3.3.7 Table 9-34)
int SliceDec::part_mode_inter(int log2) {
  if (dcd(CTX_part_mode, 0)) return PART_2Nx2N;
  bool at_min = log2 == sps->log2_min_cb;
  int b1 = dcd(CTX_part_mode, 1);
  if (!at_min) {
    if (sps->amp_enabled) {
      if (dcd(CTX_part_mode, 3)) return b1 ? PART_2NxN : PART_Nx2N;
      if (b1) return c.bypass() ? PART_2NxnD : PART_2NxnU;
      return c.bypass() ? PART_nRx2N : PART_nLx2N;
    }
    return b1 ? PART_2NxN : PART_Nx2N;
  }
  if (b1) return PART_2NxN;
  if (log2 == 3) return PART_Nx2N;
  return dcd(CTX_part_mode, 2) ? PART_Nx2N : PART_NxN;
}

// prediction_unit (7.3.8.6) + motion derivation + MC; returns merge flag
bool SliceDec::prediction_unit(int xp, int yp, int w, int hh, int part_idx,
                               int part, bool skip_cu) {
  bool merge = true;
  if (!skip_cu) merge = dcd(CTX_merge_flag) != 0;
  bool used[2];
  int mvs[2][2] = {{0, 0}, {0, 0}};
  int ridx[2] = {0, 0};
  if (merge) {
    int idx = 0;
    if (h->max_merge > 1 && dcd(CTX_merge_idx)) {
      idx = 1;
      while (idx < h->max_merge - 1 && c.bypass()) ++idx;
    }
    MergeCand cands[5];
    merge_list(xp, yp, w, hh, part_idx, part, cands);
    used[0] = cands[idx].used[0];
    used[1] = cands[idx].used[1];
    // 8.5.3.2.2: 8x4/4x8 PUs convert bi-predictive merge candidates to
    // uni-L0 (bi-prediction is barred at that size)
    if (w + hh == 12 && used[0] && used[1]) used[1] = false;
    std::memcpy(mvs, cands[idx].mv, sizeof mvs);
    ridx[0] = cands[idx].ridx[0];
    ridx[1] = cands[idx].ridx[1];
  } else {
    int idc = 0;  // PRED_L0
    if (h->slice_type == SLICE_B) idc = inter_pred_idc(w, hh);
    used[0] = idc == 0 || idc == 2;
    used[1] = idc == 1 || idc == 2;
    for (int lx = 0; lx < 2; ++lx) {
      if (!used[lx]) continue;
      int n = h->num_ref[lx];
      if (n > 1) {
        int r = 0;
        if (dcd(CTX_ref_idx, 0)) {
          r = 1;
          if (n > 2 && dcd(CTX_ref_idx, 1)) {
            r = 2;
            while (r < n - 1 && c.bypass()) ++r;
          }
        }
        ridx[lx] = r;
      }
      int mvd[2] = {0, 0};
      if (!(lx == 1 && h->mvd_l1_zero && idc == 2)) mvd_coding(mvd);
      int mvp_flag = dcd(CTX_mvp_flag);
      int mvp[2];
      amvp(xp, yp, w, hh, lx, ridx[lx], mvp_flag, mvp);
      mvs[lx][0] = wrap16(mvp[0] + mvd[0]);
      mvs[lx][1] = wrap16(mvp[1] + mvd[1]);
    }
  }
  store_motion(xp, yp, w, hh, used, mvs, ridx);
  mc_pu(xp, yp, w, hh, used, mvs, ridx);
  return merge;
}

// 9.3.3: 2=BI, 0=L0, 1=L1
int SliceDec::inter_pred_idc(int w, int hh) {
  if (w + hh != 12) {
    if (dcd(CTX_inter_pred_idc, cu_depth)) return 2;
  }
  return dcd(CTX_inter_pred_idc, 4) ? 1 : 0;
}

void SliceDec::mvd_coding(int out[2]) {
  int g0[2], g1[2] = {0, 0};
  g0[0] = dcd(CTX_abs_mvd_greater0_flag);
  g0[1] = dcd(CTX_abs_mvd_greater0_flag);
  for (int k = 0; k < 2; ++k)
    if (g0[k]) g1[k] = dcd(CTX_abs_mvd_greater1_flag);
  out[0] = out[1] = 0;
  for (int k = 0; k < 2; ++k) {
    if (g0[k]) {
      int v = 1;
      if (g1[k]) v = 2 + c.eg_bypass(1);
      if (c.bypass()) v = -v;
      out[k] = v;
    }
  }
}

void SliceDec::store_motion(int xp, int yp, int w, int hh,
                            const bool used[2], const int mvs[2][2],
                            const int ridx[2]) {
  // Branch-hoisted grid fill (this runs per PU over up to 16x16 cells).
  // Unused lanes keep their previous contents — merge pruning compares
  // both lanes of Mot unconditionally, so stale values are observable
  // and must match the oracle's (which also leaves them untouched).
  int pocs[2] = {used[0] ? refs[0][ridx[0]]->poc : 0,
                 used[1] ? refs[1][ridx[1]]->poc : 0};
  const int gy0 = yp >> 2, gy1 = (yp + hh) >> 2;
  const int gx0 = xp >> 2, cnt = w >> 2;
  if (used[0] && used[1]) {
    const int16_t m4[4] = {(int16_t)mvs[0][0], (int16_t)mvs[0][1],
                           (int16_t)mvs[1][0], (int16_t)mvs[1][1]};
    uint64_t mv64;
    std::memcpy(&mv64, m4, 8);
    const int8_t ri2[2] = {(int8_t)ridx[0], (int8_t)ridx[1]};
    uint16_t ri16;
    std::memcpy(&ri16, ri2, 2);
    const int32_t rp2[2] = {pocs[0], pocs[1]};
    uint64_t rp64;
    std::memcpy(&rp64, rp2, 8);
    const uint8_t lt2[2] = {refs_lt[0][ridx[0]], refs_lt[1][ridx[1]]};
    uint16_t lt16;
    std::memcpy(&lt16, lt2, 2);
    // one contiguous sweep per array keeps each row fill inside a
    // single cache stream (the interleaved per-cell form bounced
    // across all seven arrays every 4x4 cell)
    for (int gy = gy0; gy < gy1; ++gy) {
      size_t gi0 = pic->gi(gy, gx0);
      int16_t* mvd = &pic->mv[gi0 * 4];
      for (int i = 0; i < cnt; ++i) std::memcpy(mvd + 4 * i, &mv64, 8);
      std::memset(&pic->mv_used[gi0 * 2], 1, (size_t)cnt * 2);
      int8_t* rid = &pic->ref_idx[gi0 * 2];
      if (ri2[0] == ri2[1]) {
        std::memset(rid, (uint8_t)ri2[0], (size_t)cnt * 2);
      } else {
        for (int i = 0; i < cnt; ++i) std::memcpy(rid + 2 * i, &ri16, 2);
      }
      int32_t* rpd = &pic->ref_poc[gi0 * 2];
      for (int i = 0; i < cnt; ++i) std::memcpy(rpd + 2 * i, &rp64, 8);
      uint8_t* ltd = &pic->ref_lt[gi0 * 2];
      if (lt2[0] == lt2[1]) {
        std::memset(ltd, lt2[0], (size_t)cnt * 2);
      } else {
        for (int i = 0; i < cnt; ++i) std::memcpy(ltd + 2 * i, &lt16, 2);
      }
      std::memset(&pic->is_intra[gi0], 0, cnt);
      std::memset(&pic->decided[gi0], 1, cnt);
    }
  } else {
    const int lx = used[0] ? 0 : 1;
    const int16_t mx = (int16_t)mvs[lx][0], my = (int16_t)mvs[lx][1];
    const int8_t ri = (int8_t)ridx[lx];
    const int32_t rp = pocs[lx];
    const uint8_t lt = refs_lt[lx][ridx[lx]];
    for (int gy = gy0; gy < gy1; ++gy) {
      size_t gi0 = pic->gi(gy, gx0);
      uint8_t* mu = &pic->mv_used[gi0 * 2];
      for (int i = 0; i < cnt; ++i) {
        mu[2 * i + lx] = 1;
        mu[2 * i + (1 - lx)] = 0;
      }
      int16_t* mvd = &pic->mv[gi0 * 4 + lx * 2];
      for (int i = 0; i < cnt; ++i) {
        mvd[4 * i] = mx;
        mvd[4 * i + 1] = my;
      }
      int8_t* rid = &pic->ref_idx[gi0 * 2 + lx];
      for (int i = 0; i < cnt; ++i) rid[2 * i] = ri;
      int32_t* rpd = &pic->ref_poc[gi0 * 2 + lx];
      for (int i = 0; i < cnt; ++i) rpd[2 * i] = rp;
      uint8_t* ltd = &pic->ref_lt[gi0 * 2 + lx];
      for (int i = 0; i < cnt; ++i) ltd[2 * i] = lt;
      std::memset(&pic->is_intra[gi0], 0, cnt);
      std::memset(&pic->decided[gi0], 1, cnt);
    }
  }
}

void SliceDec::mc_pu(int xp, int yp, int w, int hh, const bool used[2],
                     const int mvs[2][2], const int ridx[2]) {
  int bd = sps->bit_depth;
  int obd = bd - 8;  // WpOffsetBdShift: offsets are coded in 8-bit range
  // fast path: uni-prediction, default weights, full-pel in both luma
  // and chroma precision -- the 14-bit staging shifts cancel exactly,
  // so prediction is a clamped block copy from the reference
  if (!h->has_pred_weights && used[0] != used[1]) {
    int lx = used[0] ? 0 : 1;
    int mx = mvs[lx][0], my = mvs[lx][1];
    if ((mx & 7) == 0 && (my & 7) == 0) {
      Frame* ref = refs[lx][ridx[lx]];
      const struct {
        const uint16_t* src;
        uint16_t* dst;
        int stride_s, stride_d, pw, ph, x, y, bw, bh;
      } planes[3] = {
          {ref->Y.data(), pic->Y.data(), ref->wp, pic->wp, sps->width,
           sps->height, xp + (mx >> 2), yp + (my >> 2), w, hh},
          {ref->U.data(), pic->U.data(), ref->cw, pic->cw,
           sps->width >> 1, sps->height >> 1, (xp >> 1) + (mx >> 3),
           (yp >> 1) + (my >> 3), w >> 1, hh >> 1},
          {ref->V.data(), pic->V.data(), ref->cw, pic->cw,
           sps->width >> 1, sps->height >> 1, (xp >> 1) + (mx >> 3),
           (yp >> 1) + (my >> 3), w >> 1, hh >> 1},
      };
      int dx[3] = {xp, xp >> 1, xp >> 1};
      int dy[3] = {yp, yp >> 1, yp >> 1};
      for (int pi = 0; pi < 3; ++pi) {
        auto& p = planes[pi];
        bool interior = p.x >= 0 && p.y >= 0 && p.x + p.bw <= p.pw &&
                        p.y + p.bh <= p.ph;
        for (int y = 0; y < p.bh; ++y) {
          uint16_t* dst =
              p.dst + (size_t)(dy[pi] + y) * p.stride_d + dx[pi];
          if (interior) {
            const uint16_t* src =
                p.src + (size_t)(p.y + y) * p.stride_s + p.x;
            // fixed-size copies inline to vector moves; a libc memcpy
            // call costs more than the copy itself at these row sizes
            switch (p.bw) {
              case 2: std::memcpy(dst, src, 4); break;
              case 4: std::memcpy(dst, src, 8); break;
              case 8: std::memcpy(dst, src, 16); break;
              case 12: std::memcpy(dst, src, 24); break;
              case 16: std::memcpy(dst, src, 32); break;
              case 24: std::memcpy(dst, src, 48); break;
              case 32: std::memcpy(dst, src, 64); break;
              case 48: std::memcpy(dst, src, 96); break;
              case 64: std::memcpy(dst, src, 128); break;
              default: std::memcpy(dst, src, sizeof(uint16_t) * p.bw);
            }
          } else {
            const uint16_t* row =
                p.src + (size_t)clamp_i(p.y + y, 0, p.ph - 1) * p.stride_s;
            for (int x = 0; x < p.bw; ++x)
              dst[x] = row[clamp_i(p.x + x, 0, p.pw - 1)];
          }
        }
      }
      return;
    }
  }
  // fast path: default-weight BI prediction, full-pel both lists —
  // the 14-bit staging cancels exactly into (p0 + p1 + 1) >> 1 on the
  // reference samples, so prediction is a clamped averaging copy
  if (!h->has_pred_weights && used[0] && used[1] &&
      ((mvs[0][0] | mvs[0][1] | mvs[1][0] | mvs[1][1]) & 7) == 0) {
    for (int pi = 0; pi < 3; ++pi) {
      int sh = pi == 0 ? 0 : 1;
      int pw = sps->width >> sh, phh = sps->height >> sh;
      int bw = w >> sh, bhh = hh >> sh;
      int dxp = xp >> sh, dyp = yp >> sh;
      const Frame* r0 = refs[0][ridx[0]];
      const Frame* r1 = refs[1][ridx[1]];
      const uint16_t* s0 = pi == 0 ? r0->Y.data()
                                   : (pi == 1 ? r0->U.data() : r0->V.data());
      const uint16_t* s1 = pi == 0 ? r1->Y.data()
                                   : (pi == 1 ? r1->U.data() : r1->V.data());
      int st0 = pi == 0 ? r0->wp : r0->cw;
      int st1 = pi == 0 ? r1->wp : r1->cw;
      uint16_t* dplane = pi == 0 ? pic->Y.data()
                                 : (pi == 1 ? pic->U.data() : pic->V.data());
      int std_ = pi == 0 ? pic->wp : pic->cw;
      int x0 = dxp + (mvs[0][0] >> (2 + sh));
      int y0 = dyp + (mvs[0][1] >> (2 + sh));
      int x1 = dxp + (mvs[1][0] >> (2 + sh));
      int y1 = dyp + (mvs[1][1] >> (2 + sh));
      bool in0 = x0 >= 0 && y0 >= 0 && x0 + bw <= pw && y0 + bhh <= phh;
      bool in1 = x1 >= 0 && y1 >= 0 && x1 + bw <= pw && y1 + bhh <= phh;
      uint16_t rbuf0[64], rbuf1[64];
      for (int y = 0; y < bhh; ++y) {
        const uint16_t* p0;
        const uint16_t* p1;
        if (in0) {
          p0 = s0 + (size_t)(y0 + y) * st0 + x0;
        } else {
          const uint16_t* row =
              s0 + (size_t)clamp_i(y0 + y, 0, phh - 1) * st0;
          for (int x = 0; x < bw; ++x)
            rbuf0[x] = row[clamp_i(x0 + x, 0, pw - 1)];
          p0 = rbuf0;
        }
        if (in1) {
          p1 = s1 + (size_t)(y1 + y) * st1 + x1;
        } else {
          const uint16_t* row =
              s1 + (size_t)clamp_i(y1 + y, 0, phh - 1) * st1;
          for (int x = 0; x < bw; ++x)
            rbuf1[x] = row[clamp_i(x1 + x, 0, pw - 1)];
          p1 = rbuf1;
        }
        uint16_t* dst = dplane + (size_t)(dyp + y) * std_ + dxp;
        int x = 0;
#if H265_SIMD
        for (; x + 16 <= bw; x += 16)
          _mm256_storeu_si256(
              (__m256i*)(dst + x),
              _mm256_avg_epu16(
                  _mm256_loadu_si256((const __m256i*)(p0 + x)),
                  _mm256_loadu_si256((const __m256i*)(p1 + x))));
        for (; x + 8 <= bw; x += 8)
          _mm_storeu_si128(
              (__m128i*)(dst + x),
              _mm_avg_epu16(_mm_loadu_si128((const __m128i*)(p0 + x)),
                            _mm_loadu_si128((const __m128i*)(p1 + x))));
#endif
        for (; x < bw; ++x)
          dst[x] = (uint16_t)((p0[x] + p1[x] + 1) >> 1);
      }
    }
    return;
  }
  // static per-PU prediction buffers (max PU 64x64)
  static thread_local int32_t predbuf[2][3][64 * 64];
  int32_t (*pred)[3][64 * 64] = predbuf;
  Wp wps[2][3];
  int n_used = 0;
  int first_lx = -1;
  for (int lx = 0; lx < 2; ++lx) {
    if (!used[lx]) continue;
    ++n_used;
    if (first_lx < 0) first_lx = lx;
    Frame* ref = refs[lx][ridx[lx]];
    int mx = mvs[lx][0], my = mvs[lx][1];
    mc_luma_14bit(ref->Y.data(), ref->wp, sps->width, sps->height, xp, yp, w,
                  hh, mx, my, bd, pred[lx][0]);
    mc_chroma_14bit(ref->U.data(), ref->cw, sps->width >> 1,
                    sps->height >> 1, xp >> 1, yp >> 1, w >> 1, hh >> 1, mx,
                    my, bd, pred[lx][1]);
    mc_chroma_14bit(ref->V.data(), ref->cw, sps->width >> 1,
                    sps->height >> 1, xp >> 1, yp >> 1, w >> 1, hh >> 1, mx,
                    my, bd, pred[lx][2]);
    if (h->has_pred_weights) {
      const WeightEnt& e = h->pred_weights[lx][ridx[lx]];
      int osc = 1 << obd;
      wps[lx][0] = {true, e.wy, e.oy * osc, h->luma_log2 + 14 - bd};
      wps[lx][1] = {true, e.wcb, e.ocb * osc, h->chroma_log2 + 14 - bd};
      wps[lx][2] = {true, e.wcr, e.ocr * osc, h->chroma_log2 + 14 - bd};
    } else {
      for (int pi = 0; pi < 3; ++pi) wps[lx][pi] = {false, 0, 0, 0};
    }
  }
  for (int pi = 0; pi < 3; ++pi) {
    int sh = pi == 0 ? 0 : 1;
    int xx = xp >> sh, yy = yp >> sh;
    int ww = w >> sh, hh2 = hh >> sh;
    uint16_t* plane = pi == 0 ? pic->Y.data()
                              : (pi == 1 ? pic->U.data() : pic->V.data());
    int stride = pi == 0 ? pic->wp : pic->cw;
    uint16_t* dst = plane + (size_t)yy * stride + xx;
    if (n_used == 1)
      weighted_uni(pred[first_lx][pi], ww * hh2, wps[first_lx][pi], bd, ww,
                   stride, dst);
    else
      weighted_bi(pred[0][pi], pred[1][pi], ww * hh2, wps[0][pi],
                  wps[1][pi], bd, ww, stride, dst);
  }
}

// motion of the block covering luma (x,y) (6.4.2 + 8.5.3)
Mot SliceDec::mot_at(int x, int y) const {
  Mot m;
  if (!zavail(x, y, true)) return m;
  int gi = pic->gi(y >> 2, x >> 2);
  if (pic->is_intra[gi]) return m;
  m.valid = true;
  for (int lx = 0; lx < 2; ++lx) {
    m.used[lx] = pic->mv_used[gi * 2 + lx] != 0;
    m.mv[lx][0] = pic->mv[gi * 4 + lx * 2 + 0];
    m.mv[lx][1] = pic->mv[gi * 4 + lx * 2 + 1];
    m.ridx[lx] = pic->ref_idx[gi * 2 + lx];
  }
  return m;
}

// 8.5.3.2.3 merge candidate list (always MaxNumMergeCand long)
int SliceDec::merge_list(int xp, int yp, int w, int hh, int part_idx,
                         int part, MergeCand* out) {
  int plevel = pps->log2_parallel_merge_level;
  auto fetch = [&](int nx, int ny) -> Mot {
    if (nx < 0 || ny < 0) return Mot();
    if ((xp >> plevel) == (nx >> plevel) && (yp >> plevel) == (ny >> plevel))
      return Mot();
    return mot_at(nx, ny);
  };
  // pruning compares against the *fetched* neighbour motion, even when
  // that neighbour itself was pruned from the list (8.5.3.2.3)
  Mot a1, b1;
  if (!(part_idx == 1 &&
        (part == PART_Nx2N || part == PART_nLx2N || part == PART_nRx2N)))
    a1 = fetch(xp - 1, yp + hh - 1);
  if (!(part_idx == 1 &&
        (part == PART_2NxN || part == PART_2NxnU || part == PART_2NxnD)))
    b1 = fetch(xp + w - 1, yp - 1);
  Mot b0 = fetch(xp + w, yp - 1);
  Mot a0 = fetch(xp - 1, yp + hh);
  Mot cands[5];
  int n = 0;
  auto push = [&](const Mot& m) {
    cands[n++] = m;
  };
  if (a1.valid) push(a1);
  if (b1.valid && b1 != a1) push(b1);
  if (b0.valid && b0 != b1) push(b0);
  if (a0.valid && a0 != a1) push(a0);
  if (n < 4) {
    Mot b2 = fetch(xp - 1, yp - 1);
    if (b2.valid && b2 != a1 && b2 != b1) push(b2);
  }
  int maxm = h->max_merge;
  if (h->temporal_mvp && n < maxm) {
    int tm[2][2] = {{0, 0}, {0, 0}};
    bool tu[2] = {false, false};
    int nlists = h->slice_type == SLICE_B ? 2 : 1;
    for (int lx = 0; lx < nlists; ++lx) {
      int mv[2];
      if (tmvp(xp, yp, w, hh, 0, lx, mv)) {
        tm[lx][0] = mv[0];
        tm[lx][1] = mv[1];
        tu[lx] = true;
      }
    }
    if (tu[0] || tu[1]) {
      Mot m;
      m.valid = true;
      m.used[0] = tu[0];
      m.used[1] = tu[1];
      std::memcpy(m.mv, tm, sizeof tm);
      push(m);
    }
  }
  // convert to MergeCand list
  MergeCand list[5];
  int nl = 0;
  for (int i = 0; i < n && nl < maxm; ++i) {
    MergeCand mc;
    mc.used[0] = cands[i].used[0];
    mc.used[1] = cands[i].used[1];
    std::memcpy(mc.mv, cands[i].mv, sizeof mc.mv);
    mc.ridx[0] = cands[i].ridx[0];
    mc.ridx[1] = cands[i].ridx[1];
    list[nl++] = mc;
  }
  // combined bi-predictive candidates (B slices)
  if (h->slice_type == SLICE_B && nl > 1 && nl < maxm) {
    static const int order[12][2] = {{0, 1}, {1, 0}, {0, 2}, {2, 0},
                                     {1, 2}, {2, 1}, {0, 3}, {3, 0},
                                     {1, 3}, {3, 1}, {2, 3}, {3, 2}};
    int base_n = nl;
    for (auto& ij : order) {
      if (nl >= maxm) break;
      int i = ij[0], j = ij[1];
      if (i >= base_n || j >= base_n) break;
      const MergeCand& c0 = list[i];
      const MergeCand& c1 = list[j];
      if (!(c0.used[0] && c1.used[1])) continue;
      int r0 = refs[0][c0.ridx[0]]->poc;
      int r1 = refs[1][c1.ridx[1]]->poc;
      if (r0 == r1 && c0.mv[0][0] == c1.mv[1][0] &&
          c0.mv[0][1] == c1.mv[1][1])
        continue;
      MergeCand mc;
      mc.used[0] = mc.used[1] = true;
      mc.mv[0][0] = c0.mv[0][0];
      mc.mv[0][1] = c0.mv[0][1];
      mc.mv[1][0] = c1.mv[1][0];
      mc.mv[1][1] = c1.mv[1][1];
      mc.ridx[0] = c0.ridx[0];
      mc.ridx[1] = c1.ridx[1];
      list[nl++] = mc;
    }
  }
  // zero-motion fill
  int nref = h->slice_type == SLICE_B
                 ? std::min(h->num_ref[0], h->num_ref[1])
                 : h->num_ref[0];
  int zi = 0;
  while (nl < maxm) {
    int r = zi < nref ? zi : 0;
    MergeCand mc;
    mc.used[0] = true;
    mc.used[1] = h->slice_type == SLICE_B;
    std::memset(mc.mv, 0, sizeof mc.mv);
    mc.ridx[0] = r;
    mc.ridx[1] = h->slice_type == SLICE_B ? r : 0;
    list[nl++] = mc;
    ++zi;
  }
  std::memcpy(out, list, sizeof(MergeCand) * nl);
  return nl;
}

// 8.5.3.2.8 temporal MV candidate
bool SliceDec::tmvp(int xp, int yp, int w, int hh, int ref_idx, int list_x,
                    int out[2]) const {
  if (!col_pic) return false;
  int xbr = xp + w, ybr = yp + hh;
  if ((ybr >> sps->log2_ctb) == (yp >> sps->log2_ctb) && ybr < sps->height &&
      xbr < sps->width) {
    if (col_mv((xbr >> 4) << 4, (ybr >> 4) << 4, ref_idx, list_x, out))
      return true;
  }
  int xc = xp + (w >> 1), yc = yp + (hh >> 1);
  return col_mv((xc >> 4) << 4, (yc >> 4) << 4, ref_idx, list_x, out);
}

bool SliceDec::col_mv(int x, int y, int ref_idx, int list_x,
                      int out[2]) const {
  const Frame* col = col_pic;
  int gi = col->gi(y >> 2, x >> 2);
  if (col->is_intra[gi]) return false;
  bool u0 = col->mv_used[gi * 2] != 0, u1 = col->mv_used[gi * 2 + 1] != 0;
  if (!u0 && !u1) return false;
  int n;
  if (!u0)
    n = 1;
  else if (!u1)
    n = 0;
  else if (no_backward)
    n = list_x;
  else
    n = h->collocated_from_l0;
  // 8.5.3.2.9: the candidate exists only when the collocated ref and
  // the target agree on long-term-ness; long-term MVs are never
  // POC-scaled
  bool col_lt = col->ref_lt[gi * 2 + n] != 0;
  bool targ_lt = refs_lt[list_x][ref_idx] != 0;
  if (col_lt != targ_lt) return false;
  int mvc[2] = {col->mv[gi * 4 + n * 2], col->mv[gi * 4 + n * 2 + 1]};
  if (targ_lt) {
    out[0] = mvc[0];
    out[1] = mvc[1];
    return true;
  }
  int col_diff = col->poc - col->ref_poc[gi * 2 + n];
  int cur_diff = pic->poc - refs[list_x][ref_idx]->poc;
  if (col_diff == cur_diff) {
    out[0] = mvc[0];
    out[1] = mvc[1];
    return true;
  }
  out[0] = mv_scale(mvc[0], cur_diff, col_diff);
  out[1] = mv_scale(mvc[1], cur_diff, col_diff);
  return true;
}

// 8.5.3.2.5/6 AMVP predictor selection
void SliceDec::amvp(int xp, int yp, int w, int hh, int list_x, int ref_idx,
                    int mvp_flag, int out[2]) const {
  int target_poc = refs[list_x][ref_idx]->poc;
  bool target_lt = refs_lt[list_x][ref_idx] != 0;
  Mot a_cands[2] = {mot_at(xp - 1, yp + hh), mot_at(xp - 1, yp + hh - 1)};
  bool is_scaled = a_cands[0].valid || a_cands[1].valid;
  int mva[2], mvb[2];
  bool has_a = amvp_noscale(a_cands, 2, list_x, target_poc, mva);
  if (!has_a && is_scaled)
    has_a = amvp_scaled(a_cands, 2, list_x, target_poc, target_lt, mva);
  Mot b_cands[3] = {mot_at(xp + w, yp - 1), mot_at(xp + w - 1, yp - 1),
                    mot_at(xp - 1, yp - 1)};
  bool has_b = amvp_noscale(b_cands, 3, list_x, target_poc, mvb);
  if (!is_scaled) {
    if (!has_a && has_b) {
      mva[0] = mvb[0];
      mva[1] = mvb[1];
      has_a = true;
      has_b = false;
    }
    if (!has_b) {
      has_b = amvp_scaled(b_cands, 3, list_x, target_poc, target_lt, mvb);
      if (has_b && has_a && mvb[0] == mva[0] && mvb[1] == mva[1])
        has_b = false;
    }
  }
  int cands[2][2];
  int n = 0;
  if (has_a) {
    cands[n][0] = mva[0];
    cands[n][1] = mva[1];
    ++n;
  }
  if (has_b && !(has_a && mvb[0] == mva[0] && mvb[1] == mva[1])) {
    cands[n][0] = mvb[0];
    cands[n][1] = mvb[1];
    ++n;
  }
  if (n < 2 && h->temporal_mvp) {
    int t[2];
    if (tmvp(xp, yp, w, hh, ref_idx, list_x, t)) {
      cands[n][0] = t[0];
      cands[n][1] = t[1];
      ++n;
    }
  }
  while (n < 2) {
    cands[n][0] = cands[n][1] = 0;
    ++n;
  }
  out[0] = cands[mvp_flag][0];
  out[1] = cands[mvp_flag][1];
}

bool SliceDec::amvp_noscale(const Mot* cands, int nc, int list_x,
                            int target_poc, int out[2]) const {
  for (int i = 0; i < nc; ++i) {
    const Mot& m = cands[i];
    if (!m.valid) continue;
    const int order[2] = {list_x, 1 - list_x};
    for (int lx : order) {
      if (m.used[lx] && m.ridx[lx] < (int)refs[lx].size() &&
          refs[lx][m.ridx[lx]]->poc == target_poc) {
        out[0] = m.mv[lx][0];
        out[1] = m.mv[lx][1];
        return true;
      }
    }
  }
  return false;
}

bool SliceDec::amvp_scaled(const Mot* cands, int nc, int list_x,
                           int target_poc, bool target_lt,
                           int out[2]) const {
  for (int i = 0; i < nc; ++i) {
    const Mot& m = cands[i];
    if (!m.valid) continue;
    const int order[2] = {list_x, 1 - list_x};
    for (int lx : order) {
      if (m.used[lx]) {
        // 8.5.3.2.6: usable only when candidate ref and target agree
        // on long-term-ness; long-term MVs are copied unscaled
        if ((refs_lt[lx][m.ridx[lx]] != 0) != target_lt) continue;
        if (target_lt) {
          out[0] = m.mv[lx][0];
          out[1] = m.mv[lx][1];
          return true;
        }
        int cand_diff = pic->poc - refs[lx][m.ridx[lx]]->poc;
        int cur_diff = pic->poc - target_poc;
        if (cand_diff == cur_diff) {
          out[0] = m.mv[lx][0];
          out[1] = m.mv[lx][1];
          return true;
        }
        out[0] = mv_scale(m.mv[lx][0], cur_diff, cand_diff);
        out[1] = mv_scale(m.mv[lx][1], cur_diff, cand_diff);
        return true;
      }
    }
  }
  return false;
}

}  // namespace h265

namespace h265 {

// ---------------------------------------------------------------------------
// Deblocking filter (8.7.2; h265_ref.py _bs_for_edge..deblock_picture):
// all vertical edges of the picture, then all horizontal edges, on the
// 8x8 luma grid (16x16 for chroma).
// ---------------------------------------------------------------------------

static int bs_inter(const Frame& pic, int gp, int gq) {
  const int16_t* mp = &pic.mv[gp * 4];
  const int16_t* mq = &pic.mv[gq * 4];
  bool up[2] = {pic.mv_used[gp * 2] != 0, pic.mv_used[gp * 2 + 1] != 0};
  bool uq[2] = {pic.mv_used[gq * 2] != 0, pic.mv_used[gq * 2 + 1] != 0};
  // ref POC or "none" (use a sentinel far outside POC range)
  const int64_t NONE = INT64_MIN;
  int64_t rp[2] = {up[0] ? pic.ref_poc[gp * 2] : NONE,
                   up[1] ? pic.ref_poc[gp * 2 + 1] : NONE};
  int64_t rq[2] = {uq[0] ? pic.ref_poc[gq * 2] : NONE,
                   uq[1] ? pic.ref_poc[gq * 2 + 1] : NONE};
  int np = (up[0] ? 1 : 0) + (up[1] ? 1 : 0);
  int nq = (uq[0] ? 1 : 0) + (uq[1] ? 1 : 0);
  if (np != nq) return 1;
  auto far = [&](const int16_t* a, const int16_t* b) {
    return std::abs(a[0] - b[0]) >= 4 || std::abs(a[1] - b[1]) >= 4;
  };
  if (np == 1) {
    int lp = up[0] ? 0 : 1;
    int lq = uq[0] ? 0 : 1;
    if (rp[lp] != rq[lq]) return 1;
    return far(mp + lp * 2, mq + lq * 2) ? 1 : 0;
  }
  // two MVs each: compare as unordered reference sets
  int64_t sp0 = std::min(rp[0], rp[1]), sp1 = std::max(rp[0], rp[1]);
  int64_t sq0 = std::min(rq[0], rq[1]), sq1 = std::max(rq[0], rq[1]);
  if (sp0 != sq0 || sp1 != sq1) return 1;
  if (rp[0] == rp[1]) {
    // same picture both lists: both orderings must exceed to get bS 1
    bool a = far(mp, mq) || far(mp + 2, mq + 2);
    bool b = far(mp, mq + 2) || far(mp + 2, mq);
    return (a && b) ? 1 : 0;
  }
  if (rp[0] == rq[0]) return (far(mp, mq) || far(mp + 2, mq + 2)) ? 1 : 0;
  return (far(mp, mq + 2) || far(mp + 2, mq)) ? 1 : 0;
}

static int bs_for_edge(const Frame& pic, int gp, int gq, bool tu_edge) {
  if (pic.is_intra[gp] || pic.is_intra[gq]) return 2;
  if (tu_edge && (pic.nnz[gp] || pic.nnz[gq])) return 1;
  return bs_inter(pic, gp, gq);
}

// One 4-sample luma edge segment; (dx,dy) = unit vector across the edge
// (P side at -1). 8.7.2.5.3/8.7.2.5.7.
static void deblock_luma_segment(uint16_t* Y, int stride, int x, int y,
                                 int dx, int dy, int bs, int qp_p, int qp_q,
                                 const SliceHeader& h, bool nofilt_p,
                                 bool nofilt_q, int bd) {
  int qavg = (qp_p + qp_q + 1) >> 1;
  int beta = kBetaTable[clamp_i(qavg + h.beta_offset, 0, 51)] << (bd - 8);
  int tc = kTcTable[clamp_i(qavg + 2 * (bs - 1) + h.tc_offset, 0, 53)]
           << (bd - 8);
  int mx = (1 << bd) - 1;
  if (beta == 0 && tc == 0) return;
  int tx = dy, ty = dx;  // tangential unit vector
  auto S = [&](int i, int k) -> int {
    return Y[(size_t)(y + i * ty + k * dy) * stride + (x + i * tx + k * dx)];
  };
  auto W = [&](int i, int k, int v) {
    Y[(size_t)(y + i * ty + k * dy) * stride + (x + i * tx + k * dx)] =
        (uint16_t)v;
  };
  int dp0 = std::abs(S(0, -3) - 2 * S(0, -2) + S(0, -1));
  int dp3 = std::abs(S(3, -3) - 2 * S(3, -2) + S(3, -1));
  int dq0 = std::abs(S(0, 2) - 2 * S(0, 1) + S(0, 0));
  int dq3 = std::abs(S(3, 2) - 2 * S(3, 1) + S(3, 0));
  int d = dp0 + dp3 + dq0 + dq3;
  if (d >= beta) return;
  bool strong = true;
  for (int i = 0; i <= 3; i += 3) {
    int dpq = i == 0 ? dp0 + dq0 : dp3 + dq3;
    if (!(2 * dpq < (beta >> 2) &&
          std::abs(S(i, -4) - S(i, -1)) + std::abs(S(i, 0) - S(i, 3)) <
              (beta >> 3) &&
          std::abs(S(i, -1) - S(i, 0)) < ((5 * tc + 1) >> 1))) {
      strong = false;
      break;
    }
  }
  bool dep1 = (dp0 + dp3) < ((beta + (beta >> 1)) >> 3);
  bool deq1 = (dq0 + dq3) < ((beta + (beta >> 1)) >> 3);
  for (int i = 0; i < 4; ++i) {
    int px[4], qx[4];
    for (int k = 0; k < 4; ++k) {
      px[k] = S(i, -1 - k);
      qx[k] = S(i, k);
    }
    if (strong) {
      int np0 = clamp_i((px[2] + 2 * px[1] + 2 * px[0] + 2 * qx[0] + qx[1] +
                         4) >> 3,
                        px[0] - 2 * tc, px[0] + 2 * tc);
      int np1 = clamp_i((px[2] + px[1] + px[0] + qx[0] + 2) >> 2,
                        px[1] - 2 * tc, px[1] + 2 * tc);
      int np2 = clamp_i(
          (2 * px[3] + 3 * px[2] + px[1] + px[0] + qx[0] + 4) >> 3,
          px[2] - 2 * tc, px[2] + 2 * tc);
      int nq0 = clamp_i((px[1] + 2 * px[0] + 2 * qx[0] + 2 * qx[1] + qx[2] +
                         4) >> 3,
                        qx[0] - 2 * tc, qx[0] + 2 * tc);
      int nq1 = clamp_i((px[0] + qx[0] + qx[1] + qx[2] + 2) >> 2,
                        qx[1] - 2 * tc, qx[1] + 2 * tc);
      int nq2 = clamp_i(
          (px[0] + qx[0] + qx[1] + 3 * qx[2] + 2 * qx[3] + 4) >> 3,
          qx[2] - 2 * tc, qx[2] + 2 * tc);
      if (!nofilt_p) {
        W(i, -1, np0);
        W(i, -2, np1);
        W(i, -3, np2);
      }
      if (!nofilt_q) {
        W(i, 0, nq0);
        W(i, 1, nq1);
        W(i, 2, nq2);
      }
    } else {
      int delta = (9 * (qx[0] - px[0]) - 3 * (qx[1] - px[1]) + 8) >> 4;
      if (std::abs(delta) >= tc * 10) continue;
      delta = clamp_i(delta, -tc, tc);
      if (!nofilt_p) {
        W(i, -1, clamp_i(px[0] + delta, 0, mx));
        if (dep1) {
          int dp = clamp_i((((px[2] + px[0] + 1) >> 1) - px[1] + delta) >> 1,
                           -(tc >> 1), tc >> 1);
          W(i, -2, clamp_i(px[1] + dp, 0, mx));
        }
      }
      if (!nofilt_q) {
        W(i, 0, clamp_i(qx[0] - delta, 0, mx));
        if (deq1) {
          int dq = clamp_i((((qx[2] + qx[0] + 1) >> 1) - qx[1] - delta) >> 1,
                           -(tc >> 1), tc >> 1);
          W(i, 1, clamp_i(qx[1] + dq, 0, mx));
        }
      }
    }
  }
}

// One 4-sample chroma edge segment (bS==2 only), 8.7.2.5.5
static void deblock_chroma_segment(uint16_t* C, int stride, int cx, int cy,
                                   int dx, int dy, int qp_p, int qp_q,
                                   int off, const SliceHeader& h,
                                   bool nofilt_p, bool nofilt_q, int bd) {
  int qpi = clamp_i(((qp_p + qp_q + 1) >> 1) + off, 0, 57);
  int qpc = kChromaQpMap[qpi];
  int tc = kTcTable[clamp_i(qpc + 2 + h.tc_offset, 0, 53)] << (bd - 8);
  int mx = (1 << bd) - 1;
  if (tc == 0) return;
  int tx = dy, ty = dx;
  for (int i = 0; i < 4; ++i) {
    size_t base = (size_t)(cy + i * ty) * stride + (cx + i * tx);
    int p1 = C[base - 2 * dy * (size_t)stride - 2 * dx];
    int p0 = C[base - dy * (size_t)stride - dx];
    int q0 = C[base];
    int q1 = C[base + dy * (size_t)stride + dx];
    int delta = clamp_i(((q0 - p0) * 4 + p1 - q1 + 4) >> 3, -tc, tc);
    if (!nofilt_p)
      C[base - dy * (size_t)stride - dx] =
          (uint16_t)clamp_i(p0 + delta, 0, mx);
    if (!nofilt_q) C[base] = (uint16_t)clamp_i(q0 - delta, 0, mx);
  }
}

// tile id of the 4x4-grid cell gi
static inline int tile_of_g(const Frame& pic, int gi) {
  const Sps& s = *pic.sps;
  int gy = gi / pic.gw, gx = gi % pic.gw;
  int rs = (((gy << 2) >> s.log2_ctb) * s.pic_w_ctbs) +
           ((gx << 2) >> s.log2_ctb);
  return pic.pps->tile_id[rs];
}

static void deblock_picture(Frame& pic,
                            const std::map<int, SliceHeader>& headers) {
  const Sps& sps = *pic.sps;
  int w = sps.width, hgt = sps.height;
  bool tile_gate =
      pic.pps->tiles_enabled && !pic.pps->loop_filter_across_tiles;
  bool any_bypass = pic.any_bypass != 0;
  for (int pass = 0; pass < 2; ++pass) {
    bool vertical = pass == 0;
    const std::vector<uint8_t>& tu_grid =
        vertical ? pic.tu_edge_v : pic.tu_edge_h;
    const std::vector<uint8_t>& pu_grid =
        vertical ? pic.pu_edge_v : pic.pu_edge_h;
    int dx = vertical ? 1 : 0, dy = vertical ? 0 : 1;
    // slice headers are constant across huge runs of edges; cache the
    // map lookup (it was one tree walk per 4-sample segment)
    const SliceHeader* hc = nullptr;
    int hc_sid = -2;
    auto edge = [&](int ex, int ey) {
      int gq = pic.gi(ey >> 2, ex >> 2);
      bool tu_edge = tu_grid[gq] != 0;
      if (!(tu_edge || pu_grid[gq])) return;
      int gp = vertical ? pic.gi(ey >> 2, (ex - 1) >> 2)
                        : pic.gi((ey - 1) >> 2, ex >> 2);
      int sq = pic.slice_id[gq];
      if (sq != hc_sid) {
        hc = &headers.at(sq);
        hc_sid = sq;
      }
      const SliceHeader& h = *hc;
      if (h.deblocking_disabled) return;
      if (pic.slice_id[gp] != sq && !h.loop_filter_across_slices) return;
      if (tile_gate && tile_of_g(pic, gp) != tile_of_g(pic, gq)) return;
      int bs = bs_for_edge(pic, gp, gq, tu_edge);
      if (bs == 0) return;
      int qp_p = pic.qp[gp];
      int qp_q = pic.qp[gq];
      bool nofp = any_bypass && pic.bypass[gp] != 0;
      bool nofq = any_bypass && pic.bypass[gq] != 0;
      deblock_luma_segment(pic.Y.data(), pic.wp, ex, ey, dx, dy, bs, qp_p,
                           qp_q, h, nofp, nofq, sps.bit_depth);
      if (bs == 2 && (vertical ? ex % 16 == 0 : ey % 16 == 0) &&
          (vertical ? ey % 8 == 0 : ex % 8 == 0)) {
        deblock_chroma_segment(pic.U.data(), pic.cw, ex >> 1, ey >> 1, dx,
                               dy, qp_p, qp_q, pic.pps->cb_qp_offset, h,
                               nofp, nofq, sps.bit_depth);
        deblock_chroma_segment(pic.V.data(), pic.cw, ex >> 1, ey >> 1, dx,
                               dy, qp_p, qp_q, pic.pps->cr_qp_offset, h,
                               nofp, nofq, sps.bit_depth);
      }
    };
    // row-major edge walk in both passes (grid rows and pixel rows
    // stream; edges within a pass are independent — a segment reads at
    // most 4 samples across the edge, disjoint from any other segment's
    // writes in the same direction)
    if (vertical) {
      for (int ey = 0; ey < hgt - 3; ey += 4)
        for (int ex = 8; ex < w; ex += 8) edge(ex, ey);
    } else {
      for (int ey = 8; ey < hgt; ey += 8)
        for (int ex = 0; ex < w - 3; ex += 4) edge(ex, ey);
    }
  }
}

// ---------------------------------------------------------------------------
// Sample adaptive offset (8.7.3; h265_ref.py apply_sao): applied after
// deblocking, reading the deblocked picture and writing a fresh copy
// (EO comparisons must see pre-SAO neighbours).
// ---------------------------------------------------------------------------

static const int kEoNbr[4][2][2] = {{{-1, 0}, {1, 0}},
                                    {{0, -1}, {0, 1}},
                                    {{-1, -1}, {1, 1}},
                                    {{1, -1}, {-1, 1}}};

static void apply_sao(Frame& pic,
                      const std::map<int, SliceHeader>& headers) {
  const Sps& sps = *pic.sps;
  int bd = sps.bit_depth;
  int mx = (1 << bd) - 1;
  int bshift = bd - 5;
  int ctb = 1 << sps.log2_ctb;
  // copy planes only for components some CTB actually offsets (EO must
  // read pre-SAO neighbours; an all-off component needs no copy)
  bool used[3] = {false, false, false};
  for (size_t cb = 0; cb < pic.sao_type.size(); ++cb)
    if (pic.sao_type[cb]) used[cb % 3] = true;
  if (!used[0] && !used[1] && !used[2]) return;
  std::vector<uint16_t> srcY, srcU, srcV;
  if (used[0]) srcY.assign(pic.Y.data(), pic.Y.data() + pic.Y.size());
  if (used[1]) srcU.assign(pic.U.data(), pic.U.data() + pic.U.size());
  if (used[2]) srcV.assign(pic.V.data(), pic.V.data() + pic.V.size());
  const uint16_t* srcs[3] = {srcY.data(), srcU.data(), srcV.data()};
  uint16_t* outs[3] = {pic.Y.data(), pic.U.data(), pic.V.data()};
  bool any_bypass = pic.any_bypass != 0;
  for (int ry = 0; ry < sps.pic_h_ctbs; ++ry)
    for (int rx = 0; rx < sps.pic_w_ctbs; ++rx)
      for (int ci = 0; ci < 3; ++ci) {
        int cb = (ry * pic.cgw + rx) * 3 + ci;
        int typ = pic.sao_type[cb];
        if (typ == 0) continue;
        int sh = ci == 0 ? 0 : 1;
        const uint16_t* src = srcs[ci];
        uint16_t* out = outs[ci];
        int stride = ci == 0 ? pic.wp : pic.cw;
        int w = sps.width >> sh;
        int h = sps.height >> sh;
        int x0 = (rx * ctb) >> sh;
        int y0 = (ry * ctb) >> sh;
        int x1 = std::min(x0 + (ctb >> sh), w);
        int y1 = std::min(y0 + (ctb >> sh), h);
        const int16_t* offs = &pic.sao_offsets[cb * 4];
        if (typ == 1) {  // band offset
          int bpos = pic.sao_band_pos[cb];
          int16_t lut[32] = {0};
          for (int k = 0; k < 4; ++k) lut[(bpos + k) & 31] = offs[k];
          for (int y = y0; y < y1; ++y)
            for (int x = x0; x < x1; ++x) {
              if (any_bypass &&
                  pic.bypass[pic.gi((y << sh) >> 2, (x << sh) >> 2)])
                continue;
              int p = src[(size_t)y * stride + x];
              out[(size_t)y * stride + x] =
                  (uint16_t)clamp_i(p + lut[p >> bshift], 0, mx);
            }
          continue;
        }
        // edge offset
        int eo = pic.sao_eo_class[cb];
        int ax = kEoNbr[eo][0][0], ay = kEoNbr[eo][0][1];
        int bx = kEoNbr[eo][1][0], by = kEoNbr[eo][1][1];
        int g0 = pic.gi((y0 << sh) >> 2, (x0 << sh) >> 2);
        int sid = pic.slice_id[g0];
        bool across = headers.at(sid).loop_filter_across_slices != 0;
        bool tile_gate =
            pic.pps->tiles_enabled && !pic.pps->loop_filter_across_tiles;
        int tid = tile_gate ? tile_of_g(pic, g0) : 0;
        if (across && !tile_gate && !any_bypass) {
          // fast path (single-slice-per-CTB gating irrelevant): pure
          // pixel math with the neighbour bounds hoisted per direction
          int ys = std::max(y0, (ay < 0 || by < 0) ? 1 : 0);
          int ye = std::min(y1, (ay > 0 || by > 0) ? h - 1 : h);
          int xs = std::max(x0, (ax < 0 || bx < 0) ? 1 : 0);
          int xe = std::min(x1, (ax > 0 || bx > 0) ? w - 1 : w);
          long na = (long)ay * stride + ax;
          long nb = (long)by * stride + bx;
          for (int y = ys; y < ye; ++y) {
            const uint16_t* sr = src + (size_t)y * stride;
            uint16_t* orow = out + (size_t)y * stride;
            for (int x = xs; x < xe; ++x) {
              int p = sr[x];
              int da = p - sr[x + na];
              int db = p - sr[x + nb];
              int ei = 2 + (da == 0 ? 0 : (da > 0 ? 1 : -1)) +
                       (db == 0 ? 0 : (db > 0 ? 1 : -1));
              if (ei == 2) continue;
              if (ei < 2) ++ei;
              orow[x] = (uint16_t)clamp_i(p + offs[ei - 1], 0, mx);
            }
          }
          continue;
        }
        for (int y = y0; y < y1; ++y)
          for (int x = x0; x < x1; ++x) {
            int nax = x + ax, nay = y + ay;
            int nbx = x + bx, nby = y + by;
            if (!(nax >= 0 && nax < w && nay >= 0 && nay < h && nbx >= 0 &&
                  nbx < w && nby >= 0 && nby < h))
              continue;
            if (any_bypass &&
                pic.bypass[pic.gi((y << sh) >> 2, (x << sh) >> 2)])
              continue;
            int ga = pic.gi((nay << sh) >> 2, (nax << sh) >> 2);
            int gb = pic.gi((nby << sh) >> 2, (nbx << sh) >> 2);
            if (!across) {
              if (pic.slice_id[ga] != sid || pic.slice_id[gb] != sid)
                continue;
            }
            if (tile_gate) {
              if (tile_of_g(pic, ga) != tid || tile_of_g(pic, gb) != tid)
                continue;
            }
            int p = src[(size_t)y * stride + x];
            int da = p - src[(size_t)nay * stride + nax];
            int db = p - src[(size_t)nby * stride + nbx];
            int ei = 2 + (da == 0 ? 0 : (da > 0 ? 1 : -1)) +
                     (db == 0 ? 0 : (db > 0 ? 1 : -1));
            if (ei == 2) continue;
            if (ei < 2) ++ei;
            // ei now 1..4 -> offsets[0..3]
            out[(size_t)y * stride + x] =
                (uint16_t)clamp_i(p + offs[ei - 1], 0, mx);
          }
      }
}

// ---------------------------------------------------------------------------
// Top-level decoder (h265_ref.py H265RefDecoder)
// ---------------------------------------------------------------------------

// ---------------------------------------------------------------------------
// Wavefront (WPP) parallel slice decode.
//
// HEVC's availability rules make a 2-CTB-lag wavefront bit-exact: every
// neighbour a CTB at (col, row) may consult -- intra above-right
// samples, merge/AMVP candidate B0, SAO merge-up, the QP predictor --
// reaches at most the end of CTB col+1 of the row above, and the CABAC
// context for a row starts from the snapshot taken after CTB 1 of the
// row above (9.3.1 entropy_coding_sync).  So decoding row r gated on
// "row r-1 has completed CTB col+1" reproduces the serial decode
// exactly.  Applied only to the common broadcast/x265 shape: a single
// independent slice covering the whole picture with one substream per
// CTB row; every other shape takes the serial path.
//
// Worker t owns rows t, t+N, ... ; per-row state is a private SliceDec
// copy.  Cross-thread visibility of the shared Frame grids rides the
// acquire/release progress counters.  On a corrupt stream any row's
// throw (or an early end_of_slice flag) sets `stop`, everyone bails at
// the next CTB boundary, and the first error is rethrown after join --
// matching the serial path's throw-out-of-run() error accounting.
// ---------------------------------------------------------------------------

// decode worker count: AMATSUKAZE_DECODE_THREADS, else hardware
// concurrency (1 disables threading; same switch as mpeg2dec.cpp)
static int decode_threads() {
  static int n = [] {
    const char* e = std::getenv("AMATSUKAZE_DECODE_THREADS");
    if (e && *e) return std::max(1, std::atoi(e));
    return (int)std::max(1u, std::thread::hardware_concurrency());
  }();
  return n;
}

static bool wavefront_eligible(const SliceDec& sd) {
  const Sps& s = *sd.sps;
  return sd.pps->entropy_coding_sync && !sd.pps->tiles_enabled &&
         !sd.h->dependent && sd.h->segment_address == 0 &&
         (int)sd.substreams.size() == s.pic_h_ctbs && s.pic_h_ctbs >= 2 &&
         s.pic_w_ctbs >= 2 && decode_threads() > 1;
}

static void run_wavefront(SliceDec& sd) {
  const Sps& s = *sd.sps;
  const int rows = s.pic_h_ctbs, wctb = s.pic_w_ctbs;
  const int nthreads = std::min(decode_threads(), rows);
  std::unique_ptr<std::atomic<int>[]> progress(new std::atomic<int>[rows]);
  std::unique_ptr<std::atomic<int>[]> snap_ready(new std::atomic<int>[rows]);
  for (int i = 0; i < rows; ++i) {
    progress[i].store(0, std::memory_order_relaxed);
    snap_ready[i].store(0, std::memory_order_relaxed);
  }
  std::vector<CabacEngine::Snap> snaps(rows);
  std::atomic<bool> stop{false};
  std::mutex err_mu;
  std::exception_ptr first_err;
  // last row's exit state, for the serial path's seg_carry parity
  CabacEngine::Snap last_ctx;
  int last_qp = sd.last_cu_qp;
  bool last_done = false;

  auto row_task = [&](SliceDec& w, int r) {
    w.c.init_ctx(w.init_type, w.h->slice_qp);
    w.c.start(w.rbsp, w.rbsp_len, w.substreams[r] * 8);
    if (r > 0) {
      while (!snap_ready[r - 1].load(std::memory_order_acquire)) {
        if (stop.load(std::memory_order_relaxed)) return;
        std::this_thread::yield();
      }
      w.c.restore(snaps[r - 1]);
    }
    w.qp_prev = w.h->slice_qp;
    w.last_cu_qp = w.h->slice_qp;
    for (int col = 0; col < wctb; ++col) {
      if (r > 0) {
        int need = std::min(col + 2, wctb);
        while (progress[r - 1].load(std::memory_order_acquire) < need) {
          if (stop.load(std::memory_order_relaxed)) return;
          std::this_thread::yield();
        }
      }
      if (stop.load(std::memory_order_relaxed)) return;
      w.cur_tile = 0;
      w.decode_ctu(col << s.log2_ctb, r << s.log2_ctb);
      if (col == 1) {
        w.c.snapshot(snaps[r]);
        snap_ready[r].store(1, std::memory_order_release);
      }
      int end = w.c.terminate();
      progress[r].store(col + 1, std::memory_order_release);
      if (end) {
        // serial run() breaks out of the whole slice here; stop all
        if (!(r == rows - 1 && col == wctb - 1))
          stop.store(true, std::memory_order_relaxed);
        break;
      }
      if (col == wctb - 1 && r < rows - 1) {
        int one = w.c.terminate();
        if (one != 1) throw DecodeError("missing end_of_subset bit");
      }
    }
    if (r == rows - 1) {
      w.c.snapshot(last_ctx);
      last_qp = w.last_cu_qp;
      last_done = true;
    }
  };

  std::vector<std::thread> pool;
  pool.reserve(nthreads);
  for (int t = 0; t < nthreads; ++t)
    pool.emplace_back([&, t]() {
      for (int r = t; r < rows; r += nthreads) {
        SliceDec w(sd);
        try {
          row_task(w, r);
        } catch (...) {
          {
            std::lock_guard<std::mutex> lk(err_mu);
            if (!first_err) first_err = std::current_exception();
          }
          stop.store(true, std::memory_order_relaxed);
        }
        // unblock dependants even when this row bailed early
        progress[r].store(wctb, std::memory_order_release);
        if (!snap_ready[r].load(std::memory_order_relaxed))
          snap_ready[r].store(1, std::memory_order_release);
      }
    });
  for (auto& th : pool) th.join();
  if (first_err) std::rethrow_exception(first_err);
  if (last_done) {
    sd.c.restore(last_ctx);
    sd.last_cu_qp = last_qp;
  }
  for (int r = 0; r < rows; ++r) sd.wpp_snap[r] = snaps[r];
}

// A display-order output entry: owned, conformance-cropped planes in
// *uninitialized* buffers (vector::resize zero-filled ~1.5*w*h uint16
// per frame before the crop copy overwrote every element — the memset
// alone was ~12% of 4K decode time).  Owned copies keep memory bounded
// for feed-everything-then-pop drivers; pinning the decoded Frame
// instead defeats allocator reuse and costs fresh-page faults.
struct OutFrame {
  int poc;
  int w, h, bd;
  // zero-copy: the display frame references the decoded picture (kept
  // alive by this shared_ptr until popped) instead of a cropped copy;
  // PopFrame copies rows straight from the strided planes
  std::shared_ptr<Frame> src;
  int ox, oy;  // conformance-window origin in luma samples
};
using OutPtr = std::shared_ptr<OutFrame>;

struct Decoder {
  std::map<int, Sps> sps_map;
  std::map<int, Pps> pps_map;
  PicPtr cur_pic;
  std::vector<PicPtr> dpb;
  // display-released frames recycled by alloc_frame (keeps the large
  // pixel-plane allocations warm instead of re-faulting fresh pages)
  std::vector<PicPtr> frame_pool;
  PicPtr alloc_frame(const Sps& s, const Pps& p) {
    int want_wp = s.pic_w_ctbs << s.log2_ctb;
    int want_hp = s.pic_h_ctbs << s.log2_ctb;
    for (auto it = frame_pool.begin(); it != frame_pool.end(); ++it) {
      if ((*it)->wp == want_wp && (*it)->hp == want_hp) {
        PicPtr f = *it;
        frame_pool.erase(it);
        f->reinit(s, p);
        return f;
      }
    }
    return std::make_shared<Frame>(s, p);
  }
  int cur_poc = 0;
  int slice_counter = 0;
  std::map<int, SliceHeader> slice_headers;
  int prev_poc_msb = 0, prev_poc_lsb = 0;
  std::vector<std::pair<int, OutPtr>> waiting;
  std::deque<OutPtr> outq;
  long long errors = 0;
  // NoRaslOutputFlag state (8.1.3): RASL pictures after a CRA that
  // starts decoding (mid-stream join) or any BLA are dropped
  bool skip_rasl = false;
  bool decoded_any = false;
  std::vector<uint8_t> rbsp;  // scratch
  std::vector<size_t> epb;
  // dependent slice segment state (7.4.7.1 / 9.3.1): the preceding
  // independent header, and the CABAC/QP carry from the last segment
  SliceHeader prev_indep;
  bool has_prev_indep = false;
  struct SegCarry {
    CabacEngine::Snap ctx;
    int last_qp = 26;
    std::map<int, CabacEngine::Snap> wpp;
    bool valid = false;
  } seg_carry;

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
  }

  void flush() {
    try {
      finish_picture();
    } catch (const std::exception&) {
      ++errors;
    }
    std::sort(waiting.begin(), waiting.end(),
              [](const auto& a, const auto& b) { return a.first < b.first; });
    for (auto& e : waiting) outq.push_back(e.second);
    waiting.clear();
  }

  void nal(const uint8_t* d, size_t n) {
    if (n < 2) return;
    int t = (d[0] >> 1) & 0x3F;
    if (t == NAL_SPS) {
      nal_to_rbsp(d, n, rbsp, epb);
      Sps s;
      parse_sps(rbsp, s);
      sps_map[s.id] = s;
    } else if (t == NAL_PPS) {
      nal_to_rbsp(d, n, rbsp, epb);
      Pps p;
      parse_pps(rbsp, sps_map, p);
      // keep SPS pointer stable across map updates
      pps_map[p.id] = p;
      pps_map[p.id].sps = &sps_map.at(p.sps_id);
    } else if (t < 32) {
      slice(d, n, t);
    }
  }

  void slice(const uint8_t* d, size_t n, int t) {
    if (t == 8 || t == 9) {  // RASL_N / RASL_R
      if (skip_rasl) return;
    } else {
      if (t == NAL_IDR_W_RADL || t == NAL_IDR_N_LP)
        skip_rasl = false;
      else if (t == NAL_CRA || t == NAL_BLA_W_LP || t == 17 || t == 18)
        skip_rasl = (t != NAL_CRA) || !decoded_any;
      decoded_any = true;
    }
    nal_to_rbsp(d, n, rbsp, epb);
    SliceHeader h;
    parse_slice_header(rbsp, t, sps_map, pps_map, h);
    if (h.first_slice) {
      finish_picture();
      if (t == NAL_IDR_W_RADL || t == NAL_IDR_N_LP) {
        for (auto& p : dpb) p->drop_side_arrays();
        dpb.clear();
      }
      cur_pic = alloc_frame(*h.sps, *h.pps);
      cur_pic->nal_type = t;
      cur_poc = compute_poc(h, t);
      cur_pic->poc = cur_poc;
      // RPS: drop DPB pictures not referenced by this picture
      // (short-term deltas or resolved long-term entries, 8.3.2)
      if (t != NAL_IDR_W_RADL && t != NAL_IDR_N_LP) {
        std::vector<std::pair<Frame*, int>> lts;
        resolve_lt(h, lts);
        std::vector<PicPtr> keep;
        for (auto& p : dpb) {
          bool keep_it = false;
          for (auto& e : h.strps.neg)
            if (p->poc == cur_poc + e.first) keep_it = true;
          for (auto& e : h.strps.pos)
            if (p->poc == cur_poc + e.first) keep_it = true;
          for (auto& e : lts)
            if (e.first == p.get()) keep_it = true;
          if (keep_it)
            keep.push_back(p);
          else
            p->drop_side_arrays();
        }
        dpb = keep;
      }
    }
    if (!cur_pic) throw DecodeError("slice without picture start");
    // a corrupt mid-picture SPS/PPS re-parse must not let a later slice
    // address the in-flight frame with different geometry
    if (h.sps->width != cur_pic->sps->width ||
        h.sps->height != cur_pic->sps->height ||
        h.sps->log2_ctb != cur_pic->sps->log2_ctb ||
        h.sps->bit_depth != cur_pic->sps->bit_depth)
      throw DecodeError("parameter set geometry changed mid-picture");
    bool dep_restore = false;
    if (h.dependent) {
      // 7.4.7.1: inherit every slice-header value of the preceding
      // independent segment except the segment's own address/entry
      // points; it continues the same slice (same slice_id)
      if (!has_prev_indep || !seg_carry.valid)
        throw DecodeError("dependent segment without predecessor");
      SliceHeader own = h;
      h = prev_indep;
      h.dependent = 1;
      h.first_slice = 0;
      h.segment_address = own.segment_address;
      h.entry_points = own.entry_points;
      h.data_byte_pos = own.data_byte_pos;
      // a dependent segment restores carried contexts unless its first
      // CTU starts a new tile (tile init wins, 9.3.1)
      const Pps& pps = *h.pps;
      int ts0 = pps.rs_to_ts[h.segment_address];
      bool tile_start =
          pps.tiles_enabled &&
          (ts0 == 0 || pps.tile_id[pps.ts_to_rs[ts0 - 1]] !=
                           pps.tile_id[h.segment_address]);
      dep_restore = !tile_start;
    } else {
      prev_indep = h;
      has_prev_indep = true;
      ++slice_counter;
    }
    slice_headers[slice_counter] = h;
    SliceDec sd(this, cur_pic.get(), &slice_headers[slice_counter], rbsp,
                epb, slice_counter);
    if (dep_restore) {
      sd.c.restore(seg_carry.ctx);
      sd.last_cu_qp = seg_carry.last_qp;
      sd.qp_prev = seg_carry.last_qp;
    }
    if (h.dependent) sd.wpp_snap = seg_carry.wpp;
    if (h.slice_type != SLICE_I) {
      build_ref_lists(h, sd.refs, sd.refs_lt);
      if (sd.refs[0].empty() ||
          (h.slice_type == SLICE_B && sd.refs[1].empty()))
        throw DecodeError("empty reference list");
      sd.no_backward = true;
      for (int lx = 0; lx < 2; ++lx)
        for (Frame* p : sd.refs[lx])
          if (p->poc > cur_poc) sd.no_backward = false;
      if (h.temporal_mvp) {
        auto& lst = sd.refs[h.collocated_from_l0 ? 0 : 1];
        if (h.collocated_ref_idx >= (int)lst.size())
          throw DecodeError("bad collocated_ref_idx");
        sd.col_pic = lst[h.collocated_ref_idx];
      }
    }
    if (wavefront_eligible(sd))
      run_wavefront(sd);
    else
      sd.run();
    sd.c.snapshot(seg_carry.ctx);
    seg_carry.last_qp = sd.last_cu_qp;
    seg_carry.wpp = sd.wpp_snap;
    seg_carry.valid = true;
  }

  // Match the slice's long-term entries against the DPB (8.3.2
  // PocLtCurr): full-POC match when the MSB cycle is sent, else
  // POC-LSB match. Appends (picture, used_by_curr).
  void resolve_lt(const SliceHeader& h,
                  std::vector<std::pair<Frame*, int>>& out) {
    int max_lsb = 1 << h.sps->log2_max_poc_lsb;
    for (auto& e : h.lt) {
      int lsb = e[0], used = e[1], has_msb = e[2], dmsb = e[3];
      Frame* match = nullptr;
      if (has_msb) {
        int target =
            lsb + cur_poc - dmsb * max_lsb - (cur_poc & (max_lsb - 1));
        for (auto& p : dpb)
          if (p->poc == target) match = p.get();
      } else {
        for (auto& p : dpb)
          if ((p->poc & (max_lsb - 1)) == lsb) match = p.get();
      }
      if (match) out.emplace_back(match, used);
    }
  }

  // RefPicList0/1 from the short-term RPS + long-term set (8.3.2-8.3.4);
  // refs_lt flags each entry as long-term (MV scaling is disabled
  // against long-term references, 8.5.3.2.8)
  void build_ref_lists(const SliceHeader& h, std::vector<Frame*> refs[2],
                       std::vector<uint8_t> refs_lt[2]) {
    int poc = cur_poc;
    std::map<int, Frame*> by_poc;
    for (auto& p : dpb) by_poc[p->poc] = p.get();
    std::vector<Frame*> before, after;
    for (auto& e : h.strps.neg)
      if (e.second) {
        auto it = by_poc.find(poc + e.first);
        if (it == by_poc.end()) throw DecodeError("missing reference");
        before.push_back(it->second);
      }
    for (auto& e : h.strps.pos)
      if (e.second) {
        auto it = by_poc.find(poc + e.first);
        if (it == by_poc.end()) throw DecodeError("missing reference");
        after.push_back(it->second);
      }
    std::vector<std::pair<Frame*, int>> lts;
    resolve_lt(h, lts);
    std::vector<Frame*> lt_curr;
    for (auto& e : lts)
      if (e.second) lt_curr.push_back(e.first);
    for (int li = 0; li < 2; ++li) {
      std::vector<Frame*> order;
      std::vector<uint8_t> is_lt;
      if (li == 0) {
        order = before;
        order.insert(order.end(), after.begin(), after.end());
      } else {
        order = after;
        order.insert(order.end(), before.begin(), before.end());
      }
      is_lt.assign(order.size(), 0);
      for (Frame* p : lt_curr) {
        order.push_back(p);
        is_lt.push_back(1);
      }
      int n = h.num_ref[li];
      if (order.empty()) {
        refs[li].clear();
        refs_lt[li].clear();
        continue;
      }
      std::vector<Frame*> tmp;
      std::vector<uint8_t> tmp_lt;
      while ((int)tmp.size() < n) {
        tmp.insert(tmp.end(), order.begin(), order.end());
        tmp_lt.insert(tmp_lt.end(), is_lt.begin(), is_lt.end());
      }
      refs[li].clear();
      refs_lt[li].clear();
      if (h.has_rplm[li]) {
        for (int m : h.rplm[li]) {
          if (m >= (int)tmp.size()) throw DecodeError("bad rplm index");
          refs[li].push_back(tmp[m]);
          refs_lt[li].push_back(tmp_lt[m]);
        }
      } else {
        refs[li].assign(tmp.begin(), tmp.begin() + n);
        refs_lt[li].assign(tmp_lt.begin(), tmp_lt.begin() + n);
      }
    }
    if (h.slice_type == SLICE_P) {
      refs[1].clear();
      refs_lt[1].clear();
    }
  }

  int compute_poc(const SliceHeader& h, int t) {
    const Sps& sps = *h.sps;
    int msb, lsb;
    if (t == NAL_IDR_W_RADL || t == NAL_IDR_N_LP) {
      msb = lsb = 0;
    } else {
      int max_lsb = 1 << sps.log2_max_poc_lsb;
      lsb = h.poc_lsb;
      int pm = prev_poc_msb, pl = prev_poc_lsb;
      bool prev_valid = !waiting.empty() || prev_poc_lsb || prev_poc_msb;
      if ((t == NAL_CRA || t == NAL_BLA_W_LP || t == 17 || t == 18) &&
          !prev_valid)
        msb = 0;
      else if (lsb < pl && (pl - lsb) >= (max_lsb >> 1))
        msb = pm + max_lsb;
      else if (lsb > pl && (lsb - pl) > (max_lsb >> 1))
        msb = pm - max_lsb;
      else
        msb = pm;
    }
    // RASL/RADL and sub-layer non-ref pics don't update prevTid0
    if (t != 8 && t != 9 && t != 6 && t != 7) {
      prev_poc_msb = msb;
      prev_poc_lsb = lsb;
    }
    return msb + lsb;
  }

  void finish_picture() {
    PicPtr pic = cur_pic;
    if (!pic) return;
    cur_pic.reset();
    bool any_deblock = false, any_sao = false;
    for (auto& e : slice_headers) {
      if (!e.second.deblocking_disabled) any_deblock = true;
      if (e.second.sao_luma || e.second.sao_chroma) any_sao = true;
    }
    if (any_deblock) deblock_picture(*pic, slice_headers);
    if (any_sao) apply_sao(*pic, slice_headers);
    slice_headers.clear();
    dpb.push_back(pic);
    if (pic->nal_type == NAL_IDR_W_RADL || pic->nal_type == NAL_IDR_N_LP) {
      std::sort(waiting.begin(), waiting.end(),
                [](const auto& a, const auto& b) {
                  return a.first < b.first;
                });
      for (auto& e : waiting) outq.push_back(e.second);
      waiting.clear();
    }
    waiting.emplace_back(pic->poc, output_frame(pic));
    std::sort(waiting.begin(), waiting.end(),
              [](const auto& a, const auto& b) { return a.first < b.first; });
    while ((int)waiting.size() > pic->sps->num_reorder) {
      outq.push_back(waiting.front().second);
      waiting.erase(waiting.begin());
    }
  }

  // conformance-window crop (h265_ref.py _Picture.output)
  OutPtr output_frame(const PicPtr& pics) {
    const Frame& pic = *pics;
    const Sps& s = *pic.sps;
    int cl = s.conf_win[0], cr = s.conf_win[1];
    int ct = s.conf_win[2], cb = s.conf_win[3];
    auto f = std::make_shared<OutFrame>();
    f->poc = pic.poc;
    f->bd = s.bit_depth;
    f->w = s.width - 2 * (cl + cr);
    f->h = s.height - 2 * (ct + cb);
    f->src = pics;
    f->ox = 2 * cl;
    f->oy = 2 * ct;
    return f;
  }
};

}  // namespace h265

// ---------------------------------------------------------------------------
// C API (mirrors the H264_* surface in h264dec.cpp)
// ---------------------------------------------------------------------------

extern "C" {

void* H265_Create() { return new h265::Decoder(); }
void H265_Destroy(void* h) { delete static_cast<h265::Decoder*>(h); }

// Feed Annex B bytes (complete NALs -- cut at the last start code, like
// the oracle's decode()); returns frames now queued for display.
int H265_Decode(void* hp, const uint8_t* data, long long len) {
  auto* d = static_cast<h265::Decoder*>(hp);
  d->decode(data, (size_t)len);
  return (int)d->outq.size();
}

int H265_Flush(void* hp) {
  auto* d = static_cast<h265::Decoder*>(hp);
  d->flush();
  return (int)d->outq.size();
}

// info[6] = {width, height, poc, errors_so_far, bit_depth, 0}; 1 when a
// frame is queued.
int H265_NextInfo(void* hp, int* info) {
  auto* d = static_cast<h265::Decoder*>(hp);
  if (d->outq.empty()) return 0;
  auto& f = *d->outq.front();
  info[0] = f.w;
  info[1] = f.h;
  info[2] = f.poc;
  info[3] = (int)d->errors;
  info[4] = f.bd;
  info[5] = 0;
  return 1;
}

// Pop the front frame. For bit_depth 8 the planes are uint8 (y: h*w,
// u/v: (h/2)*(w/2)); for 10 they are uint16 (native endian).
int H265_PopFrame(void* hp, uint8_t* y, uint8_t* u, uint8_t* v) {
  auto* d = static_cast<h265::Decoder*>(hp);
  if (d->outq.empty()) return 0;
  auto f = d->outq.front();
  d->outq.pop_front();
  const h265::Frame& p = *f->src;
  const int cw = f->w / 2, ch = f->h / 2;
  const int cox = f->ox / 2, coy = f->oy / 2;
  if (f->bd > 8) {
    for (int r = 0; r < f->h; ++r)
      std::memcpy(y + (size_t)r * f->w * 2,
                  &p.Y[(size_t)(f->oy + r) * p.wp + f->ox],
                  (size_t)f->w * 2);
    for (int r = 0; r < ch; ++r) {
      std::memcpy(u + (size_t)r * cw * 2,
                  &p.U[(size_t)(coy + r) * p.cw + cox], (size_t)cw * 2);
      std::memcpy(v + (size_t)r * cw * 2,
                  &p.V[(size_t)(coy + r) * p.cw + cox], (size_t)cw * 2);
    }
  } else {
    auto narrow_row = [](uint8_t* dst, const uint16_t* src, int n) {
      int i = 0;
#if H265_SIMD
      for (; i + 16 <= n; i += 16) {
        __m256i a = _mm256_loadu_si256((const __m256i*)(src + i));
        __m256i pk = _mm256_packus_epi16(a, a);
        pk = _mm256_permute4x64_epi64(pk, 0xD8);
        _mm_storeu_si128((__m128i*)(dst + i), _mm256_castsi256_si128(pk));
      }
#endif
      for (; i < n; ++i) dst[i] = (uint8_t)src[i];
    };
    for (int r = 0; r < f->h; ++r)
      narrow_row(y + (size_t)r * f->w,
                 &p.Y[(size_t)(f->oy + r) * p.wp + f->ox], f->w);
    for (int r = 0; r < ch; ++r) {
      narrow_row(u + (size_t)r * cw, &p.U[(size_t)(coy + r) * p.cw + cox],
                 cw);
      narrow_row(v + (size_t)r * cw, &p.V[(size_t)(coy + r) * p.cw + cox],
                 cw);
    }
  }
  if (f->src.use_count() == 1 && d->frame_pool.size() < 16)
    d->frame_pool.push_back(f->src);
  f->src.reset();
  return 1;
}

long long H265_Errors(void* hp) {
  return static_cast<h265::Decoder*>(hp)->errors;
}

}  // extern "C"
