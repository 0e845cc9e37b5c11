// MPEG-2 slice/macroblock-layer parser for per-macroblock QP (and intra
// luma DC) extraction, directly from the elementary stream.
//
// The reference obtains per-MB quantiser tables from a patched FFmpeg
// (av_frame_get_qp_table / MB DC side data, reference
// Amatsukaze/AMTSource.hpp:371-404) to drive the KDeblock QP-aware
// deblocker. Here the tables are extracted by parsing the ES macroblock
// layer (ISO/IEC 13818-2 section 6.2.4-6.2.6) without reconstructing any
// pixels: coefficient VLCs are decoded only to advance the bit position.
//
// Robustness by construction: any VLC desync inside a slice falls back to
// the slice-header quantiser_scale for the remaining macroblocks of that
// slice and resyncs at the next start code (see ts/mpeg2_tables.py notes).

#include <cstdint>
#include <cstring>
#include <mutex>
#include <vector>

#include "mpeg2_tables.inc"

namespace m2qp {

// q_scale_type == 1 non-linear quantiser_scale mapping (13818-2 tab 7-6)
static const uint8_t NONLINEAR_QSCALE[32] = {
    0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 18, 20, 22,
    24, 28, 32, 36, 40, 44, 48, 52, 56, 64, 72, 80, 88, 96, 104, 112};

constexpr int MBT_QUANT = 0x10;
constexpr int MBT_MOTION_F = 0x08;
constexpr int MBT_MOTION_B = 0x04;
constexpr int MBT_PATTERN = 0x02;
constexpr int MBT_INTRA = 0x01;

// ---------------------------------------------------------------------------

struct BitReader {
  const uint8_t* data = nullptr;
  int64_t pos = 0, end = 0;
  bool err = false;

  uint32_t peek(int n) const {
    uint64_t v = 0;
    int64_t byte = pos >> 3;
    int64_t nbytes = (end + 7) >> 3;
    for (int i = 0; i < 8; i++) {
      v <<= 8;
      if (byte + i < nbytes) v |= data[byte + i];
    }
    int shift = 64 - (int)(pos & 7) - n;
    return (uint32_t)((v >> shift) &
                      ((n == 32) ? 0xFFFFFFFFu : ((1u << n) - 1)));
  }
  uint32_t read(int n) {
    if (pos + n > end) { err = true; pos = end; return 0; }
    uint32_t v = peek(n);
    pos += n;
    return v;
  }
};

struct Vlc {
  int maxlen = 0;
  std::vector<uint32_t> lut;  // (len << 20) | (idx+1); 0 invalid
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
  }
  // returns entry index or -1 (sets r.err)
  int decode(BitReader& r) const {
    int avail = (int)std::min<int64_t>(maxlen, r.end - r.pos);
    if (avail <= 0) { r.err = true; return -1; }
    uint32_t word = r.peek(avail) << (maxlen - avail);
    uint32_t hit = lut[word];
    if (!hit) { r.err = true; return -1; }
    int len = (int)(hit >> 20);
    if (len > avail) { r.err = true; return -1; }
    r.pos += len;
    return (int)(hit & 0xFFFFF) - 1;
  }
};

// Skip LUT for the coefficient loop: an 11-bit probe yields the total
// bits to consume (code + sign; the LUT span automatically covers both
// sign continuations), 255 = EOB, 24 = the fixed-size escape
// (6+6+12 bits), 0 = miss (long code) -> exact Vlc path.
struct SkipVlc {
  static constexpr int BITS = 11;
  std::vector<uint8_t> lut;
  void build(const VlcEntry* e, int n) {
    lut.assign((size_t)1 << BITS, 0);
    auto put = [&](uint32_t code, int len, uint8_t v) {
      uint32_t base = code << (BITS - len);
      uint32_t span = 1u << (BITS - len);
      for (uint32_t p = 0; p < span; p++) lut[base | p] = v;
    };
    for (int i = 0; i < n; i++) {
      if (e[i].v0 < 0) {  // EOB: no sign bit; flag + true length
        if ((int)e[i].len <= BITS)
          put(e[i].code, e[i].len, (uint8_t)(0x80 | e[i].len));
      } else if ((int)e[i].len + 1 <= BITS) {
        put(e[i].code, e[i].len, (uint8_t)(e[i].len + 1));
      }
    }
    put(DCT_ESCAPE_CODE, DCT_ESCAPE_LEN, 24);
  }
};

static Vlc g_addr_inc, g_mbt_i, g_mbt_p, g_mbt_b, g_cbp, g_mc, g_dmv,
    g_dc_luma, g_dc_chroma, g_b14, g_b15;
static SkipVlc g_skip14, g_skip15;
static std::once_flag g_once;

static void init_tables() {
  g_addr_inc.build(B1_ADDR_INC, B1_ADDR_INC_N);
  g_mbt_i.build(B2_MB_TYPE_I, B2_MB_TYPE_I_N);
  g_mbt_p.build(B3_MB_TYPE_P, B3_MB_TYPE_P_N);
  g_mbt_b.build(B4_MB_TYPE_B, B4_MB_TYPE_B_N);
  g_cbp.build(B9_CBP, B9_CBP_N);
  g_mc.build(B10_MOTION_CODE, B10_MOTION_CODE_N);
  g_dmv.build(B11_DMVECTOR, B11_DMVECTOR_N);
  g_dc_luma.build(B12_DC_LUMA, B12_DC_LUMA_N);
  g_dc_chroma.build(B13_DC_CHROMA, B13_DC_CHROMA_N);
  g_b14.build(B14_DCT, B14_DCT_N);
  g_b15.build(B15_DCT, B15_DCT_N);
  g_skip14.build(B14_DCT, B14_DCT_N);
  g_skip15.build(B15_DCT, B15_DCT_N);
}

// ---------------------------------------------------------------------------

struct SeqCtx {
  bool valid = false;
  int width = 0, height = 0;       // incl. size extension bits
  int chroma_format = 1;           // 1=4:2:0 2=4:2:2 3=4:4:4
  bool mpeg2 = false;              // sequence extension seen
  int vertical_size_for_slice = 0;
};

struct PicCtx {
  bool valid = false;
  int coding_type = 0;             // 1 I, 2 P, 3 B
  int temporal_reference = 0;
  int f_code[2][2] = {{15, 15}, {15, 15}};
  int intra_dc_precision = 0;
  int picture_structure = 3;       // 1 top field, 2 bottom, 3 frame
  bool frame_pred_frame_dct = false;
  bool concealment_motion_vectors = false;
  bool q_scale_type = false;
  bool intra_vlc_format = false;
};

struct Decoder {
  SeqCtx seq;
  PicCtx pic;

  Decoder() { std::call_once(g_once, init_tables); }

  int qscale(uint32_t code) const {
    if (code < 1 || code > 31) return 2;
    return pic.q_scale_type ? NONLINEAR_QSCALE[code] : (int)code * 2;
  }

  // ---- headers -----------------------------------------------------------
  bool parse_sequence_header(BitReader& r) {
    seq.width = r.read(12);
    seq.height = r.read(12);
    r.read(4);   // aspect
    r.read(4);   // frame rate code
    r.read(18);  // bit rate
    r.read(1);   // marker
    r.read(10);  // vbv buffer size
    r.read(1);   // constrained
    if (r.read(1))  // load_intra_quantiser_matrix
      for (int i = 0; i < 64; i++) r.read(8);
    if (r.read(1))  // load_non_intra_quantiser_matrix
      for (int i = 0; i < 64; i++) r.read(8);
    seq.valid = !r.err;
    seq.mpeg2 = false;
    return seq.valid;
  }

  void parse_extension(BitReader& r) {
    int id = r.read(4);
    if (id == 1) {  // sequence extension
      r.read(8);    // profile/level
      r.read(1);    // progressive_sequence
      seq.chroma_format = r.read(2);
      seq.width |= r.read(2) << 12;
      seq.height |= r.read(2) << 12;
      r.read(12);   // bit rate ext
      r.read(1);    // marker
      r.read(8);    // vbv ext
      r.read(1);    // low delay
      r.read(2);    // frame rate ext n
      r.read(5);    // frame rate ext d
      seq.mpeg2 = true;
    } else if (id == 8) {  // picture coding extension
      pic.f_code[0][0] = r.read(4);
      pic.f_code[0][1] = r.read(4);
      pic.f_code[1][0] = r.read(4);
      pic.f_code[1][1] = r.read(4);
      pic.intra_dc_precision = r.read(2);
      pic.picture_structure = r.read(2);
      r.read(1);  // top_field_first
      pic.frame_pred_frame_dct = r.read(1);
      pic.concealment_motion_vectors = r.read(1);
      pic.q_scale_type = r.read(1);
      pic.intra_vlc_format = r.read(1);
      r.read(1);  // alternate_scan
      r.read(1);  // repeat_first_field
      r.read(1);  // chroma_420_type
      r.read(1);  // progressive_frame
      if (r.read(1)) {  // composite_display_flag
        r.read(20);
      }
    } else if (id == 3) {  // quant matrix extension
      if (r.read(1)) for (int i = 0; i < 64; i++) r.read(8);
      if (r.read(1)) for (int i = 0; i < 64; i++) r.read(8);
      if (r.read(1)) for (int i = 0; i < 64; i++) r.read(8);
      if (r.read(1)) for (int i = 0; i < 64; i++) r.read(8);
    }
    // other extensions: skipped entirely (we re-sync on start codes)
  }

  bool parse_picture_header(BitReader& r) {
    pic = PicCtx();
    pic.temporal_reference = r.read(10);
    pic.coding_type = r.read(3);
    r.read(16);  // vbv_delay
    if (pic.coding_type == 2 || pic.coding_type == 3) {
      r.read(1);  // full_pel_forward_vector
      r.read(3);  // forward_f_code
    }
    if (pic.coding_type == 3) {
      r.read(1);
      r.read(3);
    }
    while (r.peek(1) == 1 && !r.err) {
      r.read(1);
      r.read(8);  // extra_information_picture
    }
    r.read(1);  // extra_bit_picture == 0
    pic.valid = !r.err && pic.coding_type >= 1 && pic.coding_type <= 3;
    return pic.valid;
  }

  // ---- macroblock layer ----------------------------------------------------
  // decode one motion_vector(r, s); only bit positions matter
  void motion_vector(BitReader& r, int s, bool dmv) {
    for (int t = 0; t < 2; t++) {
      int e = g_mc.decode(r);
      if (e < 0) return;
      int mag = B10_MOTION_CODE[e].v0;
      if (mag != 0) {
        r.read(1);  // sign
        if (pic.f_code[s][t] != 1 && pic.f_code[s][t] != 15)
          r.read(pic.f_code[s][t] - 1);  // motion_residual
        else if (pic.f_code[s][t] != 1)
          r.err = true;  // f_code 15 = forbidden when a vector is present
      }
      if (dmv) {
        if (g_dmv.decode(r) < 0) return;
      }
    }
  }

  void motion_vectors(BitReader& r, int s, int count, bool mv_field,
                      bool dmv) {
    if (count == 1) {
      if (mv_field && !dmv) r.read(1);  // motion_vertical_field_select
      motion_vector(r, s, dmv);
    } else {
      r.read(1);
      motion_vector(r, s, dmv);
      r.read(1);
      motion_vector(r, s, dmv);
    }
  }

  // skip one coefficient block; returns reconstructed DC diff for intra
  // (0 for non-intra), with r.err set on desync
  int block(BitReader& r, bool intra, bool luma) {
    int dc_diff = 0;
    const bool b15 = intra && pic.intra_vlc_format;
    const Vlc& table = b15 ? g_b15 : g_b14;
    const VlcEntry* ents = b15 ? B15_DCT : B14_DCT;
    const uint8_t* skip = (b15 ? g_skip15 : g_skip14).lut.data();
    bool first = true;
    if (intra) {
      const Vlc& dct = luma ? g_dc_luma : g_dc_chroma;
      const VlcEntry* dents = luma ? B12_DC_LUMA : B13_DC_CHROMA;
      int e = dct.decode(r);
      if (e < 0) return 0;
      int size = dents[e].v0;
      if (size) {
        uint32_t bits = r.read(size);
        // dct_diff decode (13818-2 7.2.1)
        if (bits < (1u << (size - 1)))
          dc_diff = (int)bits - (int)(1u << size) + 1;
        else
          dc_diff = (int)bits;
      }
      first = false;
    }
    int n = intra ? 1 : 0;
    while (!r.err) {
      if (first) {
        // non-intra first coefficient: '1s' means (0, +/-1)
        if (r.peek(1) == 1) {
          r.read(1);
          r.read(1);  // sign
          first = false;
          n++;
          continue;
        }
        first = false;
      }
      // one probe covers code + sign for short codes, EOB, and the
      // fixed-size escape (6+6+12). Probing requires enough real bits
      // so the zero-padded tail can't be consumed as a longer code.
      if (r.end - r.pos >= SkipVlc::BITS) {
        uint8_t hit = skip[r.peek(SkipVlc::BITS)];
        if (hit & 0x80) { r.pos += hit & 0x7F; break; }  // EOB
        if (hit) {
          r.pos += hit;
          n++;
          if (n > 64) { r.err = true; return dc_diff; }
          continue;
        }
      }
      // long code or near-end: exact path
      if ((int64_t)DCT_ESCAPE_LEN <= r.end - r.pos &&
          r.peek(DCT_ESCAPE_LEN) == DCT_ESCAPE_CODE) {
        r.pos += DCT_ESCAPE_LEN;
        r.read(6);   // run
        r.read(12);  // signed level
        n++;
        continue;
      }
      int e = table.decode(r);
      if (e < 0) return dc_diff;
      if (ents[e].v0 < 0) break;  // EOB
      r.read(1);  // sign
      n++;
      if (n > 64) { r.err = true; return dc_diff; }
    }
    return dc_diff;
  }

  // parse one slice; fills qp (and dc) for macroblocks it covers.
  // returns true if the slice parsed without desync.
  bool parse_slice(BitReader& r, int vertical_pos, int mb_width,
                   int mb_height, uint8_t* qp, int16_t* dc, int& mbs_done) {
    bool frame_pic = pic.picture_structure == 3;
    int mb_row = vertical_pos - 1;
    if (seq.height > 2800) mb_row = (r.read(3) << 7) + vertical_pos - 1;
    if (mb_row >= mb_height) { r.err = true; return false; }
    int cur_q = qscale(r.read(5));
    if (r.peek(1) == 1) {
      r.read(1);  // slice_extension_flag
      r.read(1);  // intra_slice
      r.read(7);  // reserved_bits
      while (r.peek(1) == 1 && !r.err) {
        r.read(1);
        r.read(8);
      }
    }
    r.read(1);  // extra_bit_slice == 0

    int mb_x = -1;  // before first increment
    int block_count = seq.chroma_format == 1 ? 6
                      : seq.chroma_format == 2 ? 8 : 12;
    const Vlc& mbt_table = pic.coding_type == 1 ? g_mbt_i
                           : pic.coding_type == 2 ? g_mbt_p : g_mbt_b;
    const VlcEntry* mbt_ents = pic.coding_type == 1 ? B2_MB_TYPE_I
                               : pic.coding_type == 2 ? B3_MB_TYPE_P
                                                      : B4_MB_TYPE_B;
    auto set_qp = [&](int x) {
      if (x >= 0 && x < mb_width && mb_row < mb_height) {
        qp[mb_row * mb_width + x] = (uint8_t)cur_q;
      }
    };

    bool ok = true;
    while (true) {
      // slice ends when the remaining bits are all zero (start-code
      // prefix / byte-align stuffing); peek zero-pads past the end, so
      // one check covers tails shorter than 23 bits too
      if (r.end - r.pos <= 0 || r.peek(23) == 0) break;
      // macroblock_escape runs
      while (r.end - r.pos >= ADDR_INC_ESCAPE_LEN &&
             r.peek(ADDR_INC_ESCAPE_LEN) == ADDR_INC_ESCAPE_CODE) {
        r.pos += ADDR_INC_ESCAPE_LEN;
        for (int i = 0; i < 33; i++) { mb_x++; set_qp(mb_x); }
      }
      int e = g_addr_inc.decode(r);
      if (e < 0) { ok = false; break; }
      int inc = B1_ADDR_INC[e].v0;
      for (int i = 0; i < inc; i++) { mb_x++; set_qp(mb_x); }
      if (mb_x >= mb_width) { ok = false; break; }
      mbs_done++;

      // macroblock_modes
      e = mbt_table.decode(r);
      if (e < 0) { ok = false; break; }
      int mbt = mbt_ents[e].v0;
      bool intra = mbt & MBT_INTRA;
      bool motion_f = mbt & MBT_MOTION_F;
      bool motion_b = mbt & MBT_MOTION_B;
      bool pattern = mbt & MBT_PATTERN;

      int motion_type = 2;  // frame-based / field-based-in-field-picture
      if (motion_f || motion_b) {
        if (frame_pic) {
          if (!pic.frame_pred_frame_dct) motion_type = r.read(2);
        } else {
          motion_type = r.read(2);
        }
      } else if (intra && pic.concealment_motion_vectors) {
        motion_type = frame_pic ? 2 : 1;
      }
      // mv layout from motion type (13818-2 tables 6-17/6-18)
      int mv_count = 1;
      bool mv_field_fmt = !frame_pic;
      bool dmv = false;
      if (frame_pic) {
        if (motion_type == 1) { mv_count = 2; mv_field_fmt = true; }
        else if (motion_type == 3) { dmv = true; mv_field_fmt = true; }
      } else {
        if (motion_type == 2) mv_count = 2;
        else if (motion_type == 3) dmv = true;
      }
      if ((frame_pic && !pic.frame_pred_frame_dct && (intra || pattern)))
        r.read(1);  // dct_type
      if (mbt & MBT_QUANT) cur_q = qscale(r.read(5));
      set_qp(mb_x);  // mquant applies to this macroblock

      if (motion_f || (intra && pic.concealment_motion_vectors))
        motion_vectors(r, 0, intra ? 1 : mv_count,
                       intra ? !frame_pic : mv_field_fmt,
                       intra ? false : dmv);
      if (motion_b) motion_vectors(r, 1, mv_count, mv_field_fmt, dmv);
      if (intra && pic.concealment_motion_vectors) r.read(1);  // marker

      int cbp = 0;
      if (pattern) {
        e = g_cbp.decode(r);
        if (e < 0) { ok = false; break; }
        cbp = B9_CBP[e].v0;
        if (seq.chroma_format == 2) cbp = (cbp << 2) | r.read(2);
        else if (seq.chroma_format == 3) cbp = (cbp << 6) | r.read(6);
      } else if (intra) {
        cbp = (1 << block_count) - 1;
      }

      int dc_sum = 0;
      for (int b = 0; b < block_count; b++) {
        bool coded = (cbp >> (block_count - 1 - b)) & 1;
        if (!coded) continue;
        int d = block(r, intra, b < 4);
        if (b < 4) dc_sum += d;
      }
      if (intra && dc) {
        // mean luma DC *differential* in the coded scale; enough signal
        // for deblock-strength decisions (absolute DC needs prediction
        // chains which the deblocker does not use)
        int idx = mb_row * mb_width + mb_x;
        if (mb_x >= 0 && mb_x < mb_width && mb_row < mb_height)
          dc[idx] = (int16_t)std::max(-32768, std::min(32767, dc_sum / 4));
      }
      if (r.err) { ok = false; break; }
    }

    // desync fallback: remaining MBs of this row keep the last good QP
    if (!ok) {
      for (int x = std::max(mb_x, 0); x < mb_width; x++) set_qp(x);
    }
    return ok;
  }
};

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------

struct Handle {
  Decoder dec;
};

}  // namespace m2qp

extern "C" {

void* Mpeg2Qp_Create() { return new m2qp::Handle(); }
void Mpeg2Qp_Destroy(void* h) { delete static_cast<m2qp::Handle*>(h); }

// Parse an ES segment holding one coded picture (plus any preceding
// sequence/GOP headers). Fills qp/dc (each cap ints long, row-major
// [mb_height][mb_width]) and info[8] = {mb_width, mb_height,
// picture_coding_type, picture_structure, temporal_reference,
// slices_ok, slices_fallback, chroma_format}.
// Returns mb_width*mb_height (>0), 0 if no picture found, <0 on error.
int Mpeg2Qp_Parse(void* hp, const uint8_t* data, long long len,
                  uint8_t* qp, int16_t* dc, int* info, int cap) {
  using namespace m2qp;
  Decoder& d = static_cast<Handle*>(hp)->dec;

  // start-code scan
  int64_t i = 0;
  bool saw_picture = false;
  int mb_width = 0, mb_height = 0;
  int slices_ok = 0, slices_bad = 0, mbs_done = 0;
  while (i + 4 <= len) {
    if (!(data[i] == 0 && data[i + 1] == 0 && data[i + 2] == 1)) {
      i++;
      continue;
    }
    int code = data[i + 3];
    int64_t payload = i + 4;
    // find next start code to bound this unit
    int64_t j = payload;
    while (j + 3 <= len &&
           !(data[j] == 0 && data[j + 1] == 0 && data[j + 2] == 1))
      j++;
    int64_t unit_end = (j + 3 <= len) ? j : len;
    BitReader r{data, payload * 8, unit_end * 8, false};

    if (code == 0xB3) {
      d.parse_sequence_header(r);
    } else if (code == 0xB5) {
      d.parse_extension(r);
    } else if (code == 0x00) {
      if (saw_picture) break;  // next picture: stop
      if (!d.parse_picture_header(r)) return -2;
      saw_picture = true;
    } else if (code >= 0x01 && code <= 0xAF) {
      if (!saw_picture || !d.seq.valid) { i = unit_end; continue; }
      if (!mb_width) {
        mb_width = (d.seq.width + 15) / 16;
        int frame_mb_h = (d.seq.height + 15) / 16;
        if (d.pic.picture_structure != 3)
          frame_mb_h = (d.seq.height / 2 + 15) / 16;
        mb_height = frame_mb_h;
        if (mb_width * mb_height > cap) return -3;
        std::memset(qp, 0, (size_t)mb_width * mb_height);
        if (dc)
          std::memset(dc, 0, (size_t)mb_width * mb_height * sizeof(int16_t));
      }
      if (d.parse_slice(r, code, mb_width, mb_height, qp, dc, mbs_done))
        slices_ok++;
      else
        slices_bad++;
    }
    i = unit_end;
  }
  if (!saw_picture || !mb_width) return 0;
  // hole fill: quantiser code 0 is forbidden, so qp==0 marks MBs no slice
  // covered; take the nearest value to the left in the row
  for (int row = 0; row < mb_height; row++) {
    uint8_t last = 0;
    for (int x = 0; x < mb_width; x++) {
      uint8_t& v = qp[row * mb_width + x];
      if (v) last = v;
      else if (last) v = last;
    }
  }
  // fill any rows no slice covered with the nearest covered row's values
  for (int row = 0; row < mb_height; row++) {
    bool empty = true;
    for (int x = 0; x < mb_width; x++)
      if (qp[row * mb_width + x]) { empty = false; break; }
    if (empty && row > 0)
      std::memcpy(qp + row * mb_width, qp + (row - 1) * mb_width, mb_width);
  }
  for (int row = mb_height - 2; row >= 0; row--) {
    bool empty = true;
    for (int x = 0; x < mb_width; x++)
      if (qp[row * mb_width + x]) { empty = false; break; }
    if (empty)
      std::memcpy(qp + row * mb_width, qp + (row + 1) * mb_width, mb_width);
  }
  info[0] = mb_width;
  info[1] = mb_height;
  info[2] = d.pic.coding_type;
  info[3] = d.pic.picture_structure;
  info[4] = d.pic.temporal_reference;
  info[5] = slices_ok;
  info[6] = slices_bad;
  info[7] = d.seq.chroma_format;
  return mb_width * mb_height;
}

}  // extern "C"
