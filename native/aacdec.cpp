// Native AAC-LC ADTS decoder — the steady-state audio hot loop.
//
// Replaces the reference's vendored libfaad (reference: libfaad/*.c,
// consumed via Amatsukaze/AdtsParser.hpp:174-327) with an in-build
// decoder. Semantics mirror amatsukaze_tpu/audio/aac.py (the golden
// oracle, kept as the pure-Python fallback): SCE/CPE/LFE elements,
// long/start/short/stop window sequences, sine + KBD windows, TNS,
// M/S + intensity stereo, pulse data, and the per-element bit ranges
// the dual-mono splitter needs (the reference patches libfaad to export
// element_start/element_end, AdtsParser.hpp:465-467).
//
// Built into libamatsukaze_native.so next to the TS demux engine;
// loaded via ctypes (amatsukaze_tpu/audio/aac_native.py).

#include <algorithm>
#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <vector>

#include "aac_tables.inc"

namespace aac {

constexpr int ONLY_LONG = 0;
constexpr int LONG_START = 1;
constexpr int EIGHT_SHORT = 2;
constexpr int LONG_STOP = 3;

enum {
  ID_SCE = 0, ID_CPE = 1, ID_CCE = 2, ID_LFE = 3,
  ID_DSE = 4, ID_PCE = 5, ID_FIL = 6, ID_END = 7,
};

constexpr int ZERO_HCB = 0;
constexpr int ESC_HCB = 11;
constexpr int NOISE_HCB = 13;
constexpr int INTENSITY_HCB2 = 14;
constexpr int INTENSITY_HCB = 15;

constexpr int N_LONG = 2048;   // long IMDCT size
constexpr int N_SHORT = 256;   // short IMDCT size
constexpr int HALF = 1024;     // samples per frame per channel
constexpr int MAX_CH = 24;     // 22.2ch is the broadcast maximum
constexpr int MAX_ELEMS = 24;
constexpr int MAX_SFB = 64;

// (long, short) TNS sfb limits per sample-rate index (ISO 13818-7 Tab 8.9)
static const int TNS_MAX_SFB[12][2] = {
    {31, 9}, {31, 9}, {34, 10}, {40, 14}, {42, 14}, {51, 14},
    {46, 14}, {46, 14}, {42, 14}, {42, 14}, {42, 14}, {39, 14},
};
static const int SAMPLE_RATE_HZ[12] = {
    96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000};

// ---------------------------------------------------------------------------
// bit reader (MSB first, zero-padded peek, sticky error on overrun)
// ---------------------------------------------------------------------------

struct BitReader {
  const uint8_t* data = nullptr;
  int64_t pos = 0;   // bit offset from buffer start
  int64_t end = 0;   // total bits
  bool err = false;

  // zero-padded peek of up to 32 bits; does not advance or set err
  uint32_t peek(int n) const {
    if (n == 0) return 0;
    uint64_t v = 0;
    int64_t byte = pos >> 3;
    int64_t nbytes = (end + 7) >> 3;
    for (int i = 0; i < 8; i++) {
      v <<= 8;
      if (byte + i < nbytes) v |= data[byte + i];
    }
    int shift = 64 - (int)(pos & 7) - n;
    return (uint32_t)((v >> shift) & ((n == 32) ? 0xFFFFFFFFu
                                                : ((1u << n) - 1)));
  }

  uint32_t read(int n) {
    if (pos + n > end) { err = true; pos = end; return 0; }
    uint32_t v = peek(n);
    pos += n;
    return v;
  }

  void skip(int64_t n) {
    if (pos + n > end) { err = true; pos = end; return; }
    pos += n;
  }
};

#include "aachuff.inc"
#include "aacps.inc"
#include "aacsbr.inc"

// ---------------------------------------------------------------------------
// huffman: per-book full-width LUT (entry = (len << 16) | index)
// ---------------------------------------------------------------------------

struct HuffBook {
  const HuffEntry* entries = nullptr;
  int dim = 0;
  int maxlen = 0;
  std::vector<uint32_t> lut;  // size 1 << maxlen, 0 = invalid

  void build(const HuffEntry* e, int n, int d) {
    entries = e;
    dim = d;
    maxlen = 0;
    for (int i = 0; i < n; i++) maxlen = std::max(maxlen, (int)e[i].len);
    lut.assign((size_t)1 << maxlen, 0);
    for (int i = 0; i < n; i++) {
      int len = e[i].len;
      uint32_t base = e[i].code << (maxlen - len);
      uint32_t span = 1u << (maxlen - len);
      uint32_t packed = ((uint32_t)len << 16) | (uint32_t)i;
      for (uint32_t p = 0; p < span; p++) lut[base | p] = packed;
    }
  }

  // returns entry index or -1 (and sets r.err)
  int decode(BitReader& r) const {
    int avail = (int)std::min<int64_t>(maxlen, r.end - r.pos);
    if (avail <= 0) { r.err = true; return -1; }
    uint32_t word = r.peek(avail) << (maxlen - avail);
    uint32_t hit = lut[word];
    if (hit == 0) { r.err = true; return -1; }
    int len = (int)(hit >> 16);
    if (len > avail) { r.err = true; return -1; }
    r.pos += len;
    return (int)(hit & 0xFFFF);
  }
};

static HuffBook g_books[12];  // [1..11]
static HuffBook g_sf_book;
static std::once_flag g_init_once;

static void init_tables() {
  g_books[1].build(HCB_1, HCB_1_N, HCB_1_DIM);
  g_books[2].build(HCB_2, HCB_2_N, HCB_2_DIM);
  g_books[3].build(HCB_3, HCB_3_N, HCB_3_DIM);
  g_books[4].build(HCB_4, HCB_4_N, HCB_4_DIM);
  g_books[5].build(HCB_5, HCB_5_N, HCB_5_DIM);
  g_books[6].build(HCB_6, HCB_6_N, HCB_6_DIM);
  g_books[7].build(HCB_7, HCB_7_N, HCB_7_DIM);
  g_books[8].build(HCB_8, HCB_8_N, HCB_8_DIM);
  g_books[9].build(HCB_9, HCB_9_N, HCB_9_DIM);
  g_books[10].build(HCB_10, HCB_10_N, HCB_10_DIM);
  g_books[11].build(HCB_11, HCB_11_N, HCB_11_DIM);
  g_sf_book.build(HCB_SF, HCB_SF_N, HCB_SF_DIM);
}

// ---------------------------------------------------------------------------
// FFT-based IMDCT (mirrors _Transforms in audio/aac.py: DCT-IV via a
// 2M-point complex FFT with pre/post twiddles, then the odd/even
// symmetry gather)
// ---------------------------------------------------------------------------

struct Cplx { double re, im; };

struct FFTPlan {
  int n = 0;                 // complex FFT size (power of two)
  std::vector<int> rev;      // bit-reversal permutation
  std::vector<Cplx> tw;      // stage twiddles, flattened

  void build(int size) {
    n = size;
    rev.resize(n);
    int log2n = 0;
    while ((1 << log2n) < n) log2n++;
    for (int i = 0; i < n; i++) {
      int r = 0;
      for (int b = 0; b < log2n; b++) r |= ((i >> b) & 1) << (log2n - 1 - b);
      rev[i] = r;
    }
    tw.resize(n);  // per half-size m: twiddles exp(-2*pi*i*k/(2m)) at k<m
    for (int m = 1, off = 0; m < n; m <<= 1, off += m >> 1) {
      for (int k = 0; k < m; k++) {
        double a = -M_PI * k / m;
        tw[(size_t)m - 1 + k] = {std::cos(a), std::sin(a)};
      }
    }
  }

  // in-place forward FFT (numpy sign convention)
  void run(Cplx* x) const {
    for (int i = 0; i < n; i++) {
      int j = rev[i];
      if (j > i) std::swap(x[i], x[j]);
    }
    for (int m = 1; m < n; m <<= 1) {
      const Cplx* w = &tw[(size_t)m - 1];
      for (int s = 0; s < n; s += 2 * m) {
        for (int k = 0; k < m; k++) {
          Cplx a = x[s + k];
          Cplx b = x[s + k + m];
          double tre = b.re * w[k].re - b.im * w[k].im;
          double tim = b.re * w[k].im + b.im * w[k].re;
          x[s + k] = {a.re + tre, a.im + tim};
          x[s + k + m] = {a.re - tre, a.im - tim};
        }
      }
    }
  }
};

struct Imdct {
  int n = 0;  // IMDCT size (2048 or 256); m = n/2
  FFTPlan fft;
  std::vector<Cplx> pre, post;
  std::vector<int> gather;
  std::vector<double> scale;
  mutable std::vector<Cplx> buf;

  void build(int size) {
    n = size;
    int m = n / 2;
    fft.build(2 * m);
    pre.resize(m);
    post.resize(m);
    for (int k = 0; k < m; k++) {
      double a = -M_PI * k / (2.0 * m);
      pre[k] = {std::cos(a), std::sin(a)};
      double b = -M_PI * (2.0 * k + 1) / (4.0 * m);
      post[k] = {std::cos(b), std::sin(b)};
    }
    gather.resize(n);
    scale.resize(n);
    for (int t = 0; t < n; t++) {
      int idx = t + m / 2;
      int g;
      double s;
      if (idx >= 2 * m) { g = idx - 2 * m; s = -1.0; }
      else if (idx >= m) { g = 2 * m - 1 - idx; s = -1.0; }
      else { g = idx; s = 1.0; }
      gather[t] = g;
      scale[t] = s * 2.0 / n;
    }
    buf.resize(2 * m);
  }

  // spec: m floats -> out: n doubles
  void run(const float* spec, double* out) const {
    int m = n / 2;
    for (int k = 0; k < m; k++) {
      double v = spec[k];
      buf[k] = {v * pre[k].re, v * pre[k].im};
    }
    for (int k = m; k < 2 * m; k++) buf[k] = {0.0, 0.0};
    fft.run(buf.data());
    // d[k] = Re(post[k] * FFT[k]); out[t] = d[gather[t]] * scale[t]
    static thread_local std::vector<double> d;
    d.resize(m);
    for (int k = 0; k < m; k++)
      d[k] = post[k].re * buf[k].re - post[k].im * buf[k].im;
    for (int t = 0; t < n; t++) out[t] = d[gather[t]] * scale[t];
  }
};

// ---------------------------------------------------------------------------
// windows (sine + Kaiser-Bessel-derived, mirrors audio/aac.py)
// ---------------------------------------------------------------------------

static double bessel_i0(double x) {
  // power series: converges quickly for |x| <= ~20 (max arg here ~18.9)
  double sum = 1.0, term = 1.0;
  double hx = x / 2.0;
  for (int k = 1; k < 64; k++) {
    term *= (hx / k) * (hx / k);
    sum += term;
    if (term < 1e-21 * sum) break;
  }
  return sum;
}

static void sine_window(int n, double* w) {
  for (int i = 0; i < n; i++) w[i] = std::sin(M_PI / n * (i + 0.5));
}

static void kbd_window(int n, double alpha, double* w) {
  int half = n / 2;
  std::vector<double> v(half + 1);
  for (int j = 0; j <= half; j++) {
    double t = 2.0 * j / half - 1.0;
    double arg = M_PI * alpha * std::sqrt(std::max(0.0, 1.0 - t * t));
    v[j] = bessel_i0(arg);
  }
  std::vector<double> cum(half + 1);
  double acc = 0.0;
  for (int j = 0; j <= half; j++) { acc += v[j]; cum[j] = acc; }
  for (int j = 0; j < half; j++) {
    double x = std::sqrt(cum[j] / cum[half]);
    w[j] = x;
    w[n - 1 - j] = x;
  }
}

// ---------------------------------------------------------------------------
// per-channel syntax state
// ---------------------------------------------------------------------------

struct ICSInfo {
  int window_sequence = ONLY_LONG;
  int window_shape = 0;
  int max_sfb = 0;
  int num_windows = 1;
  int num_window_groups = 1;
  int group_lens[8] = {1};
  const int* swb_offset = nullptr;
  int num_swb = 0;
};

struct TnsFilt {
  int length = 0, order = 0, direction = 0, coef_compress = 0;
  int coef[32];
};

struct TnsData {
  bool present = false;
  int n_filt[8] = {0};
  int coef_res[8] = {0};
  TnsFilt filt[8][4];
};

struct ChannelData {
  ICSInfo ics;
  int global_gain = 0;
  uint8_t sect_cb[8][MAX_SFB];
  int scale_factors[8][MAX_SFB];
  int32_t quant[HALF];       // grouped layout (see qoff below)
  float spec[8][HALF];       // [window][bin]; long uses spec[0][0..1023]
  TnsData tns;
  bool pulse_present = false;
  int pulse_start_sfb = 0, pulse_n = 0;
  int pulse_offsets[4], pulse_amps[4];
};

// grouped-layout offset of (group, sfb) start, mirroring the sequential
// band list in aac.py _spectral_data/_dequantize
static int qoff(const ICSInfo& ics, int g, int sfb) {
  int base = 0;
  for (int gg = 0; gg < g; gg++)
    base += ics.group_lens[gg] * ics.swb_offset[ics.max_sfb];
  return base + ics.group_lens[g] * ics.swb_offset[sfb];
}

// ---------------------------------------------------------------------------
// decoder
// ---------------------------------------------------------------------------

struct Decoder {
  Imdct imdct_long, imdct_short;
  double win_long[2][N_LONG];    // [shape][i]
  double win_short[2][N_SHORT];
  double overlap[MAX_CH][HALF];
  int prev_shape[MAX_CH];
  bool seen[MAX_CH];

  // scratch channel data (2 at a time for CPE)
  ChannelData chbuf[2];
  double pcm[MAX_CH][HALF];
  bool sbr_detected = false;  // sticky: an SBR fill element was seen
  // --- SBR (HE-AAC v1) state: one decoder per audio element ordinal
  // (mirrors aac.py's self.sbr keyed by (ide, ordinal)) ---
  sbr::SbrDec* sbr_dec[MAX_ELEMS] = {};
  int sbr_dec_ide[MAX_ELEMS] = {};
  bool sbr_active = false;   // sticky: apply SBR to every later frame
  uint8_t sbr_payload[MAX_ELEMS][1024];
  int sbr_payload_len[MAX_ELEMS];
  int elem_ch_start[MAX_ELEMS], elem_nch[MAX_ELEMS];
  double sbr_out[MAX_CH][2 * HALF];
  int out_samples = HALF;  // 2*HALF when SBR ran on the last frame

  Decoder() {
    std::call_once(g_init_once, init_tables);
    imdct_long.build(N_LONG);
    imdct_short.build(N_SHORT);
    sine_window(N_LONG, win_long[0]);
    kbd_window(N_LONG, 4.0, win_long[1]);
    sine_window(N_SHORT, win_short[0]);
    kbd_window(N_SHORT, 6.0, win_short[1]);
    reset();
  }

  ~Decoder() {
    for (int i = 0; i < MAX_ELEMS; i++) delete sbr_dec[i];
  }

  void reset() {
    std::memset(overlap, 0, sizeof(overlap));
    std::memset(prev_shape, 0, sizeof(prev_shape));
    std::memset(seen, 0, sizeof(seen));
    for (int i = 0; i < MAX_ELEMS; i++) {
      delete sbr_dec[i];
      sbr_dec[i] = nullptr;
    }
    sbr_active = false;
    out_samples = HALF;
  }

  // ----------------------------------------------------------- syntax
  bool ics_info(BitReader& r, int sr_index, ICSInfo& ics) {
    r.read(1);  // ics_reserved_bit
    ics.window_sequence = r.read(2);
    ics.window_shape = r.read(1);
    if (ics.window_sequence == EIGHT_SHORT) {
      ics.max_sfb = r.read(4);
      int sfg = r.read(7);
      ics.num_windows = 8;
      ics.num_window_groups = 1;
      ics.group_lens[0] = 1;
      for (int b = 6; b >= 0; b--) {
        if ((sfg >> b) & 1) ics.group_lens[ics.num_window_groups - 1]++;
        else ics.group_lens[ics.num_window_groups++] = 1;
      }
      ics.swb_offset = SWB_SHORT[sr_index];
      ics.num_swb = SWB_SHORT_LEN[sr_index] - 1;
    } else {
      ics.max_sfb = r.read(6);
      if (r.read(1)) return false;  // predictor data: illegal in LC
      ics.num_windows = 1;
      ics.num_window_groups = 1;
      ics.group_lens[0] = 1;
      ics.swb_offset = SWB_LONG[sr_index];
      ics.num_swb = SWB_LONG_LEN[sr_index] - 1;
    }
    if (ics.max_sfb > ics.num_swb) return false;
    return !r.err;
  }

  bool section_data(BitReader& r, ChannelData& ch) {
    const ICSInfo& ics = ch.ics;
    int bits = ics.window_sequence == EIGHT_SHORT ? 3 : 5;
    int esc = (1 << bits) - 1;
    for (int g = 0; g < ics.num_window_groups; g++) {
      std::memset(ch.sect_cb[g], ZERO_HCB, MAX_SFB);
      int k = 0;
      while (k < ics.max_sfb) {
        int cb = r.read(4);
        int length = 0;
        while (true) {
          int inc = r.read(bits);
          length += inc;
          if (inc != esc) break;
          if (r.err) return false;
        }
        if (k + length > ics.max_sfb) return false;
        for (int sfb = k; sfb < k + length; sfb++)
          ch.sect_cb[g][sfb] = (uint8_t)cb;
        k += length;
        if (r.err) return false;
      }
    }
    return !r.err;
  }

  bool scale_factors(BitReader& r, ChannelData& ch) {
    const ICSInfo& ics = ch.ics;
    int sf = ch.global_gain;
    int is_pos = 0;
    int noise_nrg = ch.global_gain - 90;
    bool noise_first = true;
    for (int g = 0; g < ics.num_window_groups; g++) {
      for (int sfb = 0; sfb < ics.max_sfb; sfb++) {
        int cb = ch.sect_cb[g][sfb];
        ch.scale_factors[g][sfb] = 0;
        if (cb == ZERO_HCB) continue;
        if (cb == INTENSITY_HCB || cb == INTENSITY_HCB2) {
          int e = g_sf_book.decode(r);
          if (e < 0) return false;
          is_pos += HCB_SF[e].v[0] - 60;
          ch.scale_factors[g][sfb] = is_pos;
        } else if (cb == NOISE_HCB) {
          if (noise_first) {
            noise_nrg += (int)r.read(9) - 256;
            noise_first = false;
          } else {
            int e = g_sf_book.decode(r);
            if (e < 0) return false;
            noise_nrg += HCB_SF[e].v[0] - 60;
          }
          ch.scale_factors[g][sfb] = noise_nrg;
        } else {
          int e = g_sf_book.decode(r);
          if (e < 0) return false;
          sf += HCB_SF[e].v[0] - 60;
          ch.scale_factors[g][sfb] = sf;
        }
      }
    }
    return !r.err;
  }

  bool tns_data(BitReader& r, ChannelData& ch) {
    const ICSInfo& ics = ch.ics;
    bool shortw = ics.window_sequence == EIGHT_SHORT;
    int n_filt_bits = shortw ? 1 : 2;
    int len_bits = shortw ? 4 : 6;
    int order_bits = shortw ? 3 : 5;
    ch.tns.present = true;
    for (int w = 0; w < ics.num_windows; w++) {
      int n_filt = r.read(n_filt_bits);
      ch.tns.n_filt[w] = n_filt;
      int coef_res = 0;
      if (n_filt) coef_res = r.read(1);
      ch.tns.coef_res[w] = coef_res;
      for (int f = 0; f < n_filt; f++) {
        TnsFilt& tf = ch.tns.filt[w][f];
        tf.length = r.read(len_bits);
        tf.order = r.read(order_bits);
        tf.direction = 0;
        tf.coef_compress = 0;
        if (tf.order > 31) return false;
        if (tf.order) {
          tf.direction = r.read(1);
          tf.coef_compress = r.read(1);
          int coef_bits = coef_res + 3 - tf.coef_compress;
          for (int i = 0; i < tf.order; i++) tf.coef[i] = r.read(coef_bits);
        }
      }
    }
    return !r.err;
  }

  bool spectral_data(BitReader& r, ChannelData& ch) {
    const ICSInfo& ics = ch.ics;
    std::memset(ch.quant, 0, sizeof(ch.quant));
    for (int g = 0; g < ics.num_window_groups; g++) {
      int glen = ics.group_lens[g];
      for (int sfb = 0; sfb < ics.max_sfb; sfb++) {
        int cb = ch.sect_cb[g][sfb];
        int width = ics.swb_offset[sfb + 1] - ics.swb_offset[sfb];
        int total = width * glen;
        if (cb == ZERO_HCB || cb >= NOISE_HCB) continue;
        if (cb > ESC_HCB) return false;
        const HuffBook& book = g_books[cb];
        bool is_signed = (cb == 1 || cb == 2 || cb == 5 || cb == 6);
        int32_t* out = ch.quant + qoff(ics, g, sfb);
        int got = 0;
        while (got < total) {
          int e = book.decode(r);
          if (e < 0) return false;
          int32_t tup[4];
          for (int i = 0; i < book.dim; i++) tup[i] = book.entries[e].v[i];
          if (!is_signed) {
            for (int i = 0; i < book.dim; i++) {
              if (tup[i]) {
                if (r.read(1)) tup[i] = -tup[i];
              }
            }
          }
          if (cb == ESC_HCB) {
            for (int i = 0; i < book.dim; i++) {
              if (tup[i] == 16 || tup[i] == -16) {
                int n = 4;
                while (r.read(1)) {
                  n++;
                  if (n > 24 || r.err) return false;
                }
                int32_t mag = (1 << n) + (int32_t)r.read(n);
                tup[i] = tup[i] < 0 ? -mag : mag;
              }
            }
          }
          // mirror python: a tuple overrunning the band fails the frame
          if (got + book.dim > total) return false;
          for (int i = 0; i < book.dim; i++, got++) out[got] = tup[i];
          if (r.err) return false;
        }
      }
    }
    return !r.err;
  }

  bool individual_channel_stream(BitReader& r, int sr_index,
                                 const ICSInfo* common, ChannelData& ch) {
    ch.tns.present = false;
    ch.pulse_present = false;
    ch.global_gain = r.read(8);
    if (common) ch.ics = *common;
    else if (!ics_info(r, sr_index, ch.ics)) return false;
    if (!section_data(r, ch)) return false;
    if (!scale_factors(r, ch)) return false;
    if (r.read(1)) {  // pulse_data_present
      if (ch.ics.window_sequence == EIGHT_SHORT) return false;
      ch.pulse_present = true;
      ch.pulse_n = r.read(2) + 1;
      ch.pulse_start_sfb = r.read(6);
      // python indexes swb_offset[start_sfb] (len num_swb+1): OOB fails
      if (ch.pulse_start_sfb > ch.ics.num_swb) return false;
      for (int i = 0; i < ch.pulse_n; i++) {
        ch.pulse_offsets[i] = r.read(5);
        ch.pulse_amps[i] = r.read(4);
      }
    }
    if (r.read(1)) {  // tns_data_present
      if (!tns_data(r, ch)) return false;
    }
    if (r.read(1)) return false;  // gain control: illegal in LC
    if (!spectral_data(r, ch)) return false;
    return !r.err;
  }

  // ----------------------------------------------------------- numerics
  bool dequantize(ChannelData& ch) {
    const ICSInfo& ics = ch.ics;
    int nw = ics.num_windows;
    int size = nw == 1 ? HALF : N_SHORT / 2;
    for (int w = 0; w < nw; w++) std::memset(ch.spec[w], 0, sizeof(float) * size);
    int win0 = 0;
    for (int g = 0; g < ics.num_window_groups; g++) {
      int glen = ics.group_lens[g];
      for (int sfb = 0; sfb < ics.max_sfb; sfb++) {
        int cb = ch.sect_cb[g][sfb];
        if (cb == ZERO_HCB || cb >= NOISE_HCB) continue;
        int lo = ics.swb_offset[sfb];
        int hi = ics.swb_offset[sfb + 1];
        int width = hi - lo;
        double gain = std::pow(2.0, 0.25 * (ch.scale_factors[g][sfb] - 100));
        const int32_t* vals = ch.quant + qoff(ics, g, sfb);
        for (int wi = 0; wi < glen; wi++) {
          float* dst = ch.spec[win0 + wi] + lo;
          const int32_t* src = vals + wi * width;
          for (int k = 0; k < width; k++) {
            double a = src[k];
            double d = std::copysign(std::pow(std::fabs(a), 4.0 / 3.0), a)
                       * gain;
            dst[k] = (float)d;
          }
        }
      }
      win0 += glen;
    }
    // pulse data (long windows only): applied to the QUANTIZED values
    if (ch.pulse_present) {
      int k = ics.swb_offset[ch.pulse_start_sfb];
      for (int i = 0; i < ch.pulse_n; i++) {
        k += ch.pulse_offsets[i];
        if (k >= HALF) return false;  // python: spec[0, k] IndexError
        int sfb = 0;
        while (sfb + 1 < ics.num_swb + 1 && ics.swb_offset[sfb + 1] <= k)
          sfb++;
        if (sfb >= ics.max_sfb) continue;
        int cb = ch.sect_cb[0][sfb];
        if (cb == ZERO_HCB || cb >= NOISE_HCB) continue;
        int lo = ics.swb_offset[sfb];
        int32_t q = ch.quant[qoff(ics, 0, sfb) + (k - lo)];
        q = q >= 0 ? q + ch.pulse_amps[i] : q - ch.pulse_amps[i];
        double gain = std::pow(2.0, 0.25 * (ch.scale_factors[0][sfb] - 100));
        ch.spec[0][k] = (float)(std::copysign(
            std::pow(std::fabs((double)q), 4.0 / 3.0), (double)q) * gain);
      }
    }
    return true;
  }

  void stereo_tools(ChannelData& ch1, ChannelData& ch2, int ms_mask,
                    const uint8_t ms_used[8][MAX_SFB]) {
    const ICSInfo& ics = ch1.ics;
    int win0 = 0;
    int max_sfb = std::min(ics.max_sfb, ch2.ics.max_sfb);
    for (int g = 0; g < ics.num_window_groups; g++) {
      int glen = ics.group_lens[g];
      for (int sfb = 0; sfb < max_sfb; sfb++) {
        int lo = ics.swb_offset[sfb];
        int hi = ics.swb_offset[sfb + 1];
        int cb2 = ch2.sect_cb[g][sfb];
        bool ms_on = (ms_mask == 2) ||
                     (ms_mask == 1 && ms_used && ms_used[g][sfb]);
        if (cb2 == INTENSITY_HCB || cb2 == INTENSITY_HCB2) {
          double sign = cb2 == INTENSITY_HCB ? 1.0 : -1.0;
          if (ms_on) sign = -sign;
          double scale = sign *
              std::pow(2.0, -0.25 * ch2.scale_factors[g][sfb]);
          for (int wi = 0; wi < glen; wi++)
            for (int k = lo; k < hi; k++)
              ch2.spec[win0 + wi][k] =
                  (float)(ch1.spec[win0 + wi][k] * scale);
        } else if (ms_on && cb2 != NOISE_HCB) {
          for (int wi = 0; wi < glen; wi++) {
            float* l = ch1.spec[win0 + wi];
            float* rr = ch2.spec[win0 + wi];
            for (int k = lo; k < hi; k++) {
              float ls = l[k], rs = rr[k];
              l[k] = ls + rs;
              rr[k] = ls - rs;
            }
          }
        }
      }
      win0 += glen;
    }
  }

  void apply_tns(ChannelData& ch, int sr_index) {
    if (!ch.tns.present) return;
    const ICSInfo& ics = ch.ics;
    bool shortw = ics.window_sequence == EIGHT_SHORT;
    int tns_max = TNS_MAX_SFB[sr_index][shortw ? 1 : 0];
    for (int w = 0; w < ics.num_windows; w++) {
      int bottom = ics.num_swb;
      for (int fi = 0; fi < ch.tns.n_filt[w]; fi++) {
        const TnsFilt& f = ch.tns.filt[w][fi];
        int top = bottom;
        bottom = std::max(top - f.length, 0);
        int order = f.order;
        if (order == 0) continue;
        int coef_res = ch.tns.coef_res[w];
        int coef_bits = coef_res + 3 - f.coef_compress;
        int rng = 1 << (coef_bits - 1);
        double iqfac = (rng - 0.5) / (M_PI / 2.0);
        double iqfac_m = (rng + 0.5) / (M_PI / 2.0);
        double refl[32];
        for (int i = 0; i < order; i++) {
          int c = f.coef[i];
          if (c >= rng) c -= 1 << coef_bits;
          refl[i] = std::sin(c / (c >= 0 ? iqfac : iqfac_m));
        }
        double lpc[33], b[33];
        lpc[0] = 1.0;
        for (int m = 1; m <= order; m++) {
          for (int i = 0; i <= m; i++) b[i] = i < m ? lpc[i] : 0.0;
          for (int i = 1; i < m; i++) b[i] += refl[m - 1] * lpc[m - i];
          b[m] = refl[m - 1];
          for (int i = 0; i <= m; i++) lpc[i] = b[i];
        }
        int lim = std::min(tns_max, ics.max_sfb);
        int start = ics.swb_offset[std::min(bottom, lim)];
        int end = ics.swb_offset[std::min(top, lim)];
        if (end - start <= 0) continue;
        float* spec = ch.spec[w];
        if (f.direction) {
          for (int i = end - 1; i >= start; i--) {
            double acc = spec[i];
            for (int j = 1; j <= order; j++) {
              int k = i + j;
              if (k > end - 1) continue;
              acc -= lpc[j] * spec[k];
            }
            spec[i] = (float)acc;
          }
        } else {
          for (int i = start; i < end; i++) {
            double acc = spec[i];
            for (int j = 1; j <= order; j++) {
              int k = i - j;
              if (k < start) continue;
              acc -= lpc[j] * spec[k];
            }
            spec[i] = (float)acc;
          }
        }
      }
    }
  }

  void filterbank(int out_ch, const ChannelData& ch, double* out) {
    const ICSInfo& ics = ch.ics;
    constexpr int ns = N_SHORT;
    constexpr int half = HALF;
    int shape = ics.window_shape;
    int pshape = seen[out_ch] ? prev_shape[out_ch] : shape;
    double* ovl = overlap[out_ch];
    int seq = ics.window_sequence;
    double x[N_LONG];
    double new_ovl[HALF];

    if (seq == EIGHT_SHORT) {
      double buf[N_LONG + N_SHORT];
      std::memset(buf, 0, sizeof(buf));
      int offset = (half - ns) / 2;  // 448
      double wx[N_SHORT];
      for (int w = 0; w < 8; w++) {
        imdct_short.run(ch.spec[w], wx);
        const double* wl = win_short[w == 0 ? pshape : shape];
        const double* wr = win_short[shape];
        for (int i = 0; i < ns / 2; i++) wx[i] *= wl[i];
        for (int i = ns / 2; i < ns; i++) wx[i] *= wr[i];
        double* dst = buf + offset + w * (ns / 2);
        for (int i = 0; i < ns; i++) dst[i] += wx[i];
      }
      for (int i = 0; i < half; i++) out[i] = buf[i] + ovl[i];
      for (int i = 0; i < half; i++) new_ovl[i] = buf[half + i];
    } else {
      imdct_long.run(ch.spec[0], x);
      if (seq == ONLY_LONG) {
        const double* wl = win_long[pshape];
        const double* wr = win_long[shape];
        for (int i = 0; i < half; i++) x[i] *= wl[i];
        for (int i = half; i < N_LONG; i++) x[i] *= wr[i];
      } else if (seq == LONG_START) {
        const double* wl = win_long[pshape];
        const double* ws = win_short[shape];
        int offset = (half - ns) / 2;
        for (int i = 0; i < half; i++) x[i] *= wl[i];
        for (int i = 0; i < offset; i++) { /* *1.0 */ }
        for (int i = 0; i < ns / 2; i++)
          x[half + offset + i] *= ws[ns / 2 + i];
        for (int i = half + offset + ns / 2; i < N_LONG; i++) x[i] = 0.0;
      } else {  // LONG_STOP
        const double* ws = win_short[pshape];
        const double* wr = win_long[shape];
        int offset = (half - ns) / 2;
        for (int i = 0; i < offset; i++) x[i] = 0.0;
        for (int i = 0; i < ns / 2; i++) x[offset + i] *= ws[i];
        for (int i = half; i < N_LONG; i++) x[i] *= wr[i];
      }
      for (int i = 0; i < half; i++) out[i] = x[i] + ovl[i];
      for (int i = 0; i < half; i++) new_ovl[i] = x[half + i];
    }
    std::memcpy(ovl, new_ovl, sizeof(new_ovl));
    prev_shape[out_ch] = shape;
    seen[out_ch] = true;
  }

  void skip_pce(BitReader& r) {
    r.read(4); r.read(2); r.read(4);
    int nf = r.read(4), ns = r.read(4), nb = r.read(4);
    int nl = r.read(2), na = r.read(3), nv = r.read(4);
    if (r.read(1)) r.read(4);
    if (r.read(1)) r.read(4);
    if (r.read(1)) r.read(3);
    for (int i = 0; i < nf + ns; i++) r.skip(5);
    for (int i = 0; i < nb; i++) r.skip(5);
    for (int i = 0; i < nl; i++) r.skip(4);
    for (int i = 0; i < na + nv; i++) r.skip(5);
    r.skip((-r.pos) & 7);
    int n = r.read(8);
    r.skip(8 * (int64_t)n);
  }

  // returns channel count (>0) or 0 on failure
  int decode(const uint8_t* frame, int len, int16_t* pcm_out,
             int* sample_rate, int* elem_types, int64_t* elem_bits,
             int* n_elems) {
    if (len < 7) return 0;
    // ADTS header (mirrors AdtsHeader.parse in ts/adts.py)
    BitReader hr{frame, 0, (int64_t)len * 8, false};
    if (hr.read(12) != 0xFFF) return 0;
    hr.read(1);  // ID: MPEG-2 (broadcast) or MPEG-4 — both accepted
    if (hr.read(2) != 0) return 0;   // layer
    int protection_absent = hr.read(1);
    hr.read(2);                      // profile
    int sr_index = hr.read(4);
    if (sr_index >= 12) return 0;
    hr.read(1); hr.read(3); hr.read(2); hr.read(2);
    int frame_length = hr.read(13);
    hr.read(11); hr.read(2);
    if (hr.err || frame_length < 7) return 0;
    int hdr_bytes = protection_absent ? 7 : 9;

    // python reads over the whole passed buffer (caller slices the frame)
    BitReader r{frame, (int64_t)hdr_bytes * 8, (int64_t)len * 8, false};
    int nch = 0;
    int ne = 0;
    std::memset(sbr_payload_len, 0, sizeof(sbr_payload_len));

    while (true) {
      int64_t start_bit = r.pos;
      int ide = (int)r.read(3);
      if (r.err) return 0;
      if (ide == ID_END) break;
      if (ide == ID_SCE || ide == ID_LFE) {
        if (nch + 1 > MAX_CH || ne >= MAX_ELEMS) return 0;
        r.read(4);
        ChannelData& ch = chbuf[0];
        if (!individual_channel_stream(r, sr_index, nullptr, ch)) return 0;
        if (!dequantize(ch)) return 0;
        apply_tns(ch, sr_index);
        filterbank(nch, ch, pcm[nch]);
        elem_ch_start[ne] = nch;
        elem_nch[ne] = 1;
        nch += 1;
        elem_types[ne] = ide;
        elem_bits[2 * ne] = start_bit;
        elem_bits[2 * ne + 1] = r.pos;
        ne++;
      } else if (ide == ID_CPE) {
        if (nch + 2 > MAX_CH || ne >= MAX_ELEMS) return 0;
        r.read(4);
        int common = r.read(1);
        int ms_mask = 0;
        uint8_t ms_used[8][MAX_SFB];
        bool have_ms = false;
        ICSInfo shared;
        bool have_shared = false;
        if (common) {
          if (!ics_info(r, sr_index, shared)) return 0;
          have_shared = true;
          ms_mask = r.read(2);
          if (ms_mask == 1) {
            have_ms = true;
            for (int g = 0; g < shared.num_window_groups; g++)
              for (int sfb = 0; sfb < shared.max_sfb; sfb++)
                ms_used[g][sfb] = (uint8_t)r.read(1);
          }
        }
        ChannelData& ch1 = chbuf[0];
        ChannelData& ch2 = chbuf[1];
        if (!individual_channel_stream(
                r, sr_index, have_shared ? &shared : nullptr, ch1))
          return 0;
        if (!individual_channel_stream(
                r, sr_index, have_shared ? &shared : nullptr, ch2))
          return 0;
        if (!dequantize(ch1) || !dequantize(ch2)) return 0;
        stereo_tools(ch1, ch2, ms_mask, have_ms ? ms_used : nullptr);
        apply_tns(ch1, sr_index);
        apply_tns(ch2, sr_index);
        filterbank(nch, ch1, pcm[nch]);
        filterbank(nch + 1, ch2, pcm[nch + 1]);
        elem_ch_start[ne] = nch;
        elem_nch[ne] = 2;
        nch += 2;
        elem_types[ne] = ide;
        elem_bits[2 * ne] = start_bit;
        elem_bits[2 * ne + 1] = r.pos;
        ne++;
      } else if (ide == ID_DSE) {
        r.read(4);
        int align = r.read(1);
        int cnt = r.read(8);
        if (cnt == 255) cnt += r.read(8);
        if (align) r.skip((-r.pos) & 7);
        r.skip(8 * (int64_t)cnt);
      } else if (ide == ID_FIL) {
        int cnt = r.read(4);
        if (cnt == 15) cnt += (int)r.read(8) - 1;
        // SBR extension payload (EXT_SBR_DATA / EXT_SBR_DATA_CRC) for
        // the preceding SCE/CPE: capture it for the in-build SBR
        // decoder (aacsbr.inc; mirrors aac.py _feed_sbr)
        if (cnt > 0 && ne > 0 && !r.err
            && (elem_types[ne - 1] == ID_SCE || elem_types[ne - 1] == ID_CPE)
            && cnt <= (int)sizeof(sbr_payload[0])) {
          uint32_t ext = r.peek(4);
          if (ext == 13 || ext == 14) {
            sbr_detected = true;
            sbr_active = true;
            for (int i = 0; i < cnt; i++)
              sbr_payload[ne - 1][i] = (uint8_t)r.read(8);
            sbr_payload_len[ne - 1] = cnt;
            continue;
          }
        }
        r.skip(8 * (int64_t)cnt);
      } else if (ide == ID_PCE) {
        skip_pce(r);
      } else {  // CCE unsupported
        return 0;
      }
      if (r.err) return 0;
    }

    if (nch == 0) return 0;
    if (sbr_active) {
      // HE-AAC v1/v2: run each element's channels through its SBR
      // decoder (elements without payload this frame plain-upsample; an
      // SCE with parametric stereo yields two channels; mirrors aac.py
      // _apply_sbr)
      int out_nch = 0;
      for (int e = 0; e < ne; e++) {
        bool cpe = elem_types[e] == ID_CPE;
        if (sbr_dec[e] != nullptr && sbr_dec_ide[e] != elem_types[e]) {
          delete sbr_dec[e];
          sbr_dec[e] = nullptr;
        }
        if (sbr_dec[e] == nullptr) {
          sbr_dec[e] = new sbr::SbrDec(SAMPLE_RATE_HZ[sr_index], cpe);
          sbr_dec_ide[e] = elem_types[e];
        }
        if (sbr_payload_len[e] > 0)
          sbr_dec[e]->parse(sbr_payload[e], sbr_payload_len[e]);
        const double* ins[2];
        double* outs[2];
        for (int c = 0; c < elem_nch[e]; c++)
          ins[c] = pcm[elem_ch_start[e] + c];
        if (out_nch + 2 > MAX_CH) return 0;
        outs[0] = sbr_out[out_nch];
        outs[1] = sbr_out[out_nch + 1];
        out_nch += sbr_dec[e]->process(ins, elem_nch[e], outs);
      }
      out_samples = 2 * HALF;
      for (int i = 0; i < 2 * HALF; i++) {
        for (int c = 0; c < out_nch; c++) {
          double v = std::nearbyint(sbr_out[c][i]);
          if (v > 32767.0) v = 32767.0;
          if (v < -32768.0) v = -32768.0;
          pcm_out[i * out_nch + c] = (int16_t)v;
        }
      }
      *sample_rate = 2 * SAMPLE_RATE_HZ[sr_index];
      *n_elems = ne;
      return out_nch;
    }
    out_samples = HALF;
    for (int i = 0; i < HALF; i++) {
      for (int c = 0; c < nch; c++) {
        double v = std::nearbyint(pcm[c][i]);
        if (v > 32767.0) v = 32767.0;
        if (v < -32768.0) v = -32768.0;
        pcm_out[i * nch + c] = (int16_t)v;
      }
    }
    *sample_rate = SAMPLE_RATE_HZ[sr_index];
    *n_elems = ne;
    return nch;
  }
};

}  // namespace aac

extern "C" {

void* AacDec_Create() { return new aac::Decoder(); }

void AacDec_Destroy(void* h) { delete static_cast<aac::Decoder*>(h); }

void AacDec_Reset(void* h) { static_cast<aac::Decoder*>(h)->reset(); }

// Decode one ADTS frame. pcm_out must hold 1024*24 int16.
// elem_types: 24 ints; elem_bits: 48 int64 (start,end per element).
// Returns channel count (>0), or 0 on unsupported/corrupt frame.
int AacDec_Decode(void* h, const uint8_t* frame, int len, int16_t* pcm_out,
                  int* sample_rate, int* elem_types, int64_t* elem_bits,
                  int* n_elems) {
  return static_cast<aac::Decoder*>(h)->decode(
      frame, len, pcm_out, sample_rate, elem_types, elem_bits, n_elems);
}

// 1 when any decoded frame carried an SBR fill element (sticky per handle).
int AacDec_SbrDetected(void* h) {
  return static_cast<aac::Decoder*>(h)->sbr_detected ? 1 : 0;
}

// samples per channel in the last decode (2048 once SBR is active).
// pcm_out must hold 2048*24 int16 when calling AacDec_Decode.
int AacDec_OutSamples(void* h) {
  return static_cast<aac::Decoder*>(h)->out_samples;
}

// 1 when the stream needs the Python decoder. Always 0 since the PS
// (HE-AAC v2) port: LC, SBR and parametric stereo all decode natively;
// the entry point stays for binding compatibility.
int AacDec_NeedsFallback(void* h) {
  (void)h;
  return 0;
}

}  // extern "C"
