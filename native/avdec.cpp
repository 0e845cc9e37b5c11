// In-process FFmpeg integration — the native analog of the reference's
// ReaderWriterFFmpeg.hpp (reference Amatsukaze/ReaderWriterFFmpeg.hpp:
// 73-483): demux + decode of any libavcodec codec (H.264/HEVC/MPEG-1/2)
// straight to YUV planes, plus a raw AAC ADTS frame decoder used to
// cross-validate the in-build audio stack.
//
// Built as a SEPARATE shared library (libamatsukaze_av.so) linking the
// system FFmpeg; the core library keeps zero external dependencies and
// all consumers treat this one as optional.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libavutil/video_enc_params.h>
#include <libswscale/swscale.h>
}

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <new>

namespace {

// Quiet by default: libav would otherwise write per-stream probe
// warnings straight to stderr (the reference serializes FFmpeg logs
// through its own logger — AmatsukazeCLI.hpp:557-598). Override with
// AMATSUKAZE_AV_LOG=info|warning|error|quiet.
struct AvLogInit {
  AvLogInit() {
    const char* lv = std::getenv("AMATSUKAZE_AV_LOG");
    int level = AV_LOG_ERROR;
    if (lv) {
      auto eq = [lv](const char* name) {  // case-insensitive
        const char* a = lv;
        for (; *a && *name; a++, name++)
          if ((*a | 32) != (*name | 32)) return false;
        return !*a && !*name;
      };
      if (eq("quiet")) level = AV_LOG_QUIET;
      else if (eq("panic")) level = AV_LOG_PANIC;
      else if (eq("fatal")) level = AV_LOG_FATAL;
      else if (eq("error")) level = AV_LOG_ERROR;
      else if (eq("warning")) level = AV_LOG_WARNING;
      else if (eq("info")) level = AV_LOG_INFO;
      else if (eq("verbose")) level = AV_LOG_VERBOSE;
      else if (eq("debug")) level = AV_LOG_DEBUG;
      else if (eq("trace")) level = AV_LOG_TRACE;
      else
        std::fprintf(stderr,
                     "amatsukaze_av: unknown AMATSUKAZE_AV_LOG=%s "
                     "(using error)\n", lv);
    }
    av_log_set_level(level);
  }
} g_av_log_init;

struct VDec {
  // (x, y, qp) per block of the last frame; 36864 covers 4096x2304
  // in 16x16 blocks (matches the QP extractor's _MAX_MBS)
  int32_t last_qp[3 * 36864];
  int last_qp_n = 0;
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  SwsContext* sws = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  AVFrame* out = nullptr;  // converted frame when sws is needed
  int stream_index = -1;
  int out_w = 0, out_h = 0;
  AVPixelFormat out_fmt = AV_PIX_FMT_YUV420P;
  bool eof_sent = false;
  // keep high bit depth: pass 10-bit planes through as uint16 instead
  // of converting down to 8 (Main10 validation path)
  bool keep_hbd = false;
};

bool pick_out_fmt(AVPixelFormat in, bool keep_hbd, AVPixelFormat* out) {
  switch (in) {
    case AV_PIX_FMT_YUV420P:
    case AV_PIX_FMT_YUVJ420P:
    case AV_PIX_FMT_NV12:
      *out = AV_PIX_FMT_YUV420P;
      return in == AV_PIX_FMT_YUV420P;
    case AV_PIX_FMT_YUV422P:
    case AV_PIX_FMT_YUVJ422P:
      *out = AV_PIX_FMT_YUV422P;
      return in == AV_PIX_FMT_YUV422P;
    case AV_PIX_FMT_YUV420P10LE:
      if (keep_hbd) {
        *out = AV_PIX_FMT_YUV420P10LE;
        return true;
      }
      *out = AV_PIX_FMT_YUV420P;
      return false;
    default:
      *out = AV_PIX_FMT_YUV420P;
      return false;
  }
}

}  // namespace

extern "C" {

void* AvDec_Open(const char* path) {
  auto* d = new (std::nothrow) VDec();
  if (!d) return nullptr;
  if (avformat_open_input(&d->fmt, path, nullptr, nullptr) < 0) {
    delete d;
    return nullptr;
  }
  if (avformat_find_stream_info(d->fmt, nullptr) < 0) {
    avformat_close_input(&d->fmt);
    delete d;
    return nullptr;
  }
  const AVCodec* codec = nullptr;
  d->stream_index =
      av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
  if (d->stream_index < 0 || !codec) {
    avformat_close_input(&d->fmt);
    delete d;
    return nullptr;
  }
  AVStream* st = d->fmt->streams[d->stream_index];
  d->dec = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(d->dec, st->codecpar);
  // per-block quantiser export (the modern replacement for the patched
  // av_frame_get_qp_table the reference relies on, AMTSource.hpp:371).
  // Frame threading suppresses side-data export in some decoders, so
  // stay single-threaded here.
  d->dec->thread_count = 1;
  d->dec->export_side_data |= AV_CODEC_EXPORT_DATA_VIDEO_ENC_PARAMS;
  if (const char* dbg = getenv("AMATSUKAZE_AVDEBUG")) {
    // diagnostic: libavcodec's own per-MB dumps (mb_type/qp) as ground
    // truth when cross-validating the in-build decoders
    d->dec->debug = atoi(dbg);
    av_log_set_level(AV_LOG_DEBUG);
  }
  if (avcodec_open2(d->dec, codec, nullptr) < 0) {
    avcodec_free_context(&d->dec);
    avformat_close_input(&d->fmt);
    delete d;
    return nullptr;
  }
  d->pkt = av_packet_alloc();
  d->frame = av_frame_alloc();
  d->out = av_frame_alloc();
  return d;
}

// Open with 10-bit passthrough: frames from yuv420p10 sources are
// returned as native-endian uint16 planes (info[9] reports the depth).
void* AvDec_Open10(const char* path) {
  auto* d = static_cast<VDec*>(AvDec_Open(path));
  if (d) d->keep_hbd = true;
  return d;
}

// info[12] = {width, height, fps_num, fps_den, interlaced_guess,
//             codec_id, chroma_class (1=420, 2=422), sar_num, sar_den,
//             0, 0, 0}
int AvDec_Info(void* hp, int* info) {
  auto* d = static_cast<VDec*>(hp);
  AVStream* st = d->fmt->streams[d->stream_index];
  AVRational fr = av_guess_frame_rate(d->fmt, st, nullptr);
  AVPixelFormat outf;
  pick_out_fmt((AVPixelFormat)st->codecpar->format, d->keep_hbd, &outf);
  info[0] = st->codecpar->width;
  info[1] = st->codecpar->height;
  info[2] = fr.num ? fr.num : 30000;
  info[3] = fr.den ? fr.den : 1001;
  info[4] = st->codecpar->field_order != AV_FIELD_PROGRESSIVE &&
            st->codecpar->field_order != AV_FIELD_UNKNOWN;
  info[5] = (int)st->codecpar->codec_id;
  info[6] = outf == AV_PIX_FMT_YUV422P ? 2 : 1;
  info[7] = st->codecpar->sample_aspect_ratio.num;
  info[8] = st->codecpar->sample_aspect_ratio.den;
  info[9] = outf == AV_PIX_FMT_YUV420P10LE ? 10 : 8;
  info[10] = info[11] = 0;
  return 0;
}

// Decode the next frame into caller planes (sized per AvDec_Info:
// y = w*h; u,v = (w/2)*(h/chroma_div) with chroma_div 2 for 420, 1 for
// 422). finfo[4] = {pict_type, top_field_first, repeat_first_field,
// interlaced_frame}. Returns 1 on frame, 0 at EOF, <0 on error.
int AvDec_NextFrame(void* hp, uint8_t* y, uint8_t* u, uint8_t* v,
                    int* finfo) {
  auto* d = static_cast<VDec*>(hp);
  while (true) {
    int r = avcodec_receive_frame(d->dec, d->frame);
    if (r == 0) break;
    if (r == AVERROR_EOF) return 0;
    if (r != AVERROR(EAGAIN)) return -1;
    // need more input
    if (d->eof_sent) return 0;
    r = av_read_frame(d->fmt, d->pkt);
    if (r < 0) {
      avcodec_send_packet(d->dec, nullptr);
      d->eof_sent = true;
      continue;
    }
    if (d->pkt->stream_index == d->stream_index)
      avcodec_send_packet(d->dec, d->pkt);
    av_packet_unref(d->pkt);
  }

  AVFrame* f = d->frame;
  AVPixelFormat outf;
  bool direct = pick_out_fmt((AVPixelFormat)f->format, d->keep_hbd, &outf);
  int w = f->width, h = f->height;
  int ch = outf == AV_PIX_FMT_YUV422P ? h : h / 2;
  int cw = w / 2;
  int bps = outf == AV_PIX_FMT_YUV420P10LE ? 2 : 1;
  const uint8_t* sy;
  const uint8_t* su;
  const uint8_t* sv;
  int ly, lu, lv;
  if (direct) {
    sy = f->data[0]; su = f->data[1]; sv = f->data[2];
    ly = f->linesize[0]; lu = f->linesize[1]; lv = f->linesize[2];
  } else {
    if (!d->sws || d->out_w != w || d->out_h != h || d->out_fmt != outf) {
      if (d->sws) sws_freeContext(d->sws);
      d->sws = sws_getContext(w, h, (AVPixelFormat)f->format, w, h, outf,
                              SWS_POINT, nullptr, nullptr, nullptr);
      d->out_w = w; d->out_h = h; d->out_fmt = outf;
      av_frame_unref(d->out);
      d->out->format = outf;
      d->out->width = w;
      d->out->height = h;
      av_frame_get_buffer(d->out, 32);
    }
    if (!d->sws) return -2;
    sws_scale(d->sws, f->data, f->linesize, 0, h, d->out->data,
              d->out->linesize);
    sy = d->out->data[0]; su = d->out->data[1]; sv = d->out->data[2];
    ly = d->out->linesize[0]; lu = d->out->linesize[1];
    lv = d->out->linesize[2];
  }
  for (int r = 0; r < h; r++)
    std::memcpy(y + (int64_t)r * w * bps, sy + (int64_t)r * ly, (int64_t)w * bps);
  for (int r = 0; r < ch; r++) {
    std::memcpy(u + (int64_t)r * cw * bps, su + (int64_t)r * lu, (int64_t)cw * bps);
    std::memcpy(v + (int64_t)r * cw * bps, sv + (int64_t)r * lv, (int64_t)cw * bps);
  }
  d->last_qp_n = 0;
  {
    AVFrameSideData* sd =
        av_frame_get_side_data(f, AV_FRAME_DATA_VIDEO_ENC_PARAMS);
    if (sd) {
      auto* ep = (AVVideoEncParams*)sd->data;
      unsigned nb = ep->nb_blocks;
      if (nb > (unsigned)(sizeof d->last_qp / sizeof d->last_qp[0]) / 3)
        nb = (sizeof d->last_qp / sizeof d->last_qp[0]) / 3;
      for (unsigned b = 0; b < nb; b++) {
        AVVideoBlockParams* bp = av_video_enc_params_block(ep, b);
        d->last_qp[b * 3 + 0] = bp->src_x;
        d->last_qp[b * 3 + 1] = bp->src_y;
        d->last_qp[b * 3 + 2] = (int32_t)(ep->qp + bp->delta_qp);
      }
      d->last_qp_n = (int)nb;
    }
  }
  if (finfo) {
    finfo[0] = (int)f->pict_type;
#if LIBAVUTIL_VERSION_MAJOR >= 58
    finfo[1] = (f->flags & AV_FRAME_FLAG_TOP_FIELD_FIRST) ? 1 : 0;
    finfo[3] = (f->flags & AV_FRAME_FLAG_INTERLACED) ? 1 : 0;
#else
    finfo[1] = f->top_field_first;
    finfo[3] = f->interlaced_frame;
#endif
    finfo[2] = f->repeat_pict;
  }
  av_frame_unref(d->frame);
  return 1;
}

// Per-block QP of the last decoded frame: fills (x, y, qp) triples,
// returns the block count (0 when the codec exports none).
int AvDec_LastQp(void* hp, int32_t* out, int cap) {
  auto* d = static_cast<VDec*>(hp);
  int n = d->last_qp_n;
  if (n * 3 > cap) n = cap / 3;
  std::memcpy(out, d->last_qp, (size_t)n * 3 * sizeof(int32_t));
  return n;
}

void AvDec_Close(void* hp) {
  auto* d = static_cast<VDec*>(hp);
  if (d->sws) sws_freeContext(d->sws);
  av_frame_free(&d->frame);
  av_frame_free(&d->out);
  av_packet_free(&d->pkt);
  avcodec_free_context(&d->dec);
  avformat_close_input(&d->fmt);
  delete d;
}

// ---------------------------------------------------------------------------
// Raw AAC (ADTS) frame decoder — for differential tests of the in-build
// audio stack (reference decodes via libfaad, AdtsParser.hpp:174-207).
// ---------------------------------------------------------------------------

struct ADec {
  AVCodecContext* dec = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
};

// latm != 0 opens the LOAS/LATM-framed AAC decoder (ARIB STD-B32 4K
// broadcast audio) instead of the ADTS one
void* AvAac_OpenLatm(int latm) {
  const AVCodec* codec =
      avcodec_find_decoder(latm ? AV_CODEC_ID_AAC_LATM : AV_CODEC_ID_AAC);
  if (!codec) return nullptr;
  auto* d = new (std::nothrow) ADec();
  d->dec = avcodec_alloc_context3(codec);
  if (avcodec_open2(d->dec, codec, nullptr) < 0) {
    avcodec_free_context(&d->dec);
    delete d;
    return nullptr;
  }
  d->pkt = av_packet_alloc();
  d->frame = av_frame_alloc();
  return d;
}

void* AvAac_Open() { return AvAac_OpenLatm(0); }

// Decode one ADTS frame; writes up to max_samples interleaved float32
// samples. info[4] = {channels, sample_rate, samples_per_channel, 0}.
// Returns sample count written (total, all channels), 0 if the decoder
// buffered without output, <0 on error.
int AvAac_Decode(void* hp, const uint8_t* data, int len, float* out,
                 int max_samples, int* info) {
  auto* d = static_cast<ADec*>(hp);
  av_packet_unref(d->pkt);
  if (av_new_packet(d->pkt, len) < 0) return -1;
  std::memcpy(d->pkt->data, data, len);
  int r = avcodec_send_packet(d->dec, d->pkt);
  av_packet_unref(d->pkt);
  if (r < 0 && r != AVERROR(EAGAIN)) return -2;
  r = avcodec_receive_frame(d->dec, d->frame);
  if (r == AVERROR(EAGAIN)) return 0;
  if (r < 0) return -3;
  AVFrame* f = d->frame;
#if LIBAVUTIL_VERSION_MAJOR >= 57
  int chans = f->ch_layout.nb_channels;
#else
  int chans = f->channels;
#endif
  int n = f->nb_samples;
  if (chans * n > max_samples) { av_frame_unref(f); return -4; }
  if (f->format == AV_SAMPLE_FMT_FLTP) {
    for (int c = 0; c < chans; c++) {
      const float* src = (const float*)f->data[c];
      for (int i = 0; i < n; i++) out[i * chans + c] = src[i];
    }
  } else if (f->format == AV_SAMPLE_FMT_FLT) {
    std::memcpy(out, f->data[0], sizeof(float) * chans * n);
  } else {
    av_frame_unref(f);
    return -5;
  }
  info[0] = chans;
  info[1] = f->sample_rate;
  info[2] = n;
  info[3] = 0;
  av_frame_unref(f);
  return chans * n;
}

void AvAac_Close(void* hp) {
  auto* d = static_cast<ADec*>(hp);
  av_frame_free(&d->frame);
  av_packet_free(&d->pkt);
  avcodec_free_context(&d->dec);
  delete d;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// H.264 encode via libx264 (through libavcodec) — generates real H.264
// streams for parser/pipeline tests and backs the in-build encoder
// fallback when no external x264 binary exists.
// ---------------------------------------------------------------------------

extern "C" {

struct VEnc {
  AVCodecContext* enc = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  int64_t pts = 0;
  int bps = 1;  // bytes per input sample (2 for 10-bit)
};

void* AvEnc_Open3(const char* codec_name, int w, int h, int fps_num,
                  int fps_den, int crf, const char* preset,
                  int interlaced, int bframes, const char* params,
                  int bit_depth) {
  const AVCodec* codec = avcodec_find_encoder_by_name(codec_name);
  if (!codec) return nullptr;
  auto* e = new (std::nothrow) VEnc();
  e->bps = bit_depth > 8 ? 2 : 1;
  e->enc = avcodec_alloc_context3(codec);
  e->enc->width = w;
  e->enc->height = h;
  e->enc->time_base = {fps_den, fps_num};
  e->enc->framerate = {fps_num, fps_den};
  e->enc->pix_fmt =
      bit_depth > 8 ? AV_PIX_FMT_YUV420P10LE : AV_PIX_FMT_YUV420P;
  e->enc->gop_size = 30;
  e->enc->max_b_frames = bframes;
  if (interlaced)
    e->enc->flags |= AV_CODEC_FLAG_INTERLACED_DCT |
                     AV_CODEC_FLAG_INTERLACED_ME;
  char crfs[16];
  snprintf(crfs, sizeof crfs, "%d", crf);
  av_opt_set(e->enc->priv_data, "crf", crfs, 0);
  if (preset && *preset)
    av_opt_set(e->enc->priv_data, "preset", preset, 0);
  if (params && *params) {
    // per-encoder extra parameter blobs (ignored when unsupported)
    av_opt_set(e->enc->priv_data, "x264-params", params, 0);
    av_opt_set(e->enc->priv_data, "x265-params", params, 0);
    // also try generic "k=v:k=v" options on both layers (e.g. b=4M,
    // flags for mpeg2video test encodes)
    av_set_options_string(e->enc, params, "=", ":");
    av_set_options_string(e->enc->priv_data, params, "=", ":");
  }
  if (avcodec_open2(e->enc, codec, nullptr) < 0) {
    avcodec_free_context(&e->enc);
    delete e;
    return nullptr;
  }
  e->frame = av_frame_alloc();
  e->frame->format = e->enc->pix_fmt;
  e->frame->width = w;
  e->frame->height = h;
  av_frame_get_buffer(e->frame, 32);
  e->pkt = av_packet_alloc();
  return e;
}

void* AvEnc_Open2(const char* codec_name, int w, int h, int fps_num,
                  int fps_den, int crf, const char* preset,
                  int interlaced, int bframes, const char* params) {
  return AvEnc_Open3(codec_name, w, h, fps_num, fps_den, crf, preset,
                     interlaced, bframes, params, 8);
}

// Feed one frame (y/u/v planes, 4:2:0) or NULL planes to flush.
// Annex B bytes land in out; per-access-unit packet sizes are written
// to pkt_sizes (up to max_pkts; *n_pkts = count). Returns total bytes,
// 0 if buffered, <0 on error.
int AvEnc_Encode(void* hp, const uint8_t* y, const uint8_t* u,
                 const uint8_t* v, uint8_t* out, int out_cap,
                 int* pkt_sizes, int max_pkts, int* n_pkts) {
  auto* e = static_cast<VEnc*>(hp);
  int r;
  if (y) {
    av_frame_make_writable(e->frame);
    int w = e->enc->width, h = e->enc->height, bps = e->bps;
    for (int row = 0; row < h; row++)
      std::memcpy(e->frame->data[0] + (int64_t)row * e->frame->linesize[0],
                  y + (int64_t)row * w * bps, (int64_t)w * bps);
    for (int row = 0; row < h / 2; row++) {
      std::memcpy(e->frame->data[1] + (int64_t)row * e->frame->linesize[1],
                  u + (int64_t)row * (w / 2) * bps, (int64_t)(w / 2) * bps);
      std::memcpy(e->frame->data[2] + (int64_t)row * e->frame->linesize[2],
                  v + (int64_t)row * (w / 2) * bps, (int64_t)(w / 2) * bps);
    }
    e->frame->pts = e->pts++;
    r = avcodec_send_frame(e->enc, e->frame);
  } else {
    r = avcodec_send_frame(e->enc, nullptr);
  }
  if (r < 0 && r != AVERROR_EOF) return -1;
  int total = 0;
  if (n_pkts) *n_pkts = 0;
  while (true) {
    r = avcodec_receive_packet(e->enc, e->pkt);
    if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) break;
    if (r < 0) return -2;
    if (total + e->pkt->size > out_cap) { av_packet_unref(e->pkt); return -3; }
    std::memcpy(out + total, e->pkt->data, e->pkt->size);
    total += e->pkt->size;
    if (pkt_sizes && n_pkts && *n_pkts < max_pkts)
      pkt_sizes[(*n_pkts)++] = e->pkt->size;
    av_packet_unref(e->pkt);
  }
  return total;
}

void AvEnc_Close(void* hp) {
  auto* e = static_cast<VEnc*>(hp);
  av_frame_free(&e->frame);
  av_packet_free(&e->pkt);
  avcodec_free_context(&e->enc);
  delete e;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// AAC-LC encode (libavcodec 'aac') — backs the in-build audio encoder
// fallback (the reference pipes WAV to external neroAac/qaac/fdkaac).
// ---------------------------------------------------------------------------

extern "C" {

struct AEnc {
  AVCodecContext* enc = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  int64_t pts = 0;
};

void* AvAacEnc_Open(int sample_rate, int channels, int bitrate) {
  const AVCodec* codec = avcodec_find_encoder(AV_CODEC_ID_AAC);
  if (!codec) return nullptr;
  auto* e = new (std::nothrow) AEnc();
  e->enc = avcodec_alloc_context3(codec);
  e->enc->sample_rate = sample_rate;
  e->enc->sample_fmt = AV_SAMPLE_FMT_FLTP;
  e->enc->bit_rate = bitrate > 0 ? bitrate : 192000;
#if LIBAVUTIL_VERSION_MAJOR >= 57
  av_channel_layout_default(&e->enc->ch_layout, channels);
#else
  e->enc->channels = channels;
  e->enc->channel_layout = av_get_default_channel_layout(channels);
#endif
  e->enc->time_base = {1, sample_rate};
  if (avcodec_open2(e->enc, codec, nullptr) < 0) {
    avcodec_free_context(&e->enc);
    delete e;
    return nullptr;
  }
  e->frame = av_frame_alloc();
  e->frame->format = AV_SAMPLE_FMT_FLTP;
  e->frame->nb_samples = e->enc->frame_size;
#if LIBAVUTIL_VERSION_MAJOR >= 57
  av_channel_layout_copy(&e->frame->ch_layout, &e->enc->ch_layout);
#else
  e->frame->channels = channels;
  e->frame->channel_layout = e->enc->channel_layout;
#endif
  av_frame_get_buffer(e->frame, 0);
  e->pkt = av_packet_alloc();
  return e;
}

int AvAacEnc_FrameSize(void* hp) {
  return static_cast<AEnc*>(hp)->enc->frame_size;
}

// Feed exactly frame_size interleaved s16 samples per channel (or
// nsamples=0 to flush). Raw AAC packets (no ADTS header) are written to
// out with sizes in pkt_sizes. Returns total bytes, <0 on error.
int AvAacEnc_Encode(void* hp, const int16_t* pcm, int nsamples,
                    uint8_t* out, int out_cap, int* pkt_sizes,
                    int max_pkts, int* n_pkts) {
  auto* e = static_cast<AEnc*>(hp);
  int r;
  if (nsamples > 0) {
    av_frame_make_writable(e->frame);
#if LIBAVUTIL_VERSION_MAJOR >= 57
    int chans = e->enc->ch_layout.nb_channels;
#else
    int chans = e->enc->channels;
#endif
    if (nsamples != e->enc->frame_size) return -10;
    for (int c = 0; c < chans; c++) {
      float* dst = (float*)e->frame->data[c];
      for (int i = 0; i < nsamples; i++)
        dst[i] = pcm[i * chans + c] / 32768.0f;
    }
    e->frame->pts = e->pts;
    e->pts += nsamples;
    r = avcodec_send_frame(e->enc, e->frame);
  } else {
    r = avcodec_send_frame(e->enc, nullptr);
  }
  if (r < 0 && r != AVERROR_EOF) return -1;
  int total = 0;
  if (n_pkts) *n_pkts = 0;
  while (true) {
    r = avcodec_receive_packet(e->enc, e->pkt);
    if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) break;
    if (r < 0) return -2;
    if (total + e->pkt->size > out_cap) { av_packet_unref(e->pkt); return -3; }
    std::memcpy(out + total, e->pkt->data, e->pkt->size);
    total += e->pkt->size;
    if (pkt_sizes && n_pkts && *n_pkts < max_pkts)
      pkt_sizes[(*n_pkts)++] = e->pkt->size;
    av_packet_unref(e->pkt);
  }
  return total;
}

void AvAacEnc_Close(void* hp) {
  auto* e = static_cast<AEnc*>(hp);
  av_frame_free(&e->frame);
  av_packet_free(&e->pkt);
  avcodec_free_context(&e->enc);
  delete e;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Remux raw H.264/HEVC + ADTS AAC into a real container (mp4/mkv by
// extension) — the in-build fallback for the external muxer chain
// (L-SMASH muxer/timelineeditor/mp4box, reference Muxer.hpp:28-245).
// Video timestamps come from explicit per-frame times when given (VFR
// timecodes) or the fixed frame rate.
// ---------------------------------------------------------------------------

extern "C" {

int AvMux_Remux(const char* video_path, const char** audio_paths,
                int n_audio, const char* out_path, int fps_num,
                int fps_den, const double* timecodes_ms,
                int n_timecodes) {
  int err = -1;
  AVFormatContext* out = nullptr;
  AVFormatContext* vin = nullptr;
  AVFormatContext** ains = nullptr;
  AVPacket* pkt = av_packet_alloc();
  int64_t vcount = 0;
  int64_t* acounts = nullptr;
  AVDictionary* mux_opts = nullptr;

  if (avformat_alloc_output_context2(&out, nullptr, nullptr, out_path) < 0)
    goto done;
  // ts/m2ts outputs ride libavformat's mpegts muxer (the external-binary
  // path uses tsMuxeR instead, reference Muxer.hpp:171-199); a .m2ts
  // extension turns on BDAV 192-byte packets via m2ts mode
  if (out->oformat && std::strcmp(out->oformat->name, "mpegts") == 0) {
    size_t olen = std::strlen(out_path);
    if (olen >= 5 && std::strcmp(out_path + olen - 5, ".m2ts") == 0)
      av_dict_set(&mux_opts, "mpegts_m2ts_mode", "1", 0);
  }
  if (avformat_open_input(&vin, video_path, nullptr, nullptr) < 0)
    goto done;
  if (avformat_find_stream_info(vin, nullptr) < 0) goto done;
  {
    AVStream* vs = avformat_new_stream(out, nullptr);
    avcodec_parameters_copy(vs->codecpar, vin->streams[0]->codecpar);
    vs->codecpar->codec_tag = 0;
    vs->time_base = {fps_den, fps_num};
  }
  ains = (AVFormatContext**)av_mallocz(sizeof(void*) *
                                       (n_audio > 0 ? n_audio : 1));
  acounts = (int64_t*)av_mallocz(sizeof(int64_t) *
                                 (n_audio > 0 ? n_audio : 1));
  for (int i = 0; i < n_audio; i++) {
    // an unparseable audio track is skipped, not fatal
    if (avformat_open_input(&ains[i], audio_paths[i], nullptr, nullptr) < 0)
      continue;
    avformat_find_stream_info(ains[i], nullptr);
    if (ains[i]->nb_streams > 0 &&
        ains[i]->streams[0]->codecpar->sample_rate <= 0 &&
        ains[i]->streams[0]->codecpar->codec_id == AV_CODEC_ID_AAC) {
      // find_stream_info confirms params by DECODING; a mux-only path
      // must not require that (the reference's muxers copy ADTS
      // untouched) — recover the rate/channels from the fixed ADTS
      // header instead
      FILE* fp = fopen(audio_paths[i], "rb");
      if (fp) {
        uint8_t h[7];
        if (fread(h, 1, 7, fp) == 7 && h[0] == 0xFF && (h[1] & 0xF0) == 0xF0) {
          static const int kAdtsRate[16] = {96000, 88200, 64000, 48000,
                                            44100, 32000, 24000, 22050,
                                            16000, 12000, 11025, 8000,
                                            7350,  0,     0,     0};
          int sfi = (h[2] >> 2) & 0xF;
          int ch = ((h[2] & 1) << 2) | (h[3] >> 6);
          if (kAdtsRate[sfi] > 0) {
            ains[i]->streams[0]->codecpar->sample_rate = kAdtsRate[sfi];
            if (ch > 0)
              av_channel_layout_default(
                  &ains[i]->streams[0]->codecpar->ch_layout, ch);
          }
        }
        fclose(fp);
      }
    }
    if (ains[i]->nb_streams == 0 ||
        ains[i]->streams[0]->codecpar->sample_rate <= 0) {
      avformat_close_input(&ains[i]);
      ains[i] = nullptr;
      continue;
    }
    AVStream* as = avformat_new_stream(out, nullptr);
    avcodec_parameters_copy(as->codecpar, ains[i]->streams[0]->codecpar);
    as->codecpar->codec_tag = 0;
    as->time_base = {1, ains[i]->streams[0]->codecpar->sample_rate};
  }
  if (!(out->oformat->flags & AVFMT_NOFILE) &&
      avio_open(&out->pb, out_path, AVIO_FLAG_WRITE) < 0)
    goto done;
  if (avformat_write_header(out, &mux_opts) < 0) goto done;

  // video packets: coded order == display order (shim encodes with no
  // B-frames); stamp from timecodes or CFR
  while (av_read_frame(vin, pkt) >= 0) {
    if (pkt->stream_index != 0) { av_packet_unref(pkt); continue; }
    AVStream* os = out->streams[0];
    int64_t ts;
    if (timecodes_ms && vcount < n_timecodes) {
      ts = av_rescale_q((int64_t)(timecodes_ms[vcount] * 1000.0),
                        {1, 1000000}, os->time_base);
    } else {
      ts = av_rescale_q(vcount, {fps_den, fps_num}, os->time_base);
    }
    pkt->pts = pkt->dts = ts;
    if (timecodes_ms && vcount + 1 < n_timecodes) {
      int64_t nxt = av_rescale_q(
          (int64_t)(timecodes_ms[vcount + 1] * 1000.0), {1, 1000000},
          os->time_base);
      pkt->duration = nxt - ts;
    } else {
      pkt->duration = av_rescale_q(1, {fps_den, fps_num}, os->time_base);
    }
    pkt->stream_index = 0;
    vcount++;
    if (av_interleaved_write_frame(out, pkt) < 0) goto done;
  }
  for (int i = 0, oidx = 0; i < n_audio; i++) {
    if (!ains[i]) continue;
    oidx++;
    int sr = ains[i]->streams[0]->codecpar->sample_rate;
    int fs = ains[i]->streams[0]->codecpar->frame_size;
    if (fs <= 0) fs = 1024;
    while (av_read_frame(ains[i], pkt) >= 0) {
      if (pkt->stream_index != 0) { av_packet_unref(pkt); continue; }
      AVStream* os = out->streams[oidx];
      pkt->pts = pkt->dts = av_rescale_q(acounts[i] * fs, {1, sr},
                                         os->time_base);
      pkt->duration = av_rescale_q(fs, {1, sr}, os->time_base);
      pkt->stream_index = oidx;
      acounts[i]++;
      if (av_interleaved_write_frame(out, pkt) < 0) goto done;
    }
  }
  if (av_write_trailer(out) < 0) goto done;
  err = 0;

done:
  av_dict_free(&mux_opts);
  av_packet_free(&pkt);
  if (vin) avformat_close_input(&vin);
  for (int i = 0; ains && i < n_audio; i++)
    if (ains[i]) avformat_close_input(&ains[i]);
  av_free(ains);
  av_free(acounts);
  if (out) {
    if (!(out->oformat->flags & AVFMT_NOFILE) && out->pb)
      avio_closep(&out->pb);
    avformat_free_context(out);
  }
  return err;
}

}  // extern "C"
