// Native video decode/encode for musev_tpu (libavformat/libavcodec/libswscale).
//
// TPU-native replacement for the reference's decord C++ reader and
// opencv/imageio writers (SURVEY §2.10 N3/N4): exposes a minimal C ABI that
// the Python layer drives via ctypes, designed for a double-buffered
// host->device feed: frames come out as contiguous RGB24 so they can be
// memcpy'd straight into a pinned numpy buffer.
//
// Build: make (produces libmusevio.so).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Reader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  SwsContext* sws = nullptr;
  int stream_index = -1;
  int width = 0, height = 0;
  double fps = 0.0;
  int64_t nframes = 0;  // best-effort
  int64_t next_frame = 0;  // next frame index the decoder will produce
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  std::string error;
};

void set_err(Reader* r, const std::string& msg) { r->error = msg; }

}  // namespace

extern "C" {

Reader* vio_open_reader(const char* path) {
  auto* r = new Reader();
  if (avformat_open_input(&r->fmt, path, nullptr, nullptr) < 0) {
    set_err(r, "open failed");
    return r;
  }
  if (avformat_find_stream_info(r->fmt, nullptr) < 0) {
    set_err(r, "no stream info");
    return r;
  }
  r->stream_index =
      av_find_best_stream(r->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (r->stream_index < 0) {
    set_err(r, "no video stream");
    return r;
  }
  AVStream* st = r->fmt->streams[r->stream_index];
  const AVCodec* codec = avcodec_find_decoder(st->codecpar->codec_id);
  if (!codec) {
    set_err(r, "no decoder");
    return r;
  }
  r->dec = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(r->dec, st->codecpar);
  r->dec->thread_count = 0;  // auto
  if (avcodec_open2(r->dec, codec, nullptr) < 0) {
    set_err(r, "decoder open failed");
    return r;
  }
  r->width = r->dec->width;
  r->height = r->dec->height;
  AVRational fr = av_guess_frame_rate(r->fmt, st, nullptr);
  r->fps = fr.den ? (double)fr.num / fr.den : 0.0;
  r->nframes = st->nb_frames;
  if (r->nframes <= 0 && r->fps > 0 && r->fmt->duration > 0) {
    r->nframes = (int64_t)(r->fmt->duration * r->fps / AV_TIME_BASE);
  }
  r->frame = av_frame_alloc();
  r->pkt = av_packet_alloc();
  return r;
}

const char* vio_reader_error(Reader* r) {
  return r->error.empty() ? nullptr : r->error.c_str();
}

int vio_reader_width(Reader* r) { return r->width; }
int vio_reader_height(Reader* r) { return r->height; }
double vio_reader_fps(Reader* r) { return r->fps; }
int64_t vio_reader_nframes(Reader* r) { return r->nframes; }

// Decode frames [start, start + count*stride) stepping by stride into `out`
// (count * height * width * 3 bytes, RGB24). Sequential-optimized: seeking
// backwards flushes and seeks. Returns number of frames written.
int64_t vio_read_frames(Reader* r, int64_t start, int64_t count,
                        int64_t stride, uint8_t* out) {
  if (!r->dec) return 0;
  AVStream* st = r->fmt->streams[r->stream_index];
  if (start < r->next_frame) {
    // backwards: seek to keyframe before `start`
    double sec = r->fps > 0 ? start / r->fps : 0;
    int64_t ts = (int64_t)(sec / av_q2d(st->time_base));
    av_seek_frame(r->fmt, r->stream_index, ts, AVSEEK_FLAG_BACKWARD);
    avcodec_flush_buffers(r->dec);
    r->next_frame = -1;  // unknown until first pts
  }
  if (!r->sws) {
    r->sws = sws_getContext(r->width, r->height, r->dec->pix_fmt, r->width,
                            r->height, AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr,
                            nullptr, nullptr);
  }
  int64_t written = 0;
  int64_t want = start;
  const int64_t frame_bytes = (int64_t)r->height * r->width * 3;

  auto drain = [&]() -> int {
    while (true) {
      int ret = avcodec_receive_frame(r->dec, r->frame);
      if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) return ret;
      if (ret < 0) return ret;
      if (r->next_frame < 0) {
        // recover frame index from pts after a seek
        double t = r->frame->pts * av_q2d(st->time_base);
        r->next_frame = (int64_t)(t * r->fps + 0.5);
      }
      int64_t idx = r->next_frame++;
      if (idx >= want && written < count) {
        uint8_t* dst[1] = {out + written * frame_bytes};
        int dst_stride[1] = {r->width * 3};
        sws_scale(r->sws, r->frame->data, r->frame->linesize, 0, r->height,
                  dst, dst_stride);
        ++written;
        want += stride;
      }
      av_frame_unref(r->frame);
      if (written >= count) return 0;
    }
  };

  bool eof_sent = false;
  while (written < count && !eof_sent) {
    int ret = av_read_frame(r->fmt, r->pkt);
    bool flushing = ret < 0;
    if (!flushing && r->pkt->stream_index != r->stream_index) {
      av_packet_unref(r->pkt);
      continue;
    }
    // send; on EAGAIN drain pending frames and resend the same packet
    while (true) {
      ret = avcodec_send_packet(r->dec, flushing ? nullptr : r->pkt);
      if (ret == AVERROR(EAGAIN)) {
        if (drain() < 0 && written >= count) break;
        continue;
      }
      break;
    }
    if (!flushing) av_packet_unref(r->pkt);
    if (flushing) eof_sent = true;
    if (ret < 0 && ret != AVERROR_EOF && !flushing) break;
    int dret = drain();
    if (flushing && dret == AVERROR_EOF) break;
    if (written >= count) break;
  }
  return written;
}

void vio_close_reader(Reader* r) {
  if (r->sws) sws_freeContext(r->sws);
  if (r->frame) av_frame_free(&r->frame);
  if (r->pkt) av_packet_free(&r->pkt);
  if (r->dec) avcodec_free_context(&r->dec);
  if (r->fmt) avformat_close_input(&r->fmt);
  delete r;
}

// Encode `n` RGB24 frames (n*h*w*3 bytes) to an h264 mp4. Returns 0 on
// success, negative on failure.
int vio_write_video(const char* path, const uint8_t* frames, int64_t n, int w,
                    int h, double fps, int crf) {
  AVFormatContext* fmt = nullptr;
  avformat_alloc_output_context2(&fmt, nullptr, nullptr, path);
  if (!fmt) return -1;
  const AVCodec* codec = avcodec_find_encoder_by_name("libx264");
  if (!codec) codec = avcodec_find_encoder_by_name("mpeg4");
  if (!codec) return -2;
  AVStream* st = avformat_new_stream(fmt, nullptr);
  AVCodecContext* enc = avcodec_alloc_context3(codec);
  enc->width = w;
  enc->height = h;
  enc->pix_fmt = AV_PIX_FMT_YUV420P;
  AVRational frate = av_d2q(fps, 1000000);
  enc->time_base = av_inv_q(frate);
  enc->framerate = frate;
  enc->gop_size = 12;
  enc->max_b_frames = 0;
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  char crf_s[16];
  snprintf(crf_s, sizeof crf_s, "%d", crf);
  av_opt_set(enc->priv_data, "crf", crf_s, 0);
  av_opt_set(enc->priv_data, "preset", "medium", 0);
  av_opt_set(enc->priv_data, "x264-params", "scenecut=0", 0);
  if (avcodec_open2(enc, codec, nullptr) < 0) return -3;
  avcodec_parameters_from_context(st->codecpar, enc);
  st->time_base = enc->time_base;
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) {
    if (avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) return -4;
  }
  if (avformat_write_header(fmt, nullptr) < 0) return -5;

  SwsContext* sws =
      sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h, AV_PIX_FMT_YUV420P,
                     SWS_BILINEAR, nullptr, nullptr, nullptr);
  AVFrame* fr = av_frame_alloc();
  fr->format = AV_PIX_FMT_YUV420P;
  fr->width = w;
  fr->height = h;
  av_frame_get_buffer(fr, 0);
  AVPacket* pkt = av_packet_alloc();

  auto drain = [&](bool flush) -> int {
    int ret = avcodec_send_frame(enc, flush ? nullptr : fr);
    if (ret < 0) return ret;
    while (true) {
      ret = avcodec_receive_packet(enc, pkt);
      if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) return 0;
      if (ret < 0) return ret;
      if (pkt->duration == 0) pkt->duration = 1;  // else mp4 trims the tail
      av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
      pkt->stream_index = st->index;
      av_interleaved_write_frame(fmt, pkt);
      av_packet_unref(pkt);
    }
  };

  const int64_t frame_bytes = (int64_t)h * w * 3;
  int rc = 0;
  for (int64_t i = 0; i < n && rc == 0; ++i) {
    av_frame_make_writable(fr);
    const uint8_t* src[1] = {frames + i * frame_bytes};
    int src_stride[1] = {w * 3};
    sws_scale(sws, src, src_stride, 0, h, fr->data, fr->linesize);
    fr->pts = i;
    rc = drain(false);
  }
  if (rc == 0) rc = drain(true);
  av_write_trailer(fmt);
  sws_freeContext(sws);
  av_frame_free(&fr);
  av_packet_free(&pkt);
  avcodec_free_context(&enc);
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  return rc;
}

}  // extern "C"
