// Native video decoder for the staging hot path.
//
// libavformat/libavcodec demux + decode with optional DCT-domain lowres
// (mpeg4-family codecs can decode at 1/2^k resolution directly), then
// libswscale converts/scales each frame straight to the model input
// resolution into a caller-provided packed buffer. This replaces
// cv2.VideoCapture on the predict staging path, which always converts
// YUV->BGR at FULL source resolution before the host resize (the
// TPU-side equivalent of the reference's decode loop,
// reference predict.py:126-161).
//
// C ABI only - consumed via ctypes (tracknetv3_tpu/native_video.py).
// Build: make -C native libtrackvideo.so (links system libav* if present).

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <cstring>

namespace {

struct VDec {
  AVFormatContext *fmt = nullptr;
  AVCodecContext *cc = nullptr;
  SwsContext *sws = nullptr;
  AVFrame *frame = nullptr;
  AVPacket *pkt = nullptr;
  int stream = -1;
  int out_w = 0, out_h = 0;
  int sws_src_w = -1, sws_src_h = -1, sws_src_fmt = -1, sws_dst_fmt = -1;
  bool eof_sent = false;
  bool done = false;
};

void vdec_free(VDec *d) {
  if (!d) return;
  if (d->sws) sws_freeContext(d->sws);
  if (d->frame) av_frame_free(&d->frame);
  if (d->pkt) av_packet_free(&d->pkt);
  if (d->cc) avcodec_free_context(&d->cc);
  if (d->fmt) avformat_close_input(&d->fmt);
  delete d;
}

}  // namespace

extern "C" {

// Open a video. out_w/out_h: packed output resolution. lowres: requested
// DCT-domain decode reduction (clamped to the codec's max; 0 = full res;
// -1 = AUTO: the largest level whose decoded dims still cover out_w/out_h,
// so the swscale step always downscales). Reports the CONTAINER-declared
// source dims (full resolution - callers scale coordinates with these),
// frame count (-1 if unknown), fps, and the lowres level actually applied.
// Returns nullptr on any failure.
void *vdec_open(const char *path, int out_w, int out_h, int lowres,
                int *src_w, int *src_h, long long *nframes, double *fps,
                int *applied_lowres) {
  VDec *d = new VDec();
  d->out_w = out_w;
  d->out_h = out_h;
  if (avformat_open_input(&d->fmt, path, nullptr, nullptr) < 0) {
    vdec_free(d);
    return nullptr;
  }
  if (avformat_find_stream_info(d->fmt, nullptr) < 0) {
    vdec_free(d);
    return nullptr;
  }
  const AVCodec *codec = nullptr;
  d->stream =
      av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
  if (d->stream < 0 || !codec) {
    vdec_free(d);
    return nullptr;
  }
  AVStream *st = d->fmt->streams[d->stream];
  d->cc = avcodec_alloc_context3(codec);
  if (!d->cc || avcodec_parameters_to_context(d->cc, st->codecpar) < 0) {
    vdec_free(d);
    return nullptr;
  }
  d->cc->thread_count = 1;  // single-core hosts: threads only add overhead
  int lr = lowres;
  if (lr < 0) {  // auto: decoded dims must stay >= the output dims
    lr = 0;
    while (lr < 3 && (st->codecpar->width >> (lr + 1)) >= out_w &&
           (st->codecpar->height >> (lr + 1)) >= out_h)
      ++lr;
  }
  if (lr > codec->max_lowres) lr = codec->max_lowres;
  if (lr < 0) lr = 0;
  d->cc->lowres = lr;
  if (applied_lowres) *applied_lowres = lr;
  if (avcodec_open2(d->cc, codec, nullptr) < 0) {
    vdec_free(d);
    return nullptr;
  }
  d->frame = av_frame_alloc();
  d->pkt = av_packet_alloc();
  if (!d->frame || !d->pkt) {
    vdec_free(d);
    return nullptr;
  }
  if (src_w) *src_w = st->codecpar->width;
  if (src_h) *src_h = st->codecpar->height;
  if (nframes) *nframes = st->nb_frames > 0 ? st->nb_frames : -1;
  if (fps) {
    AVRational r = st->avg_frame_rate;
    *fps = (r.den > 0 && r.num > 0) ? av_q2d(r) : 0.0;
  }
  return d;
}

namespace {

// Shared decode loop: scale/convert each frame into ``out`` with the given
// packed layout. dst_fmt BGR24/RGB24 -> HxWx3 interleaved (frame_bytes =
// w*h*3); dst_fmt YUV420P -> planar Y (h*w) + U (h/2*w/2) + V (h/2*w/2)
// per frame (frame_bytes = w*h*3/2) - HALF the bytes of the packed-RGB
// form, for H2D-bandwidth-bound staging (the RGB conversion then runs on
// device where it fuses into the finalize program for free).
int read_frames_impl(VDec *d, unsigned char *out, int max_frames,
                     AVPixelFormat dst_fmt) {
  if (!d || d->done) return 0;
  const bool planar = dst_fmt == AV_PIX_FMT_YUV420P;
  const size_t frame_bytes = planar
                                 ? static_cast<size_t>(d->out_w) * d->out_h * 3 / 2
                                 : static_cast<size_t>(d->out_w) * d->out_h * 3;
  const size_t y_bytes = static_cast<size_t>(d->out_w) * d->out_h;
  int written = 0;
  while (written < max_frames) {
    int rr = avcodec_receive_frame(d->cc, d->frame);
    if (rr == 0) {
      AVFrame *f = d->frame;
      if (!d->sws || f->width != d->sws_src_w || f->height != d->sws_src_h ||
          f->format != d->sws_src_fmt || dst_fmt != d->sws_dst_fmt) {
        if (d->sws) sws_freeContext(d->sws);
        d->sws = sws_getContext(
            f->width, f->height, static_cast<AVPixelFormat>(f->format),
            d->out_w, d->out_h, dst_fmt,
            SWS_BILINEAR, nullptr, nullptr, nullptr);
        d->sws_src_w = f->width;
        d->sws_src_h = f->height;
        d->sws_src_fmt = f->format;
        d->sws_dst_fmt = dst_fmt;
        if (!d->sws) return -1;
      }
      unsigned char *base = out + static_cast<size_t>(written) * frame_bytes;
      uint8_t *dst[4] = {base, nullptr, nullptr, nullptr};
      int dst_stride[4] = {d->out_w * 3, 0, 0, 0};
      if (planar) {
        dst[1] = base + y_bytes;
        dst[2] = base + y_bytes + y_bytes / 4;
        dst_stride[0] = d->out_w;
        dst_stride[1] = d->out_w / 2;
        dst_stride[2] = d->out_w / 2;
      }
      sws_scale(d->sws, f->data, f->linesize, 0, f->height, dst, dst_stride);
      av_frame_unref(f);
      ++written;
      continue;
    }
    if (rr == AVERROR_EOF) {
      d->done = true;
      break;
    }
    if (rr != AVERROR(EAGAIN)) return -1;
    // feed more packets
    if (d->eof_sent) return -1;  // EAGAIN after flush: nothing left to
                                 // feed; spinning here would hang the
                                 // producer thread forever
    int pr = av_read_frame(d->fmt, d->pkt);
    if (pr < 0) {
      // Only clean end-of-file may transition to draining: a mid-stream
      // demux error (corrupt/truncated container) must surface as -1,
      // not masquerade as a short-but-successful video.
      if (pr != AVERROR_EOF) return -1;
      avcodec_send_packet(d->cc, nullptr);  // start draining
      d->eof_sent = true;
      continue;
    }
    if (d->pkt->stream_index == d->stream) {
      if (avcodec_send_packet(d->cc, d->pkt) < 0) {
        av_packet_unref(d->pkt);
        return -1;
      }
    }
    av_packet_unref(d->pkt);
  }
  return written;
}

}  // namespace

// Decode up to max_frames frames, scaling/converting each into ``out``
// (packed HxWx3, frame-major; bgr selects BGR24 vs RGB24). Returns the
// number of frames written; 0 at end of stream; -1 on decode error.
int vdec_read(void *h, unsigned char *out, int max_frames, int bgr) {
  return read_frames_impl(static_cast<VDec *>(h), out, max_frames,
                          bgr ? AV_PIX_FMT_BGR24 : AV_PIX_FMT_RGB24);
}

// Decode up to max_frames frames as planar YUV420 at the output resolution
// (per frame: Y[h*w], U[h/2*w/2], V[h/2*w/2] -> w*h*3/2 bytes). The output
// dims must be even. Same return contract as vdec_read.
int vdec_read_yuv(void *h, unsigned char *out, int max_frames) {
  VDec *d = static_cast<VDec *>(h);
  if (!d || (d->out_w % 2) || (d->out_h % 2)) return -1;
  return read_frames_impl(d, out, max_frames, AV_PIX_FMT_YUV420P);
}

void vdec_close(void *h) { vdec_free(static_cast<VDec *>(h)); }

// Encode a synthetic test clip (gray background + moving bright square)
// with the named codec (e.g. "libx264", "mpeg4"). Test-fixture utility:
// cv2's bundled ffmpeg cannot encode h264, so decoder tests use this to
// produce h264 inputs. Returns 0 on success, -1 on failure.
int venc_write_test_clip(const char *path, const char *codec_name, int n,
                         int w, int h) {
  AVFormatContext *fmt = nullptr;
  if (avformat_alloc_output_context2(&fmt, nullptr, nullptr, path) < 0 || !fmt)
    return -1;
  const AVCodec *codec = avcodec_find_encoder_by_name(codec_name);
  AVCodecContext *cc = codec ? avcodec_alloc_context3(codec) : nullptr;
  AVStream *st = cc ? avformat_new_stream(fmt, codec) : nullptr;
  AVFrame *frame = av_frame_alloc();
  AVPacket *pkt = av_packet_alloc();
  int ret = -1;
  if (st && frame && pkt) {
    cc->width = w;
    cc->height = h;
    cc->pix_fmt = AV_PIX_FMT_YUV420P;
    cc->time_base = {1, 30};
    cc->framerate = {30, 1};
    cc->gop_size = 12;
    cc->bit_rate = 2'000'000;
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
      cc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    st->time_base = cc->time_base;
    frame->format = cc->pix_fmt;
    frame->width = w;
    frame->height = h;
    if (avcodec_open2(cc, codec, nullptr) == 0 &&
        avcodec_parameters_from_context(st->codecpar, cc) >= 0 &&
        av_frame_get_buffer(frame, 0) == 0 &&
        avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) >= 0 &&
        avformat_write_header(fmt, nullptr) >= 0) {
      auto drain = [&](AVFrame *f) {
        if (avcodec_send_frame(cc, f) < 0) return false;
        while (true) {
          int r = avcodec_receive_packet(cc, pkt);
          if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) return true;
          if (r < 0) return false;
          av_packet_rescale_ts(pkt, cc->time_base, st->time_base);
          pkt->stream_index = st->index;
          if (av_interleaved_write_frame(fmt, pkt) < 0) return false;
        }
      };
      bool ok = true;
      for (int t = 0; ok && t < n; ++t) {
        av_frame_make_writable(frame);
        memset(frame->data[0], 80, frame->linesize[0] * h);
        memset(frame->data[1], 128, frame->linesize[1] * (h / 2));
        memset(frame->data[2], 128, frame->linesize[2] * (h / 2));
        int x = 20 + (w - 60) * t / (n > 1 ? n - 1 : 1);
        int y = h / 3 + (h / 4) * t / (n > 1 ? n - 1 : 1);
        // clamp the square to the frame: small w would otherwise drive x
        // negative and memset before the row start (this is an exported
        // C-ABI entry point callable with arbitrary dims)
        if (x < 0) x = 0;
        int sq_w = (x + 10 <= w) ? 10 : (w - x);
        if (sq_w > 0)
          for (int r = y; r < y + 10 && r < h; ++r)
            memset(frame->data[0] + r * frame->linesize[0] + x, 235, sq_w);
        frame->pts = t;
        ok = drain(frame);
      }
      if (ok && drain(nullptr) && av_write_trailer(fmt) == 0) ret = 0;
    }
  }
  if (fmt && fmt->pb) avio_closep(&fmt->pb);
  av_packet_free(&pkt);
  av_frame_free(&frame);
  if (cc) avcodec_free_context(&cc);
  if (fmt) avformat_free_context(fmt);
  return ret;
}

}  // extern "C"
