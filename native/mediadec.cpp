// Native host-side media runtime: libavcodec video decode into caller-owned
// I420 buffers, plus the fused host pixel ops the streaming pipeline needs
// (detection downsample, bbox crop+resize) — all zero-Python-per-frame.
//
// Replaces the reference's cv2/ffmpeg-subprocess media layer
// (reference pose_pipeline/pipeline.py:47-87, utils/bounding_box.py:101-194)
// with a first-party C++ feeder: the TPU does all tensor compute; the host's
// only jobs are entropy decode and byte shuffling, and those must not pay
// per-frame interpreter, allocator, or cv2-dispatch costs.
//
// I420 frame layout used throughout: one contiguous byte block of size
// W*H*3/2 per frame — Y plane (H×W), then U (H/2×W/2), then V (H/2×W/2).
// Device-side ops (ops/colorspace.py) reshape this flat block and convert
// YUV→RGB on the TPU, where the 3×3 colorspace matmul is effectively free.
//
// Build: g++ -O3 -march=native -shared -fPIC mediadec.cpp -lavformat -lavcodec
//        -lavutil -lswscale -o _libpptmedia.so

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

namespace {

struct Decoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;  // only if source pix_fmt != YUV420P
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  AVFrame* conv = nullptr;    // swscale target when converting
  int stream_index = -1;
  int width = 0, height = 0;
  double fps = 0.0;
  int64_t nframes = 0;
  bool draining = false;
};

// Copy an AVFrame (yuv420p) into a contiguous I420 block.
void copy_i420(const AVFrame* f, uint8_t* dst, int W, int H) {
  uint8_t* p = dst;
  for (int r = 0; r < H; ++r, p += W)
    std::memcpy(p, f->data[0] + (size_t)r * f->linesize[0], W);
  const int cw = W / 2, ch = H / 2;
  for (int r = 0; r < ch; ++r, p += cw)
    std::memcpy(p, f->data[1] + (size_t)r * f->linesize[1], cw);
  for (int r = 0; r < ch; ++r, p += cw)
    std::memcpy(p, f->data[2] + (size_t)r * f->linesize[2], cw);
}

}  // namespace

extern "C" {

// Open a video; threads>1 enables libavcodec frame threading (multi-core
// hosts); threads==0 lets ffmpeg pick. fast_decode!=0 additionally skips
// the in-loop deblocking filter (AVDISCARD_ALL) — a standard ffmpeg speed
// knob (-skip_loop_filter all) that trades a slight, bounded pixel
// difference for ~15-30% less h264 decode CPU; the measured accuracy cost
// on the committed protocol is documented in PERF.md. Returns NULL on
// failure.
void* mdec_open2(const char* path, int threads, int fast_decode) {
  av_log_set_level(AV_LOG_ERROR);
  Decoder* d = new Decoder();
  if (avformat_open_input(&d->fmt, path, nullptr, nullptr) < 0) { delete d; return nullptr; }
  if (avformat_find_stream_info(d->fmt, nullptr) < 0) {
    avformat_close_input(&d->fmt); delete d; return nullptr;
  }
  const AVCodec* dec = nullptr;
  d->stream_index = av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
  if (d->stream_index < 0 || !dec) {
    avformat_close_input(&d->fmt); delete d; return nullptr;
  }
  AVStream* st = d->fmt->streams[d->stream_index];
  d->codec = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(d->codec, st->codecpar);
  d->codec->thread_count = threads < 0 ? 1 : threads;
  d->codec->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
  // decode shortcuts that do not change pixel output for common codecs
  d->codec->flags2 |= AV_CODEC_FLAG2_FAST;
  if (fast_decode) d->codec->skip_loop_filter = AVDISCARD_ALL;
  if (avcodec_open2(d->codec, dec, nullptr) < 0) {
    avcodec_free_context(&d->codec); avformat_close_input(&d->fmt); delete d; return nullptr;
  }
  d->width = d->codec->width;
  d->height = d->codec->height;
  AVRational fr = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  d->fps = fr.den ? (double)fr.num / fr.den : 0.0;
  d->nframes = st->nb_frames;
  d->pkt = av_packet_alloc();
  d->frame = av_frame_alloc();
  return d;
}

void* mdec_open(const char* path, int threads) {
  return mdec_open2(path, threads, 0);
}

int mdec_width(void* h)  { return ((Decoder*)h)->width; }
int mdec_height(void* h) { return ((Decoder*)h)->height; }
double mdec_fps(void* h) { return ((Decoder*)h)->fps; }
int64_t mdec_nframes(void* h) { return ((Decoder*)h)->nframes; }

// Decode up to max_frames into out (contiguous I420 blocks of W*H*3/2 bytes
// each). Returns the number of frames written; 0 = end of stream; -1 = error.
int mdec_read(void* h, uint8_t* out, int max_frames) {
  Decoder* d = (Decoder*)h;
  const int W = d->width, H = d->height;
  const size_t fsz = (size_t)W * H * 3 / 2;
  int n = 0;
  while (n < max_frames) {
    int r = avcodec_receive_frame(d->codec, d->frame);
    if (r == 0) {
      if (d->frame->format == AV_PIX_FMT_YUV420P ||
          d->frame->format == AV_PIX_FMT_YUVJ420P) {
        copy_i420(d->frame, out + (size_t)n * fsz, W, H);
      } else {
        if (!d->sws) {
          d->sws = sws_getContext(W, H, (AVPixelFormat)d->frame->format,
                                  W, H, AV_PIX_FMT_YUV420P,
                                  SWS_BILINEAR, nullptr, nullptr, nullptr);
          d->conv = av_frame_alloc();
          d->conv->format = AV_PIX_FMT_YUV420P;
          d->conv->width = W; d->conv->height = H;
          av_frame_get_buffer(d->conv, 32);
        }
        sws_scale(d->sws, d->frame->data, d->frame->linesize, 0, H,
                  d->conv->data, d->conv->linesize);
        copy_i420(d->conv, out + (size_t)n * fsz, W, H);
      }
      av_frame_unref(d->frame);
      ++n;
      continue;
    }
    if (r == AVERROR_EOF) break;
    if (r != AVERROR(EAGAIN)) return n > 0 ? n : -1;
    if (d->draining) continue;
    // feed more packets
    int pr = av_read_frame(d->fmt, d->pkt);
    if (pr < 0) {
      avcodec_send_packet(d->codec, nullptr);  // start drain
      d->draining = true;
      continue;
    }
    if (d->pkt->stream_index == d->stream_index)
      avcodec_send_packet(d->codec, d->pkt);
    av_packet_unref(d->pkt);
  }
  return n;
}

void mdec_close(void* h) {
  Decoder* d = (Decoder*)h;
  if (d->sws) sws_freeContext(d->sws);
  if (d->conv) av_frame_free(&d->conv);
  if (d->frame) av_frame_free(&d->frame);
  if (d->pkt) av_packet_free(&d->pkt);
  if (d->codec) avcodec_free_context(&d->codec);
  if (d->fmt) avformat_close_input(&d->fmt);
  delete d;
}

// ---------------------------------------------------------------------------
// Host pixel ops on I420 frames (no per-frame Python/numpy/cv2 overhead).
// ---------------------------------------------------------------------------

// Integer-stride downsample of an I420 frame into a smaller I420 frame for
// the detection branch: out dims (oh, ow) with oh=H/s/2*2, ow=W/s/2*2 chosen
// by the caller; plain nearest (stride) sampling — a memcpy-class op, same
// semantics as frames[::s, ::s] on the Y plane.
void mdec_downsample_i420(const uint8_t* src, int W, int H, int s,
                          uint8_t* dst, int ow, int oh) {
  const uint8_t* Y = src;
  const uint8_t* U = src + (size_t)W * H;
  const uint8_t* V = U + (size_t)W * H / 4;
  // clamp source coords: output dims may be aligned UP past H/s, W/s —
  // the overhang replicates edge pixels instead of reading out of bounds
  uint8_t* p = dst;
  for (int r = 0; r < oh; ++r) {
    const uint8_t* row = Y + (size_t)std::min(r * s, H - 1) * W;
    for (int c = 0; c < ow; ++c) p[c] = row[std::min(c * s, W - 1)];
    p += ow;
  }
  const int cw = W / 2, ch = H / 2, ocw = ow / 2, och = oh / 2;
  for (int r = 0; r < och; ++r) {
    const uint8_t* row = U + (size_t)std::min(r * s, ch - 1) * cw;
    for (int c = 0; c < ocw; ++c) p[c] = row[std::min(c * s, cw - 1)];
    p += ocw;
  }
  for (int r = 0; r < och; ++r) {
    const uint8_t* row = V + (size_t)std::min(r * s, ch - 1) * cw;
    for (int c = 0; c < ocw; ++c) p[c] = row[std::min(c * s, cw - 1)];
    p += ocw;
  }
}

namespace {
// Bilinear resize of a sub-rectangle of one plane into a sub-rectangle of an
// output plane; out-of-source area is left untouched (caller zeroes).
//
// Separable fixed-point implementation: the horizontal pass gathers each
// needed source row once into a uint16 scratch row (cached — consecutive
// output rows share source rows on upscale), the vertical pass is a
// contiguous 2-tap blend the compiler vectorizes. 8-bit fixed-point weights
// match cv2 INTER_LINEAR's own fixed-point rounding class.
// ``sstride`` is the source row stride in bytes (>= sw; lets the same kernel
// read AVFrame planes in place, linesize-aware, without an I420 repack).
void resize_plane_region(const uint8_t* src, int sw, int sh, int sstride,
                         float x0, float y0, float bw, float bh,
                         uint8_t* dst, int dw, int /*dh*/,
                         int ox0, int oy0, int ox1, int oy1,
                         int full_ow, int full_oh) {
  const float sx = bw / full_ow, sy = bh / full_oh;
  const int ncols = ox1 - ox0;
  if (ncols <= 0 || oy1 <= oy0) return;
  static thread_local std::vector<int> ix_vec;
  static thread_local std::vector<uint16_t> wx_vec;
  static thread_local std::vector<uint16_t> hrow_vec;  // 2 cached h-passed rows
  ix_vec.resize(ncols);
  wx_vec.resize(ncols);
  hrow_vec.resize(2 * (size_t)ncols);
  int* ix_tab = ix_vec.data();
  uint16_t* wx_tab = wx_vec.data();
  uint16_t* hrow[2] = {hrow_vec.data(), hrow_vec.data() + ncols};
  int hrow_src[2] = {-1, -1};
  const int nc = ncols;
  for (int k = 0; k < nc; ++k) {
    float fx = x0 + (ox0 + k + 0.5f) * sx - 0.5f;
    int ix = (int)fx; float wx = fx - ix;
    if (fx < 0) { ix = 0; wx = 0; }
    if (ix >= sw - 1) { ix = sw - 2 < 0 ? 0 : sw - 2; wx = 1; }
    ix_tab[k] = ix;
    wx_tab[k] = (uint16_t)(wx * 256.0f + 0.5f);
  }
  // horizontal pass for one source row -> uint16 (value * 256).
  // Split into a scalar gather into a staging row and a separate arithmetic
  // loop: the gather is irreducibly scalar (data-dependent indices) but one
  // unaligned 16-bit load grabs both taps, and once the taps are contiguous
  // the widening multiply-add loop auto-vectorizes (measured ~18% faster
  // crop end-to-end vs the fused gather+arithmetic loop, 1-core host).
  static thread_local std::vector<uint16_t> tap_vec;
  tap_vec.resize(ncols);
  uint16_t* taps = tap_vec.data();
  auto hpass = [&](int iy, int slot) {
    const uint8_t* r = src + (size_t)iy * sstride;
    uint16_t* o = hrow[slot];
    for (int k = 0; k < nc; ++k) {
      // one unaligned 16-bit load grabs both taps (ix, ix+1); ix+1 < sw is
      // guaranteed by the ix_tab clamp above
      uint16_t pair;
      std::memcpy(&pair, r + ix_tab[k], 2);
      taps[k] = pair;
    }
    for (int k = 0; k < nc; ++k) {  // contiguous: vectorizes
      const uint16_t lo = taps[k] & 0xff, hi = taps[k] >> 8;
      o[k] = (uint16_t)((256 - wx_tab[k]) * lo + wx_tab[k] * hi);
    }
    hrow_src[slot] = iy;
  };
  auto get_row = [&](int iy) -> const uint16_t* {
    if (hrow_src[0] == iy) return hrow[0];
    if (hrow_src[1] == iy) return hrow[1];
    int slot = (hrow_src[0] < hrow_src[1]) ? 0 : 1;  // evict older row
    hpass(iy, slot);
    return hrow[slot];
  };
  for (int r = oy0; r < oy1; ++r) {
    float fy = y0 + (r + 0.5f) * sy - 0.5f;
    int iy = (int)fy; float wy = fy - iy;
    if (fy < 0) { iy = 0; wy = 0; }
    if (iy >= sh - 1) { iy = sh - 2 < 0 ? 0 : sh - 2; wy = 1; }
    const int iy1 = std::min(iy + 1, sh - 1);
    const uint16_t* t0 = get_row(iy);
    const uint16_t* t1 = get_row(iy1);
    uint8_t* o = dst + (size_t)r * dw + ox0;
    const uint32_t w1 = (uint32_t)(wy * 256.0f + 0.5f), w0 = 256 - w1;
    for (int k = 0; k < nc; ++k)  // contiguous: vectorizes
      o[k] = (uint8_t)((w0 * t0[k] + w1 * t1[k] + (1u << 15)) >> 16);
  }
}
}  // namespace

// Crop box (x, y, w, h) in full-res pixel coords out of an I420 frame and
// bilinear-resize to an I420 crop of (tw, th). The out-of-image part of the
// box stays zero (cv2 constant-border semantics, matching
// runtime/stream.py's host crop and ops/warp.py's device crop).
void mdec_crop_i420(const uint8_t* src, int W, int H,
                    float bx, float by, float bw, float bh,
                    uint8_t* dst, int tw, int th) {
  if (bw <= 0 || bh <= 0) {
    std::memset(dst, 0, (size_t)tw * th * 3 / 2);
    return;
  }
  // output region covered by the image (rest stays zero)
  float xi0 = std::max(bx, 0.0f), yi0 = std::max(by, 0.0f);
  float xi1 = std::min(bx + bw, (float)W), yi1 = std::min(by + bh, (float)H);
  if (xi1 <= xi0 || yi1 <= yi0) {
    std::memset(dst, 0, (size_t)tw * th * 3 / 2);
    return;
  }
  int ox0 = (int)((xi0 - bx) / bw * tw + 0.5f);
  int ox1 = (int)((xi1 - bx) / bw * tw + 0.5f);
  int oy0 = (int)((yi0 - by) / bh * th + 0.5f);
  int oy1 = (int)((yi1 - by) / bh * th + 0.5f);
  ox0 = std::max(0, ox0); oy0 = std::max(0, oy0);
  ox1 = std::min(tw, ox1); oy1 = std::min(th, oy1);
  if (ox1 <= ox0 || oy1 <= oy0) {
    std::memset(dst, 0, (size_t)tw * th * 3 / 2);
    return;
  }
  if (ox0 > 0 || oy0 > 0 || ox1 < tw || oy1 < th)
    std::memset(dst, 0, (size_t)tw * th * 3 / 2);
  const uint8_t* Y = src;
  const uint8_t* U = src + (size_t)W * H;
  const uint8_t* V = U + (size_t)W * H / 4;
  uint8_t* dY = dst;
  uint8_t* dU = dst + (size_t)tw * th;
  uint8_t* dV = dU + (size_t)tw * th / 4;
  resize_plane_region(Y, W, H, W, bx, by, bw, bh, dY, tw, th,
                      ox0, oy0, ox1, oy1, tw, th);
  resize_plane_region(U, W / 2, H / 2, W / 2, bx / 2, by / 2, bw / 2, bh / 2,
                      dU, tw / 2, th / 2, ox0 / 2, oy0 / 2, ox1 / 2, oy1 / 2,
                      tw / 2, th / 2);
  resize_plane_region(V, W / 2, H / 2, W / 2, bx / 2, by / 2, bw / 2, bh / 2,
                      dV, tw / 2, th / 2, ox0 / 2, oy0 / 2, ox1 / 2, oy1 / 2,
                      tw / 2, th / 2);
}

// Batch crop: frames is N contiguous I420 frames; boxes is N×4 float32
// (x, y, w, h); writes N I420 crops of (tw, th).
void mdec_crop_batch_i420(const uint8_t* frames, int N, int W, int H,
                          const float* boxes, uint8_t* dst, int tw, int th) {
  const size_t fsz = (size_t)W * H * 3 / 2;
  const size_t csz = (size_t)tw * th * 3 / 2;
  for (int i = 0; i < N; ++i) {
    const float* b = boxes + 4 * i;
    mdec_crop_i420(frames + fsz * i, W, H, b[0], b[1], b[2], b[3],
                   dst + csz * i, tw, th);
  }
}

// Batch downsample of every ``interval``-th frame: reads frames
// 0, interval, 2*interval, … from a contiguous I420 frame block and writes
// n_out small I420 frames (the detection keyframe batch).
void mdec_downsample_batch_i420(const uint8_t* frames, int n_out, int W,
                                int H, int s, int interval,
                                uint8_t* dst, int ow, int oh) {
  const size_t fsz = (size_t)W * H * 3 / 2;
  const size_t osz = (size_t)ow * oh * 3 / 2;
  for (int i = 0; i < n_out; ++i)
    mdec_downsample_i420(frames + fsz * (size_t)i * interval, W, H, s,
                         dst + osz * i, ow, oh);
}

// ---------------------------------------------------------------------------
// Zero-copy decode: ref-counted AVFrame handles.
//
// mdec_read copies every decoded frame into a packed I420 block — ~3 MB of
// memcpy per 1080p frame that exists only so later host ops (downsample,
// crop) have a known layout. The handle API skips it: decode returns
// av_frame_clone'd references into the decoder's own buffer pool, and the
// downsample/crop ops read the planes in place (linesize-aware). The frame
// pool grows to cover however many handles the caller holds (the streaming
// runner bounds this with its in-flight chunk semaphore).
// ---------------------------------------------------------------------------

// Decode up to max_frames, storing one AVFrame* handle per frame.
// Returns count; 0 = end of stream; -1 = error. Non-yuv420p sources are
// converted through swscale into freshly allocated frames (rare path).
int mdec_read_refs(void* h, void** out_handles, int max_frames) {
  Decoder* d = (Decoder*)h;
  const int W = d->width, H = d->height;
  int n = 0;
  while (n < max_frames) {
    int r = avcodec_receive_frame(d->codec, d->frame);
    if (r == 0) {
      if (d->frame->format == AV_PIX_FMT_YUV420P ||
          d->frame->format == AV_PIX_FMT_YUVJ420P) {
        out_handles[n] = av_frame_clone(d->frame);
      } else {
        if (!d->sws) {
          d->sws = sws_getContext(W, H, (AVPixelFormat)d->frame->format,
                                  W, H, AV_PIX_FMT_YUV420P,
                                  SWS_BILINEAR, nullptr, nullptr, nullptr);
        }
        AVFrame* cf = av_frame_alloc();
        cf->format = AV_PIX_FMT_YUV420P;
        cf->width = W; cf->height = H;
        av_frame_get_buffer(cf, 32);
        sws_scale(d->sws, d->frame->data, d->frame->linesize, 0, H,
                  cf->data, cf->linesize);
        out_handles[n] = cf;
      }
      av_frame_unref(d->frame);
      ++n;
      continue;
    }
    if (r == AVERROR_EOF) break;
    if (r != AVERROR(EAGAIN)) return n > 0 ? n : -1;
    if (d->draining) continue;
    int pr = av_read_frame(d->fmt, d->pkt);
    if (pr < 0) {
      avcodec_send_packet(d->codec, nullptr);
      d->draining = true;
      continue;
    }
    if (d->pkt->stream_index == d->stream_index)
      avcodec_send_packet(d->codec, d->pkt);
    av_packet_unref(d->pkt);
  }
  return n;
}

void mdec_release_refs(void** handles, int n) {
  for (int i = 0; i < n; ++i) {
    AVFrame* f = (AVFrame*)handles[i];
    if (f) av_frame_free(&f);
    handles[i] = nullptr;
  }
}

// Crop box (x, y, w, h) out of a held frame, bilinear-resized to (tw, th)
// I420 — same semantics as mdec_crop_i420, reading planes in place.
static void crop_ref_one(const AVFrame* f, int W, int H,
                         float bx, float by, float bw, float bh,
                         uint8_t* dst, int tw, int th) {
  if (bw <= 0 || bh <= 0) {
    std::memset(dst, 0, (size_t)tw * th * 3 / 2);
    return;
  }
  float xi0 = std::max(bx, 0.0f), yi0 = std::max(by, 0.0f);
  float xi1 = std::min(bx + bw, (float)W), yi1 = std::min(by + bh, (float)H);
  if (xi1 <= xi0 || yi1 <= yi0) {
    std::memset(dst, 0, (size_t)tw * th * 3 / 2);
    return;
  }
  int ox0 = (int)((xi0 - bx) / bw * tw + 0.5f);
  int ox1 = (int)((xi1 - bx) / bw * tw + 0.5f);
  int oy0 = (int)((yi0 - by) / bh * th + 0.5f);
  int oy1 = (int)((yi1 - by) / bh * th + 0.5f);
  ox0 = std::max(0, ox0); oy0 = std::max(0, oy0);
  ox1 = std::min(tw, ox1); oy1 = std::min(th, oy1);
  if (ox1 <= ox0 || oy1 <= oy0) {
    std::memset(dst, 0, (size_t)tw * th * 3 / 2);
    return;
  }
  // zero only when the image doesn't cover the whole output (the common
  // fully-inside box skips the 73 KB memset entirely)
  if (ox0 > 0 || oy0 > 0 || ox1 < tw || oy1 < th)
    std::memset(dst, 0, (size_t)tw * th * 3 / 2);
  uint8_t* dY = dst;
  uint8_t* dU = dst + (size_t)tw * th;
  uint8_t* dV = dU + (size_t)tw * th / 4;
  resize_plane_region(f->data[0], W, H, f->linesize[0],
                      bx, by, bw, bh, dY, tw, th, ox0, oy0, ox1, oy1, tw, th);
  resize_plane_region(f->data[1], W / 2, H / 2, f->linesize[1],
                      bx / 2, by / 2, bw / 2, bh / 2,
                      dU, tw / 2, th / 2, ox0 / 2, oy0 / 2, ox1 / 2, oy1 / 2,
                      tw / 2, th / 2);
  resize_plane_region(f->data[2], W / 2, H / 2, f->linesize[2],
                      bx / 2, by / 2, bw / 2, bh / 2,
                      dV, tw / 2, th / 2, ox0 / 2, oy0 / 2, ox1 / 2, oy1 / 2,
                      tw / 2, th / 2);
}

void mdec_crop_refs(void** handles, int n, int W, int H, const float* boxes,
                    uint8_t* dst, int tw, int th) {
  const size_t csz = (size_t)tw * th * 3 / 2;
  for (int i = 0; i < n; ++i) {
    const float* b = boxes + 4 * i;
    crop_ref_one((const AVFrame*)handles[i], W, H, b[0], b[1], b[2], b[3],
                 dst + csz * i, tw, th);
  }
}

// Strided downsample of every ``interval``-th held frame (linesize-aware
// twin of mdec_downsample_batch_i420).
void mdec_downsample_refs(void** handles, int n_out, int W, int H, int s,
                          int interval, uint8_t* dst, int ow, int oh) {
  const size_t osz = (size_t)ow * oh * 3 / 2;
  for (int i = 0; i < n_out; ++i) {
    const AVFrame* f = (const AVFrame*)handles[(size_t)i * interval];
    uint8_t* p = dst + osz * i;
    for (int r = 0; r < oh; ++r) {
      const uint8_t* row = f->data[0] + (size_t)std::min(r * s, H - 1) * f->linesize[0];
      for (int c = 0; c < ow; ++c) p[c] = row[std::min(c * s, W - 1)];
      p += ow;
    }
    const int cw = W / 2, ch = H / 2, ocw = ow / 2, och = oh / 2;
    for (int pl = 1; pl <= 2; ++pl) {
      for (int r = 0; r < och; ++r) {
        const uint8_t* row = f->data[pl] + (size_t)std::min(r * s, ch - 1) * f->linesize[pl];
        for (int c = 0; c < ocw; ++c) p[c] = row[std::min(c * s, cw - 1)];
        p += ocw;
      }
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Native H.264 (libx264) encode: first-party replacement for the reference's
// `ffmpeg -c:v libx264` subprocess recompression of every *Video artifact
// (reference pose_pipeline/pipeline.py:69, utils/visualization.py:72-76,
// utils/video_format.py:11). In-process libavformat mux + libavcodec/libx264
// encode — no subprocess, no temp pipe, and the overlay writer hands frames
// straight from its I420 buffers.
// ---------------------------------------------------------------------------

namespace {

struct Encoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  AVStream* stream = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  int64_t next_pts = 0;
  int width = 0, height = 0;
  bool header_written = false;
};

int enc_drain(Encoder* e) {
  while (true) {
    int r = avcodec_receive_packet(e->codec, e->pkt);
    if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) return 0;
    if (r < 0) return -1;
    // explicit 1-frame duration: without it the mp4 edit list ends one
    // frame short and demuxers flag the final sample AV_PKT_FLAG_DISCARD
    // (observed: 10-frame encodes decoding to 9 everywhere)
    e->pkt->duration = 1;
    av_packet_rescale_ts(e->pkt, e->codec->time_base, e->stream->time_base);
    e->pkt->stream_index = e->stream->index;
    if (av_interleaved_write_frame(e->fmt, e->pkt) < 0) return -1;
  }
}

}  // namespace

extern "C" {

// Open an MP4/libx264 encoder writing to `path`. crf in [0,51] (23 = x264
// default; 28 ≈ the visually-lossless-enough clinical artifact tier);
// preset e.g. "veryfast" (the overlay artifacts are write-once,
// play-many — veryfast keeps host encode off the pipeline's critical path).
// Returns NULL on failure (e.g. libx264 not built in — callers fall back to
// the cv2 writer).
void* menc_open(const char* path, int W, int H, double fps, int crf,
                const char* preset) {
  av_log_set_level(AV_LOG_ERROR);
  const AVCodec* enc = avcodec_find_encoder_by_name("libx264");
  if (!enc) return nullptr;
  Encoder* e = new Encoder();
  e->width = W; e->height = H;
  if (avformat_alloc_output_context2(&e->fmt, nullptr, nullptr, path) < 0 ||
      !e->fmt) { delete e; return nullptr; }
  e->codec = avcodec_alloc_context3(enc);
  e->codec->width = W;
  e->codec->height = H;
  e->codec->pix_fmt = AV_PIX_FMT_YUV420P;
  // rational fps: support e.g. 29.97 exactly enough for clinical playback
  AVRational fr = av_d2q(fps > 0 ? fps : 30.0, 100000);
  e->codec->time_base = AVRational{fr.den, fr.num};
  e->codec->framerate = fr;
  e->codec->gop_size = 2 * (int)(fps > 0 ? fps + 0.5 : 30);
  if (e->fmt->oformat->flags & AVFMT_GLOBALHEADER)
    e->codec->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  AVDictionary* opts = nullptr;
  char crfbuf[8];
  snprintf(crfbuf, sizeof crfbuf, "%d", crf < 0 ? 23 : crf);
  av_dict_set(&opts, "crf", crfbuf, 0);
  av_dict_set(&opts, "preset", preset && *preset ? preset : "veryfast", 0);
  if (avcodec_open2(e->codec, enc, &opts) < 0) {
    av_dict_free(&opts);
    avcodec_free_context(&e->codec);
    avformat_free_context(e->fmt);
    delete e; return nullptr;
  }
  av_dict_free(&opts);
  e->stream = avformat_new_stream(e->fmt, nullptr);
  e->stream->time_base = e->codec->time_base;
  avcodec_parameters_from_context(e->stream->codecpar, e->codec);
  if (!(e->fmt->oformat->flags & AVFMT_NOFILE) &&
      avio_open(&e->fmt->pb, path, AVIO_FLAG_WRITE) < 0) {
    avcodec_free_context(&e->codec);
    avformat_free_context(e->fmt);
    delete e; return nullptr;
  }
  if (avformat_write_header(e->fmt, nullptr) < 0) {
    if (e->fmt->pb) avio_closep(&e->fmt->pb);
    avcodec_free_context(&e->codec);
    avformat_free_context(e->fmt);
    delete e; return nullptr;
  }
  e->header_written = true;
  e->pkt = av_packet_alloc();
  e->frame = av_frame_alloc();
  e->frame->format = AV_PIX_FMT_YUV420P;
  e->frame->width = W;
  e->frame->height = H;
  av_frame_get_buffer(e->frame, 32);
  return e;
}

// Encode n contiguous I420 frames (each W*H*3/2 bytes). Returns 0 on
// success, -1 on error.
int menc_write(void* h, const uint8_t* i420, int n) {
  Encoder* e = (Encoder*)h;
  const int W = e->width, H = e->height;
  const size_t fsz = (size_t)W * H * 3 / 2;
  for (int i = 0; i < n; ++i) {
    const uint8_t* src = i420 + fsz * i;
    if (av_frame_make_writable(e->frame) < 0) return -1;
    for (int r = 0; r < H; ++r)
      std::memcpy(e->frame->data[0] + (size_t)r * e->frame->linesize[0],
                  src + (size_t)r * W, W);
    const uint8_t* U = src + (size_t)W * H;
    const uint8_t* V = U + (size_t)W * H / 4;
    const int cw = W / 2, ch = H / 2;
    for (int r = 0; r < ch; ++r) {
      std::memcpy(e->frame->data[1] + (size_t)r * e->frame->linesize[1],
                  U + (size_t)r * cw, cw);
      std::memcpy(e->frame->data[2] + (size_t)r * e->frame->linesize[2],
                  V + (size_t)r * cw, cw);
    }
    e->frame->pts = e->next_pts++;
    if (avcodec_send_frame(e->codec, e->frame) < 0) return -1;
    if (enc_drain(e) < 0) return -1;
  }
  return 0;
}

// Flush the encoder, write the MP4 trailer, free everything. Returns 0 on
// success (file is complete), -1 if the flush/trailer failed.
int menc_close(void* h) {
  Encoder* e = (Encoder*)h;
  int rc = 0;
  if (e->codec) {
    avcodec_send_frame(e->codec, nullptr);  // enter flush mode
    while (true) {
      int r = avcodec_receive_packet(e->codec, e->pkt);
      if (r == AVERROR_EOF) break;
      if (r < 0) { rc = -1; break; }
      e->pkt->duration = 1;  // see enc_drain
      av_packet_rescale_ts(e->pkt, e->codec->time_base, e->stream->time_base);
      e->pkt->stream_index = e->stream->index;
      if (av_interleaved_write_frame(e->fmt, e->pkt) < 0) { rc = -1; break; }
    }
  }
  if (e->header_written && av_write_trailer(e->fmt) < 0) rc = -1;
  if (e->fmt && e->fmt->pb) avio_closep(&e->fmt->pb);
  if (e->frame) av_frame_free(&e->frame);
  if (e->pkt) av_packet_free(&e->pkt);
  if (e->codec) avcodec_free_context(&e->codec);
  if (e->fmt) avformat_free_context(e->fmt);
  delete e;
  return rc;
}

// Codec name of an opened decoder's video stream ("h264", "mpeg4", …) so
// artifact tests can assert the produced codec without ffprobe.
const char* mdec_codec_name(void* h) {
  Decoder* d = (Decoder*)h;
  return d->codec && d->codec->codec ? d->codec->codec->name : "";
}

}  // extern "C"
