// coviar_tpu — compressed-video loader for lsfa_tpu.
//
// Capability target: external/data_loader_py2/coviar_data_loader.c in the
// reference (API: load(path, gop, pos, representation, accumulate) /
// get_num_frames / get_num_gops), REDESIGNED:
//   * modern FFmpeg 5.x (avformat/avcodec send/receive API) instead of the
//     pinned 2016 ffmpeg fork; motion vectors come from the standard
//     AV_FRAME_DATA_MOTION_VECTORS export instead of a patched decoder;
//   * a stateful handle + coviar_decode_gop() that decodes a GOP ONCE and
//     emits every frame's (BGR, accumulated MV, residual) triple — the
//     reference re-parses the file from byte 0 for every single sample
//     (>= 4 full decodes per training example, SURVEY.md section 3.4);
//   * residual is computed as cur - key[p - acc_mv(p)] (same definition the
//     reference verifies in lib/utils/image.py:79-89), so integer
//     reconstruction is exact by construction;
//   * plain C ABI for ctypes binding (no pybind11 in the image).
//
// Also includes coviar_encode_test_video(): synthesizes an MPEG-4 clip with
// a fixed GOP so the Python test suite can round-trip decode without
// shipping binary fixtures.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/motion_vector.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <ctime>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>
#include <functional>

#define COVIAR_API extern "C" __attribute__((visibility("default")))

namespace {

struct Handle {
    AVFormatContext* fmt = nullptr;
    AVCodecContext* dec = nullptr;
    int stream_idx = -1;
    int width = 0, height = 0;
    int pix_fmt = -1;                  // decoder sw pixel format
    // frame index: packet positions of every frame + keyframe flags
    std::vector<int64_t> pts;          // presentation order assumed = decode order (no B)
    std::vector<uint8_t> is_key;
    std::vector<int> gop_start;        // frame index of each GOP's I-frame
    std::string path;
    std::string err;
    // per-stage cumulative seconds (coviar_prof_read):
    // 0=demux+avcodec 1=frame_to_bgr 2=mv fill/accumulate
    // 3=full-frame payload (sws+pad) 4=small payload 5=mv/res grids
    double prof[6] = {0, 0, 0, 0, 0, 0};
};

void set_err(Handle* h, const std::string& e) { if (h) h->err = e; }

inline double now_s() {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + ts.tv_nsec * 1e-9;
}
// Accumulates wall time into h->prof[stage] over its scope.
struct ProfScope {
    Handle* h; int stage; double t0;
    ProfScope(Handle* h_, int s) : h(h_), stage(s), t0(now_s()) {}
    ~ProfScope() { h->prof[stage] += now_s() - t0; }
};

int open_decoder(Handle* h, bool export_mvs) {
    if (avformat_open_input(&h->fmt, h->path.c_str(), nullptr, nullptr) < 0)
        return -1;
    if (avformat_find_stream_info(h->fmt, nullptr) < 0) return -2;
    h->stream_idx = av_find_best_stream(h->fmt, AVMEDIA_TYPE_VIDEO, -1, -1,
                                        nullptr, 0);
    if (h->stream_idx < 0) return -3;
    AVStream* st = h->fmt->streams[h->stream_idx];
    const AVCodec* codec = avcodec_find_decoder(st->codecpar->codec_id);
    if (!codec) return -4;
    h->dec = avcodec_alloc_context3(codec);
    avcodec_parameters_to_context(h->dec, st->codecpar);
    h->dec->thread_count = 0;                 // auto (frame/slice threading)
    if (export_mvs) {
        AVDictionary* opts = nullptr;
        av_dict_set(&opts, "flags2", "+export_mvs", 0);
        if (avcodec_open2(h->dec, codec, &opts) < 0) { av_dict_free(&opts); return -5; }
        av_dict_free(&opts);
    } else {
        if (avcodec_open2(h->dec, codec, nullptr) < 0) return -5;
    }
    h->width = h->dec->width;
    h->height = h->dec->height;
    h->pix_fmt = h->dec->pix_fmt;
    return 0;
}

void close_decoder(Handle* h) {
    if (h->dec) { avcodec_free_context(&h->dec); h->dec = nullptr; }
    if (h->fmt) { avformat_close_input(&h->fmt); h->fmt = nullptr; }
}

// Scan the whole stream once to build the frame/GOP index.
int build_index(Handle* h) {
    AVPacket* pkt = av_packet_alloc();
    AVFrame* frm = av_frame_alloc();
    int n = 0;
    bool has_b = false;
    auto drain = [&](void) {
        while (avcodec_receive_frame(h->dec, frm) == 0) {
            bool key = (frm->pict_type == AV_PICTURE_TYPE_I) || frm->key_frame;
            if (frm->pict_type == AV_PICTURE_TYPE_B) has_b = true;
            if (key) h->gop_start.push_back(n);
            h->is_key.push_back(key ? 1 : 0);
            h->pts.push_back(frm->pts);
            n++;
            av_frame_unref(frm);
        }
    };
    while (av_read_frame(h->fmt, pkt) >= 0) {
        if (pkt->stream_index == h->stream_idx) {
            int rc;
            do {  // EAGAIN => decoder wants draining before accepting more
                rc = avcodec_send_packet(h->dec, pkt);
                drain();
            } while (rc == AVERROR(EAGAIN));
        }
        av_packet_unref(pkt);
    }
    avcodec_send_packet(h->dec, nullptr);
    drain();
    av_packet_free(&pkt);
    av_frame_free(&frm);
    if (h->gop_start.empty()) return -1;
    // Frame indexing assumes presentation order == decode order. B-frames
    // (or non-monotone pts) break that assumption and would silently
    // mis-index frames against the annotations — refuse loudly instead.
    // The reference's MPEG-4 snippets are always IPPP... (coviar's decoder
    // makes the same assumption, coviar_data_loader.c decode loop).
    if (has_b) { set_err(h, "B-frames present: stream is not IPPP-ordered"); return -2; }
    for (size_t i = 1; i < h->pts.size(); i++) {
        if (h->pts[i] != AV_NOPTS_VALUE && h->pts[i - 1] != AV_NOPTS_VALUE
            && h->pts[i] < h->pts[i - 1]) {
            set_err(h, "non-monotone pts: decode order != presentation order");
            return -2;
        }
    }
    if (h->width == 0) { h->width = h->dec->width; h->height = h->dec->height; }
    return 0;
}

void frame_to_bgr(const AVFrame* frm, uint8_t* out, int w, int hgt) {
    SwsContext* sws = sws_getContext(frm->width, frm->height,
                                     (AVPixelFormat)frm->format, w, hgt,
                                     AV_PIX_FMT_BGR24, SWS_BILINEAR,
                                     nullptr, nullptr, nullptr);
    uint8_t* dst[1] = {out};
    int dst_stride[1] = {3 * w};
    sws_scale(sws, frm->data, frm->linesize, 0, frm->height, dst, dst_stride);
    sws_freeContext(sws);
}

inline int16_t sat16(int v) {
    return (int16_t)std::min(32767, std::max(-32768, v));
}

inline int clampi(int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

// Chain this frame's block MVs (dst - src per-pixel map) onto the
// accumulated int16 field straight from the decoder's side data.
// Result is identical to a full-frame copy + per-pixel block fills:
// pixels no block covers keep prev_acc (the run copies), covered pixels
// read only prev_acc (separate buffer, no aliasing), and side-data
// overlap resolves last-writer-wins exactly like sequential fills.
// Memory traffic is proportional to the UNCOVERED area only: 8x8 cells a
// single block fully covers skip the copy (exact for any block geometry
// — partially covered cells are copied first, then overwritten), and
// in-bounds block rows read prev_acc contiguously. int16 halves the bytes
// moved and holds any chain a sane stream produces (12-frame GOPs with
// fcode-7 MVs peak ~24K); the adds SATURATE so an adversarial stream
// (arbitrary GOP length via the --clip bench or user eval data) degrades
// to a clamped displacement instead of wrapping into garbage — past
// +-32767 px the warp source is off-frame either way.
void accumulate_mv_from_frame(const AVFrame* frm, const int16_t* prev_acc,
                              int16_t* acc, int w, int hgt,
                              std::vector<uint8_t>& cov) {
    const AVFrameSideData* sd =
        av_frame_get_side_data(frm, AV_FRAME_DATA_MOTION_VECTORS);
    const AVMotionVector* mvs =
        sd ? (const AVMotionVector*)sd->data : nullptr;
    const int n = sd ? (int)(sd->size / sizeof(AVMotionVector)) : 0;
    const int cw = (w + 7) / 8, ch = (hgt + 7) / 8;
    cov.assign((size_t)cw * ch, 0);
    for (int i = 0; i < n; i++) {          // cells fully inside one block
        const AVMotionVector& m = mvs[i];
        int bx0 = m.dst_x - m.w / 2, by0 = m.dst_y - m.h / 2;
        int x0 = std::max(0, bx0), x1 = std::min(w, bx0 + (int)m.w);
        int y0 = std::max(0, by0), y1 = std::min(hgt, by0 + (int)m.h);
        int cx0 = (x0 + 7) / 8, cx1 = x1 / 8;
        int cy0 = (y0 + 7) / 8, cy1 = y1 / 8;
        if (cx1 > cx0)
            for (int cy = cy0; cy < cy1; cy++)
                std::memset(&cov[(size_t)cy * cw + cx0], 1, cx1 - cx0);
    }
    for (int cy = 0; cy < ch; cy++) {      // copy prev over uncovered runs
        const uint8_t* crow = &cov[(size_t)cy * cw];
        int py0 = cy * 8, py1 = std::min(hgt, py0 + 8);
        for (int cx = 0; cx < cw;) {
            if (crow[cx]) { cx++; continue; }
            int ce = cx;
            while (ce < cw && !crow[ce]) ce++;
            int px0 = cx * 8, px1 = std::min(w, ce * 8);
            for (int y = py0; y < py1; y++)
                std::memcpy(acc + ((size_t)y * w + px0) * 2,
                            prev_acc + ((size_t)y * w + px0) * 2,
                            sizeof(int16_t) * 2 * (size_t)(px1 - px0));
            cx = ce;
        }
    }
    for (int i = 0; i < n; i++) {          // rasterize (last-writer-wins)
        const AVMotionVector& m = mvs[i];
        int dx = (int)lrint((double)(m.dst_x - m.src_x));
        int dy = (int)lrint((double)(m.dst_y - m.src_y));
        int bx0 = m.dst_x - m.w / 2, by0 = m.dst_y - m.h / 2;
        int x0 = std::max(0, bx0), x1 = std::min(w, bx0 + (int)m.w);
        int y0 = std::max(0, by0), y1 = std::min(hgt, by0 + (int)m.h);
        bool xin = (x0 - dx >= 0) && (x1 - dx <= w);
        for (int y = y0; y < y1; y++) {
            int sy = clampi(y - dy, 0, hgt - 1);
            int16_t* o = acc + ((size_t)y * w + x0) * 2;
            if (xin) {                     // contiguous source row segment
                const int16_t* p =
                    prev_acc + ((size_t)sy * w + (x0 - dx)) * 2;
                for (int x = x0; x < x1; x++, o += 2, p += 2) {
                    o[0] = sat16(dx + p[0]);
                    o[1] = sat16(dy + p[1]);
                }
            } else {
                for (int x = x0; x < x1; x++, o += 2) {
                    int sx = clampi(x - dx, 0, w - 1);
                    const int16_t* p =
                        prev_acc + ((size_t)sy * w + sx) * 2;
                    o[0] = sat16(dx + p[0]);
                    o[1] = sat16(dy + p[1]);
                }
            }
        }
    }
}

// res(p) = cur(p) - key(p - acc(p)) per BGR channel (int32, can be negative)
void compute_residual(const uint8_t* cur, const uint8_t* key,
                      const int16_t* acc, int32_t* res, int w, int hgt) {
    for (int y = 0; y < hgt; y++)
        for (int x = 0; x < w; x++) {
            int i = (y * w + x);
            int dx = acc[i * 2], dy = acc[i * 2 + 1];
            int sx = clampi(x - dx, 0, w - 1);
            int sy = clampi(y - dy, 0, hgt - 1);
            int j = (sy * w + sx);
            for (int c = 0; c < 3; c++)
                res[i * 3 + c] = (int32_t)cur[i * 3 + c] - (int32_t)key[j * 3 + c];
        }
}

// ---- device-payload preparation (the TPU data plane) ----------------------
// The Python preprocessing chain (resize -> pad-to-bucket -> small-image
// box-mean -> transform_mv_res) costs ~150 ms/frame in numpy/PIL on this
// host's single core; the same math here runs in ~5 ms. Semantics follow
// the REFERENCE's cv2.INTER_LINEAR convention (lib/utils/image.py:202-263:
// half-pixel centers, edge clamp, no antialiasing), which the PIL-based
// Python fallback only approximates.

// resize rule (lib/utils/image.py:266-294)
double resize_scale(int h, int w, int target, int max_size) {
    int smin = std::min(h, w), smax = std::max(h, w);
    double s = (double)target / smin;
    if (lrint(s * smax) > max_size) s = (double)max_size / smax;
    return s;
}

// cv2-style bilinear sample of an HxWxC field at (y, x) in pixel
// coordinates (already includes the half-pixel shift), edge-clamped.
// `get(y, x, out)` yields the C source values at an integer pixel — the
// field is never materialized: MV/residual grids read only ~40K of the
// ~550K source pixels, so lazy evaluation skips >90% of the int->float
// conversion (and the whole full-res residual pass) with BIT-IDENTICAL
// arithmetic (the getter returns exactly the float the staging buffer
// used to hold).
template <class Get>
inline void bilinear_at(const Get& get, int h, int w, int c,
                        double y, double x, float* out) {
    if (y < 0) y = 0;
    if (x < 0) x = 0;
    int y0 = (int)y, x0 = (int)x;
    if (y0 > h - 1) y0 = h - 1;
    if (x0 > w - 1) x0 = w - 1;
    int y1 = std::min(y0 + 1, h - 1), x1 = std::min(x0 + 1, w - 1);
    double fy = y - y0, fx = x - x0;
    if (fy < 0) fy = 0; if (fy > 1) fy = 1;
    if (fx < 0) fx = 0; if (fx > 1) fx = 1;
    float p00[4], p01[4], p10[4], p11[4];
    get(y0, x0, p00);
    get(y0, x1, p01);
    get(y1, x0, p10);
    get(y1, x1, p11);
    for (int k = 0; k < c; k++)
        out[k] = (float)((1 - fy) * ((1 - fx) * p00[k] + fx * p01[k]) +
                         fy * ((1 - fx) * p10[k] + fx * p11[k]));
}

// transform_mv_res (image.py:202-263) with the two cv2.resize stages fused:
// stage A resizes the full-res field by im_scale (+ zero pad to the stride
// grid), stage B resizes the padded field by 1/stride. Every stage-B tap
// needs at most 4 stage-A values, each computed on the fly from the source
// field — no intermediate is materialized.
// Residual grid for a ZERO raw residual: the channel transform runs after
// padding, so valid cells carry (0-mean)*scale constants (what the
// reference chain yields at I-frames), bucket padding stays zero.
void fill_const_res_grid(float* dst, int gh, int gw, int fh, int fw,
                         const float* means_bgr, float pixel_scale,
                         int legacy_swap) {
    std::memset(dst, 0, sizeof(float) * (size_t)fh * fw * 3);
    const float mB = means_bgr[0], mG = means_bgr[1], mR = means_bgr[2];
    const float o0 = (0.0f - mR) * pixel_scale;
    const float o1 = (0.0f - mG) * pixel_scale;
    const float o2 = legacy_swap ? (o0 - mB) * pixel_scale
                                 : (0.0f - mB) * pixel_scale;
    for (int fy = 0; fy < gh; fy++)
        for (int fx = 0; fx < gw; fx++) {
            float* o = dst + ((size_t)fy * fw + fx) * 3;
            o[0] = o0; o[1] = o1; o[2] = o2;
        }
}

// out is an (fh, fw, c) BUCKET grid; only the (gh, gw) cells covering the
// scaled image carry values (gh = ceil(sh/stride) etc.), the rest is the
// bucket zero-padding (pad_to_bucket in the Python pipeline).
// src is a lazy getter (see bilinear_at).
template <class Get>
void mv_res_to_grid(const Get& src, int h, int w, int c,
                    int sh, int sw,
                    int gh, int gw, int fh, int fw, int stride, float* out) {
    std::memset(out, 0, sizeof(float) * (size_t)fh * fw * c);
    for (int fy = 0; fy < gh; fy++) {
        for (int fx = 0; fx < gw; fx++) {
            // stage-B sample point in padded-scaled coordinates (always
            // interior: (fy+0.5)*stride-0.5 ∈ [7.5, gh*stride-8.5])
            double py = (fy + 0.5) * stride - 0.5;
            double px = (fx + 0.5) * stride - 0.5;
            int py0 = (int)std::floor(py), px0 = (int)std::floor(px);
            double fyw = py - py0, fxw = px - px0;
            float acc[4] = {0, 0, 0, 0};
            for (int dy = 0; dy < 2; dy++) {
                int yy = py0 + dy;
                double wy = dy ? fyw : 1 - fyw;
                if (wy == 0) continue;
                for (int dx = 0; dx < 2; dx++) {
                    int xx = px0 + dx;
                    double wx = dx ? fxw : 1 - fxw;
                    if (wx == 0) continue;
                    float val[4] = {0, 0, 0, 0};
                    // padded field: zero outside the scaled image extent
                    if (yy >= 0 && yy < sh && xx >= 0 && xx < sw) {
                        // cv2 maps via the actual size ratio src/dst (not
                        // 1/fx): dst size was rounded from src*fx
                        double syf = (yy + 0.5) * ((double)h / sh) - 0.5;
                        double sxf = (xx + 0.5) * ((double)w / sw) - 0.5;
                        bilinear_at(src, h, w, c, syf, sxf, val);
                    }
                    for (int k = 0; k < c; k++)
                        acc[k] += (float)(wy * wx) * val[k];
                }
            }
            float* o = out + ((size_t)fy * fw + fx) * c;
            for (int k = 0; k < c; k++) o[k] = acc[k];
        }
    }
}

}  // namespace

COVIAR_API void* coviar_open(const char* path) {
    Handle* h = new Handle();
    h->path = path;
    if (open_decoder(h, /*export_mvs=*/false) != 0) { delete h; return nullptr; }
    if (build_index(h) != 0) { close_decoder(h); delete h; return nullptr; }
    close_decoder(h);
    return h;
}

COVIAR_API void coviar_close(void* hp) {
    Handle* h = (Handle*)hp;
    if (!h) return;
    close_decoder(h);
    delete h;
}

// Last error message recorded on this handle by set_err() — lets Python
// raise the real diagnostic (e.g. "bucket too small") instead of only the
// negative frame count a failed decode returns. Valid until the next
// decode call on the same handle.
COVIAR_API const char* coviar_last_error(void* hp) {
    Handle* h = (Handle*)hp;
    return h ? h->err.c_str() : "";
}

COVIAR_API int coviar_num_frames(void* hp) {
    return (int)((Handle*)hp)->is_key.size();
}

COVIAR_API int coviar_num_gops(void* hp) {
    return (int)((Handle*)hp)->gop_start.size();
}

COVIAR_API int coviar_width(void* hp) { return ((Handle*)hp)->width; }
COVIAR_API int coviar_height(void* hp) { return ((Handle*)hp)->height; }

// Cumulative per-stage decode seconds since open/reset (see Handle::prof).
COVIAR_API void coviar_prof_read(void* hp, double* out, int reset) {
    Handle* h = (Handle*)hp;
    for (int i = 0; i < 6; i++) out[i] = h->prof[i];
    if (reset) std::memset(h->prof, 0, sizeof(h->prof));
}

COVIAR_API int coviar_gop_frames(void* hp, int gop_idx) {
    Handle* h = (Handle*)hp;
    if (gop_idx < 0 || gop_idx >= (int)h->gop_start.size()) return -1;
    int start = h->gop_start[gop_idx];
    int end = (gop_idx + 1 < (int)h->gop_start.size())
                  ? h->gop_start[gop_idx + 1]
                  : (int)h->is_key.size();
    return end - start;
}

// Decode one GOP; fills caller buffers (n = coviar_gop_frames entries):
//   bgr: n*H*W*3 uint8; mv: n*H*W*2 int32 (accumulated to the GOP key);
//   res: n*H*W*3 int32 (vs MV-warped key). Any of the three may be NULL.
// Returns #frames written, or <0 on error.
namespace {

// Shared GOP decode loop. The sink receives, per in-range frame:
//   (rel, cur_bgr, key_bgr, acc, frm) — full-res BGR, the GOP key's BGR,
// the accumulated MV field (zeros on the key frame), and the raw decoded
// AVFrame (native pixel format, for direct-YUV consumers).
int decode_gop_core(Handle* h, int gop_idx, int max_frames, bool need_mv,
                    const std::function<void(int, const uint8_t*,
                                             const uint8_t*,
                                             const int16_t*,
                                             const AVFrame*)>& sink,
                    bool key_bgr_only = false) {
    int n_gop = coviar_gop_frames(h, gop_idx);
    if (n_gop < 0) return -1;
    int start = h->gop_start[gop_idx];
    int want = std::min(n_gop, max_frames);

    if (open_decoder(h, need_mv) != 0) return -2;
    const int w = h->width, hgt = h->height;
    const size_t npx = (size_t)w * hgt;

    // seek straight to the GOP's keyframe (a sync sample) — the reference
    // loader decoded the whole file prefix for every request
    bool seeked = false;
    if (start > 0 && !h->pts.empty() && h->pts[start] != AV_NOPTS_VALUE) {
        if (av_seek_frame(h->fmt, h->stream_idx, h->pts[start],
                          AVSEEK_FLAG_BACKWARD) >= 0) {
            avcodec_flush_buffers(h->dec);
            seeked = true;
        }
    }

    std::vector<uint8_t> key_bgr(npx * 3);
    std::vector<uint8_t> cur_bgr(npx * 3);
    std::vector<int16_t> acc(npx * 2), prev_acc(npx * 2, 0);
    std::vector<uint8_t> cov;

    AVPacket* pkt = av_packet_alloc();
    AVFrame* frm = av_frame_alloc();
    int fidx = 0;       // global frame counter
    int written = 0;
    int rc = 0;

    auto pts_to_idx = [&](int64_t pts) -> int {
        auto it = std::lower_bound(h->pts.begin(), h->pts.end(), pts);
        if (it != h->pts.end() && *it == pts)
            return (int)(it - h->pts.begin());
        return -1;
    };

    auto handle_frame = [&](AVFrame* f) {
        int gidx = fidx;
        if (f->pts != AV_NOPTS_VALUE) {
            int i = pts_to_idx(f->pts);
            if (i >= 0) gidx = i;
        }
        fidx = gidx + 1;
        int rel = gidx - start;
        if (rel < 0 || rel >= want) return;
        // key_bgr_only: non-key frames skip the full-res BGR conversion
        // (the sink consumes them straight from the decoder's YUV planes);
        // cur_bgr then still holds the key's pixels — such sinks must not
        // read `cur` for rel > 0.
        if (!key_bgr_only || rel == 0) {
            ProfScope ps(h, 1);
            frame_to_bgr(f, cur_bgr.data(), w, hgt);
        }
        if (rel == 0) {
            std::memcpy(key_bgr.data(), cur_bgr.data(), npx * 3);
            std::fill(prev_acc.begin(), prev_acc.end(), 0);
            std::fill(acc.begin(), acc.end(), 0);
        } else if (need_mv) {
            ProfScope ps(h, 2);
            accumulate_mv_from_frame(f, prev_acc.data(), acc.data(), w,
                                     hgt, cov);
        }
        sink(rel, cur_bgr.data(), key_bgr.data(), acc.data(), f);
        if (rel > 0 && need_mv)
            std::swap(prev_acc, acc);  // accumulate_mv overwrites every cell
        written++;
    };

    auto drain2 = [&](void) {
        while (avcodec_receive_frame(h->dec, frm) == 0) {
            handle_frame(frm);
            av_frame_unref(frm);
        }
    };
    double p_start[6];
    std::memcpy(p_start, h->prof, sizeof(p_start));
    const double t_loop0 = now_s();
    while (av_read_frame(h->fmt, pkt) >= 0 && written < want) {
        if (pkt->stream_index == h->stream_idx) {
            int src;
            do {
                src = avcodec_send_packet(h->dec, pkt);
                drain2();
            } while (src == AVERROR(EAGAIN));
        }
        av_packet_unref(pkt);
    }
    if (written < want) {  // flush the decoder
        avcodec_send_packet(h->dec, nullptr);
        drain2();
    }
    // stage 0 = demux + avcodec (loop wall minus the attributed stages)
    double others = 0;
    for (int s2 = 1; s2 < 6; s2++) others += h->prof[s2] - p_start[s2];
    h->prof[0] += (now_s() - t_loop0) - others;
    av_packet_free(&pkt);
    av_frame_free(&frm);
    close_decoder(h);
    return rc == 0 ? written : rc;
}

}  // namespace

COVIAR_API int coviar_decode_gop(void* hp, int gop_idx, uint8_t* bgr,
                                 int32_t* mv, int32_t* res, int max_frames) {
    Handle* h = (Handle*)hp;
    set_err(h, "");   // fresh call: don't let a stale message mislead
    const int w = h->width, hgt = h->height;
    const size_t npx = (size_t)w * hgt;
    bool need_mv = (mv != nullptr) || (res != nullptr);
    return decode_gop_core(
        h, gop_idx, max_frames, need_mv,
        [&](int rel, const uint8_t* cur, const uint8_t* key,
            const int16_t* acc, const AVFrame*) {
            if (bgr)
                std::memcpy(bgr + (size_t)rel * npx * 3, cur, npx * 3);
            if (mv) {
                int32_t* o = mv + (size_t)rel * npx * 2;
                for (size_t i = 0; i < npx * 2; i++) o[i] = acc[i];
            }
            if (res) {
                int32_t* r = res + (size_t)rel * npx * 3;
                if (rel == 0)
                    std::memset(r, 0, npx * 3 * sizeof(int32_t));
                else
                    compute_residual(cur, key, acc, r, w, hgt);
            }
        });
}

// Decode one GOP straight to DEVICE-READY payloads (the TPU data plane):
//   frames:  n*(bh*bw*3)  uint8  — resized (600/1000 rule) + zero-padded
//                                  raw BGR at the bucket shape
//   smalls:  n*(bh/sf*bw/sf*3) uint8 — sf x sf box-mean of the padded frame
//   mv_out:  n*(fh*fw*2) float  — transform_mv_res MV grid (NEGATED, i.e.
//                                  warp-ready) where fh=bh/stride
//   res_out: n*(fh*fw*3) float  — transform_mv_res residual grid (RGB,
//                                  mean-subtracted, x pixel_scale)
//   im_info: 3 floats [scaled_h, scaled_w, im_scale]
// legacy_swap replicates the reference's in-place channel-transform bug
// (lib/utils/image.py:217-218: output channel 2 reads the already-
// transformed channel 0) — required for exact parity with weights trained
// by the reference. Returns #frames, or <0.
// frames_mode: 0 = every frame resized into `frames`; 1 = KEY frame only
// (rel>0 slots untouched) with non-key smalls produced by a direct
// SWS_AREA resize to the small grid — skips 11/12 of the full-frame
// resizes. Only the key frame ever ships full-res to the device
// (forward_cur consumes small+MV+residual only), so mode 1 is the
// production eval path; mode 0 keeps exact box-mean smalls for tests.
// payload_fmt: 0 = packed BGR24 (frames n*(bh*bw*3), smalls
// n*(sbh*sbw*3)); 1 = planar I420 — frames n*(bh*3/2*bw), smalls
// n*(sbh*3/2*sbw), each buffer the standard Y + U + V plane layout.
// I420 halves the bytes shipped over the host->device link (the tunnel
// serialization is host CPU time and byte-proportional); the device
// converts YUV->normalized RGB inside the jitted program (BT.601 limited
// range, matching swscale's MPEG-4 default). Padding is written as
// Y=16, U=V=128 so the device conversion yields EXACT zeros in the pad
// region (same as the BGR path's zero padding). fmt 1 requires
// frames_mode=1 and even plane dims; smalls are produced for every slot
// (incl. the key) via the direct SWS_AREA path.
static int decode_gop_prepared_impl(
    Handle* h, int gop_idx, int target_size, int max_size, int bh, int bw,
    int stride, int small_factor, const float* pixel_means_bgr,
    float pixel_scale, int legacy_swap, int frames_mode, int payload_fmt,
    uint8_t* frames, uint8_t* smalls, float* mv_out, float* res_out,
    float* im_info, int max_frames) {
    set_err(h, "");   // fresh call: don't let a stale message mislead
    // payload_fmt bit 4: produce smalls straight from the decoder's
    // native YUV planes (one SWS_AREA plane scale) instead of the
    // YUV->BGR->YUV round trip through the full-res conversion.
    // bit 5: residual-grid taps read the decoder's YUV planes directly
    // (per-pixel BT.601 conversion at the ~40K tap pixels) so NON-KEY
    // frames skip the full-res YUV->BGR pass entirely. Both are i420-only.
    const int small_direct = (payload_fmt >> 4) & 1;
    const int res_direct = (payload_fmt >> 5) & 1;
    payload_fmt &= 0xF;
    if ((small_direct || res_direct) && payload_fmt != 1) {
        set_err(h, "direct-YUV smalls/res require the i420 payload");
        return -9;
    }
    // direct tap conversion knows BT.601 limited (yuv420p) and full
    // (yuvj420p) range; anything else keeps the exact sws chain
    const bool yuv_taps_ok =
        res_direct && (h->pix_fmt == AV_PIX_FMT_YUV420P ||
                       h->pix_fmt == AV_PIX_FMT_YUVJ420P);
    // non-key frames need the full-res BGR only for residual taps and
    // (non-direct) smalls — with both direct, skip the conversion
    const bool key_bgr_only =
        yuv_taps_ok && small_direct && frames_mode == 1;
    const int w = h->width, hgt = h->height;
    double s = resize_scale(hgt, w, target_size, max_size);
    const int sh = (int)lrint(hgt * s), sw = (int)lrint(w * s);
    if (sh > bh || sw > bw) { set_err(h, "bucket too small"); return -3; }
    const int fh = bh / stride, fw = bw / stride;
    const int gh = (sh + stride - 1) / stride, gw = (sw + stride - 1) / stride;
    if (small_factor <= 0 || bh % small_factor || bw % small_factor) {
        set_err(h, "bucket not divisible by small_factor");
        return -6;   // the small-grid buffer layout assumes divisibility
    }
    const int sbh = bh / small_factor, sbw = bw / small_factor;
    if (payload_fmt == 1) {
        if (frames_mode != 1) {
            set_err(h, "i420 payload requires frames_mode=1");
            return -7;
        }
        if (bh % 2 || bw % 2 || sbh % 2 || sbw % 2) {
            set_err(h, "i420 payload requires even plane dims");
            return -8;
        }
    }
    if (im_info) { im_info[0] = (float)sh; im_info[1] = (float)sw;
                   im_info[2] = (float)s; }

    // swscale may write even-aligned luma/chroma widths (one column past
    // odd content sizes); restore the pad bytes beyond the content box so
    // the device conversion yields exact zeros everywhere outside (ch,cw)
    auto repad_i420 = [](uint8_t* Y, int pbh, int pbw, int ch, int cw) {
        for (int y2 = 0; y2 < ch && cw < pbw; y2++)
            std::memset(Y + (size_t)y2 * pbw + cw, 16, pbw - cw);
        for (int y2 = ch; y2 < pbh; y2++)
            std::memset(Y + (size_t)y2 * pbw, 16, pbw);
        uint8_t* U = Y + (size_t)pbh * pbw;
        uint8_t* V = U + (size_t)(pbh / 2) * (pbw / 2);
        const int cbh = pbh / 2, cbw = pbw / 2;
        const int cch = (ch + 1) / 2, ccw = (cw + 1) / 2;
        for (uint8_t* P : {U, V}) {
            for (int y2 = 0; y2 < cch && ccw < cbw; y2++)
                std::memset(P + (size_t)y2 * cbw + ccw, 128, cbw - ccw);
            for (int y2 = cch; y2 < cbh; y2++)
                std::memset(P + (size_t)y2 * cbw, 128, cbw);
        }
    };

    SwsContext* sws = nullptr;                   // reused across frames
    SwsContext* sws_small = nullptr;
    auto sink = [&](int rel, const uint8_t* cur, const uint8_t* key,
                    const int16_t* acc, const AVFrame* frm) {
        // --- frame: resize + pad in ONE sws pass (dst stride = bucket) ---
        bool want_full = frames && (frames_mode == 0 || rel == 0);
        if (payload_fmt == 1) {
            // planar I420 payloads: resize + BGR->YUV convert in one
            // sws pass, writing straight into the padded plane buffers.
            if (want_full) {
                ProfScope ps(h, 3);
                uint8_t* Y = frames + (size_t)rel * (bh * 3 / 2) * bw;
                uint8_t* U = Y + (size_t)bh * bw;
                uint8_t* V = U + (size_t)(bh / 2) * (bw / 2);
                std::memset(Y, 16, (size_t)bh * bw);
                std::memset(U, 128, (size_t)(bh / 2) * (bw / 2));
                std::memset(V, 128, (size_t)(bh / 2) * (bw / 2));
                if (!sws)
                    sws = sws_getContext(w, hgt, AV_PIX_FMT_BGR24, sw, sh,
                                         AV_PIX_FMT_YUV420P, SWS_BILINEAR,
                                         nullptr, nullptr, nullptr);
                const uint8_t* src[1] = {cur};
                int src_stride[1] = {3 * w};
                uint8_t* dst[3] = {Y, U, V};
                int dst_stride[3] = {bw, bw / 2, bw / 2};
                sws_scale(sws, src, src_stride, 0, hgt, dst, dst_stride);
                repad_i420(Y, bh, bw, sh, sw);
            }
            if (smalls) {
                ProfScope ps(h, 4);
                uint8_t* Y = smalls + (size_t)rel * (sbh * 3 / 2) * sbw;
                uint8_t* U = Y + (size_t)sbh * sbw;
                uint8_t* V = U + (size_t)(sbh / 2) * (sbw / 2);
                std::memset(Y, 16, (size_t)sbh * sbw);
                std::memset(U, 128, (size_t)(sbh / 2) * (sbw / 2));
                std::memset(V, 128, (size_t)(sbh / 2) * (sbw / 2));
                const int ssh = (sh + small_factor - 1) / small_factor;
                const int ssw = (sw + small_factor - 1) / small_factor;
                uint8_t* dst[3] = {Y, U, V};
                int dst_stride[3] = {sbw, sbw / 2, sbw / 2};
                if (small_direct) {
                    // pure plane scale (no colorspace conversion): the
                    // decoder output and the wire format are both YUV420
                    if (!sws_small)
                        sws_small = sws_getContext(
                            frm->width, frm->height,
                            (AVPixelFormat)frm->format, ssw, ssh,
                            AV_PIX_FMT_YUV420P, SWS_AREA, nullptr,
                            nullptr, nullptr);
                    sws_scale(sws_small, frm->data, frm->linesize, 0,
                              frm->height, dst, dst_stride);
                } else {
                    if (!sws_small)
                        sws_small = sws_getContext(
                            w, hgt, AV_PIX_FMT_BGR24, ssw, ssh,
                            AV_PIX_FMT_YUV420P, SWS_AREA, nullptr,
                            nullptr, nullptr);
                    const uint8_t* src[1] = {cur};
                    int src_stride[1] = {3 * w};
                    sws_scale(sws_small, src, src_stride, 0, hgt, dst,
                              dst_stride);
                }
                repad_i420(Y, sbh, sbw, ssh, ssw);
            }
        } else if (want_full) {
            ProfScope ps(h, 3);
            uint8_t* dst_frame = frames + (size_t)rel * bh * bw * 3;
            std::memset(dst_frame, 0, (size_t)bh * bw * 3);
            if (!sws)
                sws = sws_getContext(w, hgt, AV_PIX_FMT_BGR24, sw, sh,
                                     AV_PIX_FMT_BGR24, SWS_BILINEAR,
                                     nullptr, nullptr, nullptr);
            const uint8_t* src[1] = {cur};
            int src_stride[1] = {3 * w};
            uint8_t* dst[1] = {dst_frame};
            int dst_stride[1] = {3 * bw};
            sws_scale(sws, src, src_stride, 0, hgt, dst, dst_stride);
            // --- small image: sf x sf box mean of the PADDED frame ---
            if (smalls) {
                uint8_t* sm = smalls + (size_t)rel * sbh * sbw * 3;
                const int sf = small_factor;
                const float inv = 1.0f / (sf * sf);
                for (int y = 0; y < sbh; y++)
                    for (int x = 0; x < sbw; x++) {
                        int sums[3] = {0, 0, 0};
                        for (int dy = 0; dy < sf; dy++) {
                            const uint8_t* row =
                                dst_frame + ((size_t)(y * sf + dy) * bw
                                             + (size_t)x * sf) * 3;
                            for (int dx = 0; dx < sf; dx++)
                                for (int c = 0; c < 3; c++)
                                    sums[c] += row[dx * 3 + c];
                        }
                        for (int c = 0; c < 3; c++)
                            sm[((size_t)y * sbw + x) * 3 + c] =
                                (uint8_t)lrintf(sums[c] * inv);
                    }
            }
        } else if (smalls && frames_mode == 1) {
            // direct small: SWS_AREA resize straight to the small grid
            // (approximates box-mean of the bilinear-resized frame; only
            // non-key frames take this path and only their small is used)
            ProfScope ps(h, 4);
            uint8_t* sm = smalls + (size_t)rel * sbh * sbw * 3;
            std::memset(sm, 0, (size_t)sbh * sbw * 3);
            const int ssh = (sh + small_factor - 1) / small_factor;
            const int ssw = (sw + small_factor - 1) / small_factor;
            if (!sws_small)
                sws_small = sws_getContext(w, hgt, AV_PIX_FMT_BGR24,
                                           ssw, ssh, AV_PIX_FMT_BGR24,
                                           SWS_AREA, nullptr, nullptr,
                                           nullptr);
            const uint8_t* src[1] = {cur};
            int src_stride[1] = {3 * w};
            uint8_t* dst[1] = {sm};
            int dst_stride[1] = {3 * sbw};
            sws_scale(sws_small, src, src_stride, 0, hgt, dst, dst_stride);
        }
        // --- MV grid (negated: the Python loader negates, image.py:54) ---
        ProfScope ps_grids(h, 5);
        if (mv_out) {
            float* dst = mv_out + (size_t)rel * fh * fw * 2;
            if (rel == 0) {
                std::memset(dst, 0, sizeof(float) * fh * fw * 2);
            } else {
                auto mv_get = [&](int y, int x, float* o) {
                    const int16_t* p = acc + ((size_t)y * w + x) * 2;
                    o[0] = (float)(-p[0]);
                    o[1] = (float)(-p[1]);
                };
                mv_res_to_grid(mv_get, hgt, w, 2, sh, sw,
                               gh, gw, fh, fw, stride, dst);
                const float mscale = (float)(s / stride);
                for (int i = 0; i < fh * fw * 2; i++) dst[i] *= mscale;
            }
        }
        // --- residual grid ---
        // The reference transforms the PADDED stage-A field per channel
        // (out_i = (in_{2-i} - mean_{2-i}) * scale, image.py:217-218) and
        // THEN stage-B-resizes. The transform is per-pixel affine and every
        // stage-B tap is interior (weights sum to 1), so it commutes
        // exactly with the resample: we resample the raw BGR residual and
        // apply the channel transform per grid cell.
        if (res_out) {
            float* dst = res_out + (size_t)rel * fh * fw * 3;
            if (rel == 0) {
                fill_const_res_grid(dst, gh, gw, fh, fw, pixel_means_bgr,
                                    pixel_scale, legacy_swap);
            } else {
                // lazy residual: res(p) = cur(p) - key(p - acc(p)) computed
                // only at the ~40K source pixels the grid taps actually
                // read (compute_residual semantics, bit-identical floats).
                // With res_direct, cur(p) converts per-tap from the
                // decoder's YUV planes (BT.601; nearest chroma) so the
                // full-res BGR pass never runs on non-key frames —
                // bounded drift vs the sws chain, key side unchanged.
                const uint8_t* Yp = frm->data[0];
                const uint8_t* Up = frm->data[1];
                const uint8_t* Vp = frm->data[2];
                const int ly = frm->linesize[0], lu = frm->linesize[1],
                          lv = frm->linesize[2];
                const bool full_range =
                    (frm->format == AV_PIX_FMT_YUVJ420P);
                auto cur_bgr_at = [&](int y, int x, int32_t* bgr) {
                    int Yv = Yp[(size_t)y * ly + x];
                    int D = Up[(size_t)(y >> 1) * lu + (x >> 1)] - 128;
                    int E = Vp[(size_t)(y >> 1) * lv + (x >> 1)] - 128;
                    int C = full_range ? 256 * Yv : 298 * (Yv - 16);
                    int R, G, B;
                    if (full_range) {
                        R = (C + 359 * E + 128) >> 8;
                        G = (C - 88 * D - 183 * E + 128) >> 8;
                        B = (C + 454 * D + 128) >> 8;
                    } else {
                        R = (C + 409 * E + 128) >> 8;
                        G = (C - 100 * D - 208 * E + 128) >> 8;
                        B = (C + 516 * D + 128) >> 8;
                    }
                    bgr[0] = clampi(B, 0, 255);
                    bgr[1] = clampi(G, 0, 255);
                    bgr[2] = clampi(R, 0, 255);
                };
                auto res_get = [&](int y, int x, float* o) {
                    int i = y * w + x;
                    int sx = clampi(x - acc[i * 2], 0, w - 1);
                    int sy = clampi(y - acc[i * 2 + 1], 0, hgt - 1);
                    const uint8_t* kp = key + ((size_t)sy * w + sx) * 3;
                    int32_t c[3];
                    if (yuv_taps_ok) {
                        cur_bgr_at(y, x, c);
                    } else {
                        const uint8_t* cp = cur + (size_t)i * 3;
                        c[0] = cp[0]; c[1] = cp[1]; c[2] = cp[2];
                    }
                    o[0] = (float)(c[0] - (int32_t)kp[0]);
                    o[1] = (float)(c[1] - (int32_t)kp[1]);
                    o[2] = (float)(c[2] - (int32_t)kp[2]);
                };
                std::vector<float> grid((size_t)fh * fw * 3);
                mv_res_to_grid(res_get, hgt, w, 3, sh, sw,
                               gh, gw, fh, fw, stride, grid.data());
                std::memset(dst, 0, sizeof(float) * (size_t)fh * fw * 3);
                // out_i = (in_{2-i} - mean_{2-i}) * scale, means BGR-ordered
                const float mB = pixel_means_bgr[0], mG = pixel_means_bgr[1],
                            mR = pixel_means_bgr[2];
                // transform only the REAL (gh, gw) cells; bucket padding
                // (applied after transform_mv_res in the Python pipeline)
                // stays exactly zero
                for (int fy = 0; fy < gh; fy++)
                for (int fx = 0; fx < gw; fx++) {
                    int i = fy * fw + fx;
                    float b = grid[i * 3 + 0], g = grid[i * 3 + 1],
                          r = grid[i * 3 + 2];
                    float o0 = (r - mR) * pixel_scale;
                    float o1 = (g - mG) * pixel_scale;
                    float o2 = legacy_swap
                                   ? (o0 - mB) * pixel_scale  // ref bug:
                                     // ch2 reads ALREADY-TRANSFORMED ch0
                                   : (b - mB) * pixel_scale;
                    dst[i * 3 + 0] = o0;
                    dst[i * 3 + 1] = o1;
                    dst[i * 3 + 2] = o2;
                }
            }
        }
    };
    int got = decode_gop_core(h, gop_idx, max_frames, true, sink,
                              key_bgr_only);
    if (sws) sws_freeContext(sws);
    if (sws_small) sws_freeContext(sws_small);
    return got;
}

COVIAR_API int coviar_decode_gop_prepared_mode(
    void* hp, int gop_idx, int target_size, int max_size, int bh, int bw,
    int stride, int small_factor, const float* pixel_means_bgr,
    float pixel_scale, int legacy_swap, int frames_mode, uint8_t* frames,
    uint8_t* smalls, float* mv_out, float* res_out, float* im_info,
    int max_frames) {
    return decode_gop_prepared_impl(
        (Handle*)hp, gop_idx, target_size, max_size, bh, bw, stride,
        small_factor, pixel_means_bgr, pixel_scale, legacy_swap,
        frames_mode, /*payload_fmt=*/0, frames, smalls, mv_out, res_out,
        im_info, max_frames);
}

// payload_fmt-aware entry (see decode_gop_prepared_impl docs above).
COVIAR_API int coviar_decode_gop_prepared_fmt(
    void* hp, int gop_idx, int target_size, int max_size, int bh, int bw,
    int stride, int small_factor, const float* pixel_means_bgr,
    float pixel_scale, int legacy_swap, int frames_mode, int payload_fmt,
    uint8_t* frames, uint8_t* smalls, float* mv_out, float* res_out,
    float* im_info, int max_frames) {
    return decode_gop_prepared_impl(
        (Handle*)hp, gop_idx, target_size, max_size, bh, bw, stride,
        small_factor, pixel_means_bgr, pixel_scale, legacy_swap,
        frames_mode, payload_fmt, frames, smalls, mv_out, res_out,
        im_info, max_frames);
}

// ---- training-sample fast path --------------------------------------------
// One call produces a COMPLETE get_pair_image sample (lib/utils/image.py:
// 92-200) as device-ready payloads: the current frame, its GOP key
// ("ref"), the previous GOP's key ("old ref"), and the current frame's
// accumulated-MV / residual grids — all resized (target/max rule), padded
// to the bucket, with optional horizontal flip (applied to the SOURCE like
// the reference's append_flipped + loader, incl. the MV x-negation).
// The Python chain costs ~500 ms/sample on one core; this runs in ~40 ms.
// Returns the in-GOP position of cur (>=0), or <0 on error.
namespace {

void flip_bgr_rows(const uint8_t* src, uint8_t* dst, int w, int hgt) {
    for (int y = 0; y < hgt; y++)
        for (int x = 0; x < w; x++)
            std::memcpy(dst + ((size_t)y * w + x) * 3,
                        src + ((size_t)y * w + (w - 1 - x)) * 3, 3);
}

}  // namespace

COVIAR_API int coviar_decode_train_sample(
    void* hp, int cur_id, int target_size, int max_size, int bh, int bw,
    int stride, const float* pixel_means_bgr, float pixel_scale,
    int legacy_swap, int flip,
    uint8_t* data, uint8_t* data_ref, uint8_t* data_ref_old,
    float* mv_out, float* res_out, float* im_info) {
    Handle* h = (Handle*)hp;
    set_err(h, "");   // fresh call: don't let a stale message mislead
    const int w = h->width, hgt = h->height;
    const size_t npx = (size_t)w * hgt;
    if (cur_id < 0 || cur_id >= (int)h->is_key.size()) return -1;
    // GOP index via the REAL keyframe index (matches gop_frames semantics)
    int gop = 0;
    for (size_t i = 0; i < h->gop_start.size(); i++)
        if (h->gop_start[i] <= cur_id) gop = (int)i;
    int pos = cur_id - h->gop_start[gop];

    double s = resize_scale(hgt, w, target_size, max_size);
    const int sh = (int)lrint(hgt * s), sw = (int)lrint(w * s);
    if (sh > bh || sw > bw) { set_err(h, "bucket too small"); return -3; }
    const int fh = bh / stride, fw = bw / stride;
    const int gh = (sh + stride - 1) / stride, gw = (sw + stride - 1) / stride;
    if (im_info) { im_info[0] = (float)sh; im_info[1] = (float)sw;
                   im_info[2] = (float)s; }

    SwsContext* sws = sws_getContext(w, hgt, AV_PIX_FMT_BGR24, sw, sh,
                                     AV_PIX_FMT_BGR24, SWS_BILINEAR,
                                     nullptr, nullptr, nullptr);
    std::vector<uint8_t> flipbuf(flip ? npx * 3 : 0);
    auto emit_frame = [&](const uint8_t* cur, uint8_t* dst_frame) {
        const uint8_t* use = cur;
        if (flip) { flip_bgr_rows(cur, flipbuf.data(), w, hgt);
                    use = flipbuf.data(); }
        std::memset(dst_frame, 0, (size_t)bh * bw * 3);
        const uint8_t* src[1] = {use};
        int src_stride[1] = {3 * w};
        uint8_t* dst[1] = {dst_frame};
        int dst_stride[1] = {3 * bw};
        sws_scale(sws, src, src_stride, 0, hgt, dst, dst_stride);
    };

    // previous GOP's key frame -> old_ref (first GOP: old_ref = ref)
    int old_gop = gop > 0 ? gop - 1 : 0;
    bool got_old = false;
    if (data_ref_old && old_gop != gop) {
        int rc = decode_gop_core(
            h, old_gop, 1, false,
            [&](int rel, const uint8_t* cur, const uint8_t*,
                const int16_t*, const AVFrame*) {
                if (rel == 0) { emit_frame(cur, data_ref_old);
                                got_old = true; }
            });
        if (rc < 0) { sws_freeContext(sws); return rc; }
    }

    // current GOP: ref (rel 0) + cur (rel pos) + cur's acc MV / residual
    bool got_cur = false, got_ref = false;
    int rc = decode_gop_core(
        h, gop, pos + 1, true,
        [&](int rel, const uint8_t* cur, const uint8_t* key,
            const int16_t* acc, const AVFrame*) {
            if (rel == 0 && data_ref) { emit_frame(cur, data_ref);
                                        got_ref = true; }
            if (rel != pos) return;
            got_cur = true;
            if (data) emit_frame(cur, data);
            if (mv_out) {
                if (pos == 0) {
                    std::memset(mv_out, 0, sizeof(float) * fh * fw * 2);
                } else {
                    // python loader: mv = -acc, then flip => cols mirrored
                    // and x re-negated (image.py:54 + loader flip);
                    // evaluated lazily at the grid taps (see bilinear_at)
                    auto mv_get = [&](int y, int x, float* o) {
                        int xs = flip ? (w - 1 - x) : x;
                        const int16_t* a = acc + ((size_t)y * w + xs) * 2;
                        o[0] = flip ? (float)a[0] : -(float)a[0];
                        o[1] = -(float)a[1];
                    };
                    mv_res_to_grid(mv_get, hgt, w, 2, sh, sw,
                                   gh, gw, fh, fw, stride, mv_out);
                    const float mscale = (float)(s / stride);
                    for (int i = 0; i < fh * fw * 2; i++)
                        mv_out[i] *= mscale;
                }
            }
            if (res_out) {
                if (pos == 0) {
                    fill_const_res_grid(res_out, gh, gw, fh, fw,
                                        pixel_means_bgr, pixel_scale,
                                        legacy_swap);
                } else {
                    // lazy flipped residual (compute_residual semantics at
                    // the mirrored column, bit-identical floats)
                    auto res_get = [&](int y, int x, float* o) {
                        int xs = flip ? (w - 1 - x) : x;
                        int i = y * w + xs;
                        int sx = clampi(xs - acc[i * 2], 0, w - 1);
                        int sy = clampi(y - acc[i * 2 + 1], 0, hgt - 1);
                        const uint8_t* cp = cur + (size_t)i * 3;
                        const uint8_t* kp = key + ((size_t)sy * w + sx) * 3;
                        o[0] = (float)((int32_t)cp[0] - (int32_t)kp[0]);
                        o[1] = (float)((int32_t)cp[1] - (int32_t)kp[1]);
                        o[2] = (float)((int32_t)cp[2] - (int32_t)kp[2]);
                    };
                    std::vector<float> grid((size_t)fh * fw * 3);
                    mv_res_to_grid(res_get, hgt, w, 3, sh, sw,
                                   gh, gw, fh, fw, stride, grid.data());
                    std::memset(res_out, 0, sizeof(float) * (size_t)fh * fw * 3);
                    const float mB = pixel_means_bgr[0],
                                mG = pixel_means_bgr[1],
                                mR = pixel_means_bgr[2];
                    for (int fy = 0; fy < gh; fy++)
                        for (int fx = 0; fx < gw; fx++) {
                            int i = fy * fw + fx;
                            float b = grid[i * 3 + 0], g = grid[i * 3 + 1],
                                  r = grid[i * 3 + 2];
                            float o0 = (r - mR) * pixel_scale;
                            float o1 = (g - mG) * pixel_scale;
                            float o2 = legacy_swap
                                           ? (o0 - mB) * pixel_scale
                                           : (b - mB) * pixel_scale;
                            res_out[i * 3 + 0] = o0;
                            res_out[i * 3 + 1] = o1;
                            res_out[i * 3 + 2] = o2;
                        }
                }
            }
        });
    sws_freeContext(sws);
    if (rc < 0) return rc;
    if (!got_cur || (data_ref && !got_ref)) return -4;
    if (data_ref_old && old_gop == gop && data_ref)
        std::memcpy(data_ref_old, data_ref, (size_t)bh * bw * 3);
    else if (data_ref_old && !got_old && old_gop != gop) return -5;
    return pos;
}

// Backward-compatible entry (frames_mode = 0: every frame resized).
COVIAR_API int coviar_decode_gop_prepared(
    void* hp, int gop_idx, int target_size, int max_size, int bh, int bw,
    int stride, int small_factor, const float* pixel_means_bgr,
    float pixel_scale, int legacy_swap, uint8_t* frames, uint8_t* smalls,
    float* mv_out, float* res_out, float* im_info, int max_frames) {
    return coviar_decode_gop_prepared_mode(
        hp, gop_idx, target_size, max_size, bh, bw, stride, small_factor,
        pixel_means_bgr, pixel_scale, legacy_swap, 0, frames, smalls,
        mv_out, res_out, im_info, max_frames);
}

// ---- test-clip synthesis (MPEG-4, fixed GOP; b_frames>0 only for the
// B-frame-rejection test) ----
// bgr: optional caller-provided frames (n_frames * hgt * w * 3, BGR24
// packed) — encoded instead of the procedural pattern when non-null
// (the synthetic-dataset generator's path, data/synth.py)
static int encode_test_video_impl(const char* path, int n_frames,
                                  int w, int hgt, int gop_size,
                                  int seed, int b_frames,
                                  const uint8_t* bgr = nullptr,
                                  int64_t bit_rate = 2000000) {
    const AVCodec* codec = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
    if (!codec) return -1;
    AVFormatContext* fmt = nullptr;
    avformat_alloc_output_context2(&fmt, nullptr, nullptr, path);
    if (!fmt) return -2;
    AVStream* st = avformat_new_stream(fmt, nullptr);
    AVCodecContext* enc = avcodec_alloc_context3(codec);
    enc->width = w;
    enc->height = hgt;
    enc->pix_fmt = AV_PIX_FMT_YUV420P;
    enc->time_base = {1, 25};
    enc->gop_size = gop_size;
    enc->max_b_frames = b_frames;
    enc->bit_rate = bit_rate;
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
        enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (avcodec_open2(enc, codec, nullptr) < 0) return -3;
    avcodec_parameters_from_context(st->codecpar, enc);
    st->time_base = enc->time_base;
    if (!(fmt->oformat->flags & AVFMT_NOFILE))
        if (avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) return -4;
    avformat_write_header(fmt, nullptr);

    AVFrame* frm = av_frame_alloc();
    frm->format = enc->pix_fmt;
    frm->width = w;
    frm->height = hgt;
    av_frame_get_buffer(frm, 0);
    AVPacket* pkt = av_packet_alloc();

    unsigned rng = (unsigned)seed * 2654435761u + 12345u;
    auto rnd = [&rng]() { rng = rng * 1664525u + 1013904223u; return rng >> 16; };
    int bx = w / 4, by = hgt / 4;  // a moving bright square

    int packets = 0;
    auto flush = [&](AVPacket* p) {
        while (avcodec_receive_packet(enc, p) == 0) {
            if (p->duration == 0) p->duration = 1;  // mp4: keep last sample
            av_packet_rescale_ts(p, enc->time_base, st->time_base);
            p->stream_index = st->index;
            av_interleaved_write_frame(fmt, p);
            av_packet_unref(p);
            packets++;
        }
    };

    SwsContext* to_yuv = nullptr;
    if (bgr) {
        to_yuv = sws_getContext(w, hgt, AV_PIX_FMT_BGR24, w, hgt,
                                AV_PIX_FMT_YUV420P, SWS_BILINEAR,
                                nullptr, nullptr, nullptr);
        if (!to_yuv) return -5;
    }

    for (int t = 0; t < n_frames; t++) {
        av_frame_make_writable(frm);
        if (bgr) {
            const uint8_t* src[1] = {bgr + (size_t)t * hgt * w * 3};
            int src_stride[1] = {w * 3};
            sws_scale(to_yuv, src, src_stride, 0, hgt, frm->data,
                      frm->linesize);
        } else {
        // smooth gradient background + moving square (codec-friendly motion)
        for (int y = 0; y < hgt; y++)
            for (int x = 0; x < w; x++)
                frm->data[0][y * frm->linesize[0] + x] =
                    (uint8_t)((x * 2 + y + t * 3) & 0xFF);
        int sx = (bx + t * 4) % (w - 16), sy = (by + t * 2) % (hgt - 16);
        for (int y = sy; y < sy + 16; y++)
            for (int x = sx; x < sx + 16; x++)
                frm->data[0][y * frm->linesize[0] + x] = 235;
        for (int y = 0; y < hgt / 2; y++)
            for (int x = 0; x < w / 2; x++) {
                frm->data[1][y * frm->linesize[1] + x] =
                    (uint8_t)(128 + ((x + (int)(rnd() & 3)) & 7));
                frm->data[2][y * frm->linesize[2] + x] =
                    (uint8_t)(128 + ((y + t) & 7));
            }
        }
        frm->pts = t;
        int rc;
        do {  // EAGAIN => drain output and retry (never drop a frame)
            rc = avcodec_send_frame(enc, frm);
            flush(pkt);
        } while (rc == AVERROR(EAGAIN));
    }
    avcodec_send_frame(enc, nullptr);
    flush(pkt);
    if (to_yuv) sws_freeContext(to_yuv);
    av_write_trailer(fmt);
    avcodec_free_context(&enc);
    av_frame_free(&frm);
    av_packet_free(&pkt);
    if (!(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
    avformat_free_context(fmt);
    return packets == n_frames ? 0 : packets;
}

COVIAR_API int coviar_encode_test_video(const char* path, int n_frames,
                                        int w, int hgt, int gop_size,
                                        int seed) {
    return encode_test_video_impl(path, n_frames, w, hgt, gop_size, seed, 0);
}

COVIAR_API int coviar_encode_test_video_b(const char* path, int n_frames,
                                          int w, int hgt, int gop_size,
                                          int seed, int b_frames) {
    return encode_test_video_impl(path, n_frames, w, hgt, gop_size, seed,
                                  b_frames);
}

// Encode caller-provided BGR24 frames (n_frames, hgt, w, 3) to an MPEG-4
// stream with a fixed GOP — the synthetic-dataset generator's encoder.
COVIAR_API int coviar_encode_frames(const char* path, const uint8_t* bgr,
                                    int n_frames, int w, int hgt,
                                    int gop_size) {
    return encode_test_video_impl(path, n_frames, w, hgt, gop_size, 0, 0,
                                  bgr);
}

// Same, with an explicit target bitrate (bits/sec) — lower rates give the
// blockier, noisier MV/residual streams the hardened synthetic benchmark
// uses (data/synth.py profile="hard").
COVIAR_API int coviar_encode_frames_br(const char* path, const uint8_t* bgr,
                                       int n_frames, int w, int hgt,
                                       int gop_size, int64_t bit_rate) {
    return encode_test_video_impl(path, n_frames, w, hgt, gop_size, 0, 0,
                                  bgr, bit_rate);
}
