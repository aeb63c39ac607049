// Native lossless concat: stream-copy N homogeneous segments into one
// container (video + audio + GPMF data tracks), the reference's `join`
// (ffmpeg concat demuxer with `-c copy` and explicit v/a/GPMF mapping,
// src/join.ts:59-82). GoPro chaptered recordings share codec parameters,
// so packets are copied byte-exact with per-stream timestamp offsets
// accumulated from each segment's container duration.
//
// C ABI (ctypes):
//   int va_concat(const char* const* inputs, int n, const char* output);
//   // 0 ok, <0 error
//   const char* va_concat_error(void);  // last error in this thread

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <string>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/avutil.h>
#include <libavutil/mathematics.h>
}

namespace {
thread_local std::string g_err;

int fail(const std::string& msg) {
    g_err = msg;
    return -1;
}
}  // namespace

extern "C" {

const char* va_concat_error(void) { return g_err.c_str(); }

int va_concat(const char* const* inputs, int n, const char* output) {
    av_log_set_level(AV_LOG_ERROR);
    if (n <= 0) return fail("no inputs");

    AVFormatContext* ofmt = nullptr;
    if (avformat_alloc_output_context2(&ofmt, nullptr, nullptr, output) < 0 ||
        !ofmt)
        return fail("cannot allocate output");

    // Stream layout from the first segment.
    AVFormatContext* first = nullptr;
    if (avformat_open_input(&first, inputs[0], nullptr, nullptr) < 0 ||
        avformat_find_stream_info(first, nullptr) < 0) {
        if (first) avformat_close_input(&first);
        avformat_free_context(ofmt);
        return fail(std::string("cannot open ") + inputs[0]);
    }
    std::vector<int> map(first->nb_streams, -1);
    std::vector<AVRational> itb(first->nb_streams);
    for (unsigned i = 0; i < first->nb_streams; ++i) {
        AVStream* ist = first->streams[i];
        const AVMediaType t = ist->codecpar->codec_type;
        if (t != AVMEDIA_TYPE_VIDEO && t != AVMEDIA_TYPE_AUDIO &&
            t != AVMEDIA_TYPE_DATA)
            continue;
        AVStream* ost = avformat_new_stream(ofmt, nullptr);
        if (!ost ||
            avcodec_parameters_copy(ost->codecpar, ist->codecpar) < 0) {
            // A half-built stream (empty codecpar) would corrupt the
            // header; this is allocation failure, not a skippable track.
            avformat_close_input(&first);
            avformat_free_context(ofmt);
            return fail("cannot allocate output stream");
        }
        ost->time_base = ist->time_base;
        ost->avg_frame_rate = ist->avg_frame_rate;
        map[i] = ost->index;
        itb[i] = ist->time_base;
    }
    const unsigned nstreams = first->nb_streams;
    // Keep `first` open: find_stream_info buffers the packets it probed,
    // so it doubles as segment 0's read handle — re-opening would repeat
    // megabytes of probe I/O per join.

    if (!(ofmt->oformat->flags & AVFMT_NOFILE) &&
        avio_open(&ofmt->pb, output, AVIO_FLAG_WRITE) < 0) {
        avformat_close_input(&first);
        avformat_free_context(ofmt);
        return fail("cannot open output file");
    }
    if (avformat_write_header(ofmt, nullptr) < 0) {
        avformat_close_input(&first);
        if (ofmt->pb) avio_closep(&ofmt->pb);
        avformat_free_context(ofmt);
        return fail("write_header failed");
    }

    // Per-OUTPUT-stream running offset, in that stream's time base.
    std::vector<int64_t> offset(ofmt->nb_streams, 0);
    AVPacket* pkt = av_packet_alloc();
    int status = 0;

    for (int f = 0; f < n && status == 0; ++f) {
        AVFormatContext* in = nullptr;
        if (f == 0) {
            in = first;  // already open + probed; reads start at packet 0
            first = nullptr;
        } else if (avformat_open_input(&in, inputs[f], nullptr, nullptr) < 0 ||
                   avformat_find_stream_info(in, nullptr) < 0) {
            if (in) avformat_close_input(&in);
            status = fail(std::string("cannot open ") + inputs[f]);
            break;
        }
        if (in->nb_streams < nstreams) {
            avformat_close_input(&in);
            status = fail(std::string("segment stream layout differs: ") +
                          inputs[f]);
            break;
        }
        // Observed end timestamp per output stream (in the first file's
        // time base for that stream) — the offset fallback when the
        // container reports no duration.
        std::vector<int64_t> seg_end(ofmt->nb_streams, 0);
        while (av_read_frame(in, pkt) >= 0) {
            const unsigned i = pkt->stream_index;
            if (i >= nstreams || map[i] < 0) {
                av_packet_unref(pkt);
                continue;
            }
            AVStream* ist = in->streams[i];
            AVStream* ost = ofmt->streams[map[i]];
            const int64_t off = offset[map[i]];
            if (pkt->pts != AV_NOPTS_VALUE)
                pkt->pts = av_rescale_q(pkt->pts, ist->time_base, itb[i]) + off;
            if (pkt->dts != AV_NOPTS_VALUE)
                pkt->dts = av_rescale_q(pkt->dts, ist->time_base, itb[i]) + off;
            pkt->duration =
                av_rescale_q(pkt->duration, ist->time_base, itb[i]);
            if (pkt->pts != AV_NOPTS_VALUE) {
                const int64_t end = pkt->pts + std::max<int64_t>(
                    pkt->duration, 0);
                if (end > seg_end[map[i]]) seg_end[map[i]] = end;
            }
            av_packet_rescale_ts(pkt, itb[i], ost->time_base);
            pkt->stream_index = map[i];
            pkt->pos = -1;
            if (av_interleaved_write_frame(ofmt, pkt) < 0) {
                status = fail("packet write failed");
                break;
            }
        }
        // Advance every mapped stream's offset by this segment's duration
        // (containers report it in AV_TIME_BASE microseconds); when the
        // container omits it, fall back to the last packet end observed
        // so the next segment's timestamps stay monotonic.
        const int64_t dur_us = in->duration > 0 ? in->duration : 0;
        for (unsigned i = 0; i < nstreams; ++i) {
            if (map[i] < 0) continue;
            const int64_t by_dur =
                offset[map[i]] + av_rescale_q(dur_us, AV_TIME_BASE_Q, itb[i]);
            offset[map[i]] = std::max(by_dur, seg_end[map[i]]);
        }
        avformat_close_input(&in);
    }
    av_packet_free(&pkt);

    if (status == 0 && av_write_trailer(ofmt) < 0)
        status = fail("write_trailer failed");
    if (ofmt->pb) avio_closep(&ofmt->pb);
    avformat_free_context(ofmt);
    return status;
}

}  // extern "C"
