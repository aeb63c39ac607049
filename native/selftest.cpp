// Native IO self-test: exercises the threaded writer (encode ring +
// muxer thread), loader (decode ring + demux thread), and concat from a
// single driver, designed to run under ThreadSanitizer (`make -C native
// tsan`). The reference has no sanitizer coverage (meson werror only);
// the framework's host decode/feed threads get raced here on purpose:
// producer-side writes overlap the encoder thread, then two concurrent
// readers drain independent loaders on the result.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {
// writer.cpp
void* vaw_open(const char*, int, int, int, int, const char*, int,
               const char*, double, double, int);
int vaw_write(void*, const uint8_t*, const uint8_t*, const uint8_t*);
int vaw_close(void*);
// loader.cpp
void* va_open(const char*, int);
void* va_open_seek(const char*, int, long);
int va_meta(void*, int*, int*, int*, int*, long*);
int va_next(void*, uint8_t*, uint8_t*, uint8_t*);
void va_close(void*);
// concat.cpp
int va_concat(const char* const*, int, const char*);
const char* va_concat_error(void);
}

namespace {
constexpr int W = 192, H = 144, N = 40;

int write_clip(const std::string& path) {
    void* w = vaw_open(path.c_str(), W, H, 30, 1, "libx264", 19, nullptr,
                       0.0, -1.0, 4);
    if (!w) return 1;
    std::vector<uint8_t> y(W * H), u(W * H / 4, 100), v(W * H / 4, 140);
    for (int i = 0; i < N; ++i) {
        for (int r = 0; r < H; ++r)
            std::memset(y.data() + r * W, (r + i * 3) & 0xff, W);
        if (vaw_write(w, y.data(), u.data(), v.data()) != 1) {
            vaw_close(w);
            return 2;
        }
    }
    return vaw_close(w) == 0 ? 0 : 3;
}

int read_clip(const std::string& path, long* frames) {
    void* l = va_open(path.c_str(), 4);
    if (!l) return 1;
    int w, h, fn, fd;
    long n;
    va_meta(l, &w, &h, &fn, &fd, &n);
    if (w != W || h != H) {
        va_close(l);
        return 2;
    }
    std::vector<uint8_t> y(W * H), u(W * H / 4), v(W * H / 4);
    long count = 0;
    while (va_next(l, y.data(), u.data(), v.data()) == 1) ++count;
    va_close(l);
    *frames = count;
    return 0;
}

// Trim seek: the first frame after va_open_seek(start) must be the same
// frame a sequential reader reaches by decoding `start` frames (row
// pattern y[r] = (r + i*3) & 0xff identifies frame i exactly: QP 19 is
// not bit-exact, so allow a small tolerance). Also abandon a seeked
// loader mid-stream (close with the ring full) to race the teardown.
int seek_clip(const std::string& path, long start, long content_frame) {
    void* l = va_open_seek(path.c_str(), 4, start);
    if (!l) return 1;
    std::vector<uint8_t> y(W * H), u(W * H / 4), v(W * H / 4);
    if (va_next(l, y.data(), u.data(), v.data()) != 1) {
        va_close(l);
        return 2;
    }
    for (int r = 0; r < H; r += 17) {
        int want = (r + (int)content_frame * 3) & 0xff;
        int got = y[r * W + W / 2];
        int d = got > want ? got - want : want - got;
        if (d > 4 && d < 252) {  // wraparound-aware tolerance
            std::fprintf(stderr, "seek row %d: got %d want %d\n", r, got,
                         want);
            va_close(l);
            return 3;
        }
    }
    va_close(l);  // decode thread still pumping: teardown under load
    return 0;
}
}  // namespace

int main() {
    const std::string a = "/tmp/vat_selftest_a.mp4";
    const std::string b = "/tmp/vat_selftest_b.mp4";
    const std::string j = "/tmp/vat_selftest_join.mp4";

    // Two writers in parallel (separate handles; encoder threads race
    // against both producers and each other via libav internals).
    int ra = -1, rb = -1;
    std::thread ta([&] { ra = write_clip(a); });
    std::thread tb([&] { rb = write_clip(b); });
    ta.join();
    tb.join();
    if (ra || rb) {
        std::fprintf(stderr, "write failed: %d %d\n", ra, rb);
        return 1;
    }

    const char* inputs[2] = {a.c_str(), b.c_str()};
    if (va_concat(inputs, 2, j.c_str()) != 0) {
        std::fprintf(stderr, "concat failed: %s\n", va_concat_error());
        return 1;
    }

    // Two loaders draining concurrently.
    long fa = 0, fj = 0;
    int qa = -1, qj = -1;
    std::thread tc([&] { qa = read_clip(a, &fa); });
    std::thread td([&] { qj = read_clip(j, &fj); });
    tc.join();
    td.join();
    if (qa || qj) {
        std::fprintf(stderr, "read failed: %d %d\n", qa, qj);
        return 1;
    }
    if (fa != N || fj != 2 * N) {
        std::fprintf(stderr, "frame counts: %ld (want %d), %ld (want %d)\n",
                     fa, N, fj, 2 * N);
        return 1;
    }

    // Concurrent seeked readers (distinct offsets; the joined clip's
    // global frame N+7 carries segment b's frame-7 content).
    int sa = -1, sb = -1;
    std::thread te([&] { sa = seek_clip(a, N / 2, N / 2); });
    std::thread tf([&] { sb = seek_clip(j, N + 7, 7); });
    te.join();
    tf.join();
    if (sa || sb) {
        std::fprintf(stderr, "seek failed: %d %d\n", sa, sb);
        return 1;
    }

    // Multi-loader stress: the 8x4K60 feed shape (benchmarks/host_feed.py)
    // is K independent loaders per host, each with its own demux+decode
    // thread plus libavcodec frame threads. Race 6 loaders on one file —
    // 4 draining fully, 2 abandoning after a few frames so ring-full
    // teardown overlaps the other instances' decoding.
    constexpr int K = 6;
    int mr[K];
    long mf[K];
    std::vector<std::thread> pool;
    for (int i = 0; i < K; ++i) {
        mr[i] = -1;
        mf[i] = 0;
        pool.emplace_back([&, i] {
            if (i >= 4) {
                void* l = va_open(a.c_str(), 4);
                if (!l) { mr[i] = 1; return; }
                std::vector<uint8_t> y(W * H), u(W * H / 4), v(W * H / 4);
                for (int k = 0; k < 3; ++k)
                    if (va_next(l, y.data(), u.data(), v.data()) != 1) break;
                va_close(l);  // decode thread mid-pump
                mr[i] = 0;
                mf[i] = N;  // not counted
            } else {
                mr[i] = read_clip(a, &mf[i]);
            }
        });
    }
    for (auto& t : pool) t.join();
    for (int i = 0; i < K; ++i) {
        if (mr[i] || mf[i] != N) {
            std::fprintf(stderr, "multi-loader %d: rc=%d frames=%ld\n", i,
                         mr[i], mf[i]);
            return 1;
        }
    }

    std::printf("native selftest OK: %ld + %ld frames (+seek, +%dx loaders)\n",
                fa, fj, K);
    return 0;
}
