// Host ingest shim: channel mixdown + streaming windowed-sinc resampling
// + SPSC ring staging in one C ABI call per capture callback.
//
// TPU-native counterpart of the reference's capture-side RT work
// (`rust-core/src/audio/input.rs` mixdown + `processor/resampling.rs`
// streaming input resampler): the audio callback thread hands interleaved
// device frames to `afx_ingest_push`, which mixes to mono, resamples the
// device rate to the 48 kHz processing rate with the same polyphase table
// as the Python/JAX resampler (the table is computed once in Python and
// passed in — one source of truth for the filter design), and writes the
// result into the lock-free ring from ringbuffer.cpp. No allocation, no
// locks, no syscalls after construction.
//
// Built together with ringbuffer.cpp into one shared library and loaded
// via ctypes (audioforge_tpu/runtime/ingest.py).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <new>

extern "C" {
struct Ring;  // from ringbuffer.cpp
uint64_t afx_ring_write(Ring* r, const float* src, uint64_t n);
}

namespace {

constexpr int kMaxSincLen = 256;
constexpr int kOversampling = 256;
constexpr int kMaxChunk = 8192;

enum MixMode : int32_t {
    kAverage = 0,
    kLeft = 1,
    kRight = 2,
    kMaxRms = 3,
};

struct Ingest {
    Ring* ring;
    int32_t channels;
    int32_t mix_mode;
    // resampler
    int32_t sinc_len;         // 0 => passthrough (device rate == 48k)
    double step;              // in_rate / out_rate
    double next_pos;          // input-time position of the next output
    int64_t buf_start;        // absolute input index of buf[0]
    int64_t buf_len;
    // phase table: (kOversampling + 3) rows x sinc_len, row-major
    float table[(kOversampling + 3) * kMaxSincLen];
    float buf[4 * kMaxChunk + 2 * kMaxSincLen];
    float mono[kMaxChunk];
    float out[2 * kMaxChunk];
};

float mix_frame(const float* frame, int32_t channels, int32_t mode,
                bool left_stronger) {
    if (channels == 1) return frame[0];
    switch (mode) {
        case kLeft:
            return frame[0];
        case kRight:
            return frame[1];
        case kMaxRms:
            return left_stronger ? frame[0] : frame[1];
        default: {
            float acc = 0.0f;
            for (int32_t c = 0; c < channels; ++c) acc += frame[c];
            return acc / static_cast<float>(channels);
        }
    }
}

}  // namespace

extern "C" {

Ingest* afx_ingest_create(Ring* ring, int32_t channels, int32_t mix_mode,
                          int32_t sinc_len, double in_rate, double out_rate,
                          const float* phase_table) {
    if (!ring || channels < 1 || channels > 8) return nullptr;
    if (sinc_len != 0 &&
        (sinc_len < 8 || sinc_len > kMaxSincLen || !phase_table)) {
        return nullptr;
    }
    Ingest* g = new (std::nothrow) Ingest();
    if (!g) return nullptr;
    g->ring = ring;
    g->channels = channels;
    g->mix_mode = mix_mode;
    g->sinc_len = sinc_len;
    if (sinc_len) {
        g->step = in_rate / out_rate;
        g->next_pos = 0.0;
        const int half = sinc_len / 2;
        // pre-charge the left half-window with zeros (same startup contract
        // as the Python StreamingResampler)
        g->buf_start = -half;
        g->buf_len = half;
        std::memset(g->buf, 0, sizeof(float) * half);
        std::memcpy(g->table, phase_table,
                    sizeof(float) * (kOversampling + 3) * sinc_len);
    }
    return g;
}

void afx_ingest_destroy(Ingest* g) { delete g; }

// Push interleaved device frames; returns processed output frames written
// to the ring (negative on error).
int64_t afx_ingest_push(Ingest* g, const float* interleaved,
                        int64_t frame_count) {
    if (!g || !interleaved || frame_count < 0) return -1;
    if (frame_count > kMaxChunk) return -2;

    // ---- mixdown
    bool left_stronger = true;
    if (g->mix_mode == kMaxRms && g->channels >= 2) {
        double l2 = 0.0, r2 = 0.0;
        for (int64_t i = 0; i < frame_count; ++i) {
            const float* f = interleaved + i * g->channels;
            l2 += static_cast<double>(f[0]) * f[0];
            r2 += static_cast<double>(f[1]) * f[1];
        }
        left_stronger = l2 >= r2;
    }
    for (int64_t i = 0; i < frame_count; ++i) {
        g->mono[i] = mix_frame(interleaved + i * g->channels, g->channels,
                               g->mix_mode, left_stronger);
    }

    // ---- passthrough when the device already runs at the engine rate
    if (!g->sinc_len) {
        return static_cast<int64_t>(
            afx_ring_write(g->ring, g->mono, frame_count));
    }

    // ---- streaming polyphase resample (matches StreamingResampler)
    const int L = g->sinc_len;
    const int half = L / 2;
    if (g->buf_len + frame_count >
        static_cast<int64_t>(sizeof(g->buf) / sizeof(float))) {
        return -3;  // caller violated the chunk contract
    }
    std::memcpy(g->buf + g->buf_len, g->mono, sizeof(float) * frame_count);
    g->buf_len += frame_count;

    const int64_t end = g->buf_start + g->buf_len;
    const double limit = static_cast<double>(end - half);
    int64_t n_out = static_cast<int64_t>(
        std::floor((limit - 1.0 - g->next_pos) / g->step)) + 1;
    if (n_out <= 0) return 0;
    if (n_out > static_cast<int64_t>(sizeof(g->out) / sizeof(float))) {
        return -4;
    }

    for (int64_t j = 0; j < n_out; ++j) {
        const double pos = g->next_pos + static_cast<double>(j) * g->step;
        const int64_t base = static_cast<int64_t>(std::floor(pos));
        const float frac = static_cast<float>(pos - static_cast<double>(base));
        float p = frac * kOversampling;
        int p0 = static_cast<int>(std::floor(p));
        if (p0 > kOversampling - 1) p0 = kOversampling - 1;
        const float t = p - static_cast<float>(p0);
        const float* f_m1 = g->table + (p0 + 0) * L;
        const float* f_0 = g->table + (p0 + 1) * L;
        const float* f_1 = g->table + (p0 + 2) * L;
        const float* f_2 = g->table + (p0 + 3) * L;
        const float* window = g->buf + (base - g->buf_start) - half + 1;
        float acc = 0.0f;
        for (int k = 0; k < L; ++k) {
            const float a = -0.5f * f_m1[k] + 1.5f * f_0[k]
                            - 1.5f * f_1[k] + 0.5f * f_2[k];
            const float b = f_m1[k] - 2.5f * f_0[k] + 2.0f * f_1[k]
                            - 0.5f * f_2[k];
            const float c = 0.5f * (f_1[k] - f_m1[k]);
            const float filt = ((a * t + b) * t + c) * t + f_0[k];
            acc += window[k] * filt;
        }
        g->out[j] = acc;
    }
    g->next_pos += static_cast<double>(n_out) * g->step;

    // trim consumed history
    const int64_t keep_from =
        static_cast<int64_t>(std::floor(g->next_pos)) - half + 1 -
        g->buf_start;
    if (keep_from > 0) {
        std::memmove(g->buf, g->buf + keep_from,
                     sizeof(float) * (g->buf_len - keep_from));
        g->buf_len -= keep_from;
        g->buf_start += keep_from;
    }
    return static_cast<int64_t>(afx_ring_write(g->ring, g->out, n_out));
}

}  // extern "C"
