// Lock-free single-producer / single-consumer float32 audio ring buffer.
//
// TPU-native counterpart of the reference engine's RT audio rings
// (`rust-core/src/audio/buffer.rs`): the host-side staging layer between
// audio callback threads and the DSP thread that launches the jitted
// per-block step. Obeys the same RT contract — no allocation, no locks,
// no syscalls on push/pop; overflow drops are counted, never blocking.
//
// Built as a plain C ABI shared library and loaded from Python via ctypes
// (see audioforge_tpu/runtime/ringbuffer.py).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <new>

namespace {

struct Ring {
    float* data;
    uint64_t capacity;  // power of two
    uint64_t mask;
    alignas(64) std::atomic<uint64_t> head;  // write position (producer)
    alignas(64) std::atomic<uint64_t> tail;  // read position (consumer)
    alignas(64) std::atomic<uint64_t> dropped;
    std::atomic<uint64_t> overflow_events;
};

uint64_t next_pow2(uint64_t v) {
    uint64_t p = 1;
    while (p < v) p <<= 1;
    return p;
}

}  // namespace

extern "C" {

Ring* afx_ring_create(uint64_t min_capacity) {
    if (min_capacity == 0 || min_capacity > (1ull << 30)) return nullptr;
    Ring* r = new (std::nothrow) Ring;
    if (!r) return nullptr;
    r->capacity = next_pow2(min_capacity);
    r->mask = r->capacity - 1;
    r->data = new (std::nothrow) float[r->capacity];
    if (!r->data) {
        delete r;
        return nullptr;
    }
    std::memset(r->data, 0, r->capacity * sizeof(float));
    r->head.store(0, std::memory_order_relaxed);
    r->tail.store(0, std::memory_order_relaxed);
    r->dropped.store(0, std::memory_order_relaxed);
    r->overflow_events.store(0, std::memory_order_relaxed);
    return r;
}

void afx_ring_destroy(Ring* r) {
    if (!r) return;
    delete[] r->data;
    delete r;
}

uint64_t afx_ring_capacity(const Ring* r) { return r ? r->capacity : 0; }

uint64_t afx_ring_available(const Ring* r) {
    if (!r) return 0;
    uint64_t h = r->head.load(std::memory_order_acquire);
    uint64_t t = r->tail.load(std::memory_order_acquire);
    return h - t;
}

uint64_t afx_ring_free_space(const Ring* r) {
    return r ? r->capacity - afx_ring_available(r) : 0;
}

// Producer only. Writes as much as fits; excess is dropped and counted.
// Returns the number of samples written.
uint64_t afx_ring_write(Ring* r, const float* src, uint64_t n) {
    if (!r || !src) return 0;
    uint64_t h = r->head.load(std::memory_order_relaxed);
    uint64_t t = r->tail.load(std::memory_order_acquire);
    uint64_t free_space = r->capacity - (h - t);
    uint64_t to_write = n < free_space ? n : free_space;
    if (to_write < n) {
        r->dropped.fetch_add(n - to_write, std::memory_order_relaxed);
        r->overflow_events.fetch_add(1, std::memory_order_relaxed);
    }
    uint64_t start = h & r->mask;
    uint64_t first = to_write < (r->capacity - start) ? to_write
                                                      : (r->capacity - start);
    std::memcpy(r->data + start, src, first * sizeof(float));
    std::memcpy(r->data, src + first, (to_write - first) * sizeof(float));
    r->head.store(h + to_write, std::memory_order_release);
    return to_write;
}

// Consumer only. Returns the number of samples read into dst.
uint64_t afx_ring_read(Ring* r, float* dst, uint64_t n) {
    if (!r || !dst) return 0;
    uint64_t t = r->tail.load(std::memory_order_relaxed);
    uint64_t h = r->head.load(std::memory_order_acquire);
    uint64_t avail = h - t;
    uint64_t to_read = n < avail ? n : avail;
    uint64_t start = t & r->mask;
    uint64_t first = to_read < (r->capacity - start) ? to_read
                                                     : (r->capacity - start);
    std::memcpy(dst, r->data + start, first * sizeof(float));
    std::memcpy(dst + first, r->data, (to_read - first) * sizeof(float));
    r->tail.store(t + to_read, std::memory_order_release);
    return to_read;
}

// Consumer only. Discards up to n samples; returns how many were dropped.
uint64_t afx_ring_discard(Ring* r, uint64_t n) {
    if (!r) return 0;
    uint64_t t = r->tail.load(std::memory_order_relaxed);
    uint64_t h = r->head.load(std::memory_order_acquire);
    uint64_t avail = h - t;
    uint64_t to_drop = n < avail ? n : avail;
    r->tail.store(t + to_drop, std::memory_order_release);
    return to_drop;
}

uint64_t afx_ring_dropped(const Ring* r) {
    return r ? r->dropped.load(std::memory_order_relaxed) : 0;
}

uint64_t afx_ring_overflow_events(const Ring* r) {
    return r ? r->overflow_events.load(std::memory_order_relaxed) : 0;
}

void afx_ring_reset_dropped(Ring* r) {
    if (r) r->dropped.store(0, std::memory_order_relaxed);
}

// Consumer-side clear (stop/reset path, not RT).
void afx_ring_clear(Ring* r) {
    if (!r) return;
    uint64_t h = r->head.load(std::memory_order_acquire);
    r->tail.store(h, std::memory_order_release);
}

}  // extern "C"
