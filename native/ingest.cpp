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

// ---------------------------------------------------------------------------
// Per-cell OFDM-symbol framing (the producer's per-cell inner loop,
// reference producer_thread.cpp:165-249): walk the block's LTE-timescale
// timestamp ramp, start a 128-sample window when the ramp crosses
// frame_timing + target within (-0.5, 3.0), and emit completed symbols.
// One call per (cell, block) replaces the per-symbol Python trigger scan.
//
// state (doubles), persisted across calls:
//   [0]=target_cap_start_time  [1]=filling  [2]=buffer_offset
//   [3]=sym_num  [4]=slot_num  [5]=pdu_late  [6]=pdu_fo  [7]=pdu_ft
// partial: 256 doubles (the in-progress symbol, interleaved re/im)
// samples: interleaved double[2n]; ts(t) = pymod(ts0 + step*(t+1), 19200)
// Outputs per completed symbol i:
//   out_data[256*i], out_late[i], out_fo[i], out_ft[i],
//   out_sym[i] = slot_num*n_symb + sym_num at completion.
// Returns the number of completed symbols.
// ---------------------------------------------------------------------------
static inline double pymod(double x, double m) {
    double r = fmod(x, m);
    return r < 0 ? r + m : r;
}

int64_t cell_frame_symbols2(const double* samples, int64_t n, double ts0,
                           double step, double frame_timing, double fo,
                           int64_t n_symb, double* state, double* partial,
                           double* out_data, double* out_late,
                           double* out_fo, double* out_ft,
                           int64_t* out_sym, int64_t* out_start) {
    // out_start[i]: index of symbol i's first sample within THIS block,
    // or -1 when the symbol started in an earlier block (its data then
    // lives only in out_data) -- lets a remote-accelerator consumer
    // gather the 128-sample windows from ONE uploaded copy of the raw
    // block instead of shipping per-cell window copies.
    double target = state[0];
    bool filling = state[1] != 0.0;
    int64_t off = (int64_t)state[2];
    int64_t start_cur = filling ? -1 : 0;
    int64_t sym_num = (int64_t)state[3];
    int64_t slot_num = (int64_t)state[4];
    double pdu_late = state[5], pdu_fo = state[6], pdu_ft = state[7];
    int64_t n_out = 0;
    int64_t t = 0;
    while (t < n) {
        if (!filling) {
            // per-sample trigger scan (exact _next_trigger semantics:
            // first t with wrap(ts[t] - (frame_timing+target)) in
            // (-0.5, 3.0); the wrapped difference advances by `step`
            // per sample, so jump ahead arithmetically like the Python
            // locator and verify per sample around the landing point)
            double tgt = frame_timing + target;
            bool found = false;
            while (t < n) {
                double tsw = pymod(ts0 + step * (double)(t + 1), 19200.0);
                double d = pymod(tsw - tgt + 9600.0, 19200.0) - 9600.0;
                if (-0.5 < d && d < 3.0) {
                    pdu_late = d;
                    found = true;
                    break;
                }
                double m = ceil(pymod(-0.5 - d, 19200.0) / step);
                int64_t hop = (int64_t)m;
                if (hop < 1) hop = 1;
                // scan a small window around the predicted crossing
                int64_t t2 = t + hop;
                int64_t lo = t2 - 2 > t ? t2 - 2 : t;
                int64_t hi = t2 + 6 < n ? t2 + 6 : n;
                bool hit = false;
                for (int64_t c = lo; c < hi; c++) {
                    double tsc = pymod(ts0 + step * (double)(c + 1), 19200.0);
                    double dc = pymod(tsc - tgt + 9600.0, 19200.0) - 9600.0;
                    if (-0.5 < dc && dc < 3.0) {
                        t = c;
                        pdu_late = dc;
                        hit = true;
                        break;
                    }
                }
                if (hit) {
                    found = true;
                    break;
                }
                if (t2 + 6 >= n) {
                    t = n;
                    break;
                }
                t = t2 + 6;
            }
            if (!found) break;
            filling = true;
            off = 0;
            start_cur = t;
            pdu_fo = fo;
            pdu_ft = frame_timing;
        }
        int64_t take = 128 - off < n - t ? 128 - off : n - t;
        memcpy(partial + 2 * off, samples + 2 * t,
               (size_t)(2 * take) * sizeof(double));
        off += take;
        t += take;
        if (off == 128) {
            memcpy(out_data + 256 * n_out, partial, 256 * sizeof(double));
            out_late[n_out] = pdu_late;
            out_fo[n_out] = pdu_fo;
            out_ft[n_out] = pdu_ft;
            out_sym[n_out] = slot_num * n_symb + sym_num;
            out_start[n_out] = start_cur;
            n_out++;
            filling = false;
            if (n_symb == 6) {
                target += 32.0 + 128.0;
            } else {
                target += sym_num == 6 ? (128.0 + 10.0) : (128.0 + 9.0);
            }
            target = pymod(target, 19200.0);
            sym_num++;
            if (sym_num == n_symb) {
                sym_num = 0;
                slot_num = (slot_num + 1) % 20;
            }
        }
    }
    state[0] = target;
    state[1] = filling ? 1.0 : 0.0;
    state[2] = (double)off;
    state[3] = (double)sym_num;
    state[4] = (double)slot_num;
    state[5] = pdu_late;
    state[6] = pdu_fo;
    state[7] = pdu_ft;
    return n_out;
}

}  // extern "C"
