// Native tracker control-loop numerics.
//
// Plays the role of the reference's per-symbol C++ tracker math
// (/root/reference/src/tracker_thread.cpp:176-393: filter_ce, do_foe,
// do_toe_v2, do_ac_fd, do_ac_td, interp72): all per-RS-window numerics
// for one (port, RS symbol) collapse into a single C call, replacing
// ~40 small-vector numpy dispatches.  The Python fallbacks in
// lte_cell_scanner_tpu/tracker/cell_tracker.py stay authoritative for
// semantics; tests/test_tracker.py pins C-vs-numpy parity.
//
// Complex arrays are interleaved double (re, im); 12-subcarrier vectors
// are 24 doubles.  Plain C ABI for ctypes.

#include <cmath>
#include <cstdint>

namespace {

struct Cpx {
    double re, im;
};

inline Cpx get(const double* a, int t) { return {a[2 * t], a[2 * t + 1]}; }
inline void put(double* a, int t, Cpx v) {
    a[2 * t] = v.re;
    a[2 * t + 1] = v.im;
}
inline Cpx add(Cpx a, Cpx b) { return {a.re + b.re, a.im + b.im}; }
inline Cpx conj_mul(Cpx a, Cpx b) {  // conj(a) * b
    return {a.re * b.re + a.im * b.im, a.re * b.im - a.im * b.re};
}
inline double abs2(Cpx a) { return a.re * a.re + a.im * a.im; }

}  // namespace

extern "C" {

// interp72: linear 12 -> 72 interpolation with edge extrapolation
// (reference interp72, tracker_thread.cpp:372-393).  y: 24 doubles,
// out: 144 doubles.
void interp72(const double* y, int64_t shift, double* out) {
    for (int t = 0; t < 72; t++) {
        double kf = ceil((double)(t - shift) / 6.0) - 1.0;
        int k = (int)kf;
        if (k < 0) k = 0;
        if (k > 10) k = 10;
        double l_x = (double)shift + 6.0 * k;
        double a = ((double)t - l_x) / 6.0;
        out[2 * t] = (y[2 * (k + 1)] - y[2 * k]) * a + y[2 * k];
        out[2 * t + 1] =
            (y[2 * (k + 1) + 1] - y[2 * k + 1]) * a + y[2 * k + 1];
    }
}

// rs_window_update: one call per (port, RS symbol).
//
// In:  prev_ce/curr_ce/next_ce [24], prev_leftmost (prev.shift<curr.shift)
// In/out: ac_fd_state [24], ac_td_state [144],
//         hist [72*24] ring + hist_pos [1] (do_ac_td history)
// Out: ce_filt [24]; scalars [10]:
//      {np_curr, tp_curr, sp_raw, sp_curr, foe_re, foe_im, foe_np,
//       toe_delay, toe_delay_np, 0}
void rs_window_update(const double* prev_ce, const double* curr_ce,
                      const double* next_ce, int prev_leftmost,
                      double* ce_filt, double* scalars,
                      double* ac_fd_state, double* ac_td_state,
                      double* hist, int64_t* hist_pos) {
    // ---- filter_ce: 3-symbol hex window means (tracker_thread.cpp:176)
    for (int t = 0; t < 12; t++) {
        Cpx cur_sum = get(curr_ce, t);
        double n_cur = 1.0;
        if (t > 0) { cur_sum = add(cur_sum, get(curr_ce, t - 1)); n_cur += 1; }
        if (t < 11) { cur_sum = add(cur_sum, get(curr_ce, t + 1)); n_cur += 1; }
        Cpx pn_t = add(get(prev_ce, t), get(next_ce, t));
        Cpx side = pn_t;
        double n_side = 1.0;
        if (prev_leftmost) {
            if (t < 11) {
                side = add(side, add(get(prev_ce, t + 1), get(next_ce, t + 1)));
                n_side = 2.0;
            }
        } else {
            if (t > 0) {
                side = add(side, add(get(prev_ce, t - 1), get(next_ce, t - 1)));
                n_side = 2.0;
            }
        }
        double denom = n_cur + 2.0 * n_side;
        put(ce_filt, t, {(cur_sum.re + side.re) / denom,
                         (cur_sum.im + side.im) / denom});
    }

    // ---- noise / signal powers
    double np_curr = 0.0, tp_curr = 0.0;
    for (int t = 0; t < 12; t++) {
        Cpx d = {get(curr_ce, t).re - get(ce_filt, t).re,
                 get(curr_ce, t).im - get(ce_filt, t).im};
        np_curr += abs2(d);
        tp_curr += abs2(get(ce_filt, t));
    }
    np_curr = np_curr / 12.0 * 7.0 / 6.0;
    tp_curr /= 12.0;
    double sp_raw = tp_curr - np_curr / 7.0;
    double sp = sp_raw > 1e-5 ? sp_raw : 1e-5;

    // ---- do_foe accumulation (tracker_thread.cpp:204-242)
    Cpx foe_comb = {0, 0};
    double foe_comb_np = 0.0, w_norm = 0.0;
    for (int t = 0; t < 12; t++) {
        Cpx foe = conj_mul(get(prev_ce, t), get(next_ce, t));
        double cf2 = abs2(get(ce_filt, t));
        double foe_np = np_curr * np_curr + 2.0 * np_curr * cf2;
        double w = cf2 / foe_np;
        foe_comb.re += foe.re * w;
        foe_comb.im += foe.im * w;
        foe_comb_np += foe_np * w * w;
        w_norm += cf2 * w;
    }
    double scale = 1.0 / w_norm;
    foe_comb.re *= scale;
    foe_comb.im *= scale;
    foe_comb_np *= scale * scale;

    // ---- do_toe_v2 (tracker_thread.cpp:245-316)
    const double* a = prev_leftmost ? prev_ce : curr_ce;
    const double* b = prev_leftmost ? curr_ce : prev_ce;
    Cpx toe1 = {0, 0}, toe2 = {0, 0};
    for (int t = 0; t < 12; t++) toe1 = add(toe1, conj_mul(get(a, t), get(b, t)));
    for (int t = 0; t < 5; t++) toe2 = add(toe2, conj_mul(get(b, t), get(a, t + 1)));
    for (int t = 6; t < 11; t++) toe2 = add(toe2, conj_mul(get(b, t), get(a, t + 1)));
    toe1.re /= 12.0; toe1.im /= 12.0;
    toe2.re /= 10.0; toe2.im /= 10.0;
    // (the sqrt(sp) normalization does not change the angles)
    double delay = -(atan2(toe1.im, toe1.re) + atan2(toe2.im, toe2.re))
        / 2.0 / 3.0 / (2.0 * M_PI / 128.0);
    double delay_np = np_curr / sp / 2.0 / 12.0;
    if (delay_np < 0.001) delay_np = 0.001;

    // ---- do_ac_fd (tracker_thread.cpp:318-341)
    const double w_old = 1.0 / 0.00001;
    for (int d = 0; d < 12; d++) {
        Cpx acd = {0, 0};
        for (int t = 0; t + d < 12; t++)
            acd = add(acd, conj_mul(get(curr_ce, t), get(curr_ce, t + d)));
        double count = (double)(12 - d);
        acd.re /= count * sp;
        acd.im /= count * sp;
        double ac_np = (np_curr * np_curr / (sp * sp)
                        + 2.0 * np_curr / sp) / count;
        double w_new = 1.0 / ac_np;
        double denom = w_old + w_new;
        ac_fd_state[2 * d] = (ac_fd_state[2 * d] * w_old + acd.re * w_new) / denom;
        ac_fd_state[2 * d + 1] =
            (ac_fd_state[2 * d + 1] * w_old + acd.im * w_new) / denom;
    }

    // ---- do_ac_td over the 72-symbol history ring (tracker:343-370)
    int64_t pos = hist_pos[0];
    for (int t = 0; t < 24; t++) hist[(pos % 72) * 24 + t] = curr_ce[t];
    pos += 1;
    hist_pos[0] = pos;
    if (pos >= 72) {
        const double* last = hist + ((pos - 1) % 72) * 24;
        for (int d = 0; d < 72; d++) {
            // chronological index 71-d  ->  ring slot (pos + 71 - d) % 72
            const double* row = hist + ((pos + 71 - d) % 72) * 24;
            Cpx xc = {0, 0};
            for (int k = 0; k < 12; k++)
                xc = add(xc, conj_mul(get(last, k), get(row, k)));
            xc.re /= 12.0 * sp;
            xc.im /= 12.0 * sp;
            double denom = w_old + 1.0;
            ac_td_state[2 * d] = (ac_td_state[2 * d] * w_old + xc.re) / denom;
            ac_td_state[2 * d + 1] =
                (ac_td_state[2 * d + 1] * w_old + xc.im) / denom;
        }
    }

    scalars[0] = np_curr;
    scalars[1] = tp_curr;
    scalars[2] = sp_raw;
    scalars[3] = sp;
    scalars[4] = foe_comb.re;
    scalars[5] = foe_comb.im;
    scalars[6] = foe_comb_np;
    scalars[7] = delay;
    scalars[8] = delay_np;
    scalars[9] = 0.0;
}

// Batched variant: n consecutive RS windows for one (cell, port) in one
// call (all the windows that became ready within one event-loop tick).
// prev/curr/next: [n, 24]; prev_leftmost: [n] int64;
// ce_filt: [n, 24]; scalars: [n, 10]; state arrays as above, updated in
// window order (identical to n sequential rs_window_update calls).
void rs_window_update_batch(int64_t n, const double* prev_ce,
                            const double* curr_ce, const double* next_ce,
                            const int64_t* prev_leftmost, double* ce_filt,
                            double* scalars, double* ac_fd_state,
                            double* ac_td_state, double* hist,
                            int64_t* hist_pos) {
    for (int64_t i = 0; i < n; i++) {
        rs_window_update(prev_ce + 24 * i, curr_ce + 24 * i,
                         next_ce + 24 * i, (int)prev_leftmost[i],
                         ce_filt + 24 * i, scalars + 10 * i,
                         ac_fd_state, ac_td_state, hist, hist_pos);
    }
}

// rs_window_update_batch2: the whole per-port RS pipeline for one tick in
// one call -- n windows' statistics (rs_window_update), the 12 -> 72
// interpolation of each window's filtered CE (interp72), AND the
// sequential FOE / frame-timing feedback chain that the Python event loop
// used to run per window (cell_tracker.py _rs_windows_batch_native tail;
// reference do_foe tracker_thread.cpp:204-243 and do_toe_v2 :245-316).
//
// In:  prev/curr/next_ce [n,24], prev_leftmost [n], curr_shift [n],
//      prev_fo/prev_ft/next_ft/curr_ft [n] (the PDU stamps),
//      fc_requested/fc_programmed/fs_programmed
// Out: ce_filt [n,24], ce72 [n,144], scalars [n,10]
// In/out: ac_fd/ac_td/hist/hist_pos (state), regs[2] = {global
//      frequency-offset register, cell frame-timing register} -- updated
//      in window order exactly as the sequential Python applications.
void rs_window_update_batch2(
    int64_t n, const double* prev_ce, const double* curr_ce,
    const double* next_ce, const int64_t* prev_leftmost,
    const int64_t* curr_shift, const double* prev_fo, const double* prev_ft,
    const double* next_ft, const double* curr_ft, double fc_requested,
    double fc_programmed, double fs_programmed, double* ce_filt,
    double* ce72, double* scalars, double* ac_fd_state, double* ac_td_state,
    double* hist, int64_t* hist_pos, double* regs) {
    double fo_reg = regs[0];
    double ft_reg = regs[1];
    const double two_pi = 2.0 * M_PI;
    for (int64_t i = 0; i < n; i++) {
        double* sc = scalars + 10 * i;
        rs_window_update(prev_ce + 24 * i, curr_ce + 24 * i,
                         next_ce + 24 * i, (int)prev_leftmost[i],
                         ce_filt + 24 * i, sc, ac_fd_state, ac_td_state,
                         hist, hist_pos);
        interp72(ce_filt + 24 * i, curr_shift[i], ce72 + 144 * i);

        // FOE feedback (tail of cell_tracker._do_foe)
        double k_factor = (fc_requested - prev_fo[i]) / fc_programmed;
        double dt_w = fmod(next_ft[i] - prev_ft[i] + 9600.0, 19200.0);
        if (dt_w < 0) dt_w += 19200.0;
        double dt = 0.0005 + (dt_w - 9600.0) / (fs_programmed * k_factor);
        double residual_f = atan2(sc[5], sc[4]) / two_pi / dt;
        double rnp = sc[6] / 2.0;
        if (rnp < 0.001) rnp = 0.001;
        double w_old = 1.0 / 0.000001;
        double w_new = 1.0 / rnp;
        fo_reg = (fo_reg * w_old + (prev_fo[i] + residual_f) * w_new)
            / (w_old + w_new);

        // frame-timing feedback (tail of cell_tracker._do_toe_v2)
        double diff = fmod(curr_ft[i] + sc[7] - ft_reg + 9600.0, 19200.0);
        if (diff < 0) diff += 19200.0;
        diff -= 9600.0;
        diff = diff * (1.0 / sc[8]) / (1.0 / 0.0001 + 1.0 / sc[8]);
        ft_reg = fmod(ft_reg + diff, 19200.0);
        if (ft_reg < 0) ft_reg += 19200.0;
    }
    regs[0] = fo_reg;
    regs[1] = ft_reg;
}

// ---------------------------------------------------------------------------
// get_fd_batch: the tracker's demod front end for one cell's tick --
// ICI-removal mixer, 2-sample rotation, unitary 128-pt DFT,
// 72-subcarrier extraction, bulk-phase + lateness compensation
// (reference get_fd, tracker_thread.cpp:91-174) for n symbols in one
// call.  The bulk-phase accumulator threads through the batch as a
// running sum of per-symbol increments (same cumulative form as the
// batched JAX/numpy paths, tracker/batched.py).
//
// data [n,256] interleaved doubles; fo/late/nse [n]; out [n,144].
// Returns the final wrapped bulk phase.
// ---------------------------------------------------------------------------
static int g_fft_init = 0;
static double g_tw_re[64], g_tw_im[64];   // exp(-2*pi*i*k/128)
static int g_bitrev[128];

static void fft_init() {
    if (g_fft_init) return;
    for (int k = 0; k < 64; k++) {
        g_tw_re[k] = cos(-2.0 * M_PI * k / 128.0);
        g_tw_im[k] = sin(-2.0 * M_PI * k / 128.0);
    }
    for (int i = 0; i < 128; i++) {
        int r = 0;
        for (int b = 0; b < 7; b++) r |= ((i >> b) & 1) << (6 - b);
        g_bitrev[i] = r;
    }
    g_fft_init = 1;
}

// in-place iterative radix-2 DIT on interleaved doubles [256]
static void fft128(double* x) {
    for (int i = 0; i < 128; i++) {
        int j = g_bitrev[i];
        if (j > i) {
            double tr = x[2 * i], ti = x[2 * i + 1];
            x[2 * i] = x[2 * j];
            x[2 * i + 1] = x[2 * j + 1];
            x[2 * j] = tr;
            x[2 * j + 1] = ti;
        }
    }
    for (int len = 2; len <= 128; len <<= 1) {
        int half = len >> 1;
        int stride = 128 / len;
        for (int start = 0; start < 128; start += len) {
            for (int k = 0; k < half; k++) {
                double wr = g_tw_re[k * stride];
                double wi = g_tw_im[k * stride];
                int a = start + k, b = start + k + half;
                double br = x[2 * b] * wr - x[2 * b + 1] * wi;
                double bi = x[2 * b] * wi + x[2 * b + 1] * wr;
                double ar = x[2 * a], ai = x[2 * a + 1];
                x[2 * a] = ar + br;
                x[2 * a + 1] = ai + bi;
                x[2 * b] = ar - br;
                x[2 * b + 1] = ai - bi;
            }
        }
    }
}

double get_fd_batch(const double* data, int64_t n, const double* fo,
                    const double* late, const double* nse,
                    double init_phase, double fc_requested,
                    double fc_programmed, double fs_programmed,
                    double fs_lte, double* out) {
    fft_init();
    const double inv_sqrt128 = 1.0 / sqrt(128.0);
    double phase = init_phase;
    double buf[256];
    for (int64_t i = 0; i < n; i++) {
        const double* d = data + 256 * i;
        double k_factor = (fc_requested - fo[i]) / fc_programmed;
        double w = -2.0 * M_PI * fo[i] / (fs_programmed * k_factor);
        // mix + roll(-2): buf[j] = d[j+2 mod 128] * exp(i*w*(j+2 mod 128));
        // the mixer phasor advances by a constant step per sample, so
        // build it by complex rotation (2 sincos per symbol instead of
        // 128; 128 rotation steps accumulate ~1e-14 relative error,
        // far inside the 1e-10 parity contract with the numpy path)
        {
            double rr = cos(w), ri = sin(w);
            double cr = 1.0, ci = 0.0;
            for (int src = 0; src < 128; src++) {
                int j = (src - 2) & 127;
                buf[2 * j] = d[2 * src] * cr - d[2 * src + 1] * ci;
                buf[2 * j + 1] = d[2 * src] * ci + d[2 * src + 1] * cr;
                double nr = cr * rr - ci * ri;
                ci = cr * ri + ci * rr;
                cr = nr;
            }
        }
        fft128(buf);
        // bulk phase advance (cumulative across the batch)
        phase += 2.0 * M_PI * nse[i] * (16.0 / fs_lte) * (-fo[i]);
        double lt = -2.0 * M_PI * late[i] / 128.0;
        double* o = out + 144 * i;
        // subcarriers -36..-1 (bins 92..127) then 1..36 (bins 1..36);
        // the late-phase ramp advances by lt per subcarrier -> one
        // rotation recurrence from cn=-36, re-anchored at the DC skip
        double rr = cos(lt), ri = sin(lt);
        double cr = cos(phase - 36.0 * lt), ci = sin(phase - 36.0 * lt);
        for (int j = 0; j < 72; j++) {
            int bin = j < 36 ? 92 + j : j - 35;
            if (j == 36) {   // cn jumps -1 -> +1: skip the DC step twice
                double nr = cr * rr - ci * ri;
                ci = cr * ri + ci * rr;
                cr = nr;
            }
            double sr = buf[2 * bin] * inv_sqrt128;
            double si = buf[2 * bin + 1] * inv_sqrt128;
            o[2 * j] = sr * cr - si * ci;
            o[2 * j + 1] = sr * ci + si * cr;
            double nr = cr * rr - ci * ri;
            ci = cr * ri + ci * rr;
            cr = nr;
        }
    }
    double wrapped = fmod(phase + M_PI, 2.0 * M_PI);
    if (wrapped < 0) wrapped += 2.0 * M_PI;
    return wrapped - M_PI;
}

// ---------------------------------------------------------------------------
// interp_pairs: time-interpolation of consecutive filtered-CE rows to
// every intermediate OFDM symbol (the time axis of the reference's
// interp2d, tracker_thread.cpp:395-477), for all of a tick's pairs in
// one call.  Row i..i+1 of ce72 [n,144] / the four scalar tracks are
// lerped at the per-symbol time offsets of the (slot, sym) walk from
// sym[i]; alpha_j = t_offset_j / time_diff with the reference's
// per-port/CP time_diff rule.  Writes the emitted rows consecutively;
// returns the row count (= sum of positive pair distances, which the
// caller preallocates).
// ---------------------------------------------------------------------------
int64_t interp_pairs(int64_t n, const double* ce72, const double* tp,
                     const double* sp, const double* spr, const double* npv,
                     const int64_t* slot, const int64_t* sym,
                     int64_t n_symb, int64_t port_gt2, int64_t extended,
                     double fs_lte, double* out_ce, double* out_tp,
                     double* out_sp, double* out_spr, double* out_npv) {
    const double unit = 16.0 / fs_lte;
    int64_t w = 0;
    for (int64_t i = 0; i + 1 < n; i++) {
        int64_t dist = (((slot[i + 1] - slot[i]) % 20 + 20) % 20) * n_symb
                       + (sym[i + 1] - sym[i]);
        if (dist <= 0) continue;
        double time_diff;
        if (port_gt2) time_diff = 0.0005;
        else if (extended) time_diff = (3.0 * (128 + 32)) * unit;
        else if (sym[i] == 0) time_diff = (4.0 * (128 + 9)) * unit;
        else time_diff = (2.0 * (128 + 9) + (128 + 10)) * unit;
        const double* pc = ce72 + 144 * i;
        const double* nc = ce72 + 144 * (i + 1);
        double dtp = tp[i + 1] - tp[i], dsp = sp[i + 1] - sp[i];
        double dspr = spr[i + 1] - spr[i], dnp = npv[i + 1] - npv[i];
        double t_off = 0.0;
        int64_t s = sym[i];
        for (int64_t j = 0; j < dist; j++) {
            double a = t_off / time_diff;
            double* oc = out_ce + 144 * w;
            for (int q = 0; q < 144; q++)
                oc[q] = pc[q] + (nc[q] - pc[q]) * a;
            out_tp[w] = tp[i] + dtp * a;
            out_sp[w] = sp[i] + dsp * a;
            out_spr[w] = spr[i] + dspr * a;
            out_npv[w] = npv[i] + dnp * a;
            w++;
            t_off += (extended ? (128 + 32)
                               : (s == 6 ? (128 + 10) : (128 + 9))) * unit;
            s++;
            if (s == n_symb) s = 0;
        }
    }
    return w;
}

// ---------------------------------------------------------------------------
// port_tick: one call for a port's ENTIRE tick -- every complete RS
// 3-window's statistics + sequential FOE/frame-timing feedback
// (rs_window_update_batch2) immediately followed by the pair
// time-interpolation to intermediate OFDM symbols (interp_pairs),
// carrying the previous tick's last interpolated row across the tick
// boundary.  Fuses what used to be two native calls plus the Python
// concatenate/alloc glue between them (the per-tick analog of the
// reference's per-symbol interp2d chain, tracker_thread.cpp:395-477).
//
// In:  pending raw-CE rows ce [m,24] with labels shift/slot/sym [m] and
//      PDU stamps fo/ft [m]; m >= 3 (nwin = m-2 windows).
// In/out: carry_ce72 [144], carry_scal [4] = {tp, sp, spr, np},
//      carry_label [2] = {slot, sym}, valid iff has_carry (always valid
//      on return); ac_fd/ac_td/hist/hist_pos/regs as batch2.
// Out: emitted rows out_ce [total,144] / out_tp/out_sp/out_spr/out_npv
//      [total] (caller preallocates the exact pair-walk total).
// Returns the emitted row count.
// ---------------------------------------------------------------------------
static int64_t port_tick_core(
    int64_t m, const double* ce, const int64_t* shift, const int64_t* slot,
    const int64_t* sym, const double* fo, const double* ft,
    int64_t has_carry, double* carry_ce72, double* carry_scal,
    int64_t* carry_label, int64_t n_symb, int64_t port_gt2,
    int64_t extended, double fs_lte, double fc_requested,
    double fc_programmed, double fs_programmed, double* ac_fd_state,
    double* ac_td_state, double* hist, int64_t* hist_pos, double* regs,
    int64_t cap_out, double* out_ce, double* out_tp, double* out_sp,
    double* out_spr, double* out_npv, int64_t scal_stride) {
    double fo_reg = regs[0];
    double ft_reg = regs[1];
    const double two_pi = 2.0 * M_PI;
    const double unit = 16.0 / fs_lte;
    double prev72[144], prev_scal[4];
    int64_t prev_slot = 0, prev_sym = 0;
    int have_prev = has_carry != 0;
    if (have_prev) {
        for (int q = 0; q < 144; q++) prev72[q] = carry_ce72[q];
        for (int q = 0; q < 4; q++) prev_scal[q] = carry_scal[q];
        prev_slot = carry_label[0];
        prev_sym = carry_label[1];
    }
    double ce_filt[24], sc[10], cur72[144], cur_scal[4];
    int64_t w = 0;
    for (int64_t i = 0; i + 2 < m; i++) {
        rs_window_update(ce + 24 * i, ce + 24 * (i + 1), ce + 24 * (i + 2),
                         (int)(shift[i] < shift[i + 1]), ce_filt, sc,
                         ac_fd_state, ac_td_state, hist, hist_pos);
        interp72(ce_filt, shift[i + 1], cur72);

        // FOE feedback (tail of cell_tracker._do_foe)
        double k_factor = (fc_requested - fo[i]) / fc_programmed;
        double dt_w = fmod(ft[i + 2] - ft[i] + 9600.0, 19200.0);
        if (dt_w < 0) dt_w += 19200.0;
        double dt = 0.0005 + (dt_w - 9600.0) / (fs_programmed * k_factor);
        double residual_f = atan2(sc[5], sc[4]) / two_pi / dt;
        double rnp = sc[6] / 2.0;
        if (rnp < 0.001) rnp = 0.001;
        double w_old = 1.0 / 0.000001;
        double w_new = 1.0 / rnp;
        fo_reg = (fo_reg * w_old + (fo[i] + residual_f) * w_new)
            / (w_old + w_new);

        // frame-timing feedback (tail of cell_tracker._do_toe_v2)
        double diff = fmod(ft[i + 1] + sc[7] - ft_reg + 9600.0, 19200.0);
        if (diff < 0) diff += 19200.0;
        diff -= 9600.0;
        diff = diff * (1.0 / sc[8]) / (1.0 / 0.0001 + 1.0 / sc[8]);
        ft_reg = fmod(ft_reg + diff, 19200.0);
        if (ft_reg < 0) ft_reg += 19200.0;

        cur_scal[0] = sc[1];   // tp
        cur_scal[1] = sc[3];   // sp
        cur_scal[2] = sc[2];   // sp_raw
        cur_scal[3] = sc[0];   // np
        int64_t cur_slot = slot[i + 1], cur_sym = sym[i + 1];

        if (have_prev) {
            // emit the pair prev -> cur (interp_pairs math)
            int64_t dist = (((cur_slot - prev_slot) % 20 + 20) % 20) * n_symb
                           + (cur_sym - prev_sym);
            if (dist > 0) {
                double time_diff;
                if (port_gt2) time_diff = 0.0005;
                else if (extended) time_diff = (3.0 * (128 + 32)) * unit;
                else if (prev_sym == 0) time_diff = (4.0 * (128 + 9)) * unit;
                else time_diff = (2.0 * (128 + 9) + (128 + 10)) * unit;
                double d_scal[4];
                for (int q = 0; q < 4; q++)
                    d_scal[q] = cur_scal[q] - prev_scal[q];
                double t_off = 0.0;
                int64_t s = prev_sym;
                for (int64_t j = 0; j < dist; j++) {
                    if (w >= cap_out) return -1;   // caller bound too small
                    double a = t_off / time_diff;
                    double* oc = out_ce + 144 * w;
                    for (int q = 0; q < 144; q++)
                        oc[q] = prev72[q] + (cur72[q] - prev72[q]) * a;
                    out_tp[w * scal_stride] = prev_scal[0] + d_scal[0] * a;
                    out_sp[w * scal_stride] = prev_scal[1] + d_scal[1] * a;
                    out_spr[w * scal_stride] = prev_scal[2] + d_scal[2] * a;
                    out_npv[w * scal_stride] = prev_scal[3] + d_scal[3] * a;
                    w++;
                    t_off += (extended ? (128 + 32)
                                       : (s == 6 ? (128 + 10) : (128 + 9)))
                        * unit;
                    s++;
                    if (s == n_symb) s = 0;
                }
            }
        }
        for (int q = 0; q < 144; q++) prev72[q] = cur72[q];
        for (int q = 0; q < 4; q++) prev_scal[q] = cur_scal[q];
        prev_slot = cur_slot;
        prev_sym = cur_sym;
        have_prev = 1;
    }
    for (int q = 0; q < 144; q++) carry_ce72[q] = prev72[q];
    for (int q = 0; q < 4; q++) carry_scal[q] = prev_scal[q];
    carry_label[0] = prev_slot;
    carry_label[1] = prev_sym;
    regs[0] = fo_reg;
    regs[1] = ft_reg;
    return w;
}

int64_t port_tick(int64_t m, const double* ce, const int64_t* shift,
                  const int64_t* slot, const int64_t* sym, const double* fo,
                  const double* ft, int64_t has_carry, double* carry_ce72,
                  double* carry_scal, int64_t* carry_label, int64_t n_symb,
                  int64_t port_gt2, int64_t extended, double fs_lte,
                  double fc_requested, double fc_programmed,
                  double fs_programmed, double* ac_fd_state,
                  double* ac_td_state, double* hist, int64_t* hist_pos,
                  double* regs, double* out_ce, double* out_tp,
                  double* out_sp, double* out_spr, double* out_npv) {
    return port_tick_core(m, ce, shift, slot, sym, fo, ft, has_carry,
                          carry_ce72, carry_scal, carry_label, n_symb,
                          port_gt2, extended, fs_lte, fc_requested,
                          fc_programmed, fs_programmed, ac_fd_state,
                          ac_td_state, hist, hist_pos, regs,
                          INT64_MAX, out_ce, out_tp, out_sp, out_spr,
                          out_npv, 1);
}

// ---------------------------------------------------------------------------
// cell_tick: one call for a CELL's entire tick across all ports -- the
// per-port CRS extraction from the tick's frequency-domain symbols
// (reference tracker_thread.cpp:888-906), pending-row management, and
// the full per-port window pipeline (port_tick_core), ports processed
// in order (so the sequential FOE/frame-timing feedback matches the
// per-port loop exactly).
//
// In:  S [n_new,144] fd symbols; slot_a/sym_a [n_new] labels;
//      fo_a/ft_a [n_new] PDU stamps; shift_table [20*n_symb*4] int64
//      (per-port RS shift, -1 = no RS in that symbol); rs_conj
//      [20*n_symb*24] (conjugated RS table).
// In/out per-port state (stacked on axis 0 = port):
//      pend_* [P,cap(,24)] + pend_cnt [P]; carry_* [P,...] +
//      carry_valid [P]; hist [P,72*24] + hist_pos [P]; shared
//      ac_fd/ac_td/regs as before.
// Out: out_ce [P,cap_out,144], out_scal [P,cap_out,4] packed
//      {tp,sp,spr,np}, out_cnt [P] emitted counts, out_label0 [P,2] the
//      first seq label per port (for the Python-side bootstrap).
// Returns total emitted rows, or -1 if cap/cap_out were exceeded (the
// caller's bounds are sized so this cannot happen; a -1 is a bug trap).
// ---------------------------------------------------------------------------
int64_t cell_tick(
    int64_t n_new, const double* S, const int64_t* slot_a,
    const int64_t* sym_a, const double* fo_a, const double* ft_a,
    const int64_t* shift_table, const double* rs_conj, int64_t n_ports,
    int64_t n_symb, int64_t extended, double fs_lte, double fc_requested,
    double fc_programmed, double fs_programmed, int64_t cap,
    double* pend_ce, int64_t* pend_shift, int64_t* pend_slot,
    int64_t* pend_sym, double* pend_fo, double* pend_ft, int64_t* pend_cnt,
    double* carry_ce72, double* carry_scal, int64_t* carry_label,
    int64_t* carry_valid, double* ac_fd_state, double* ac_td_state,
    double* hist, int64_t* hist_pos, double* regs, int64_t cap_out,
    double* out_ce, double* out_scal, int64_t* out_cnt,
    int64_t* out_label0) {
    int64_t total = 0;
    for (int64_t p = 0; p < n_ports; p++) {
        double* pce = pend_ce + p * cap * 24;
        int64_t* psh = pend_shift + p * cap;
        int64_t* psl = pend_slot + p * cap;
        int64_t* psy = pend_sym + p * cap;
        double* pfo = pend_fo + p * cap;
        double* pft = pend_ft + p * cap;
        int64_t cnt = pend_cnt[p];
        // 1. extract this tick's CRS rows for the port
        for (int64_t i = 0; i < n_new; i++) {
            int64_t sh = shift_table[(slot_a[i] * n_symb + sym_a[i]) * 4 + p];
            if (sh < 0) continue;
            if (cnt >= cap) return -1;
            const double* s_row = S + 144 * i;
            const double* rc = rs_conj + (slot_a[i] * n_symb + sym_a[i]) * 24;
            double* dst = pce + 24 * cnt;
            for (int k = 0; k < 12; k++) {
                Cpx sv = get(s_row, (int)(sh + 6 * k));
                Cpx rv = get(rc, k);
                dst[2 * k] = sv.re * rv.re - sv.im * rv.im;
                dst[2 * k + 1] = sv.re * rv.im + sv.im * rv.re;
            }
            psh[cnt] = sh;
            psl[cnt] = slot_a[i];
            psy[cnt] = sym_a[i];
            pfo[cnt] = fo_a[i];
            pft[cnt] = ft_a[i];
            cnt++;
        }
        // 2. process complete windows
        out_cnt[p] = 0;
        if (cnt >= 3) {
            if (carry_valid[p]) {
                out_label0[2 * p] = carry_label[2 * p];
                out_label0[2 * p + 1] = carry_label[2 * p + 1];
            } else {
                out_label0[2 * p] = psl[1];
                out_label0[2 * p + 1] = psy[1];
            }
            double* oce = out_ce + p * cap_out * 144;
            double* osc = out_scal + p * cap_out * 4;
            int64_t w = port_tick_core(
                cnt, pce, psh, psl, psy, pfo, pft, carry_valid[p],
                carry_ce72 + 144 * p, carry_scal + 4 * p,
                carry_label + 2 * p, n_symb, p > 2, extended, fs_lte,
                fc_requested, fc_programmed, fs_programmed, ac_fd_state,
                ac_td_state, hist + p * 72 * 24, hist_pos + p, regs,
                cap_out, oce, osc, osc + 1, osc + 2, osc + 3, 4);
            if (w < 0) return -1;
            carry_valid[p] = 1;
            out_cnt[p] = w;
            total += w;
            // 3. keep the 2-row pending tail
            for (int64_t r = 0; r < 2; r++) {
                int64_t src = cnt - 2 + r;
                for (int q = 0; q < 24; q++)
                    pce[24 * r + q] = pce[24 * src + q];
                psh[r] = psh[src];
                psl[r] = psl[src];
                psy[r] = psy[src];
                pfo[r] = pfo[src];
                pft[r] = pft[src];
            }
            cnt = 2;
        }
        pend_cnt[p] = cnt;
    }
    return total;
}

// ---------------------------------------------------------------------------
// Tail-biting Viterbi decode for the K=7 (133,171,165) LTE convolutional
// code (reference lte_conv_decode, lte_lib.cpp:538-551 via IT++
// decode_tailbite): all 64 start-state hypotheses in one pass, winner =
// best path with start == end state.  llr [3, n] row-major
// (ln P(0)/P(1)); bits out [n].  Used by the tracker's 40 ms MIB
// re-decode hot path (the jitted JAX decoder stays authoritative for the
// scanner's batched blind decode; parity pinned in tests/test_coding.py).
// ---------------------------------------------------------------------------
static int g_vit_init = 0;
static int g_next_state[64][2];
static double g_out_sign[64][2][3];

static void vit_init() {
    if (g_vit_init) return;
    const int taps_oct[3] = {0133, 0171, 0165};
    int taps[3][7];
    for (int i = 0; i < 3; i++)
        for (int j = 0; j < 7; j++)
            taps[i][j] = (taps_oct[i] >> (6 - j)) & 1;
    for (int s = 0; s < 64; s++) {
        int past[6];
        for (int i = 0; i < 6; i++) past[i] = (s >> (5 - i)) & 1;
        for (int b = 0; b < 2; b++) {
            int window[7];
            window[0] = b;
            for (int i = 0; i < 6; i++) window[i + 1] = past[i];
            for (int i = 0; i < 3; i++) {
                int o = 0;
                for (int j = 0; j < 7; j++) o ^= window[j] & taps[i][j];
                g_out_sign[s][b][i] = o ? -1.0 : 1.0;
            }
            g_next_state[s][b] = (b << 5) | (s >> 1);
        }
    }
    g_vit_init = 1;
}

// sync_snr: the tracker's per-half-frame PSS/SSS sync-channel SNR
// estimate (reference do_pss_sss_sigpower_ce, tracker_thread.cpp:754-820
// incl. the 13/12 smoothing-filter noise de-bias from exp.cpp:40-66).
//
// In:  sss/pss [72 c128] demodulated sync symbols,
//      sss_tab [62 f64] real-valued SSS sequence for this half-frame,
//      pss_conj [62 c128] conjugated PSS frequency sequence.
// Out: scal [4] = {tp, sp, np_est, np_blank}; ce_smooth [62 c128].
void sync_snr(const double* sss, const double* pss, const double* sss_tab,
              const double* pss_conj, double* scal, double* ce_smooth) {
    // blank-subcarrier noise power: 4 x 5-sample mean |.|^2
    double blank = 0.0;
    for (int k = 0; k < 5; k++) {
        int a = 2 * k, b = 2 * (67 + k);
        blank += sss[a] * sss[a] + sss[a + 1] * sss[a + 1]
               + sss[b] * sss[b] + sss[b + 1] * sss[b + 1]
               + pss[a] * pss[a] + pss[a + 1] * pss[a + 1]
               + pss[b] * pss[b] + pss[b + 1] * pss[b + 1];
    }
    blank /= 4.0 * 5.0;

    double ce_s[124], ce_p[124];
    for (int k = 0; k < 62; k++) {
        int i = 2 * (5 + k);
        ce_s[2 * k] = sss[i] * sss_tab[k];
        ce_s[2 * k + 1] = sss[i + 1] * sss_tab[k];
        double hr = pss_conj[2 * k], hi = pss_conj[2 * k + 1];
        ce_p[2 * k] = pss[i] * hr - pss[i + 1] * hi;
        ce_p[2 * k + 1] = pss[i] * hi + pss[i + 1] * hr;
    }
    // 13-tap edge-clamped sliding mean over (ce_s + ce_p) via prefix sums
    double cs[126];
    cs[0] = cs[1] = 0.0;
    for (int k = 0; k < 62; k++) {
        cs[2 * (k + 1)] = cs[2 * k] + ce_s[2 * k] + ce_p[2 * k];
        cs[2 * (k + 1) + 1] = cs[2 * k + 1] + ce_s[2 * k + 1]
                              + ce_p[2 * k + 1];
    }
    double tp = 0.0, r_s = 0.0, r_p = 0.0;
    for (int t = 0; t < 62; t++) {
        int lo = t - 6 < 0 ? 0 : t - 6;
        int hi = t + 6 > 61 ? 61 : t + 6;
        double inv = 1.0 / (2.0 * (hi - lo + 1));
        double re = (cs[2 * (hi + 1)] - cs[2 * lo]) * inv;
        double im = (cs[2 * (hi + 1) + 1] - cs[2 * lo + 1]) * inv;
        ce_smooth[2 * t] = re;
        ce_smooth[2 * t + 1] = im;
        tp += re * re + im * im;
        double dr = re - ce_s[2 * t], di = im - ce_s[2 * t + 1];
        r_s += dr * dr + di * di;
        dr = re - ce_p[2 * t];
        di = im - ce_p[2 * t + 1];
        r_p += dr * dr + di * di;
    }
    tp /= 62.0;
    double np_est = (r_s / 62.0 * 13.0 / 12.0
                     + r_p / 62.0 * 13.0 / 12.0) / 2.0;
    scal[0] = tp;
    scal[1] = tp - np_est / 13.0;
    scal[2] = np_est;
    scal[3] = blank;
}

void viterbi_tailbite(const double* llr, int64_t n, int32_t* bits) {
    vit_init();
    // Each trellis state t has exactly two incoming edges; listing them
    // in (old_state, bit) lexicographic order and breaking metric ties
    // toward the earlier edge reproduces the scan order of the scalar
    // formulation (and the numpy fallback's argmax) exactly.
    static int g_pred_init = 0;
    static uint16_t g_pred[64][2];     // packed (old_state << 1) | bit
    if (!g_pred_init) {
        int fill[64] = {0};
        for (int s = 0; s < 64; s++)
            for (int b = 0; b < 2; b++) {
                int t = g_next_state[s][b];
                g_pred[t][fill[t]++] = (uint16_t)((s << 1) | b);
            }
        g_pred_init = 1;
    }
    // path metrics pm[state][start]: the start axis is the contiguous
    // 64-lane vector axis, so each state's update is two broadcast adds,
    // one compare, one blend over 64 doubles (auto-vectorized)
    double* pm = new double[64 * 64];
    double* pm2 = new double[64 * 64];
    uint8_t* choices = new uint8_t[(size_t)n * 64 * 64];
    for (int i = 0; i < 64 * 64; i++) pm[i] = -1e30;
    for (int s = 0; s < 64; s++) pm[s * 64 + s] = 0.0;

    for (int64_t k = 0; k < n; k++) {
        double gain[64][2];
        for (int s = 0; s < 64; s++)
            for (int b = 0; b < 2; b++)
                gain[s][b] = 0.5 * (g_out_sign[s][b][0] * llr[k]
                                    + g_out_sign[s][b][1] * llr[n + k]
                                    + g_out_sign[s][b][2] * llr[2 * n + k]);
        uint8_t* ch_k = choices + (size_t)k * 64 * 64;
        for (int t = 0; t < 64; t++) {
            int s0 = g_pred[t][0] >> 1, b0 = g_pred[t][0] & 1;
            int s1 = g_pred[t][1] >> 1, b1 = g_pred[t][1] & 1;
            const double* p0 = pm + s0 * 64;
            const double* p1 = pm + s1 * 64;
            double g0 = gain[s0][b0], g1 = gain[s1][b1];
            double* pout = pm2 + t * 64;
            uint8_t* ch = ch_k + t * 64;
            for (int j = 0; j < 64; j++) {
                double m0 = p0[j] + g0;
                double m1 = p1[j] + g1;
                int take1 = m1 > m0;
                pout[j] = take1 ? m1 : m0;
                ch[j] = (uint8_t)take1;
            }
        }
        double* tmp = pm;
        pm = pm2;
        pm2 = tmp;
    }

    int best_start = 0;
    double best = -3e30;
    for (int s = 0; s < 64; s++) {
        if (pm[s * 64 + s] > best) {
            best = pm[s * 64 + s];
            best_start = s;
        }
    }
    int state = best_start;
    for (int64_t k = n - 1; k >= 0; k--) {
        uint16_t e = g_pred[state][
            choices[(size_t)k * 64 * 64 + state * 64 + best_start]];
        bits[k] = (int32_t)(e & 1);
        state = e >> 1;
    }
    delete[] pm;
    delete[] pm2;
    delete[] choices;
}

}  // extern "C"
