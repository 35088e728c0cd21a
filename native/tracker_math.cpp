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

}  // extern "C"
