"""Greedy PSS peak extraction with interference cancellation.

Behavioral contract: the MATLAB reference semantics
(/root/reference/Matlab/peak_search.m:28-75), which the shipped golden
vector test/test_peak_search.it encodes:

- repeatedly take the global max over [3 x 9600] collapsed powers until it
  falls below the chi-squared threshold Z_th1 at that lag;
- refine the reported lag to the strongest single lag within +-ds_comb_arm
  of the (delay-spread-combined) peak (C++ refinement,
  /root/reference/src/searcher.cpp:457-465);
- cancel: (a) the same PSS within +-274 lags, (b) *other* PSS rows within
  +-274 lags when 8 dB below the peak (the C++ loop at searcher.cpp:487-498
  indexes the wrong row -- dead code; MATLAB peak_search.m:64-67 is the
  correct behavior implemented here), (c) everything 12 dB below the peak
  anywhere (CRS self-correlation ghosts).

This is a tiny (3 x 9600) inherently-sequential greedy loop; it runs on
host in numpy, between the two large jitted device stages.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..cell import Cell

_SAME_PSS_CANCEL = 274  # 2 x 137 samples


def peak_search(xc_incoherent_collapsed_pow: np.ndarray,
                xc_incoherent_collapsed_frq: np.ndarray,
                Z_th1: np.ndarray,
                f_search_set: np.ndarray,
                fc_requested: float,
                fc_programmed: float,
                xc_incoherent_single: np.ndarray,
                ds_comb_arm: int,
                refine_slab: np.ndarray = None) -> List[Cell]:
    """Extract PSS candidate cells.

    xc_incoherent_single has layout [3, n_f, 9600] (this framework's lag-last
    convention transposed relative to the reference's [3][9600][n_f]).

    refine_slab [3, 2*arm+1, 9600] (models/xcorr.py lean mode) may stand
    in for xc_incoherent_single: slab[t, d, l] pre-gathers
    xc_single[t, frq[t, l], (l - arm + d) % 9600], the only values the
    refinement below reads -- identical results, ~n_f/(2*arm+1) less
    device->host transfer.
    """
    work = np.array(xc_incoherent_collapsed_pow, dtype=np.float64, copy=True)
    frq = xc_incoherent_collapsed_frq
    cells: List[Cell] = []

    while True:
        peak_n_id_2, peak_ind = np.unravel_index(np.argmax(work), work.shape)
        peak_pow = work[peak_n_id_2, peak_ind]
        if peak_pow < Z_th1[peak_ind]:
            break

        # Refine to the best single lag within +-ds_comb_arm (strict >,
        # first wins on ties -- matches the C++ scan order).
        foi = frq[peak_n_id_2, peak_ind]
        best_pow = -np.inf
        best_ind = -1
        for d, t in enumerate(range(peak_ind - ds_comb_arm,
                                    peak_ind + ds_comb_arm + 1)):
            t_wrap = t % 9600
            v = refine_slab[peak_n_id_2, d, peak_ind] \
                if refine_slab is not None \
                else xc_incoherent_single[peak_n_id_2, foi, t_wrap]
            if v > best_pow:
                best_pow = v
                best_ind = t_wrap

        cells.append(Cell(
            fc_requested=fc_requested,
            fc_programmed=fc_programmed,
            pss_pow=float(peak_pow),
            ind=int(best_ind),
            freq=float(f_search_set[foi]),
            n_id_2=int(peak_n_id_2),
        ))

        window = np.mod(np.arange(peak_ind - _SAME_PSS_CANCEL,
                                  peak_ind + _SAME_PSS_CANCEL + 1), 9600)
        # (a) no same-PSS peaks within the window
        work[peak_n_id_2, window] = 0.0
        # (b) other-PSS peaks in the window survive only if within 8 dB
        thresh8 = peak_pow * 10.0 ** (-8.0 / 10.0)
        for n in range(3):
            if n == peak_n_id_2:
                continue
            sel = window[work[n, window] < thresh8]
            work[n, sel] = 0.0
        # (c) CRS ghost floor: cancel everything 12 dB down
        work[work < peak_pow * 10.0 ** (-12.0 / 10.0)] = 0.0

    return cells


# ---------------------------------------------------------------------------
# Device-resident peak search (round 5): the same greedy loop as a
# traced lax.while_loop, so a band scan downloads ~KB of peak records
# per carrier instead of the [3, 9600] maps + [3, 2*arm+1, 9600]
# refinement slabs (~0.8 MB/carrier -- a measurable share of the
# remote-tunnel wall).  Semantics identical to peak_search above
# (ties: argmax picks the first maximum, matching the host scan order);
# the CAP bounds the while_loop -- the 12 dB floor cancellation makes
# real captures terminate in <= ~25 iterations, and peaks beyond the
# cap would anyway be within 12 dB of the weakest accepted one.
# ---------------------------------------------------------------------------

PEAK_CAP = 40


def peak_search_device_impl(pow_c, frq_c, slab, z_th1, ds_comb_arm: int,
                            cap: int = PEAK_CAP):
    """Traced greedy extraction.  pow_c/frq_c [3, 9600], slab
    [3, 2*arm+1, 9600], z_th1 [9600].  Returns (recs [cap, 4], n):
    rec = (pss_pow, refined_ind, frq_index, n_id_2); rows >= n are
    padding."""
    import jax
    import jax.numpy as jnp

    HALF = 9600
    lags = jnp.arange(HALF)
    rdt = pow_c.dtype

    def body(state):
        work, recs, k, _c = state
        flat = work.reshape(-1)
        i = jnp.argmax(flat)
        t = i // HALF
        lag = i % HALF
        p = flat[i]
        ok = p >= z_th1[lag]

        d = jnp.argmax(slab[t, :, lag])          # first max wins (ties)
        best_ind = (lag - ds_comb_arm + d) % HALF
        rec = jnp.stack([p.astype(rdt),
                         best_ind.astype(rdt),
                         frq_c[t, lag].astype(rdt),
                         t.astype(rdt)])
        recs = jnp.where((jnp.arange(cap) == k)[:, None] & ok,
                         rec[None, :], recs)

        dist = jnp.abs(((lags - lag + HALF // 2) % HALF) - HALF // 2)
        win = dist <= _SAME_PSS_CANCEL
        same = (jnp.arange(3) == t)[:, None]
        th8 = p * jnp.asarray(10.0 ** (-0.8), rdt)
        th12 = p * jnp.asarray(10.0 ** (-1.2), rdt)
        cancel = (same & win[None, :]) \
            | (~same & win[None, :] & (work < th8)) \
            | (work < th12)
        work = jnp.where(ok & cancel, jnp.zeros((), rdt), work)
        k = k + ok.astype(k.dtype)
        return work, recs, k, ok & (k < cap)

    work0 = pow_c
    recs0 = jnp.zeros((cap, 4), rdt)
    state = jax.lax.while_loop(
        lambda s: s[3], body,
        (work0, recs0, jnp.int32(0), jnp.bool_(True)))
    return state[1], state[2]


def cells_from_peak_records(recs: np.ndarray, n: int,
                            f_search_set: np.ndarray, fc_requested: float,
                            fc_programmed: float) -> List[Cell]:
    """Host materialization of peak_search_device_impl's records."""
    cells: List[Cell] = []
    for j in range(int(n)):
        p, ind, foi, t = recs[j]
        cells.append(Cell(
            fc_requested=fc_requested, fc_programmed=fc_programmed,
            pss_pow=float(p), ind=int(round(float(ind))),
            freq=float(f_search_set[int(round(float(foi)))]),
            n_id_2=int(round(float(t)))))
    return cells
