"""Channel estimation over the time/frequency grid, per antenna port.

Behavioral contract: reference chan_est + the three interchangeable
interpolators ce_interp_freq_time / ce_interp_2stage / ce_interp_hex
(/root/reference/src/searcher.cpp:1087-1477).

TPU-native design: the raw CE extraction and the 7-point hexagonal
filtering are shifted-add array ops on device.  The Delaunay-like triangle
interpolation over the hex RS lattice is geometry-only: the plane through
three vertices evaluated at an RE is a fixed linear (barycentric)
combination of the vertex values, and the edge-extension vertices are
themselves fixed linear combinations of two real RS samples.  So the whole
interpolator collapses to a precomputed sparse linear map (<= 6 taps per
RE), built once per (grid geometry) on host by walking the reference's
triangle strip, then applied on device as one gather + weighted sum.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..cell import Cell
from .rs import RsDl


def _rs_sets(n_symb_dl: int, n_ofdm: int, port: int) -> np.ndarray:
    """OFDM symbols bearing CRS for this port (reference searcher.cpp:1383-92)."""
    if port <= 1:
        a = np.arange(0, n_ofdm, n_symb_dl)
        b = np.arange(n_symb_dl - 3, n_ofdm, n_symb_dl)
        return np.sort(np.concatenate([a, b]))
    return np.arange(1, n_ofdm, n_symb_dl)


def _raw_ce_plan(cell: Cell, rs_dl: RsDl, n_ofdm: int, port: int):
    """Host-side gather plan for the raw CE extraction, cached per
    (RsDl, n_ofdm, port): (rows [n_rs], cols [n_rs,12], rs_vals
    [n_rs,12] complex, rs_set, shifts)."""
    cache = getattr(rs_dl, "_ce_plans", None)
    if cache is None:
        cache = rs_dl._ce_plans = {}
    key = (n_ofdm, port)
    if key in cache:
        return cache[key]
    n_symb_dl = rs_dl.n_symb_dl
    rs_set = _rs_sets(n_symb_dl, n_ofdm, port)
    n_rs = len(rs_set)
    shifts = np.empty(n_rs, dtype=np.int64)
    rs_vals = np.empty((n_rs, 12), dtype=np.complex128)
    slot_num = 0
    for t in range(n_rs):
        sym_num = int(rs_set[t] % n_symb_dl)
        shifts[t] = rs_dl.get_shift(slot_num % 20, sym_num, port)
        rs_vals[t] = rs_dl.get_rs(slot_num, sym_num)
        if (t % 2 == 1) or (port >= 2):
            slot_num = (slot_num + 1) % 20
    rows = np.asarray(rs_set, dtype=np.int64)
    cols = shifts[:, None] + 6 * np.arange(12)[None, :]
    cache[key] = (rows, cols, rs_vals, rs_set, shifts)
    return cache[key]


def _extract_raw_ce(cell: Cell, rs_dl: RsDl, tfg, port: int):
    """ce_raw [n_rs_ofdm, 12] and the two alternating comb shifts."""
    n_ofdm = int(tfg.shape[0])
    rows, cols, rs_vals, rs_set, shifts = _raw_ce_plan(
        cell, rs_dl, n_ofdm, port)
    raw = tfg[jnp.asarray(rows)[:, None], jnp.asarray(cols)]
    raw = raw * jnp.conj(jnp.asarray(rs_vals, dtype=tfg.dtype))
    return raw, rs_set, shifts


def _hex_window_weights(n_rs: int, shift0: int, shift1: int):
    """Per-OUTPUT-row adjacent-window membership (wl, wr): whether the
    window applied to rows t-1 and t+1 includes subcarrier offset k-1 /
    k+1.  Reference searcher.cpp:1444-1453: the full 3-wide window when
    the two combs coincide; otherwise the bracketing pair, chosen by the
    OUTPUT row's current_row_leftmost (initialized shift(0)<shift(1),
    flipped per row).  The center tap k is always included."""
    if shift0 == shift1:
        wl = np.ones(n_rs)
        wr = np.ones(n_rs)
    else:
        leftmost = (np.arange(n_rs) % 2 == 0) == (shift0 < shift1)
        wl = leftmost.astype(np.float64)        # leftmost row -> {k-1, k}
        wr = 1.0 - wl                           # else          -> {k, k+1}
    return wl, wr


def _hex_filter(ce_raw, shift0: int, shift1: int):
    """7-point hex-lattice averaging (reference searcher.cpp:1421-1467)."""
    wl, wr = _hex_window_weights(int(ce_raw.shape[0]), shift0, shift1)
    return _hex_filter_weighted(ce_raw, jnp.asarray(wl), jnp.asarray(wr))


def _hex_filter_weighted(ce_raw, wl, wr):
    """7-point hex-lattice averaging; wl/wr give each OUTPUT row's
    adjacent-row window (see _hex_window_weights).

    Same-row neighbors are always k-1,k,k+1; the window applied to the
    adjacent rows is selected by the output row, exactly as the
    reference's per-t `ind` is reused for both t-1 and t+1
    (searcher.cpp:1444-1462).  All sums are shifted adds with edge
    clipping.
    """
    rdt = ce_raw.real.dtype
    wl = wl[:, None].astype(rdt)
    wr = wr[:, None].astype(rdt)
    z = jnp.zeros_like(ce_raw[:, :1])
    left = jnp.concatenate([z, ce_raw[:, :-1]], axis=1)     # ce_raw[t,k-1]
    right = jnp.concatenate([ce_raw[:, 1:], z], axis=1)     # ce_raw[t,k+1]
    ones = jnp.ones(ce_raw.shape, rdt)
    zl = jnp.concatenate([jnp.zeros_like(ones[:, :1]), ones[:, :-1]], axis=1)
    zr = jnp.concatenate([ones[:, 1:], jnp.zeros_like(ones[:, :1])], axis=1)

    same = left + ce_raw + right
    same_n = zl + 1.0 + zr

    zrow = jnp.zeros_like(ce_raw[:1])
    prev_rows = jnp.concatenate([zrow, ce_raw[:-1]], axis=0)
    nxt_rows = jnp.concatenate([ce_raw[1:], zrow], axis=0)

    def windowed(rows):
        l = jnp.concatenate([jnp.zeros_like(rows[:, :1]), rows[:, :-1]],
                            axis=1)
        r = jnp.concatenate([rows[:, 1:], jnp.zeros_like(rows[:, :1])],
                            axis=1)
        return wl * l + rows + wr * r

    # tap counts of the adjacent window per output row (edge-clipped),
    # zeroed where the adjacent row does not exist
    adj_n = wl * zl + 1.0 + wr * zr
    n_rs = ce_raw.shape[0]
    has_prev = jnp.concatenate([jnp.zeros((1, 1), rdt),
                                jnp.ones((n_rs - 1, 1), rdt)])
    has_nxt = jnp.concatenate([jnp.ones((n_rs - 1, 1), rdt),
                               jnp.zeros((1, 1), rdt)])

    total = same + windowed(prev_rows) + windowed(nxt_rows)
    n_total = same_n + adj_n * has_prev + adj_n * has_nxt
    return total / n_total


@lru_cache(maxsize=32)
def _hex_interp_plan(n_ofdm: int, n_symb_dl: int, shift0: int, shift1: int,
                     port_class: int) -> Tuple[np.ndarray, np.ndarray]:
    """Sparse plan for ce_interp_hex: (indices [n_ofdm*72, 6],
    weights [n_ofdm*72, 6]) into the flattened ce_filt [n_rs*12].

    Walks the reference triangle-strip algorithm (searcher.cpp:1223-1362)
    over geometry only, accumulating barycentric weights; edge-extension
    vertices (searcher.cpp:1200-1213) are expanded into their two source
    samples.
    """
    rs_set = _rs_sets(n_symb_dl, n_ofdm, 2 if port_class else 0)
    n_rs = len(rs_set)

    idx_out = np.zeros((n_ofdm, 72, 6), dtype=np.int64)
    w_out = np.zeros((n_ofdm, 72, 6), dtype=np.float64)

    def row_vertices(t: int):
        """x positions + taps of row t, extended to cover sc 0 and 71.

        Returns (xs, taps) where taps[i] = list of (flat ce_filt index,
        weight) pairs defining vertex i's value.
        """
        sh = shift0 if t % 2 == 0 else shift1
        xs = list(range(sh, 72, 6))
        taps = [[(t * 12 + i, 1.0)] for i in range(len(xs))]
        if xs[0] != 0:
            # val0 - x0*(val1-val0)/(x1-x0)
            x0, x1 = xs[0], xs[1]
            a = -x0 / (x1 - x0)
            taps.insert(0, [(t * 12 + 0, 1.0 - a), (t * 12 + 1, a)])
            xs.insert(0, 0)
        if xs[-1] != 71:
            n = len([x for x in range(sh, 72, 6)])
            x_last, x_prev = xs[-1], xs[-2]
            a = (71 - x_last) / (x_last - x_prev)
            taps.append([(t * 12 + n - 1, 1.0 + a), (t * 12 + n - 2, -a)])
            xs.append(71)
        return np.array(xs, dtype=np.float64), taps

    def set_re(sym: int, sc: int, combo):
        # combo: list of (flat index, weight); merge duplicates, keep <= 6
        acc = {}
        for i, w in combo:
            acc[i] = acc.get(i, 0.0) + w
        items = sorted(acc.items())
        assert len(items) <= 6
        for j, (i, w) in enumerate(items):
            idx_out[sym, sc, j] = i
            w_out[sym, sc, j] = w

    for t in range(n_rs - 1):
        top_x, top_taps = row_vertices(t)
        bot_x, bot_taps = row_vertices(t + 1)
        y_top = float(rs_set[t])
        y_bot = float(rs_set[t + 1])

        if t == 0:
            # first RS row: 1-D linear interp along frequency
            for sc in range(72):
                j = int(np.searchsorted(top_x, sc, side="right")) - 1
                j = min(max(j, 0), len(top_x) - 2)
                x0, x1 = top_x[j], top_x[j + 1]
                a = (sc - x0) / (x1 - x0)
                combo = [(i, w * (1 - a)) for i, w in top_taps[j]] + \
                        [(i, w * a) for i, w in top_taps[j + 1]]
                set_re(rs_set[0], sc, combo)

        # initial triangle (searcher.cpp:1258-1282)
        if top_x[1] < bot_x[1]:
            tri = [(top_x[0], y_top, top_taps[0]),
                   (bot_x[0], y_bot, bot_taps[0]),
                   (top_x[1], y_top, top_taps[1])]
            top_used, bot_used = 1, 0
        else:
            tri = [(bot_x[0], y_bot, bot_taps[0]),
                   (top_x[0], y_top, top_taps[0]),
                   (bot_x[1], y_bot, bot_taps[1])]
            top_used, bot_used = 0, 1

        spacing = int(rs_set[t + 1] - rs_set[t])
        x_offset = np.zeros(spacing + 1, dtype=np.int64)
        while True:
            (x1v, y1v, tp1), (x2v, y2v, tp2), (x3v, y3v, tp3) = tri
            M = np.array([[x1v, y1v, 1.0], [x2v, y2v, 1.0], [x3v, y3v, 1.0]])
            Minv = np.linalg.inv(M)
            # rightmost edge: through vertices 1 and 2 (0-based: tri[1],tri[2])
            a_l = (x2v - x3v) / (y2v - y3v)
            b_l = (y2v * x3v - y3v * x2v) / (y2v - y3v)
            for r in range(1, spacing + 1):
                y = rs_set[t] + r
                while x_offset[r] <= a_l * y + b_l:
                    x = float(x_offset[r])
                    lam = np.array([x, float(y), 1.0]) @ Minv
                    combo = [(i, w * lam[0]) for i, w in tp1] \
                        + [(i, w * lam[1]) for i, w in tp2] \
                        + [(i, w * lam[2]) for i, w in tp3]
                    set_re(int(y), int(x), combo)
                    x_offset[r] += 1
            if x_offset[1] == 72 and x_offset[-1] == 72:
                break
            if y3v == y_top:
                bot_used += 1
                new = (bot_x[bot_used], y_bot, bot_taps[bot_used])
            else:
                top_used += 1
                new = (top_x[top_used], y_top, top_taps[top_used])
            tri = [tri[1], tri[2], new]

    # rows before first / after last RS row copy the nearest RS row
    for sym in range(int(rs_set[0])):
        idx_out[sym] = idx_out[rs_set[0]]
        w_out[sym] = w_out[rs_set[0]]
    for sym in range(int(rs_set[-1]) + 1, n_ofdm):
        idx_out[sym] = idx_out[rs_set[-1]]
        w_out[sym] = w_out[rs_set[-1]]

    return idx_out.reshape(-1, 6), w_out.reshape(-1, 6)


def ce_interp_hex(ce_filt, rs_set, shifts, n_ofdm: int, n_symb_dl: int,
                  port: int):
    """Triangle-plane interpolation to the full grid, as a sparse matmul."""
    idx, w = _hex_interp_plan(n_ofdm, n_symb_dl, int(shifts[0]),
                              int(shifts[1]), 1 if port >= 2 else 0)
    flat = ce_filt.reshape(-1)
    vals = flat[jnp.asarray(idx)] * jnp.asarray(w, ce_filt.real.dtype)
    return jnp.sum(vals, axis=-1).reshape(n_ofdm, 72)


def ce_interp_2stage(ce_filt, rs_set, shifts, n_ofdm: int):
    """Uniform-grid 2-stage interpolation (reference searcher.cpp:1125-1196).

    Stage 1 synthesizes the missing staggered lattice points by 4-neighbor
    averaging, giving a uniform grid with 3-subcarrier spacing; stage 2 is
    separable linear interpolation in frequency then time.
    """
    from ..ops.dsp import interp1
    n_rs = ce_filt.shape[0]
    shift0, shift1 = int(shifts[0]), int(shifts[1])
    min_shift = min(shift0, shift1)

    # neighbor sums with edge masking, vectorized over the [n_rs, 12] grid
    up = jnp.concatenate([jnp.zeros_like(ce_filt[:1]), ce_filt[:-1]], axis=0)
    up_n = np.concatenate([[0.0], np.ones(n_rs - 1)])
    down = jnp.concatenate([ce_filt[1:], jnp.zeros_like(ce_filt[:1])], axis=0)
    down_n = np.concatenate([np.ones(n_rs - 1), [0.0]])

    row_leftmost = (np.arange(n_rs) % 2 == 0) == (shift0 < shift1)
    cols = []
    for k in range(24):
        half = k >> 1
        # synthesized at this k when (k&1) == current_row_leftmost
        is_synth = jnp.asarray((k % 2) == row_leftmost.astype(int))
        total = up[:, half] + down[:, half]
        count = up_n + down_n
        if (k - 1) >> 1 >= 0:
            total = total + ce_filt[:, (k - 1) >> 1]
            count = count + 1
        if (k + 1) >> 1 < 12:
            total = total + ce_filt[:, (k + 1) >> 1]
            count = count + 1
        avg = total / jnp.asarray(count, ce_filt.real.dtype)
        cols.append(jnp.where(is_synth, avg, ce_filt[:, half]))
    exp = jnp.stack(cols, axis=1)

    exp_x = jnp.asarray(np.arange(min_shift, 72, 3, dtype=np.float64)[:24])
    x_all = jnp.arange(72.0)
    rows = [interp1(exp_x, exp[t], x_all) for t in range(n_rs)]
    frq = jnp.stack(rows)
    t_all = jnp.arange(float(n_ofdm))
    cols = [interp1(jnp.asarray(rs_set.astype(np.float64)), frq[:, c], t_all)
            for c in range(72)]
    return jnp.stack(cols, axis=1)


def ce_interp_freq_time(ce_filt, rs_set, shifts, n_ofdm: int):
    """1-D frequency interpolation then 1-D time interpolation
    (reference searcher.cpp:1089-1119)."""
    from ..ops.dsp import interp1
    n_rs = ce_filt.shape[0]
    x_all = jnp.arange(72.0)
    rows = []
    for t in range(n_rs):
        X = jnp.asarray(np.arange(shifts[t % 2], 72, 6, dtype=np.float64))
        rows.append(interp1(X, ce_filt[t], x_all))
    frq = jnp.stack(rows)
    t_all = jnp.arange(float(n_ofdm))
    cols = [interp1(jnp.asarray(rs_set.astype(np.float64)), frq[:, c], t_all)
            for c in range(72)]
    return jnp.stack(cols, axis=1)


def _chan_est_hex_impl(tfg, rows, cols, rs_conj, wl, wr, idx, w):
    """Whole device chain for the hex interpolator as ONE traced
    program: raw-CE gather -> 7-point hex filter -> noise estimate ->
    sparse triangle-plane interpolation.  Compiles once per (n_ofdm,
    port class) shape; all cell-dependent data arrives as arrays."""
    raw = tfg[rows[:, None], cols] * rs_conj.astype(tfg.dtype)
    ce_filt = _hex_filter_weighted(raw, wl, wr)
    resid = ce_filt - raw
    np_est = jnp.mean(jnp.real(resid) ** 2 + jnp.imag(resid) ** 2)
    # gather TRANSPOSED ([6, n_points] instead of [n_points, 6]) so the
    # 6-wide plan axis lands on TPU sublanes: the [n, 6] layout pads
    # its lane axis 128/6 = 21x, which at band scale made this gather
    # the decode program's dominant HBM temp (~60 MB/peak, measured
    # OOM at 128-peak dispatches)
    vals = ce_filt.reshape(-1)[idx.T] * w.T.astype(raw.real.dtype)
    n_ofdm = idx.shape[0] // 72
    return jnp.sum(vals, axis=0).reshape(n_ofdm, 72), np_est


_chan_est_hex_core = jax.jit(_chan_est_hex_impl)


def _hex_device_args(cell: Cell, rs_dl: RsDl, n_ofdm: int, port: int):
    """Host plans for _chan_est_hex_impl (everything but tfg), as numpy
    arrays: (rows, cols, rs_conj, wl, wr, idx6, w6)."""
    (rows, cols, rs_conj, wl, wr), key = _hex_device_args_split(
        cell, rs_dl, n_ofdm, port)
    idx, w = _hex_interp_plan(*key)
    return (rows, cols, rs_conj, wl, wr,
            idx.reshape(-1, 6), w.reshape(-1, 6))


def _hex_device_args_split(cell: Cell, rs_dl: RsDl, n_ofdm: int,
                           port: int):
    """(small per-cell args (rows, cols, rs_conj, wl, wr), plan_key).

    The 6-tap interpolation plan -- the ~12 MB [n_ofdm*72, 6] idx/w
    pair -- depends ONLY on plan_key = (n_ofdm, n_symb_dl, shift0,
    shift1, port_class): both ports of a class share it, and so does
    every cell with the same v-shift (n_id_cell mod 6).  Callers dedup
    by key and ship ONE device copy per distinct plan instead of one
    per (cell, port) -- the decode batch's upload drops from ~24 MB per
    cell to ~3 MB per distinct shift pattern (hex_plan_compact)."""
    n_symb_dl = rs_dl.n_symb_dl
    rows, cols, rs_vals, rs_set, shifts = _raw_ce_plan(
        cell, rs_dl, n_ofdm, port)
    wl, wr = _hex_window_weights(len(rs_set), int(shifts[0]),
                                 int(shifts[1]))
    key = (n_ofdm, n_symb_dl, int(shifts[0]), int(shifts[1]),
           1 if port >= 2 else 0)
    return (rows, cols, np.conj(rs_vals), wl, wr), key


@lru_cache(maxsize=16)
def hex_plan_compact(key):
    """The interpolation plan of a _hex_device_args_split key in its
    device wire format: (idx int32 [n_ofdm*72, 6], w float32).  int32/
    f32 halve the transfer; the device impl computes in f32 anyway
    (w.astype(tfg.real.dtype)) and the flat ce_filt index fits int32
    with 5 orders of margin."""
    idx, w = _hex_interp_plan(*key)
    return (np.ascontiguousarray(idx.reshape(-1, 6).astype(np.int32)),
            np.ascontiguousarray(w.reshape(-1, 6).astype(np.float32)))


def chan_est(cell: Cell, rs_dl: RsDl, tfg, port: int,
             interp: str = "hex"):
    """Port CE: raw extraction, hex filtering, noise estimate, interpolation.

    Returns (ce_tfg [n_ofdm, 72], np scalar) --
    reference chan_est (searcher.cpp:1369-1477).
    """
    tfg = jnp.asarray(tfg)
    n_ofdm = int(tfg.shape[0])
    if interp == "hex":
        args = _hex_device_args(cell, rs_dl, n_ofdm, port)
        return _chan_est_hex_core(tfg, *(jnp.asarray(a) for a in args))
    ce_raw, rs_set, shifts = _extract_raw_ce(cell, rs_dl, tfg, port)
    ce_filt = _hex_filter(ce_raw, int(shifts[0]), int(shifts[1]))
    resid = ce_filt - ce_raw
    np_est = jnp.mean(jnp.real(resid) ** 2 + jnp.imag(resid) ** 2)
    if interp == "freq_time":
        ce_tfg = ce_interp_freq_time(ce_filt, rs_set, shifts, n_ofdm)
    elif interp == "2stage":
        ce_tfg = ce_interp_2stage(ce_filt, rs_set, shifts, n_ofdm)
    else:
        raise ValueError(f"unknown interpolator {interp!r}")
    return ce_tfg, np_est
