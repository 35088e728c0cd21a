"""Fused decode back half: extract_tfg -> tfoec -> 4-port chan_est ->
blind MIB candidates as ONE device program per peak.

The reference runs these as four separate stages per detected peak
(CellSearch.cpp:542-570); each is already a single jitted core here
(models/tfg.py, chan_est.py, mib.py), and chaining the impls inside one
trace removes the remaining per-stage dispatch round-trips AND lets the
whole chain vmap over peaks: together with the fused SSS+FOE
dispatch (sss_detect.sss_foe_batch_fused), the complete back half of a
capture -- or of an entire band scan (the *_multi variants) -- is TWO
device programs, independent of the peak/carrier count.

Only the hex interpolator (the reference's default chan_est path) is
fused; SearchConfig(interp="freq_time"/"2stage") falls back to the
staged per-peak flow in models/search.py.
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..cell import Cell
from ..ops.boundary import device_complex, safe_jit
from .chan_est import (_chan_est_hex_impl, _hex_device_args_split,
                       hex_plan_compact)
from .coding import crc_matrix
from .mib import _mib_device_args, _mib_impl, _scan_mib_results
from .rs import RsDl
from .tfg import _tfg_impl, _tfg_plan, _tfoec_impl, _tfoec_plan

# argument-tuple arities of the flattened _decode_impl signature
_N_TFOEC = 12
_N_CE = 6          # 5 small per-cell arrays + 1 plan-table id


def _decode_impl(capbuf, locs_i, late, freq_fine, fs_true, ts,
                 *rest):
    """One traced program for the whole decode chain of one peak.

    rest = 12 tfoec plan arrays, fc_requested, fc_programmed,
    port-{0,1}-stacked chan_est args (rows, cols, rs_conj, wl, wr) +
    the pair's interpolation-plan id, the port-{2,3} equivalents,
    mib rows, mib cols, scr_sign, then the SHARED (vmap in_axes=None)
    plan tables idx_t [U, n_ofdm*72, 6] / w_t and crc_m -- the big
    6-tap interpolation plans ride as a deduplicated table indexed by
    the tiny per-cell ids (see chan_est._hex_device_args_split).
    Returns (residual_f, c_est [3,4,40], crc_calc [3,4,16]).
    """
    tf = rest[:_N_TFOEC]
    fc_requested, fc_programmed = rest[_N_TFOEC:_N_TFOEC + 2]
    o = _N_TFOEC + 2
    ce01 = rest[o:o + _N_CE - 1]
    pid01 = rest[o + _N_CE - 1]
    ce23 = rest[o + _N_CE:o + 2 * _N_CE - 1]
    pid23 = rest[o + 2 * _N_CE - 1]
    rows, cols, scr_sign, idx_t, w_t, crc_m = rest[o + 2 * _N_CE:]

    tfg = _tfg_impl(capbuf, locs_i, late, freq_fine, fs_true)
    residual_f, tfg_comp, _ts2 = _tfoec_impl(tfg, ts, *tf, fc_requested,
                                             fc_programmed)

    def ce_pair(pid, *small):
        # pid: [2] plan-table ids (ports of a pair swap shift0/shift1,
        # so each port carries its own id)
        return jax.vmap(
            lambda p_, r, c, rc, wl, wr: _chan_est_hex_impl(
                tfg_comp, r, c, rc, wl, wr, idx_t[p_], w_t[p_]),
            in_axes=(0, 0, 0, 0, 0, 0))(pid, *small)

    ce01_v, np01 = ce_pair(pid01, *ce01)
    ce23_v, np23 = ce_pair(pid23, *ce23)
    ce4 = jnp.concatenate([ce01_v, ce23_v], axis=0)      # [4, n_ofdm, 72]
    np_v = jnp.concatenate([np01, np23])

    # frame_len_sym is a pure function of the (static) symbol count:
    # n_ofdm = (6*10*2 + 2) * n_symb_dl (searcher.cpp:875)
    frame_len_sym = 20 * (locs_i.shape[0] // 122)
    c_all, crc_all = _mib_impl(tfg_comp, ce4, np_v, rows, cols, scr_sign,
                               crc_m, frame_len_sym)
    return residual_f, c_all, crc_all


def _decode_impl_multi(capbufs, ci, *args):
    """_decode_impl against a [C, n_cap] capture stack; ci (traced)
    selects this peak's carrier."""
    return _decode_impl(capbufs[ci], *args)


_decode_single = safe_jit(_decode_impl)
_N_ARGS = 5 + _N_TFOEC + 2 + 2 * _N_CE + 3   # batched args after capbuf


def _pack_decode_outs(outs):
    """One output leaf: this tunnel charges a ~13-50 ms round trip PER
    transferred array regardless of size (measured with cProfile), so
    (residual_f [B], c_all [B,12,40], crc_all [B,12,16]) concatenate
    into a single float matrix; 0/1 code bits are exact in float."""
    import jax.numpy as jnp
    residual_f, c_all, crc_all = outs
    rdt = residual_f.dtype
    b = residual_f.shape[0]
    return jnp.concatenate(
        [residual_f[:, None],
         c_all.reshape(b, -1).astype(rdt),
         crc_all.reshape(b, -1).astype(rdt)], axis=1)


def _unpack_decode_outs(vec: np.ndarray):
    # c_all [B, 3 ports-cfg, 4 phases, 40 bits]; crc_all [.., 16 bits]
    vec = np.asarray(vec)
    nc = 3 * 4 * 40
    residual_f = vec[:, 0]
    c_all = np.rint(vec[:, 1: 1 + nc]).astype(np.int32) \
        .reshape(len(vec), 3, 4, 40)
    crc_all = np.rint(vec[:, 1 + nc:]).astype(np.int32) \
        .reshape(len(vec), 3, 4, 16)
    return residual_f, c_all, crc_all


# trailing (None,)*3: the shared plan tables + the CRC matrix
_decode_batch = safe_jit(lambda *a: _pack_decode_outs(jax.vmap(
    _decode_impl, in_axes=(None,) + (0,) * _N_ARGS + (None,) * 3)(*a)))
_decode_batch_multi = safe_jit(lambda *a: _pack_decode_outs(jax.vmap(
    _decode_impl_multi,
    in_axes=(None, 0) + (0,) * _N_ARGS + (None,) * 3)(*a)))


def _decode_device_inputs(cell: Cell, n_cap: int, fc_requested: float,
                          fc_programmed: float, fs_programmed: float):
    """Per-peak device inputs for _decode_impl: (args, (key01, key23))
    where args holds everything but capbuf, the plan ids/tables, and
    the CRC matrix, with _PID_SLOTS marking where the two plan ids go,
    and the keys identify the port pairs' shared interpolation plans
    (deduplicated + device-cached by the callers via _plan_tables)."""
    rs_dl = RsDl(cell.n_id_cell(), 6, cell.cp_type)
    locs_i, late, locs, fs_true = _tfg_plan(cell, n_cap, fc_requested,
                                            fc_programmed, fs_programmed)
    n_ofdm = int(locs_i.shape[0])
    tf = _tfoec_plan(cell, rs_dl, n_ofdm)
    s01 = [_hex_device_args_split(cell, rs_dl, n_ofdm, p)
           for p in (0, 1)]
    s23 = [_hex_device_args_split(cell, rs_dl, n_ofdm, p)
           for p in (2, 3)]
    ce01 = tuple(np.stack(pair) for pair in zip(s01[0][0], s01[1][0]))
    ce23 = tuple(np.stack(pair) for pair in zip(s23[0][0], s23[1][0]))
    args = ((locs_i, late, cell.freq_fine, fs_true, locs) + tf
            + (fc_requested, fc_programmed) + ce01 + ce23)
    rows, cols, scr_sign, _crc_m, _fl = _mib_device_args(cell)
    return args + (rows, cols, scr_sign), \
        (s01[0][1], s01[1][1], s23[0][1], s23[1][1])


# positions (within the per-cell args tuple above) AFTER which the
# ce01 / ce23 plan ids must be spliced to match _decode_impl's layout:
# head(5) + tfoec(12) + fc(2) + ce01(5) | pid01 | ce23(5) | pid23 | 3
_PID_SLOTS = (5 + _N_TFOEC + 2 + 5, 5 + _N_TFOEC + 2 + 10)


def _splice_pids(args, pid01, pid23):
    a, b = _PID_SLOTS
    return (args[:a] + (pid01,) + args[a:b] + (pid23,) + args[b:])


_plan_dev_cache = {}


def _plan_tables(keys):
    """Stacked device plan tables for a batch's (deduplicated) plan
    keys: (idx_t, w_t, id_of_key).  Each distinct plan's int32/f32
    arrays are device-cached (the upload happens once per shift
    pattern per process, not once per decode call)."""
    uniq = sorted(set(keys))
    cols_i, cols_w, ids = [], [], {}
    for u in uniq:
        hit = _plan_dev_cache.get(u)
        if hit is None:
            i32, w32 = hex_plan_compact(u)
            hit = (jnp.asarray(i32), jnp.asarray(w32))
            if len(_plan_dev_cache) > 24:
                _plan_dev_cache.pop(next(iter(_plan_dev_cache)))
            _plan_dev_cache[u] = hit
        ids[u] = len(cols_i)
        cols_i.append(hit[0])
        cols_w.append(hit[1])
    return jnp.stack(cols_i), jnp.stack(cols_w), ids


@lru_cache(maxsize=1)
def _crc_arg():
    return jnp.asarray(crc_matrix(24, "crc16").astype(np.int32))


def _finish(cell: Cell, residual_f, c_all, crc_all) -> Cell:
    cell = cell.evolve(
        freq_superfine=float(cell.freq_fine + float(np.asarray(residual_f))))
    return _scan_mib_results(cell, np.asarray(c_all), np.asarray(crc_all))


def decode_back_half_fused(cell: Cell, capbuf, fc_requested: float,
                           fc_programmed: float, fs_programmed: float
                           ) -> Cell:
    """Whole decode chain for one SSS-accepted peak as one device call.

    Returns the cell with freq_superfine set, and the MIB fields set
    when one of the 12 blind candidates passes its CRC.
    """
    capbuf = device_complex(capbuf)
    args, keys = _decode_device_inputs(cell, int(capbuf.shape[0]),
                                       fc_requested, fc_programmed,
                                       fs_programmed)
    idx_t, w_t, ids = _plan_tables(keys)
    args = _splice_pids(
        args, np.array([ids[keys[0]], ids[keys[1]]], np.int32),
        np.array([ids[keys[2]], ids[keys[3]]], np.int32))
    out = _decode_single(capbuf, *(device_complex(np.asarray(a))
                                   for a in args), idx_t, w_t,
                         _crc_arg())
    return _finish(cell, *out)


def _bucket(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


def _run_decode_batch(batch_fn, capbuf_args, cells_fc, fs_programmed: float
                      ) -> List[Cell]:
    """Decode a SAME-CP-TYPE group of peaks as one vmapped program
    (padded to a power of two, duplicates discarded)."""
    n_cap = int(capbuf_args[0].shape[-1])
    preps = [_decode_device_inputs(c, n_cap, fcr, fcp, fs_programmed)
             for c, fcr, fcp in cells_fc]
    idx_t, w_t, ids = _plan_tables(
        [k for _, ks in preps for k in ks])
    preps = [_splice_pids(
        a, np.array([ids[ks[0]], ids[ks[1]]], np.int32),
        np.array([ids[ks[2]], ids[ks[3]]], np.int32))
             for a, ks in preps]
    n = len(preps)
    preps_b = preps + [preps[0]] * (_bucket(n) - n)
    stacked = [np.stack([p[i] for p in preps_b])
               for i in range(len(preps_b[0]))]
    out = batch_fn(*capbuf_args, *(device_complex(s) for s in stacked),
                   idx_t, w_t, _crc_arg())
    residual_f, c_all, crc_all = _unpack_decode_outs(out)
    return [_finish(c, residual_f[i], c_all[i], crc_all[i])
            for i, (c, _, _) in enumerate(cells_fc)]


def decode_back_half_batch(cells: Sequence[Cell], capbuf,
                           fc_requested: float, fc_programmed: float,
                           fs_programmed: float) -> List[Cell]:
    """Decode every accepted peak of one capture, grouped by CP type
    (the two CP types have different grid shapes), each group one
    vmapped device program."""
    return _decode_grouped(
        cells, lambda group: _run_decode_batch(
            _decode_batch, (device_complex(capbuf),),
            [(c, fc_requested, fc_programmed) for c, _ in group],
            fs_programmed))


def decode_back_half_batch_multi(cells: Sequence[Cell], capbufs,
                                 carrier_idx: Sequence[int],
                                 fs_programmed: float) -> List[Cell]:
    """Band-scan variant: capbufs [C, n_cap] + per-peak carrier index
    (see sss_detect_batch_multi)."""
    capbufs = device_complex(capbufs)

    def run(group):
        n = len(group)
        ci = np.asarray([carrier_idx[i] for _, i in group]
                        + [carrier_idx[group[0][1]]] * (_bucket(n) - n),
                        dtype=np.int64)
        return _run_decode_batch(
            _decode_batch_multi, (capbufs, jnp.asarray(ci)),
            [(c, c.fc_requested, c.fc_programmed) for c, _ in group],
            fs_programmed)

    return _decode_grouped(cells, run)


# Max peaks per fused-decode dispatch.  The hex-CE interpolation gather
# materializes an HLO temp of [peaks, ports, n_ofdm*72, 6] whose 6-wide
# lane axis pads 21x on TPU (~60 MB/peak); 64 peaks bound it to ~4 GB of
# HBM temp (measured: 128-peak dispatches OOM a 16 GB chip at 23 GB).
# Groups beyond the cap decode as consecutive same-shape dispatches.
_DECODE_CHUNK = 64


def _decode_grouped(cells: Sequence[Cell], run) -> List[Cell]:
    """Group (cell, original_index) pairs by CP type, chunk each group
    to _DECODE_CHUNK peaks per dispatch, and restore original order."""
    if not cells:
        return []
    groups = {}
    for i, c in enumerate(cells):
        groups.setdefault(c.cp_type, []).append((c, i))
    out: List[Optional[Cell]] = [None] * len(cells)
    for group in groups.values():
        for k in range(0, len(group), _DECODE_CHUNK):
            chunk = group[k: k + _DECODE_CHUNK]
            for (c_out, (_, i)) in zip(run(chunk), chunk):
                out[i] = c_out
    return out  # type: ignore[return-value]
