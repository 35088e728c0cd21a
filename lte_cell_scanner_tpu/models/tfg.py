"""Time/frequency grid extraction and superfine TOE/FOE/TOC/FOC.

Behavioral contract: reference extract_tfg and tfoec
(/root/reference/src/searcher.cpp:852-1069).

TPU-native design: extract_tfg's per-symbol DFT loop becomes one batched
gather + FFT over all ~854 OFDM symbols; the fractional, k_factor-stretched
symbol positions are planned on host in float64 (exactly the reference's
double math) and handed to the device as integer window starts plus
per-symbol "late" phase-ramp compensations (the reference applies the same
compensation at searcher.cpp:922-931).  tfoec's CRS-based estimators are
reductions over statically-planned RS gathers, so the whole stage stays
jittable with the data-dependent residual_f/delay as device scalars.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..cell import Cell, CpType
from ..constants import FS_LTE
from ..ops.dsp import fshift_ramp
from .rs import RsDl
from .xcorr import round_i

_CN = np.concatenate([np.arange(-36, 0), np.arange(1, 37)])  # used SC offsets


def _phase_comp(late, dtype):
    """exp(-j*2*pi*late/128 * cn) rows for per-symbol timing compensation."""
    late = jnp.asarray(late)
    ang = (-2.0 * np.pi / 128.0) * late[:, None] \
        * jnp.asarray(_CN, late.dtype)[None, :]
    return (jnp.cos(ang) + 1j * jnp.sin(ang)).astype(dtype)


def plan_dft_locations(cell: Cell, fc_requested: float, fc_programmed: float,
                       fs_programmed: float, n_cap: int) -> np.ndarray:
    """Float64 host plan of the fractional DFT positions for 6 frames + 2
    slots of OFDM symbols (reference searcher.cpp:875-920)."""
    k_factor = (fc_requested - cell.freq_fine) / fc_programmed
    s = 16 / FS_LTE * fs_programmed * k_factor
    n_symb_dl = cell.n_symb_dl()
    if cell.cp_type is CpType.NORMAL:
        dft_location = cell.frame_start + 10 * s
    else:
        dft_location = cell.frame_start + 32 * s

    # See if we can advance the frame start by one subframe.
    if dft_location - 0.01 * fs_programmed * k_factor > -0.5:
        dft_location -= 0.01 * fs_programmed * k_factor

    n_ofdm = 6 * 10 * 2 * n_symb_dl + 2 * n_symb_dl
    locs = np.empty(n_ofdm, dtype=np.float64)
    sym_num = 0
    for t in range(n_ofdm):
        locs[t] = dft_location
        if n_symb_dl == 6:
            dft_location += (128 + 32) * s
        else:
            dft_location += (128 + 10) * s if sym_num == 6 else (128 + 9) * s
            sym_num = (sym_num + 1) % 7
    if round_i(locs[-1]) + 127 >= n_cap:
        raise ValueError("capture too short for the time/frequency grid")
    return locs


def _tfg_impl(capbuf, locs_i, late, freq_fine, fs_true):
    """Device half of extract_tfg (one traced program, compiles once
    per (capture length, CP type)): full-capture FOC mixer
    (searcher.cpp:892), windowed gather, batched 128-pt DFTs, and the
    per-symbol fractional-timing phase ramp (searcher.cpp:922-931).
    locs_i [n_ofdm] are the integer window starts; the [n_ofdm, 128]
    gather map is expanded on DEVICE (128x less host->device traffic
    than shipping the map)."""
    dtype = capbuf.dtype
    foc = capbuf * fshift_ramp(capbuf.shape[0], -freq_fine, fs_true,
                               dtype=dtype)
    idx = locs_i[:, None] + jnp.arange(128, dtype=locs_i.dtype)[None, :]
    segs = foc[idx]                                       # [n_ofdm, 128]
    dft_out = jnp.fft.fft(segs, axis=-1) / jnp.sqrt(
        jnp.asarray(128.0, segs.real.dtype))
    tfg = jnp.concatenate([dft_out[:, -36:], dft_out[:, 1:37]], axis=-1)
    return tfg * _phase_comp(late, dtype)


_tfg_core = jax.jit(_tfg_impl)


def _tfg_plan(cell: Cell, n_cap: int, fc_requested: float,
              fc_programmed: float, fs_programmed: float):
    """Host half of extract_tfg: gather indices, fractional-timing
    compensations, timestamps, and the true mixer rate."""
    k_factor = (fc_requested - cell.freq_fine) / fc_programmed
    locs = plan_dft_locations(cell, fc_requested, fc_programmed,
                              fs_programmed, n_cap)
    int_locs = round_i(locs)
    late = int_locs.astype(np.float64) - locs
    return int_locs.astype(np.int32), late, locs, fs_programmed * k_factor


def extract_tfg(cell: Cell, capbuf, fc_requested: float, fc_programmed: float,
                fs_programmed: float) -> Tuple[jnp.ndarray, np.ndarray]:
    """OFDM-demodulate the capture into tfg [n_ofdm, 72] + timestamps.

    The DFT at each (fractional) position is taken at the nearest sample
    and compensated by a per-symbol phase ramp across subcarriers.
    """
    capbuf = jnp.asarray(capbuf)
    locs_i, late, locs, fs_true = _tfg_plan(cell, int(capbuf.shape[0]),
                                            fc_requested, fc_programmed,
                                            fs_programmed)
    tfg = _tfg_core(capbuf, jnp.asarray(locs_i), jnp.asarray(late),
                    cell.freq_fine, fs_true)
    return tfg, locs


def _rs_index_plans(cell: Cell, rs_dl: RsDl, n_ofdm: int):
    """Static (host) gather plans for the CRS used by tfoec."""
    n_symb_dl = cell.n_symb_dl()
    n_slot = n_ofdm // n_symb_dl
    shift0 = rs_dl.get_shift(0, 0, 0)
    shift_mid = rs_dl.get_shift(0, n_symb_dl - 3, 0)
    # rs values per slot for the two RS-bearing symbols (port 0)
    rs0 = np.stack([rs_dl.get_rs(s, 0) for s in range(20)])            # [20,12]
    rs_mid = np.stack([rs_dl.get_rs(s, n_symb_dl - 3) for s in range(20)])
    return n_slot, shift0, shift_mid, rs0, rs_mid


def _tfoec_impl(tfg, ts, rows0, cols0, tab0, rows_mid, cols_mid, tab_mid,
                r1_off, cols1, r1_tab, r2_off, cols2, r2_tab,
                fc_requested, fc_programmed):
    """Device half of tfoec (one traced program, compiles once per
    (n_ofdm, CP type)): superfine FOE from CRS slot-to-slot phase drift,
    FOC with k_factor_residual timestamp rescale, TOE from subcarrier
    k vs k+3 CRS phase, and the TOC phase ramp (searcher.cpp:952-1069).
    All gather indices and expected-RS tables are host-planned args."""
    dtype = tfg.dtype
    rdt = jnp.real(tfg).dtype

    # ---- superfine FOE from CRS phase drift across slots ------------------
    foe = jnp.zeros((), dtype=dtype)
    for rows, cols, tab in ((rows0, cols0, tab0),
                            (rows_mid, cols_mid, tab_mid)):
        r = tfg[rows][:, cols] * jnp.conj(tab).astype(dtype)  # [n_slot, 12]
        foe = foe + jnp.sum(jnp.conj(r[:-1]) * r[1:])
    residual_f = jnp.arctan2(jnp.imag(foe), jnp.real(foe)) \
        / (2 * np.pi) / 0.0005

    # ---- FOC with timestamp rescale by k_factor_residual ------------------
    k_factor_residual = (fc_requested - residual_f) / fc_programmed
    ts = ts.astype(rdt)
    tfg_comp_timestamp = k_factor_residual * ts
    ang = 2 * np.pi * (-residual_f) * tfg_comp_timestamp / (FS_LTE / 16)
    rot = (jnp.cos(ang) + 1j * jnp.sin(ang)).astype(dtype)
    tfg_comp = tfg * rot[:, None]
    late = ts - tfg_comp_timestamp
    tfg_comp = tfg_comp * _phase_comp(late, dtype)

    # ---- TOE by comparing subcarrier k with k+3 across RS symbols ---------
    r1v = tfg_comp[r1_off[:, None], cols1] * jnp.conj(r1_tab).astype(dtype)
    r2v = tfg_comp[r2_off[:, None], cols2] * jnp.conj(r2_tab).astype(dtype)
    toe1 = jnp.sum(jnp.conj(r1v) * r2v)
    toe2 = jnp.sum(jnp.conj(r2v[:, 0:11]) * r1v[:, 1:12])
    toe = toe1 + toe2
    delay = -jnp.arctan2(jnp.imag(toe), jnp.real(toe)) / 3 / (2 * np.pi / 128)

    # ---- TOC --------------------------------------------------------------
    ang = (2 * np.pi / 128) * delay * jnp.asarray(_CN, rdt)
    comp = (jnp.cos(ang) + 1j * jnp.sin(ang)).astype(dtype)
    tfg_comp = tfg_comp * comp[None, :]
    return residual_f, tfg_comp, tfg_comp_timestamp


_tfoec_core = jax.jit(_tfoec_impl)


def _tfoec_plan(cell: Cell, rs_dl: RsDl, n_ofdm: int):
    """Host half of tfoec: every CRS gather index and expected-RS table
    (float64), in _tfoec_impl argument order."""
    n_symb_dl = cell.n_symb_dl()
    n_slot, shift0, shift_mid, rs0, rs_mid = _rs_index_plans(
        cell, rs_dl, n_ofdm)

    slots = np.arange(n_slot)
    slot_mod = slots % 20
    rows0 = slots * n_symb_dl + 0
    rows_mid = slots * n_symb_dl + (n_symb_dl - 3)
    cols0 = shift0 + 6 * np.arange(12)
    cols_mid = shift_mid + 6 * np.arange(12)
    tab0 = rs0[slot_mod]                                   # [n_slot, 12]
    tab_mid = rs_mid[slot_mod]

    nt = 2 * n_slot - 1
    t_arr = np.arange(nt)
    cur_sym = np.where(t_arr & 1, n_symb_dl - 3, 0)
    cur_slot = (t_arr >> 1) % 20
    cur_off = (t_arr >> 1) * n_symb_dl + cur_sym
    cur_shift = np.where(t_arr & 1, shift_mid, shift0)
    nxt = t_arr + 1
    nxt_sym = np.where(nxt & 1, n_symb_dl - 3, 0)
    nxt_slot = (nxt >> 1) % 20
    nxt_off = (nxt >> 1) * n_symb_dl + nxt_sym
    nxt_shift = np.where(nxt & 1, shift_mid, shift0)

    swap = cur_shift >= nxt_shift      # r1 = the smaller-shift symbol
    r1_off = np.where(swap, nxt_off, cur_off)
    r1_shift = np.where(swap, nxt_shift, cur_shift)
    r1_sym = np.where(swap, nxt_sym, cur_sym)
    r1_slot = np.where(swap, nxt_slot, cur_slot)
    r2_off = np.where(swap, cur_off, nxt_off)
    r2_shift = np.where(swap, cur_shift, nxt_shift)
    r2_sym = np.where(swap, cur_sym, nxt_sym)
    r2_slot = np.where(swap, cur_slot, nxt_slot)

    def rs_val(slot_arr, sym_arr):
        # host: gather the known RS values [nt, 12]
        out = np.empty((nt, 12), dtype=np.complex128)
        for i in range(nt):
            out[i] = rs_dl.get_rs(int(slot_arr[i]), int(sym_arr[i]))
        return out

    cols1 = r1_shift[:, None] + 6 * np.arange(12)[None, :]
    cols2 = r2_shift[:, None] + 6 * np.arange(12)[None, :]
    return (rows0, cols0, tab0, rows_mid, cols_mid, tab_mid,
            r1_off, cols1, rs_val(r1_slot, r1_sym),
            r2_off, cols2, rs_val(r2_slot, r2_sym))


def tfoec(cell: Cell, tfg, tfg_timestamp: np.ndarray, fc_requested: float,
          fc_programmed: float, rs_dl: RsDl):
    """Superfine FOE/FOC then TOE/TOC (reference searcher.cpp:952-1069).

    Returns (cell_out, tfg_comp, tfg_comp_timestamp).  Host plans every
    CRS gather (indices + expected RS values in float64); the numerics
    run as one jitted device program (_tfoec_core).
    """
    tfg = jnp.asarray(tfg)
    plan = _tfoec_plan(cell, rs_dl, int(tfg.shape[0]))
    residual_f, tfg_comp, tfg_comp_timestamp = _tfoec_core(
        tfg, jnp.asarray(np.asarray(tfg_timestamp, dtype=np.float64)),
        *(jnp.asarray(a) for a in plan),
        fc_requested, fc_programmed)

    cell_out = cell.evolve(
        freq_superfine=float(cell.freq_fine + np.asarray(residual_f)))
    return cell_out, tfg_comp, np.asarray(tfg_comp_timestamp)
