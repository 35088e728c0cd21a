"""PBCH extraction and blind MIB decode.

Behavioral contract: reference pbch_extract / decode_mib
(/root/reference/src/searcher.cpp:1479-1692): channel-estimate all four
ports, then blindly try 4 frame phases x {1,2,4} TX ports; for each
candidate combine (single-port MRC or Alamouti SFBC zero-forcing), QPSK
soft-demodulate, descramble, de-ratematch to 40 coded bits, tail-biting
Viterbi decode, and check CRC16 under the port-count mask.  First success
wins; SFN = mod(sfn_bits*4 - frame_guess, 1024).

TPU-native design: the PBCH RE positions are a static index plan per
(n_symb_dl, v_shift mod 3); all 12 (frame phase, port count) candidates
decode as ONE jitted batch (_mib_candidates), and only the RESULT scan
early-exits in the reference's first-success order.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..cell import Cell, CpType, PhichDuration, PhichResource
from .chan_est import chan_est
from .coding import conv_decode_tailbite, conv_deratematch, crc_matrix
from .modulation import lte_demodulate
from .pn import lte_pn
from .rs import RsDl

_N_RB_TABLE = {0: 6, 1: 15, 2: 25, 3: 50, 4: 75, 5: 100}
_PHICH_RES = {0: PhichResource.ONE_SIXTH, 1: PhichResource.HALF,
              2: PhichResource.ONE, 3: PhichResource.TWO}


@lru_cache(maxsize=8)
def pbch_index_plan(n_symb_dl: int, v_shift_m3: int) -> np.ndarray:
    """[m_bit/2, 2] (symbol row, subcarrier) of PBCH REs over 4 frames.

    Skips positions that may carry CRS: mod(sc,3)==v_shift_m3 on symbols
    0,1 (and 3 for extended CP) -- reference searcher.cpp:1504-1520.
    """
    out = []
    for fr in range(4):
        for sym in range(4):
            for sc in range(72):
                if (sc % 3 == v_shift_m3) and (
                        sym in (0, 1) or (sym == 3 and n_symb_dl == 6)):
                    continue
                row = fr * 10 * 2 * n_symb_dl + n_symb_dl + sym
                out.append((row, sc))
    return np.asarray(out, dtype=np.int64)


def pbch_extract(cell: Cell, tfg, ce_list):
    """Gather PBCH symbols and 4-port channel estimates.

    tfg [n_sym, 72]; ce_list: 4 arrays like tfg.
    Returns (pbch_sym [n_re], pbch_ce [4, n_re]).
    """
    plan = pbch_index_plan(cell.n_symb_dl(), cell.n_id_cell() % 3)
    rows = jnp.asarray(plan[:, 0])
    cols = jnp.asarray(plan[:, 1])
    sym = tfg[rows, cols]
    ce = jnp.stack([c[rows, cols] for c in ce_list])
    return sym, ce


def _combine(pbch_sym, pbch_ce, np_v, n_ports: int):
    """Channel compensation: MRC (1 port) or Alamouti SFBC ZF (2/4 ports).

    Returns (syms, np_per_sym) -- reference searcher.cpp:1567-1612.
    """
    if n_ports == 1:
        h = pbch_ce[0]
        h2 = jnp.real(h) ** 2 + jnp.imag(h) ** 2
        gain = jnp.conj(h / h2.astype(pbch_ce.dtype))
        syms = pbch_sym * gain
        np_out = np_v[0] * (jnp.real(gain) ** 2 + jnp.imag(gain) ** 2)
        return syms, np_out

    n = pbch_sym.shape[0]
    x1 = pbch_sym[0::2]
    x2 = pbch_sym[1::2]
    if n_ports == 2:
        h1 = (pbch_ce[0, 0::2] + pbch_ce[0, 1::2]) / 2
        h2 = (pbch_ce[1, 0::2] + pbch_ce[1, 1::2]) / 2
        np_temp = jnp.broadcast_to((np_v[0] + np_v[1]) / 2, x1.shape)
    else:
        # port pairs (0,2) and (1,3) alternate every 2 REs
        ha1 = (pbch_ce[0, 0::2] + pbch_ce[0, 1::2]) / 2
        ha2 = (pbch_ce[2, 0::2] + pbch_ce[2, 1::2]) / 2
        hb1 = (pbch_ce[1, 0::2] + pbch_ce[1, 1::2]) / 2
        hb2 = (pbch_ce[3, 0::2] + pbch_ce[3, 1::2]) / 2
        even_pair = (jnp.arange(x1.shape[0]) % 2) == 0   # t mod 4 == 0
        h1 = jnp.where(even_pair, ha1, hb1)
        h2 = jnp.where(even_pair, ha2, hb2)
        np_temp = jnp.where(even_pair, (np_v[0] + np_v[2]) / 2,
                            (np_v[1] + np_v[3]) / 2)
    scale = (jnp.real(h1) ** 2 + jnp.imag(h1) ** 2
             + jnp.real(h2) ** 2 + jnp.imag(h2) ** 2)
    s1 = (jnp.conj(h1) * x1 + h2 * jnp.conj(x2)) / scale
    s2 = jnp.conj((-jnp.conj(h2) * x1 + h1 * jnp.conj(x2)) / scale)
    np_out_pair = ((jnp.abs(h1) / scale) ** 2
                   + (jnp.abs(h2) / scale) ** 2) * np_temp
    syms = jnp.stack([s1, s2], axis=1).reshape(n) * np.sqrt(2.0)
    np_out = jnp.stack([np_out_pair, np_out_pair], axis=1).reshape(n)
    return syms, np_out


def _mib_impl(tfg, ce4, np_v, rows, cols, scr_sign, crc_m,
              frame_len_sym: int):
    """All 12 blind candidates (4 frame phases x {1,2,4} ports) decoded
    as one traced program: batched combine -> log-MAP demod ->
    descramble -> de-ratematch -> tail-biting Viterbi -> CRC16.

    ce4: [4 ports, n_sym, 72] channel estimates.
    Returns (c_est [3 port-cfgs, 4 phases, 40] int32 bits,
             crc_calc [3, 4, 16] int32 unmasked parity of bits[:24]).
    """
    offs = jnp.arange(4) * frame_len_sym                 # frame phases
    rows_b = rows[None, :] + offs[:, None]               # [4, n_re]
    pbch_sym = tfg[rows_b, cols[None, :]]                # [4, n_re]
    # [4 phases, 4 ports, n_re]
    pbch_ce = jnp.stack([ce4[i][rows_b, cols[None, :]] for i in range(4)],
                        axis=1)

    def cand(phase_sym, phase_ce, n_ports):
        syms, np_sym = _combine(phase_sym, phase_ce, np_v, n_ports)
        return lte_demodulate(syms, np_sym, "qpsk")

    e_all = jnp.stack([
        jax.vmap(lambda s, c, n=n: cand(s, c, n))(pbch_sym, pbch_ce)
        for n in (1, 2, 4)])                             # [3, 4, m_bit]
    e_all = e_all * scr_sign                             # descramble
    e_flat = e_all.reshape(12, -1)
    d_flat = jax.vmap(lambda e: conv_deratematch(e, 40))(e_flat)
    c_flat = jax.vmap(conv_decode_tailbite)(d_flat)      # [12, 40]
    crc_flat = (c_flat[:, :24] @ crc_m) % 2              # [12, 16]
    return c_flat.reshape(3, 4, 40), crc_flat.reshape(3, 4, -1)


_mib_candidates = partial(jax.jit, static_argnames=("frame_len_sym",))(
    _mib_impl)


def _mib_device_args(cell: Cell):
    """Host plans for _mib_impl beyond tfg/ce4/np_v: (rows, cols,
    scr_sign, crc_m, frame_len_sym)."""
    n_symb_dl = cell.n_symb_dl()
    n_id_cell = cell.n_id_cell()
    frame_len_sym = 10 * 2 * n_symb_dl
    m_bit = 1920 if cell.cp_type is CpType.NORMAL else 1728
    scr = lte_pn(n_id_cell, m_bit).astype(np.float64)
    scr_sign = 1.0 - 2.0 * scr
    crc_m = crc_matrix(24, "crc16").astype(np.int32)
    plan = pbch_index_plan(n_symb_dl, n_id_cell % 3)
    return plan[:, 0], plan[:, 1], scr_sign, crc_m, frame_len_sym


def decode_mib(cell: Cell, tfg, rs_dl: RsDl, interp: str = "hex") -> Cell:
    """Blind MIB decode (reference searcher.cpp:1526-1692).

    All 12 (frame phase, port count) hypotheses decode as ONE jitted
    batch (SURVEY.md section 7 "hard parts"); the reference's
    first-success-wins order (phases outer, ports inner,
    searcher.cpp:1549-1567) is preserved when scanning the results.
    """
    tfg = jnp.asarray(tfg)

    ce_list = []
    np_list = []
    for port in range(4):
        ce, npv = chan_est(cell, rs_dl, tfg, port, interp=interp)
        ce_list.append(ce)
        np_list.append(npv)
    np_v = jnp.stack(np_list)

    rows, cols, scr_sign, crc_m, frame_len_sym = _mib_device_args(cell)
    c_all, crc_all = _mib_candidates(
        tfg, jnp.stack(ce_list), np_v, jnp.asarray(rows), jnp.asarray(cols),
        jnp.asarray(scr_sign), jnp.asarray(crc_m), frame_len_sym)
    return _scan_mib_results(cell, np.asarray(c_all), np.asarray(crc_all))


def _scan_mib_results(cell: Cell, c_all: np.ndarray, crc_all: np.ndarray
                      ) -> Cell:
    """Host scan of the 12 decoded candidates in the reference's
    first-success-wins order (phases outer, ports inner), CRC16 checked
    under the per-port-count mask; unpack the MIB on success
    (searcher.cpp:1628-1686)."""
    for frame_timing_guess in range(4):
        for pi, n_ports in enumerate((1, 2, 4)):
            c_est = c_all[pi, frame_timing_guess]
            crc_calc = crc_all[pi, frame_timing_guess]
            if n_ports == 2:
                crc_calc = crc_calc ^ 1
            elif n_ports == 4:
                crc_calc = crc_calc ^ np.tile([0, 1], 8)
            if np.array_equal(crc_calc, c_est[24:40]):
                bits = c_est
                bw_packed = bits[0] * 4 + bits[1] * 2 + bits[2]
                n_rb_dl = _N_RB_TABLE.get(int(bw_packed), -1)
                phich_dur = PhichDuration.EXTENDED if bits[3] \
                    else PhichDuration.NORMAL
                phich_res = _PHICH_RES[int(bits[4] * 2 + bits[5])]
                sfn_high = 0
                for b in bits[6:14]:
                    sfn_high = (sfn_high << 1) | int(b)
                sfn = (sfn_high * 4 - frame_timing_guess) % 1024
                return cell.evolve(
                    n_ports=n_ports, n_rb_dl=n_rb_dl,
                    phich_duration=phich_dur, phich_resource=phich_res,
                    sfn=int(sfn))
    return cell
