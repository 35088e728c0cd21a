"""Per-cell tracking: demod, CE filtering, FOE/TOE feedback, MIB re-decode.

Behavioral contract: the reference tracker thread
(/root/reference/src/tracker_thread.cpp): get_fd (:91-174), filter_ce
(:176-202), do_foe (:204-243), do_toe_v2 (:245-279), do_ac_fd (:318-340),
do_ac_td (:343-370), interp72/interp2d (:372-477), pbch_extract_rt /
do_mib_decode (:494-749), do_pss_sss_sigpower_ce (:754-820), and the main
per-OFDM-symbol loop (:823-1068).

Re-design: one TrackedCellProcessor object per cell, driven by the event
loop with batches of symbol PDUs; the per-cell thread + FIFO/condvar
machinery becomes plain deques.  The small per-symbol math (12-subcarrier
vectors) runs in numpy float64 on host, exactly mirroring the reference's
double math; the heavy front-end (the searcher) stays on device.
"""

from __future__ import annotations

import math
from collections import deque
from typing import Deque, List, Optional

import numpy as np

from ..cell import CpType
from ..constants import CELL_DROP_THRESHOLD, FS_LTE
from ..models.coding import crc_parity
from ..models.pn import lte_pn
from ..models.pss import PSS_FD
from ..models.rs import RsDl
from ..models.sss import SSS_FD
from .batched import _CN, n_samp_elapsed_of
from .producer import SymbolPdu
from .state import GlobalState, TrackedCell


def _wrap(x, lo, hi):
    return (x - lo) % (hi - lo) + lo


def _sigpower(v):
    return float(np.mean(np.abs(v) ** 2))


class _RsPdu:
    __slots__ = ("shift", "slot_num", "sym_num", "ce", "fo", "ft")

    def __init__(self, shift, slot_num, sym_num, ce, fo, ft):
        self.shift = shift
        self.slot_num = slot_num
        self.sym_num = sym_num
        self.ce = ce
        self.fo = fo
        self.ft = ft


class _FiltPdu:
    __slots__ = ("shift", "slot_num", "sym_num", "tp", "sp", "sp_raw", "np",
                 "ce_filt", "ce72")

    def __init__(self, **kw):
        self.ce72 = None          # lazily cached _interp72 of ce_filt
        for k, v in kw.items():
            setattr(self, k, v)


class _ChunkFifo:
    """FIFO of interpolated-CE rows stored as array chunks.

    Replaces the reference's per-symbol ce_interp FIFO entries
    (tracker_thread.cpp ce_interp_fifo): each element is one OFDM
    symbol's (ce[72], tp, sp, sp_raw, np), but appended and popped as
    whole [n, ...] array chunks so the streaming hot path never builds
    per-symbol Python objects."""

    __slots__ = ("chunks", "n")

    def __init__(self):
        self.chunks: Deque = deque()
        self.n = 0

    def append(self, ce, tp, sp, sp_raw, npv) -> None:
        self.chunks.append((ce, tp, sp, sp_raw, npv))
        self.n += len(tp)

    def pop_n(self, k: int):
        """Pop the first k symbols as one (ce[k,72], tp[k], sp[k],
        sp_raw[k], np[k]) tuple."""
        parts = []
        need = k
        while need > 0:
            chunk = self.chunks[0]
            m = len(chunk[1])
            if m <= need:
                parts.append(self.chunks.popleft())
                need -= m
            else:
                parts.append(tuple(a[:need] for a in chunk))
                self.chunks[0] = tuple(a[need:] for a in chunk)
                need = 0
        self.n -= k
        if len(parts) == 1:
            return parts[0]
        return tuple(np.concatenate([p[i] for p in parts])
                     for i in range(5))


class TrackedCellProcessor:
    """Processes one tracked cell's symbol stream."""

    def __init__(self, cell: TrackedCell, state: GlobalState):
        self.cell = cell
        self.state = state
        self.rs_dl = RsDl(cell.n_id_cell, 6, cell.cp_type)
        self._rs_conj = np.conj(self.rs_dl.rs_table)
        m_bit = 1920 if cell.cp_type is CpType.NORMAL else 1728
        self.scr = lte_pn(cell.n_id_cell, m_bit)
        self.slot_num = 0
        self.sym_num = 0
        self.bulk_phase_offset = 0.0
        n_ports = cell.n_ports
        self.data_fifo: Deque = deque()
        self.ce_raw_fifo: List[Deque[_RsPdu]] = [deque() for _ in range(n_ports)]
        self.ce_filt_fifo: List[Deque[_FiltPdu]] = [deque() for _ in range(n_ports)]
        self.ce_interp_fifo: List[_ChunkFifo] = [_ChunkFifo() for _ in range(n_ports)]
        self.ce_interp_init = [False] * n_ports
        self._alpha_cache = {}
        self.ce_history = [(np.zeros((72, 12), np.complex128),
                            np.zeros(1, np.int64))
                           for _ in range(n_ports)]
        self.mib_fifo: Deque = deque()
        self.mib_fifo_synchronized = False
        self._pbch_keep = None
        self.sss_sym: Optional[np.ndarray] = None
        # native per-RS-window numerics (native/tracker_math.cpp),
        # numpy fallback when the library is unavailable
        from ..io.native import get_lib
        self._native = get_lib()
        self._scalars = np.zeros(10, np.float64)

    # ------------------------------------------------------------------
    def _get_fd(self, pdu: SymbolPdu) -> np.ndarray:
        """FOC + DFT + 72-SC extraction + timing/bulk-phase compensation
        (reference get_fd, tracker_thread.cpp:91-174)."""
        st = self.state
        fo = pdu.frequency_offset
        k_factor = (st.fc_requested - fo) / st.fc_programmed
        data = pdu.data * np.exp(
            -1j * 2 * np.pi * fo * np.arange(128)
            / (st.fs_programmed * k_factor))
        dft_in = np.roll(data, -2)
        dft_out = np.fft.fft(dft_in) / np.sqrt(128.0)
        syms = np.concatenate([dft_out[-36:], dft_out[1:37]])

        n_samp_elapsed = n_samp_elapsed_of(
            pdu.sym_num, self.cell.cp_type is CpType.EXTENDED)
        self.bulk_phase_offset = _wrap(
            self.bulk_phase_offset
            + 2 * np.pi * n_samp_elapsed * (16 / FS_LTE) * -fo,
            -np.pi, np.pi)
        comp = np.exp(1j * (self.bulk_phase_offset
                            - 2 * np.pi * pdu.late / 128 * _CN))
        return syms * comp

    # ------------------------------------------------------------------
    def _filter_ce(self, prev: _RsPdu, curr: _RsPdu, nxt: _RsPdu):
        """3-symbol hex filtering (reference filter_ce), vectorized:
        the clamped neighbor-window sums are 'same'-mode convolutions
        (out-of-range taps contribute 0, counts tracked separately)."""
        one3 = np.ones(3)
        cur_sum = np.convolve(curr.ce, one3, "same")       # [t-1, t+1] clamped
        n_cur = np.convolve(np.ones(12), one3, "same")
        pn = prev.ce + nxt.ce
        if prev.shift < curr.shift:
            # window [t, t+1]
            side = pn + np.concatenate([pn[1:], [0.0]])
            n_side = np.concatenate([np.full(11, 2.0), [1.0]])
        else:
            # window [t-1, t]
            side = pn + np.concatenate([[0.0], pn[:-1]])
            n_side = np.concatenate([[1.0], np.full(11, 2.0)])
        return (cur_sum + side) / (n_cur + 2 * n_side)

    def _do_foe(self, prev: _RsPdu, nxt: _RsPdu, np_curr: float,
                ce_filt: np.ndarray) -> None:
        st = self.state
        foe = np.conj(prev.ce) * nxt.ce
        cf2 = np.abs(ce_filt) ** 2
        foe_np = np_curr * np_curr + 2 * np_curr * cf2
        weight = cf2 / foe_np
        foe_comb = np.sum(foe * weight)
        foe_comb_np = np.sum(foe_np * weight * weight)
        scale = 1.0 / np.sum(cf2 * weight)
        foe_comb *= scale
        foe_comb_np *= scale * scale

        fo = prev.fo
        k_factor = (st.fc_requested - fo) / st.fc_programmed
        dt = 0.0005 + _wrap(nxt.ft - prev.ft, -9600.0, 9600.0) \
            / (st.fs_programmed * k_factor)
        residual_f = np.angle(foe_comb) / (2 * np.pi) / dt
        residual_f_np = max(foe_comb_np / 2, 0.001)
        st.blend_frequency_offset(fo + residual_f, residual_f_np)

    def _do_toe_v2(self, prev: _RsPdu, curr: _RsPdu, sp: float,
                   np_curr: float) -> None:
        if prev.shift < curr.shift:
            a, b = prev.ce, curr.ce
        else:
            a, b = curr.ce, prev.ce
        toe1 = np.sum(np.conj(a) * b) / 12
        toe2 = (np.sum(np.conj(b[0:5]) * a[1:6])
                + np.sum(np.conj(b[6:11]) * a[7:12])) / 10
        toe1 /= np.sqrt(sp)
        toe2 /= np.sqrt(sp)
        delay = -(np.angle(toe1) + np.angle(toe2)) / 2 / 3 / (2 * np.pi / 128)
        delay_np = max(np_curr / sp / 2 / 12, 0.001)
        diff = _wrap((curr.ft + delay) - self.cell.frame_timing,
                     -9600.0, 9600.0)
        diff = diff * (1 / delay_np) / (1 / 0.0001 + 1 / delay_np)
        self.cell.update_frame_timing(self.cell.frame_timing + diff)

    def _do_ac_fd(self, curr: _RsPdu, sp: float, np_curr: float) -> None:
        ce = curr.ce
        # ac[d] = mean(conj(ce[:12-d]) * ce[d:]) via one correlation
        # (np.correlate conjugates its second argument)
        full = np.correlate(ce, ce, "full")        # full[11+d] = sum_t ce[t+d] conj(ce[t])
        counts = np.arange(12.0, 0.0, -1.0)
        ac = full[11:] / counts / sp
        ac_np = (np_curr ** 2 / sp ** 2 + 2 * np_curr / sp) / counts
        w_old = 1 / 0.00001
        self.cell.ac_fd = (self.cell.ac_fd * w_old + ac / ac_np) \
            / (w_old + 1.0 / ac_np)

    def _do_ac_td(self, curr: _RsPdu, sp: float, hist) -> None:
        """72-symbol time autocorrelation over a preallocated ring
        (reference do_ac_td, tracker_thread.cpp:343-370)."""
        buf, pos = hist
        buf[pos[0] % 72] = curr.ce
        pos[0] += 1
        if pos[0] >= 72:
            # chronological view: oldest..newest, then reverse for lags
            order = (pos[0] + np.arange(72)) % 72
            h = buf[order]                        # [72, 12] oldest-first
            last = h[71]
            xc = (h[::-1] @ np.conj(last)) / 12 / sp
            w_old = 1 / 0.00001
            self.cell.ac_td = (self.cell.ac_td * w_old + xc) / (w_old + 1)

    # ------------------------------------------------------------------
    def _rs_window_native(self, port: int, prev: _RsPdu, curr: _RsPdu,
                          nxt: _RsPdu) -> None:
        """One native call for the whole RS-window update: filter_ce,
        powers, FOE/TOE statistics, and the ac_fd/ac_td state blends
        (native/tracker_math.cpp rs_window_update); only the global
        feedback applications stay here, identical to _do_foe/_do_toe_v2."""
        c = self.cell
        st = self.state
        p_ce = np.ascontiguousarray(prev.ce, dtype=np.complex128)
        c_ce = np.ascontiguousarray(curr.ce, dtype=np.complex128)
        n_ce = np.ascontiguousarray(nxt.ce, dtype=np.complex128)
        ce_filt = np.empty(12, np.complex128)
        buf, pos = self.ce_history[port]
        sc = self._scalars
        self._native.rs_window_update(
            p_ce.ctypes.data, c_ce.ctypes.data, n_ce.ctypes.data,
            1 if prev.shift < curr.shift else 0,
            ce_filt.ctypes.data, sc.ctypes.data,
            c.ac_fd.ctypes.data, c.ac_td.ctypes.data,
            buf.ctypes.data, pos.ctypes.data)
        np_curr, tp_curr, sp_raw, sp_curr = sc[0], sc[1], sc[2], sc[3]
        self.ce_filt_fifo[port].append(_FiltPdu(
            shift=curr.shift, slot_num=curr.slot_num, sym_num=curr.sym_num,
            tp=tp_curr, sp=sp_curr, sp_raw=sp_raw, np=np_curr,
            ce_filt=ce_filt))

        # FOE feedback (tail of _do_foe)
        foe_comb = complex(sc[4], sc[5])
        fo = prev.fo
        k_factor = (st.fc_requested - fo) / st.fc_programmed
        dt = 0.0005 + _wrap(nxt.ft - prev.ft, -9600.0, 9600.0) \
            / (st.fs_programmed * k_factor)
        residual_f = np.angle(foe_comb) / (2 * np.pi) / dt
        residual_f_np = max(sc[6] / 2, 0.001)
        st.blend_frequency_offset(fo + residual_f, residual_f_np)

        # frame-timing feedback (tail of _do_toe_v2)
        delay, delay_np = sc[7], sc[8]
        diff = _wrap((curr.ft + delay) - c.frame_timing, -9600.0, 9600.0)
        diff = diff * (1 / delay_np) / (1 / 0.0001 + 1 / delay_np)
        c.update_frame_timing(c.frame_timing + diff)

    # ------------------------------------------------------------------
    def _rs_windows_batch_native(self, port: int, windows) -> None:
        """All of a tick's RS windows for one port in ONE native call
        (rs_window_update_batch), then the sequential feedback
        applications -- identical results to per-window calls since
        every window's statistics depend only on its own PDUs."""
        c = self.cell
        st = self.state
        n = len(windows)
        prev_b = np.ascontiguousarray(
            np.stack([w[0].ce for w in windows]), dtype=np.complex128)
        curr_b = np.ascontiguousarray(
            np.stack([w[1].ce for w in windows]), dtype=np.complex128)
        next_b = np.ascontiguousarray(
            np.stack([w[2].ce for w in windows]), dtype=np.complex128)
        left_b = np.ascontiguousarray(
            [1 if w[0].shift < w[1].shift else 0 for w in windows],
            dtype=np.int64)
        ce_filt = np.empty((n, 12), np.complex128)
        scalars = np.empty((n, 10), np.float64)
        buf, pos = self.ce_history[port]
        self._native.rs_window_update_batch(
            n, prev_b.ctypes.data, curr_b.ctypes.data, next_b.ctypes.data,
            left_b.ctypes.data, ce_filt.ctypes.data, scalars.ctypes.data,
            c.ac_fd.ctypes.data, c.ac_td.ctypes.data,
            buf.ctypes.data, pos.ctypes.data)

        fifo = self.ce_filt_fifo[port]
        fc_req, fc_prog = st.fc_requested, st.fc_programmed
        fs_prog = st.fs_programmed
        # feedback applications stay sequential in window order; pure
        # scalar float math (this runs once per RS symbol per port)
        sc_list = scalars.tolist()
        two_pi = 2 * math.pi
        for i, (prev, curr, nxt) in enumerate(windows):
            sc = sc_list[i]
            fifo.append(_FiltPdu(
                shift=curr.shift, slot_num=curr.slot_num,
                sym_num=curr.sym_num, tp=sc[1], sp=sc[3], sp_raw=sc[2],
                np=sc[0], ce_filt=ce_filt[i]))
            # FOE feedback (tail of _do_foe)
            fo = prev.fo
            k_factor = (fc_req - fo) / fc_prog
            dt = 0.0005 + ((nxt.ft - prev.ft + 9600.0) % 19200.0 - 9600.0) \
                / (fs_prog * k_factor)
            residual_f = math.atan2(sc[5], sc[4]) / two_pi / dt
            st.blend_frequency_offset(fo + residual_f, max(sc[6] / 2, 0.001))
            # frame-timing feedback (tail of _do_toe_v2)
            diff = ((curr.ft + sc[7]) - c.frame_timing + 9600.0) \
                % 19200.0 - 9600.0
            diff = diff * (1 / sc[8]) / (1 / 0.0001 + 1 / sc[8])
            c.update_frame_timing(c.frame_timing + diff)

    # ------------------------------------------------------------------
    def _interp72(self, pdu: _FiltPdu) -> np.ndarray:
        """Linear 12 -> 72 interpolation with edge extrapolation
        (reference interp72, tracker_thread.cpp:372-393), vectorized:
        segment k(t) advances when t passes the right knot shift+6(k+1)."""
        if self._native is not None:
            y = np.ascontiguousarray(pdu.ce_filt, np.complex128)
            out = np.empty(72, np.complex128)
            self._native.interp72(y.ctypes.data, int(pdu.shift),
                                  out.ctypes.data)
            return out
        t = np.arange(72)
        y = pdu.ce_filt
        k = np.clip(np.ceil((t - pdu.shift) / 6.0).astype(np.int64) - 1,
                    0, 10)
        l_x = pdu.shift + 6 * k
        return (y[k + 1] - y[k]) / 6.0 * (t - l_x) + y[k]

    def _alphas(self, port: int, prev: _FiltPdu, curr: _FiltPdu
                ) -> np.ndarray:
        """Interpolation weights for the intermediate symbols between two
        consecutive RS symbols (reference interp2d's time axis,
        tracker_thread.cpp:395-477).  The (slot, sym) step walk depends
        only on (port>2, prev.sym_num, symbol distance), so the weight
        vector is computed once per pattern and cached."""
        n_symb = self.cell.n_symb_dl()
        dist = ((curr.slot_num - prev.slot_num) % 20) * n_symb \
            + (curr.sym_num - prev.sym_num)
        key = (port > 2, prev.sym_num, dist)
        al = self._alpha_cache.get(key)
        if al is not None:
            return al
        ext = self.cell.cp_type is CpType.EXTENDED
        if port > 2:
            time_diff = 0.0005
        elif ext:
            time_diff = 3 * (128 + 32) * (16 / FS_LTE)
        elif prev.sym_num == 0:
            time_diff = 4 * (128 + 9) * (16 / FS_LTE)
        else:
            time_diff = (2 * (128 + 9) + (128 + 10)) * (16 / FS_LTE)
        offsets = []
        time_offset = 0.0
        sym_num = prev.sym_num
        for _ in range(max(dist, 0)):
            offsets.append(time_offset)
            if ext:
                time_offset += (128 + 32) * (16 / FS_LTE)
            else:
                time_offset += ((128 + 10) if sym_num == 6 else (128 + 9)) \
                    * (16 / FS_LTE)
            sym_num += 1
            if sym_num == n_symb:
                sym_num = 0
        al = np.asarray(offsets) / time_diff
        self._alpha_cache[key] = al
        return al

    def _interp2d_batch(self, port: int) -> None:
        """Time-interpolate ALL complete filt pairs of this tick into one
        array chunk (same math as per-pair, batched; each RS symbol's
        72-SC interpolation computed once and cached on the pdu)."""
        filt = self.ce_filt_fifo[port]
        if len(filt) < 2:
            return
        pdus = list(filt)
        for _ in range(len(pdus) - 1):
            filt.popleft()
        for p in pdus:
            if p.ce72 is None:
                p.ce72 = self._interp72(p)

        alphas = []
        pair_lens = []
        for i in range(len(pdus) - 1):
            al = self._alphas(port, pdus[i], pdus[i + 1])
            alphas.append(al)
            pair_lens.append(len(al))
        alpha = np.concatenate(alphas) if alphas else np.empty(0)
        if len(alpha) == 0:
            return
        pidx = np.repeat(np.arange(len(pdus) - 1), pair_lens)

        ce72 = np.stack([p.ce72 for p in pdus])
        tp = np.array([p.tp for p in pdus])
        sp = np.array([p.sp for p in pdus])
        spr = np.array([p.sp_raw for p in pdus])
        npv = np.array([p.np for p in pdus])

        prev_ce = ce72[pidx]
        ce_rows = prev_ce + (ce72[1:][pidx] - prev_ce) * alpha[:, None]
        tp_rows = tp[pidx] + (tp[1:] - tp[:-1])[pidx] * alpha
        sp_rows = sp[pidx] + (sp[1:] - sp[:-1])[pidx] * alpha
        spr_rows = spr[pidx] + (spr[1:] - spr[:-1])[pidx] * alpha
        np_rows = npv[pidx] + (npv[1:] - npv[:-1])[pidx] * alpha

        if not self.ce_interp_init[port]:
            # bootstrap: repeat the first CE back to slot 0 sym 0
            # (the first emitted symbol IS the first pair's prev label)
            self.ce_interp_init[port] = True
            n_symb = self.cell.n_symb_dl()
            boot = pdus[0].slot_num * n_symb + pdus[0].sym_num
            if boot:
                ce_rows = np.concatenate(
                    [np.broadcast_to(ce_rows[0], (boot, 72)), ce_rows])
                tp_rows = np.concatenate([np.full(boot, tp_rows[0]), tp_rows])
                sp_rows = np.concatenate([np.full(boot, sp_rows[0]), sp_rows])
                spr_rows = np.concatenate(
                    [np.full(boot, spr_rows[0]), spr_rows])
                np_rows = np.concatenate([np.full(boot, np_rows[0]), np_rows])

        self.ce_interp_fifo[port].append(ce_rows, tp_rows, sp_rows,
                                         spr_rows, np_rows)

    # ------------------------------------------------------------------
    def _do_pss_sss_sigpower_ce(self, syms, slot_num, sym_num) -> None:
        c = self.cell
        n_symb = c.n_symb_dl()
        if slot_num not in (0, 10) or sym_num not in (n_symb - 2, n_symb - 1):
            return
        if sym_num == n_symb - 2:
            self.sss_sym = syms
            return
        if self.sss_sym is None:
            return
        sss_sym = self.sss_sym
        pss_sym = syms
        np_blank = (_sigpower(sss_sym[0:5]) + _sigpower(sss_sym[67:72])
                    + _sigpower(pss_sym[0:5]) + _sigpower(pss_sym[67:72])) / 4
        sss_tab = SSS_FD()[c.n_id_1, c.n_id_2, 0 if slot_num == 0 else 1]
        ce_sss = sss_sym[5:67] * sss_tab.astype(np.float64)
        ce_pss = pss_sym[5:67] * np.conj(PSS_FD()[c.n_id_2])
        # 13-tap clamped sliding mean over both estimates, via prefix
        # sums: sum[lo..hi] = cs[hi+1] - cs[lo] with lo/hi railed to the
        # band edges (identical to the reference's scalar window loop)
        cs = np.zeros(63, dtype=np.complex128)
        np.cumsum(ce_sss + ce_pss, out=cs[1:])
        t = np.arange(62)
        lo = np.maximum(0, t - 6)
        hi = np.minimum(61, t + 6)
        ce_smooth = (cs[hi + 1] - cs[lo]) / (2.0 * (hi - lo + 1))
        np_est = (_sigpower(ce_smooth - ce_sss) * 13 / 12
                  + _sigpower(ce_smooth - ce_pss) * 13 / 12) / 2
        tp = _sigpower(ce_smooth)
        sp = tp - np_est / 13
        c.sync_tp, c.sync_sp, c.sync_np, c.sync_np_blank = \
            tp, sp, np_est, np_blank
        c.sync_ce = np.concatenate([np.zeros(5), ce_smooth, np.zeros(5)])
        if np.isnan(c.sync_sp_av):
            c.sync_tp_av, c.sync_sp_av = tp, sp
            c.sync_np_av, c.sync_np_blank_av = np_est, np_blank
        else:
            c.sync_tp_av = 0.999 * c.sync_tp_av + 0.001 * tp
            c.sync_sp_av = 0.999 * c.sync_sp_av + 0.001 * sp
            c.sync_np_av = 0.999 * c.sync_np_av + 0.001 * np_est
            c.sync_np_blank_av = 0.999 * c.sync_np_blank_av + 0.001 * np_blank

    # ------------------------------------------------------------------
    def _mib_try_decode(self) -> bool:
        """Attempt the 4-frame blind MIB re-decode once 16 PBCH symbols
        are queued; returns False if the cell should be dropped
        (reference do_mib_decode, tracker_thread.cpp:531-749)."""
        from ..models.coding import conv_decode_tailbite, conv_deratematch
        from ..models.modulation import lte_demodulate
        import jax.numpy as jnp

        c = self.cell
        if len(self.mib_fifo) != 16:
            return True

        n_ports = c.n_ports
        v3 = c.n_id_cell % 3
        n_symb = c.n_symb_dl()
        keep = self._pbch_keep
        if keep is None:
            # [16, 72] RE-selection mask: skip possible-RS positions
            # (sc % 3 == v_shift_m3) in CRS-bearing symbols
            symn = np.arange(16) % 4
            rs_sym = (symn <= 1) | ((symn == 3) & (n_symb == 6))
            keep = ~(rs_sym[:, None]
                     & (np.arange(72)[None, :] % 3 == v3))
            keep = self._pbch_keep = keep.reshape(-1)
        syms16 = np.stack([e[0] for e in self.mib_fifo])     # [16, 72]
        ce16 = np.stack([e[1] for e in self.mib_fifo])       # [16, P, 72]
        np16 = np.stack([e[3] for e in self.mib_fifo])       # [16, P]
        pbch_sym = syms16.reshape(-1)[keep]
        pbch_ce = ce16.transpose(1, 0, 2).reshape(n_ports, -1)[:, keep]
        pbch_np = np.repeat(np16.T, 72, axis=1)[:, keep]

        if n_ports == 1:
            h = pbch_ce[0]
            gain = np.conj(h / np.abs(h) ** 2)
            syms_mib = pbch_sym * gain
            np_mib = pbch_np[0] * np.abs(gain) ** 2
        else:
            x1 = pbch_sym[0::2]
            x2 = pbch_sym[1::2]
            if n_ports == 2:
                h1 = (pbch_ce[0, 0::2] + pbch_ce[0, 1::2]) / 2
                h2 = (pbch_ce[1, 0::2] + pbch_ce[1, 1::2]) / 2
                np_t = (pbch_np[0, 0::2] + pbch_np[1, 0::2]) / 2
            else:
                even = np.arange(len(x1)) % 2 == 0
                h1 = np.where(even, (pbch_ce[0, 0::2] + pbch_ce[0, 1::2]) / 2,
                              (pbch_ce[1, 0::2] + pbch_ce[1, 1::2]) / 2)
                h2 = np.where(even, (pbch_ce[2, 0::2] + pbch_ce[2, 1::2]) / 2,
                              (pbch_ce[3, 0::2] + pbch_ce[3, 1::2]) / 2)
                np_t = np.where(even,
                                (pbch_np[0, 0::2] + pbch_np[2, 0::2]) / 2,
                                (pbch_np[1, 0::2] + pbch_np[3, 0::2]) / 2)
            scale = np.abs(h1) ** 2 + np.abs(h2) ** 2
            s1 = (np.conj(h1) * x1 + h2 * np.conj(x2)) / scale
            s2 = np.conj((-np.conj(h2) * x1 + h1 * np.conj(x2)) / scale)
            syms_mib = np.stack([s1, s2], 1).reshape(-1) * np.sqrt(2)
            np_pair = (np.abs(h1) / scale) ** 2 * np_t \
                + (np.abs(h2) / scale) ** 2 * np_t
            np_mib = np.stack([np_pair, np_pair], 1).reshape(-1)

        e_est = np.asarray(lte_demodulate(jnp.asarray(syms_mib),
                                          jnp.asarray(np_mib), "qpsk"))
        e_est = e_est * (1.0 - 2.0 * self.scr.astype(np.float64))
        d_est = conv_deratematch(jnp.asarray(e_est), 40)
        c_est = np.asarray(conv_decode_tailbite(d_est))
        crc_est = crc_parity(c_est[:24].astype(np.uint8), "crc16")
        if n_ports == 2:
            crc_est = crc_est ^ 1
        elif n_ports == 4:
            crc_est = crc_est ^ np.tile([0, 1], 8)

        bw_map = {0: 6, 1: 15, 2: 25, 3: 50, 4: 75, 5: 100}
        bw = int(c_est[0] * 4 + c_est[1] * 2 + c_est[2])
        n_rb_ok = bw_map.get(bw, 0) == c.n_rb_dl
        phich_dur_ok = bool(c_est[3]) == \
            (c.phich_duration.value == "extended")
        res = int(c_est[4] * 2 + c_est[5])
        res_ok = res == {"1/6": 0, "1/2": 1, "one": 2, "two": 3}[
            c.phich_resource.value]

        if np.array_equal(crc_est, c_est[24:40]) and n_rb_ok \
                and phich_dur_ok and res_ok:
            self.mib_fifo_synchronized = True
            c.mib_decode_failures = 0.0
            for _ in range(16):
                self.mib_fifo.popleft()
        elif self.mib_fifo_synchronized:
            c.mib_decode_failures += 1
            for _ in range(16):
                self.mib_fifo.popleft()
        else:
            c.mib_decode_failures += 0.25
            for _ in range(4):
                self.mib_fifo.popleft()

        if c.mib_decode_failures >= CELL_DROP_THRESHOLD:
            c.kill_me = True
            return False
        return True

    # ------------------------------------------------------------------
    def process(self, pdus: Deque[SymbolPdu],
                fd_syms: Optional[np.ndarray] = None) -> None:
        """Consume all pending symbol PDUs (one reference loop iteration
        per PDU, tracker_thread.cpp:856-1067).

        fd_syms, when given, carries the precomputed frequency-domain
        symbols for the first len(fd_syms) PDUs (the batched device
        get_fd, tracker/batched.py); the host _get_fd is skipped and
        bulk_phase_offset is assumed already advanced.
        """
        c = self.cell
        n_ports = c.n_ports
        n_symb_dl = c.n_symb_dl()
        fd_idx = 0

        # Phase A -- ingest every pending PDU: frequency-domain symbols
        # into data_fifo, CRS extraction into the per-port raw fifos.
        # The (slot, sym) labels are a running symbol counter, and the
        # CRS REs of all new symbols extract as one gather per port
        # against the precomputed shift/RS tables.
        new_rows: List[np.ndarray] = []
        fos: List[float] = []
        fts: List[float] = []
        host_fd = False
        while pdus and not c.kill_me:
            pdu = pdus.popleft()
            if fd_syms is not None and fd_idx < len(fd_syms):
                new_rows.append(fd_syms[fd_idx])
                fd_idx += 1
            else:
                new_rows.append(self._get_fd(pdu))
                host_fd = True
            fos.append(pdu.frequency_offset)
            fts.append(pdu.frame_timing)
        n_new = len(new_rows)
        if n_new:
            start = self.slot_num * n_symb_dl + self.sym_num
            k = start + np.arange(n_new)
            slots_a = (k // n_symb_dl) % 20
            syms_a = k % n_symb_dl
            end = start + n_new
            self.slot_num = (end // n_symb_dl) % 20
            self.sym_num = end % n_symb_dl
            if not host_fd and n_new == len(fd_syms):
                S = np.asarray(fd_syms)
            else:
                S = np.stack(new_rows)
            for i in range(n_new):
                self.data_fifo.append(
                    (int(slots_a[i]), int(syms_a[i]), S[i]))
            sh_all = self.rs_dl.shift_table[slots_a, syms_a]   # [n, 4]
            cols12 = 6 * np.arange(12)
            for port in range(n_ports):
                sh = sh_all[:, port]
                sel = np.nonzero(sh >= 0)[0]
                if len(sel) == 0:
                    continue
                shv = sh[sel].astype(np.int64)
                ce_raw = np.take_along_axis(
                    S[sel], shv[:, None] + cols12[None, :], 1) \
                    * self._rs_conj[slots_a[sel], syms_a[sel]]
                fifo = self.ce_raw_fifo[port]
                for j, i in enumerate(sel):
                    fifo.append(_RsPdu(
                        int(shv[j]), int(slots_a[i]), int(syms_a[i]),
                        ce_raw[j], fos[i], fts[i]))

        # Phase B -- per port, process every complete 3-window this tick
        # (the statistics of each window depend only on its own PDUs, so
        # the tick's windows run as ONE native batch; the FOE/TOE
        # feedback applications stay sequential in window order).
        for port in range(n_ports):
            raw = self.ce_raw_fifo[port]
            windows = []
            while len(raw) >= 3:
                windows.append((raw[0], raw[1], raw[2]))
                raw.popleft()
            if not windows:
                continue
            if self._native is not None:
                self._rs_windows_batch_native(port, windows)
                continue
            for prev, curr, nxt in windows:
                ce_filt = self._filter_ce(prev, curr, nxt)
                np_curr = _sigpower(curr.ce - ce_filt) * 7 / 6
                tp_curr = _sigpower(ce_filt)
                sp_raw = tp_curr - np_curr / 7
                sp_curr = max(1e-5, sp_raw)
                self.ce_filt_fifo[port].append(_FiltPdu(
                    shift=curr.shift, slot_num=curr.slot_num,
                    sym_num=curr.sym_num, tp=tp_curr, sp=sp_curr,
                    sp_raw=sp_raw, np=np_curr, ce_filt=ce_filt))
                self._do_foe(prev, nxt, np_curr, ce_filt)
                self._do_toe_v2(prev, curr, sp_curr, np_curr)
                self._do_ac_fd(curr, sp_curr, np_curr)
                self._do_ac_td(curr, sp_curr, self.ce_history[port])

        # Phase C -- per port, time-interpolate every new filt pair as
        # one array chunk.
        for port in range(n_ports):
            self._interp2d_batch(port)

        # Phase D -- pair data symbols with interpolated CEs: dashboard
        # measurements, sync-channel SNR, and the 40 ms MIB re-decode.
        # All ready symbols are popped as arrays; per-symbol Python work
        # happens only at the rare special symbols (EMA updates at slots
        # 0/10 syms 5/6, PSS/SSS SNR at the half-frame boundaries, PBCH
        # appends at slot 1 syms 0-3), selected by mask.
        n_ready = len(self.data_fifo)
        for f in self.ce_interp_fifo:
            n_ready = min(n_ready, f.n)
        if n_ready <= 0 or c.kill_me:
            return
        entries = [self.data_fifo.popleft() for _ in range(n_ready)]
        per_port = [f.pop_n(n_ready) for f in self.ce_interp_fifo]
        ce_p = [pp[0] for pp in per_port]                  # each [n, 72]
        tp_p = np.stack([pp[1] for pp in per_port])        # [n_ports, n]
        sp_p = np.stack([pp[2] for pp in per_port])
        spr_p = np.stack([pp[3] for pp in per_port])
        np_p = np.stack([pp[4] for pp in per_port])
        slots = np.fromiter((e[0] for e in entries), np.int64, n_ready)
        symsn = np.fromiter((e[1] for e in entries), np.int64, n_ready)

        # instant dashboard registers carry the LAST processed symbol
        c.ce = np.stack([cep[-1] for cep in ce_p])
        c.crs_sp_raw = spr_p[:, -1].copy()
        c.crs_np = np_p[:, -1].copy()

        first_init = c.crs_sp_raw_av is None
        if first_init:
            c.crs_tp_av = tp_p[:, 0].copy()
            c.crs_sp_raw_av = spr_p[:, 0].copy()
            c.crs_np_av = np_p[:, 0].copy()
        ema = ((slots == 0) | (slots == 10)) & ((symsn == 5) | (symsn == 6))
        for i in np.nonzero(ema)[0]:
            if first_init and i == 0:
                continue   # the init symbol itself takes no EMA step
            c.crs_tp_av = 0.999 * c.crs_tp_av + 0.001 * tp_p[:, i]
            c.crs_sp_raw_av = 0.999 * c.crs_sp_raw_av + 0.001 * spr_p[:, i]
            c.crs_np_av = 0.999 * c.crs_np_av + 0.001 * np_p[:, i]

        n_symb = c.n_symb_dl()
        sync = ((slots == 0) | (slots == 10)) \
            & ((symsn == n_symb - 2) | (symsn == n_symb - 1))
        pbch = (slots == 1) & (symsn <= 3)
        for i in np.nonzero(sync | pbch)[0]:
            sl, sy = int(slots[i]), int(symsn[i])
            dsyms = entries[i][2]
            if sync[i]:
                self._do_pss_sss_sigpower_ce(dsyms, sl, sy)
            if pbch[i]:
                self.mib_fifo.append(
                    (dsyms, np.stack([cep[i] for cep in ce_p]),
                     sp_p[:, i], np_p[:, i]))
                if len(self.mib_fifo) == 16 and not self._mib_try_decode():
                    return
