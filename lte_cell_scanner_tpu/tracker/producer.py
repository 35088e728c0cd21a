"""Sample-stream demultiplexer (the reference producer thread, re-designed).

Behavioral contract: /root/reference/src/producer_thread.cpp:59-252:

- every sample gets an LTE-timescale timestamp advanced by
  (FS_LTE/16)/(fs_programmed*k_factor) and wrapped mod 19200 (one frame);
- when the searcher requests a capture, filling starts at the timestamp-0
  crossing (within 0.5 samples) and records the fractional lateness;
- per tracked cell, a 128-sample OFDM-symbol window starts when the
  timestamp crosses frame_timing + target_cap_start_time within 0.5
  samples (or up to 3 samples late), stamping the FO and frame timing in
  effect at capture start; after each window the target advances by the
  symbol stride (CP-dependent) mod 19200.

Re-design notes: instead of a per-sample scalar loop, each block's
timestamps are vectorized (cumulative ramp) and trigger points are located
with searchsorted-style arithmetic on the host; the per-cell symbol
windows are then sliced in bulk.  The boost FIFO handshake becomes plain
Python deques consumed in the same event-loop tick.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Deque, Dict, List, Optional

from collections import deque

import numpy as np

from ..constants import FS_LTE
from .state import GlobalState, TrackedCell


@dataclass
class SymbolPdu:
    """Producer -> tracker unit (reference td_fifo_pdu_t, LTE-Tracker.h:9)."""
    data: np.ndarray            # 128 complex samples
    slot_num: int
    sym_num: int
    late: float
    frequency_offset: float
    frame_timing: float


@dataclass
class _CellCapture:
    serial_num: int = 0
    target: float = 0.0         # target_cap_start_time
    filling: bool = False
    buffer: Optional[np.ndarray] = None
    buffer_offset: int = 0
    slot_num: int = 0
    sym_num: int = 0
    pdu_late: float = 0.0
    pdu_fo: float = 0.0
    pdu_ft: float = 0.0


def _wrap_half_frame(x):
    return (np.asarray(x) + 9600.0) % 19200.0 - 9600.0


def _next_trigger(ts, t, target, step, lo=-0.5, hi=3.0):
    """First index >= t where wrap(ts - target) lands in (lo, hi).

    ts is a linear ramp with slope `step` (mod 19200), so the crossing
    index is arithmetic: jump to where the wrapped difference re-enters
    `lo`, then verify against float rounding with a tiny window scan.
    Returns None if no trigger occurs before the end of the block.
    """
    n = len(ts)
    while t < n:
        d = float((ts[t] - target + 9600.0) % 19200.0 - 9600.0)
        if lo < d < hi:
            return t
        m = int(np.ceil(((lo - d) % 19200.0) / step))
        t2 = t + max(m, 1)
        # verify against float rounding with a tiny scalar scan around
        # the predicted crossing (same window the vectorized check
        # covered, but with no per-call array allocations -- this runs
        # once per OFDM symbol per cell on the streaming hot path)
        for c in range(max(t, t2 - 2), min(t2 + 6, n)):
            dc = (float(ts[c]) - target + 9600.0) % 19200.0 - 9600.0
            if lo < dc < hi:
                return c
        if t2 + 6 >= n:
            return None
        # the window was hopped over (step > interval width); try the
        # next frame's crossing
        t = t2 + 6
    return None


class Producer:
    """Demultiplexes the raw sample stream into per-cell symbol PDUs and
    searcher capture buffers."""

    def __init__(self, state: GlobalState, capbuf_len: int = 19200 * 8):
        self.state = state
        self.sample_time = -1.0
        # searcher capture handshake (reference capbuf_sync_t)
        self.capbuf_len = capbuf_len
        self.capture_requested = False
        self._filling = False
        self._cap_idx = 0
        self.capbuf = np.zeros(capbuf_len, dtype=np.complex128)
        self.capbuf_late = 0.0
        self.capbuf_ready = False
        # per-cell capture state + output fifos
        self._cell_state: Dict[int, _CellCapture] = {}
        self.fifos: Dict[int, Deque[SymbolPdu]] = {}

    def request_capture(self) -> None:
        self.capture_requested = True
        self.capbuf_ready = False

    def capture_idle(self) -> bool:
        """True when no capture is pending, filling, or awaiting pickup."""
        return not (self.capture_requested or self._filling
                    or self.capbuf_ready)

    def process(self, samples: np.ndarray, cells: List[TrackedCell]) -> None:
        """Process one block of complex samples."""
        n = len(samples)
        if n == 0:
            return
        fo = self.state.frequency_offset
        k_factor = self.state.k_factor()
        step = (FS_LTE / 16) / (self.state.fs_programmed * k_factor)

        # vectorized timestamps (wrapped mod one frame)
        ts = self.sample_time + step * np.arange(1, n + 1)
        self.sample_time = float(ts[-1] % 19200.0)
        ts = ts % 19200.0

        # ---- searcher capture buffer ---------------------------------
        if self.capture_requested or self._filling:
            t = 0
            if self.capture_requested:
                # the timestamps are a linear ramp (slope `step` mod
                # 19200), so the first |wrap(ts)| < 0.5 crossing is
                # computed analytically instead of scanned per sample;
                # step > 1 can occasionally hop over the 1-sample-wide
                # window, in which case the next frame's crossing is
                # tried (the scalar loop had the same miss semantics)
                t = _next_trigger(ts, 0, 0.0, step, lo=-0.5, hi=0.5)
                if t is None:
                    t = n
                else:
                    self.capture_requested = False
                    self._filling = True
                    self._cap_idx = 0
                    self.capbuf_late = float(_wrap_half_frame(ts[t]))
            if self._filling and t < n:
                take = min(self.capbuf_len - self._cap_idx, n - t)
                self.capbuf[self._cap_idx: self._cap_idx + take] = \
                    samples[t: t + take]
                self._cap_idx += take
                if self._cap_idx == self.capbuf_len:
                    self._filling = False
                    self.capbuf_ready = True

        # ---- per-cell symbol capture ---------------------------------
        for cell in cells:
            cid = cell.n_id_cell
            cl = self._cell_state.get(cid)
            if cl is None or cell.serial_num != cl.serial_num:
                cl = _CellCapture(serial_num=cell.serial_num)
                cl.target = 10.0 if cell.n_symb_dl() == 7 else 32.0
                cl.buffer = np.zeros(128, dtype=np.complex128)
                self._cell_state[cid] = cl
                self.fifos.setdefault(cid, deque())
            frame_timing = cell.frame_timing
            fifo = self.fifos[cid]

            t = 0
            while t < n:
                if not cl.filling:
                    hit = _next_trigger(ts, t, frame_timing + cl.target,
                                        step, lo=-0.5, hi=3.0)
                    if hit is None:
                        break
                    t = hit
                    cl.filling = True
                    cl.pdu_late = float(_wrap_half_frame(
                        ts[t] - (frame_timing + cl.target)))
                    cl.buffer_offset = 0
                    cl.pdu_fo = fo
                    cl.pdu_ft = frame_timing
                take = min(128 - cl.buffer_offset, n - t)
                cl.buffer[cl.buffer_offset: cl.buffer_offset + take] = \
                    samples[t: t + take]
                cl.buffer_offset += take
                t += take
                if cl.buffer_offset == 128:
                    fifo.append(SymbolPdu(
                        data=cl.buffer.copy(), slot_num=cl.slot_num,
                        sym_num=cl.sym_num, late=cl.pdu_late,
                        frequency_offset=cl.pdu_fo, frame_timing=cl.pdu_ft))
                    cell.fifo_peak_size = max(cell.fifo_peak_size, len(fifo))
                    # backpressure: if the consumer is >1.5 s behind, dump
                    # 1 s of symbols and count it (reference
                    # tracker_thread.cpp:857-867 / display_thread.cpp:538)
                    sym_per_sec = self.state.fs_programmed \
                        * (20 * cell.n_symb_dl()) / 19200.0
                    if len(fifo) > 1.5 * sym_per_sec:
                        for _ in range(int(sym_per_sec)):
                            fifo.popleft()
                        self.state.cell_seconds_dropped += 1
                    cl.filling = False
                    n_symb = cell.n_symb_dl()
                    if n_symb == 6:
                        cl.target += 32 + 128
                    else:
                        cl.target += (128 + 10) if cl.sym_num == 6 else (128 + 9)
                    cl.target %= 19200.0
                    cl.sym_num += 1
                    if cl.sym_num == n_symb:
                        cl.sym_num = 0
                        cl.slot_num = (cl.slot_num + 1) % 20

    def drop_cell(self, n_id_cell: int) -> None:
        self._cell_state.pop(n_id_cell, None)
        self.fifos.pop(n_id_cell, None)
