"""Tracker integration: acquire and track a synthetic cell in streaming mode.

Feeds a 400 ms synthetic downlink (2-port PBCH, +300 Hz offset, 5 dB SNR)
through the full tracker graph: producer timestamping/demux -> background
searcher acquisition (single-hypothesis search, as the reference searcher
thread) -> per-symbol tracking with CE filtering, FOE/TOE feedback, and
periodic MIB re-decode with health accounting.
"""

import numpy as np
import pytest

from lte_cell_scanner_tpu.cell import CpType
from lte_cell_scanner_tpu.constants import FS_LTE
from lte_cell_scanner_tpu.sim import apply_freq_offset, awgn, create_dl_sig
from lte_cell_scanner_tpu.tracker import TrackerRunner

FS = FS_LTE / 16
FC = 739e6
F_OFF = 300.0


@pytest.fixture(scope="module")
def tracked_run():
    rng = np.random.default_rng(11)
    sig = create_dl_sig(CpType.NORMAL, 400, 0, 92, 1, 0.4, rng=rng,
                        n_ports=2, sfn=4)
    sig = apply_freq_offset(sig, F_OFF)
    sig = awgn(sig, 5.0, rng=rng)

    runner = TrackerRunner(FC, FC, FS)
    block = 10000
    for i in range(0, len(sig), block):
        runner.process_block(sig[i: i + block])
    return runner


def test_cell_acquired_and_tracked(tracked_run):
    runner = tracked_run
    assert len(runner.cells) == 1
    tc = runner.cells[0]
    assert tc.n_id_cell == 277
    assert tc.n_ports == 2
    assert tc.n_rb_dl == 6


def test_mib_sync_and_health(tracked_run):
    tc = tracked_run.cells[0]
    proc = tracked_run.processors[tc.n_id_cell]
    assert proc.mib_fifo_synchronized
    # at most one failed re-decode tolerated over the run
    assert tc.mib_decode_failures <= 1.0
    assert tc.health_pct() > 99.0


def test_frequency_offset_converges(tracked_run):
    fo = tracked_run.state.frequency_offset
    assert abs(fo - F_OFF) < 50.0, fo


def test_two_cells_tracked_simultaneously():
    """Two overlapping eNodeBs in one stream: the background searcher
    acquires both and the multi-cell batched tracker holds both at full
    health (reference claim: ~4 cells realtime, doc/LTE-Tracker.html;
    cells 277+271 mirror the real capbuf_0000.it pair)."""
    from lte_cell_scanner_tpu.sim import create_dl_sig

    rng = np.random.default_rng(21)
    a = create_dl_sig(CpType.NORMAL, 500, 0, 92, 1, 0.4, rng=rng,
                      n_ports=2, sfn=4)
    b = create_dl_sig(CpType.NORMAL, 500, 7, 90, 1, 0.4, rng=rng,
                      n_ports=2, sfn=8)
    sig = awgn(apply_freq_offset(a + 0.7 * b, 200.0), 12.0, rng=rng)

    runner = TrackerRunner(FC, FC, FS)
    for i in range(0, len(sig), 10000):
        runner.process_block(sig[i: i + 10000])

    got = {tc.n_id_cell: tc for tc in runner.cells}
    assert set(got) == {277, 271}
    for tc in got.values():
        assert tc.n_ports == 2
        assert tc.health_pct() > 99.0
    assert abs(runner.state.frequency_offset - 200.0) < 50.0


def test_parallel_cells_tracked():
    """parallel_cells>1 (per-cell tracker ticks on a worker pool, the
    reference's thread-per-cell layout) must hold multiple cells at full
    health with a converged global FO; only the FO register's update
    ORDER is scheduling-dependent (the reference's documented benign
    race, tracker_thread.cpp:235-238)."""
    from lte_cell_scanner_tpu.sim import create_dl_sig

    rng = np.random.default_rng(22)
    a = create_dl_sig(CpType.NORMAL, 500, 0, 92, 1, 0.4, rng=rng,
                      n_ports=2, sfn=4)
    b = create_dl_sig(CpType.NORMAL, 500, 7, 90, 1, 0.4, rng=rng,
                      n_ports=2, sfn=8)
    sig = awgn(apply_freq_offset(a + 0.7 * b, 200.0), 12.0, rng=rng)

    runner = TrackerRunner(FC, FC, FS, parallel_cells=2)
    for i in range(0, len(sig), 10000):
        runner.process_block(sig[i: i + 10000])
    runner.close()

    got = {tc.n_id_cell: tc for tc in runner.cells}
    assert set(got) == {277, 271}
    for tc in got.values():
        assert tc.n_ports == 2
        assert tc.health_pct() > 99.0
    assert abs(runner.state.frequency_offset - 200.0) < 50.0


def test_four_port_cell_tracked():
    """A 4-port (SFBC+FSTD) cell: CE tracking on ports 2/3 (CRS only in
    symbol 1, reference tracker_thread.cpp port loops) and the 4-port
    Alamouti-pair MIB re-decode hold the cell at full health."""
    rng = np.random.default_rng(31)
    sig = create_dl_sig(CpType.NORMAL, 400, 0, 100, 1, 0.4, rng=rng,
                        n_ports=4, sfn=12)
    sig = awgn(apply_freq_offset(sig, F_OFF), 10.0, rng=rng)

    runner = TrackerRunner(FC, FC, FS)
    for i in range(0, len(sig), 10000):
        runner.process_block(sig[i: i + 10000])

    assert len(runner.cells) == 1
    tc = runner.cells[0]
    assert tc.n_id_cell == 301
    assert tc.n_ports == 4
    proc = runner.processors[tc.n_id_cell]
    assert proc.mib_fifo_synchronized
    assert tc.health_pct() > 99.0


def test_cell_dropped_at_health_threshold():
    """A cell whose MIB re-decodes keep failing must be dropped at
    CELL_DROP_THRESHOLD and removed from the tracker graph (reference
    tracker_thread.cpp:739-744, producer_thread.cpp:191-197)."""
    from lte_cell_scanner_tpu.constants import CELL_DROP_THRESHOLD
    from lte_cell_scanner_tpu.sim import create_dl_sig
    from lte_cell_scanner_tpu.tracker.state import TrackedCell

    rng = np.random.default_rng(3)
    sig = create_dl_sig(CpType.NORMAL, 200, 0, 92, 1, 0.4, rng=rng,
                        n_ports=2, sfn=0)
    sig = awgn(sig, 10.0, rng=rng)

    runner = TrackerRunner(FC, FC, FS)
    runner._search_enabled = False
    # seed a WRONG cell (no such signal): every MIB decode will fail
    tc = TrackedCell(n_id_cell=100, n_id_1=33, n_id_2=1,
                     cp_type=CpType.NORMAL, n_ports=2, frame_timing=0.0)
    tc.mib_decode_failures = CELL_DROP_THRESHOLD - 1  # one failure away
    runner.add_cell(tc)
    for i in range(0, len(sig), 10000):
        runner.process_block(sig[i: i + 10000])
        if not runner.cells:
            break
    assert runner.cells == []                      # dropped
    assert 100 not in runner.producer.fifos        # producer state cleaned
    assert tc.kill_me


def test_backpressure_dumps_symbols_and_counts():
    """When a cell's PDU fifo runs >1.5 s behind, 1 s of symbols is
    dumped and surfaced as cell_seconds_dropped (reference
    tracker_thread.cpp:857-867)."""
    from lte_cell_scanner_tpu.sim import create_dl_sig
    from lte_cell_scanner_tpu.tracker.state import TrackedCell

    from lte_cell_scanner_tpu.tracker.producer import Producer
    from lte_cell_scanner_tpu.tracker.state import GlobalState

    rng = np.random.default_rng(4)
    # content is irrelevant: the producer slices symbols on frame timing
    n = int(2.2 * FS)
    sig = (rng.normal(size=n) + 1j * rng.normal(size=n)) * 0.1
    state = GlobalState(fc_requested=FC, fc_programmed=FC, fs_programmed=FS)
    producer = Producer(state)
    cells = [TrackedCell(n_id_cell=277, n_id_1=92, n_id_2=1,
                         cp_type=CpType.NORMAL, n_ports=2,
                         frame_timing=0.0)]
    # nothing ever pops the fifo = stalled consumer
    for i in range(0, len(sig), 10000):
        producer.process(sig[i: i + 10000], cells)
    assert state.cell_seconds_dropped >= 1
    sym_per_sec = FS * 140 / 19200.0
    assert len(producer.fifos[277]) <= 1.5 * sym_per_sec + 1


@pytest.mark.parametrize("backend", ["device", "numpy", "host"])
def test_batched_get_fd_matches_host(backend):
    """The batched [cells, symbols, 128] get_fd (tracker/batched.py: the
    jitted device program, the vectorized-numpy path, and the native C
    path with its own radix-2 FFT) must reproduce the per-symbol host
    path bit-close, including the bulk-phase accumulator carried across
    symbols."""
    from lte_cell_scanner_tpu.tracker.batched import batched_get_fd
    from lte_cell_scanner_tpu.tracker.cell_tracker import \
        TrackedCellProcessor
    from lte_cell_scanner_tpu.tracker.producer import PduChunk, SymbolPdu
    from lte_cell_scanner_tpu.tracker.state import GlobalState, TrackedCell

    rng = np.random.default_rng(5)
    state = GlobalState(fc_requested=FC, fc_programmed=FC,
                        fs_programmed=FS, frequency_offset=250.0)

    def make(n_id_cell, cp, n_sym):
        cell = TrackedCell(n_id_cell=n_id_cell, n_id_1=n_id_cell // 3,
                           n_id_2=n_id_cell % 3, cp_type=cp, n_ports=2,
                           n_rb_dl=6, frame_timing=0.0)
        proc_a = TrackedCellProcessor(cell, state)
        proc_b = TrackedCellProcessor(cell, state)
        proc_a.bulk_phase_offset = proc_b.bulk_phase_offset = 0.3
        chunk = PduChunk(
            data=rng.normal(size=(n_sym, 128))
            + 1j * rng.normal(size=(n_sym, 128)),
            late=rng.uniform(-0.5, 2.0, size=n_sym),
            fo=250.0 + 10 * np.arange(n_sym, dtype=float),
            ft=np.zeros(n_sym), sym0=0)
        return proc_a, proc_b, chunk

    a1, b1, c1 = make(277, CpType.NORMAL, 7)
    a2, b2, c2 = make(100, CpType.EXTENDED, 13)

    outs = batched_get_fd([(a1, c1), (a2, c2)], state, backend=backend)
    for proc_b, chunk, out in ((b1, c1, outs[0]), (b2, c2, outs[1])):
        n_symb = proc_b.cell.n_symb_dl()
        host = np.stack([
            proc_b._get_fd(SymbolPdu(
                data=chunk.data[s], slot_num=0, sym_num=s % n_symb,
                late=float(chunk.late[s]),
                frequency_offset=float(chunk.fo[s]), frame_timing=0.0))
            for s in range(len(chunk))])
        assert np.allclose(out, host, atol=1e-10), \
            np.abs(out - host).max()
    assert np.isclose(a1.bulk_phase_offset, b1.bulk_phase_offset)
    assert np.isclose(a2.bulk_phase_offset, b2.bulk_phase_offset)


def test_vectorized_per_symbol_math_matches_loops():
    """The vectorized CE filter / interp72 / freq-autocorrelation must
    match the reference's scalar-loop semantics exactly
    (tracker_thread.cpp:176-202, 318-340, 372-393)."""
    from lte_cell_scanner_tpu.tracker.cell_tracker import (
        TrackedCellProcessor, _RsPdu, _FiltPdu)
    from lte_cell_scanner_tpu.tracker.state import GlobalState, TrackedCell

    rng = np.random.default_rng(7)
    state = GlobalState(fc_requested=FC, fc_programmed=FC, fs_programmed=FS)
    cell = TrackedCell(n_id_cell=277, n_id_1=92, n_id_2=1,
                       cp_type=CpType.NORMAL, n_ports=2, frame_timing=0.0)
    proc = TrackedCellProcessor(cell, state)

    def rs(shift):
        return _RsPdu(shift, 0, 0,
                      rng.normal(size=12) + 1j * rng.normal(size=12),
                      100.0, 0.0)

    for sh_prev, sh_cur in ((0, 3), (3, 0)):
        prev, curr, nxt = rs(sh_prev), rs(sh_cur), rs(sh_prev)
        got = proc._filter_ce(prev, curr, nxt)
        want = np.empty(12, complex)
        for t in range(12):
            lo, hi = max(0, t - 1), min(11, t + 1)
            tot = curr.ce[lo:hi + 1].sum()
            n = hi - lo + 1
            if prev.shift < curr.shift:
                lo2, hi2 = t, min(11, t + 1)
            else:
                lo2, hi2 = max(0, t - 1), t
            tot += prev.ce[lo2:hi2 + 1].sum() + nxt.ce[lo2:hi2 + 1].sum()
            n += 2 * (hi2 - lo2 + 1)
            want[t] = tot / n
        assert np.allclose(got, want, atol=1e-14)

    for shift in range(6):
        y = rng.normal(size=12) + 1j * rng.normal(size=12)
        pdu = _FiltPdu(shift=shift, slot_num=0, sym_num=0, tp=1.0, sp=1.0,
                       sp_raw=1.0, np=0.1, ce_filt=y)
        got = proc._interp72(pdu)
        want = np.empty(72, complex)
        l_x, l_y, r_x, r_y, ptr = shift, y[0], shift + 6, y[1], 1
        for t in range(72):
            if t > r_x and ptr < 11:
                l_x, l_y = r_x, r_y
                r_x += 6
                ptr += 1
                r_y = y[ptr]
            want[t] = (r_y - l_y) / (r_x - l_x) * (t - l_x) + l_y
        assert np.allclose(got, want, atol=1e-13), shift

    ce = rng.normal(size=12) + 1j * rng.normal(size=12)
    curr = _RsPdu(0, 0, 0, ce, 100.0, 0.0)
    proc._do_ac_fd(curr, 1.3, 0.2)
    got = cell.ac_fd.copy()
    want_ac = np.array([np.mean(np.conj(ce[:12 - d]) * ce[d:])
                        for d in range(12)]) / 1.3
    counts = np.arange(12.0, 0.0, -1.0)
    ac_np = (0.2 ** 2 / 1.3 ** 2 + 2 * 0.2 / 1.3) / counts
    w_old = 1 / 0.00001
    want = (np.zeros(12) * w_old + want_ac / ac_np) / (w_old + 1.0 / ac_np)
    assert np.allclose(got, want, atol=1e-13)


def test_measurements_populated(tracked_run):
    tc = tracked_run.cells[0]
    # CRS and sync-channel measurements flow to the dashboard state
    assert tc.crs_sp_raw is not None and len(tc.crs_sp_raw) == 2
    assert np.isfinite(tc.sync_sp_av)
    assert np.isfinite(tc.sync_np_av)
    # SNR sanity: sync SP should be well above NP at 5 dB
    assert tc.sync_sp_av > tc.sync_np_av
    assert tc.ce is not None and tc.ce.shape == (2, 72)
    assert np.all(np.abs(tc.ac_fd) <= 2.0)


def test_next_trigger_matches_bruteforce_scan():
    """The producer's arithmetic trigger locator must agree with the
    original whole-block scan for every (phase, step) combination --
    including steps > interval width, where a crossing can hop clean
    over the +-0.5 capture window and the next frame's crossing wins."""
    from lte_cell_scanner_tpu.tracker.producer import _next_trigger

    def brute(ts, t0, target, lo, hi):
        d = (ts[t0:] - target + 9600.0) % 19200.0 - 9600.0
        hit = np.nonzero((d > lo) & (d < hi))[0]
        return t0 + int(hit[0]) if len(hit) else None

    rng = np.random.default_rng(5)
    for step in (1.0000481, 0.9999520, 1.0, 1.5):  # 1.5 hops +-0.5 windows
        for _ in range(40):
            start = rng.uniform(0, 19200)
            n = rng.integers(50, 30000)
            ts = (start + step * np.arange(1, n + 1)) % 19200.0
            target = rng.uniform(0, 19200)
            t0 = int(rng.integers(0, max(1, n // 2)))
            for lo, hi in ((-0.5, 0.5), (-0.5, 3.0)):
                got = _next_trigger(ts, t0, target, step, lo=lo, hi=hi)
                want = brute(ts, t0, target, lo, hi)
                assert got == want, (step, start, n, target, t0, lo, hi,
                                     got, want)


def test_native_rs_window_matches_numpy_path():
    """The native batched RS-window pipeline (rs_window_update_batch2:
    CE filtering, powers, FOE/TOE statistics, ac_fd/ac_td blends,
    interp72, AND the sequential feedback chain) must track the numpy
    fallback loop: identical filtered/interpolated CEs and identical
    frequency-offset / frame-timing register trajectories over a long
    random window sequence (tolerances cover summation-order rounding)."""
    from lte_cell_scanner_tpu.io.native import get_lib
    from lte_cell_scanner_tpu.tracker.cell_tracker import \
        TrackedCellProcessor
    from lte_cell_scanner_tpu.tracker.state import GlobalState, TrackedCell

    if get_lib() is None:
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(7)

    def make_pair():
        state = GlobalState(fc_requested=FC, fc_programmed=FC,
                            fs_programmed=FS, frequency_offset=100.0)
        cell = TrackedCell(n_id_cell=277, n_id_1=92, n_id_2=1,
                           cp_type=CpType.NORMAL, n_ports=1,
                           frame_timing=1234.5)
        return state, cell, TrackedCellProcessor(cell, state)

    st_a, cell_a, proc_a = make_pair()
    st_b, cell_b, proc_b = make_pair()
    proc_b._native = None                      # force the numpy path

    m = 200
    ce = rng.normal(size=(m, 12)) + 1j * rng.normal(size=(m, 12))
    shift = np.where(np.arange(m) % 2 == 0, 2, 5).astype(np.int64)
    slot = (np.arange(m) // 2) % 20
    sym = np.zeros(m, np.int64)
    fo = 100.0 + 0.1 * np.arange(m)
    ft = np.full(m, 1234.5)

    # run in several batches to exercise the tick-boundary carry too
    outs_a, outs_b = [], []
    for sl in (slice(0, 50), slice(48, 131), slice(129, 200)):
        # overlap by 2 rows = the pending-tail carry between ticks
        args = (ce[sl], shift[sl], slot[sl], sym[sl], fo[sl], ft[sl])
        outs_a.append(proc_a._rs_windows(0, *args))
        outs_b.append(proc_b._rs_windows(0, *args))

    for (a, b) in zip(outs_a, outs_b):
        for x, y in zip(a, b):
            assert np.allclose(x, y, atol=1e-12)

    assert abs(st_a.frequency_offset - st_b.frequency_offset) < 1e-6
    assert abs(cell_a.frame_timing - cell_b.frame_timing) < 1e-8
    assert np.allclose(cell_a.ac_fd, cell_b.ac_fd, atol=1e-10)
    assert np.allclose(cell_a.ac_td, cell_b.ac_td, atol=1e-10)


def test_native_interp72_matches_numpy():
    from lte_cell_scanner_tpu.io.native import get_lib
    from lte_cell_scanner_tpu.tracker.cell_tracker import (
        TrackedCellProcessor, _FiltPdu)
    from lte_cell_scanner_tpu.tracker.state import GlobalState, TrackedCell

    if get_lib() is None:
        pytest.skip("native library unavailable")
    state = GlobalState(fc_requested=FC, fc_programmed=FC, fs_programmed=FS)
    cell = TrackedCell(n_id_cell=277, n_id_1=92, n_id_2=1,
                       cp_type=CpType.NORMAL, n_ports=1, frame_timing=0.0)
    proc = TrackedCellProcessor(cell, state)
    rng = np.random.default_rng(8)
    for shift in range(6):
        pdu = _FiltPdu(shift=shift, slot_num=0, sym_num=0, tp=1.0, sp=1.0,
                       sp_raw=1.0, np=0.1,
                       ce_filt=rng.normal(size=12) + 1j * rng.normal(size=12))
        got = proc._interp72(pdu)
        proc._native = None
        want = proc._interp72(pdu)
        proc._native = get_lib()
        assert np.allclose(got, want, atol=1e-14), shift


def test_native_framing_matches_python():
    """The native per-cell symbol framing (ingest.cpp cell_frame_symbols)
    must produce bit-identical PDU chunks (data, late, fo, ft stamps and
    symbol labels) to the Python fallback loop across block boundaries,
    partial symbols, CP types, and a moving frequency-offset register."""
    from lte_cell_scanner_tpu.io.native import get_lib
    from lte_cell_scanner_tpu.tracker.producer import Producer
    from lte_cell_scanner_tpu.tracker.state import GlobalState, TrackedCell

    if get_lib() is None:
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(9)
    n = int(0.12 * FS)
    sig = rng.normal(size=n) + 1j * rng.normal(size=n)

    for cp, ftiming in ((CpType.NORMAL, 1234.5), (CpType.EXTENDED, 0.25),
                        (CpType.NORMAL, 19199.0)):
        state_a = GlobalState(fc_requested=FC, fc_programmed=FC,
                              fs_programmed=FS, frequency_offset=3000.0)
        state_b = GlobalState(fc_requested=FC, fc_programmed=FC,
                              fs_programmed=FS, frequency_offset=3000.0)
        prod_a = Producer(state_a)
        prod_b = Producer(state_b)
        prod_b._native = None
        cell_a = TrackedCell(n_id_cell=277, n_id_1=92, n_id_2=1,
                             cp_type=cp, n_ports=2, frame_timing=ftiming)
        cell_b = TrackedCell(n_id_cell=277, n_id_1=92, n_id_2=1,
                             cp_type=cp, n_ports=2, frame_timing=ftiming)
        # odd block size exercises partial symbols across block edges
        for i in range(0, n, 7777):
            prod_a.process(sig[i: i + 7777], [cell_a])
            prod_b.process(sig[i: i + 7777], [cell_b])
            # drift the registers like the live feedback loops do
            state_a.frequency_offset += 1.0
            state_b.frequency_offset += 1.0
            cell_a.frame_timing = (cell_a.frame_timing + 0.01) % 19200.0
            cell_b.frame_timing = (cell_b.frame_timing + 0.01) % 19200.0
        fa, fb = prod_a.fifos[277], prod_b.fifos[277]
        assert len(fa) == len(fb) > 100
        ca = fa.pop_upto(len(fa))
        cb = fb.pop_upto(len(fb))
        assert ca.sym0 == cb.sym0
        assert np.array_equal(ca.data, cb.data)
        assert np.array_equal(ca.late, cb.late)
        assert np.array_equal(ca.fo, cb.fo)
        assert np.array_equal(ca.ft, cb.ft)


def test_tracker_with_sharded_searcher():
    """Streaming tracker with the background searcher's front end
    sharded over the 8-virtual-device CPU mesh (overlap-save time
    blocks): acquisition and tracking must match the single-device path
    (BASELINE.json config 5 layout)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from lte_cell_scanner_tpu.parallel.sharded import make_mesh

    rng = np.random.default_rng(11)
    sig = create_dl_sig(CpType.NORMAL, 400, 0, 92, 1, 0.4, rng=rng,
                        n_ports=2, sfn=4)
    sig = awgn(apply_freq_offset(sig, F_OFF), 5.0, rng=rng)

    runner = TrackerRunner(FC, FC, FS, search_mesh=make_mesh(8, 1))
    for i in range(0, len(sig), 10000):
        runner.process_block(sig[i: i + 10000])

    assert len(runner.cells) == 1
    tc = runner.cells[0]
    assert tc.n_id_cell == 277
    assert tc.n_rb_dl == 6
    assert tc.health_pct() > 99.0
    assert abs(runner.state.frequency_offset - F_OFF) < 50.0


def test_extended_cp_cell_tracked():
    """Extended-CP cell in streaming mode: 32-sample CP symbol framing
    (producer stride 160), 6-symbol slots, and the m_bit=1728 MIB
    re-decode all hold the cell at full health."""
    rng = np.random.default_rng(41)
    sig = create_dl_sig(CpType.EXTENDED, 400, 0, 92, 1, 0.4, rng=rng,
                        n_ports=2, sfn=8)
    sig = awgn(apply_freq_offset(sig, F_OFF), 10.0, rng=rng)

    runner = TrackerRunner(FC, FC, FS)
    for i in range(0, len(sig), 10000):
        runner.process_block(sig[i: i + 10000])

    assert len(runner.cells) == 1
    tc = runner.cells[0]
    assert tc.n_id_cell == 277
    assert tc.cp_type is CpType.EXTENDED
    proc = runner.processors[tc.n_id_cell]
    assert proc.mib_fifo_synchronized
    assert tc.health_pct() > 99.0


def test_frame_timing_drift_beats_reference_defect():
    """The reference documents a known tracker defect: frame-timing
    drift of ~0.1 sample/s (doc/LTE-Tracker.html 'Known Issues').  The
    TOE feedback here must hold drift an order of magnitude tighter
    over a 1.5 s tracked stream (zero injected FO so the k_factor
    clock-coupling model is not fighting the simulator's ideal clock)."""
    rng = np.random.default_rng(11)
    sig = create_dl_sig(CpType.NORMAL, 1500, 0, 92, 1, 0.4, rng=rng,
                        n_ports=2, sfn=4)
    sig = awgn(sig, 5.0, rng=rng)
    runner = TrackerRunner(FC, FC, FS, search_period=2.0)
    timings = []
    for i in range(0, len(sig), 10000):
        runner.process_block(sig[i: i + 10000])
        if runner.cells:
            timings.append((i / FS, runner.cells[0].frame_timing))
    t = np.array(timings)
    lock = t[len(t) // 4:]
    rel = np.unwrap((lock[:, 1] - lock[0, 1] + 9600) % 19200 - 9600,
                    period=19200)
    slope = np.polyfit(lock[:, 0], rel, 1)[0]
    assert abs(slope) < 0.02, f"frame-timing drift {slope} samples/s"
    assert runner.cells[0].health_pct() > 99.0


def test_no_timing_drift_through_coupled_crystal_channel():
    """Positive k_factor validation in streaming mode: with the
    simulated crystal offsetting carrier AND clock together (25 kHz /
    -33.8 ppm), the producer's k-scaled timestamping must hold frame
    timing still -- an unmodeled clock would read ~65 samples/s here."""
    from lte_cell_scanner_tpu.sim import apply_coupled_offset

    rng = np.random.default_rng(11)
    sig = create_dl_sig(CpType.NORMAL, 1200, 0, 92, 1, 0.4, rng=rng,
                        n_ports=2, sfn=4)
    f_off = 25e3
    sig = apply_coupled_offset(sig, f_off, FC, FS)
    sig = awgn(sig, 8.0, rng=rng)
    # initial_fo plays the reference kalibrate() bootstrap role
    runner = TrackerRunner(FC, FC, FS, search_period=2.0, initial_fo=f_off)
    timings = []
    for i in range(0, len(sig), 10000):
        runner.process_block(sig[i: i + 10000])
        if runner.cells:
            timings.append((i / FS, runner.cells[0].frame_timing))
    t = np.array(timings)
    lock = t[len(t) // 4:]
    rel = np.unwrap((lock[:, 1] - lock[0, 1] + 9600) % 19200 - 9600,
                    period=19200)
    slope = np.polyfit(lock[:, 0], rel, 1)[0]
    assert abs(slope) < 0.05, f"drift {slope} samples/s"
    assert abs(runner.state.frequency_offset - f_off) < 50.0
    assert runner.cells[0].health_pct() > 99.0


def test_async_searcher_acquires_and_tracks():
    """The concurrent background searcher (reference searcher thread at
    nice+20, searcher_thread.cpp:55-248 -- here a nice+19 worker) must
    acquire a cell while the event loop keeps streaming, integrate it
    at a later tick, and then track it at full health."""
    import time

    rng = np.random.default_rng(17)
    sig = create_dl_sig(CpType.NORMAL, 900, 0, 92, 1, 0.4, rng=rng,
                        n_ports=2, sfn=4)
    sig = awgn(apply_freq_offset(sig, F_OFF), 10.0, rng=rng)

    runner = TrackerRunner(FC, FC, FS, search_period=5.0,
                           search_async=True)
    try:
        deadline = time.monotonic() + 120.0
        acquired_at = None
        # loop the signal until the background search lands (wall-paced:
        # the worker needs real time to finish its ~1 s pipeline pass)
        while time.monotonic() < deadline:
            for i in range(0, len(sig), 10000):
                runner.process_block(sig[i: i + 10000])
            if runner.cells and acquired_at is None:
                acquired_at = time.monotonic()
            if acquired_at is not None:
                break
        assert runner.cells, "async searcher never acquired the cell"
        assert runner.cells[0].n_id_cell == 277
        # stream another pass: the tracker must hold the cell (the
        # looped signal repeats SFN=4, so MIB re-decode syncs are
        # imperfect across the splice; 90% still means solidly held)
        for i in range(0, len(sig), 10000):
            runner.process_block(sig[i: i + 10000])
        assert runner.cells[0].health_pct() > 90.0
    finally:
        runner.close()


def test_native_interp_pairs_matches_numpy():
    """The native pair time-interpolation (interp_pairs: per-pair alpha
    walk + 72-SC/scalar lerp) must match the numpy fallback's emitted
    ce_interp rows exactly, including the tick-boundary carry."""
    from lte_cell_scanner_tpu.io.native import get_lib
    from lte_cell_scanner_tpu.tracker.cell_tracker import \
        TrackedCellProcessor
    from lte_cell_scanner_tpu.tracker.state import GlobalState, TrackedCell

    if get_lib() is None:
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(13)

    def make_proc(cp, n_ports):
        state = GlobalState(fc_requested=FC, fc_programmed=FC,
                            fs_programmed=FS, frequency_offset=0.0)
        cell = TrackedCell(n_id_cell=277, n_id_1=92, n_id_2=1,
                           cp_type=cp, n_ports=n_ports, frame_timing=0.0)
        return TrackedCellProcessor(cell, state)

    for cp, port in ((CpType.NORMAL, 0), (CpType.NORMAL, 3),
                     (CpType.EXTENDED, 0)):
        n_symb = 7 if cp is CpType.NORMAL else 6
        proc_a = make_proc(cp, 4)
        proc_b = make_proc(cp, 4)
        proc_b._native = None
        # RS symbol walk: ports 0/1 hit syms {0, 4}/{0, 3}, ports 2/3
        # sym 1 -- synthesize the (slot, sym) labels accordingly
        m = 40
        if port > 2:
            slot = np.arange(m, dtype=np.int64) % 20
            sym = np.ones(m, np.int64)
        else:
            slot = (np.arange(m, dtype=np.int64) // 2) % 20
            sym = np.where(np.arange(m) % 2 == 0, 0,
                           4 if n_symb == 7 else 3).astype(np.int64)
        for sl in (slice(0, 7), slice(7, 8), slice(8, 29), slice(29, m)):
            k = sl.stop - sl.start
            ce72 = rng.normal(size=(k, 72)) + 1j * rng.normal(size=(k, 72))
            tp, sp, spr, npv = rng.normal(size=(4, k))
            args = (ce72, tp, sp, spr, npv, slot[sl], sym[sl])
            proc_a._interp_pairs(port, *args)
            proc_b._interp_pairs(port, *args)
        fa, fb = proc_a.ce_interp_fifo[port], proc_b.ce_interp_fifo[port]
        assert fa.n == fb.n and fa.n > 0
        a = fa.pop_n(fa.n)
        b = fb.pop_n(fb.n)
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y, atol=1e-14, rtol=0)


def test_native_port_tick_matches_two_step():
    """The fused native per-port tick (port_tick: windows + feedback +
    interp72 + pair time-interp with C-side carry) must reproduce the
    two-step numpy path (_rs_windows + _interp_pairs) exactly: same
    emitted ce_interp rows, same FO / frame-timing register
    trajectories, same ac_fd/ac_td blends, across tick boundaries."""
    from lte_cell_scanner_tpu.io.native import get_lib
    from lte_cell_scanner_tpu.tracker.cell_tracker import \
        TrackedCellProcessor
    from lte_cell_scanner_tpu.tracker.state import GlobalState, TrackedCell

    if get_lib() is None:
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(17)

    for cp, port in ((CpType.NORMAL, 0), (CpType.EXTENDED, 0)):
        n_symb = 7 if cp is CpType.NORMAL else 6

        def make(native):
            state = GlobalState(fc_requested=FC, fc_programmed=FC,
                                fs_programmed=FS, frequency_offset=100.0)
            cell = TrackedCell(n_id_cell=277, n_id_1=92, n_id_2=1,
                               cp_type=cp, n_ports=1, frame_timing=1234.5)
            proc = TrackedCellProcessor(cell, state)
            if not native:
                proc._native = None
            return state, cell, proc

        st_a, cell_a, proc_a = make(True)
        st_b, cell_b, proc_b = make(False)

        m = 120
        ce = rng.normal(size=(m, 12)) + 1j * rng.normal(size=(m, 12))
        shift = np.where(np.arange(m) % 2 == 0, 2, 5).astype(np.int64)
        slot = (np.arange(m, dtype=np.int64) // 2) % 20
        sym = np.where(np.arange(m) % 2 == 0, 0,
                       4 if n_symb == 7 else 3).astype(np.int64)
        fo = 100.0 + 0.1 * np.arange(m)
        ft = np.full(m, 1234.5)

        # ticks with the 2-row pending tail carried like process() does
        for sl in (slice(0, 31), slice(29, 30), slice(29, 84),
                   slice(82, m)):
            args = (ce[sl], shift[sl], slot[sl], sym[sl], fo[sl], ft[sl])
            if args[0].shape[0] >= 3:
                proc_a._port_tick(0, *args)
                mm = args[0].shape[0]
                o = proc_b._rs_windows(0, *args)
                proc_b._interp_pairs(0, *o, slot[sl][1:mm - 1],
                                     sym[sl][1:mm - 1])

        fa, fb = proc_a.ce_interp_fifo[0], proc_b.ce_interp_fifo[0]
        assert fa.n == fb.n and fa.n > 0
        a = fa.pop_n(fa.n)
        b = fb.pop_n(fb.n)
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y, atol=1e-12, rtol=0)
        assert abs(st_a.frequency_offset - st_b.frequency_offset) < 1e-6
        assert abs(cell_a.frame_timing - cell_b.frame_timing) < 1e-8
        np.testing.assert_allclose(cell_a.ac_fd, cell_b.ac_fd, atol=1e-10)
        np.testing.assert_allclose(cell_a.ac_td, cell_b.ac_td, atol=1e-10)


def test_native_cell_tick_matches_numpy_process():
    """Full process()-level parity for the fused native cell tick
    (cell_tick: CRS extraction + pending + windows + feedback + pair
    interp in one C call) against the all-numpy fallback, fed identical
    fd symbols across multiple ticks: identical register trajectories,
    EMA measurements, and interpolated-CE state."""
    from lte_cell_scanner_tpu.io.native import get_lib
    from lte_cell_scanner_tpu.tracker.cell_tracker import \
        TrackedCellProcessor
    from lte_cell_scanner_tpu.tracker.producer import PduChunk
    from lte_cell_scanner_tpu.tracker.state import GlobalState, TrackedCell

    if get_lib() is None:
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(23)

    for cp, n_ports in ((CpType.NORMAL, 2), (CpType.EXTENDED, 1),
                        (CpType.NORMAL, 4)):
        n_symb = 7 if cp is CpType.NORMAL else 6

        def make(native):
            state = GlobalState(fc_requested=FC, fc_programmed=FC,
                                fs_programmed=FS, frequency_offset=50.0)
            cell = TrackedCell(n_id_cell=277, n_id_1=92, n_id_2=1,
                               cp_type=cp, n_ports=n_ports,
                               frame_timing=100.0)
            proc = TrackedCellProcessor(cell, state)
            if not native:
                proc._native = None
            return state, cell, proc

        st_a, cell_a, proc_a = make(True)
        st_b, cell_b, proc_b = make(False)

        total = 20 * n_symb * 3 + 11     # ~3 frames, ragged tick edges
        S_all = rng.normal(size=(total, 72)) \
            + 1j * rng.normal(size=(total, 72))
        fo_all = 50.0 + 0.05 * np.arange(total)
        ft_all = np.full(total, 100.0)
        start = 0
        for n in (31, 1, 2, 54, 97, 40):
            n = min(n, total - start)
            if n <= 0:
                break
            sl = slice(start, start + n)
            chunk = PduChunk(data=np.zeros((n, 128), np.complex128),
                             late=np.zeros(n), fo=fo_all[sl].copy(),
                             ft=ft_all[sl].copy(), sym0=start)
            fd = S_all[sl]
            proc_a.process(chunk, fd_syms=fd.copy())
            proc_b.process(chunk, fd_syms=fd.copy())
            start += n

        assert abs(st_a.frequency_offset - st_b.frequency_offset) < 1e-6
        assert abs(cell_a.frame_timing - cell_b.frame_timing) < 1e-8
        np.testing.assert_allclose(cell_a.ac_fd, cell_b.ac_fd, atol=1e-10)
        np.testing.assert_allclose(cell_a.ac_td, cell_b.ac_td, atol=1e-10)
        assert cell_a.ce is not None and cell_b.ce is not None
        np.testing.assert_allclose(cell_a.ce, cell_b.ce, atol=1e-10)
        np.testing.assert_allclose(cell_a.crs_tp_av, cell_b.crs_tp_av,
                                   atol=1e-12)
        np.testing.assert_allclose(cell_a.crs_sp_raw_av,
                                   cell_b.crs_sp_raw_av, atol=1e-12)
        np.testing.assert_allclose(cell_a.crs_np_av, cell_b.crs_np_av,
                                   atol=1e-12)
        # native sync_snr vs numpy fallback (do_pss_sss_sigpower_ce)
        for f in ("sync_tp", "sync_sp", "sync_np", "sync_np_blank",
                  "sync_tp_av", "sync_sp_av", "sync_np_av",
                  "sync_np_blank_av"):
            a, b = getattr(cell_a, f), getattr(cell_b, f)
            assert not np.isnan(a) and not np.isnan(b), f
            np.testing.assert_allclose(a, b, atol=1e-12, err_msg=f)
        np.testing.assert_allclose(cell_a.sync_ce, cell_b.sync_ce,
                                   atol=1e-12)
        # remaining fifo state must match too (same pending/emitted split)
        for p in range(n_ports):
            fa = proc_a.ce_interp_fifo[p]
            fb = proc_b.ce_interp_fifo[p]
            assert fa.n == fb.n
        assert proc_a.data_fifo.n == proc_b.data_fifo.n
        assert cell_a.mib_decode_failures == cell_b.mib_decode_failures


def test_batched_get_fd_block_path_matches_data_path():
    """The raw-block device staging (upload the producer block once +
    gather windows on device) must reproduce the per-cell window-copy
    path exactly, including appendix routing for symbols whose starts
    are unknown (straddlers / stale blocks)."""
    from lte_cell_scanner_tpu.tracker.batched import batched_get_fd
    from lte_cell_scanner_tpu.tracker.cell_tracker import \
        TrackedCellProcessor
    from lte_cell_scanner_tpu.tracker.producer import PduChunk
    from lte_cell_scanner_tpu.tracker.state import GlobalState, TrackedCell

    rng = np.random.default_rng(8)
    state = GlobalState(fc_requested=FC, fc_programmed=FC,
                        fs_programmed=FS, frequency_offset=250.0)
    block = (rng.normal(size=4096) + 1j * rng.normal(size=4096))

    def make(n_id_cell, first_offset):
        cell = TrackedCell(n_id_cell=n_id_cell, n_id_1=n_id_cell // 3,
                           n_id_2=n_id_cell % 3, cp_type=CpType.NORMAL,
                           n_ports=2, n_rb_dl=6, frame_timing=0.0)
        a = TrackedCellProcessor(cell, state)
        b = TrackedCellProcessor(cell, state)
        a.bulk_phase_offset = b.bulk_phase_offset = 0.1 * n_id_cell % 1.0
        starts = first_offset + 137 * np.arange(8)
        data = np.stack([block[s: s + 128] for s in starts])
        starts = starts.astype(np.int64)
        starts[3] = -1                      # a straddler: appendix route
        chunk = PduChunk(data=data,
                         late=rng.uniform(-0.5, 2.0, size=8),
                         fo=250.0 + np.arange(8, dtype=float),
                         ft=np.zeros(8), sym0=0, start=starts,
                         block_seq=7)
        return a, b, chunk

    a1, b1, c1 = make(277, 5)
    a2, b2, c2 = make(100, 61)
    ref = batched_get_fd([(b1, c1), (b2, c2)], state, backend="device")
    got = batched_get_fd([(a1, c1), (a2, c2)], state, backend="device",
                         raw_block=block, block_seq=7)
    for r, g in zip(ref, got):
        assert np.allclose(g, r, atol=1e-10), np.abs(g - r).max()
    assert np.isclose(a1.bulk_phase_offset, b1.bulk_phase_offset)

    # stale block_seq: every symbol must fall back to the appendix and
    # still match (reset the accumulated bulk phases first)
    a1.bulk_phase_offset = b1.bulk_phase_offset = 0.7
    a2.bulk_phase_offset = b2.bulk_phase_offset = 0.2
    ref2 = batched_get_fd([(b1, c1), (b2, c2)], state, backend="device")
    got2 = batched_get_fd([(a1, c1), (a2, c2)], state, backend="device",
                          raw_block=block, block_seq=99)
    for r, g in zip(ref2, got2):
        assert np.allclose(g, r, atol=1e-10)


def test_device_loop_tracks_cell():
    """Device-loop mode (demod + CRS extraction on device, host f64
    control loops on the downloaded rows, tracker/device_loop.py) must
    acquire and hold a cell end-to-end: MIB sync, full health,
    converged FO -- the same assertions as the default-path fixture."""
    rng = np.random.default_rng(11)
    sig = create_dl_sig(CpType.NORMAL, 400, 0, 92, 1, 0.4, rng=rng,
                        n_ports=2, sfn=4)
    sig = awgn(apply_freq_offset(sig, F_OFF), 5.0, rng=rng)

    runner = TrackerRunner(FC, FC, FS, device_loop=True)
    for i in range(0, len(sig), 10000):
        runner.process_block(sig[i: i + 10000])

    assert len(runner.cells) == 1
    tc = runner.cells[0]
    assert tc.n_id_cell == 277
    proc = runner.processors[tc.n_id_cell]
    assert proc.mib_fifo_synchronized
    assert tc.health_pct() > 99.0
    assert abs(runner.state.frequency_offset - F_OFF) < 50.0


def test_device_loop_matches_fd_path():
    """The device-loop tick (on-device CRS/special extraction + sparse
    Phase C) must reproduce the device-fd path's trajectory (full [S,72]
    download + host-native extraction): same demod program, same host
    f64 control loops, so registers and measurements agree tightly."""
    from lte_cell_scanner_tpu.tracker import batched

    rng = np.random.default_rng(31)
    sig = create_dl_sig(CpType.NORMAL, 300, 0, 92, 1, 0.4, rng=rng,
                        n_ports=2, sfn=4)
    sig = awgn(apply_freq_offset(sig, F_OFF), 8.0, rng=rng)

    saved = batched._AUTO_BACKEND
    batched._AUTO_BACKEND = "device"   # both runners demod via the jit
    try:
        runs = []
        for dev_loop in (False, True):
            runner = TrackerRunner(FC, FC, FS, device_loop=dev_loop)
            for i in range(0, len(sig), 10000):
                runner.process_block(sig[i: i + 10000])
            runs.append(runner)
    finally:
        batched._AUTO_BACKEND = saved

    ref, got = runs
    assert len(ref.cells) == len(got.cells) == 1
    tr, tg = ref.cells[0], got.cells[0]
    assert tg.n_id_cell == tr.n_id_cell
    assert np.isclose(tg.frame_timing, tr.frame_timing, atol=1e-6)
    assert np.isclose(got.state.frequency_offset,
                      ref.state.frequency_offset, rtol=1e-9, atol=1e-6)
    assert tg.mib_decode_failures == tr.mib_decode_failures
    assert np.isclose(tg.sync_sp_av, tr.sync_sp_av, rtol=1e-7)
    assert np.isclose(tg.sync_np_av, tr.sync_np_av, rtol=1e-7)
    assert np.allclose(tg.crs_sp_raw_av, tr.crs_sp_raw_av, rtol=1e-7)
    assert np.allclose(tg.crs_np_av, tr.crs_np_av, rtol=1e-7)
    assert np.allclose(tg.ac_fd, tr.ac_fd, rtol=1e-6, atol=1e-9)
    assert np.allclose(tg.ce, tr.ce, rtol=1e-6, atol=1e-9)


def test_device_loop_four_port_and_extended_cp():
    """Device-loop mode with the two structurally different cell
    shapes: a 4-port cell (CRS on ports 2/3 only in symbol 1; the
    rs_pack plan has four port rows) and an extended-CP cell (6-symbol
    slots, 160-sample framing, different conj-table layout) -- both
    must hold full health with a synced MIB."""
    for cp, n_ports, n_id_1, want_id in (
            (CpType.NORMAL, 4, 100, 301),
            (CpType.EXTENDED, 2, 92, 277)):
        rng = np.random.default_rng(31)
        sig = create_dl_sig(cp, 400, 0, n_id_1, 1, 0.4, rng=rng,
                            n_ports=n_ports, sfn=12)
        sig = awgn(apply_freq_offset(sig, F_OFF), 10.0, rng=rng)

        runner = TrackerRunner(FC, FC, FS, device_loop=True)
        for i in range(0, len(sig), 10000):
            runner.process_block(sig[i: i + 10000])

        assert len(runner.cells) == 1, (cp, n_ports)
        tc = runner.cells[0]
        assert tc.n_id_cell == want_id
        assert tc.n_ports == n_ports
        assert tc.cp_type is cp
        proc = runner.processors[tc.n_id_cell]
        assert proc.mib_fifo_synchronized
        assert tc.health_pct() > 99.0, (cp, tc.health_pct())


def test_device_loop_takes_priority_over_parallel_cells():
    """device_loop and the parallel_cells pool must not interleave: a
    processor's device-loop counters and the dense process() path are
    mutually exclusive (single-cell ticks falling to a different branch
    would desynchronize the sparse label arithmetic).  With both
    requested, the device loop wins and tracking stays healthy."""
    rng = np.random.default_rng(22)
    a = create_dl_sig(CpType.NORMAL, 400, 0, 92, 1, 0.4, rng=rng,
                      n_ports=2, sfn=4)
    b = create_dl_sig(CpType.NORMAL, 400, 7, 90, 1, 0.4, rng=rng,
                      n_ports=2, sfn=8)
    sig = awgn(apply_freq_offset(a + 0.7 * b, 200.0), 12.0, rng=rng)

    runner = TrackerRunner(FC, FC, FS, device_loop=True, parallel_cells=2)
    for i in range(0, len(sig), 10000):
        runner.process_block(sig[i: i + 10000])
    runner.close()

    got = {tc.n_id_cell: tc for tc in runner.cells}
    assert set(got) == {277, 271}
    for tc in got.values():
        assert tc.health_pct() > 99.0
