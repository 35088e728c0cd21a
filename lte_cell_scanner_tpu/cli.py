"""Command-line tools: cell search scanner and realtime tracker.

Behavioral contract: the reference CLIs --
CellSearch (/root/reference/src/CellSearch.cpp:92-280: --freq-start/-s,
--freq-end/-e, --ppm/-p, --correction/-c, --record/-r, --load/-l,
--data-dir/-d, --device-index/-i; 100 kHz raster rounding, record/load
exclusivity) and LTE-Tracker (/root/reference/src/LTE-Tracker.cpp:114-373:
--freq/-f plus the hidden debug flags --load/--repeat/--drop/--rtl_sdr/
--noise-power).

Usage:
    python -m lte_cell_scanner_tpu.cli search -s 739e6 --load -d DIR
    python -m lte_cell_scanner_tpu.cli track -f 739e6 --load FILE.it
    python -m lte_cell_scanner_tpu.cli search -s 739e6 --sim
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

import numpy as np


def _freq_formatter(freq: float) -> str:
    """Reference freq_formatter (CellSearch.cpp:322-340)."""
    a = abs(freq)
    for limit, div, suf in ((998.0, 1.0, "h"), (998e3, 1e3, "k"),
                            (998e6, 1e6, "m"), (998e9, 1e9, "g")):
        if a < limit:
            return f"{freq / div:5.3g}{suf}"
    return str(freq)


def _print_cells(cells, correction: float) -> None:
    """Final results table (reference CellSearch.cpp:576-614)."""
    if not cells:
        print("No LTE cells were found...")
        return
    print("Detected the following cells:")
    print("A: #antenna ports C: CP type ; P: PHICH duration ; "
          "PR: PHICH resource type")
    print("CID A      fc   foff RXPWR C nRB P  PR CrystalCorrectionFactor")
    for c in cells:
        cp = {"normal": "N", "extended": "E"}.get(c.cp_type.value, "U")
        pd = {"normal": "N", "extended": "E"}.get(
            c.phich_duration.value, "U")
        pr = {"1/6": "1/6", "1/2": "1/2", "one": "one",
              "two": "two"}.get(c.phich_resource.value, "UNK")
        # best available offset estimate: --no-decode runs stop at
        # freq_fine (freq_superfine stays NaN)
        foff = c.freq_superfine
        if not np.isfinite(foff):
            foff = c.freq_fine if np.isfinite(c.freq_fine) else c.freq
        true_loc = c.fc_requested
        crystal_actual = c.fc_requested - foff
        corr_new = correction * (true_loc / crystal_actual)
        print(f"{c.n_id_cell():3d} {c.n_ports:1d} "
              f"{c.fc_requested / 1e6:6.5g}M "
              f"{_freq_formatter(foff)} "
              f"{10 * np.log10(c.pss_pow):5.3g} {cp} {c.n_rb_dl:3d} {pd} "
              f"{pr} {corr_new:.20g}")


def _make_source(args):
    from .cell import CpType
    from .io.capture import FileSource, SimSource
    if getattr(args, "live", False):
        from .io.rtlsdr import RtlSdrSource
        try:
            return RtlSdrSource(
                device_index=max(0, getattr(args, "device_index", 0)),
                correction=getattr(args, "correction", 1.0))
        except RuntimeError as e:
            raise SystemExit(f"Error: {e}")
    if getattr(args, "sim", False):
        n_id_cell = getattr(args, "sim_cell", 277)
        if not 0 <= n_id_cell <= 503:
            raise SystemExit("Error: --sim-cell must be in 0..503")
        fc = getattr(args, "freq_start", None) or getattr(args, "freq", 0.0)
        return SimSource(n_id_1=n_id_cell // 3, n_id_2=n_id_cell % 3,
                         cp_type=CpType(getattr(args, "sim_cp", "normal")),
                         n_ports=getattr(args, "sim_ports", 2),
                         snr_db=args.sim_snr, freq_offset=args.sim_foff,
                         capture_ms=getattr(args, "capture_ms", 80),
                         coupled_fc=fc if getattr(args, "sim_coupled",
                                                  False) else 0.0)
    if args.load_files:
        return FileSource(args.load_files, drop_seconds=args.drop,
                          repeat=args.repeat,
                          noise_power=args.noise_power)
    return None


def cmd_search(args) -> int:
    from .constants import FS_WORK
    from .io.capture import CaptureSession
    from .models.search import (SearchConfig, cell_search, dedup,
                                default_f_search_set)
    from .utils.debug import enable_profiling, profile_report, set_verbosity
    if args.brief:
        args.verbose = 0
    set_verbosity(args.verbose)
    if args.profile:
        enable_profiling()

    freq_start = args.freq_start
    freq_end = args.freq_end if args.freq_end else freq_start
    # second-order validation, reference CellSearch.cpp:222-262
    if freq_start < 1e6:
        print("Error: start frequency must be greater than 1MHz")
        return 1
    if freq_end < freq_start:
        print("Error: end frequency must be >= start frequency")
        return 1
    # round to the 100 kHz raster as the reference does
    for name, v in (("freq-start", freq_start), ("freq-end", freq_end)):
        if abs(v - round(v / 100e3) * 100e3) > 1:
            print(f"Warning: {name} rounded to the 100 kHz raster")
    freq_start = round(freq_start / 100e3) * 100e3
    freq_end = round(freq_end / 100e3) * 100e3
    if args.ppm < 0:
        print("Error: ppm value must be positive")
        return 1
    if args.ppm > 200:
        print("Warning: ppm value appears to be set unreasonably high")
    if abs(args.correction - 1) > 1000e-6:
        print("Warning: crystal correction factor appears to be "
              "unreasonable")
    if args.record and (args.load or args.load_files):
        print("Error: cannot both record and load")
        return 1
    if args.capture_ms < 80:
        print("Error: --capture-ms must be >= 80 (one full 40 ms PBCH "
              "period regardless of frame phase needs an 80 ms capture)")
        return 1

    args.live = not (args.sim or args.load or args.load_files)
    source = _make_source(args)
    if args.load:
        source = None  # capture_data reads capbuf_XXXX.it from data_dir

    f_search_set = default_f_search_set(freq_start, args.ppm)
    fc_search_set = np.arange(freq_start, freq_end + 1, 100e3)
    cfg = SearchConfig(interp=args.interp, compat=args.compat,
                       thresh2_n_sigma=float(args.thresh2_sigma),
                       decode=not args.no_decode,
                       corr_backend=args.corr_backend)

    if args.coordinator:
        # multi-host entry path: join the jax.distributed runtime, scan
        # this process's slice of the band, all-gather + dedup globally
        # (parallel/multihost.py)
        from .parallel.multihost import initialize, scan_band_multihost
        # globally-computable guard BEFORE joining the distributed
        # runtime: every process evaluates the same condition on the
        # same band definition, so all of them exit uniformly -- a
        # per-process empty-slice check after initialize() would leave
        # the peers hanging in the first collective
        if len(fc_search_set) < args.num_processes:
            print(f"Error: band has fewer carriers "
                  f"({len(fc_search_set)}) than processes "
                  f"({args.num_processes}); some process would own none")
            return 1
        initialize(args.coordinator, args.num_processes, args.process_id)
        import jax
        session = CaptureSession(args.data_dir)
        captures = []
        # capture only this process's REAL carriers, each numbered by
        # its GLOBAL band index so --load replays (and --record writes)
        # the right strided capbuf_XXXX.it files even on a shared
        # data dir; scan_band_multihost pads unequal slices itself
        for k, fc in enumerate(fc_search_set[args.process_id::
                                             args.num_processes]):
            fc = float(fc)
            band_idx = args.process_id + k * args.num_processes
            if args.verbose:
                print(f"[proc {args.process_id}] capturing "
                      f"{fc / 1e6:.4g} MHz (band index {band_idx}) ...")
            capbuf, fc_programmed = session.capture_data(
                fc, source, save_cap=args.record,
                use_recorded_data=args.load,
                tuner="none" if (args.load or source) else "e4000",
                index=band_idx)
            captures.append((capbuf, fc, fc_programmed))
        local_lists, merged = scan_band_multihost(
            captures, f_search_set, FS_WORK, cfg)
        if jax.process_index() == 0:
            _print_cells(merged, args.correction)
            if args.profile:
                print()
                print(profile_report())
        return 0

    import jax
    shard_carriers = args.shard_carriers
    if shard_carriers is None:
        # multi-device: carriers spread over the mesh.  Single
        # accelerator: still batch the whole band into one vmapped
        # device program per stage (tools/bench_carriers.py measures
        # why); serial per-carrier only on the plain CPU backend.
        shard_carriers = len(fc_search_set) > 1 and (
            jax.device_count() > 1 or jax.default_backend() != "cpu")

    if shard_carriers:
        # capture every carrier first, then scan the whole band as one
        # carrier-sharded SPMD program (parallel/carriers.py)
        from .parallel.carriers import scan_band
        session = CaptureSession(args.data_dir)
        captures = []
        for fc in fc_search_set:
            if args.verbose:
                print(f"Capturing center frequency {fc / 1e6:.4g} MHz ...")
            capbuf, fc_programmed = session.capture_data(
                fc, source, save_cap=args.record,
                use_recorded_data=args.load,
                tuner="none" if (args.load or source) else "e4000")
            captures.append((capbuf, fc, fc_programmed))
        if args.verbose:
            print(f"Scanning {len(captures)} carriers across "
                  f"{jax.device_count()} devices ...")
        all_cells = scan_band(captures, f_search_set, FS_WORK, cfg)
        for cells in all_cells:
            for c in cells:
                if args.verbose:
                    print(f"  Detected a cell! {c}")
    else:
        # single carrier (or serial scan) with >1 device: shard the
        # hypothesis sweep's front end over a (t x 1) time-block mesh
        # (overlap-save halo exchange) instead of leaving devices idle
        shard_hyp = args.shard_hypotheses
        if shard_hyp is None:
            shard_hyp = jax.device_count() > 1
        elif shard_hyp and jax.device_count() == 1:
            print("Warning: --shard-hypotheses requested but only one "
                  "device is visible; running single-device")
            shard_hyp = False
        mesh = None
        if shard_hyp and jax.device_count() > 1:
            from .parallel.sharded import make_mesh
            mesh = make_mesh(jax.device_count(), 1)
        session = CaptureSession(args.data_dir)
        all_cells = []
        for fc in fc_search_set:
            if args.verbose:
                print(f"Examining center frequency {fc / 1e6:.4g} MHz ...")
            capbuf, fc_programmed = session.capture_data(
                fc, source, save_cap=args.record,
                use_recorded_data=args.load,
                tuner="none" if (args.load or source) else "e4000")
            cells = cell_search(capbuf, f_search_set, fc, fc_programmed,
                                FS_WORK, cfg, mesh=mesh)
            for c in cells:
                if args.verbose:
                    print(f"  Detected a cell! {c}")
            all_cells.append(cells)
    _print_cells(dedup(all_cells), args.correction)
    if args.profile:
        print()
        print(profile_report())
    return 0


def cmd_track(args) -> int:
    from .constants import FS_WORK
    from .tracker import TrackerRunner
    from .tracker.display import render

    if args.brief:
        args.verbose = 0
    if args.ppm < 0:
        print("Error: ppm value must be positive")
        return 1
    if abs(args.correction - 1) > 1000e-6:
        print("Warning: crystal correction factor appears to be "
              "unreasonable")

    args.live = not (args.sim or args.load_files)
    source = _make_source(args)
    if source is None:
        print("Error: tracker needs --load FILE(s), --sim, or a dongle")
        return 1

    import jax
    shard_search = args.shard_search
    if shard_search is None:
        shard_search = jax.device_count() > 1
    elif shard_search and jax.device_count() == 1:
        print("Warning: --shard-search requested but only one device is "
              "visible; running single-device")
        shard_search = False
    mesh = None
    if shard_search and jax.device_count() > 1:
        from .parallel.sharded import make_mesh
        mesh = make_mesh(jax.device_count(), 1)

    # kalibrate bootstrap (reference LTE-Tracker.cpp:565-741): run a
    # full +-ppm cell search on one capture and seed the dongle FO
    # register from the strongest cell's superfine estimate -- without
    # it the single-hypothesis background searcher cannot acquire
    # beyond ~+-2.5 kHz of crystal error.
    initial_fo = 0.0
    if not args.no_kalibrate:
        from .tracker.runner import kalibrate
        if args.verbose:
            print(f"kalibrate: searching +-{args.ppm:g} ppm for a cell ...")
        try:
            initial_fo = kalibrate(
                lambda: source.capture(args.freq)[0], args.freq,
                args.freq, FS_WORK, ppm=args.ppm,
                max_tries=args.kalibrate_tries or None)
            if args.verbose:
                print(f"kalibrate: dongle frequency offset "
                      f"{initial_fo:.1f} Hz")
        except Exception as e:
            print(f"kalibrate found no cell ({e}); starting at 0 Hz")

    from .models.search import SearchConfig
    runner = TrackerRunner(args.freq, args.freq, FS_WORK,
                           initial_fo=initial_fo,
                           search_config=SearchConfig(
                               corr_backend=args.corr_backend),
                           search_period=args.search_period,
                           search_mesh=mesh,
                           search_async=args.async_search,
                           search_duty=args.search_duty,
                           parallel_cells=args.parallel_cells,
                           debug_knobs=tuple(
                               getattr(args, f"g{i}") for i in
                               range(1, 10)))
    if not args.no_warmup:
        if args.verbose:
            print("Compiling the search/decode path (one-time warmup) ...")
        runner.warmup()

    use_tui = sys.stdout.isatty() and not args.no_tui
    if use_tui:
        # the reference's live ncurses dashboard (display_thread.cpp)
        from .tracker.tui import run_tui
        stream = iter(source.stream(10000))
        n_blocks = [0]

        def process_for(seconds: float) -> bool:
            n = max(1, int(args.fs * seconds) // 10000)
            for _ in range(n):
                if args.duration and \
                        n_blocks[0] * 10000 / args.fs >= args.duration:
                    return False
                block = next(stream, None)
                if block is None:
                    return False
                runner.process_block(block)
                n_blocks[0] += 1
            if hasattr(source, "dropped_seconds"):
                runner.state.usb_seconds_dropped = source.dropped_seconds()
            return True

        try:
            run_tui(process_for, runner.state, lambda: runner.cells)
        except KeyboardInterrupt:
            pass
        finally:
            runner.close()
        print(render(runner.state, runner.cells, plots=args.expert))
        return 0

    n_blocks = 0
    report_every = max(1, int(args.fs * 1.0) // 10000)
    try:
        for block in source.stream(10000):
            runner.process_block(block)
            n_blocks += 1
            if hasattr(source, "dropped_seconds"):
                runner.state.usb_seconds_dropped = source.dropped_seconds()
            if n_blocks % report_every == 0:
                print(render(runner.state, runner.cells,
                             plots=args.expert))
                print("-" * 70)
            if args.duration and n_blocks * 10000 / args.fs >= args.duration:
                break
    except KeyboardInterrupt:
        pass
    finally:
        runner.close()
    print(render(runner.state, runner.cells, plots=args.expert))
    return 0


def cmd_check(args) -> int:
    """Capture-integrity diagnostics (the reference rtl_sdr_check binary,
    /root/reference/src/rtl_sdr_check.cpp:280-424)."""
    from .diag import check_capture
    from .utils.itfile import read_itfile
    from .utils.rtl import read_rtlsdr_file

    if args.file.endswith(".it"):
        d = read_itfile(args.file)
        if "capbuf" not in d:
            raise ValueError(f"{args.file} has no 'capbuf' variable "
                             f"(found: {sorted(d) or 'none'})")
        cap = d["capbuf"]
    else:
        cap = read_rtlsdr_file(args.file)
    res = check_capture(cap, args.freq, args.foff, args.fs, args.cell_id,
                        drop_seconds=args.drop)
    print(f"Samples: {res.n_samples}  peak {res.peak_power_db:.1f} dB  "
          f"peak/avg {res.peak_to_average:.0f}  "
          f"expected period {res.expected_period:.3f}")
    if not res.sync_found():
        print("No sync-signal correlation found -- wrong cell ID / freq "
              "offset, or no such cell in this capture.")
        return 1
    print(f"{'location':>10} {'diff':>8} {'dropped':>8}  flag")
    for p in res.peaks:
        print(f"{p.location:>10} {p.diff_with_prev:>8} {p.n_dropped:>8}  "
              f"{p.severity}")
    if res.missing:
        print(f"Missing peaks near: {res.missing}")
    worst = res.worst_drop()
    print(f"Worst drop: {worst} samples"
          + ("  (capture is CLEAN)" if worst <= 2 else ""))
    return 0 if worst <= 2 and not res.missing else 2


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="lte-cell-scanner-tpu")
    p.add_argument("--platform", choices=["tpu", "cpu", "default"],
                   default="default",
                   help="JAX backend (cpu also enables float64)")
    sub = p.add_subparsers(dest="command", required=True)

    ps = sub.add_parser("search", help="scan carriers for LTE cells")
    ps.add_argument("-s", "--freq-start", type=float, required=True)
    ps.add_argument("-e", "--freq-end", type=float, default=None)
    ps.add_argument("-p", "--ppm", type=float, default=120.0)
    ps.add_argument("-c", "--correction", type=float, default=1.0)
    ps.add_argument("-r", "--record", action="store_true")
    ps.add_argument("-l", "--load", action="store_true",
                    help="replay capbuf_XXXX.it files from --data-dir")
    ps.add_argument("-d", "--data-dir", default=".")
    ps.add_argument("-i", "--device-index", type=int, default=-1)
    ps.add_argument("-v", "--verbose", action="count", default=1)
    ps.add_argument("-b", "--brief", action="store_true",
                    help="reduce status messages (reference -b)")
    ps.add_argument("--profile", action="store_true",
                    help="print a per-stage wall-time table after "
                         "the scan")
    ps.add_argument("--load-files", nargs="*", default=None,
                    help="replay specific .it or raw rtl_sdr files")
    ps.add_argument("--sim", action="store_true",
                    help="use the synthetic eNodeB source")
    ps.add_argument("--sim-snr", type=float, default=10.0)
    ps.add_argument("--sim-foff", type=float, default=0.0)
    ps.add_argument("--sim-ports", type=int, default=2, choices=(1, 2, 4),
                    help="sim eNodeB TX ports (4 = SFBC+FSTD)")
    ps.add_argument("--sim-cp", default="normal",
                    choices=("normal", "extended"))
    ps.add_argument("--sim-cell", type=int, default=277,
                    help="sim cell ID (0..503)")
    ps.add_argument("--sim-coupled", action="store_true",
                    help="apply --sim-foff through the coupled-crystal "
                         "channel (carrier + sample clock offset together)")
    ps.add_argument("--capture-ms", type=int, default=80,
                    help="sim capture length; >80 ms lengthens the "
                         "incoherent fold for more detection SNR")
    ps.add_argument("--noise-power", type=float, default=None)
    ps.add_argument("--drop", type=float, default=0.0)
    ps.add_argument("--repeat", action="store_true")
    ps.add_argument("--interp", default="hex",
                    choices=("hex", "2stage", "freq_time"),
                    help="channel-estimate interpolator (reference "
                         "default: hex/Delaunay, searcher.cpp:1474)")
    ps.add_argument("--compat", default="production",
                    choices=("production", "golden"),
                    help="numerical-contract variant: production = the "
                         "modern C++ formulas; golden = the MATLAB "
                         "semantics the shipped test vectors encode")
    ps.add_argument("--thresh2-sigma", type=float, default=3.0,
                    help="SSS log-likelihood acceptance threshold in "
                         "sigmas (reference THRESH2_N_SIGMA = 3)")
    ps.add_argument("--no-decode", action="store_true",
                    help="stop after SSS detection + fine FOE (skip "
                         "tfg/tfoec/MIB)")
    ps.add_argument("--corr-backend", default="auto",
                    choices=("auto", "pallas", "xla"),
                    help="correlation backend: auto = the Pallas "
                         "block-Toeplitz kernel on TPU (the production "
                         "route, ~2.4x the XLA dot), the XLA im2col dot "
                         "elsewhere; pallas/xla force either")
    ps.add_argument("--coordinator", default=None,
                    help="HOST:PORT of process 0 -- enables the "
                         "multi-host band scan (jax.distributed over "
                         "DCN; every process runs the same command with "
                         "its own --process-id)")
    ps.add_argument("--num-processes", type=int, default=1)
    ps.add_argument("--process-id", type=int, default=0)
    ps.add_argument("--shard-carriers", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="scan all carriers as one carrier-sharded SPMD "
                         "program (default: auto when >1 device is "
                         "visible; --no-shard-carriers forces serial)")
    ps.add_argument("--shard-hypotheses",
                    action=argparse.BooleanOptionalAction, default=None,
                    help="shard a serial/single-carrier scan's hypothesis "
                         "sweep over a time-block mesh (default: auto when "
                         ">1 device; --no-shard-hypotheses forces the "
                         "single-device front end)")
    ps.set_defaults(func=cmd_search)

    pt = sub.add_parser("track", help="realtime multi-cell tracker")
    pt.add_argument("-f", "--freq", type=float, required=True)
    pt.add_argument("--fs", type=float, default=1.92e6)
    pt.add_argument("--load-files", nargs="*", default=None)
    pt.add_argument("--sim", action="store_true")
    pt.add_argument("--sim-snr", type=float, default=10.0)
    pt.add_argument("--sim-foff", type=float, default=0.0)
    pt.add_argument("--sim-ports", type=int, default=2, choices=(1, 2, 4),
                    help="sim eNodeB TX ports (4 = SFBC+FSTD)")
    pt.add_argument("--sim-cp", default="normal",
                    choices=("normal", "extended"))
    pt.add_argument("--sim-cell", type=int, default=277,
                    help="sim cell ID (0..503)")
    pt.add_argument("--sim-coupled", action="store_true",
                    help="apply --sim-foff through the coupled-crystal "
                         "channel (carrier + sample clock offset together)")
    pt.add_argument("--noise-power", type=float, default=None)
    pt.add_argument("--drop", type=float, default=0.0)
    pt.add_argument("--repeat", action="store_true")
    pt.add_argument("--duration", type=float, default=None,
                    help="seconds of stream to process")
    pt.add_argument("--search-period", type=float, default=1.0,
                    help="min stream-seconds between background-search "
                         "cycles once tracking (0 = every capture, the "
                         "reference's continuous low-priority cadence)")
    pt.add_argument("--search-duty", type=float, default=0.5,
                    help="max CPU share of the background searcher once "
                         "tracking: the next search waits until "
                         "cycle_time/duty stream-seconds since the last "
                         "(load-adaptive nice+20 analog; 0 = period-only "
                         "cadence)")
    pt.add_argument("--parallel-cells", type=int, default=0,
                    help=">1: run each cell's tracker tick on a worker "
                         "pool of this size (the reference's "
                         "thread-per-cell layout; the global FO register "
                         "update order becomes scheduling-dependent, the "
                         "reference's documented benign race)")
    pt.add_argument("--async-search", action="store_true",
                    help="run the background searcher on a nice+19 "
                         "worker thread concurrent with streaming (the "
                         "reference's searcher-thread layout; use with "
                         "wall-clock-paced sources -- file/sim replay "
                         "feeds faster than realtime, so an async "
                         "acquisition could land after a short stream "
                         "ends)")
    pt.add_argument("--shard-search", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="run the background searcher's front end sharded "
                         "over all visible devices (overlap-save time "
                         "blocks; default: auto when >1 device)")
    pt.add_argument("-p", "--ppm", type=float, default=120.0,
                    help="crystal-error window for the kalibrate "
                         "bootstrap search")
    pt.add_argument("-c", "--correction", type=float, default=1.0)
    pt.add_argument("-i", "--device-index", type=int, default=-1)
    pt.add_argument("--corr-backend", default="auto",
                    choices=("auto", "pallas", "xla"),
                    help="correlation backend for the background "
                         "searcher (same switch as search)")
    pt.add_argument("--kalibrate-tries", type=int, default=0,
                    help="max kalibrate search attempts (0 = retry "
                         "until a cell is found, the reference's loop; "
                         "bounded file replay ends the loop by running "
                         "out of captures)")
    pt.add_argument("--no-kalibrate", action="store_true",
                    help="skip the initial wide-ppm calibration search")
    pt.add_argument("-v", "--verbose", action="count", default=1)
    pt.add_argument("-b", "--brief", action="store_true",
                    help="reduce status messages (reference -b)")
    pt.add_argument("--no-warmup", action="store_true",
                    help="skip the one-time search-path compile warmup "
                         "before streaming (first acquisition will stall)")
    pt.add_argument("-x", "--expert", action="store_true",
                    help="show ASCII channel/autocorrelation plots")
    pt.add_argument("--no-tui", action="store_true",
                    help="disable the interactive curses dashboard even "
                         "on a tty (plain periodic prints)")
    for i in range(1, 10):
        # the reference's hidden generic debug knobs
        # (LTE-Tracker.cpp:158-166); surfaced on GlobalState.g for
        # experimental tracker code, consumed by no production path
        pt.add_argument(f"--g{i}", type=float, default=0.0,
                        help=argparse.SUPPRESS)
    pt.set_defaults(func=cmd_track)

    pc = sub.add_parser("check", help="scan a capture for dropped samples")
    pc.add_argument("file", help=".it capture or raw rtl_sdr u8 file")
    pc.add_argument("-f", "--freq", type=float, required=True)
    pc.add_argument("--cell-id", type=int, required=True,
                    help="known cell ID whose sync signals to correlate")
    pc.add_argument("--foff", type=float, default=0.0)
    pc.add_argument("--fs", type=float, default=1.92e6)
    pc.add_argument("--drop", type=float, default=0.0,
                    help="seconds to skip at the start (AGC settle)")
    pc.set_defaults(func=cmd_check)

    args = p.parse_args(argv)
    if args.platform != "default":
        import os

        import jax
        platform = args.platform
        if platform == "tpu" and "axon" in os.environ.get("JAX_PLATFORMS",
                                                          ""):
            # this container reaches the chip only through the
            # experimental "axon" PJRT plugin
            platform = "axon"
        jax.config.update("jax_platforms", platform)
        if args.platform == "cpu":
            jax.config.update("jax_enable_x64", True)
    if not hasattr(args, "load_files") or args.load_files is None:
        args.load_files = []
    try:
        return args.func(args)
    except FileNotFoundError as e:
        print(f"Error: file not found: {e.filename}", file=sys.stderr)
        return 1
    except ValueError as e:
        print(f"Error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
