"""Steady-state multi-cell tracker realtime benchmark.

Measures the streaming tracker's realtime factor (stream-seconds
processed per wall-clock second) with N simultaneous simulated eNodeBs,
the figure the reference documents as "can track approximately 4 cells
with two antenna ports" in realtime on a dual-core i7-2640
(doc/LTE-Tracker.html, SURVEY.md section 6).

Methodology (matches docs/SCALING.md "Tracker realtime factor"):

- N cells x 2 antenna ports, distinct cell IDs and NON-overlapping
  frame timings (distinct slot_start), summed at equal power + AWGN.
  Overlapping frame timings let per-cell work coalesce in the batched
  demod front end and overstate capacity; distinct timings are the
  honest worst case (every tick frames symbols for some cell).
- Acquisition phase streams until all N cells are tracked (untimed),
  then `--runs` timed segments of `--seconds` stream-seconds each run
  through the full event loop (producer framing, batched demod,
  RS-window control loops, CE interpolation, MIB re-decodes, background
  searcher at its duty-cycled cadence).  Best-of-runs is reported: this
  is a shared noisy host, and the best run is the least-preempted one.

Usage:
  python tools/bench_tracker.py [--cells 4] [--runs 3] [--seconds 5.5]
                                [--snr 12] [--json]

Prints one line per cell count, or one JSON line with --json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# The streaming tracker is a host-paced workload (many small per-tick
# steps); the realtime factor is a property of the host event loop, so
# pin the CPU backend (BENCH_TRACKER_PLATFORM overrides).  A
# sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon, so the override must go through jax.config, not
# os.environ (same note as tests/conftest.py).
import jax  # noqa: E402

_platform = os.environ.get("BENCH_TRACKER_PLATFORM", "cpu")
jax.config.update("jax_platforms", _platform)
if _platform == "cpu":
    jax.config.update("jax_enable_x64", True)

FC = 739e6
FS = 1.92e6
CHUNK_MS = 1000
BLOCK = 10000

# distinct (n_id_1, slot_start, sfn0) per cell; slot starts spread over
# the 10 ms frame so no two cells share symbol framing ticks
CELL_PLAN = [(92, 0, 4), (90, 7, 8), (88, 13, 16), (86, 5, 32),
             (84, 11, 64), (82, 17, 128), (80, 3, 256), (78, 9, 512)]


class MultiCellStream:
    """Endless summed N-eNodeB stream, generated in 1 s chunks.

    Each cell's CRS/PBCH sequence continues exactly across chunk
    boundaries (the SFN advances by CHUNK_MS/10 frames per chunk); only
    the random QPSK filler re-rolls, which no tracker stage depends on.
    """

    def __init__(self, n_cells, snr_db, f_off=200.0, seed=7):
        from lte_cell_scanner_tpu.cell import CpType
        self.cp = CpType.NORMAL
        self.plan = CELL_PLAN[:n_cells]
        self.snr_db = snr_db
        self.f_off = f_off
        self.rng = np.random.default_rng(seed)
        self.chunk_idx = 0
        self.pending = np.zeros(0, np.complex64)
        self.pos = 0  # absolute sample index (continuous mixer phase)

    def _chunk(self):
        from lte_cell_scanner_tpu.sim import awgn, create_dl_sig
        n = int(CHUNK_MS * FS / 1000)
        acc = np.zeros(n, np.complex128)
        frames_per_chunk = CHUNK_MS // 10
        for (n_id_1, slot_start, sfn0) in self.plan:
            sfn = (sfn0 + self.chunk_idx * frames_per_chunk) % 1024
            acc += create_dl_sig(self.cp, CHUNK_MS, slot_start, n_id_1, 1,
                                 0.4, rng=self.rng, n_ports=2, sfn=sfn)
        self.chunk_idx += 1
        t = self.pos + np.arange(n)
        acc *= np.exp(1j * 2 * np.pi * self.f_off * t / FS)
        self.pos += n
        sig = awgn(acc, self.snr_db, rng=self.rng)
        # the dongle source model (capbuf.cpp:174): per-plane RMS at
        # ~1/4 full scale, quantized onto the 8-bit (x-127)/128 grid --
        # the stream a real RTL2832 delivers, and what lets the
        # device-loop upload ride exact float16 planes
        rms = float(np.sqrt(np.mean(sig.real ** 2 + sig.imag ** 2) / 2))
        s = 0.25 / max(rms, 1e-30)
        k_re = np.clip(np.round(sig.real * s * 128), -127, 128)
        k_im = np.clip(np.round(sig.imag * s * 128), -127, 128)
        return ((k_re + 1j * k_im) / 128.0).astype(np.complex64)

    def take(self, n: int) -> np.ndarray:
        """Pregenerate n samples (for the TIMED segments: generation is
        ~10x slower than realtime at 4 cells and must not pollute the
        wall-clock measurement)."""
        parts = [self.pending]
        have = len(self.pending)
        while have < n:
            c = self._chunk()
            parts.append(c)
            have += len(c)
        buf = np.concatenate(parts)
        self.pending = buf[n:]
        return buf[:n]


def bench_one(n_cells, runs, seconds, snr_db, verbose=True, profile=False,
              parallel=0, acq_seconds=30.0, device_loop=None):
    from lte_cell_scanner_tpu.tracker import TrackerRunner

    stream = MultiCellStream(n_cells, snr_db)
    runner = TrackerRunner(FC, FC, FS, parallel_cells=parallel,
                           device_loop=device_loop)
    runner.warmup()

    # ---- acquisition (untimed): all N cells tracked ----
    # (all stream reads go through take(); a suspended generator would
    # hold a yielded-but-not-yet-consumed block and corrupt continuity)
    fed = 0
    limit = int(acq_seconds * FS)
    while len(runner.cells) < n_cells:
        runner.process_block(stream.take(BLOCK))
        fed += BLOCK
        if fed > limit:
            raise RuntimeError(
                f"acquired only {len(runner.cells)}/{n_cells} cells "
                f"in {fed / FS:.1f} s of stream")
    # settle: let the last cell reach MIB sync before timing
    for _ in range(int(0.5 * FS) // BLOCK):
        runner.process_block(stream.take(BLOCK))

    # ---- timed steady-state segments (signal pregenerated) ----
    n_blocks = int(seconds * FS) // BLOCK
    factors = []
    prof = None
    if profile:
        import cProfile
        prof = cProfile.Profile()
    for r in range(runs):
        seg = stream.take(n_blocks * BLOCK)
        views = [seg[i * BLOCK: (i + 1) * BLOCK] for i in range(n_blocks)]
        t0 = time.perf_counter()
        if prof is not None:
            prof.enable()
        for v in views:
            runner.process_block(v)
        if prof is not None:
            prof.disable()
        wall = time.perf_counter() - t0
        stream_s = n_blocks * BLOCK / FS
        factors.append(stream_s / wall)
        if verbose:
            print(f"  run {r + 1}: {stream_s:.1f} s stream / "
                  f"{wall:.2f} s wall = {factors[-1]:.2f}x realtime",
                  file=sys.stderr)

    if prof is not None:
        import pstats
        pstats.Stats(prof, stream=sys.stderr).sort_stats(
            "cumulative").print_stats(35)
    ok = all(tc.health_pct() > 95.0 for tc in runner.cells)
    if not ok and verbose:
        print("  WARNING: not all cells at full health during the bench",
              file=sys.stderr)
        for tc in runner.cells:
            print(f"    cell {tc.n_id_cell}: health {tc.health_pct():.1f}%"
                  f" ({tc.mib_decode_failures:.1f} failures)",
                  file=sys.stderr)
    runner.close()
    return max(factors), ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=4)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--seconds", type=float, default=5.5)
    ap.add_argument("--snr", type=float, default=12.0)
    ap.add_argument("--acq-seconds", type=float, default=30.0,
                    help="acquisition stream budget before giving up "
                         "(co-channel cells interfere; high counts "
                         "legitimately acquire slowly)")
    ap.add_argument("--sweep", action="store_true",
                    help="bench 1..--cells instead of just --cells")
    ap.add_argument("--block", type=int, default=10000,
                    help="samples per process_block tick.  Larger "
                         "blocks = coarser ticks: on a remote/tunnel "
                         "accelerator each tick is one device dispatch "
                         "(~RTT-bound), so deployment-mode TPU runs "
                         "amortize by ticking at 50-100 ms granularity")
    ap.add_argument("--profile", action="store_true",
                    help="cProfile the timed segments, print top stats")
    ap.add_argument("--parallel", type=int, default=0,
                    help=">1: per-cell tracker ticks on a worker pool "
                         "(the reference's thread-per-cell layout)")
    ap.add_argument("--device-loop", default="auto",
                    choices=["auto", "on", "off"],
                    help="tracker/device_loop.py mode (demod + CRS "
                         "extraction on device, ~6x less download "
                         "through a remote tunnel); auto = on whenever "
                         "an accelerator is the default backend")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    global BLOCK
    BLOCK = args.block
    counts = range(1, args.cells + 1) if args.sweep else [args.cells]
    out = {}
    for n in counts:
        print(f"[{n} cell(s)]", file=sys.stderr)
        dl = {"auto": None, "on": True, "off": False}[args.device_loop]
        factor, healthy = bench_one(n, args.runs, args.seconds, args.snr,
                                    profile=args.profile,
                                    parallel=args.parallel,
                                    acq_seconds=args.acq_seconds,
                                    device_loop=dl)
        out[n] = factor
        if args.json:
            print(json.dumps({"metric": "tracker_realtime_factor",
                              "cells": n, "value": round(factor, 3),
                              "unit": "x_realtime", "healthy": healthy,
                              "vs_baseline": round(factor * n / 4.0, 3)}))
        else:
            print(f"{n} cells: {factor:.2f}x realtime"
                  + ("" if healthy else " (degraded health)"))


if __name__ == "__main__":
    main()
