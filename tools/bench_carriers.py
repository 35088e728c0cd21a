"""Multi-carrier-per-chip scan rate (VERDICT item 10 / stretch).

The production wide-band deployment batches MANY carriers' captures into
one device program per chip (parallel/carriers.py front end, carriers as
the vmapped batch axis).  This bench measures carriers/s/chip on the
real TPU across batch sizes -- the number a deployment would size a pod
by -- on the default +-100 ppm grid (93 templates per carrier).

Reference anchor: the CellSearch outer loop scans carriers serially at
~6 s each (doc/CellSearch.html; BASELINE.md), i.e. 0.167 carriers/s.

Usage: python tools/bench_carriers.py [--batches 1,2,4,8,16] [--ppm 100]
       [--repeats 5] [--json] [--platform tpu|cpu]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

ap = argparse.ArgumentParser()
ap.add_argument("--batches", default="1,2,4,8,16,32")
ap.add_argument("--ppm", type=float, default=100.0)
ap.add_argument("--repeats", type=int, default=5)
ap.add_argument("--json", action="store_true")
ap.add_argument("--platform", default="tpu")
ap.add_argument("--kernel", default="auto", choices=["auto", "v4", "v2"],
                help="correlation band format: v4 = fused-fold kernel, "
                     "v2 = lag-map kernel + XLA fold, auto = production "
                     "gate (v4 when the grid fits its delta window)")
ap.add_argument("--capture-ms", type=int, default=80,
                help="capture length (80 default; 160/320 measure the "
                     "long-capture sensitivity lever -- the kv router "
                     "picks the wide K=384 fused-fold window when the "
                     "grid's fold deviations exceed the default +-20)")
ap.add_argument("--full-chain", action="store_true",
                help="measure carriers/s THROUGH MIB: the whole "
                     "scan_band flow (batched front end + per-carrier "
                     "peak search + batched SSS/FOE + fused decode) on "
                     "captures containing the two real 739 MHz cells -- "
                     "the end-to-end number BASELINE config 4 asks for, "
                     "vs the front-only rate of the default mode")
ARGS = ap.parse_args()

from _bench_common import enable_compile_cache, setup_platform  # noqa: E402

setup_platform(ARGS.platform, x64_on_cpu=False)
enable_compile_cache()

import jax.numpy as jnp  # noqa: E402

from lte_cell_scanner_tpu.constants import FS_LTE  # noqa: E402
from lte_cell_scanner_tpu.models.search import default_f_search_set  # noqa: E402
from lte_cell_scanner_tpu.parallel.carriers import (  # noqa: E402
    _vmap_front, plan_carrier_inputs)
from lte_cell_scanner_tpu.utils import read_itfile  # noqa: E402

REF_CARRIERS_PER_S = 1.0 / 6.0


def full_chain():
    """carriers/s through MIB at band scale (scan_band end-to-end).

    Each carrier's capture is a cyclic roll of the real capbuf_0000.it
    (so every carrier genuinely contains cells 277+271 and exercises
    peak search, the fused SSS+FOE dispatch, and the fused decode
    through MIB -- the reference's 6 s/carrier baseline is this full
    chain, src/CellSearch.cpp:471-570).  Wall clock includes the host
    peak search and every transfer: the honest deployment rate.

    cells_per_carrier < 2.0 on some roll sets is the roll SEAM, not a
    decode defect: a cyclic roll puts one discontinuity in the 80 ms
    capture, and a cell whose only complete 40 ms PBCH period straddles
    it legitimately fails MIB for that roll (real contiguous captures
    have no seam)."""
    from lte_cell_scanner_tpu.models.search import SearchConfig
    from lte_cell_scanner_tpu.parallel.carriers import (make_carrier_mesh,
                                                        scan_band)

    fs = FS_LTE / 16
    fc0 = 739e6
    base = read_itfile("/root/reference/test/capbuf_0000.it")["capbuf"]
    base = np.asarray(base, np.complex64)
    f_set = default_f_search_set(fc0, ARGS.ppm)
    cfg = SearchConfig()
    mesh = make_carrier_mesh()

    rows = []
    for C in (int(x) for x in ARGS.batches.split(",")):
        fcs = [fc0 + 100e3 * i for i in range(C)]
        reps = []
        for k in range(ARGS.repeats + 1):
            # rolls keep the 8-bit ADC grid intact (int8 kernel path)
            reps.append([(np.roll(base, 31 * i + 977 * k + 1),
                          fcs[i], fcs[i]) for i in range(C)])
        res = scan_band(reps[0], f_set, fs, cfg, mesh)   # compile pass
        n_cells = sum(len(r) for r in res)
        t0 = time.perf_counter()
        for caps in reps[1:]:
            res = scan_band(caps, f_set, fs, cfg, mesh)
        dt = (time.perf_counter() - t0) / ARGS.repeats
        n_cells = sum(len(r) for r in res)
        ids = sorted({c.n_id_cell() for r in res for c in r})
        rows.append({"carriers": C, "ms": round(dt * 1e3, 1),
                     "carriers_per_s": round(C / dt, 2),
                     "cells_per_carrier": round(n_cells / C, 2),
                     "cell_ids": ids})
    best = max(rows, key=lambda r: r["carriers_per_s"])
    out = {"backend": jax.default_backend(), "mode": "full_chain",
           "n_hyp": len(f_set), "rows": rows,
           "best_carriers_per_s": best["carriers_per_s"],
           "vs_reference": round(best["carriers_per_s"]
                                 / REF_CARRIERS_PER_S, 0)}
    if ARGS.json:
        print(json.dumps(out))
    else:
        for r in rows:
            print(f"C={r['carriers']:3d}  {r['ms']:9.1f} ms  "
                  f"{r['carriers_per_s']:8.2f} carriers/s THROUGH MIB  "
                  f"({r['cells_per_carrier']} cells/carrier "
                  f"{r['cell_ids']})")
        print(f"best {best['carriers_per_s']} carriers/s/chip full chain"
              f" = {out['vs_reference']:.0f}x the reference")


def main():
    if ARGS.full_chain:
        full_chain()
        return
    fs = FS_LTE / 16
    fc0 = 739e6
    try:
        base = read_itfile("/root/reference/test/capbuf_0000.it")["capbuf"]
    except Exception:
        rng = np.random.default_rng(0)
        base = (rng.normal(size=153600) + 1j * rng.normal(size=153600)) * 0.1
    base = np.asarray(base, np.complex64)
    if ARGS.capture_ms != 80:
        reps = -(-int(ARGS.capture_ms * 1920) // len(base))
        base = np.tile(base, reps)[: int(ARGS.capture_ms * 1920)]
    f_set = default_f_search_set(fc0, ARGS.ppm)

    # Methodology (tools/bench_kernels.py docstring): float-plane
    # inputs, scalar-checksum outputs, K distinct single-use buffers,
    # one final device_get as the completion barrier -- the tunnel
    # runtime fire-aheads dispatches and can shortcut re-dispatches.
    rows = []
    for C in (int(x) for x in ARGS.batches.split(",")):
        fcs = [fc0 + 100e3 * i for i in range(C)]
        bufs = []
        tmpl = starts = None
        for k in range(ARGS.repeats + 1):
            caps = [np.roll(base, 31 * i + 977 * k + 1) for i in range(C)]
            cap, tmpl, starts, _, _ = plan_carrier_inputs(
                caps, fcs, f_set, fcs, fs, 1, dtype=np.complex64)
            bufs.append((jnp.asarray(np.ascontiguousarray(cap.real)),
                         jnp.asarray(np.ascontiguousarray(cap.imag))))
        for re, im in bufs:
            re.block_until_ready()
            im.block_until_ready()
        # closure constants stay HOST numpy (device-complex constants
        # would be pulled back through the broken transfer path); the
        # per-carrier Pallas bands (production TPU backend) ride as
        # arguments
        # production band planning (v4 fused-fold on the default grid,
        # int8 for ADC-grid captures), with a --kernel A/B override
        from lte_cell_scanner_tpu.models.search import SearchConfig
        from lte_cell_scanner_tpu.parallel.carriers import _plan_scan_bands
        force_v4 = {"auto": None, "v4": True, "v2": False}[ARGS.kernel]
        bands = _plan_scan_bands(tmpl, starts, [base], SearchConfig(),
                                 force_v4=force_v4)

        n_comb = starts.shape[2]
        if bands and bands[0].ndim == 2 and bands[0].shape[0] > 512:
            fmt = f"v4/K={bands[0].shape[0] // (2 * n_comb)}"
        elif bands:
            fmt = "v2"
        else:
            fmt = "xla"
        fmt += "/int8" if len(bands) == 2 else ""

        @jax.jit
        def band(re, im, *g, tmpl=tmpl, starts=starts):
            outs = _vmap_front(jax.lax.complex(re, im), tmpl, starts, 2, g)
            return sum(jnp.sum(o) for o in outs)

        jax.device_get(band(*bufs[0], *bands))  # compile + true sync
        t0 = time.perf_counter()
        outs = [band(re, im, *bands) for re, im in bufs[1:]]
        jax.device_get(outs)                  # completion barrier
        dt = (time.perf_counter() - t0) / (len(bufs) - 1)
        rows.append({"carriers": C, "ms": round(dt * 1e3, 2),
                     "carriers_per_s": round(C / dt, 1),
                     "samples_per_s": round(C * len(base) / dt, 0),
                     "format": fmt, "capture_ms": ARGS.capture_ms})

    best = max(rows, key=lambda r: r["carriers_per_s"])
    out = {"backend": jax.default_backend(), "n_hyp": len(f_set),
           "rows": rows, "best_carriers_per_s": best["carriers_per_s"],
           "vs_reference": round(best["carriers_per_s"]
                                 / REF_CARRIERS_PER_S, 0)}
    if ARGS.json:
        print(json.dumps(out))
    else:
        for r in rows:
            print(f"C={r['carriers']:3d}  {r['ms']:9.2f} ms  "
                  f"{r['carriers_per_s']:8.1f} carriers/s  "
                  f"{r['samples_per_s']:.3g} samples/s  [{r['format']}"
                  f" {r['capture_ms']}ms]")
        print(f"best {best['carriers_per_s']} carriers/s/chip = "
              f"{out['vs_reference']:.0f}x the reference's 1/6 carrier/s")


if __name__ == "__main__":
    main()
