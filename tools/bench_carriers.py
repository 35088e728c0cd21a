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


def main():
    fs = FS_LTE / 16
    fc0 = 739e6
    try:
        base = read_itfile("/root/reference/test/capbuf_0000.it")["capbuf"]
    except Exception:
        rng = np.random.default_rng(0)
        base = (rng.normal(size=153600) + 1j * rng.normal(size=153600)) * 0.1
    base = np.asarray(base, np.complex64)
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
                     "samples_per_s": round(C * len(base) / dt, 0)})

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
                  f"{r['samples_per_s']:.3g} samples/s")
        print(f"best {best['carriers_per_s']} carriers/s/chip = "
              f"{out['vs_reference']:.0f}x the reference's 1/6 carrier/s")


if __name__ == "__main__":
    main()
