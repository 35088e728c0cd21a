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
ap.add_argument("--batches", default="1,2,4,8,16")
ap.add_argument("--ppm", type=float, default=100.0)
ap.add_argument("--repeats", type=int, default=5)
ap.add_argument("--json", action="store_true")
ap.add_argument("--platform", default="tpu")
ARGS = ap.parse_args()

from _bench_common import enable_compile_cache, setup_platform  # noqa: E402

setup_platform(ARGS.platform, x64_on_cpu=False)
enable_compile_cache()

from lte_cell_scanner_tpu.constants import FS_LTE  # noqa: E402
from lte_cell_scanner_tpu.models.search import default_f_search_set  # noqa: E402
from lte_cell_scanner_tpu.parallel.carriers import (  # noqa: E402
    _front_batch, plan_carrier_inputs)
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

    rows = []
    for C in (int(x) for x in ARGS.batches.split(",")):
        caps = [np.roll(base, 31 * i + 1) for i in range(C)]
        fcs = [fc0 + 100e3 * i for i in range(C)]
        cap, tmpl, starts, _, _ = plan_carrier_inputs(
            caps, fcs, f_set, fcs, fs, 1, dtype=np.complex64)

        def call():
            out = _front_batch(cap, tmpl, starts, 2)
            s = out[1]
            return s.block_until_ready() \
                if hasattr(s, "block_until_ready") else s

        call()                          # compile + warm
        ts = []
        for _ in range(ARGS.repeats):
            t0 = time.perf_counter()
            call()
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
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
