"""Full-capture cell-search latency benchmark (BASELINE.json config 2).

Times the complete per-carrier pipeline on the shipped 739 MHz two-cell
air capture: PSS correlation front end over the default +-100 ppm
hypothesis grid, chi-squared thresholding, greedy peak search, then the
per-peak back half (SSS detection, fine FOE, OFDM demod, superfine
FOE/TOE, channel estimation, blind MIB decode) through to the decoded
cell list.  The reference takes ~6 s per center frequency for the same
work on a dual-core i7-2640 (BASELINE.md).

Splits reported per phase so front-end (device matmul) and back-half
(per-peak mixed host/device) costs are visible, with the back half
timed both peak-at-a-time (the reference's order) and as the vmapped
peak batch (models/search.py batch_peaks, the default).

Defaults to the CPU backend (double precision, the golden-parity
configuration).  --platform tpu runs the whole chain on the real chip
in complex64: ops/boundary.py crosses the host<->device edge as float
planes (the axon client cannot transfer complex-parameter program
outputs), and the host keeps only the greedy peak extraction and MIB
bit unpacking.

Usage:
  python tools/bench_search.py [--repeats 5] [--ppm 100] [--json]
                               [--platform cpu|tpu]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

_parser = argparse.ArgumentParser()
_parser.add_argument("--repeats", type=int, default=5)
_parser.add_argument("--ppm", type=float, default=100.0)
_parser.add_argument("--json", action="store_true")
_parser.add_argument("--platform", default="cpu",
                     help="jax platform (default cpu; see module docstring)")
ARGS = _parser.parse_args()

# --platform tpu: complex64 on device (x64 stays off); the host keeps
# float64 index planning.  cpu: double precision (golden config).
from _bench_common import enable_compile_cache, setup_platform  # noqa: E402

setup_platform(ARGS.platform)
enable_compile_cache()

from lte_cell_scanner_tpu.constants import DS_COMB_ARM, FS_LTE  # noqa: E402
from lte_cell_scanner_tpu.models.peaks import peak_search  # noqa: E402
from lte_cell_scanner_tpu.models.search import (  # noqa: E402
    SearchConfig, compute_z_th1, default_f_search_set, refine_peaks)
from lte_cell_scanner_tpu.models.xcorr import xcorr_pss  # noqa: E402
from lte_cell_scanner_tpu.utils import read_itfile  # noqa: E402

REF_CAPTURE = "/root/reference/test/capbuf_0000.it"
REF_SECONDS_PER_CARRIER = 6.0


def _best(fn, n):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    d = read_itfile(REF_CAPTURE)
    capbuf = d["capbuf"]
    fc = float(np.asarray(d["fc"]).ravel()[0])
    fs = FS_LTE / 16
    fss = default_f_search_set(fc, ARGS.ppm)

    def front():
        res = xcorr_pss(capbuf, fss, DS_COMB_ARM, fc, fc, fs)
        z = compute_z_th1(res.sp_incoherent, res.n_comb_xc)
        return peak_search(res.xc_incoherent_collapsed_pow,
                           res.xc_incoherent_collapsed_frq, z, fss, fc, fc,
                           res.xc_incoherent_single, DS_COMB_ARM)

    peaks = front()                       # warm compile
    t_front, peaks = _best(front, ARGS.repeats)

    results = {"backend": jax.default_backend(), "n_hyp": len(fss),
               "n_peaks": len(peaks), "front_end_s": t_front}
    for label, batch in (("serial", False), ("batched", True)):
        cfg = SearchConfig(batch_peaks=batch)
        refine_peaks(peaks, capbuf, fc, fc, fs, cfg)   # warm compile
        t, cells = _best(
            lambda: refine_peaks(peaks, capbuf, fc, fc, fs, cfg),
            ARGS.repeats)
        results[f"back_half_{label}_s"] = t
        results[f"n_cells_{label}"] = len(cells)

    total = results["front_end_s"] + results["back_half_batched_s"]
    results["total_s"] = total
    results["vs_baseline"] = REF_SECONDS_PER_CARRIER / total
    if results["n_cells_serial"] != results["n_cells_batched"]:
        print(f"WARNING: serial decoded {results['n_cells_serial']} cells "
              f"but batched decoded {results['n_cells_batched']}",
              file=sys.stderr)

    if ARGS.json:
        print(json.dumps(results))
    else:
        print(f"backend {results['backend']}  grid {results['n_hyp']} hyps  "
              f"{results['n_peaks']} peaks -> "
              f"{results['n_cells_batched']} cells")
        print(f"front end        {results['front_end_s']*1e3:9.2f} ms")
        print(f"back half serial {results['back_half_serial_s']*1e3:9.2f} ms")
        print(f"back half batch  {results['back_half_batched_s']*1e3:9.2f} ms")
        print(f"TOTAL            {total*1e3:9.2f} ms   "
              f"({results['vs_baseline']:.0f}x the reference's 6 s/carrier)")


if __name__ == "__main__":
    main()
