"""TPU device-path tracker front-end benchmark (VERDICT item 5).

The tracker's FLOPs live in get_fd (ICI-removal mixer, 128-pt DFT,
72-subcarrier extract, phase compensation -- reference
tracker_thread.cpp:91-174).  The TPU deployment mode batches ALL
tracked cells' pending symbols into one [cells, symbols, 128] jitted
program (tracker/batched.py _get_fd_core).  This bench measures that
program on the real chip across batch shapes and reports the implied
front-end realtime capacity (cells x realtime at 1.92 Msps, 14.0k
symbols/s/cell), with per-call block_until_ready -- tunnel dispatch
latency included, which is why ticks must be batched (S symbols per
dispatch) to amortize it.

The host control loops (12-element CE/FOE/TOE math) are NOT in this
number; their cost is the CPU tracker bench (tools/bench_tracker.py).

Usage: python tools/bench_tracker_device.py [--json]
       [--cells 1,4,16,64] [--syms 64,256,1024] [--repeats 8]
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
ap.add_argument("--platform", default="tpu")
ap.add_argument("--cells", default="1,4,16,64")
ap.add_argument("--syms", default="64,256,1024")
ap.add_argument("--repeats", type=int, default=8)
ap.add_argument("--json", action="store_true")
ARGS = ap.parse_args()

from _bench_common import enable_compile_cache, setup_platform  # noqa: E402

setup_platform(ARGS.platform, x64_on_cpu=False)
enable_compile_cache()

import jax.numpy as jnp  # noqa: E402

from lte_cell_scanner_tpu.tracker.batched import _get_fd_core_impl  # noqa: E402

FS = 1.92e6
SAMP_PER_SYM = 19200 / 140.0          # 137.14 avg samples/symbol


def bench_shape(B, S, repeats):
    """Methodology (tools/bench_kernels.py docstring): float-plane
    inputs, scalar-checksum output, distinct single-use buffers, one
    final device_get as the completion barrier."""
    rng = np.random.default_rng(0)
    bufs = []
    for _ in range(repeats + 1):
        d = (rng.normal(size=(B, S, 128))
             + 1j * rng.normal(size=(B, S, 128))).astype(np.complex64)
        bufs.append((jnp.asarray(np.ascontiguousarray(d.real)),
                     jnp.asarray(np.ascontiguousarray(d.imag))))
    for re, im in bufs:
        re.block_until_ready()
        im.block_until_ready()
    # closure constants stay host numpy (see bench_kernels.py note)
    fo = np.full((B, S), -2050.0, np.float32)
    late = np.zeros((B, S), np.float32)
    nse = np.full((B, S), 137.0, np.float32)
    valid = np.ones((B, S), bool)
    phase = np.zeros(B, np.float32)

    @jax.jit
    def step(re, im):
        syms, final = _get_fd_core_impl(
            jax.lax.complex(re, im), fo, late, nse, valid, phase,
            739e6, 739e6, FS)
        return (jnp.sum(jnp.real(syms) ** 2 + jnp.imag(syms) ** 2)
                + jnp.sum(final))

    jax.device_get(step(*bufs[0]))        # compile + true sync
    t0 = time.perf_counter()
    outs = [step(re, im) for re, im in bufs[1:]]
    jax.device_get(outs)                  # completion barrier
    dt = (time.perf_counter() - t0) / (len(bufs) - 1)
    stream_s = B * S * SAMP_PER_SYM / FS
    return {"cells": B, "syms": S, "ms_per_call": round(dt * 1e3, 3),
            "sym_per_s": round(B * S / dt, 1),
            "realtime_factor": round(stream_s / dt, 2)}


def main():
    rows = []
    for B in (int(x) for x in ARGS.cells.split(",")):
        for S in (int(x) for x in ARGS.syms.split(",")):
            rows.append(bench_shape(B, S, ARGS.repeats))
    best = max(rows, key=lambda r: r["realtime_factor"])
    out = {"backend": jax.default_backend(), "rows": rows,
           "best_realtime_factor": best["realtime_factor"],
           "best_shape": [best["cells"], best["syms"]],
           "implied_cells_at_realtime": int(best["realtime_factor"])}
    if ARGS.json:
        print(json.dumps(out))
    else:
        for r in rows:
            print(f"B={r['cells']:3d} S={r['syms']:5d}  "
                  f"{r['ms_per_call']:8.3f} ms  "
                  f"{r['sym_per_s']:12.0f} sym/s  "
                  f"{r['realtime_factor']:8.2f}x realtime")
        print(f"best: {best['realtime_factor']}x realtime at "
              f"[{best['cells']} cells x {best['syms']} syms] -> "
              f"~{out['implied_cells_at_realtime']} cells trackable "
              f"(front end)")


if __name__ == "__main__":
    main()
