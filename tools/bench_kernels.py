"""On-chip A/B of the correlation front end: XLA paths vs Pallas kernel.

Times, with per-call block_until_ready (no dispatch pipelining -- these
are true single-program latencies, unlike bench.py's throughput number):

  front_lean    _xcorr_core(keep_xc=False, lean=True)  -- the production
                front end: correlation + fold + delay spread + collapse
                + sp_est in one program
  xla_pow       correlate("dot") + |.|^2 materialized   -- the matmul
                (im2col einsum) with the power output, no fold
  pallas_f32    correlate_pow_pallas float32 bands
  pallas_bf16   correlate_pow_pallas bfloat16 bands (MXU-native single
                pass, f32 accumulation)

plus max-abs-relative error of each pallas path vs xla_pow, on the real
739 MHz capture at the default +-100 ppm grid (93 templates).

Usage: python tools/bench_kernels.py [--ppm 100] [--repeats 10] [--json]
       [--platform tpu|cpu]
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
ap.add_argument("--ppm", type=float, default=100.0)
ap.add_argument("--repeats", type=int, default=10)
ap.add_argument("--json", action="store_true")
ap.add_argument("--platform", default="tpu")
ARGS = ap.parse_args()

from _bench_common import enable_compile_cache, setup_platform  # noqa: E402

setup_platform(ARGS.platform, x64_on_cpu=False)
enable_compile_cache()

import jax.numpy as jnp  # noqa: E402

from lte_cell_scanner_tpu.constants import FS_LTE, PSS_TD_LEN  # noqa: E402
from lte_cell_scanner_tpu.models.search import default_f_search_set  # noqa: E402
from lte_cell_scanner_tpu.models.xcorr import (  # noqa: E402
    _xcorr_core, combine_start_indices, pss_templates)
from lte_cell_scanner_tpu.ops.corr import correlate  # noqa: E402
from lte_cell_scanner_tpu.ops.corr_pallas import correlate_pow_pallas  # noqa: E402
from lte_cell_scanner_tpu.utils import read_itfile  # noqa: E402


def best_of(fn, n):
    fn().block_until_ready()          # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn().block_until_ready()
        ts.append(time.perf_counter() - t0)
    return min(ts)


@jax.jit
def _xla_pow(capbuf, tmpl):
    xc = correlate(capbuf, tmpl)
    return jnp.real(xc) ** 2 + jnp.imag(xc) ** 2


def main():
    fs = FS_LTE / 16
    fc = 739e6
    try:
        capbuf = read_itfile("/root/reference/test/capbuf_0000.it")["capbuf"]
    except Exception:
        rng = np.random.default_rng(0)
        capbuf = (rng.normal(size=153600) + 1j * rng.normal(size=153600)) \
            * 0.1
    capbuf = np.asarray(capbuf, np.complex64)
    n_cap = len(capbuf)
    n_lags = n_cap - (PSS_TD_LEN - 1)

    f_set = default_f_search_set(fc, ARGS.ppm)
    tmpl = pss_templates(f_set, fc, fc, fs, np.complex64)   # [3, n_f, 137]
    tmpl_flat = tmpl.reshape(-1, PSS_TD_LEN)
    n_comb_xc = (n_lags - 100) // 9600
    starts = jnp.asarray(combine_start_indices(f_set, fc, fc, fs, n_comb_xc))
    cap_d = jnp.asarray(capbuf)
    tmpl_d = jnp.asarray(tmpl)
    tmpl_flat_d = jnp.asarray(tmpl_flat)

    res = {"backend": jax.default_backend(), "n_templates": tmpl_flat.shape[0],
           "n_lags": n_lags}

    res["front_lean_ms"] = best_of(
        lambda: _xcorr_core(cap_d, tmpl_d, starts, 2, keep_xc=False,
                            lean=True)[2], ARGS.repeats) * 1e3
    res["xla_pow_ms"] = best_of(
        lambda: _xla_pow(cap_d, tmpl_flat_d), ARGS.repeats) * 1e3

    ref = np.asarray(_xla_pow(cap_d, tmpl_flat_d))
    scale = np.max(ref)
    for name, prec in (("pallas_f32", "f32"), ("pallas_bf16", "bf16")):
        try:
            out = np.asarray(correlate_pow_pallas(cap_d, tmpl_flat, n_lags,
                                                  precision=prec))
            res[f"{name}_maxerr"] = float(
                np.max(np.abs(out - ref)) / scale)
            res[f"{name}_ms"] = best_of(
                lambda: correlate_pow_pallas(cap_d, tmpl_flat, n_lags,
                                             precision=prec),
                ARGS.repeats) * 1e3
        except Exception as e:  # noqa: BLE001 - report, keep benching
            res[f"{name}_error"] = f"{type(e).__name__}: {e}"[:300]

    # shard_map overhead bound: the sharded front end on a (1 x 1) mesh
    # vs the plain program (VERDICT item 9 -- SCALING.md's efficiency
    # model assumes this overhead is small).  Outputs stay on device
    # (block only): on the axon client a complex-parameter program
    # cannot transfer outputs, but timing needs no transfer.
    try:
        from lte_cell_scanner_tpu.parallel.sharded import (
            make_mesh, plan_sharded_inputs, sharded_xcorr)
        mesh = make_mesh(1, 1)
        padded, tmpl_s, starts_s, ncx, nl = plan_sharded_inputs(
            capbuf, f_set, fc, fc, fs, mesh, dtype=np.complex64)
        pd, td, sd = jnp.asarray(padded), jnp.asarray(tmpl_s), \
            jnp.asarray(starts_s)
        n_comb_sp = (n_cap - 136 - 137) // 9600
        res["sharded_1x1_ms"] = round(best_of(
            lambda: sharded_xcorr(mesh, pd, td, sd, 2, ncx, nl,
                                  n_comb_sp=n_comb_sp)[0],
            ARGS.repeats) * 1e3, 3)
    except Exception as e:  # noqa: BLE001
        res["sharded_1x1_error"] = f"{type(e).__name__}: {e}"[:300]

    # implied effective compute rate of the direct correlation
    flops = 8.0 * tmpl_flat.shape[0] * n_lags * PSS_TD_LEN
    for k in ("front_lean_ms", "xla_pow_ms", "pallas_f32_ms",
              "pallas_bf16_ms"):
        if k in res:
            res[k.replace("_ms", "_tflops")] = round(
                flops / (res[k] * 1e-3) / 1e12, 1)
            res[k] = round(res[k], 3)

    print(json.dumps(res) if ARGS.json else
          "\n".join(f"{k:20} {v}" for k, v in res.items()))


if __name__ == "__main__":
    main()
