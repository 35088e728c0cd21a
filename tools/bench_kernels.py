"""On-chip A/B of the correlation front end: XLA paths vs Pallas kernel.

Programs compared (default +-100 ppm grid, 93 templates, real 739 MHz
capture):

  front_lean    the production front end (_xcorr_core lean: correlation
                + k_factor fold + delay spread + collapse + sp_est +
                refinement slab) in one program
  xla_pow       correlate("dot") + |.|^2 -- the im2col MXU einsum
  pallas_f32    correlate_pow_pallas, float32 band matrices
  pallas_bf16   correlate_pow_pallas, bfloat16 bands (MXU-native single
                pass, f32 accumulation)
  sharded_1x1   the (t x f) shard_map front end on a (1 x 1) mesh --
                bounds the shard_map overhead (VERDICT item 9)

Measurement methodology (hard-won; see docs/SCALING.md):

- On the remote-tunnel runtime, ``block_until_ready`` acknowledges
  BEFORE real execution completes (fire-ahead dispatch), and recently
  executed (program, inputs) pairs can be served without re-execution,
  so block-only per-call timing reports physically impossible rates
  (measured "2 PFLOP/s").  The only trustworthy sync is a device->host
  TRANSFER of a value data-dependent on the computation.
- Therefore every timed program here takes the capture as (re, im)
  FLOAT planes (complex program parameters make outputs untransferable
  on this client -- ops/boundary.py) and returns a scalar checksum
  (sums of its real outputs).  K distinct single-use input buffers are
  dispatched back-to-back and ONE final device_get of the K scalars
  forces completion of all of them: wall / K = steady-state
  throughput-per-program, the honest production number for a scanning
  workload.

The pallas-vs-XLA max-error check runs via --parity-only in a separate
process: one complex-parameter execution breaks transfers process-wide
on this client, and the timing section never executes one.

Usage: python tools/bench_kernels.py [--ppm 100] [--repeats 16] [--json]
       [--platform tpu|cpu] [--parity-only]
"""

import argparse
import json
import sys
import os
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

ap = argparse.ArgumentParser()
ap.add_argument("--ppm", type=float, default=100.0)
ap.add_argument("--repeats", type=int, default=16,
                help="distinct single-use buffers per timed program")
ap.add_argument("--json", action="store_true")
ap.add_argument("--platform", default="tpu")
ap.add_argument("--parity-only", action="store_true",
                help="only the pallas-vs-XLA max-error check, behind "
                     "the float boundary.  Run in a FRESH process: on "
                     "the axon client one complex-parameter execution "
                     "breaks transfers process-wide")
ARGS = ap.parse_args()

from _bench_common import enable_compile_cache, setup_platform  # noqa: E402

setup_platform(ARGS.platform, x64_on_cpu=False)
enable_compile_cache()

import jax.numpy as jnp  # noqa: E402

from lte_cell_scanner_tpu.constants import FS_LTE, PSS_TD_LEN  # noqa: E402
from lte_cell_scanner_tpu.models.search import default_f_search_set  # noqa: E402
from lte_cell_scanner_tpu.models.xcorr import (  # noqa: E402
    _xcorr_core_impl, combine_start_indices, pss_templates)
from lte_cell_scanner_tpu.ops.boundary import (ComplexPair,  # noqa: E402
                                               device_complex, safe_jit)
from lte_cell_scanner_tpu.ops.corr import correlate  # noqa: E402
from lte_cell_scanner_tpu.ops.corr_pallas import correlate_pow_pallas  # noqa: E402
from lte_cell_scanner_tpu.utils import read_itfile  # noqa: E402


def timed_throughput(fn, bufs):
    """fn(re, im) -> scalar checksum.  Dispatch one warmup (compile),
    sync, then all K distinct buffers back-to-back with a single final
    device_get -- the transfer is the only reliable completion barrier
    on this runtime."""
    jax.device_get(fn(*bufs[0]))          # compile + true sync
    t0 = time.perf_counter()
    outs = [fn(re, im) for re, im in bufs]
    jax.device_get(outs)                  # forces completion of all K
    return (time.perf_counter() - t0) / len(bufs)


def _xla_pow_impl(capbuf, tmpl):
    xc = correlate(capbuf, tmpl)
    return jnp.real(xc) ** 2 + jnp.imag(xc) ** 2


_xla_pow = safe_jit(_xla_pow_impl)


def parity_only(capbuf, tmpl_flat, n_lags):
    """Max-error of each pallas path vs the XLA dot path, everything
    behind the float boundary (no complex-parameter program ever
    executes in this process)."""
    res = {"backend": jax.default_backend()}
    ref = np.asarray(_xla_pow(capbuf, tmpl_flat))
    scale = np.max(ref)
    cap_b = device_complex(capbuf)
    for name, prec in (("pallas_f32", "f32"), ("pallas_bf16", "bf16")):
        out = np.asarray(correlate_pow_pallas(cap_b, tmpl_flat, n_lags,
                                              precision=prec))
        res[f"{name}_maxerr"] = float(np.max(np.abs(out - ref)) / scale)
    return res


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

    if ARGS.parity_only:
        print(json.dumps(parity_only(capbuf, tmpl_flat, n_lags)))
        return

    res = {"backend": jax.default_backend(),
           "n_templates": tmpl_flat.shape[0], "n_lags": n_lags,
           "n_single_use_buffers": ARGS.repeats}

    # K distinct single-use capture buffers as staged float planes
    bufs = []
    for k in range(ARGS.repeats):
        c = np.roll(capbuf, 977 * k + 1)
        bufs.append((jnp.asarray(np.ascontiguousarray(c.real)),
                     jnp.asarray(np.ascontiguousarray(c.imag))))
    for re, im in bufs:
        re.block_until_ready()
        im.block_until_ready()
    # closure constants must be HOST numpy: embedding a device-resident
    # complex array as an MLIR constant pulls it back through the broken
    # transfer path (measured UNIMPLEMENTED/hang)
    starts_np = np.asarray(starts)

    @jax.jit
    def front_lean(re, im):
        out = _xcorr_core_impl(jax.lax.complex(re, im), tmpl, starts_np, 2,
                               keep_xc=False, lean=True)
        _s, _i, pow_c, frq_c, _sp, sp_inc, _xc, slab = out
        return (jnp.sum(pow_c) + jnp.sum(sp_inc) + jnp.sum(slab)
                + jnp.sum(frq_c))

    @jax.jit
    def xla_pow(re, im):
        return jnp.sum(_xla_pow_impl(jax.lax.complex(re, im), tmpl_flat))

    def pallas_fn(prec):
        @jax.jit
        def f(re, im):
            return jnp.sum(correlate_pow_pallas(
                ComplexPair(re, im), tmpl_flat, n_lags, precision=prec))
        return f

    from lte_cell_scanner_tpu.ops.corr_pallas import bands_for_templates
    gb_re, gb_im = bands_for_templates(tmpl_flat, precision="bf16")

    # bands ride as ARGUMENTS: closing over device arrays would embed
    # them as MLIR constants, pulling them device->host at lowering
    @jax.jit
    def _flp(re, im, g1, g2):
        out = _xcorr_core_impl(jax.lax.complex(re, im), tmpl, starts_np, 2,
                               keep_xc=False, lean=True, g_re=g1, g_im=g2)
        _s, _i, pow_c, frq_c, _sp, sp_inc, _xc, slab = out
        return (jnp.sum(pow_c) + jnp.sum(sp_inc) + jnp.sum(slab)
                + jnp.sum(frq_c))

    def front_lean_pallas(re, im):
        return _flp(re, im, gb_re, gb_im)

    res["front_lean_ms"] = timed_throughput(front_lean, bufs) * 1e3
    try:
        res["front_lean_pallas_ms"] = timed_throughput(front_lean_pallas,
                                                       bufs) * 1e3
    except Exception as e:  # noqa: BLE001
        res["front_lean_pallas_error"] = f"{type(e).__name__}: {e}"[:300]
    res["xla_pow_ms"] = timed_throughput(xla_pow, bufs) * 1e3
    for name, prec in (("pallas_f32", "f32"), ("pallas_bf16", "bf16")):
        try:
            res[f"{name}_ms"] = timed_throughput(pallas_fn(prec),
                                                 bufs) * 1e3
        except Exception as e:  # noqa: BLE001 - report, keep benching
            res[f"{name}_error"] = f"{type(e).__name__}: {e}"[:300]

    # shard_map overhead bound: the sharded front end on a (1 x 1) mesh
    # (VERDICT item 9 -- SCALING.md's efficiency model assumes small),
    # measured with BOTH local-correlation backends (the production
    # Pallas bands ride sharded over "f" -- VERDICT r2 item 2)
    try:
        from lte_cell_scanner_tpu.parallel.sharded import (
            make_mesh, plan_sharded_bands, plan_sharded_inputs,
            sharded_xcorr)
        mesh = make_mesh(1, 1)
        padded, tmpl_s, starts_s, ncx, nl = plan_sharded_inputs(
            capbuf, f_set, fc, fc, fs, mesh, dtype=np.complex64)
        td, sd = tmpl_s, starts_s
        n_comb_sp = (n_cap - 136 - 137) // 9600
        n_pad = len(padded) - n_cap
        sh_bands = plan_sharded_bands(td, 1)

        def mk_sharded(bands):
            @jax.jit
            def sharded_sum(re, im):
                cap_p = jnp.concatenate(
                    [jax.lax.complex(re, im),
                     jnp.zeros(n_pad, jnp.complex64)])
                pow_g, frq_g, sp_inc, single = sharded_xcorr(
                    mesh, cap_p, td, sd, 2, ncx, nl, n_comb_sp, *bands)
                return (jnp.sum(pow_g) + jnp.sum(sp_inc)
                        + jnp.sum(single) + jnp.sum(frq_g))
            return sharded_sum

        res["sharded_1x1_ms"] = round(
            timed_throughput(mk_sharded(()), bufs) * 1e3, 3)
        res["sharded_1x1_pallas_ms"] = round(
            timed_throughput(mk_sharded(sh_bands), bufs) * 1e3, 3)
    except Exception as e:  # noqa: BLE001
        res["sharded_1x1_error"] = f"{type(e).__name__}: {e}"[:300]

    # implied effective compute rate of the direct correlation
    flops = 8.0 * tmpl_flat.shape[0] * n_lags * PSS_TD_LEN
    for k in ("front_lean_ms", "xla_pow_ms", "pallas_f32_ms",
              "pallas_bf16_ms", "sharded_1x1_ms"):
        if k in res:
            res[k.replace("_ms", "_tflops")] = round(
                flops / (res[k] * 1e-3) / 1e12, 1)
            res[k] = round(res[k], 3)

    print(json.dumps(res) if ARGS.json else
          "\n".join(f"{k:20} {v}" for k, v in res.items()))


if __name__ == "__main__":
    main()
