"""On-chip sweep of the correlation kernels: v1 banded vs v2 im2col.

Times, under the transfer-synced checksum scheme (see
tools/bench_kernels.py "Measurement methodology" -- block-only timing is
fiction on this runtime):

  mxu_peak        R chained [4096x4096]x[4096x4096] bf16 matmuls -- the
                  honest-clock achievable MXU rate on this chip, the MFU
                  denominator used in docs/SCALING.md
  v1_bf16         production banded kernel (ops/corr_pallas.corr_pow_core)
  v2_bf16_M*_T*   im2col kernel (corr_pow_core_v2) at each
                  (rows_per_block, t_chunk) combination

Each correlation program folds R kernel invocations over R
jnp.roll-shifted copies of the capture inside ONE device program, so
per-kernel on-die time = wall / (K * R) even when the tunnel's
per-dispatch issue rate floors small programs.  The checksum depends on
every invocation; inputs differ per invocation and per buffer, so no
(program, inputs) pair ever repeats.

Usage: python tools/bench_corr_v2.py [--ppm 100] [--repeats 4] [--inner 8]
       [--json] [--platform tpu|cpu] [--variants v1,v2_128_16,...]
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
ap.add_argument("--repeats", type=int, default=4,
                help="distinct single-use buffers per timed program")
ap.add_argument("--inner", type=int, default=8,
                help="kernel invocations folded inside one program")
ap.add_argument("--json", action="store_true")
ap.add_argument("--platform", default="tpu")
ap.add_argument("--variants", default="peak,v1,v2_64_16,v2_128_16,"
                                      "v2_256_16,v2_128_8")
ARGS = ap.parse_args()

from _bench_common import enable_compile_cache, setup_platform  # noqa: E402

setup_platform(ARGS.platform, x64_on_cpu=False)
enable_compile_cache()

import jax.numpy as jnp  # noqa: E402

from lte_cell_scanner_tpu.constants import FS_LTE, PSS_TD_LEN  # noqa: E402
from lte_cell_scanner_tpu.models.search import default_f_search_set  # noqa: E402
from lte_cell_scanner_tpu.models.xcorr import pss_templates  # noqa: E402
from lte_cell_scanner_tpu.ops.corr_pallas import (  # noqa: E402
    bands_for_templates, bands_v2_for_templates, corr_pow_core,
    corr_pow_core_v2, plan_pallas, plan_pallas_v2)
from lte_cell_scanner_tpu.utils import read_itfile  # noqa: E402


def timed_throughput(fn, bufs):
    jax.device_get(fn(*bufs[0]))          # compile + true sync
    t0 = time.perf_counter()
    outs = [fn(re, im) for re, im in bufs]
    jax.device_get(outs)                  # the only reliable barrier
    return (time.perf_counter() - t0) / len(bufs)


def main():
    fs = FS_LTE / 16
    fc = 739e6
    R = ARGS.inner
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
    tmpl_flat = pss_templates(f_set, fc, fc, fs,
                              np.complex64).reshape(-1, PSS_TD_LEN)
    t_count = tmpl_flat.shape[0]
    variants = ARGS.variants.split(",")

    res = {"backend": jax.default_backend(), "n_templates": t_count,
           "n_lags": n_lags, "inner": R, "buffers": ARGS.repeats}
    # useful (minimal im2col) FLOPs per kernel invocation
    useful_flops = 8.0 * t_count * n_lags * PSS_TD_LEN
    res["useful_gflop_per_call"] = round(useful_flops / 1e9, 2)

    bufs = []
    for k in range(ARGS.repeats):
        c = np.roll(capbuf, 977 * k + 1)
        bufs.append((jnp.asarray(np.ascontiguousarray(c.real)),
                     jnp.asarray(np.ascontiguousarray(c.imag))))
    for re, im in bufs:
        re.block_until_ready()
        im.block_until_ready()

    if "peak" in variants:
        rngp = np.random.default_rng(1)
        w_np = rngp.normal(size=(4096, 4096)).astype(np.float32)

        @jax.jit
        def mxu_peak(re, im):
            x = jnp.tile(re[: 4096 * 36].reshape(36, 4096),
                         (114, 1))[:4096].astype(jnp.bfloat16)
            w = jnp.asarray(w_np, jnp.bfloat16)
            for _ in range(R):
                # 1/64 keeps the chained products in bf16 range
                x = jnp.dot(x, w,
                            preferred_element_type=jnp.bfloat16) * 0.015625
            return jnp.sum(x.astype(jnp.float32))

        dt = timed_throughput(mxu_peak, bufs)
        flops = R * 2.0 * 4096 ** 3
        res["mxu_peak_ms_per_matmul"] = round(dt * 1e3 / R, 4)
        res["mxu_peak_tflops"] = round(flops / dt / 1e12, 1)

        # same probe with f32 accumulation/output -- the configuration
        # the production correlation dot actually uses
        @jax.jit
        def mxu_peak32(re, im):
            x = jnp.tile(re[: 4096 * 36].reshape(36, 4096),
                         (114, 1))[:4096].astype(jnp.bfloat16)
            w = jnp.asarray(w_np, jnp.bfloat16)
            for _ in range(R):
                y = jnp.dot(x, w, preferred_element_type=jnp.float32)
                x = (y * 0.015625).astype(jnp.bfloat16)
            return jnp.sum(y)

        dt32 = timed_throughput(mxu_peak32, bufs)
        res["mxu_peak_f32acc_tflops"] = round(flops / dt32 / 1e12, 1)

        # int8 operands, int32 accumulation -- the ADC-exact tier
        wi_np = np.clip(np.round(rngp.normal(size=(4096, 4096)) * 40),
                        -127, 127).astype(np.int8)

        @jax.jit
        def mxu_peaki(re, im):
            x = jnp.tile(re[: 4096 * 36].reshape(36, 4096),
                         (114, 1))[:4096]
            x = jnp.clip(jnp.round(x * 100.0), -127, 127).astype(jnp.int8)
            w = jnp.asarray(wi_np)
            for _ in range(R):
                y = jax.lax.dot_general(
                    x, w, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                x = jnp.clip(y // 4096, -127, 127).astype(jnp.int8)
            return jnp.sum(y.astype(jnp.float32))

        dti = timed_throughput(mxu_peaki, bufs)
        res["mxu_peak_int8_tops"] = round(flops / dti / 1e12, 1)

    def add(name, fn, raw_flops_per_call):
        try:
            dt = timed_throughput(fn, bufs) / R
        except Exception as e:  # noqa: BLE001 - report, keep sweeping
            res[f"{name}_error"] = f"{type(e).__name__}: {e}"[:300]
            return
        res[f"{name}_ms"] = round(dt * 1e3, 4)
        res[f"{name}_useful_tflops"] = round(useful_flops / dt / 1e12, 2)
        res[f"{name}_raw_tflops"] = round(raw_flops_per_call / dt / 1e12, 1)

    if "bw" in variants:
        # HBM read-bandwidth probe on the honest clock: sum a 59 MB f32
        # array R times (rolled so no (program, inputs) pair repeats)
        big_np = np.arange(1280 * 11520, dtype=np.float32) * 1e-6
        nbytes = big_np.nbytes

        @jax.jit
        def bw(re, im):
            big = jnp.asarray(big_np) + re[0] + im[0]
            acc = jnp.float32(0)
            for r in range(R):
                acc = acc + jnp.sum(jnp.roll(big, 97 * r) * (r + 1))
            return acc

        dt = timed_throughput(bw, bufs) / R
        # each iteration: roll = read+write, sum = read => ~3x nbytes
        res["bw_ms_per_59MB_roll_sum"] = round(dt * 1e3, 4)
        res["bw_GBps_est"] = round(3 * nbytes / dt / 1e9, 1)

    if "v2sum" in variants:
        # kernel compute + input traffic only: per-block checksums
        # instead of the 59 MB power map (isolates the output-side cost)
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from lte_cell_scanner_tpu.ops.corr_pallas import KV_V2, W_V2

        g2 = bands_v2_for_templates(tmpl_flat, precision="bf16",
                                    t_chunk=16)
        t_pad, n_tc, n_rows, n_rb = plan_pallas_v2(t_count, n_lags,
                                                   rows_per_block=128,
                                                   t_chunk=16)

        def _sum_kernel(x_ref, g_ref, out_ref):
            acc = jnp.dot(x_ref[:], g_ref[:],
                          preferred_element_type=jnp.float32)
            h = acc.shape[1] // 2
            xr = acc[:, :h]
            xi = acc[:, h:]
            s = jnp.sum(xr * xr + xi * xi, axis=0, keepdims=True)
            out_ref[:] = jnp.broadcast_to(s[:, :128], (8, 128))

        def v2sum_once(re, im, shift):
            n_ext = W_V2 * (n_rows + 2)
            planes = []
            for plane in (jnp.roll(re, shift), jnp.roll(im, shift)):
                p = plane.astype(jnp.float32)
                p = jnp.concatenate(
                    [p, jnp.zeros(n_ext - p.shape[0], jnp.float32)])
                a = p.reshape(n_rows + 2, W_V2)
                planes.append(jnp.concatenate(
                    [a[:-2], a[1:-1], a[2:, : KV_V2 - 2 * W_V2]], axis=1))
            x3 = jnp.concatenate(planes, axis=1).astype(jnp.bfloat16)
            out = pl.pallas_call(
                _sum_kernel,
                grid=(n_tc, n_rb),
                in_specs=[
                    pl.BlockSpec((128, 2 * KV_V2), lambda j, i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((2 * KV_V2, 2 * W_V2 * 16),
                                 lambda j, i: (0, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((8, 128), lambda j, i: (i, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((8 * n_rb, 128 * n_tc),
                                               jnp.float32),
            )(x3, g2)
            return jnp.sum(out)

        @jax.jit
        def v2sum(re, im):
            acc = jnp.float32(0)
            for r in range(R):
                acc = acc + v2sum_once(re, im, 131 * r)
            return acc

        add("v2sum_bf16", v2sum, 2.0 * n_rows * 512 * 2 * 120 * 16 * n_tc)

    if "v1" in variants:
        g_re, g_im = bands_for_templates(tmpl_flat, precision="bf16")
        t_pad, n_tc, n_rows, n_rb = plan_pallas(t_count, n_lags)

        @jax.jit
        def v1(re, im):
            acc = jnp.float32(0)
            for r in range(R):
                out = corr_pow_core(jnp.roll(re, 131 * r),
                                    jnp.roll(im, 131 * r),
                                    g_re, g_im, n_lags, t_count, t_pad,
                                    n_tc, n_rows, n_rb, precision="bf16")
                acc = acc + jnp.sum(out)
            return acc

        add("v1_bf16", v1, 12.0 * n_rows * 128 * 128 * t_pad)

    if any(v.startswith("v2s_") for v in variants):
        # G-residency probe: one pallas_call PER template chunk with the
        # chunk's G as a full (non-gridded) block -- if the gridded
        # version re-fetches G every row step despite its constant
        # index, this variant should be dramatically faster
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from lte_cell_scanner_tpu.ops.corr_pallas import (KV_V2, W_V2,
                                                          _corr_kernel_v2)

        tc = 16
        g2 = bands_v2_for_templates(tmpl_flat, precision="bf16",
                                    t_chunk=tc)
        t_pad, n_tc, n_rows, n_rb = plan_pallas_v2(t_count, n_lags,
                                                   rows_per_block=128,
                                                   t_chunk=tc)
        n_cols = 2 * W_V2 * tc
        g_np = np.asarray(g2)

        def v2s_once(re, im, shift):
            n_ext = W_V2 * (n_rows + 2)
            planes = []
            for plane in (jnp.roll(re, shift), jnp.roll(im, shift)):
                p = plane.astype(jnp.float32)
                p = jnp.concatenate(
                    [p, jnp.zeros(n_ext - p.shape[0], jnp.float32)])
                a = p.reshape(n_rows + 2, W_V2)
                planes.append(jnp.concatenate(
                    [a[:-2], a[1:-1], a[2:, : KV_V2 - 2 * W_V2]],
                    axis=1))
            x3 = jnp.concatenate(planes, axis=1).astype(jnp.bfloat16)
            acc = jnp.float32(0)
            for j in range(n_tc):
                gj = jnp.asarray(g_np[:, j * n_cols: (j + 1) * n_cols])
                out = pl.pallas_call(
                    _corr_kernel_v2,
                    grid=(n_rb,),
                    in_specs=[
                        pl.BlockSpec((128, 2 * KV_V2), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((2 * KV_V2, n_cols), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((128, W_V2 * tc),
                                           lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct(
                        (n_rows, W_V2 * tc), jnp.bfloat16),
                )(x3, gj)
                acc = acc + jnp.sum(out.astype(jnp.float32))
            return acc

        @jax.jit
        def v2s(re, im):
            acc = jnp.float32(0)
            for r in range(R):
                acc = acc + v2s_once(re, im, 131 * r)
            return acc

        add("v2s_bf16_128_16", v2s,
            2.0 * n_rows * 512 * 2 * 120 * tc * n_tc)

    v2i_ms = [int(v.split("_")[1]) for v in variants
              if v.startswith("v2i")]
    for m_i8 in v2i_ms:
        # int8 probe: the 8-bit-ADC capture is int8-EXACT (k/128 grid,
        # one LSB clamp at full scale) and template quantization to
        # int8 is ~0.4% -- the same detection-grade tier as bf16 --
        # while the v5e int8 MXU peak is 2x bf16.  Measures whether the
        # production dot shape runs faster with int8 operands.
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        from lte_cell_scanner_tpu.ops.corr_pallas import (
            KV_V2, W_V2, _im2col_bands)

        tc = 16
        t_pad, n_tc, n_rows, n_rb = plan_pallas_v2(t_count, n_lags,
                                                   rows_per_block=m_i8,
                                                   t_chunk=tc)
        g_f32 = _im2col_bands(tmpl_flat.astype(np.complex64), t_pad,
                              n_tc, tc)
        s_g = 127.0 / np.max(np.abs(g_f32))
        g_i8 = jnp.asarray(np.clip(np.round(g_f32 * s_g), -127, 127)
                           .astype(np.int8))
        inv = np.float32(1.0 / (128.0 * s_g)) ** 2
        n_cols = 2 * W_V2 * tc

        def _kern_i8(x_ref, g_ref, out_ref):
            acc = jax.lax.dot_general(
                x_ref[:], g_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            h = acc.shape[1] // 2
            xr = acc[:, :h].astype(jnp.float32)
            xi = acc[:, h:].astype(jnp.float32)
            out_ref[:] = ((xr * xr + xi * xi) * inv).astype(
                jnp.bfloat16)

        def v2i_once(re, im, shift, n_rows=n_rows, n_rb=n_rb,
                     g_i8=g_i8, inv=inv, m_i8=m_i8):
            n_ext = W_V2 * (n_rows + 2)
            planes = []
            for plane in (jnp.roll(re, shift), jnp.roll(im, shift)):
                # samples are (x-127)/128: k = p*128 is integral
                k = jnp.clip(jnp.round(plane * 128.0), -127, 127)
                p = jnp.concatenate(
                    [k, jnp.zeros(n_ext - k.shape[0], k.dtype)])
                a = p.reshape(n_rows + 2, W_V2)
                planes.append(jnp.concatenate(
                    [a[:-2], a[1:-1], a[2:, : KV_V2 - 2 * W_V2]],
                    axis=1))
            x3 = jnp.concatenate(planes, axis=1).astype(jnp.int8)
            out = pl.pallas_call(
                _kern_i8,
                grid=(n_tc, n_rb),
                in_specs=[
                    pl.BlockSpec((m_i8, 2 * KV_V2), lambda j, i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((2 * KV_V2, n_cols), lambda j, i: (0, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((m_i8, W_V2 * tc),
                                       lambda j, i: (i, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_rows, W_V2 * t_pad),
                                               jnp.bfloat16),
            )(x3, g_i8)
            return jnp.sum(out.astype(jnp.float32))

        def mk_v2i(v2i_once):
            @jax.jit
            def v2i(re, im):
                acc = jnp.float32(0)
                for r in range(R):
                    acc = acc + v2i_once(re, im, 131 * r)
                return acc
            return v2i

        add(f"v2i_int8_{m_i8}_16", mk_v2i(v2i_once),
            2.0 * n_rows * 512 * 2 * 120 * tc * n_tc)

    # v2_M_T: c-major cols + XLA transpose, f32 out
    # v2b_M_T: same with bf16 out; v3_M_T / v3b_M_T: tc-major cols +
    # in-kernel transpose ([template, lag] emitted directly)
    for v in variants:
        kind = v.split("_")[0]
        if kind not in ("v2", "v2b", "v3", "v3b"):
            continue
        _, m_s, t_s = v.split("_")
        m, tc = int(m_s), int(t_s)
        post = "kernel" if kind.startswith("v3") else "xla"
        odt = jnp.bfloat16 if kind.endswith("b") else jnp.float32
        g2 = bands_v2_for_templates(tmpl_flat, precision="bf16",
                                    t_chunk=tc,
                                    tc_major=(post == "kernel"))
        t_pad, n_tc, n_rows, n_rb = plan_pallas_v2(t_count, n_lags,
                                                   rows_per_block=m,
                                                   t_chunk=tc)

        def mk(g2, m, tc, t_pad, n_tc, n_rows, n_rb, post, odt):
            @jax.jit
            def v2(re, im):
                acc = jnp.float32(0)
                for r in range(R):
                    out = corr_pow_core_v2(
                        jnp.roll(re, 131 * r), jnp.roll(im, 131 * r),
                        g2, n_lags, t_count, t_pad, n_tc, n_rows, n_rb,
                        rows_per_block=m, t_chunk=tc, precision="bf16",
                        post=post, out_dtype=odt)
                    acc = acc + jnp.sum(out.astype(jnp.float32))
                return acc
            return v2

        add(f"{kind}_bf16_{m}_{tc}",
            mk(g2, m, tc, t_pad, n_tc, n_rows, n_rb, post, odt),
            2.0 * n_rows * 512 * 2 * 120 * tc * n_tc)

    print(json.dumps(res) if ARGS.json else
          "\n".join(f"{k:26} {v}" for k, v in res.items()))


if __name__ == "__main__":
    main()
