"""Stage-by-stage on-chip cost split of the lean PSS front end.

The carrier-batched scan costs ~4.5 ms/carrier on-die while the
correlation kernel alone costs ~1.3 ms -- this bench times cumulative
prefixes of _xcorr_core_impl's lean pipeline to locate the rest:

  kern        correlation kernel only (bf16 power map out)
  fold        + k_factor incoherent fold (fori_loop of dynamic slices)
  ds          + delay-spread combining + hypothesis collapse
  gslab       + the RETIRED take_along_axis refinement slab (gathers)
  slab        + the production one-hot refinement slab
  sp          + the production fold-then-window sp_est
  full        the production lean front end (_xcorr_core_impl)

Same transfer-synced methodology as tools/bench_corr_v2.py (R inner
invocations per program, distinct buffers, one final device_get).

Usage: python tools/bench_front_stages.py [--json] [--inner 4]
       [--repeats 4] [--stages kern,fold,ds,slab,full]
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
ap.add_argument("--repeats", type=int, default=4)
ap.add_argument("--inner", type=int, default=4)
ap.add_argument("--json", action="store_true")
ap.add_argument("--platform", default="tpu")
ap.add_argument("--stages", default="kern,fold,ds,slab,full")
ap.add_argument("--carriers", type=int, default=0,
                help=">0: vmap each stage prefix over C carriers with "
                     "per-carrier fold starts and ONE shared band set "
                     "(the production batched-scan context; programs "
                     "are then large enough that per-program overhead "
                     "is negligible and stage deltas attribute "
                     "reliably)")
ARGS = ap.parse_args()

from _bench_common import enable_compile_cache, setup_platform  # noqa: E402

setup_platform(ARGS.platform, x64_on_cpu=False)
enable_compile_cache()

import jax.numpy as jnp  # noqa: E402

from lte_cell_scanner_tpu.constants import (FS_LTE, HALF_FRAME_LEN,  # noqa: E402
                                            PSS_TD_LEN)
from lte_cell_scanner_tpu.models.search import default_f_search_set  # noqa: E402
from lte_cell_scanner_tpu.models.xcorr import (  # noqa: E402
    _xcorr_core_impl, combine_start_indices, pss_templates)
from lte_cell_scanner_tpu.ops.corr_pallas import (  # noqa: E402
    corr_pow_core_v2, plan_pallas_v2, prod_bands_for_templates)
from lte_cell_scanner_tpu.utils import read_itfile  # noqa: E402


def timed(fn, bufs):
    jax.device_get(fn(*bufs[0]))
    t0 = time.perf_counter()
    outs = [fn(re, im) for re, im in bufs]
    jax.device_get(outs)
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
    n_f = len(f_set)
    tmpl = pss_templates(f_set, fc, fc, fs, np.complex64)
    tmpl_flat = tmpl.reshape(-1, PSS_TD_LEN)
    t_count = tmpl_flat.shape[0]
    n_comb_xc = (n_lags - 100) // 9600
    starts_np = combine_start_indices(f_set, fc, fc, fs, n_comb_xc)

    g = prod_bands_for_templates(tmpl_flat)
    t_pad, n_tc, n_rows, n_rb = plan_pallas_v2(t_count, n_lags)

    res = {"backend": jax.default_backend(), "n_templates": t_count,
           "inner": R, "buffers": ARGS.repeats}

    bufs = []
    for k in range(ARGS.repeats):
        c = np.roll(capbuf, 977 * k + 1)
        bufs.append((jnp.asarray(np.ascontiguousarray(c.real)),
                     jnp.asarray(np.ascontiguousarray(c.imag))))
    for re, im in bufs:
        re.block_until_ready()
        im.block_until_ready()

    def kern_only(re, im):
        return corr_pow_core_v2(re, im, g, n_lags, t_count, t_pad, n_tc,
                                n_rows, n_rb, precision="bf16",
                                post="xla", out_dtype=jnp.bfloat16)

    def prefix(upto):
        """Cumulative prefix of the lean pipeline up to a stage."""
        def run(re, im):
            xc2 = kern_only(re, im).reshape(3, n_f, n_lags)
            if upto == "kern":
                return jnp.sum(xc2.astype(jnp.float32))
            rdt = jnp.float32

            def fold_one_f(xc2_f, starts):
                def body(m, acc):
                    return acc + jax.lax.dynamic_slice_in_dim(
                        xc2_f, starts[m], HALF_FRAME_LEN, axis=1)
                acc = jnp.zeros((3, HALF_FRAME_LEN), rdt)
                return jax.lax.fori_loop(0, n_comb_xc, body,
                                         acc) / n_comb_xc

            xc_single = jax.vmap(fold_one_f, in_axes=(1, 0),
                                 out_axes=1)(xc2, jnp.asarray(starts_np))
            if upto == "fold":
                return jnp.sum(xc_single)
            xc_inc = xc_single
            for t in range(1, 3):
                xc_inc = xc_inc + jnp.roll(xc_single, t, axis=-1) \
                    + jnp.roll(xc_single, -t, axis=-1)
            xc_inc = xc_inc / 5
            pow_c = jnp.max(xc_inc, axis=1)
            frq_c = jnp.argmax(xc_inc, axis=1)
            if upto == "ds":
                return (jnp.sum(pow_c)
                        + jnp.sum(frq_c.astype(jnp.float32)))
            if upto == "gslab":
                # the RETIRED gather-based slab (take_along_axis), kept
                # to quantify the one-hot fix
                frq_idx = frq_c[:, None, :]
                rows = []
                for d in range(5):
                    rolled = jnp.roll(xc_single, 2 - d, axis=-1)
                    rows.append(jnp.take_along_axis(rolled, frq_idx,
                                                    axis=1)[:, 0, :])
                slab = jnp.stack(rows, axis=1)
                return (jnp.sum(pow_c) + jnp.sum(slab)
                        + jnp.sum(frq_c.astype(jnp.float32)))
            # production one-hot slab (models/xcorr lean path)
            oh = frq_c[:, None, :] == jnp.arange(
                n_f, dtype=frq_c.dtype)[None, :, None]
            rows = []
            for d in range(5):
                rolled = jnp.roll(xc_single, 2 - d, axis=-1)
                rows.append(jnp.sum(jnp.where(oh, rolled, 0), axis=1))
            slab = jnp.stack(rows, axis=1)
            out = (jnp.sum(pow_c) + jnp.sum(slab)
                   + jnp.sum(frq_c.astype(jnp.float32)))
            if upto == "slab":
                return out
            # + production fold-then-window sp_est (models/xcorr lean)
            n_comb_sp = (n_cap - 136 - 137) // HALF_FRAME_LEN
            p = re * re + im * im
            q = jnp.zeros(HALF_FRAME_LEN + 273, jnp.float32)
            for mm in range(n_comb_sp):
                q = q + jax.lax.dynamic_slice_in_dim(
                    p, mm * HALF_FRAME_LEN, HALF_FRAME_LEN + 273)
            cq = jnp.concatenate([jnp.zeros(1, jnp.float32),
                                  jnp.cumsum(q)])
            sp_inc = (cq[274: 274 + HALF_FRAME_LEN]
                      - cq[:HALF_FRAME_LEN]) / (274.0 * n_comb_sp)
            return out + jnp.sum(sp_inc)
        return run

    def full(re, im):
        out = _xcorr_core_impl(jax.lax.complex(re, im), tmpl, starts_np,
                               2, False, True, g)
        _s, _i, pow_c, frq_c, _sp, sp_inc, _xc, slab = out
        return (jnp.sum(pow_c) + jnp.sum(sp_inc) + jnp.sum(slab)
                + jnp.sum(frq_c.astype(jnp.float32)))

    fns = {"kern": prefix("kern"), "fold": prefix("fold"),
           "ds": prefix("ds"), "gslab": prefix("gslab"),
           "slab": prefix("slab"), "sp": prefix("sp"), "full": full}

    C = ARGS.carriers
    if C:
        # production context: per-carrier starts, one shared band set,
        # jax.vmap over carriers (per-carrier capture = rolled planes)
        starts_c = np.stack([
            combine_start_indices(f_set, fc + 1e5 * c, fc + 1e5 * c, fs,
                                  n_comb_xc) for c in range(C)
        ]).astype(np.int32)
        res["carriers"] = C

        def batched(stage):
            def one(re, im, st):
                if stage == "full":
                    out = _xcorr_core_impl(jax.lax.complex(re, im),
                                           tmpl, st, 2, False, True, g)
                    _s, _i, pow_c, frq_c, _sp, sp_inc, _xc, slab = out
                    return (jnp.sum(pow_c) + jnp.sum(sp_inc)
                            + jnp.sum(slab)
                            + jnp.sum(frq_c.astype(jnp.float32)))
                # prefix stages close over one shared starts plan:
                # per-carrier starts only change fold exactness, not
                # cost attribution (identical access pattern)
                return fns[stage](re, im)

            @jax.jit
            def run(re, im):
                res_ = jax.vmap(
                    lambda k, st: one(jnp.roll(re, 131 * k + 7),
                                      jnp.roll(im, 131 * k + 7), st))(
                    jnp.arange(C), jnp.asarray(starts_c))
                return jnp.sum(res_)
            return run

        for name in ARGS.stages.split(","):
            try:
                dt = timed(batched(name), bufs) / C
                res[f"{name}_ms_per_carrier"] = round(dt * 1e3, 4)
            except Exception as e:  # noqa: BLE001
                res[f"{name}_error"] = f"{type(e).__name__}: {e}"[:250]
        print(json.dumps(res) if ARGS.json else
              "\n".join(f"{k:14} {v}" for k, v in res.items()))
        return

    for name in ARGS.stages.split(","):
        f = fns[name]

        def looped(re, im, f=f):
            acc = jnp.float32(0)
            for r in range(R):
                acc = acc + f(jnp.roll(re, 131 * r), jnp.roll(im, 131 * r))
            return acc

        try:
            dt = timed(jax.jit(looped), bufs) / R
            res[f"{name}_ms"] = round(dt * 1e3, 4)
        except Exception as e:  # noqa: BLE001
            res[f"{name}_error"] = f"{type(e).__name__}: {e}"[:250]

    print(json.dumps(res) if ARGS.json else
          "\n".join(f"{k:14} {v}" for k, v in res.items()))


if __name__ == "__main__":
    main()
