"""Isolated probe: batched k_factor fold+slab, vmap vs lax.map.

Theory under test: the carrier-batched front end costs ~4.5 ms/carrier
while the correlation kernel alone costs ~1.5 ms because vmapping the
fold turns its per-(carrier, hypothesis) dynamic slices into TPU
gathers.  This probe times ONLY the fold(+delay-spread+collapse+slab)
stages over a synthetic bf16 power map [C, 3, n_f, n_lags]:

  vmap     jax.vmap over carriers (the production formulation)
  map      jax.lax.map over carriers (sequential, keeps dynamic slices)

Usage: python tools/bench_fold_probe.py [--json] [--carriers 16]
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
ap.add_argument("--carriers", type=int, default=16)
ap.add_argument("--repeats", type=int, default=4)
ap.add_argument("--json", action="store_true")
ap.add_argument("--platform", default="tpu")
ARGS = ap.parse_args()

from _bench_common import enable_compile_cache, setup_platform  # noqa: E402

setup_platform(ARGS.platform, x64_on_cpu=False)
enable_compile_cache()

import jax.numpy as jnp  # noqa: E402

from lte_cell_scanner_tpu.constants import FS_LTE, HALF_FRAME_LEN  # noqa: E402
from lte_cell_scanner_tpu.models.search import default_f_search_set  # noqa: E402
from lte_cell_scanner_tpu.models.xcorr import combine_start_indices  # noqa: E402


def timed(fn, bufs):
    jax.device_get(fn(bufs[0]))
    t0 = time.perf_counter()
    outs = [fn(b) for b in bufs]
    jax.device_get(outs)
    return (time.perf_counter() - t0) / len(bufs)


def main():
    fs = FS_LTE / 16
    C = ARGS.carriers
    n_lags = 153464
    f_set = default_f_search_set(739e6, 100.0)
    n_f = len(f_set)
    n_comb = (n_lags - 100) // HALF_FRAME_LEN

    starts = np.stack([
        combine_start_indices(f_set, 739e6 + 1e5 * c, 739e6 + 1e5 * c,
                              fs, n_comb) for c in range(C)
    ]).astype(np.int32)                          # [C, n_f, n_comb]

    rng = np.random.default_rng(0)
    base = rng.normal(size=(3, n_f, n_lags)).astype(np.float32) ** 2

    def fold_fori(xc2, st):
        def fold_one_f(xc2_f, starts_f):
            def body(m, acc):
                return acc + jax.lax.dynamic_slice_in_dim(
                    xc2_f, starts_f[m], HALF_FRAME_LEN, axis=1)
            return jax.lax.fori_loop(
                0, n_comb, body,
                jnp.zeros((3, HALF_FRAME_LEN), jnp.float32)) / n_comb

        return jax.vmap(fold_one_f, in_axes=(1, 0), out_axes=1)(xc2, st)

    def fold_unroll(xc2, st):
        """Static python loop over periods: 15 big batched slice ops
        instead of a fori_loop of small ones."""
        acc = jnp.zeros((3, n_f, HALF_FRAME_LEN), jnp.float32)
        for m in range(n_comb):
            sl = jax.vmap(
                lambda xf, s: jax.lax.dynamic_slice_in_dim(
                    xf, s, HALF_FRAME_LEN, axis=1),
                in_axes=(1, 0), out_axes=1)(xc2, st[:, m])
            acc = acc + sl
        return acc / n_comb

    def one_carrier(xc2, st, fold=fold_fori, with_slab=True):
        """fold + delay spread + collapse (+ slab) for one carrier
        (mirrors models/xcorr._xcorr_core_impl's lean back stages)."""
        xc_single = fold(xc2, st)
        xc_inc = xc_single
        for t in range(1, 3):
            xc_inc = xc_inc + jnp.roll(xc_single, t, axis=-1) \
                + jnp.roll(xc_single, -t, axis=-1)
        xc_inc = xc_inc / 5
        pow_c = jnp.max(xc_inc, axis=1)
        frq_c = jnp.argmax(xc_inc, axis=1)
        out = jnp.sum(pow_c) + jnp.sum(frq_c.astype(jnp.float32))
        if not with_slab:
            return out
        frq_idx = frq_c[:, None, :]
        rows = []
        for d in range(5):
            rolled = jnp.roll(xc_single, 2 - d, axis=-1)
            rows.append(jnp.take_along_axis(rolled, frq_idx,
                                            axis=1)[:, 0, :])
        slab = jnp.stack(rows, axis=1)
        return out + jnp.sum(slab)

    st_d = jnp.asarray(starts)

    def mkfn(fold, with_slab):
        @jax.jit
        def f(xc2_all):
            return jnp.sum(jax.vmap(
                lambda x, s: one_carrier(x, s, fold, with_slab))(
                    xc2_all, st_d))
        return f

    via_vmap = mkfn(fold_fori, True)

    @jax.jit
    def via_map(xc2_all):
        return jnp.sum(jax.lax.map(
            lambda ab: one_carrier(*ab, fold_fori, True),
            (xc2_all, st_d)))

    bufs = []
    for k in range(ARGS.repeats):
        x = np.stack([np.roll(base, 7 * c + k, axis=-1)
                      for c in range(C)]).astype(jnp.bfloat16)
        b = jnp.asarray(x)
        b.block_until_ready()
        bufs.append(b)

    res = {"backend": jax.default_backend(), "carriers": C,
           "n_f": n_f, "n_comb": n_comb}
    for name, fn in (("vmap", via_vmap), ("map", via_map),
                     ("unroll", mkfn(fold_unroll, True)),
                     ("noslab_fori", mkfn(fold_fori, False)),
                     ("noslab_unroll", mkfn(fold_unroll, False))):
        try:
            dt = timed(fn, bufs)
            res[f"{name}_ms"] = round(dt * 1e3, 2)
            res[f"{name}_ms_per_carrier"] = round(dt * 1e3 / C, 3)
        except Exception as e:  # noqa: BLE001
            res[f"{name}_error"] = f"{type(e).__name__}: {e}"[:250]

    print(json.dumps(res) if ARGS.json else
          "\n".join(f"{k:22} {v}" for k, v in res.items()))


if __name__ == "__main__":
    main()
