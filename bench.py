"""Benchmark: PSS-scan throughput on one chip vs the reference baseline.

Prints ONE JSON line:
  {"metric": "pss_scan_samples_per_sec", "value": N, "unit": "samples/s",
   "vs_baseline": R, "full_chain": {...}}

Baseline (BASELINE.md): the reference CellSearch takes ~6 s per center
frequency on a dual-core i7-2640 with the default hypothesis grid --
153600 IQ samples / 6 s = 25.6k samples/s through the full PSS scan.

Primary metric: the full per-carrier front end on the real capture
(test/capbuf_0000.it when present, synthetic otherwise): template
correlation over the default +-100 ppm hypothesis grid, incoherent fold,
delay-spread combining, hypothesis collapse, and signal-power estimation,
on one TPU chip in complex64, measured through the PRODUCTION batched
scan program (the v4 fused-fold kernel, 64 carriers per dispatch --
scan_band's max_carriers_per_program -- the parallel/carriers layout),
dispatch-pipelined (steady-state throughput), reported per carrier.

Second headline (BASELINE config 2, VERDICT round-1 item 1): the whole
detect+decode chain on the same chip -- front end + chi-squared
threshold + greedy peak search + the fused SSS+FOE dispatch + fused
tfg/tfoec/chan_est/MIB decode -- reported as seconds/carrier vs the
reference's 6 s, with per-call blocking (true latency, no pipelining).
The two 739 MHz cells must decode or the field is marked invalid.
Set BENCH_FULL_CHAIN=0 to skip (e.g. when the tunnel is too slow to
compile the back half inside the driver's budget).
"""

import json
import os
import time

import numpy as np


def full_chain(capbuf, fc):
    """Whole-chain s/carrier on the default grid; one warm compile pass,
    then best-of-3 with per-call completion.

    Transfer/RTT budget (VERDICT r3 item 2): the capture is uploaded
    ONCE per carrier (device_complex; xcorr_pss and both back-half
    programs reuse it), and the chain makes exactly THREE blocking
    device round trips -- the front end's batched device_get, the
    FUSED SSS-detect + fine-FOE program, and the fused
    tfg/tfoec/chan_est/MIB decode.  Each stage's wall time is reported
    so tunnel variance is a measurement, not a shrug: on a healthy
    tunnel the whole chain is a few hundred ms; a slow session shows
    up as front_ms/refine_ms inflation at an unchanged stage
    structure."""
    from lte_cell_scanner_tpu.constants import DS_COMB_ARM, FS_LTE
    from lte_cell_scanner_tpu.models.peaks import peak_search
    from lte_cell_scanner_tpu.models.search import (SearchConfig,
                                                    compute_z_th1,
                                                    default_f_search_set,
                                                    refine_peaks)
    from lte_cell_scanner_tpu.models.xcorr import xcorr_pss
    from lte_cell_scanner_tpu.ops.boundary import device_complex_adc
    from lte_cell_scanner_tpu.ops.corr_pallas import is_adc_grid as _is_grid

    fs = FS_LTE / 16
    fss = default_f_search_set(fc, 100.0)
    cfg = SearchConfig()

    def run():
        st = {}
        t0 = time.perf_counter()
        # the ONE upload, ASYNC -- as lossless uint8 ADC codes (the
        # production cell_search wire, round 5: 4x fewer bytes than
        # float planes on the dominant transfer)
        # no completion barrier here: the transfer overlaps the front
        # program's dispatch (a sync would add a pure-latency round
        # trip); upload_issue_ms is the host-side issue cost only, the
        # wire time lands in front_ms
        cap_dev = device_complex_adc(capbuf)
        t1 = time.perf_counter()
        st["upload_issue_ms"] = (t1 - t0) * 1e3
        # round 5: threshold + greedy peak search fused into the front
        # program (the cell_search accelerator route) -- ~KB of peak
        # records download instead of the maps + refinement slab
        from lte_cell_scanner_tpu.models.peaks import \
            cells_from_peak_records
        from lte_cell_scanner_tpu.models.xcorr import xcorr_pss_peaks
        recs, n, _nc = xcorr_pss_peaks(capbuf, fss, DS_COMB_ARM, fc, fc,
                                       fs, 12, cap_dev=cap_dev)
        t2 = time.perf_counter()
        st["front_ms"] = (t2 - t1) * 1e3
        peaks = cells_from_peak_records(recs, n, fss, fc, fc)
        t3 = time.perf_counter()
        st["peak_search_host_ms"] = (t3 - t2) * 1e3
        cells = refine_peaks(peaks, capbuf, fc, fc, fs, cfg,
                             cap_dev=cap_dev)
        st["refine_ms"] = (time.perf_counter() - t3) * 1e3
        return cells, st

    cells, _ = run()                    # compile + warm
    runs = []
    for _ in range(5):
        t0 = time.perf_counter()
        cells, st = run()
        runs.append((time.perf_counter() - t0, st))
    # median-of-N with the spread attached (VERDICT r4 item 5: published
    # == what a cold driver run reproduces, variance band included; the
    # tunnel has ~2x session-to-session transfer variance)
    runs.sort(key=lambda r: r[0])
    med_dt, med_st = runs[len(runs) // 2]
    ids = sorted(c.n_id_cell() for c in cells)
    return {"s_per_carrier": round(med_dt, 4),
            "s_per_carrier_min": round(runs[0][0], 4),
            "s_per_carrier_max": round(runs[-1][0], 4),
            "n_runs": len(runs),
            "vs_baseline": round(6.0 / med_dt, 1),
            "n_cells": len(cells), "cell_ids": ids,
            "valid": ids == [271, 277],
            "uploads_per_carrier": 1,
            # wire bytes: ADC-grid captures cross as 2 uint8 planes
            "bytes_uploaded": 2 * len(capbuf) if _is_grid(capbuf)
            else int(np.asarray(capbuf).nbytes),
            "blocking_round_trips": 3,
            "stages_ms": {k: round(v, 1) for k, v in med_st.items()}}


def main():
    import jax

    # persistent compile cache: the remote-tunnel compiles dominate a
    # cold run (minutes); cached executables make driver re-runs cheap
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import jax.numpy as jnp
    from lte_cell_scanner_tpu.constants import FS_LTE
    from lte_cell_scanner_tpu.models.search import default_f_search_set
    from lte_cell_scanner_tpu.models.xcorr import (combine_start_indices,
                                                   pss_templates)

    fs = FS_LTE / 16
    fc = 739e6
    try:
        from lte_cell_scanner_tpu.utils import read_itfile
        capbuf = read_itfile("/root/reference/test/capbuf_0000.it")["capbuf"]
    except Exception:
        rng = np.random.default_rng(0)
        capbuf = (rng.normal(size=153600) + 1j * rng.normal(size=153600)) * 0.1
    capbuf = np.asarray(capbuf, dtype=np.complex64)
    n_cap = len(capbuf)

    from lte_cell_scanner_tpu.models.xcorr import _xcorr_core_impl
    f_set = default_f_search_set(fc, ppm=100)   # 31 hypotheses (ref default)
    n_comb_xc = (n_cap - 136 - 100) // 9600
    # closure constants stay HOST numpy: a device-resident complex
    # constant would be pulled back through the axon client's broken
    # transfer path at lowering time
    templates = pss_templates(f_set, fc, fc, fs, np.complex64)
    start_idx = combine_start_indices(f_set, fc, fc, fs, n_comb_xc)

    # Measurement integrity (measured the hard way, tools/bench_kernels
    # docstring): the tunnel runtime fire-aheads dispatches --
    # block_until_ready acknowledges before real execution -- and can
    # shortcut re-dispatches of recently executed (program, inputs)
    # pairs.  The only trustworthy completion barrier is a device->host
    # transfer of a value data-dependent on the compute.  So: the
    # capture crosses as float planes (complex program parameters make
    # outputs untransferable here), the program returns a scalar
    # checksum over every output, each timed call gets a DISTINCT
    # single-use buffer, and one final device_get of all checksums
    # closes the pipeline.  wall / K = steady-state scan throughput.
    # production correlation backend on TPU: the v4 FUSED-FOLD Pallas
    # kernel (correlation + k_factor fold in one program, delta offsets
    # baked per period, int8 on the ADC-grid capture -- docs/SCALING.md
    # round 4) via the same planner scan_band uses; XLA dot elsewhere.
    # Bands ride as ARGUMENTS -- closing over device arrays would embed
    # them as MLIR constants and pull them device->host at lowering.
    from lte_cell_scanner_tpu.models.search import SearchConfig
    from lte_cell_scanner_tpu.parallel.carriers import _plan_scan_bands
    tmpl_plan = np.broadcast_to(
        templates, (1,) + templates.shape)      # planner wants [C,...]
    bands = _plan_scan_bands(tmpl_plan, start_idx[None], [capbuf],
                             SearchConfig())

    # the production scan program: C carriers batched per dispatch
    # (parallel/carriers._vmap_front -- correlation vmapped, back
    # stages under lax.map, one shared band set), per-carrier fold
    # starts exactly as scan_band plans them
    from lte_cell_scanner_tpu.parallel.carriers import _vmap_front
    C = 64      # carriers per dispatch = scan_band's
                # max_carriers_per_program (the measured knee: 2143 /
                # 2533 / 2857 carriers/s at 32 / 64 / 128 vs 1565-1783
                # at 16 -- tools/bench_carriers.py r4, docs/SCALING.md;
                # 64 balances throughput against the v2 FALLBACK
                # path's ~30 MB/carrier lag-map HBM footprint)
    starts_c = np.stack([combine_start_indices(
        f_set, fc + 1e5 * c, fc + 1e5 * c, fs, n_comb_xc)
        for c in range(C)]).astype(np.int32)
    tmpl_c = np.broadcast_to(templates, (C,) + templates.shape)

    @jax.jit
    def launch(re, im, *g):
        cap_c = jax.vmap(
            lambda k: jnp.roll(jax.lax.complex(re, im), 977 * k + 7))(
            jnp.arange(C))
        slab, pow_c, frq_c, sp_inc = _vmap_front(
            cap_c, tmpl_c, starts_c, 2, tuple(g))
        return (jnp.sum(pow_c) + jnp.sum(sp_inc) + jnp.sum(slab)
                + jnp.sum(frq_c.astype(jnp.float32)))

    n_iter, n_rounds = 6, 5
    bufs = []
    for k in range(n_iter * n_rounds):
        c = np.roll(capbuf, 977 * k + 1)
        bufs.append((jnp.asarray(np.ascontiguousarray(c.real)),
                     jnp.asarray(np.ascontiguousarray(c.imag))))
    for re, im in bufs:
        re.block_until_ready()
        im.block_until_ready()

    jax.device_get(launch(*bufs[0], *bands))  # compile + true sync
    round_dts = []
    for r in range(n_rounds):
        batch = bufs[r * n_iter: (r + 1) * n_iter]
        t0 = time.perf_counter()
        outs = [launch(re, im, *bands) for re, im in batch]
        jax.device_get(outs)              # forces completion of all
        round_dts.append((time.perf_counter() - t0) / n_iter)
    # median-of-rounds (VERDICT r4 item 5: the published number must be
    # what a cold driver run reproduces, spread attached) -- per carrier
    round_dts.sort()
    dt = round_dts[len(round_dts) // 2] / C
    dt_lo = round_dts[0] / C
    dt_hi = round_dts[-1] / C

    samples_per_sec = n_cap / dt
    baseline = 153600 / 6.0
    # MFU on the chip: exact-correlation useful FLOPs (8 real FLOPs per
    # complex MAC x templates x taps x lags) per front-end pass, against
    # (a) the v5e nominal bf16 peak and (b) this chip's measured
    # achievable chained-matmul rate (88 TF/s, tools/bench_corr_v2.py
    # mxu_peak under transfer-synced timing -- docs/SCALING.md).
    n_lags = n_cap - 136
    useful_flops = 8.0 * templates.shape[0] * templates.shape[1] \
        * 137 * n_lags
    tflops = useful_flops / dt / 1e12
    out = {
        "metric": "pss_scan_samples_per_sec",
        "value": round(samples_per_sec, 1),
        "unit": "samples/s",
        "value_min": round(n_cap / dt_hi, 1),
        "value_max": round(n_cap / dt_lo, 1),
        "n_rounds": n_rounds,
        "vs_baseline": round(samples_per_sec / baseline, 2),
        "useful_tflops": round(tflops, 2),
        "mfu_pct_nominal_197tf": round(100 * tflops / 197.0, 2),
        "mfu_pct_measured_peak_88tf": round(100 * tflops / 88.0, 2),
    }
    if os.environ.get("BENCH_FULL_CHAIN", "1") != "0":
        try:
            out["full_chain"] = full_chain(capbuf, fc)
        except Exception as e:  # noqa: BLE001 - keep the primary metric
            out["full_chain"] = {"error": f"{type(e).__name__}: {e}"[:200]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
