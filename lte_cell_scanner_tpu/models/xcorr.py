"""xcorr_pss: PSS correlation, incoherent combining, and peak collapse.

Behavioral contract: reference xcorr_pss and its subfunctions
(/root/reference/src/searcher.cpp:113-419).  TPU-native design notes:

- xc_correlate: one batched MXU matmul over all (pss, hypothesis) templates
  (see ops/corr.py) instead of the reference's OpenMP scalar lag loop.
- sp_est: the reference's recursive 274-sample running sum
  (searcher.cpp:209-211) becomes a cumulative-sum difference.
- xc_combine: the k_factor-scaled half-frame fold (searcher.cpp:263-308)
  becomes a gather with host-precomputed integer start indices -- the
  non-integer frame stride (which disambiguates true carrier frequency
  from offset aliases) lives entirely in the index plan.
- xc_delay_spread / xc_peak_freq: rolls + reductions.

Array layout: lag axis last ([3, n_f, lag]) so TPU lanes run along lags.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..constants import FS_LTE, HALF_FRAME_LEN, PSS_TD_LEN
from .pss import PSS_TD
from ..ops.boundary import device_complex, safe_jit
from ..ops.corr import correlate


def round_i(x):
    """C/Matlab round: half away from zero (itpp::round_i)."""
    return np.where(np.asarray(x) >= 0, np.floor(np.asarray(x) + 0.5),
                    np.ceil(np.asarray(x) - 0.5)).astype(np.int64)


def pss_templates(f_search_set: np.ndarray, fc_requested: float,
                  fc_programmed: float, fs_programmed: float,
                  dtype=np.complex128) -> np.ndarray:
    """Frequency-shifted conjugated PSS matched filters, [3, n_f, 137].

    template[t, f, m] = conj(pss_td[t][m] * e^{j 2 pi f_off m / (fs k)}) / 137
    with k = (fc_requested - f_off) / fc_programmed  (searcher.cpp:145-151).
    Host-precomputed in float64, cast to the compute dtype.
    """
    pss = PSS_TD()  # [3, 137] complex128
    m = np.arange(PSS_TD_LEN)
    f_off = np.asarray(f_search_set, dtype=np.float64)
    k_factor = (fc_requested - f_off) / fc_programmed
    phase = 2.0 * np.pi * f_off[:, None] * m[None, :] / (fs_programmed * k_factor[:, None])
    shifted = pss[:, None, :] * np.exp(1j * phase)[None]
    return (np.conj(shifted) / PSS_TD_LEN).astype(dtype)


def combine_start_indices(f_search_set: np.ndarray, fc_requested: float,
                          fc_programmed: float, fs_programmed: float,
                          n_comb_xc: int) -> np.ndarray:
    """[n_f, n_comb] integer start offsets of each 5 ms period in the fold.

    actual_start_index = round_i(m * .005 * k_factor * fs_programmed)
    (searcher.cpp:296-298).
    """
    f_off = np.asarray(f_search_set, dtype=np.float64)
    k_factor = (fc_requested - f_off) / fc_programmed
    m = np.arange(n_comb_xc, dtype=np.float64)
    return round_i(m[None, :] * 0.005 * k_factor[:, None] * fs_programmed)


def _xcorr_core_impl(capbuf, templates, start_idx, ds_comb_arm: int,
                     keep_xc: bool = True, lean: bool = False,
                     g_re=None, g_im=None):
    """Jitted device portion of xcorr_pss.

    Returns (xc_incoherent_single [3,n_f,9600], xc_incoherent [3,n_f,9600],
             pow [3,9600], frq [3,9600], sp [n_sp], sp_incoherent [9600], xc).

    keep_xc=False drops the raw complex correlation from the outputs so
    XLA fuses the |.|^2 into the matmul epilogue and never materializes
    the [3, n_f, n_lags] complex array (~114 MB at the default grid) --
    the production scan path only needs the folded powers.

    lean=True additionally drops xc_incoherent, sp, AND the full
    xc_incoherent_single (None in their slots), returning instead an
    8th output refine_slab [3, 2*arm+1, 9600]:
    slab[t, d, l] = xc_single[t, frq[t, l], (l - arm + d) % 9600] --
    exactly the values peak_search's single-lag refinement reads
    (searcher.cpp:457-465), gathered on DEVICE at the collapsed argmax
    frequency.  Cuts the device->host transfer ~6x at the default grid
    (the scan path never needs the full [3, n_f, 9600] tensor).

    g_re/g_im (optional): host-built template matrices routing the
    correlation through a Pallas kernel (ops/corr_pallas.py) instead of
    the XLA im2col dot -- the TPU production path (see docs/SCALING.md
    "Pallas kernel").  Band formats (full list in _corr_stage): g_re
    alone = the production v2 im2col kernel (bf16 power output that the
    fold accumulates in f32); int8 g_re + scale g_im = the ADC-exact
    int8 dot; a float (g_re, g_im) pair = the v1 banded block-Toeplitz
    kernel (kept for A/B).  Requires keep_xc=False (the kernels fuse
    |.|^2 and never materialize the complex correlation).
    """
    xc2, xc, pw_scale = _corr_stage(capbuf, templates, keep_xc, g_re,
                                    g_im)
    (xc_single, xc_inc, pow_collapsed, frq_collapsed, sp, sp_incoherent,
     refine_slab) = _back_stage(xc2, capbuf, start_idx, ds_comb_arm,
                                lean, pw_scale)
    return (xc_single, xc_inc, pow_collapsed, frq_collapsed, sp,
            sp_incoherent, xc if keep_xc else None, refine_slab)


def _corr_stage(capbuf, templates, keep_xc: bool = False,
                g_re=None, g_im=None):
    """Correlation-power part of the front end: -> (xc2 [3, n_f,
    n_lags], xc-or-None, power-scale-or-None).  Split from _back_stage
    so the batched scan can vmap THIS stage over carriers while running
    the back stages under lax.map (per-carrier fold starts under vmap
    batch dynamic slices into TPU gathers -- measured ~1 ms/carrier,
    tools/bench_front_stages.py).

    Band formats: g_re alone (bf16/f32) = the v2 im2col kernel;
    g_re of dtype int8 with g_im = the power scale scalar = the int8
    ADC-exact v2 path (xc2 comes back UNSCALED; _back_stage applies the
    scale on the folded map); (g_re, g_im) float pair = the v1 banded
    kernel."""
    n_f = templates.shape[1]
    rdt = jnp.real(capbuf).dtype
    n_lags = capbuf.shape[0] - (PSS_TD_LEN - 1)
    pw_scale = None

    if g_re is not None:
        if keep_xc:
            raise ValueError("pallas correlation backend cannot return "
                             "the complex correlation (keep_xc=True)")
        t_count = 3 * n_f
        is_int8 = g_re.dtype == jnp.int8
        prec = "int8" if is_int8 \
            else "bf16" if g_re.dtype == jnp.bfloat16 else "f32"
        # interpret mode off-TPU so CPU CI can execute this branch
        interp = jax.default_backend() != "tpu"
        if g_im is None or is_int8:
            from ..ops.corr_pallas import (PROD_V2_OUT_DTYPE,
                                           PROD_V2_POST,
                                           corr_pow_core_v2,
                                           plan_pallas_v2)
            t_pad, n_tc, n_rows, n_rb = plan_pallas_v2(t_count, n_lags)
            odt = jnp.float32 if prec == "f32" else PROD_V2_OUT_DTYPE
            xc2 = corr_pow_core_v2(
                jnp.real(capbuf), jnp.imag(capbuf), g_re, n_lags,
                t_count, t_pad, n_tc, n_rows, n_rb, interpret=interp,
                precision=prec, post=PROD_V2_POST, out_dtype=odt)
            if is_int8:
                pw_scale = g_im    # scalar restoring capture units
        else:
            from ..ops.corr_pallas import corr_pow_core, plan_pallas
            t_pad, n_tc, n_rows, n_rb = plan_pallas(t_count, n_lags)
            xc2 = corr_pow_core(jnp.real(capbuf), jnp.imag(capbuf),
                                g_re, g_im, n_lags, t_count, t_pad,
                                n_tc, n_rows, n_rb, interpret=interp,
                                precision=prec)
        if xc2.dtype != rdt and xc2.dtype != jnp.bfloat16:
            xc2 = xc2.astype(rdt)
        # bf16 power maps stay bf16 here: the fold's f32 accumulator
        # promotes each slice on read, so casting up front would only
        # double the map's HBM footprint
        xc2 = xc2.reshape(3, n_f, n_lags)
        xc = None
    else:
        # --- xc_correlate: one MXU matmul over all templates ---------------
        tmpl = templates.reshape(3 * n_f, PSS_TD_LEN)
        xc = correlate(capbuf, tmpl).reshape(3, n_f, -1)  # [3, n_f, n_lags]

        # --- xc_combine: k_factor-aware fold mod one half frame ------------
        xc2 = jnp.real(xc) ** 2 + jnp.imag(xc) ** 2      # [3, n_f, n_lags]
        # materialize xc2 once: without this barrier XLA fuses the matmul
        # into every fold-slice consumer and recomputes the correlation
        # ~n_comb times (measured 18x slowdown when xc is not an output)
        xc2 = jax.lax.optimization_barrier(xc2)
    return xc2, xc, pw_scale


def _back_stage(xc2, capbuf, start_idx, ds_comb_arm: int, lean: bool,
                pw_scale=None):
    """Fold + delay-spread + collapse + sp_est (+ lean refinement slab)
    off a materialized power map -- the per-carrier back stages of the
    front end.  Returns (xc_single, xc_inc, pow, frq, sp, sp_inc, slab)
    with the lean-mode Nones of _xcorr_core_impl.  pw_scale (int8
    path): multiplied onto the FOLDED map, restoring capture-unit
    powers ~30x cheaper than scaling the raw lag map."""
    rdt = jnp.real(capbuf).dtype
    n_comb_xc = start_idx.shape[1]

    def fold_one_f(xc2_f, starts):
        # xc2_f: [3, n_lags]; starts: [n_comb]
        def body(m, acc):
            return acc + jax.lax.dynamic_slice_in_dim(
                xc2_f, starts[m], HALF_FRAME_LEN, axis=1)
        acc = jnp.zeros((3, HALF_FRAME_LEN), rdt)
        return jax.lax.fori_loop(0, n_comb_xc, body, acc) / n_comb_xc

    xc_single = jax.vmap(fold_one_f, in_axes=(1, 0), out_axes=1)(xc2, start_idx)
    # xc_single: [3, n_f, 9600]
    if pw_scale is not None:
        xc_single = xc_single * pw_scale.astype(rdt)
    return _post_fold_stage(xc_single, capbuf, ds_comb_arm, lean)


def _post_fold_stage(xc_single, capbuf, ds_comb_arm: int, lean: bool):
    """Everything downstream of the k_factor fold: delay-spread
    combining, hypothesis collapse, sp_est, and the lean refinement
    slab.  Entered either from _back_stage (XLA fold off the v1/v2
    power map) or directly with a kernel-folded xc_single (the v4
    fused-fold Pallas kernel, ops/corr_pallas.corr_fold_core_v4)."""
    n_f = xc_single.shape[1]
    rdt = jnp.real(capbuf).dtype

    # --- xc_delay_spread: cyclic +-arm moving average ----------------------
    xc_inc = xc_single
    for t in range(1, ds_comb_arm + 1):
        xc_inc = xc_inc + jnp.roll(xc_single, t, axis=-1) \
                        + jnp.roll(xc_single, -t, axis=-1)
    xc_inc = xc_inc / (2 * ds_comb_arm + 1)

    # --- xc_peak_freq: collapse the frequency axis -------------------------
    pow_collapsed = jnp.max(xc_inc, axis=1)            # [3, 9600]
    frq_collapsed = jnp.argmax(xc_inc, axis=1)         # [3, 9600]

    # --- sp_est: 274-sample mean power, folded, shifted by 137 -------------
    n_cap = capbuf.shape[0]
    n_comb_sp = (n_cap - 136 - 137) // HALF_FRAME_LEN
    n_sp = n_comb_sp * HALF_FRAME_LEN
    p = jnp.real(capbuf) ** 2 + jnp.imag(capbuf) ** 2
    if lean:
        # fold-then-window: mean_m window_274(p)[k + m*9600] equals
        # window_274(sum_m p[m*9600:...])[k] / n_comb -- the same
        # sp_incoherent with a 9873-element scan instead of a
        # full-capture cumsum (the full sliding sp is a test-only
        # output the lean path never emits)
        q = jnp.zeros(HALF_FRAME_LEN + 273, rdt)
        for m in range(n_comb_sp):
            q = q + jax.lax.dynamic_slice_in_dim(
                p, m * HALF_FRAME_LEN, HALF_FRAME_LEN + 273)
        cq = jnp.concatenate([jnp.zeros(1, rdt), jnp.cumsum(q)])
        sp_incoherent = (cq[274: 274 + HALF_FRAME_LEN]
                         - cq[:HALF_FRAME_LEN]) / (274.0 * n_comb_sp)
        sp = None
    else:
        cs = jnp.concatenate([jnp.zeros(1, rdt), jnp.cumsum(p)])
        sp = (cs[274: 274 + n_sp] - cs[:n_sp]) / 274.0
        sp_incoherent = jnp.mean(sp.reshape(n_comb_sp, HALF_FRAME_LEN),
                                 axis=0)
    sp_incoherent = jnp.roll(sp_incoherent, 137)

    refine_slab = None
    if lean:
        # slab[t, d, l] = xc_single[t, frq[t, l], (l - arm + d) % 9600].
        # GATHER-FREE: take_along_axis lowers to a TPU gather, which
        # measured ~2 ms/carrier in the batched scan
        # (tools/bench_front_stages.py --carriers); a one-hot masked
        # reduction over the small hypothesis axis is the same exact
        # pick (argmax indices are unique) as fusable VPU work.
        oh = frq_collapsed[:, None, :] == jnp.arange(
            n_f, dtype=frq_collapsed.dtype)[None, :, None]
        slab_rows = []
        for d in range(2 * ds_comb_arm + 1):
            rolled = jnp.roll(xc_single, ds_comb_arm - d, axis=-1)
            slab_rows.append(jnp.sum(jnp.where(oh, rolled, 0), axis=1))
        refine_slab = jnp.stack(slab_rows, axis=1)      # [3, 2a+1, 9600]
    return (None if lean else xc_single, None if lean else xc_inc,
            pow_collapsed, frq_collapsed, None if lean else sp,
            sp_incoherent, refine_slab)


_xcorr_core = safe_jit(_xcorr_core_impl,
                       static_argnames=("ds_comb_arm", "keep_xc", "lean"))


@dataclass
class XcorrResult:
    xc_incoherent_single: np.ndarray   # [3, n_f, 9600] (None when lean)
    xc_incoherent: np.ndarray          # [3, n_f, 9600]
    xc_incoherent_collapsed_pow: np.ndarray  # [3, 9600]
    xc_incoherent_collapsed_frq: np.ndarray  # [3, 9600] (index into f_search_set)
    sp: np.ndarray
    sp_incoherent: np.ndarray          # [9600]
    n_comb_xc: int
    n_comb_sp: int
    refine_slab: np.ndarray = None     # [3, 2*arm+1, 9600] (lean only)


def use_pallas_corr(corr_backend: str = "auto") -> bool:
    """Resolve the correlation backend: the production Pallas v2 im2col
    kernel on TPU (int8 on ADC-grid captures, bf16 otherwise; ~2.8x the
    XLA dot under transfer-synced timing, docs/SCALING.md
    "Utilization"), the XLA dot everywhere else (the CPU/golden paths
    keep exact f64 semantics)."""
    if corr_backend == "pallas":
        return True
    if corr_backend == "auto":
        import jax as _jax
        return _jax.default_backend() == "tpu"
    return False


def _xcorr_peaks_impl(capbuf, templates, start_idx, ds_comb_arm: int,
                      z_scale, g_re=None, g_im=None):
    """Lean front end + chi-squared threshold + greedy peak search in
    ONE device program (models.peaks.peak_search_device_impl): only the
    padded peak records leave the device."""
    from .peaks import peak_search_device_impl

    (_s, _i, pow_c, frq_c, _sp, sp_inc, _xc, slab) = _xcorr_core_impl(
        capbuf, templates, start_idx, ds_comb_arm, False, True,
        g_re, g_im)
    recs, n = peak_search_device_impl(pow_c, frq_c, slab,
                                      sp_inc * z_scale, ds_comb_arm)
    # one output leaf (the tunnel charges a round trip per array)
    return jnp.concatenate([recs.ravel(),
                            n.astype(recs.dtype).reshape(1)])


_xcorr_peaks = safe_jit(_xcorr_peaks_impl, static_argnames=("ds_comb_arm",))


def _front_staging(capbuf, f_search_set, fc_requested: float,
                   fc_programmed: float, fs_programmed: float,
                   corr_backend: str, cap_dev, want_bands: bool):
    """Shared host staging of the single-carrier front end: resident
    capture, device templates, fold-start table, and (when requested)
    the production Pallas band set with the int8/bf16 routing.
    Returns (capbuf_d, templates, start_idx, bands, n_comb_xc)."""
    use_int8 = isinstance(capbuf, np.ndarray) and want_bands \
        and use_pallas_corr(corr_backend)
    if use_int8:
        from ..ops.corr_pallas import is_adc_grid
        use_int8 = is_adc_grid(capbuf)
    capbuf_d = cap_dev if cap_dev is not None else device_complex(capbuf)
    dtype = capbuf_d.dtype
    n_lags = capbuf_d.shape[0] - (PSS_TD_LEN - 1)
    n_comb_xc = (n_lags - 100) // HALF_FRAME_LEN

    tmpl_host = pss_templates(f_search_set, fc_requested, fc_programmed,
                              fs_programmed,
                              np.complex64 if dtype == np.complex64
                              else np.complex128)
    templates = device_complex(tmpl_host)
    start_idx = jnp.asarray(combine_start_indices(
        f_search_set, fc_requested, fc_programmed, fs_programmed,
        n_comb_xc))

    bands = ()
    if want_bands and use_pallas_corr(corr_backend):
        from ..ops.corr_pallas import prod_bands_for_templates
        tf = tmpl_host.astype(np.complex64).reshape(-1, PSS_TD_LEN)
        if use_int8:
            g, scale = prod_bands_for_templates(tf, int8=True)
            bands = (g, jnp.full((1,), scale, jnp.float32))
        else:
            bands = (prod_bands_for_templates(tf),)
    return capbuf_d, templates, start_idx, bands, n_comb_xc


def xcorr_pss_peaks(capbuf, f_search_set, ds_comb_arm: int,
                    fc_requested: float, fc_programmed: float,
                    fs_programmed: float, thresh1_n_nines: int,
                    corr_backend: str = "auto", cap_dev=None):
    """Single-carrier front end with the peak search fused on device
    (the accelerator production route of cell_search): returns
    (recs [cap, 4], n, n_comb_xc) -- feed to
    models.peaks.cells_from_peak_records.  Same staging/backend
    routing as xcorr_pss (shared _front_staging)."""
    capbuf_d, templates, start_idx, bands, n_comb_xc = _front_staging(
        capbuf, f_search_set, fc_requested, fc_programmed, fs_programmed,
        corr_backend, cap_dev, want_bands=True)
    # the chi-squared threshold scale: exactly compute_z_th1 with a
    # unit sp_incoherent (ONE definition of the detection constant)
    from .search import compute_z_th1
    z_scale = np.float64(compute_z_th1(
        np.float64(1.0), n_comb_xc, ds_comb_arm, thresh1_n_nines))
    vec = np.asarray(jax.device_get(_xcorr_peaks(
        capbuf_d, templates, start_idx, ds_comb_arm, z_scale, *bands)))
    recs = vec[:-1].reshape(-1, 4)
    return recs, int(round(float(vec[-1]))), n_comb_xc


def xcorr_pss(capbuf, f_search_set, ds_comb_arm: int, fc_requested: float,
              fc_programmed: float, fs_programmed: float,
              keep_xc: bool = False, lean: bool = False,
              corr_backend: str = "auto", cap_dev=None) -> XcorrResult:
    """Full xcorr_pss stage (reference searcher.cpp:389-419).

    lean=True (the production scan path) skips the test-only
    xc_incoherent/sp outputs entirely -- elided on device, never
    transferred.

    corr_backend: "auto" (Pallas kernel on TPU, XLA dot otherwise),
    "pallas", or "xla".

    cap_dev: an already device-resident copy of capbuf (from
    ops.boundary.device_complex) -- pass it when the caller keeps one
    resident capture for the whole detect+decode chain (cell_search
    does), so the 1.2 MB capture crosses the host->device link exactly
    once per carrier instead of once per stage."""
    # 8-bit-ADC-grid captures take the exact int8 dot (checked on host
    # BEFORE the device transfer; non-grid/simulated floats use bf16);
    # keep_xc (test-only) bypasses the Pallas bands
    capbuf, templates, start_idx, bands, n_comb_xc = _front_staging(
        capbuf, f_search_set, fc_requested, fc_programmed, fs_programmed,
        corr_backend, cap_dev, want_bands=not keep_xc)

    (xc_single, xc_inc, pow_c, frq_c, sp, sp_inc, xc, slab) = _xcorr_core(
        capbuf, templates, start_idx, ds_comb_arm, keep_xc, lean, *bands)

    # one batched device_get instead of one round-trip per array (the
    # remote tunnel charges ~20 ms latency per blocking transfer)
    xc_single, xc_inc, pow_c, frq_c, sp, sp_inc, xc, slab = jax.device_get(
        (xc_single, xc_inc, pow_c, frq_c, sp, sp_inc, xc, slab))
    n_comb_sp = (capbuf.shape[0] - 136 - 137) // HALF_FRAME_LEN
    res = XcorrResult(
        xc_incoherent_single=xc_single,
        xc_incoherent=xc_inc,
        xc_incoherent_collapsed_pow=pow_c,
        xc_incoherent_collapsed_frq=frq_c,
        sp=sp,
        sp_incoherent=sp_inc,
        n_comb_xc=n_comb_xc,
        n_comb_sp=n_comb_sp,
        refine_slab=slab,
    )
    if keep_xc:
        res.xc = xc  # type: ignore[attr-defined]
    return res
