"""Carrier-axis sharding: wide-band scans data-parallel over the mesh.

The reference scans each 100 kHz carrier serially in the CellSearch main
loop (/root/reference/src/CellSearch.cpp:469-471) -- an embarrassingly
parallel outer loop (SURVEY.md section 2.4 "Per-carrier outer loop").
TPU-native design: carriers become a leading batch axis sharded over a
1-D "c" device mesh; the whole front end (template correlation, k_factor
fold, delay-spread combining, hypothesis collapse, signal-power estimate)
runs as ONE jitted SPMD program with zero collectives -- each device owns
a contiguous slab of carriers, and only the tiny collapsed peak maps
([3, 9600] per carrier) come back to the host for the greedy peak search
and the per-peak decode.

Multi-host story: on a multi-host platform the same program spans all
hosts' devices (jax.Array global sharding over DCN); each host feeds the
captures for its local carriers and the final `dedup` of decoded cell
lists happens on host 0.  Composes with the time/hypothesis sharding in
parallel/sharded.py: use that layout when ONE carrier must go faster than
a single chip; use this one to scan a band N carriers at a time.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cell import Cell
from ..constants import HALF_FRAME_LEN, PSS_TD_LEN
from ..models.decode import decode_back_half_batch_multi
from ..models.search import (SearchConfig, _decode_back_half, compute_z_th1,
                             refine_peaks)
from ..models.peaks import peak_search
from ..models.xcorr import (_xcorr_core, combine_start_indices,
                            pss_templates, use_pallas_corr)
from ..ops.boundary import needs_float_boundary, safe_jit
from ..utils.debug import debug_export


def make_carrier_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("c",))


def _front_one(capbuf, templates, start_idx, ds_comb_arm: int,
               g_re=None, g_im=None):
    """One carrier's front end; only the host-needed outputs survive.

    Lean mode: instead of the full [3, n_f, 9600] pre-delay-spread fold,
    emit the [3, 2*arm+1, 9600] refinement slab -- exactly the values
    peak_search's single-lag refinement reads, gathered on device at the
    collapsed argmax frequency.  ~n_f/(2*arm+1) less output per carrier
    and a measurably cheaper program (the wide-band scan rate metric,
    tools/bench_carriers.py).

    g_re (single array): the shared v2 band matrix routing the
    correlation through the production Pallas kernel (one band set
    serves the whole batch -- see _vmap_front)."""
    _s, _i, pow_c, frq_c, _sp, sp_inc, _xc, slab = _xcorr_core(
        capbuf, templates, start_idx, ds_comb_arm, False, True,
        g_re, g_im)
    return slab, pow_c, frq_c, sp_inc


def _vmap_front(capbufs, templates, start_idx, ds_comb_arm, bands):
    """bands: () for the XLA backend, (g,) for the production bf16 v2
    Pallas kernel, (g_int8, scale) for the ADC-exact int8 v2 path, a
    float (g_re, g_im) pair for the banded v1 kernel, or a v4
    fused-fold band set (g with n_comb*512 rows, optionally + scale):
    the correlation AND the k_factor fold run inside one Pallas kernel
    (ops/corr_pallas.corr_fold_core_v4) whose per-period delta offsets
    were baked into g from the band's mid carrier -- per-carrier fold
    starts then deviate by at most 1 sample for edge carriers of a
    10 MHz band (below the +-2-sample delay-spread combining arm;
    pinned by tests/test_carriers.py), in exchange for which the
    ~30 MB/carrier power map, its fold, and their HBM round trip
    disappear.

    Bands are SHARED across the carrier batch (in_axes=None): adjacent
    carriers' templates differ only through k_factor = 1 - f_off/fc,
    i.e. by ~4e-5 relative phase across a 10 MHz band (measured; ~4e-7
    per 100 kHz) -- two orders below the bf16 band quantization -- while the
    fold START indices (where k_factor acts over the whole 80 ms
    capture, ~15 samples) remain exactly per-carrier.  Sharing cuts the
    dominant HBM stream of the batched scan ~C-fold (measured: the
    per-carrier bands were ~24 MB/carrier vs 1.2 MB of capture).

    On the production Pallas path only the CORRELATION is vmapped over
    carriers; the back stages (fold/delay-spread/collapse/slab/sp) run
    under lax.map: per-carrier fold starts under vmap batch the fold's
    dynamic slices into TPU gathers, measured ~1 ms/carrier
    (tools/bench_front_stages.py --carriers), while lax.map keeps them
    plain dynamic slices -- each carrier's back stages are large enough
    that the sequential map stays device-busy."""
    if bands and bands[0].ndim == 2 and bands[0].shape[0] > 512 \
            and (len(bands) == 1 or bands[0].dtype == jnp.int8):
        # v4 fused-fold kernel: xc_incoherent_single comes straight out
        # of the kernel; only the cheap post-fold stages remain, and
        # with the fold's dynamic slices gone they vmap cleanly
        from ..models.xcorr import _post_fold_stage
        from ..ops.corr_pallas import corr_fold_core_v4, plan_pallas_v4

        g = bands[0]
        pw_scale = bands[1] if len(bands) == 2 else None
        n_f = templates.shape[2]
        t_count = 3 * n_f
        n_comb = start_idx.shape[2]
        prec = "int8" if g.dtype == jnp.int8 else \
            "bf16" if g.dtype == jnp.bfloat16 else "f32"
        interp = jax.default_backend() != "tpu"
        t_pad, n_tc = plan_pallas_v4(t_count)
        raw = corr_fold_core_v4(
            jnp.real(capbufs), jnp.imag(capbufs), g, n_comb, t_count,
            t_pad, n_tc, interpret=interp, precision=prec)
        scale = jnp.float32(1.0 / n_comb)
        if pw_scale is not None:
            scale = scale * pw_scale.reshape(()).astype(jnp.float32)
        xc_single = raw.reshape(-1, 3, n_f, HALF_FRAME_LEN) * scale

        def post_one(xs, cap):
            (_s, _i, pow_c, frq_c, _sp, sp_inc, slab) = _post_fold_stage(
                xs, cap, ds_comb_arm, True)
            return slab, pow_c, frq_c, sp_inc

        return jax.vmap(post_one)(xc_single, capbufs)
    if len(bands) == 1 or (len(bands) == 2
                           and bands[0].dtype == jnp.int8):
        from ..models.xcorr import _back_stage, _corr_stage

        pw_scale = bands[1] if len(bands) == 2 else None
        xc2 = jax.vmap(
            lambda c, t: _corr_stage(c, t, False, *bands)[0])(
                capbufs, templates)

        def back_one(args):
            xc2_c, cap_c, starts_c = args
            (_s, _i, pow_c, frq_c, _sp, sp_inc, slab) = _back_stage(
                xc2_c, cap_c, starts_c, ds_comb_arm, True, pw_scale)
            return slab, pow_c, frq_c, sp_inc

        return jax.lax.map(back_one, (xc2, capbufs, start_idx))
    in_axes = (0, 0, 0) + (None,) * len(bands)
    return jax.vmap(
        lambda c, t, s, *g: _front_one(c, t, s, ds_comb_arm, *g),
        in_axes=in_axes)(capbufs, templates, start_idx, *bands)


@partial(jax.jit, static_argnames=("mesh", "ds_comb_arm"))
def _front_jit(mesh: Mesh, capbufs, templates, start_idx,
               ds_comb_arm: int, *bands):
    # shard_map (not sharding constraints): _vmap_front's back stages
    # run under lax.map, and a lax.map over a GLOBALLY sharded carrier
    # axis would serialize across devices -- inside shard_map each
    # device maps over its LOCAL carriers only; shared bands replicate
    def local_fn(c, t, s, *g):
        return _vmap_front(c, t, s, ds_comb_arm, tuple(g))

    f = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P("c"), P("c"), P("c")) + (P(),) * len(bands),
        out_specs=(P("c"),) * 4,
        check_vma=False)
    return f(capbufs, templates, start_idx, *bands)


def _front_batch_impl(capbufs, templates, start_idx, ds_comb_arm: int,
                      g_re=None, g_im=None):
    # g_re alone = the production v2 single-band format: it must reach
    # _vmap_front as a 1-tuple so the lax.map back-stage branch engages
    # (a (g, None) pair would silently fall back to the vmapped path
    # and its fold gathers)
    if g_re is None:
        bands = ()
    elif g_im is None:
        bands = (g_re,)
    else:
        bands = (g_re, g_im)
    return _vmap_front(capbufs, templates, start_idx, ds_comb_arm, bands)


# single-device batched front end behind the complex<->float host
# boundary (ops/boundary.py) -- the multi-carrier-per-chip scan path on
# the axon TPU client, where complex program parameters block transfers
_front_batch = safe_jit(_front_batch_impl, static_argnames=("ds_comb_arm",))


def _front_peaks_batch_impl(capbufs, templates, start_idx,
                            ds_comb_arm: int, z_scale, g_re=None,
                            g_im=None):
    """Front end + chi-squared threshold + the greedy peak search ON
    DEVICE (models.peaks.peak_search_device_impl vmapped over
    carriers): only the padded peak records and sp_incoherent leave the
    device (~KB/carrier) instead of the collapsed maps + refinement
    slabs (~0.8 MB/carrier).  z_scale is the host-computed chi2 factor
    so Z_th1 = sp_incoherent * z_scale."""
    import jax

    from ..models.peaks import peak_search_device_impl

    bands = () if g_re is None else ((g_re,) if g_im is None
                                     else (g_re, g_im))
    slabs, pow_c, frq_c, sp_inc = _vmap_front(
        capbufs, templates, start_idx, ds_comb_arm, bands)
    z = sp_inc * z_scale
    recs, ns = jax.vmap(
        lambda p, f, s, zz: peak_search_device_impl(p, f, s, zz,
                                                    ds_comb_arm))(
        pow_c, frq_c, slabs, z)
    # one output leaf (the tunnel charges a round trip per array)
    import jax.numpy as jnp
    c = recs.shape[0]
    return jnp.concatenate(
        [recs.reshape(c, -1), ns.astype(recs.dtype)[:, None]], axis=1)


_front_peaks_batch = safe_jit(_front_peaks_batch_impl,
                              static_argnames=("ds_comb_arm",))


def _front_sharded(mesh: Mesh, capbufs, templates, start_idx,
                   ds_comb_arm: int, bands=()):
    """Shard the host->device transfer itself (each device receives only
    its carrier slab, not the whole band staged on device 0)."""
    if mesh.devices.size == 1 and needs_float_boundary():
        from ..ops.boundary import ComplexPair
        if not isinstance(capbufs, ComplexPair):
            capbufs = np.asarray(capbufs)
        return _front_batch(capbufs, np.asarray(templates),
                            np.asarray(start_idx), ds_comb_arm, *bands)
    shard = NamedSharding(mesh, P("c"))
    capbufs = jax.device_put(capbufs, shard)
    templates = jax.device_put(templates, shard)
    start_idx = jax.device_put(start_idx, shard)
    bands = tuple(jax.device_put(g, NamedSharding(mesh, P()))
                  for g in bands)
    return _front_jit(mesh, capbufs, templates, start_idx, ds_comb_arm,
                      *bands)


def plan_carrier_inputs(capbufs: Sequence[np.ndarray],
                        fc_list: Sequence[float],
                        f_search_set: np.ndarray,
                        fc_programmed_list: Sequence[float],
                        fs_programmed: float, n_devices: int,
                        dtype=np.complex64):
    """Stack per-carrier captures + template/fold plans, padded so the
    carrier count divides the mesh.

    Templates and fold start indices differ per carrier because k_factor
    depends on fc (searcher.cpp:145-151, 296-298).  Returns
    (capbufs [C, n_cap], templates [C, 3, n_f, 137],
     start_idx [C, n_f, n_comb], n_comb_xc, c_real).
    """
    c_real = len(capbufs)
    n_cap = len(capbufs[0])
    if any(len(c) != n_cap for c in capbufs):
        raise ValueError("all captures must have equal length")
    n_lags = n_cap - (PSS_TD_LEN - 1)
    n_comb_xc = (n_lags - 100) // HALF_FRAME_LEN

    c_pad = -c_real % n_devices
    cap = np.zeros((c_real + c_pad, n_cap), dtype=dtype)
    tmpl = np.zeros((c_real + c_pad, 3, len(f_search_set), PSS_TD_LEN),
                    dtype=dtype)
    starts = np.zeros((c_real + c_pad, len(f_search_set), n_comb_xc),
                      dtype=np.int32)
    for i in range(c_real + c_pad):
        j = min(i, c_real - 1)
        cap[i] = np.asarray(capbufs[j], dtype=dtype)
        tmpl[i] = pss_templates(f_search_set, fc_list[j],
                                fc_programmed_list[j], fs_programmed, dtype)
        starts[i] = combine_start_indices(
            f_search_set, fc_list[j], fc_programmed_list[j], fs_programmed,
            n_comb_xc)
    return cap, tmpl, starts, n_comb_xc, c_real


def v4_band_kv(starts, margin: int = 0) -> int:
    """v4 gate for a whole band chunk, not just its mid carrier:
    returns the kernel row-window width to use (256 default / 384 wide
    for long captures) or 0 for the v2 fallback.

    The fused-fold kernel bakes the MID carrier's fold-start deltas
    into G, so two conditions must hold: (a) the mid table fits a
    representable delta window (``v4_kv_for``), and (b) every
    carrier's exact fold starts stay within 1 sample of the mid
    table -- edge carriers drift by ~9600*m*df/fc samples per period,
    so a chunk spanning tens of MHz can push late periods beyond the
    +-ds_comb_arm=2 combining arm and silently degrade edge-carrier
    sensitivity.  When either fails the scan falls back to v2 + the
    exact per-carrier XLA fold."""
    starts = np.asarray(starts)
    from ..ops.corr_pallas import v4_kv_for
    smid = starts[starts.shape[0] // 2]
    kv = v4_kv_for(smid, margin=margin)
    if kv is None:
        return 0
    dev = np.max(np.abs(starts.astype(np.int64)
                        - smid[None].astype(np.int64)))
    return kv if int(dev) <= 1 else 0


def v4_band_applicable(starts, margin: int = 0) -> bool:
    return v4_band_kv(starts, margin) != 0


def _plan_scan_bands(tmpl, starts, capbufs, cfg,
                     force_int8=None, force_v4=None):
    """The shared Pallas band set for a batched band scan.

    ONE band matrix serves the whole batch (the TPU production
    correlation backend): carrier-to-carrier template differences are
    ~4e-5 relative per 10 MHz (see _vmap_front), far below the bf16
    band quantization, so the middle carrier's templates serve every
    carrier.  Preferred format is the v4 FUSED-FOLD band set (delta
    offsets from the mid carrier's fold-start table baked per period --
    correlation + k_factor fold in one kernel) whenever the grid's
    deviations fit the kernel's window (v4_applicable; the default
    80 ms / +-100 ppm grid does); v2 single-band (+ the XLA fold off
    exact per-carrier starts) is the fallback for wide-ppm or
    long-capture or very-wide-band grids (v4_band_applicable also
    bounds the chunk's per-carrier start deviation from the baked mid
    table to 1 sample).  int8 when every capture sits on the 8-bit ADC
    grid, bf16 otherwise.  force_int8/force_v4 override the data-
    derived choices (force_v4 may also be a kv row-window width --
    256/384 -- instead of a bool) -- the multihost scan passes globally
    all-gathered verdicts so every process compiles the same program
    structure."""
    if not use_pallas_corr(getattr(cfg, "corr_backend", "auto")):
        return ()
    from ..ops.corr_pallas import (bands_v4_for_templates, is_adc_grid,
                                   prod_bands_for_templates)
    mid = tmpl.shape[0] // 2
    tmid = tmpl[mid].astype(np.complex64)
    smid = np.asarray(starts[mid])
    use_int8 = all(is_adc_grid(c) for c in capbufs) \
        if force_int8 is None else force_int8
    if force_v4 is None:
        kv = v4_band_kv(starts)
    elif force_v4 is True:
        # FORCED v4 (bench A/Bs): gate only on the mid table's window
        # and raise loudly when even the wide window cannot represent
        # it -- silently measuring the v2 fallback would invalidate
        # the comparison
        from ..ops.corr_pallas import v4_kv_for
        kv = v4_kv_for(smid)
        if kv is None:
            raise ValueError("force_v4: fold deviations exceed even "
                             "the wide v4 window")
    elif force_v4 is False:
        kv = 0
    else:
        kv = int(force_v4)
    if kv:
        tf = tmid.reshape(-1, PSS_TD_LEN)
        if use_int8:
            g, scale = bands_v4_for_templates(tf, smid, precision="int8",
                                              kv=kv)
            return (g, jnp.full((1,), scale, jnp.float32))
        return (bands_v4_for_templates(tf, smid, precision="bf16",
                                       kv=kv),)
    if use_int8:
        g, scale = prod_bands_for_templates(tmid, int8=True)
        return (g, jnp.full((1,), scale, jnp.float32))
    return (prod_bands_for_templates(tmid),)


def scan_band(captures: Sequence[Tuple[np.ndarray, float, float]],
              f_search_set: np.ndarray, fs_programmed: float,
              config: Optional[SearchConfig] = None,
              mesh: Optional[Mesh] = None,
              dtype=np.complex64,
              max_carriers_per_program: int = 64,
              device_peaks: Optional[bool] = None) -> List[List[Cell]]:
    """Scan many carriers at once, carriers sharded across the mesh.

    device_peaks: run the chi-squared threshold AND the greedy peak
    search on device (models.peaks.peak_search_device_impl) so only
    ~KB of peak records download per carrier instead of the collapsed
    maps + refinement slabs (~0.8 MB/carrier).  None = auto: on for
    single-device accelerator scans when no debug dump is active (the
    dump needs the full maps on host); the host path remains the
    golden route and the two are pinned identical on the shipped
    golden vector (tests/test_peak_search.py).

    captures: sequence of (capbuf, fc_requested, fc_programmed).
    Returns one decoded-cell list per carrier (feed to models.search.dedup).
    The device front end runs for ALL carriers in one SPMD program; the
    tiny per-carrier peak search + per-peak decode stay on host
    (reference CellSearch.cpp:497-570 semantics per carrier).

    Very wide bands are processed in chunks of
    ``max_carriers_per_program`` carriers PER DEVICE.  The bound is
    set by the v2 FALLBACK kernel's ~30 MB/carrier lag-map
    intermediate (an unbounded batch would exceed HBM near ~250
    carriers/chip); the default v4 fused-fold route never materializes
    the map and measures throughput still climbing at 128
    carriers/dispatch (docs/SCALING.md knee table), so HBM-rich
    deployments can raise the default 64 toward 128 for the last
    ~10%.  Chunking keeps one compiled program shape and bounded
    memory; results concatenate in carrier order.
    """
    cfg = config or SearchConfig()
    mesh = mesh or make_carrier_mesh()
    n_dev = mesh.devices.size

    limit = max(1, max_carriers_per_program) * n_dev
    if len(captures) > limit:
        out: List[List[Cell]] = []
        for i in range(0, len(captures), limit):
            out.extend(scan_band(captures[i: i + limit], f_search_set,
                                 fs_programmed, cfg, mesh, dtype,
                                 max_carriers_per_program, device_peaks))
        return out

    capbufs = [c[0] for c in captures]
    fc_list = [c[1] for c in captures]
    fcp_list = [c[2] for c in captures]
    cap, tmpl, starts, n_comb_xc, c_real = plan_carrier_inputs(
        capbufs, fc_list, f_search_set, fcp_list, fs_programmed, n_dev,
        dtype)

    bands = _plan_scan_bands(tmpl, starts, capbufs, cfg)

    # single-device boundary deployments (the axon chip): upload the
    # padded capture stack ONCE and reuse the device-resident planes
    # across the front end, the fused SSS+FOE dispatch, AND the fused
    # decode -- through a remote tunnel the stack re-uploads (~77 MB at
    # batch 64) were the full-chain band scan's dominant cost
    cap_dev = None
    if mesh.devices.size == 1 and needs_float_boundary():
        # ADC-grid captures additionally cross as lossless uint8 codes
        # (4x fewer bytes than float planes on the dominant transfer)
        from ..ops.boundary import device_complex_adc
        cap_dev = device_complex_adc(cap)

    if device_peaks is None:
        from ..utils.debug import get_dump
        import jax as _jax
        device_peaks = (mesh.devices.size == 1
                        and _jax.default_backend() != "cpu"
                        and get_dump() is None)

    if device_peaks:
        from ..models.peaks import cells_from_peak_records
        # the chi-squared threshold scale: exactly compute_z_th1 with
        # a unit sp_incoherent (ONE definition of the constant)
        z_scale = np.float64(compute_z_th1(
            np.float64(1.0), n_comb_xc, cfg.ds_comb_arm,
            cfg.thresh1_n_nines))
        from ..models.peaks import PEAK_CAP
        vec = np.asarray(_front_peaks_batch(
            cap if cap_dev is None else cap_dev, tmpl, starts,
            cfg.ds_comb_arm, z_scale, *bands))
        recs = vec[:, :-1].reshape(vec.shape[0], -1, 4)
        ns = np.rint(vec[:, -1]).astype(np.int64)
        if int(ns[:c_real].max(initial=0)) < PEAK_CAP:
            all_peaks: List[Cell] = []
            carrier_of: List[int] = []
            for i in range(c_real):
                cells_i = cells_from_peak_records(
                    recs[i], int(ns[i]), f_search_set, fc_list[i],
                    fcp_list[i])
                all_peaks.extend(cells_i)
                carrier_of.extend([i] * len(cells_i))
            return _refine_from_peaks(all_peaks, carrier_of, capbufs,
                                      fc_list, fcp_list, fs_programmed,
                                      cfg, cap_dev)
        # a carrier SATURATED the record buffer: fall through to the
        # unbounded host peak search for this chunk (rare; correctness
        # over the transfer saving)

    slabs, pow_c, frq_c, sp_inc = _front_sharded(
        mesh, cap if cap_dev is None else cap_dev, tmpl, starts,
        cfg.ds_comb_arm, bands)
    return refine_band(pow_c, frq_c, sp_inc, slabs, capbufs, fc_list,
                       fcp_list, f_search_set, fs_programmed, n_comb_xc,
                       cfg, cap_dev=cap_dev)


def refine_band(pow_c, frq_c, sp_inc, slabs, capbufs, fc_list, fcp_list,
                f_search_set, fs_programmed: float, n_comb_xc: int,
                cfg: SearchConfig, cap_dev=None) -> List[List[Cell]]:
    """Host back half of a band scan: per-carrier peak search, then the
    batched SSS/FOE/decode stages over all peaks of all carriers.

    pow_c/frq_c/sp_inc are [C, ...] host-or-device arrays; the
    [C, 3, 2*arm+1, 9600] refinement slabs may stay device-resident
    (sharded) -- pulled one carrier at a time.  Shared by scan_band
    (single-process mesh) and parallel.multihost.scan_band_multihost
    (each host refines its local carriers).

    cap_dev: an already device-resident (possibly padded) capture
    stack; when given the SSS/FOE and decode dispatches reuse it
    instead of re-uploading the stack per stage (per-peak carrier
    indices are < c_real, so padding rows are never gathered)."""
    c_real = len(capbufs)
    if c_real == 0:
        # a pure-padding multihost chunk: this process had no real
        # carriers in it (it still ran the global front end above)
        return []
    pow_c = np.asarray(pow_c)
    frq_c = np.asarray(frq_c)
    sp_inc = np.asarray(sp_inc)

    all_peaks: List[Cell] = []
    carrier_of: List[int] = []
    for i in range(c_real):
        Z_th1 = compute_z_th1(sp_inc[i], n_comb_xc, cfg.ds_comb_arm,
                              cfg.thresh1_n_nines)
        slab_i = np.asarray(slabs[i])
        peaks = peak_search(pow_c[i], frq_c[i], Z_th1, f_search_set,
                            fc_list[i], fcp_list[i], None,
                            cfg.ds_comb_arm, refine_slab=slab_i)
        debug_export("xc_incoherent_collapsed_pow", pow_c[i])
        debug_export("xc_incoherent_collapsed_frq", frq_c[i])
        debug_export("sp_incoherent", sp_inc[i])
        debug_export("Z_th1", Z_th1)
        if peaks:
            debug_export("peak_ind", np.array([p.ind for p in peaks]))
            debug_export("peak_n_id_2", np.array([p.n_id_2 for p in peaks]))
        all_peaks.extend(peaks)
        carrier_of.extend([i] * len(peaks))

    return _refine_from_peaks(all_peaks, carrier_of, capbufs, fc_list,
                              fcp_list, fs_programmed, cfg, cap_dev)


def _refine_from_peaks(all_peaks: List[Cell], carrier_of: List[int],
                       capbufs, fc_list, fcp_list, fs_programmed: float,
                       cfg: SearchConfig, cap_dev=None) -> List[List[Cell]]:
    """Batched SSS/FOE/decode back half over an already-extracted peak
    list (shared by the host and device peak-search routes)."""
    c_real = len(capbufs)
    if not all_peaks:
        return [[] for _ in range(c_real)]
    if not cfg.batch_peaks:
        results: List[List[Cell]] = [[] for _ in range(c_real)]
        for i in range(c_real):
            peaks_i = [p for p, c in zip(all_peaks, carrier_of) if c == i]
            results[i] = refine_peaks(peaks_i, np.asarray(capbufs[i]),
                                      fc_list[i], fcp_list[i], fs_programmed,
                                      cfg)
        return results

    # Batched back half across the WHOLE band: the SSS + fine-FOE
    # stages of every carrier's peaks run as ONE fused vmapped program
    # (sss_detect.sss_foe_batch_fused), with the per-peak carrier index
    # selecting rows of the full-precision capture stack -- O(1) device
    # programs for the band instead of O(carriers).
    cap_full = cap_dev if cap_dev is not None \
        else np.stack([np.asarray(c) for c in capbufs])
    from ..models.sss_detect import sss_foe_batch_fused
    cells = sss_foe_batch_fused(all_peaks, None, cfg.thresh2_n_sigma,
                                fs_programmed, compat=cfg.compat,
                                skip_ids=cfg.skip_ids,
                                capbuf_stack=cap_full,
                                carrier_idx=carrier_of)
    kept = [(c, ci) for c, ci in zip(cells, carrier_of)
            if c.n_id_1 >= 0 and c.n_id_cell() not in cfg.skip_ids]
    cells = [c for c, _ in kept]
    results = [[] for _ in range(c_real)]
    if cfg.decode and cfg.interp == "hex" and cells:
        # fused whole-chain decode, one vmapped program per CP type for
        # the entire band (models/decode.py)
        decoded = decode_back_half_batch_multi(
            cells, cap_full, [ci for _, ci in kept], fs_programmed)
        for cell, (_, ci) in zip(decoded, kept):
            if cell.n_rb_dl >= 0:
                results[ci].append(cell)
        return results
    for cell, (_, ci) in zip(cells, kept):
        if cfg.decode:
            cell = _decode_back_half(cell, np.asarray(capbufs[ci]),
                                     fc_list[ci], fcp_list[ci],
                                     fs_programmed, cfg)
        if cell is not None:
            results[ci].append(cell)
    return results
