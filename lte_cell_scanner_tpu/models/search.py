"""Top-level cell search: the full per-carrier pipeline and deduplication.

Behavioral contract: the CellSearch main loop
(/root/reference/src/CellSearch.cpp:437-618): xcorr_pss -> chi-squared
threshold -> peak_search -> per peak {sss_detect -> pss_sss_foe ->
extract_tfg -> tfoec -> decode_mib} -> dedup.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from ..cell import Cell, CpType
from ..constants import (DS_COMB_ARM, FS_LTE, THRESH1_N_NINES,
                         THRESH2_N_SIGMA)
from ..ops.dsp import chi2cdf_inv, matlab_range
from ..utils.debug import debug_export, stage
from .decode import decode_back_half_batch, decode_back_half_fused
from .mib import decode_mib
from .peaks import peak_search
from .rs import RsDl
from .sss_detect import pss_sss_foe, sss_detect
from .tfg import extract_tfg, tfoec
from .xcorr import xcorr_pss


def compute_z_th1(sp_incoherent: np.ndarray, n_comb_xc: int,
                  ds_comb_arm: int = DS_COMB_ARM,
                  thresh1_n_nines: int = THRESH1_N_NINES) -> np.ndarray:
    """Per-lag PSS detection threshold from the chi-squared false-alarm
    design point (reference CellSearch.cpp:500-503)."""
    R_th1 = chi2cdf_inv(1 - 10.0 ** (-thresh1_n_nines),
                        2 * n_comb_xc * (2 * ds_comb_arm + 1))
    rx_cutoff = (6 * 12 * 15e3 / 2 + 4 * 15e3) / (FS_LTE / 16 / 2)
    return (R_th1 * sp_incoherent / rx_cutoff / 137 / 2 / n_comb_xc
            / (2 * ds_comb_arm + 1))


def default_f_search_set(freq_start: float, ppm: float = 120.0) -> np.ndarray:
    """5 kHz frequency-offset raster covering +-ppm crystal error
    (reference CellSearch.cpp:463-464)."""
    n_extra = int(np.floor((freq_start * ppm / 1e6 + 2.5e3) / 5e3))
    return matlab_range(-n_extra * 5000.0, 5000.0, n_extra * 5000.0)


@dataclass
class SearchConfig:
    ds_comb_arm: int = DS_COMB_ARM
    thresh1_n_nines: int = THRESH1_N_NINES
    thresh2_n_sigma: float = THRESH2_N_SIGMA
    compat: str = "production"   # or "golden" (see models/sss_detect.py)
    interp: str = "hex"
    decode: bool = True          # run the tfg/tfoec/MIB back half
    # cell IDs to drop right after SSS detection, before the expensive
    # FOE/tfg/tfoec/MIB stages -- the reference searcher thread's
    # already-tracked check sits exactly there
    # (searcher_thread.cpp:157-177)
    skip_ids: frozenset = frozenset()
    # batch the SSS/FOE stages of all peaks into one vmapped device
    # program per stage (False = the reference's peak-at-a-time order;
    # same math, kept for A/B and per-peak debugging)
    batch_peaks: bool = True
    # correlation backend: "auto" = the production Pallas v2 im2col
    # kernel on TPU (int8 on ADC-grid captures, bf16 otherwise --
    # docs/SCALING.md "Utilization"), the XLA im2col dot elsewhere;
    # "pallas"/"xla" force either
    corr_backend: str = "auto"


def refine_peaks(peaks: List[Cell], capbuf: np.ndarray, fc_requested: float,
                 fc_programmed: float, fs_programmed: float,
                 cfg: SearchConfig, cap_dev=None) -> List[Cell]:
    """Per-peak back half of the pipeline: SSS detection, fine FOE, OFDM
    demod, superfine TOE/FOE, channel estimation, and blind MIB decode
    (reference CellSearch.cpp:514-570).

    The SSS-detection and fine-FOE stages of all peaks run as ONE
    fused vmapped device program (sss_detect.sss_foe_batch_fused) --
    peaks are independent, and per-peak (and per-stage) dispatch
    round-trips dominate these tiny stages on an accelerator.

    cap_dev: device-resident capture to reuse (cell_search passes the
    one it already uploaded for the front end -- the capture crosses
    the link once per carrier, not once per stage)."""
    if cfg.batch_peaks:
        from ..ops.boundary import device_complex
        from .sss_detect import sss_foe_batch_fused
        if cap_dev is None:
            cap_dev = device_complex(capbuf)  # split+transfer ONCE
        # SSS detection + fine FOE fused into ONE device dispatch (the
        # staged pair cost two blocking round trips; host still makes
        # the authoritative float64 accept decision -- sss_detect.py)
        with stage("sss_foe_fused"):
            cells = sss_foe_batch_fused(peaks, cap_dev,
                                        cfg.thresh2_n_sigma,
                                        fs_programmed, compat=cfg.compat,
                                        skip_ids=cfg.skip_ids)
        cells = [c for c in cells
                 if c.n_id_1 >= 0 and c.n_id_cell() not in cfg.skip_ids]
        if not cfg.decode:
            return cells
        if cfg.interp == "hex" and cells:
            # whole-chain fused decode, one vmapped program per CP type
            # (models/decode.py) -- with the fused SSS+FOE dispatch
            # above, the complete back half is TWO device programs
            # regardless of the peak count
            with stage("decode_fused"):
                decoded = decode_back_half_batch(
                    cells, cap_dev, fc_requested, fc_programmed,
                    fs_programmed)
            return [c for c in decoded if c.n_rb_dl >= 0]
        return [c2 for c in cells
                if (c2 := _decode_back_half(c, capbuf, fc_requested,
                                            fc_programmed, fs_programmed,
                                            cfg)) is not None]

    detected: List[Cell] = []
    for cell in peaks:
        with stage("sss_detect"):
            cell = sss_detect(cell, capbuf, cfg.thresh2_n_sigma,
                              fc_requested, fc_programmed, fs_programmed,
                              compat=cfg.compat)
        if cell.n_id_1 < 0:
            continue
        if cell.n_id_cell() in cfg.skip_ids:
            continue
        with stage("pss_sss_foe"):
            cell = pss_sss_foe(cell, capbuf, fc_requested, fc_programmed,
                               fs_programmed, compat=cfg.compat)
        if not cfg.decode:
            detected.append(cell)
            continue
        cell = _decode_back_half(cell, capbuf, fc_requested, fc_programmed,
                                 fs_programmed, cfg)
        if cell is not None:
            detected.append(cell)
    return detected


def _decode_back_half(cell: Cell, capbuf: np.ndarray, fc_requested: float,
                      fc_programmed: float, fs_programmed: float,
                      cfg: SearchConfig) -> Optional[Cell]:
    """OFDM demod -> superfine FOE/TOE -> channel est -> blind MIB decode
    for one SSS-accepted peak; None when the MIB never decodes
    (reference CellSearch.cpp:542-570).

    The hex-interpolator path (the reference default) runs the whole
    chain as one fused device program; the alternative interpolators go
    through the staged flow."""
    if cfg.interp == "hex":
        with stage("decode_fused"):
            cell = decode_back_half_fused(cell, capbuf, fc_requested,
                                          fc_programmed, fs_programmed)
        return cell if cell.n_rb_dl >= 0 else None
    with stage("extract_tfg"):
        tfg, tfg_timestamp = extract_tfg(cell, capbuf, fc_requested,
                                         fc_programmed, fs_programmed)

    rs_dl = RsDl(cell.n_id_cell(), 6, cell.cp_type)
    with stage("tfoec"):
        cell, tfg_comp, _ = tfoec(cell, tfg, tfg_timestamp,
                                  fc_requested, fc_programmed, rs_dl)
    with stage("decode_mib"):
        cell = decode_mib(cell, tfg_comp, rs_dl, interp=cfg.interp)
    if cell.n_rb_dl < 0:
        return None
    return cell


def cell_search(capbuf, f_search_set, fc_requested: float,
                fc_programmed: float, fs_programmed: float,
                config: Optional[SearchConfig] = None,
                mesh=None) -> List[Cell]:
    """Search one carrier: detect, refine, and (optionally) decode cells.

    With a (t x f) device mesh the front end runs sharded
    (cell_search_sharded); mesh=None runs single-device."""
    if mesh is not None:
        return cell_search_sharded(capbuf, f_search_set, fc_requested,
                                   fc_programmed, fs_programmed, mesh,
                                   config)
    cfg = config or SearchConfig()
    capbuf = np.asarray(capbuf)
    # ONE device-resident capture for the whole chain: front end + the
    # three back-half programs reuse it (on the tunnel the 1.2 MB
    # upload is a measurable share of the per-carrier wall clock)
    from ..ops.boundary import device_complex_adc
    cap_dev = device_complex_adc(capbuf)

    # accelerator route: threshold + greedy peak search fused into the
    # front-end program (models.xcorr.xcorr_pss_peaks) -- only ~KB of
    # peak records download instead of the collapsed maps + refinement
    # slab.  Host route stays the golden path (and the debug-dump
    # path, which needs the full maps).
    import jax as _jax
    from ..utils.debug import get_dump
    if _jax.default_backend() != "cpu" and get_dump() is None:
        from .peaks import PEAK_CAP, cells_from_peak_records
        from .xcorr import xcorr_pss_peaks
        with stage("xcorr_pss"):
            recs, n, _nc = xcorr_pss_peaks(
                capbuf, f_search_set, cfg.ds_comb_arm, fc_requested,
                fc_programmed, fs_programmed, cfg.thresh1_n_nines,
                corr_backend=cfg.corr_backend, cap_dev=cap_dev)
        if n < PEAK_CAP:
            peaks = cells_from_peak_records(recs, n, f_search_set,
                                            fc_requested, fc_programmed)
            return refine_peaks(peaks, capbuf, fc_requested,
                                fc_programmed, fs_programmed, cfg,
                                cap_dev=cap_dev)
        # SATURATED record buffer (>= PEAK_CAP extractions): the host
        # route is unbounded -- fall through to it rather than silently
        # truncating a dense capture's peak list

    with stage("xcorr_pss"):
        res = xcorr_pss(capbuf, f_search_set, cfg.ds_comb_arm, fc_requested,
                        fc_programmed, fs_programmed, lean=True,
                        corr_backend=cfg.corr_backend, cap_dev=cap_dev)
    Z_th1 = compute_z_th1(res.sp_incoherent, res.n_comb_xc, cfg.ds_comb_arm,
                          cfg.thresh1_n_nines)
    with stage("peak_search"):
        peaks = peak_search(res.xc_incoherent_collapsed_pow,
                            res.xc_incoherent_collapsed_frq,
                            Z_th1, f_search_set, fc_requested,
                            fc_programmed, res.xc_incoherent_single,
                            cfg.ds_comb_arm, refine_slab=res.refine_slab)
    # intermediate-array tracing for offline diffing (the reference's
    # ITPP_DEBUG_EXPORT convention, macros.h:55-72); no-op unless a dump
    # is active
    debug_export("xc_incoherent_collapsed_pow",
                 res.xc_incoherent_collapsed_pow)
    debug_export("xc_incoherent_collapsed_frq",
                 res.xc_incoherent_collapsed_frq)
    debug_export("sp_incoherent", res.sp_incoherent)
    debug_export("Z_th1", Z_th1)
    if peaks:
        debug_export("peak_ind", np.array([p.ind for p in peaks]))
        debug_export("peak_n_id_2", np.array([p.n_id_2 for p in peaks]))
    return refine_peaks(peaks, capbuf, fc_requested, fc_programmed,
                        fs_programmed, cfg, cap_dev=cap_dev)


def cell_search_sharded(capbuf, f_search_set, fc_requested: float,
                        fc_programmed: float, fs_programmed: float,
                        mesh, config: Optional[SearchConfig] = None
                        ) -> List[Cell]:
    """cell_search with the front end sharded over a (t x f) device mesh:
    time blocks exchange overlap-save halos over ICI, hypothesis shards
    collapse with pmax, and the sp/Z_th1/refinement-slab aux outputs ride
    the same program (parallel/sharded.py).  The per-peak back half runs
    on the default device exactly as in cell_search.

    This is the streaming tracker's multi-chip searcher path
    (BASELINE.json config 5) as well as a single-carrier accelerator for
    very wide hypothesis grids."""
    from ..parallel.sharded import (plan_sharded_bands,
                                    plan_sharded_inputs, sharded_xcorr)
    from .xcorr import use_pallas_corr

    cfg = config or SearchConfig()
    capbuf = np.asarray(capbuf)
    n_comb_sp = (len(capbuf) - 136 - 137) // 9600
    padded, tmpl, starts, n_comb_xc, n_lags = plan_sharded_inputs(
        capbuf, np.asarray(f_search_set, dtype=np.float64), fc_requested,
        fc_programmed, fs_programmed, mesh, dtype=capbuf.dtype)
    # route each shard's local correlation through the production
    # Pallas kernel on TPU (same backend switch as the unsharded and
    # carrier-batched layouts)
    bands = plan_sharded_bands(tmpl, mesh.shape["f"]) \
        if use_pallas_corr(cfg.corr_backend) else ()
    pow_g, frq_g, sp_inc, single = sharded_xcorr(
        mesh, padded, tmpl, starts, cfg.ds_comb_arm, n_comb_xc, n_lags,
        n_comb_sp, *bands)
    sp_inc = np.asarray(sp_inc)
    Z_th1 = compute_z_th1(sp_inc, n_comb_xc, cfg.ds_comb_arm,
                          cfg.thresh1_n_nines)
    pow_g = np.asarray(pow_g)
    frq_g = np.asarray(frq_g)
    peaks = peak_search(pow_g, frq_g, Z_th1,
                        f_search_set, fc_requested, fc_programmed,
                        np.asarray(single), cfg.ds_comb_arm)
    debug_export("xc_incoherent_collapsed_pow", pow_g)
    debug_export("xc_incoherent_collapsed_frq", frq_g)
    debug_export("sp_incoherent", sp_inc)
    debug_export("Z_th1", Z_th1)
    if peaks:
        debug_export("peak_ind", np.array([p.ind for p in peaks]))
        debug_export("peak_n_id_2", np.array([p.n_id_2 for p in peaks]))
    return refine_peaks(peaks, capbuf, fc_requested, fc_programmed,
                        fs_programmed, cfg)


def _true_freq(c: Cell) -> float:
    """Best available carrier-frequency estimate: superfine when the
    decode back half ran, else fine, else the coarse hypothesis (cells
    from decode=False runs have NaN freq_superfine, and a NaN here would
    disable dedup's 1 MHz match entirely)."""
    for v in (c.freq_superfine, c.freq_fine, c.freq):
        if np.isfinite(v):
            return c.fc_requested + v
    return c.fc_requested


def dedup(cell_lists: List[List[Cell]]) -> List[Cell]:
    """Merge per-carrier results: same cell ID within 1 MHz keeps the
    strongest detection (reference CellSearch.cpp:285-319)."""
    final: List[Cell] = []
    for cells in cell_lists:
        for c in cells:
            matched = False
            for i, f in enumerate(final):
                if (c.n_id_cell() == f.n_id_cell()
                        and abs(_true_freq(c) - _true_freq(f)) < 1e6):
                    matched = True
                    if c.pss_pow > f.pss_pow:
                        final[i] = c
                    break
            if not matched:
                final.append(c)
    return final
