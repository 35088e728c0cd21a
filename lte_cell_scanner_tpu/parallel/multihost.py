"""Multi-host (DCN-spanning) wide-band scans over ``jax.distributed``.

The reference scans a band serially on one machine
(/root/reference/src/CellSearch.cpp:469-471) and merges results with a
final dedup (:573, :285-319).  TPU-native multi-host design
(SURVEY.md section 2.4 "per-carrier outer loop", section 5 "distributed
communication backend"):

- Each host captures/loads ITS OWN slice of the band (carriers are the
  data-parallel axis; capture I/O is naturally host-local).
- All hosts enter ONE global SPMD front-end program over a 1-D "c" mesh
  spanning every device of every process (``jax.Array`` global sharding;
  XLA moves nothing over DCN here because the program has no
  cross-carrier collectives -- the mesh just proves out the global
  addressing and compile path).
- Each host runs the per-peak back half (peak search + batched
  SSS/FOE/decode, parallel/carriers.refine_band) for its local carriers
  on its local devices.
- Decoded cells gather to every process with one DCN all-gather
  (``multihost_utils.process_allgather``) as fixed-width float records;
  the final dedup (models/search.dedup semantics) then runs identically
  everywhere, so process 0 can print the reference's results table.

Tested end-to-end with 2 real processes over localhost DCN in
tests/test_multihost.py (each worker 4 virtual CPU devices -> a global
8-device mesh), verdict-parity-checked against the single-process
scan_band of the same captures.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..cell import Cell, CpType, PhichDuration, PhichResource
from ..models.search import SearchConfig, dedup
from .carriers import plan_carrier_inputs, refine_band, _front_one

_CP_CODE = {CpType.UNKNOWN: 0, CpType.NORMAL: 1, CpType.EXTENDED: 2}
_PD_CODE = {PhichDuration.UNKNOWN: 0, PhichDuration.NORMAL: 1,
            PhichDuration.EXTENDED: 2}
_PR_CODE = {PhichResource.UNKNOWN: 0, PhichResource.ONE_SIXTH: 1,
            PhichResource.HALF: 2, PhichResource.ONE: 3,
            PhichResource.TWO: 4}
_CP_FROM = {v: k for k, v in _CP_CODE.items()}
_PD_FROM = {v: k for k, v in _PD_CODE.items()}
_PR_FROM = {v: k for k, v in _PR_CODE.items()}

# field order of the flat float64 cell record (DCN wire format)
_FIELDS = ("fc_requested", "fc_programmed", "pss_pow", "ind", "freq",
           "n_id_2", "n_id_1", "frame_start", "freq_fine", "freq_superfine",
           "n_ports", "n_rb_dl", "sfn")
N_REC = len(_FIELDS) + 4  # + cp_type, phich_duration, phich_resource, valid


def initialize(coordinator_address: str, num_processes: int,
               process_id: int, **kwargs) -> None:
    """Join the multi-process JAX runtime (call before first backend use).

    The entry path the reference does not need (single machine + USB);
    here it is what lets a band scan span hosts.  Safe to call once per
    process; subsequent calls are no-ops."""
    import jax

    if jax.distributed.is_initialized():
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)


def cells_to_records(cells: Sequence[Cell], n_max: int) -> np.ndarray:
    """[n_max, N_REC] float64, zero-padded, valid flag last."""
    if len(cells) > n_max:
        raise ValueError(f"{len(cells)} cells exceed the {n_max}-record "
                         f"gather budget; raise max_cells_per_host")
    out = np.zeros((n_max, N_REC), dtype=np.float64)
    for i, c in enumerate(cells):
        out[i, :len(_FIELDS)] = [float(getattr(c, f)) for f in _FIELDS]
        out[i, len(_FIELDS) + 0] = _CP_CODE[c.cp_type]
        out[i, len(_FIELDS) + 1] = _PD_CODE[c.phich_duration]
        out[i, len(_FIELDS) + 2] = _PR_CODE[c.phich_resource]
        out[i, len(_FIELDS) + 3] = 1.0
    return out


def records_to_cells(rec: np.ndarray) -> List[Cell]:
    rec = np.asarray(rec).reshape(-1, N_REC)
    cells = []
    for row in rec:
        if row[len(_FIELDS) + 3] < 0.5:
            continue
        kw = {}
        for j, f in enumerate(_FIELDS):
            v = row[j]
            kw[f] = int(v) if f in ("ind", "n_id_2", "n_id_1", "n_ports",
                                    "n_rb_dl", "sfn") else float(v)
        kw["cp_type"] = _CP_FROM[int(row[len(_FIELDS) + 0])]
        kw["phich_duration"] = _PD_FROM[int(row[len(_FIELDS) + 1])]
        kw["phich_resource"] = _PR_FROM[int(row[len(_FIELDS) + 2])]
        cells.append(Cell(**kw))
    return cells


_front_cache = {}


def _front_global(mesh, cap_re, cap_im, tmpl_re, tmpl_im, starts,
                  ds_comb_arm: int, bands=()):
    """The carriers front end jitted with explicit P('c') out shardings,
    so each process's addressable output shards are exactly its own
    carriers' rows.

    Captures/templates arrive as FLOAT planes and are rebuilt as complex
    inside the jit: complex program parameters are what the axon TPU
    client cannot transfer afterwards (ops/boundary.py), and the outputs
    (slab/pow/frq/sp) are all-real, so the global program keeps an
    all-float boundary.  ``bands`` (optional per-carrier Pallas band
    matrices) route the correlation through the production TPU kernel,
    same as the single-process ``scan_band``."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    key = (mesh, ds_comb_arm, len(bands))
    if key not in _front_cache:
        shard = NamedSharding(mesh, P("c"))
        n_bands = len(bands)

        def impl(cr, ci, tr, ti, s, *gs):
            from .carriers import _vmap_front

            # shard_map so the back stages' lax.map runs over each
            # device's LOCAL carriers (a map over the global sharded
            # axis would serialize across the mesh); shared bands
            # replicate
            def local_fn(cr, ci, tr, ti, s, *gs):
                c = jax.lax.complex(cr, ci)
                t = jax.lax.complex(tr, ti)
                return _vmap_front(c, t, s, ds_comb_arm, tuple(gs))

            return jax.shard_map(
                local_fn, mesh=mesh,
                in_specs=(P("c"),) * 5 + (P(),) * n_bands,
                out_specs=(P("c"),) * 4,
                check_vma=False)(cr, ci, tr, ti, s, *gs)

        _front_cache[key] = jax.jit(impl, out_shardings=(shard,) * 4)
    return _front_cache[key](cap_re, cap_im, tmpl_re, tmpl_im, starts,
                             *bands)


def _local_rows(garr) -> np.ndarray:
    """Concatenate this process's addressable shards in global row order."""
    shards = sorted(garr.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def _scan_chunk(chunk, chunk_real: int, mesh, n_local_dev: int,
                f_search_set, fs_programmed: float, cfg: SearchConfig,
                dtype) -> List[List[Cell]]:
    """One bounded-size chunk of the multihost band scan: global-mesh
    front end over every process's chunk, local refinement of this
    process's real carriers."""
    import jax
    from .carriers import use_pallas_corr
    from jax.sharding import NamedSharding, PartitionSpec as P

    capbufs = [np.asarray(c[0]) for c in chunk]
    fc_list = [c[1] for c in chunk]
    fcp_list = [c[2] for c in chunk]
    cap, tmpl, starts, n_comb_xc, _ = plan_carrier_inputs(
        capbufs, fc_list, f_search_set, fcp_list, fs_programmed,
        n_local_dev, dtype)

    # Pallas band matrices (the TPU production correlation backend),
    # same routing as the single-process scan_band: ONE shared band
    # set for every carrier, replicated over the global mesh.  NOTE:
    # every process derives bands from its OWN middle carrier; the
    # ~4e-5-per-10-MHz relative template spread is far below the bf16
    # quantization (and the v4 delta tables can differ by at most one
    # sample near rounding edges -- each device only ever uses its own
    # process's replica on its own process's carriers, so no collective
    # reads them cross-host).  The FORMAT choices (int8 vs bf16, v4
    # fused-fold vs v2+XLA-fold) change the global program's STRUCTURE
    # (arg shapes/dtypes), so they must be identical on every process:
    # all-gather each process's local verdicts and take the global AND
    # -- divergent program structures in one collective step would be
    # undefined behavior for multi-controller JAX.
    bands = ()
    if use_pallas_corr(cfg.corr_backend):
        from jax.experimental import multihost_utils
        from ..ops.corr_pallas import is_adc_grid
        from .carriers import _plan_scan_bands, v4_band_kv
        local_grid = all(is_adc_grid(c) for c in capbufs)
        # margin=1 so processes gating on slightly different mid-carrier
        # tables cannot disagree near the window edge (the verdict is
        # additionally all-gathered and combined below: any process's 0
        # -> global v2 fallback; otherwise the WIDEST locally required
        # kv row window, so every process compiles identical band
        # shapes -- a kv valid for one delta table is valid for any
        # smaller one)
        local_kv = v4_band_kv(starts, margin=1)
        flags = multihost_utils.process_allgather(np.array(
            [1 if local_grid else 0, local_kv], np.int32))
        flags = np.asarray(flags).reshape(-1, 2)
        kv_glob = 0 if np.any(flags[:, 1] == 0) \
            else int(np.max(flags[:, 1]))
        bands = tuple(np.asarray(g) for g in _plan_scan_bands(
            tmpl, starts, capbufs, cfg,
            force_int8=bool(np.all(flags[:, 0])),
            force_v4=kv_glob if kv_glob else False))

    shard = NamedSharding(mesh, P("c"))

    def mk(x):
        return jax.make_array_from_process_local_data(
            shard, np.ascontiguousarray(x))

    fdt = np.float32 if dtype == np.complex64 else np.float64
    rep = NamedSharding(mesh, P())
    g_bands = tuple(jax.make_array_from_process_local_data(
        rep, np.ascontiguousarray(g)) for g in bands)
    slabs, pow_c, frq_c, sp_inc = _front_global(
        mesh, mk(cap.real.astype(fdt)), mk(cap.imag.astype(fdt)),
        mk(tmpl.real.astype(fdt)), mk(tmpl.imag.astype(fdt)),
        mk(starts), cfg.ds_comb_arm, g_bands)

    # local slices (this process's real carriers only; padding rows at
    # the tail are dropped by slicing to chunk_real)
    return refine_band(
        _local_rows(pow_c)[:chunk_real], _local_rows(frq_c)[:chunk_real],
        _local_rows(sp_inc)[:chunk_real], _local_rows(slabs)[:chunk_real],
        capbufs[:chunk_real], fc_list[:chunk_real], fcp_list[:chunk_real],
        f_search_set, fs_programmed, n_comb_xc, cfg)


def scan_band_multihost(
        local_captures: Sequence[Tuple[np.ndarray, float, float]],
        f_search_set: np.ndarray, fs_programmed: float,
        config: Optional[SearchConfig] = None, dtype=np.complex64,
        max_cells_per_host: int = 128,
        max_carriers_per_program: int = 64,
) -> Tuple[List[List[Cell]], List[Cell]]:
    """Scan a band whose carriers are distributed across processes.

    local_captures: THIS process's (capbuf, fc_requested, fc_programmed)
    slice of the band.  Uneven slices are fine: counts are all-gathered
    and every process pads ITS OWN list to the global maximum by
    repeating its last capture (array-level padding, dropped before
    refinement -- the caller never has to duplicate RF dwell time).
    Every process must contribute at least one carrier.

    Wide slices are processed in chunks of ``max_carriers_per_program``
    carriers per local device (same bounded-HBM rationale as
    ``scan_band``); chunk boundaries are identical on every process, so
    each chunk is one global SPMD program.

    Returns (per-local-carrier decoded cell lists, globally deduped cell
    list).  The dedup result is identical on every process; print it from
    ``jax.process_index() == 0`` (the reference's results table,
    CellSearch.cpp:576-614).
    """
    import jax
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh

    cfg = config or SearchConfig()
    n_local_dev = jax.local_device_count()
    mesh = Mesh(np.asarray(jax.devices()), ("c",))

    if not local_captures:
        raise ValueError(
            "every process must contribute at least one local carrier "
            "(run a band narrower than the process count with fewer "
            "processes)")

    c_real = len(local_captures)
    counts = multihost_utils.process_allgather(
        np.array([c_real], np.int64))
    n_eq = int(np.max(counts))
    padded = list(local_captures) \
        + [local_captures[-1]] * (n_eq - c_real)

    limit = max(1, max_carriers_per_program) * n_local_dev
    results_local: List[List[Cell]] = []
    for i0 in range(0, n_eq, limit):
        chunk = padded[i0: i0 + limit]
        chunk_real = max(0, min(c_real - i0, len(chunk)))
        results_local.extend(_scan_chunk(
            chunk, chunk_real, mesh, n_local_dev, f_search_set,
            fs_programmed, cfg, dtype))

    # one DCN all-gather of fixed-width records, then everyone dedups
    # identically (host 0 prints -- reference CellSearch.cpp:573-614)
    flat = [c for cells in results_local for c in cells]
    rec = cells_to_records(flat, max_cells_per_host)
    # gather the float64 records as int32 words: without jax_enable_x64
    # the gather itself would silently downcast f64 -> f32 (losing e.g.
    # the 100 kHz carrier raster's low digits); int32 rides DCN exactly
    words = multihost_utils.process_allgather(
        np.ascontiguousarray(rec).view(np.int32))
    all_rec = np.ascontiguousarray(words).view(np.float64)
    merged = dedup([records_to_cells(all_rec)])
    return results_local, merged
