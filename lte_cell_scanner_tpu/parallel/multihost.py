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


def _front_global(mesh, cap, tmpl, starts, ds_comb_arm: int):
    """The carriers front end jitted with explicit P('c') out shardings,
    so each process's addressable output shards are exactly its own
    carriers' rows."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    key = (mesh, ds_comb_arm)
    if key not in _front_cache:
        shard = NamedSharding(mesh, P("c"))

        def impl(c, t, s):
            return jax.vmap(_front_one, in_axes=(0, 0, 0, None))(
                c, t, s, ds_comb_arm)

        _front_cache[key] = jax.jit(impl, out_shardings=(shard,) * 4)
    return _front_cache[key](cap, tmpl, starts)


def _local_rows(garr) -> np.ndarray:
    """Concatenate this process's addressable shards in global row order."""
    shards = sorted(garr.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def scan_band_multihost(
        local_captures: Sequence[Tuple[np.ndarray, float, float]],
        f_search_set: np.ndarray, fs_programmed: float,
        config: Optional[SearchConfig] = None, dtype=np.complex64,
        max_cells_per_host: int = 128,
) -> Tuple[List[List[Cell]], List[Cell]]:
    """Scan a band whose carriers are distributed across processes.

    local_captures: THIS process's (capbuf, fc_requested, fc_programmed)
    slice of the band -- every process must contribute the same number of
    carriers (pad by repeating the last one if the band does not divide).

    Returns (per-local-carrier decoded cell lists, globally deduped cell
    list).  The dedup result is identical on every process; print it from
    ``jax.process_index() == 0`` (the reference's results table,
    CellSearch.cpp:576-614).
    """
    import jax
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg = config or SearchConfig()
    n_local_dev = jax.local_device_count()
    mesh = Mesh(np.asarray(jax.devices()), ("c",))

    capbufs = [c[0] for c in local_captures]
    fc_list = [c[1] for c in local_captures]
    fcp_list = [c[2] for c in local_captures]
    cap, tmpl, starts, n_comb_xc, c_real = plan_carrier_inputs(
        capbufs, fc_list, f_search_set, fcp_list, fs_programmed,
        n_local_dev, dtype)

    counts = multihost_utils.process_allgather(
        np.array([cap.shape[0]], np.int64))
    if not np.all(counts == cap.shape[0]):
        raise ValueError(
            f"unequal padded carrier counts across processes: "
            f"{counts.ravel().tolist()} -- every process must contribute "
            f"the same number of local carriers")

    shard = NamedSharding(mesh, P("c"))
    g_cap = jax.make_array_from_process_local_data(shard, cap)
    g_tmpl = jax.make_array_from_process_local_data(shard, tmpl)
    g_starts = jax.make_array_from_process_local_data(shard, starts)

    slabs, pow_c, frq_c, sp_inc = _front_global(
        mesh, g_cap, g_tmpl, g_starts, cfg.ds_comb_arm)

    # local slices (this process's carriers only; padding rows dropped by
    # refine_band's c_real = len(capbufs))
    results_local = refine_band(
        _local_rows(pow_c), _local_rows(frq_c), _local_rows(sp_inc),
        _local_rows(slabs), capbufs, fc_list, fcp_list, f_search_set,
        fs_programmed, n_comb_xc, cfg)

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
