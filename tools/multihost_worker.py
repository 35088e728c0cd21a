"""Worker process for the 2-process multi-host band-scan test.

Each worker joins the jax.distributed runtime (localhost DCN), owns 2 of
the 4 carriers of a synthetic band, and runs
parallel.multihost.scan_band_multihost end-to-end: global 8-device
(2 processes x 4 virtual CPU devices) "c" mesh front end, local back
half, record all-gather, global dedup.  Results go to a JSON file for
the parent test to verify against a single-process scan_band of the
same captures (tests/test_multihost.py).

Usage (spawned by the test, one per process):
  python tools/multihost_worker.py --coordinator 127.0.0.1:PORT \
      --num-processes 2 --process-id I --out OUT.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_CARRIERS = 4
CARRIERS_PER_PROC = 2
FC0 = 739e6
N_SUBFRAMES = 80          # 80 ms captures (>= one full 40 ms PBCH
                          # period at any frame phase -> MIB decodes)
F_SEARCH = [-5e3, 0.0, 5e3]
# carrier -> (n_id_1, n_id_2) of an embedded sim cell (None = pure noise)
CELL_OF = {0: (92, 1), 3: (167, 2)}


def make_capture(carrier: int):
    """Deterministic per-carrier capture: sim eNodeB + AWGN or noise."""
    import numpy as np
    from lte_cell_scanner_tpu.cell import CpType
    from lte_cell_scanner_tpu.sim import awgn, create_dl_sig

    rng = np.random.default_rng(1000 + carrier)
    n_samp = N_SUBFRAMES * 1920
    if carrier in CELL_OF:
        n_id_1, n_id_2 = CELL_OF[carrier]
        sig = create_dl_sig(CpType.NORMAL, N_SUBFRAMES, 0, n_id_1, n_id_2,
                            0.5, rng=rng, n_ports=2, sfn=100)
        sig = awgn(sig, 5.0, rng=rng)
    else:
        sig = (rng.normal(size=n_samp) + 1j * rng.normal(size=n_samp)) \
            .astype(np.complex128) * np.sqrt(0.5)
    fc = FC0 + 100e3 * carrier
    return sig, fc, fc


def cell_summary(c):
    return {"n_id_cell": c.n_id_cell(), "n_id_2": c.n_id_2,
            "cp": c.cp_type.value,
            "fc": c.fc_requested,
            "frame_start": round(float(c.frame_start), 6),
            "freq_fine": round(float(c.freq_fine), 3),
            "pss_pow": float(c.pss_pow),
            # decoded MIB fields -- these must cross the DCN gather
            # (the reference's results table, CellSearch.cpp:576-614)
            "n_ports": c.n_ports, "n_rb_dl": c.n_rb_dl, "sfn": c.sfn,
            "phich_duration": c.phich_duration.value,
            "phich_resource": c.phich_resource.value}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from lte_cell_scanner_tpu.parallel import multihost

    multihost.initialize(args.coordinator, args.num_processes,
                         args.process_id)
    assert jax.process_count() == args.num_processes
    assert jax.device_count() == args.num_processes * 4, \
        f"expected a global 8-device mesh, got {jax.device_count()}"

    import numpy as np
    from lte_cell_scanner_tpu.constants import FS_LTE
    from lte_cell_scanner_tpu.models.search import SearchConfig

    my = range(args.process_id * CARRIERS_PER_PROC,
               (args.process_id + 1) * CARRIERS_PER_PROC)
    captures = [make_capture(i) for i in my]

    # full decode: n_ports/n_rb_dl/sfn must actually cross the gather
    cfg = SearchConfig()
    local_lists, merged = multihost.scan_band_multihost(
        captures, np.asarray(F_SEARCH), FS_LTE / 16, cfg)

    # second pass, UNEQUAL split of the same band (proc 0: carriers
    # 0..2, proc 1: carrier 3): exercises scan_band_multihost's
    # internal auto-padding (no caller-side capture duplication)
    if args.process_id == 0:
        uneq = [make_capture(i) for i in range(3)]
    else:
        uneq = [make_capture(3)]
    _, merged_uneq = multihost.scan_band_multihost(
        uneq, np.asarray(F_SEARCH), FS_LTE / 16, cfg)

    # third pass: the production Pallas band plumbing over real DCN --
    # grid-quantized captures (the dongle's 8-bit delivery) select the
    # int8 (g, scale) replicated band tuple through the global
    # shard_map (interpret mode on CPU); detection-only for speed
    def to_grid(x):
        k = np.clip(np.round(x.real * 128), -127, 127) \
            + 1j * np.clip(np.round(x.imag * 128), -127, 127)
        return (k / 128.0).astype(np.complex64)

    gcaps = [(to_grid(c), fc, fcp) for c, fc, fcp in captures]
    from lte_cell_scanner_tpu.models.search import SearchConfig as SC
    _, merged_pallas = multihost.scan_band_multihost(
        gcaps, np.asarray(F_SEARCH), FS_LTE / 16,
        SC(decode=False, corr_backend="pallas"))

    out = {
        "process": args.process_id,
        "n_processes": jax.process_count(),
        "n_devices_global": jax.device_count(),
        "local_counts": [len(l) for l in local_lists],
        "local": [[cell_summary(c) for c in l] for l in local_lists],
        "merged": [cell_summary(c) for c in
                   sorted(merged, key=lambda c: c.fc_requested)],
        "merged_unequal": [cell_summary(c) for c in
                           sorted(merged_uneq,
                                  key=lambda c: c.fc_requested)],
        "merged_pallas_ids": sorted(c.n_id_cell() for c in merged_pallas),
    }
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"worker {args.process_id}: "
          f"{sum(out['local_counts'])} local cells, "
          f"{len(out['merged'])} merged")


if __name__ == "__main__":
    main()
