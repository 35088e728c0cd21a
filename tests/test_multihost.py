"""Exercised multi-host path: 2 real processes over localhost DCN.

Spawns two workers (tools/multihost_worker.py), each with 4 virtual CPU
devices, joined via jax.distributed into a global 8-device "c" mesh.
Each worker owns 2 of 4 carriers of a synthetic band (two carriers carry
sim cells, two are pure noise), runs scan_band_multihost, and both
all-gather + dedup the decoded cells.  The parent verifies:

- both processes produce IDENTICAL merged cell lists (the DCN gather +
  dedup is deterministic),
- the merged list matches a single-process parallel.carriers.scan_band
  of the same four captures (the multi-host path changes the topology,
  not the math),
- each embedded cell is found on the process that owns its carrier.

Reference analog: the whole-band outer loop + dedup
(/root/reference/src/CellSearch.cpp:469-471, :573).
"""

import importlib.util
import json
import os
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
WORKER = REPO / "tools" / "multihost_worker.py"

spec = importlib.util.spec_from_file_location("multihost_worker", WORKER)
worker_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(worker_mod)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mh")
    port = _free_port()
    procs = []
    outs = []
    for pid in range(2):
        out = tmp / f"out_{pid}.json"
        outs.append(out)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env.pop("JAX_NUM_PROCESSES", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(WORKER),
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--out", str(out)],
            env=env, cwd=str(REPO),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, \
            f"worker {pid} failed (rc={p.returncode}):\n{log[-4000:]}"
    return [json.loads(o.read_text()) for o in outs]


def test_two_process_band_scan_matches_single_process(worker_results):
    r0, r1 = sorted(worker_results, key=lambda r: r["process"])
    assert r0["n_processes"] == 2 and r0["n_devices_global"] == 8

    # both processes computed the identical global merge
    assert r0["merged"] == r1["merged"]

    # each embedded cell decoded on the process owning its carrier
    # (carriers 0,1 -> process 0; carriers 2,3 -> process 1)
    assert r0["local_counts"][0] >= 1            # carrier 0: cell 277
    assert r1["local_counts"][1] >= 1            # carrier 3: cell 503
    ids0 = {c["n_id_cell"] for l in r0["local"] for c in l}
    ids1 = {c["n_id_cell"] for l in r1["local"] for c in l}
    assert 3 * 92 + 1 in ids0
    assert 3 * 167 + 2 in ids1

    # decoded MIB fields crossed the DCN gather (the reference's
    # results table deliverable, CellSearch.cpp:576-614): the sim
    # eNodeBs transmit 2-port PBCH encoding n_rb_dl=6
    for g in r0["merged"]:
        assert g["n_ports"] == 2
        assert g["n_rb_dl"] == 6
        assert 0 <= g["sfn"] < 1024
        assert g["phich_duration"] == "normal"

    # single-process reference: same captures through scan_band on the
    # test session's own 8 virtual devices
    from lte_cell_scanner_tpu.constants import FS_LTE
    from lte_cell_scanner_tpu.models.search import SearchConfig, dedup
    from lte_cell_scanner_tpu.parallel.carriers import scan_band

    captures = [worker_mod.make_capture(i)
                for i in range(worker_mod.N_CARRIERS)]
    ref_lists = scan_band(captures, np.asarray(worker_mod.F_SEARCH),
                          FS_LTE / 16, SearchConfig())
    ref = sorted(dedup(ref_lists), key=lambda c: c.fc_requested)

    got = r0["merged"]
    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        assert g["n_id_cell"] == r.n_id_cell()
        assert g["cp"] == r.cp_type.value
        assert g["fc"] == r.fc_requested
        assert abs(g["frame_start"] - r.frame_start) < 1e-3
        assert abs(g["freq_fine"] - r.freq_fine) < 1.0
        assert abs(g["pss_pow"] - r.pss_pow) < 1e-6 * abs(r.pss_pow) + 1e-12
        assert (g["n_ports"], g["n_rb_dl"], g["sfn"]) == \
            (r.n_ports, r.n_rb_dl, r.sfn)


def test_unequal_band_split_matches(worker_results):
    """An unequal per-process carrier split (3+1) produces the same
    global merge as the equal 2+2 split: scan_band_multihost pads
    internally (array-level, no caller-side duplicate captures)."""
    r0, r1 = sorted(worker_results, key=lambda r: r["process"])
    assert r0["merged_unequal"] == r1["merged_unequal"]
    assert r0["merged_unequal"] == r0["merged"]


def test_pallas_int8_bands_over_dcn(worker_results):
    """Grid-quantized captures through the production Pallas path
    (int8 (g, scale) band tuple, replicated over the global mesh,
    shard_map + lax.map back stages) detect the same cells across
    two real DCN processes."""
    r0, r1 = sorted(worker_results, key=lambda r: r["process"])
    assert r0["merged_pallas_ids"] == r1["merged_pallas_ids"]
    assert 3 * 92 + 1 in r0["merged_pallas_ids"]
    assert 3 * 167 + 2 in r0["merged_pallas_ids"]


def test_record_round_trip():
    """Cell <-> flat-record serialization is lossless for every field."""
    from lte_cell_scanner_tpu.cell import (Cell, CpType, PhichDuration,
                                           PhichResource)
    from lte_cell_scanner_tpu.parallel.multihost import (cells_to_records,
                                                         records_to_cells)

    c = Cell(fc_requested=739e6, fc_programmed=739.1e6, pss_pow=0.137,
             ind=8675, freq=40e3, n_id_2=1, n_id_1=92,
             cp_type=CpType.NORMAL, frame_start=17449.525,
             freq_fine=39967.89, freq_superfine=39970.1, n_ports=2,
             n_rb_dl=50, phich_duration=PhichDuration.NORMAL,
             phich_resource=PhichResource.ONE, sfn=649)
    partial = Cell(fc_requested=1e9, fc_programmed=1e9, pss_pow=0.5,
                   ind=3, freq=-5e3, n_id_2=2)
    rec = cells_to_records([c, partial], 4)
    back = records_to_cells(rec)
    assert len(back) == 2
    assert back[0] == c
    b = back[1]
    assert (b.n_id_1, b.n_rb_dl, b.sfn) == (-1, -1, -1)
    assert np.isnan(b.frame_start) and np.isnan(b.freq_superfine)
    assert b.cp_type is CpType.UNKNOWN

    with pytest.raises(ValueError):
        cells_to_records([c, c, c], 2)
