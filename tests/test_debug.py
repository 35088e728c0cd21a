"""Tracing/diagnostics subsystem (reference macros.h machinery)."""

import numpy as np

from lte_cell_scanner_tpu.utils import read_itfile
from lte_cell_scanner_tpu.utils.debug import (DebugDump, Timer, poison,
                                              set_dump)


def test_debug_dump_roundtrip(tmp_path):
    p = str(tmp_path / "dbg.it")
    d = DebugDump(p)
    d.export("xc", np.arange(5, dtype=np.float64))
    d.export("xc", np.arange(3, dtype=np.float64) + 1)   # repeat -> _1
    d.export("cplx", np.array([1 + 2j, 3 - 4j]))
    d.export("mat", np.arange(6, dtype=np.float64).reshape(2, 3))
    back = read_itfile(p)
    assert np.array_equal(back["xc"], np.arange(5.0))
    assert np.array_equal(back["xc_1"], np.arange(3.0) + 1)
    assert np.array_equal(back["cplx"], [1 + 2j, 3 - 4j])
    assert np.array_equal(back["mat"], np.arange(6.0).reshape(2, 3))


def test_pipeline_exports_intermediates(tmp_path):
    """An active dump captures the search pipeline's key intermediates
    (the reference's ITPP_DEBUG_EXPORT usage for MATLAB diffing)."""
    from lte_cell_scanner_tpu.constants import FS_LTE
    from lte_cell_scanner_tpu.models.search import SearchConfig, cell_search

    p = str(tmp_path / "trace.it")
    set_dump(DebugDump(p))
    try:
        rng = np.random.default_rng(0)
        noise = (rng.normal(size=40000) + 1j * rng.normal(size=40000)) * 0.1
        cell_search(noise, np.array([0.0]), 739e6, 739e6, FS_LTE / 16,
                    SearchConfig(decode=False))
    finally:
        set_dump(None)
    back = read_itfile(p)
    assert back["xc_incoherent_collapsed_pow"].shape == (3, 9600)
    assert back["Z_th1"].shape == (9600,)
    assert back["sp_incoherent"].shape == (9600,)


def test_no_dump_is_noop():
    from lte_cell_scanner_tpu.utils.debug import debug_export
    set_dump(None)
    debug_export("anything", np.zeros(3))   # must not raise or create files


def test_timer_and_poison(monkeypatch):
    with Timer() as t:
        sum(range(1000))
    assert t.elapsed > 0
    assert not np.isnan(poison((3,))).any()          # release mode: zeros
    monkeypatch.setenv("LTE_DEBUG", "1")
    assert np.isnan(poison((3,))).all()
    assert poison((2,), np.int32).dtype == np.int32  # ints can't poison
