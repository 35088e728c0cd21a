"""End-to-end cell search on the shipped 739 MHz air capture.

The ground truth (SURVEY.md section 4/6, reference src/CMakeLists.txt:34-35,
doc/CellSearch.html): test/capbuf_0000.it contains TWO cells -- 277
(n_id_1=92, n_id_2=1, the strongest) and 271 -- both normal CP, 50 RB,
2 antenna ports, foff around -2 kHz ... +40 kHz relative to the raster.
"""

import numpy as np
import pytest

from lte_cell_scanner_tpu.constants import FS_LTE
from lte_cell_scanner_tpu.models.search import (SearchConfig, cell_search,
                                                dedup)

FS = FS_LTE / 16


@pytest.mark.parametrize("compat", ["golden", "production"])
def test_capbuf_0000_two_cells(capbuf_0000, compat):
    capbuf, fc = capbuf_0000
    # The doc scan found these cells at about +40 kHz offset; use the
    # vector-matched raster (test_peak_search.it: 20e3:5e3:60e3).
    f_search_set = np.arange(20e3, 60e3 + 1, 5e3)
    cells = cell_search(capbuf, f_search_set, fc, fc, FS,
                        SearchConfig(compat=compat))
    cells = dedup([cells])

    ids = sorted(c.n_id_cell() for c in cells)
    assert 277 in ids, f"cell 277 missing; got {ids}"
    assert 271 in ids, f"cell 271 missing; got {ids}"

    for c in cells:
        if c.n_id_cell() in (277, 271):
            assert c.n_rb_dl == 50, str(c)
            assert c.n_ports == 2, str(c)
            assert c.cp_type.value == "normal", str(c)


def test_batched_refine_matches_serial(capbuf_0000):
    """The vmapped peak-batch back half (sss_detect_batch /
    pss_sss_foe_batch) must reproduce the reference's peak-at-a-time
    order: identical decisions, float-identical frame timing, and
    freq estimates equal to reduction-order rounding."""
    capbuf, fc = capbuf_0000
    f_search_set = np.arange(20e3, 60e3 + 1, 5e3)
    batched = cell_search(capbuf, f_search_set, fc, fc, FS,
                          SearchConfig(batch_peaks=True))
    serial = cell_search(capbuf, f_search_set, fc, fc, FS,
                         SearchConfig(batch_peaks=False))
    assert len(batched) == len(serial) and len(batched) >= 2
    for cb, cs in zip(batched, serial):
        assert cb.n_id_cell() == cs.n_id_cell()
        assert cb.cp_type == cs.cp_type
        assert cb.n_rb_dl == cs.n_rb_dl
        assert cb.n_ports == cs.n_ports
        assert cb.phich_duration == cs.phich_duration
        assert cb.phich_resource == cs.phich_resource
        assert cb.sfn == cs.sfn
        assert cb.frame_start == cs.frame_start
        np.testing.assert_allclose(cb.freq_fine, cs.freq_fine,
                                   rtol=1e-9, atol=1e-6)
        np.testing.assert_allclose(cb.freq_superfine, cs.freq_superfine,
                                   rtol=1e-6, atol=1e-3)
