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
