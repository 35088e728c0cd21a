"""Golden-vector test for peak_search against test/test_peak_search.it.

Mirrors the reference harness (/root/reference/test/test_peak_search.cpp):
feeds the recorded collapsed-power matrices plus a synthetic flat
xc_incoherent_single (every lag = collapsed value) with ds_comb_arm=0 and
checks the extracted peak list exactly.
"""

import numpy as np

from lte_cell_scanner_tpu.models.peaks import peak_search
from lte_cell_scanner_tpu.utils import read_itfile


def test_peak_search_golden(ref_test_dir):
    d = read_itfile(str(ref_test_dir / "test_peak_search.it"))
    pow_ = d["xc_incoherent_collapsed_pow"]
    frq = d["xc_incoherent_collapsed_frq"] - 1  # matlab 1-based
    Z_th1 = d["Z_th1"]
    f_search_set = d["f_search_set"].astype(np.float64)
    n_f = len(f_search_set)

    # synthetic flat single: [3, n_f, 9600]
    single = np.broadcast_to(pow_[:, None, :], (3, n_f, 9600)).copy()

    cells = peak_search(pow_, frq, Z_th1, f_search_set, 739e6, 739e6,
                        single, ds_comb_arm=0)

    exp_pow = d["peaks_pow"]
    exp_ind = d["peaks_ind"] - 1
    exp_freq = d["peaks_freq"]
    exp_n_id_2 = d["peaks_n_id_2"]

    assert len(cells) == len(exp_pow)
    for i, c in enumerate(cells):
        assert abs(c.pss_pow - exp_pow[i]) <= 1e-6
        assert c.ind == exp_ind[i]
        assert c.freq == exp_freq[i]
        assert c.n_id_2 == exp_n_id_2[i]


def test_first_peak_is_cell_277_pss(ref_test_dir):
    """The strongest peak of the 739 MHz capture is cell 277's PSS
    (n_id_2=1, ind 8674 zero-based, freq 40 kHz) -- SURVEY.md section 4.1."""
    d = read_itfile(str(ref_test_dir / "test_peak_search.it"))
    assert d["peaks_n_id_2"][0] == 1
    assert d["peaks_ind"][0] - 1 == 8674
    assert d["peaks_freq"][0] == 40000
    assert abs(d["peaks_pow"][0] - 0.13688) < 1e-4
