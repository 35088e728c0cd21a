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


def test_device_peak_search_matches_host_on_golden_vector():
    """peak_search_device_impl (the traced lax.while_loop greedy loop)
    must reproduce the host peak_search EXACTLY on the shipped golden
    vector (20 peaks, MATLAB semantics incl. the other-PSS 8 dB
    cancellation): same powers, refined lags, frequencies and PSS ids,
    in the same order."""
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from lte_cell_scanner_tpu.models.peaks import (
        cells_from_peak_records, peak_search, peak_search_device_impl)
    from lte_cell_scanner_tpu.utils import read_itfile

    d = read_itfile("/root/reference/test/test_peak_search.it")
    pow_c = np.asarray(d["xc_incoherent_collapsed_pow"])
    frq_c = np.asarray(d["xc_incoherent_collapsed_frq"]).astype(np.int64) - 1
    z = np.asarray(d["Z_th1"])
    f_set = np.asarray(d["f_search_set"], dtype=np.float64)
    fc = 739e6
    arm = 2
    # synthetic flat single (the golden test convention): every lag in
    # the refinement window equals the collapsed value
    single = np.repeat(pow_c[:, None, :], len(f_set), axis=1)
    host = peak_search(pow_c, frq_c, z, f_set, fc, fc, single, arm)
    # slab from the synthetic single, exactly as the lean front end
    # would have gathered it
    slab = np.empty((3, 2 * arm + 1, 9600))
    for t in range(3):
        for dd in range(2 * arm + 1):
            src = (np.arange(9600) - arm + dd) % 9600
            slab[t, dd] = pow_c[t, src]
    recs, n = jax.jit(peak_search_device_impl, static_argnums=(4,))(
        jnp.asarray(pow_c), jnp.asarray(frq_c), jnp.asarray(slab),
        jnp.asarray(z), arm)
    dev = cells_from_peak_records(np.asarray(recs), int(n), f_set, fc, fc)
    assert len(dev) == len(host) == 20
    for a, b in zip(dev, host):
        assert a.n_id_2 == b.n_id_2
        assert a.ind == b.ind
        assert a.freq == b.freq
        assert a.pss_pow == b.pss_pow


def test_xcorr_pss_peaks_matches_staged_on_capture():
    """The fused front+peaks program (models.xcorr.xcorr_pss_peaks, the
    cell_search accelerator route) must extract the identical peak list
    to the staged xcorr_pss -> compute_z_th1 -> host peak_search flow
    on the real two-cell capture."""
    import jax
    jax.config.update("jax_enable_x64", True)
    from lte_cell_scanner_tpu.constants import FS_LTE
    from lte_cell_scanner_tpu.models.peaks import (cells_from_peak_records,
                                                   peak_search)
    from lte_cell_scanner_tpu.models.search import compute_z_th1
    from lte_cell_scanner_tpu.models.xcorr import (xcorr_pss,
                                                   xcorr_pss_peaks)
    from lte_cell_scanner_tpu.utils import read_itfile

    fs = FS_LTE / 16
    fc = 739e6
    cap = np.asarray(
        read_itfile("/root/reference/test/capbuf_0000.it")["capbuf"])
    f_set = np.arange(25e3, 45e3 + 1, 5e3)

    res = xcorr_pss(cap, f_set, 2, fc, fc, fs, lean=True)
    z = compute_z_th1(res.sp_incoherent, res.n_comb_xc)
    host = peak_search(res.xc_incoherent_collapsed_pow,
                       res.xc_incoherent_collapsed_frq, z, f_set, fc, fc,
                       None, 2, refine_slab=res.refine_slab)
    recs, n, n_comb = xcorr_pss_peaks(cap, f_set, 2, fc, fc, fs, 12)
    dev = cells_from_peak_records(recs, n, f_set, fc, fc)
    assert n_comb == res.n_comb_xc
    assert len(dev) == len(host) >= 2
    for a, b in zip(dev, host):
        assert a.n_id_2 == b.n_id_2
        assert a.ind == b.ind
        assert a.freq == b.freq
        np.testing.assert_allclose(a.pss_pow, b.pss_pow, rtol=1e-12)
