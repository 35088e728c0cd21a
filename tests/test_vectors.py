"""Regression tests against the regenerated golden vectors.

tests/vectors/*.it are frozen baselines regenerated from the reference's
shipped .mat inputs (tools/regenerate_vectors.py) -- they replace the two
vectors stripped from the reference.  The tfg baseline decodes to SFN 649,
matching the reference's documented ground truth for this capture
(SURVEY.md section 4.1 / Matlab/pss_search_final.m:344-356), which
independently anchors the whole tfg -> tfoec -> chan_est -> MIB chain.
"""

import pathlib

import numpy as np
import pytest

from lte_cell_scanner_tpu.cell import Cell, CpType
from lte_cell_scanner_tpu.constants import FS_LTE
from lte_cell_scanner_tpu.models.mib import decode_mib
from lte_cell_scanner_tpu.models.rs import RsDl
from lte_cell_scanner_tpu.models.tfg import extract_tfg, tfoec
from lte_cell_scanner_tpu.models.xcorr import xcorr_pss
from lte_cell_scanner_tpu.utils.itfile import read_itfile
from lte_cell_scanner_tpu.utils.matfile import read_mat

FS = FS_LTE / 16
VEC = pathlib.Path(__file__).parent / "vectors"


def test_xcorr_pss_regression():
    d = read_mat("/root/reference/Matlab/test_xcorr_pss.mat")
    capbuf = np.asarray(d["capbuf"]).ravel()
    gold = read_itfile(str(VEC / "test_xcorr_pss.it"))
    f_search_set = gold["f_search_set"]
    res = xcorr_pss(capbuf, f_search_set, 2, 739e6, 739e6, FS)
    assert res.n_comb_xc == gold["n_comb"][0]
    assert res.n_comb_sp == gold["n_comb"][1]
    # reference test tolerances (test_xcorr_pss.cpp:106-123)
    assert np.max(np.abs(res.xc_incoherent_collapsed_pow
                         - gold["xc_incoherent_collapsed_pow"])) <= 1e-8
    assert np.array_equal(res.xc_incoherent_collapsed_frq,
                          gold["xc_incoherent_collapsed_frq"])
    assert np.max(np.abs(res.xc_incoherent_single[:, 0, :]
                         - gold["xc_incoherent_single_t0"])) <= 1e-8
    assert np.max(np.abs(res.xc_incoherent[:, 0, :]
                         - gold["xc_incoherent_t0"])) <= 1e-8
    assert np.max(np.abs(res.sp_incoherent - gold["sp_incoherent"])) <= 1e-15
    assert np.max(np.abs(res.sp[:9600] - gold["sp_head"])) <= 1e-14


def test_tfg_chain_regression():
    d = read_mat("/root/reference/Matlab/test_tfg.mat")
    p = d["peaks"]
    fc = float(d["fc"])
    capbuf = np.asarray(d["capbuf"]).ravel()
    gold = read_itfile(str(VEC / "test_tfg.it"))
    cell = Cell(
        fc_requested=fc, fc_programmed=fc, pss_pow=float(p["pow"]),
        ind=int(p["ind"]) - 1, freq=float(p["freq"]),
        n_id_2=int(p["n_id_2"]), n_id_1=int(p["n_id_1"]),
        cp_type=CpType.NORMAL, frame_start=float(p["frame_start"]) - 1,
        freq_fine=float(p["freq_fine"]))
    tfg, ts = extract_tfg(cell, capbuf, fc, fc, FS)
    # reference test tolerances (test_tfg.cpp:87-100)
    assert np.max(np.abs(np.asarray(tfg) - gold["tfg"])) <= 1e-10
    assert np.max(np.abs(ts - gold["tfg_timestamp"])) <= 1e-10
    rs_dl = RsDl(277, 6, cell.cp_type)
    cell2, tfg_comp, ts2 = tfoec(cell, tfg, ts, fc, fc, rs_dl)
    assert np.max(np.abs(np.asarray(tfg_comp) - gold["tfg_comp"])) <= 1e-10
    assert abs(cell2.freq_superfine - gold["freq_superfine"][0]) <= 1e-7
    cell3 = decode_mib(cell2, tfg_comp, rs_dl)
    assert cell3.n_rb_dl == gold["mib"][0] == 50
    assert cell3.n_ports == gold["mib"][1] == 2
    assert cell3.sfn == gold["mib"][2] == 649  # documented ground truth
