"""Regenerate the two golden vectors the reference shipped but stripped.

test/test_xcorr_pss.it and test/test_tfg.it were removed from the mounted
reference (.MISSING_LARGE_BLOBS), but their *inputs* survive in
Matlab/test_xcorr_pss.mat and Matlab/test_tfg.mat (SURVEY.md section 4.1).
This tool recomputes the expected outputs with this framework (in float64
on the CPU backend) and writes compact .it vectors under tests/vectors/,
which tests/test_vectors.py then treats as frozen regression baselines.

Anchoring: the xcorr outputs are independently verified by brute-force
numpy checks (tests/test_xcorr.py); the tfg-chain outputs by the
sss_detect golden vector upstream and the MIB decode contract
(n_rb_dl=50) downstream.

Run: python tools/regenerate_vectors.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from lte_cell_scanner_tpu.cell import Cell, CpType  # noqa: E402
from lte_cell_scanner_tpu.constants import FS_LTE  # noqa: E402
from lte_cell_scanner_tpu.models.mib import decode_mib  # noqa: E402
from lte_cell_scanner_tpu.models.rs import RsDl  # noqa: E402
from lte_cell_scanner_tpu.models.tfg import extract_tfg, tfoec  # noqa: E402
from lte_cell_scanner_tpu.models.xcorr import xcorr_pss  # noqa: E402
from lte_cell_scanner_tpu.utils.itfile import write_itfile  # noqa: E402
from lte_cell_scanner_tpu.utils.matfile import read_mat  # noqa: E402

FS = FS_LTE / 16
OUT = pathlib.Path(__file__).resolve().parents[1] / "tests" / "vectors"


def regen_xcorr():
    d = read_mat("/root/reference/Matlab/test_xcorr_pss.mat")
    capbuf = np.asarray(d["capbuf"]).ravel()
    # run parameters per Matlab/test_xcorr_pss.m:23-25
    f_search_set = np.arange(35e3, 45e3 + 1, 5e3)
    fc = 739e6
    res = xcorr_pss(capbuf, f_search_set, 2, fc, fc, FS)
    write_itfile(str(OUT / "test_xcorr_pss.it"), {
        "f_search_set": f_search_set,
        "xc_incoherent_collapsed_pow": res.xc_incoherent_collapsed_pow,
        "xc_incoherent_collapsed_frq":
            res.xc_incoherent_collapsed_frq.astype(np.int32),
        "xc_incoherent_single_t0":
            res.xc_incoherent_single[:, 0, :],       # [3, 9600] spot plane
        "xc_incoherent_t0": res.xc_incoherent[:, 0, :],
        "sp_incoherent": res.sp_incoherent,
        "sp_head": res.sp[:9600],
        "n_comb": np.array([res.n_comb_xc, res.n_comb_sp], dtype=np.int32),
    })
    print("xcorr vector:", res.n_comb_xc, res.n_comb_sp,
          float(res.xc_incoherent_collapsed_pow.max()))


def regen_tfg():
    d = read_mat("/root/reference/Matlab/test_tfg.mat")
    p = d["peaks"]
    fc = float(d["fc"])
    capbuf = np.asarray(d["capbuf"]).ravel()
    cell = Cell(
        fc_requested=fc, fc_programmed=fc, pss_pow=float(p["pow"]),
        ind=int(p["ind"]) - 1, freq=float(p["freq"]),
        n_id_2=int(p["n_id_2"]), n_id_1=int(p["n_id_1"]),
        cp_type=CpType.NORMAL if p["cp_type"] == "normal"
        else CpType.EXTENDED,
        frame_start=float(p["frame_start"]) - 1,
        freq_fine=float(p["freq_fine"]))
    tfg, ts = extract_tfg(cell, capbuf, fc, fc, FS)
    rs_dl = RsDl(cell.n_id_cell(), 6, cell.cp_type)
    cell2, tfg_comp, ts2 = tfoec(cell, tfg, ts, fc, fc, rs_dl)
    cell3 = decode_mib(cell2, tfg_comp, rs_dl)
    assert cell3.n_rb_dl == 50, cell3
    write_itfile(str(OUT / "test_tfg.it"), {
        "tfg": np.asarray(tfg),
        "tfg_timestamp": ts,
        "tfg_comp": np.asarray(tfg_comp),
        "tfg_comp_timestamp": ts2,
        "freq_superfine": np.array([cell3.freq_superfine]),
        "mib": np.array([cell3.n_rb_dl, cell3.n_ports, cell3.sfn],
                        dtype=np.int32),
    })
    print("tfg vector:", cell3)


if __name__ == "__main__":
    OUT.mkdir(exist_ok=True)
    regen_xcorr()
    regen_tfg()
