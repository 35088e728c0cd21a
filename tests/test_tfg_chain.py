"""Golden chain test: extract_tfg -> tfoec -> decode_mib on test_tfg.mat.

The reference's test_tfg.it expected-output vector was stripped, but its
*input* survives in Matlab/test_tfg.mat (SURVEY.md section 4.1): an 80 ms
capture plus the detected peak for cell 277 (n_id_1=92, n_id_2=1, normal
CP, ind 8675 (1-based), freq 40 kHz, freq_fine 39684.0775, frame_start
17449.5250338 (1-based)).  The decode contract (test/test_tfg.cpp:100 and
the stored peaks struct): MIB decodes with n_rb_dl=50.
"""

import numpy as np
import pytest

from lte_cell_scanner_tpu.cell import Cell, CpType
from lte_cell_scanner_tpu.constants import FS_LTE
from lte_cell_scanner_tpu.models.mib import decode_mib
from lte_cell_scanner_tpu.models.rs import RsDl
from lte_cell_scanner_tpu.models.tfg import extract_tfg, tfoec
from lte_cell_scanner_tpu.utils.matfile import read_mat

FS = FS_LTE / 16


@pytest.fixture(scope="module")
def tfg_mat():
    return read_mat("/root/reference/Matlab/test_tfg.mat")


def test_tfg_chain_decodes_mib(tfg_mat):
    d = tfg_mat
    p = d["peaks"]
    fc = float(d["fc"])
    cell = Cell(
        fc_requested=fc, fc_programmed=fc,
        pss_pow=float(p["pow"]),
        ind=int(p["ind"]) - 1,                    # matlab 1-based
        freq=float(p["freq"]),
        n_id_2=int(p["n_id_2"]),
        n_id_1=int(p["n_id_1"]),
        cp_type=CpType.NORMAL if p["cp_type"] == "normal" else CpType.EXTENDED,
        frame_start=float(p["frame_start"]) - 1,  # matlab 1-based
        freq_fine=float(p["freq_fine"]),
    )
    assert cell.n_id_cell() == 277

    capbuf = d["capbuf"]
    tfg, ts = extract_tfg(cell, capbuf, fc, fc, FS)
    assert tfg.shape == (854, 72)

    rs_dl = RsDl(cell.n_id_cell(), 6, cell.cp_type)
    cell2, tfg_comp, _ = tfoec(cell, tfg, ts, fc, fc, rs_dl)
    # superfine FOE stays within the 5 kHz raster cell of freq_fine
    assert abs(cell2.freq_superfine - cell.freq_fine) < 200.0

    cell3 = decode_mib(cell2, tfg_comp, rs_dl)
    assert cell3.n_rb_dl == 50, str(cell3)
    assert cell3.n_ports == 2, str(cell3)
    # stored MATLAB decode results for this capture
    if "sfn" in p and np.isfinite(float(p["sfn"])):
        assert cell3.sfn == int(p["sfn"]), str(cell3)


def test_tfg_chain_freq_superfine_close_to_matlab(tfg_mat):
    d = tfg_mat
    p = d["peaks"]
    if not np.isfinite(float(p.get("freq_superfine", np.nan))):
        pytest.skip("no stored freq_superfine")
    fc = float(d["fc"])
    cell = Cell(
        fc_requested=fc, fc_programmed=fc, pss_pow=float(p["pow"]),
        ind=int(p["ind"]) - 1, freq=float(p["freq"]),
        n_id_2=int(p["n_id_2"]), n_id_1=int(p["n_id_1"]),
        cp_type=CpType.NORMAL, frame_start=float(p["frame_start"]) - 1,
        freq_fine=float(p["freq_fine"]),
    )
    capbuf = d["capbuf"]
    tfg, ts = extract_tfg(cell, capbuf, fc, fc, FS)
    rs_dl = RsDl(277, 6, cell.cp_type)
    cell2, _, _ = tfoec(cell, tfg, ts, fc, fc, rs_dl)
    # production semantics differ from the MATLAB prototype at the k_factor
    # level; the estimates must still agree to well under a Hz-scale drift
    assert abs(cell2.freq_superfine - float(p["freq_superfine"])) < 5.0


def _hex_filter_reference(ce_raw, shift0, shift1):
    """Direct transcription of the reference filter loop
    (searcher.cpp:1432-1468): for each output row t, same-row taps
    k-1..k+1 plus a window on rows t-1/t+1 -- the FULL window when the
    combs coincide, else {k-1,k} / {k,k+1} by t's current_row_leftmost
    (initialized shift0<shift1, flipped per row)."""
    n_rs, n_sc = ce_raw.shape
    out = np.empty_like(ce_raw)
    current_row_leftmost = shift0 < shift1
    for t in range(n_rs):
        for k in range(n_sc):
            ind = [i for i in (k - 1, k, k + 1) if 0 <= i < n_sc]
            total = sum(ce_raw[t, i] for i in ind)
            n_total = len(ind)
            if shift0 == shift1:
                ind = [i for i in (k - 1, k, k + 1) if 0 <= i < n_sc]
            elif current_row_leftmost:
                ind = [i for i in (k - 1, k) if 0 <= i < n_sc]
            else:
                ind = [i for i in (k, k + 1) if 0 <= i < n_sc]
            if t != 0:
                total += sum(ce_raw[t - 1, i] for i in ind)
                n_total += len(ind)
            if t != n_rs - 1:
                total += sum(ce_raw[t + 1, i] for i in ind)
                n_total += len(ind)
            out[t, k] = total / n_total
        current_row_leftmost = not current_row_leftmost
    return out


@pytest.mark.parametrize("shifts", [(1, 4), (4, 1), (2, 2)])
def test_hex_filter_matches_reference_loop(shifts):
    """The vectorized 7-point hex CE filter must reproduce the reference
    scalar loop exactly for both staggered orders and the coincident-comb
    case (regression: the adjacent-row window was once selected by the
    CONTRIBUTING row's parity instead of the output row's)."""
    from lte_cell_scanner_tpu.models.chan_est import _hex_filter

    rng = np.random.default_rng(5)
    ce_raw = rng.normal(size=(9, 12)) + 1j * rng.normal(size=(9, 12))
    got = np.asarray(_hex_filter(ce_raw, *shifts))
    want = _hex_filter_reference(ce_raw, *shifts)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_fused_decode_matches_staged(tfg_mat):
    """The fused whole-chain decode (models/decode.py: tfg -> tfoec ->
    4-port hex chan_est -> blind MIB in ONE device program) must agree
    with the staged per-stage flow on the real capture."""
    from lte_cell_scanner_tpu.models.decode import decode_back_half_fused

    d = tfg_mat
    p = d["peaks"]
    fc = float(d["fc"])
    cell = Cell(
        fc_requested=fc, fc_programmed=fc, pss_pow=float(p["pow"]),
        ind=int(p["ind"]) - 1, freq=float(p["freq"]),
        n_id_2=int(p["n_id_2"]), n_id_1=int(p["n_id_1"]),
        cp_type=CpType.NORMAL, frame_start=float(p["frame_start"]) - 1,
        freq_fine=float(p["freq_fine"]),
    )
    capbuf = d["capbuf"]
    fused = decode_back_half_fused(cell, capbuf, fc, fc, FS_LTE / 16)

    tfg, ts = extract_tfg(cell, capbuf, fc, fc, FS_LTE / 16)
    rs_dl = RsDl(cell.n_id_cell(), 6, cell.cp_type)
    staged, tfg_comp, _ = tfoec(cell, tfg, ts, fc, fc, rs_dl)
    staged = decode_mib(staged, tfg_comp, rs_dl)

    assert fused.n_rb_dl == staged.n_rb_dl == 50
    assert fused.n_ports == staged.n_ports == 2
    assert fused.sfn == staged.sfn
    assert fused.phich_duration is staged.phich_duration
    assert fused.phich_resource is staged.phich_resource
    np.testing.assert_allclose(fused.freq_superfine, staged.freq_superfine,
                               rtol=1e-9, atol=1e-6)
