"""E4000 PLL frequency model (reference from_osmocom.cpp:113-166)."""

import numpy as np

from lte_cell_scanner_tpu.io.e4000 import (compute_fc_programmed,
                                           fc_programmed_with_fudge)

FOSC = 28.8e6


def test_programmed_close_but_quantized():
    """The synthesizer quantizes to fosc/(Y*r); for 739 MHz (r=4) the step
    is 28.8e6/65536/4 ~ 110 Hz, so |programmed - requested| < 110 Hz and
    generally nonzero."""
    fc = 739e6
    prog = compute_fc_programmed(FOSC, fc)
    assert abs(prog - fc) < FOSC / 65536 / 4
    # integer-floor arithmetic: programmed never exceeds requested + step
    assert prog <= fc


def test_quantization_step_matches_r_divider():
    """Sweeping intended LO by sub-step amounts must produce piecewise-
    constant programmed LO (the fractional-N grid)."""
    base = 739e6
    progs = {compute_fc_programmed(FOSC, base + d) for d in range(0, 40, 10)}
    assert len(progs) == 1            # all inside one 110 Hz cell


def test_r_divider_bands():
    """Band edges from the osmocom pll_vars table: below 72.4 MHz r=48,
    739 MHz r=4, above 1.2 GHz r=2."""
    for fc, r in ((50e6, 48), (100e6, 32), (300e6, 12), (400e6, 8),
                  (739e6, 4), (1.5e9, 2)):
        prog = compute_fc_programmed(FOSC, fc)
        # reconstruct the quantization grid implied by r
        step = FOSC / 65536 / r
        assert abs(prog - fc) < max(step, 1.0) + 1.0, (fc, r, prog)


def test_fudge_is_58_hz():
    fc = 739e6
    assert fc_programmed_with_fudge(fc) == compute_fc_programmed(FOSC, fc) + 58.0


def test_monotonic():
    fs = np.linspace(400e6, 800e6, 101)
    progs = [compute_fc_programmed(FOSC, f) for f in fs]
    assert all(b >= a for a, b in zip(progs, progs[1:]))
