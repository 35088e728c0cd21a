"""Carrier-axis sharded band scan on the virtual 8-device CPU mesh.

The data-parallel carrier front end must match the single-carrier
xcorr_pss per carrier exactly, and the end-to-end scan_band must find a
simulated cell only on the carrier that contains it.
"""

import numpy as np
import pytest
import jax

from lte_cell_scanner_tpu.cell import CpType
from lte_cell_scanner_tpu.constants import FS_LTE
from lte_cell_scanner_tpu.models.search import SearchConfig, dedup
from lte_cell_scanner_tpu.models.xcorr import xcorr_pss
from lte_cell_scanner_tpu.parallel.carriers import (make_carrier_mesh,
                                                    scan_band)
from lte_cell_scanner_tpu.sim import awgn, create_dl_sig

FS = FS_LTE / 16

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 virtual devices")


@needs8
def test_front_end_matches_per_carrier_xcorr():
    from lte_cell_scanner_tpu.parallel.carriers import (_front_sharded,
                                                        plan_carrier_inputs)
    rng = np.random.default_rng(0)
    n_cap = 40000
    f_set = np.array([-5e3, 0.0, 5e3])
    fcs = [739e6, 739.1e6, 2145e6]
    caps = [(rng.normal(size=n_cap) + 1j * rng.normal(size=n_cap)) * 0.1
            for _ in fcs]

    mesh = make_carrier_mesh(8)
    cap, tmpl, starts, n_comb_xc, c_real = plan_carrier_inputs(
        caps, fcs, f_set, fcs, FS, 8, dtype=np.complex128)
    assert c_real == 3 and cap.shape[0] == 8
    xc_single, pow_c, frq_c, sp_inc = jax.tree_util.tree_map(
        np.asarray, _front_sharded(mesh, cap, tmpl, starts, 2))

    for i, (c, fc) in enumerate(zip(caps, fcs)):
        ref = xcorr_pss(np.asarray(c, np.complex128), f_set, 2, fc, fc, FS)
        assert np.allclose(pow_c[i], ref.xc_incoherent_collapsed_pow,
                           atol=1e-12)
        assert np.allclose(xc_single[i], ref.xc_incoherent_single,
                           atol=1e-12)
        assert np.allclose(sp_inc[i], ref.sp_incoherent, atol=1e-12)
        same = frq_c[i] == ref.xc_incoherent_collapsed_frq
        assert same.mean() > 0.999


@needs8
def test_scan_band_finds_cell_on_right_carrier():
    rng = np.random.default_rng(1)
    sig = create_dl_sig(CpType.NORMAL, 80, 0, 92, 1, 0.5, rng=rng,
                        n_ports=2, sfn=0)
    sig = awgn(sig, 10.0, rng=rng)
    noise = (rng.normal(size=len(sig)) + 1j * rng.normal(size=len(sig))) * 0.1

    f_set = np.arange(-10e3, 10e3 + 1, 5e3)
    mesh = make_carrier_mesh(2)
    results = scan_band([(sig, 739e6, 739e6), (noise, 739.1e6, 739.1e6)],
                        f_set, FS, SearchConfig(decode=False), mesh=mesh,
                        dtype=np.complex128)
    assert len(results) == 2
    assert any(c.n_id_cell() == 277 for c in results[0])
    assert results[1] == []
    merged = dedup(results)
    assert any(c.n_id_cell() == 277 for c in merged)
