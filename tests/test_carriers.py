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
    slabs, pow_c, frq_c, sp_inc = jax.tree_util.tree_map(
        np.asarray, _front_sharded(mesh, cap, tmpl, starts, 2))

    for i, (c, fc) in enumerate(zip(caps, fcs)):
        ref = xcorr_pss(np.asarray(c, np.complex128), f_set, 2, fc, fc, FS)
        assert np.allclose(pow_c[i], ref.xc_incoherent_collapsed_pow,
                           atol=1e-12)
        # lean front end: the refinement slab holds, per collapsed-argmax
        # frequency, the +-arm window of the pre-delay-spread fold
        # (models/xcorr._xcorr_core_impl lean=True)
        single = ref.xc_incoherent_single
        frq = ref.xc_incoherent_collapsed_frq
        L = single.shape[-1]
        lags = np.arange(L)
        for d in range(5):
            idx = (lags - 2 + d) % L
            # slab[t,d,l] = single[t, frq[t,l], (l-2+d) % L]
            want = np.take_along_axis(single[:, :, idx],
                                      frq[:, None, :], axis=1)[:, 0, :]
            got = slabs[i][:, d, :]
            # lags where the device argmax picked a different (tied)
            # frequency may differ; require near-total agreement
            ok = np.isclose(got, want, atol=1e-12)
            assert ok.mean() > 0.999
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


@needs8
def test_scan_band_batched_matches_per_carrier_refine():
    """The cross-carrier batched back half (sss_detect_batch_multi /
    pss_sss_foe_batch_multi with per-peak carrier indices) must
    reproduce the per-carrier refine loop: same cells on the same
    carriers, same decisions, matching estimates."""
    rng = np.random.default_rng(3)
    sig_a = awgn(create_dl_sig(CpType.NORMAL, 80, 0, 92, 1, 0.5, rng=rng,
                               n_ports=2, sfn=0), 10.0, rng=rng)
    sig_b = awgn(create_dl_sig(CpType.NORMAL, 80, 0, 90, 1, 0.5, rng=rng,
                               n_ports=1, sfn=4), 10.0, rng=rng)

    f_set = np.arange(-10e3, 10e3 + 1, 5e3)
    mesh = make_carrier_mesh(2)
    caps = [(sig_a, 739e6, 739e6), (sig_b, 739.1e6, 739.1e6)]
    batched = scan_band(caps, f_set, FS, SearchConfig(batch_peaks=True),
                        mesh=mesh, dtype=np.complex128)
    serial = scan_band(caps, f_set, FS, SearchConfig(batch_peaks=False),
                       mesh=mesh, dtype=np.complex128)
    assert any(c.n_id_cell() == 277 for c in batched[0])
    assert any(c.n_id_cell() == 271 for c in batched[1])
    for rb, rs in zip(batched, serial):
        assert len(rb) == len(rs)
        for cb, cs in zip(rb, rs):
            assert cb.n_id_cell() == cs.n_id_cell()
            assert cb.cp_type is cs.cp_type
            assert cb.n_rb_dl == cs.n_rb_dl
            assert cb.n_ports == cs.n_ports
            assert cb.sfn == cs.sfn
            assert cb.frame_start == cs.frame_start
            np.testing.assert_allclose(cb.freq_fine, cs.freq_fine,
                                       rtol=1e-9, atol=1e-6)


def test_scan_band_chunks_match_single_program():
    """max_carriers_per_program chunking returns identical results to
    the unchunked batch (bounded-HBM wide-band path)."""
    import numpy as np
    from lte_cell_scanner_tpu.constants import FS_LTE
    from lte_cell_scanner_tpu.models.search import SearchConfig
    from lte_cell_scanner_tpu.parallel.carriers import (make_carrier_mesh,
                                                        scan_band)
    from lte_cell_scanner_tpu.cell import CpType
    from lte_cell_scanner_tpu.sim import awgn, create_dl_sig

    rng = np.random.default_rng(11)
    n_cap = 30 * 1920
    sig = awgn(create_dl_sig(CpType.NORMAL, 30, 0, 92, 1, 0.5, rng=rng,
                             n_ports=2), 8.0, rng=rng)
    noise = (rng.normal(size=n_cap) + 1j * rng.normal(size=n_cap)) \
        * np.sqrt(0.5)
    caps = [(noise, 739e6, 739e6), (sig, 739.1e6, 739.1e6),
            (noise, 739.2e6, 739.2e6)]
    f_set = np.array([-5e3, 0.0, 5e3])
    cfg = SearchConfig(decode=False)
    mesh = make_carrier_mesh(1)

    whole = scan_band(caps, f_set, FS_LTE / 16, cfg, mesh)
    chunked = scan_band(caps, f_set, FS_LTE / 16, cfg, mesh,
                        max_carriers_per_program=1)
    assert [len(l) for l in whole] == [len(l) for l in chunked]
    for lw, lc in zip(whole, chunked):
        for cw, cc in zip(lw, lc):
            assert cw.n_id_cell() == cc.n_id_cell()
            np.testing.assert_allclose(cw.freq_fine, cc.freq_fine,
                                       rtol=1e-9)


def test_shared_band_matrix_substitution_is_exact_at_bf16():
    """The batched scan shares ONE Pallas band matrix across carriers:
    adjacent carriers' templates differ only through k_factor
    (~4e-5 relative phase across a whole 10 MHz band, ~4e-7 per
    100 kHz step), two orders below the bf16 band quantization
    (eps ~ 4e-3).  Pin that bound in f32."""
    import numpy as np
    from lte_cell_scanner_tpu.constants import FS_LTE
    from lte_cell_scanner_tpu.models.xcorr import pss_templates
    from lte_cell_scanner_tpu.ops.corr_pallas import \
        bands_v2_for_templates

    fs = FS_LTE / 16
    f_set = np.arange(-75e3, 75e3 + 1, 5e3)
    g0 = np.asarray(bands_v2_for_templates(
        pss_templates(f_set, 739e6, 739e6, fs,
                      np.complex64).reshape(-1, 137),
        precision="f32"), np.float32)
    g1 = np.asarray(bands_v2_for_templates(
        pss_templates(f_set, 749e6, 749e6, fs,
                      np.complex64).reshape(-1, 137),
        precision="f32"), np.float32)
    scale = np.max(np.abs(g0))
    # 10 MHz of carrier spread: bound ~4e-5 relative; bf16 eps ~4e-3
    assert np.max(np.abs(g0 - g1)) / scale < 2e-4


def test_scan_band_pallas_backend_matches_xla_backend():
    """The production Pallas path through scan_band (shared bf16 band
    matrix, interpreted on CPU) reaches the same detections as the XLA
    backend."""
    import numpy as np
    from lte_cell_scanner_tpu.constants import FS_LTE
    from lte_cell_scanner_tpu.models.search import SearchConfig
    from lte_cell_scanner_tpu.parallel.carriers import (make_carrier_mesh,
                                                        scan_band)
    from lte_cell_scanner_tpu.cell import CpType
    from lte_cell_scanner_tpu.sim import awgn, create_dl_sig

    rng = np.random.default_rng(12)
    n_cap = 30 * 1920
    sig = awgn(create_dl_sig(CpType.NORMAL, 30, 0, 92, 1, 0.5, rng=rng,
                             n_ports=2), 8.0, rng=rng)
    noise = (rng.normal(size=n_cap) + 1j * rng.normal(size=n_cap)) \
        * np.sqrt(0.5)
    caps = [(noise, 739e6, 739e6), (sig, 739.1e6, 739.1e6)]
    f_set = np.array([-5e3, 0.0, 5e3])
    mesh = make_carrier_mesh(1)

    ref = scan_band(caps, f_set, FS_LTE / 16,
                    SearchConfig(decode=False, corr_backend="xla"),
                    mesh)
    pal = scan_band(caps, f_set, FS_LTE / 16,
                    SearchConfig(decode=False, corr_backend="pallas"),
                    mesh)
    assert [len(l) for l in ref] == [len(l) for l in pal]
    assert pal[1] and pal[1][0].n_id_cell() == 277
    assert not pal[0]
    for lr, lp in zip(ref, pal):
        for cr, cp in zip(lr, lp):
            assert cr.n_id_cell() == cp.n_id_cell()
            # detection powers at detection-grade (bf16) tolerance
            assert abs(cr.pss_pow - cp.pss_pow) < 2e-2 * cr.pss_pow

    # same result on a 2-device "c" mesh: the back stages' lax.map must
    # run over each device's LOCAL carriers (shard_map), never over the
    # global sharded axis
    import jax
    if len(jax.devices()) >= 2:
        pal2 = scan_band(caps, f_set, FS_LTE / 16,
                         SearchConfig(decode=False,
                                      corr_backend="pallas"),
                         make_carrier_mesh(2))
        assert [len(l) for l in pal2] == [len(l) for l in pal]
        assert pal2[1][0].n_id_cell() == 277

    # ADC-grid captures take the int8 exact dot ((g_int8, scale) band
    # tuple through shard_map + lax.map): 8-bit-quantize the same
    # signals -- what a real dongle would deliver -- and re-scan
    def to_grid(x):
        k = np.clip(np.round(np.real(x) * 128), -127, 127) \
            + 1j * np.clip(np.round(np.imag(x) * 128), -127, 127)
        return (k / 128.0).astype(np.complex64)

    gcaps = [(to_grid(c), fc, fcp) for c, fc, fcp in caps]
    if len(jax.devices()) >= 2:
        pi8 = scan_band(gcaps, f_set, FS_LTE / 16,
                        SearchConfig(decode=False,
                                     corr_backend="pallas"),
                        make_carrier_mesh(2))
        assert pi8[1] and pi8[1][0].n_id_cell() == 277
        assert not pi8[0]


def test_scan_band_float_boundary_pallas_path(monkeypatch):
    """The single-accelerator float-boundary path (_front_batch, the
    axon production route) with the v2 single-band format must reach
    the lax.map back stages and match the plain path."""
    import numpy as np
    from lte_cell_scanner_tpu.constants import FS_LTE
    from lte_cell_scanner_tpu.models.search import SearchConfig
    from lte_cell_scanner_tpu.parallel.carriers import (make_carrier_mesh,
                                                        scan_band)
    from lte_cell_scanner_tpu.cell import CpType
    from lte_cell_scanner_tpu.sim import awgn, create_dl_sig

    rng = np.random.default_rng(13)
    sig = awgn(create_dl_sig(CpType.NORMAL, 30, 0, 92, 1, 0.5, rng=rng,
                             n_ports=2), 8.0, rng=rng)
    caps = [(sig, 739e6, 739e6)]
    f_set = np.array([-5e3, 0.0, 5e3])
    cfg = SearchConfig(decode=False, corr_backend="pallas")
    mesh = make_carrier_mesh(1)

    plain = scan_band(caps, f_set, FS_LTE / 16, cfg, mesh)
    monkeypatch.setenv("LTE_TPU_FLOAT_BOUNDARY", "always")
    fb = scan_band(caps, f_set, FS_LTE / 16, cfg, mesh)
    assert [c.n_id_cell() for c in fb[0]] == \
        [c.n_id_cell() for c in plain[0]]
    assert fb[0] and fb[0][0].n_id_cell() == 277


def test_scan_band_device_peaks_matches_host_path():
    """scan_band with the DEVICE greedy peak search (device_peaks=True)
    must decode the identical cell lists as the host peak-search route
    on a band of rolled real captures containing cells 271+277."""
    from lte_cell_scanner_tpu.models.search import SearchConfig
    from lte_cell_scanner_tpu.parallel.carriers import (make_carrier_mesh,
                                                        scan_band)
    from lte_cell_scanner_tpu.utils import read_itfile

    base = np.asarray(
        read_itfile("/root/reference/test/capbuf_0000.it")["capbuf"],
        np.complex64)
    fc = 739e6
    f_set = np.arange(25e3, 45e3 + 1, 5e3)
    caps = [(np.roll(base, 31 * i + 1), fc + 1e5 * i, fc + 1e5 * i)
            for i in range(2)]
    mesh = make_carrier_mesh(1)
    cfg = SearchConfig()
    host = scan_band(caps, f_set, FS, cfg, mesh, device_peaks=False)
    dev = scan_band(caps, f_set, FS, cfg, mesh, device_peaks=True)
    assert len(host) == len(dev) == 2
    for hs, ds in zip(host, dev):
        assert sorted(c.n_id_cell() for c in hs) == \
            sorted(c.n_id_cell() for c in ds)
        assert len(hs) >= 2
        for a, b in zip(sorted(hs, key=lambda c: c.n_id_cell()),
                        sorted(ds, key=lambda c: c.n_id_cell())):
            assert a.ind == b.ind
            assert a.freq == b.freq
            assert a.sfn == b.sfn
            assert a.n_rb_dl == b.n_rb_dl
            np.testing.assert_allclose(b.freq_superfine, a.freq_superfine,
                                       rtol=1e-9, atol=1e-5)
