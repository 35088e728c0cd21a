"""xcorr_pss front-end tests.

test/test_xcorr_pss.it (the expected-output vector) was stripped from the
reference, but its input capture survives in Matlab/test_xcorr_pss.mat with
run parameters ds_comb_arm=2, fc=739 MHz, f_search_set=35e3:5e3:45e3
(Matlab/test_xcorr_pss.m:23-25).  Strategy (SURVEY.md section 4.1):
self-consistency against an independent brute-force numpy implementation,
plus cross-checks against the still-intact downstream golden vectors
(done in test_sss_detect/test_peak_search).
"""

import numpy as np
import pytest

from lte_cell_scanner_tpu.constants import FS_LTE
from lte_cell_scanner_tpu.models.xcorr import (combine_start_indices,
                                               pss_templates, xcorr_pss)
from lte_cell_scanner_tpu.models.pss import PSS_TD
from lte_cell_scanner_tpu.utils.matfile import read_mat

FS = FS_LTE / 16
FC = 739e6


@pytest.fixture(scope="module")
def xcorr_capture():
    d = read_mat("/root/reference/Matlab/test_xcorr_pss.mat")
    return np.asarray(d["capbuf"]).ravel()


def test_templates_against_bruteforce():
    f_set = np.array([35e3, 40e3, 45e3])
    tm = pss_templates(f_set, FC, FC, FS)
    assert tm.shape == (3, 3, 137)
    pss = PSS_TD()
    for fi, f in enumerate(f_set):
        k = (FC - f) / FC
        ramp = np.exp(1j * 2 * np.pi * f * np.arange(137) / (FS * k))
        expect = np.conj(pss[1] * ramp) / 137
        assert np.allclose(tm[1, fi], expect, atol=1e-15)


def test_xcorr_pss_against_bruteforce(xcorr_capture):
    capbuf = xcorr_capture
    f_set = np.array([35e3, 40e3, 45e3])
    res = xcorr_pss(capbuf, f_set, 2, FC, FC, FS)

    n_lags = len(capbuf) - 136
    assert res.n_comb_xc == (n_lags - 100) // 9600
    assert res.n_comb_sp == (len(capbuf) - 136 - 137) // 9600

    # Brute-force a handful of (t, foi, idx) fold cells end to end.
    tm = pss_templates(f_set, FC, FC, FS)
    starts = combine_start_indices(f_set, FC, FC, FS, res.n_comb_xc)
    rng = np.random.default_rng(0)
    for _ in range(6):
        t = rng.integers(0, 3)
        foi = rng.integers(0, 3)
        idx = int(rng.integers(0, 9600))
        acc = 0.0
        for m in range(res.n_comb_xc):
            lag = idx + starts[foi, m]
            xc = np.dot(tm[t, foi], capbuf[lag: lag + 137])
            acc += abs(xc) ** 2
        acc /= res.n_comb_xc
        got = res.xc_incoherent_single[t, foi, idx]
        assert abs(got - acc) < 1e-10, (t, foi, idx)

    # Delay-spread combining: +-2 cyclic mean
    xs = res.xc_incoherent_single
    man = (xs + np.roll(xs, 1, -1) + np.roll(xs, -1, -1)
           + np.roll(xs, 2, -1) + np.roll(xs, -2, -1)) / 5
    assert np.allclose(res.xc_incoherent, man, atol=1e-12)

    # Collapse is an exact max/argmax over the hypothesis axis
    assert np.allclose(res.xc_incoherent_collapsed_pow,
                       res.xc_incoherent.max(axis=1))


def test_sp_est_against_bruteforce(xcorr_capture):
    capbuf = xcorr_capture
    res = xcorr_pss(capbuf, np.array([40e3]), 2, FC, FC, FS)
    p = np.abs(capbuf) ** 2
    n_sp = res.n_comb_sp * 9600
    sp = np.convolve(p, np.ones(274) / 274, mode="valid")[:n_sp]
    assert np.allclose(res.sp, sp, atol=1e-12)
    fold = sp.reshape(res.n_comb_sp, 9600).mean(axis=0)
    assert np.allclose(res.sp_incoherent, np.roll(fold, 137), atol=1e-12)


def test_strongest_cell_found_in_xcorr_capture(xcorr_capture):
    """The 70.5 ms capture contains cell 277's PSS at 40 kHz offset."""
    f_set = np.arange(35e3, 45e3 + 1, 5e3)
    res = xcorr_pss(xcorr_capture, f_set, 2, FC, FC, FS)
    t, idx = np.unravel_index(res.xc_incoherent_collapsed_pow.argmax(),
                              (3, 9600))
    assert t == 1  # n_id_2 = 1
    assert f_set[res.xc_incoherent_collapsed_frq[t, idx]] == 40e3


def test_pallas_kernel_matches_xla_dot_path():
    """The hand-written block-Toeplitz Pallas kernel (ops/corr_pallas.py)
    must reproduce |correlate|^2 from the production XLA dot path; run
    through the Pallas interpreter so the parity holds on CPU CI."""
    import jax.numpy as jnp
    from lte_cell_scanner_tpu.ops.corr import correlate
    from lte_cell_scanner_tpu.ops.corr_pallas import correlate_pow_pallas

    rng = np.random.default_rng(3)
    n_cap = 4096 + 136
    capbuf = (rng.normal(size=n_cap) + 1j * rng.normal(size=n_cap)) \
        .astype(np.complex64)
    tmpl = (rng.normal(size=(5, 137)) + 1j * rng.normal(size=(5, 137))) \
        .astype(np.complex64) / 137.0
    n_lags = n_cap - 136

    want = np.abs(np.asarray(correlate(jnp.asarray(capbuf),
                                       jnp.asarray(tmpl)))) ** 2
    got = np.asarray(correlate_pow_pallas(jnp.asarray(capbuf), tmpl,
                                          n_lags, interpret=True))
    assert got.shape == (5, n_lags)
    assert np.allclose(got, want[:, :n_lags], atol=1e-3, rtol=1e-3)


def test_bf16_mxu_precision_is_safe_for_detection():
    """The production TPU path computes the correlation at the MXU's
    default bf16 input precision (f32 accumulation).  Emulate that on
    CPU by rounding inputs+templates to bfloat16: 8-bit-ADC capture
    samples are bf16-EXACT by construction, template rounding must
    perturb the collapsed power map <0.2% and flip no argmax decision
    on the real two-cell capture."""
    import jax.numpy as jnp
    from lte_cell_scanner_tpu.constants import FS_LTE
    from lte_cell_scanner_tpu.models.search import default_f_search_set
    from lte_cell_scanner_tpu.models.xcorr import (_xcorr_core,
                                                   combine_start_indices,
                                                   pss_templates)
    from lte_cell_scanner_tpu.utils import read_itfile

    fs = FS_LTE / 16
    fc = 739e6
    capbuf = np.asarray(
        read_itfile("/root/reference/test/capbuf_0000.it")["capbuf"],
        dtype=np.complex64)
    f_set = default_f_search_set(fc, ppm=100)
    n_comb = (len(capbuf) - 136 - 100) // 9600

    def bf16c(x):
        x = np.asarray(x)
        r = np.asarray(jnp.asarray(x.real, jnp.float32)
                       .astype(jnp.bfloat16).astype(jnp.float32))
        i = np.asarray(jnp.asarray(x.imag, jnp.float32)
                       .astype(jnp.bfloat16).astype(jnp.float32))
        return (r + 1j * i).astype(np.complex64)

    assert np.array_equal(bf16c(capbuf), capbuf), \
        "8-bit ADC samples must be bf16-exact"

    tm = pss_templates(f_set, fc, fc, fs, np.complex64)
    si = jnp.asarray(combine_start_indices(f_set, fc, fc, fs, n_comb))
    ref = _xcorr_core(jnp.asarray(capbuf), jnp.asarray(tm), si, 2,
                      keep_xc=False)
    emu = _xcorr_core(jnp.asarray(capbuf), jnp.asarray(bf16c(tm)), si, 2,
                      keep_xc=False)
    a = np.asarray(emu[2])
    b = np.asarray(ref[2])
    assert np.max(np.abs(a - b)) / b.max() < 2e-3
    assert np.array_equal(a.argmax(1), b.argmax(1))


def test_pallas_kernel_bf16_mode_interpret():
    """The bf16-band Pallas mode (MXU-native single pass on hardware)
    stays within detection-grade tolerance of the f32 kernel; run via
    the interpreter so the code path is exercised on CPU CI."""
    import jax.numpy as jnp
    from lte_cell_scanner_tpu.ops.corr import correlate
    from lte_cell_scanner_tpu.ops.corr_pallas import correlate_pow_pallas

    rng = np.random.default_rng(9)
    n_cap = 4096 + 136
    capbuf = (rng.normal(size=n_cap) + 1j * rng.normal(size=n_cap)) \
        .astype(np.complex64)
    tmpl = (rng.normal(size=(5, 137)) + 1j * rng.normal(size=(5, 137))) \
        .astype(np.complex64) / 137.0
    n_lags = n_cap - 136

    want = np.abs(np.asarray(correlate(jnp.asarray(capbuf),
                                       jnp.asarray(tmpl)))) ** 2
    got = np.asarray(correlate_pow_pallas(jnp.asarray(capbuf), tmpl,
                                          n_lags, interpret=True,
                                          precision="bf16"))
    scale = want.max()
    # bf16 mantissa ~ 8 bits: ~0.4% relative on the operands; the
    # 137-tap f32 accumulation keeps the power map within ~1%
    assert np.max(np.abs(got - want[:, :n_lags])) / scale < 2e-2
    # and the per-template argmax (what detection consumes) is stable
    np.testing.assert_array_equal(got.argmax(axis=1),
                                  want[:, :n_lags].argmax(axis=1))


def test_xcorr_core_pallas_backend_matches_xla():
    """The pallas-backed front end (the TPU production correlation
    route) reproduces the XLA path's fold/collapse outputs; interpreted
    on CPU, tiny capture."""
    import jax.numpy as jnp
    from lte_cell_scanner_tpu.constants import FS_LTE
    from lte_cell_scanner_tpu.models.xcorr import (_xcorr_core,
                                                   combine_start_indices,
                                                   pss_templates)
    from lte_cell_scanner_tpu.ops.corr_pallas import bands_for_templates

    fs = FS_LTE / 16
    fc = 739e6
    rng = np.random.default_rng(21)
    n_cap = 2 * 9600 + 400
    capbuf = (rng.normal(size=n_cap) + 1j * rng.normal(size=n_cap)) \
        .astype(np.complex64) * 0.1
    f_set = np.array([-5e3, 0.0, 5e3])
    tmpl = pss_templates(f_set, fc, fc, fs, np.complex64)
    n_comb = (n_cap - 136 - 100) // 9600
    starts = jnp.asarray(combine_start_indices(f_set, fc, fc, fs, n_comb))
    cap_d = jnp.asarray(capbuf)
    tmpl_d = jnp.asarray(tmpl)

    base = _xcorr_core(cap_d, tmpl_d, starts, 2, False, True)
    g_re, g_im = bands_for_templates(tmpl, precision="f32")
    pal = _xcorr_core(cap_d, tmpl_d, starts, 2, False, True, g_re, g_im)

    # pow map, sp fold, refinement slab all agree (f32 bands: exact-ish)
    np.testing.assert_allclose(np.asarray(pal[2]), np.asarray(base[2]),
                               rtol=2e-4, atol=1e-9)
    np.testing.assert_allclose(np.asarray(pal[5]), np.asarray(base[5]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pal[7]), np.asarray(base[7]),
                               rtol=2e-4, atol=1e-9)
    # argmax decisions identical
    np.testing.assert_array_equal(np.asarray(pal[3]), np.asarray(base[3]))


def test_xcorr_core_v2_production_backend_matches_xla():
    """The v2/v3 im2col kernel (the CURRENT production TPU correlation
    route: single band array, K=256 span, bf16 power output folded in
    f32) reproduces the XLA path's fold/collapse outputs; interpreted on
    CPU, tiny capture."""
    import jax.numpy as jnp
    from lte_cell_scanner_tpu.constants import FS_LTE
    from lte_cell_scanner_tpu.models.xcorr import (_xcorr_core,
                                                   combine_start_indices,
                                                   pss_templates)
    from lte_cell_scanner_tpu.ops.corr_pallas import \
        prod_bands_for_templates

    fs = FS_LTE / 16
    fc = 739e6
    rng = np.random.default_rng(22)
    n_cap = 2 * 9600 + 400
    capbuf = (rng.normal(size=n_cap) + 1j * rng.normal(size=n_cap)) \
        .astype(np.complex64) * 0.1
    f_set = np.array([-5e3, 0.0, 5e3])
    tmpl = pss_templates(f_set, fc, fc, fs, np.complex64)
    n_comb = (n_cap - 136 - 100) // 9600
    starts = jnp.asarray(combine_start_indices(f_set, fc, fc, fs, n_comb))
    cap_d = jnp.asarray(capbuf)
    tmpl_d = jnp.asarray(tmpl)

    base = _xcorr_core(cap_d, tmpl_d, starts, 2, False, True)
    g = prod_bands_for_templates(tmpl.reshape(-1, 137))
    pal = _xcorr_core(cap_d, tmpl_d, starts, 2, False, True, g)

    # bf16 bands + bf16 power storage: detection-grade tolerance
    scale = float(np.max(np.asarray(base[2])))
    np.testing.assert_allclose(np.asarray(pal[2]), np.asarray(base[2]),
                               atol=2e-2 * scale)
    np.testing.assert_allclose(np.asarray(pal[5]), np.asarray(base[5]),
                               rtol=1e-6)
    # argmax decisions identical (collapsed frequency per lag) except
    # bf16-rounded near-ties on this pure-noise capture
    same = np.asarray(pal[3]) == np.asarray(base[3])
    assert same.mean() > 0.99
    # the refinement slab reads xc_single AT the collapsed argmax
    # frequency, so compare only where that argmax decision agrees
    mask = np.broadcast_to(same[:, None, :], np.asarray(base[7]).shape)
    d = np.abs(np.asarray(pal[7]) - np.asarray(base[7]))
    assert np.max(d[mask]) < 2e-2 * scale


def test_v2_kernel_long_capture_shapes():
    """The production v2 kernel's row/chunk planning handles non-default
    capture lengths (the --capture-ms long-integration axis): 160 ms
    worth of lags through interpret mode matches the XLA path."""
    import jax.numpy as jnp
    from lte_cell_scanner_tpu.constants import FS_LTE
    from lte_cell_scanner_tpu.models.xcorr import pss_templates
    from lte_cell_scanner_tpu.ops.corr_pallas import (
        bands_v2_for_templates, corr_pow_core_v2, plan_pallas_v2)
    from lte_cell_scanner_tpu.ops.corr import correlate

    fs = FS_LTE / 16
    rng = np.random.default_rng(5)
    n_cap = 3 * 9600 + 137 + 11        # deliberately awkward length
    cap = (rng.normal(size=n_cap) + 1j * rng.normal(size=n_cap)) \
        .astype(np.complex64) * 0.1
    f_set = np.array([0.0])
    tmpl = pss_templates(f_set, 739e6, 739e6, fs,
                         np.complex64).reshape(-1, 137)
    n_lags = n_cap - 136
    xc = np.asarray(correlate(jnp.asarray(cap), jnp.asarray(tmpl)))
    ref = np.abs(xc) ** 2
    g = bands_v2_for_templates(tmpl, precision="f32")
    t_pad, n_tc, n_rows, n_rb = plan_pallas_v2(tmpl.shape[0], n_lags)
    got = np.asarray(corr_pow_core_v2(
        jnp.real(cap), jnp.imag(cap), g, n_lags, tmpl.shape[0], t_pad,
        n_tc, n_rows, n_rb, interpret=True, precision="f32"))
    assert got.shape == (3, n_lags)
    assert np.max(np.abs(got - ref[:, :n_lags])) / np.max(ref) < 1e-5


def test_is_adc_grid():
    from lte_cell_scanner_tpu.ops.corr_pallas import is_adc_grid
    rng = np.random.default_rng(6)
    x = rng.integers(0, 256, size=1000)
    y = rng.integers(0, 256, size=1000)
    grid = ((x - 127) + 1j * (y - 127)) / 128.0
    assert is_adc_grid(grid)
    assert not is_adc_grid(grid + 3e-4)          # off-grid
    assert not is_adc_grid(grid * 1.5)           # out of range
    assert not is_adc_grid(rng.normal(size=100)
                           + 1j * rng.normal(size=100))
    # the saturated full-scale code (raw byte 255 -> k = +128) IS
    # admitted: real dongle captures saturate occasionally and the
    # kernel's 1-LSB clip on those samples is documented + pinned by
    # test_int8_forced_on_saturated_capture_clips_one_lsb below
    sat = grid.copy()
    sat[3] = (128 + 1j * (y[3] - 127)) / 128.0
    assert is_adc_grid(sat)


def test_int8_forced_on_saturated_capture_clips_one_lsb():
    """The int8 kernel on a capture containing the +128 code: the
    kernel clips k=+128 -> 127, so its output equals the exact integer
    correlation of the CLIPPED capture (rebuilt in numpy from the same
    quantized operands) and deviates -- by a bounded, tiny amount --
    from the unclipped golden powers.  Pins the documented clip
    semantics of the production path on saturated dongle data."""
    import jax.numpy as jnp
    from lte_cell_scanner_tpu.constants import FS_LTE
    from lte_cell_scanner_tpu.models.xcorr import pss_templates
    from lte_cell_scanner_tpu.ops.corr import correlate
    from lte_cell_scanner_tpu.ops.corr_pallas import (
        bands_v2_int8_for_templates, corr_pow_core_v2, is_adc_grid,
        plan_pallas_v2)

    fs = FS_LTE / 16
    rng = np.random.default_rng(11)
    n_cap = 9600 + 400
    x = rng.integers(0, 255, size=n_cap)
    y = rng.integers(0, 255, size=n_cap)
    x[::37] = 255                                # saturated: k = +128
    capbuf = (((x - 127) + 1j * (y - 127)) / 128.0).astype(np.complex64)

    f_set = np.array([0.0])
    tmpl = pss_templates(f_set, 739e6, 739e6, fs,
                         np.complex64).reshape(-1, 137)
    n_lags = n_cap - 136
    g_i8, scale = bands_v2_int8_for_templates(tmpl)
    t_pad, n_tc, n_rows, n_rb = plan_pallas_v2(tmpl.shape[0], n_lags)
    got = np.asarray(corr_pow_core_v2(
        jnp.real(capbuf), jnp.imag(capbuf), g_i8, n_lags, tmpl.shape[0],
        t_pad, n_tc, n_rows, n_rb, interpret=True, precision="int8"
    )).astype(np.float64) * float(scale)

    # exact integer correlation of the CLIPPED capture against the
    # band builder's quantized templates (all integers < 2^53: exact)
    kx = np.clip(np.round(capbuf.real * 128), -127, 127).astype(np.int64)
    ky = np.clip(np.round(capbuf.imag * 128), -127, 127).astype(np.int64)
    s_g = 127.0 / float(np.max(np.abs(
        np.concatenate([tmpl.real.ravel(), tmpl.imag.ravel()]))))
    tre = np.clip(np.round(tmpl.real * s_g), -127, 127).astype(np.int64)
    tim = np.clip(np.round(tmpl.imag * s_g), -127, 127).astype(np.int64)
    win_r = np.lib.stride_tricks.sliding_window_view(kx, 137)[:n_lags]
    win_i = np.lib.stride_tricks.sliding_window_view(ky, 137)[:n_lags]
    exact = np.empty((tmpl.shape[0], n_lags))
    for t in range(tmpl.shape[0]):
        re_part = win_r @ tre[t] - win_i @ tim[t]
        im_part = win_r @ tim[t] + win_i @ tre[t]
        exact[t] = (re_part.astype(np.float64) ** 2
                    + im_part.astype(np.float64) ** 2) \
            * (1.0 / (s_g * 128.0)) ** 2
    np.testing.assert_allclose(got, exact, rtol=1e-5)

    # the clip IS a real deviation from the unclipped golden powers,
    # but bounded well below the path's ~0.4% template-quantization
    # tier even with 1-in-37 samples saturated (real captures: ~1e-5
    # of samples) -- the documented trade for keeping int8 on
    # saturated strong-signal captures
    ref_unclipped = np.abs(np.asarray(correlate(
        jnp.asarray(capbuf.astype(np.complex128)),
        jnp.asarray(tmpl.astype(np.complex128))))[:, :n_lags]) ** 2
    dev = np.abs(got - ref_unclipped) / ref_unclipped.max()
    assert dev.max() > 0
    assert dev.max() < 2e-2
    # auto-routing keeps int8 for saturated dongle captures
    assert is_adc_grid(capbuf)


def test_xcorr_pss_int8_path_matches_xla_on_grid_capture():
    """An 8-bit-ADC-grid capture automatically takes the exact int8
    production dot (interpret mode on CPU); detection outputs must
    match the XLA path at the int8-template-quantization tolerance."""
    from lte_cell_scanner_tpu.constants import FS_LTE

    fs = FS_LTE / 16
    fc = 739e6
    rng = np.random.default_rng(7)
    n_cap = 2 * 9600 + 400
    x = rng.integers(0, 256, size=n_cap)
    y = rng.integers(0, 256, size=n_cap)
    capbuf = (((x - 127) + 1j * (y - 127)) / 128.0).astype(np.complex64)
    f_set = np.array([-5e3, 0.0, 5e3])

    ref = xcorr_pss(capbuf, f_set, 2, fc, fc, fs, lean=True,
                    corr_backend="xla")
    i8 = xcorr_pss(capbuf, f_set, 2, fc, fc, fs, lean=True,
                   corr_backend="pallas")
    a = np.asarray(i8.xc_incoherent_collapsed_pow)
    b = np.asarray(ref.xc_incoherent_collapsed_pow)
    scale = b.max()
    # int8 template quantization ~0.4% + bf16 power storage ~0.4%
    assert np.max(np.abs(a - b)) < 2e-2 * scale
    same = np.asarray(i8.xc_incoherent_collapsed_frq) == \
        np.asarray(ref.xc_incoherent_collapsed_frq)
    assert same.mean() > 0.99
    # sp_incoherent is computed from the float capture: near-exact
    np.testing.assert_allclose(np.asarray(i8.sp_incoherent),
                               np.asarray(ref.sp_incoherent), rtol=1e-6)


# ---------------------------------------------------------------------------
# v4 fused-fold kernel (correlation + k_factor fold in one Pallas program)
# ---------------------------------------------------------------------------

def test_v4_fused_fold_matches_xla_fold():
    """Interpret-mode parity of the v4 kernel against the reference
    formulation: full |corr|^2 lag map folded with the exact per-period
    start indices (searcher.cpp:263-308 semantics).  Single carrier, so
    the baked delta table IS the carrier's own -- exact parity at f32
    band precision."""
    import jax.numpy as jnp
    from lte_cell_scanner_tpu.models.xcorr import combine_start_indices
    from lte_cell_scanner_tpu.ops.corr import correlate
    from lte_cell_scanner_tpu.ops.corr_pallas import (
        bands_v4_for_templates, corr_fold_core_v4, delta_table,
        plan_pallas_v4, v4_applicable)

    fs = FS_LTE / 16
    fc = 739e6
    rng = np.random.default_rng(0)
    n_cap = 3 * 9600 + 400
    cap = (rng.normal(size=n_cap) + 1j * rng.normal(size=n_cap)) \
        .astype(np.complex64) * 0.1
    f_set = np.arange(-75e3, 75e3 + 1, 25e3)
    n_lags = n_cap - 136
    n_comb = (n_lags - 100) // 9600
    tmpl = pss_templates(f_set, fc, fc, fs, np.complex64)
    starts = combine_start_indices(f_set, fc, fc, fs, n_comb)
    assert v4_applicable(starts)
    d = delta_table(starts)
    assert d.min() < 0 < d.max()       # the test exercises real shifts

    T = tmpl.reshape(-1, 137)
    xc = np.asarray(correlate(jnp.asarray(cap.astype(np.complex128)),
                              jnp.asarray(T.astype(np.complex128))))
    xc2 = np.abs(xc) ** 2
    ref = np.zeros((T.shape[0], 9600))
    n_f = len(f_set)
    for t in range(T.shape[0]):
        for m in range(n_comb):
            s = starts[t % n_f, m]
            ref[t] += xc2[t, s: s + 9600]

    g = bands_v4_for_templates(T, starts, precision="f32")
    t_pad, n_tc = plan_pallas_v4(T.shape[0])
    got = np.asarray(corr_fold_core_v4(
        jnp.asarray(cap.real), jnp.asarray(cap.imag), g, n_comb,
        T.shape[0], t_pad, n_tc, interpret=True, precision="f32"))[0]
    assert np.max(np.abs(got - ref)) / ref.max() < 1e-5


def test_v4_int8_batched_matches_integer_reference():
    """Batched v4 int8 (5 carriers, c_blk=4 -> one padded block) equals
    the exact integer correlation fold rebuilt in numpy from the same
    quantized operands."""
    import jax.numpy as jnp
    from lte_cell_scanner_tpu.models.xcorr import combine_start_indices
    from lte_cell_scanner_tpu.ops.corr_pallas import (
        bands_v4_for_templates, corr_fold_core_v4, plan_pallas_v4)

    fs = FS_LTE / 16
    fc = 739e6
    rng = np.random.default_rng(1)
    n_cap = 2 * 9600 + 400
    n_c = 5
    x = rng.integers(0, 255, size=(n_c, n_cap))
    y = rng.integers(0, 255, size=(n_c, n_cap))
    caps = (((x - 127) + 1j * (y - 127)) / 128.0).astype(np.complex64)
    f_set = np.arange(-10e3, 10e3 + 1, 5e3)
    n_lags = n_cap - 136
    n_comb = (n_lags - 100) // 9600
    tmpl = pss_templates(f_set, fc, fc, fs, np.complex64).reshape(-1, 137)
    starts = combine_start_indices(f_set, fc, fc, fs, n_comb)
    n_f = len(f_set)

    s_g = 127.0 / float(np.max(np.abs(np.concatenate(
        [tmpl.real.ravel(), tmpl.imag.ravel()]))))
    tre = np.clip(np.round(tmpl.real * s_g), -127, 127).astype(np.int64)
    tim = np.clip(np.round(tmpl.imag * s_g), -127, 127).astype(np.int64)
    ref = np.zeros((n_c, tmpl.shape[0], 9600))
    for ci in range(n_c):
        kx = np.clip(np.round(caps[ci].real * 128), -127, 127) \
            .astype(np.int64)
        ky = np.clip(np.round(caps[ci].imag * 128), -127, 127) \
            .astype(np.int64)
        wr = np.lib.stride_tricks.sliding_window_view(kx, 137)[:n_lags]
        wi = np.lib.stride_tricks.sliding_window_view(ky, 137)[:n_lags]
        for t in range(tmpl.shape[0]):
            re = wr @ tre[t] - wi @ tim[t]
            im = wr @ tim[t] + wi @ tre[t]
            p = (re.astype(np.float64) ** 2
                 + im.astype(np.float64) ** 2) * (1.0 / (s_g * 128)) ** 2
            for m in range(n_comb):
                s = starts[t % n_f, m]
                ref[ci, t] += p[s: s + 9600]

    g_i8, scale = bands_v4_for_templates(tmpl, starts, precision="int8")
    t_pad, n_tc = plan_pallas_v4(tmpl.shape[0])
    got = np.asarray(corr_fold_core_v4(
        jnp.asarray(caps.real), jnp.asarray(caps.imag), g_i8, n_comb,
        tmpl.shape[0], t_pad, n_tc, c_blk=4, interpret=True,
        precision="int8")).astype(np.float64) * float(scale)
    assert np.max(np.abs(got - ref)) / ref.max() < 1e-6


def test_v4_gate_and_mid_delta_deviation():
    """The v4 gate: the default 80 ms / 100 ppm grid fits the kernel
    window and picks the v4 band format; a 160 ms / 200 ppm grid does
    not and falls back to v2.  And the shared-mid-carrier delta
    approximation of a 10 MHz band deviates by at most 1 sample from
    any carrier's exact fold starts."""
    from lte_cell_scanner_tpu.models.search import (SearchConfig,
                                                    default_f_search_set)
    from lte_cell_scanner_tpu.models.xcorr import combine_start_indices
    from lte_cell_scanner_tpu.ops.corr_pallas import v4_applicable
    from lte_cell_scanner_tpu.parallel.carriers import _plan_scan_bands

    fs = FS_LTE / 16
    fc = 739e6
    f100 = default_f_search_set(fc, 100.0)
    n_comb_80 = (153600 - 136 - 100) // 9600
    s100 = combine_start_indices(f100, fc, fc, fs, n_comb_80)
    assert v4_applicable(s100)

    f200 = default_f_search_set(fc, 200.0)
    n_comb_160 = (2 * 153600 - 136 - 100) // 9600
    s200 = combine_start_indices(f200, fc, fc, fs, n_comb_160)
    assert not v4_applicable(s200)

    # format routing through the production band planner
    cfg = SearchConfig(corr_backend="pallas")
    cap = np.zeros(153600, np.complex64)
    tmpl = np.stack([pss_templates(f100, f, f, fs, np.complex64)
                     for f in (fc, fc + 1e5)])
    starts = np.stack([combine_start_indices(f100, f, f, fs, n_comb_80)
                       for f in (fc, fc + 1e5)])
    bands = _plan_scan_bands(tmpl, starts, [cap, cap], cfg)
    assert bands[0].shape[0] == n_comb_80 * 512      # v4 format

    tmpl2 = np.stack([pss_templates(f200, f, f, fs, np.complex64)
                      for f in (fc, fc + 1e5)])
    starts2 = np.stack([combine_start_indices(f200, f, f, fs,
                                              n_comb_160)
                        for f in (fc, fc + 1e5)])
    cap2 = np.zeros(2 * 153600, np.complex64)
    bands2 = _plan_scan_bands(tmpl2, starts2, [cap2, cap2], cfg)
    # round 5: the 160 ms / 200 ppm grid no longer falls back to v2 --
    # it routes to the WIDE v4 window (K=384, delta in [-84, +84])
    assert bands2[0].shape[0] == n_comb_160 * 2 * 384

    # a grid beyond even the wide window still falls back to v2
    f300 = default_f_search_set(fc, 300.0)
    n_comb_320 = (4 * 153600 - 136 - 100) // 9600
    tmpl3 = np.stack([pss_templates(f300, f, f, fs, np.complex64)
                      for f in (fc, fc + 1e5)])
    starts3 = np.stack([combine_start_indices(f300, f, f, fs,
                                              n_comb_320)
                        for f in (fc, fc + 1e5)])
    cap3 = np.zeros(4 * 153600, np.complex64)
    bands3 = _plan_scan_bands(tmpl3, starts3, [cap3, cap3], cfg)
    assert bands3[0].shape[0] == 512                 # v2 fallback

    # shared-mid delta deviation across a 10 MHz band
    fcs = np.arange(739e6, 749e6 + 1, 1e6)
    tables = np.stack([combine_start_indices(f100, f, f, fs, n_comb_80)
                       for f in fcs])
    mid = tables[len(fcs) // 2]
    assert np.max(np.abs(tables - mid[None])) <= 1


def test_v4_wide_window_matches_xla_fold():
    """The K=384 wide v4 variant (long-capture window, delta in
    [-84, +84]): interpret-mode parity against the exact per-period
    XLA fold on a delta table far outside the default +-20 window, and
    the kv router picks 384 for a genuine 160 ms / 200 ppm grid."""
    import jax.numpy as jnp
    from lte_cell_scanner_tpu.models.search import default_f_search_set
    from lte_cell_scanner_tpu.models.xcorr import combine_start_indices
    from lte_cell_scanner_tpu.ops.corr import correlate
    from lte_cell_scanner_tpu.ops.corr_pallas import (
        KV_V4_WIDE, bands_v4_for_templates, corr_fold_core_v4,
        plan_pallas_v4, v4_kv_for)

    fs = FS_LTE / 16
    fc = 739e6
    # the documented long-capture case routes to the wide window
    f200 = default_f_search_set(fc, 200.0)
    n_comb_160 = (2 * 153600 - 136 - 100) // 9600
    s200 = combine_start_indices(f200, fc, fc, fs, n_comb_160)
    assert v4_kv_for(s200) == KV_V4_WIDE

    # kernel parity on a compact capture with SYNTHETIC deltas spanning
    # +-60 (outside the 256 window, inside 384)
    rng = np.random.default_rng(5)
    n_cap = 3 * 9600 + 400
    cap = (rng.normal(size=n_cap) + 1j * rng.normal(size=n_cap)) \
        .astype(np.complex64) * 0.1
    f_set = np.arange(-10e3, 10e3 + 1, 5e3)
    n_f = len(f_set)
    n_lags = n_cap - 136
    n_comb = (n_lags - 100) // 9600
    tmpl = pss_templates(f_set, fc, fc, fs, np.complex64).reshape(-1, 137)
    deltas = rng.integers(-60, 61, size=(n_f, n_comb))
    deltas[:, 0] = 0      # as in reality: delta(t, 0) = round(0*k) = 0
    starts = (9600 * np.arange(n_comb)[None, :] + deltas).astype(np.int64)
    assert v4_kv_for(starts) == KV_V4_WIDE

    xc = np.asarray(correlate(jnp.asarray(cap.astype(np.complex128)),
                              jnp.asarray(tmpl.astype(np.complex128))))
    xc2 = np.abs(xc) ** 2
    ref = np.zeros((tmpl.shape[0], 9600))
    for t in range(tmpl.shape[0]):
        for m in range(n_comb):
            s = starts[t % n_f, m]
            ref[t] += xc2[t, s: s + 9600]

    g = bands_v4_for_templates(tmpl, starts, precision="f32")
    assert g.shape[0] == n_comb * 2 * KV_V4_WIDE     # wide format
    t_pad, n_tc = plan_pallas_v4(tmpl.shape[0])
    got = np.asarray(corr_fold_core_v4(
        jnp.asarray(cap.real), jnp.asarray(cap.imag), g, n_comb,
        tmpl.shape[0], t_pad, n_tc, interpret=True, precision="f32"))[0]
    assert np.max(np.abs(got - ref)) / ref.max() < 1e-5
