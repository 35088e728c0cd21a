"""Float-boundary jit (ops/boundary.py): the complex<->planar transform
that keeps complex buffers off the host<->device edge (required by the
axon TPU client, exact everywhere).

Parity strategy: run the same entry points with LTE_TPU_FLOAT_BOUNDARY
forced "always" vs "never" on CPU.  The transform itself is exact (a
complex array IS its two float planes), but XLA's instruction selection
(fma contraction in the complex multiply lowering) may differ between
the two parameter layouts, so float outputs are compared at ULP-level
tolerance; discrete decisions (cell ID, MIB fields) must be identical.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from lte_cell_scanner_tpu.ops.boundary import (ComplexPair, device_complex,
                                               needs_float_boundary,
                                               safe_jit)


@pytest.fixture
def boundary_always(monkeypatch):
    monkeypatch.setenv("LTE_TPU_FLOAT_BOUNDARY", "always")
    yield


def test_mode_env(monkeypatch):
    monkeypatch.setenv("LTE_TPU_FLOAT_BOUNDARY", "always")
    assert needs_float_boundary()
    monkeypatch.setenv("LTE_TPU_FLOAT_BOUNDARY", "never")
    assert not needs_float_boundary()


def test_toy_parity_and_statics(boundary_always):
    def toy(a, b, scale: int, conj: bool = False):
        y = a * (jnp.conj(b) if conj else b)
        return jnp.abs(y) * scale, y

    f = safe_jit(toy, static_argnames=("scale", "conj"))
    rng = np.random.default_rng(0)
    a = rng.normal(size=16) + 1j * rng.normal(size=16)
    b = rng.normal(size=16) + 1j * rng.normal(size=16)
    m, y = f(a, b, 3, conj=True)
    os.environ["LTE_TPU_FLOAT_BOUNDARY"] = "never"
    m_ref, y_ref = f(a, b, 3, conj=True)
    os.environ["LTE_TPU_FLOAT_BOUNDARY"] = "always"
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), rtol=1e-14)
    np.testing.assert_allclose(y, np.asarray(y_ref), rtol=1e-14)
    np.testing.assert_allclose(y, a * np.conj(b), rtol=1e-14)
    # pre-split device pair takes the same path (bit-identical program)
    m2, y2 = f(device_complex(a), b, 3, conj=True)
    np.testing.assert_array_equal(y2, y)
    # positional static, real-only args
    g = safe_jit(lambda v, n: v * n, static_argnames=("n",))
    np.testing.assert_array_equal(np.asarray(g(np.arange(4.0), 2)),
                                  np.arange(4.0) * 2)


def test_device_complex_forms(boundary_always):
    x = np.arange(6, dtype=np.complex128) * (1 + 2j)
    p = device_complex(x)
    assert isinstance(p, ComplexPair)
    assert p.shape == (6,) and len(p) == 6
    assert p.dtype == np.complex128
    assert device_complex(p) is p
    # real arrays pass through as plain device arrays
    r = device_complex(np.arange(6.0))
    assert not isinstance(r, ComplexPair)


def test_device_resident_complex_rejected(boundary_always):
    f = safe_jit(lambda v: jnp.abs(v))
    dev = jnp.asarray(np.ones(4, np.complex128))
    with pytest.raises(TypeError, match="device_complex"):
        f(dev)


def test_pipeline_stage_parity(monkeypatch):
    """sss_detect_batch + pss_sss_foe_batch + fused decode must agree
    under the forced boundary: identical discrete decisions, ULP-level
    float agreement."""
    from lte_cell_scanner_tpu.cell import CpType
    from lte_cell_scanner_tpu.constants import FS_WORK
    from lte_cell_scanner_tpu.models.search import SearchConfig, refine_peaks
    from lte_cell_scanner_tpu.sim import awgn, create_dl_sig

    rng = np.random.default_rng(7)
    sig = awgn(create_dl_sig(CpType.NORMAL, 80, 0, 92, 1, 0.5, rng=rng,
                             n_ports=2), 10.0, rng=rng)
    fc = 739e6
    from lte_cell_scanner_tpu.models.xcorr import xcorr_pss
    from lte_cell_scanner_tpu.models.peaks import peak_search
    from lte_cell_scanner_tpu.models.search import compute_z_th1

    def run():
        res = xcorr_pss(sig, np.array([0.0]), 2, fc, fc, FS_WORK)
        z = compute_z_th1(res.sp_incoherent, res.n_comb_xc)
        peaks = peak_search(res.xc_incoherent_collapsed_pow,
                            res.xc_incoherent_collapsed_frq, z,
                            np.array([0.0]), fc, fc,
                            res.xc_incoherent_single, 2)
        return refine_peaks(peaks, sig, fc, fc, FS_WORK, SearchConfig())

    monkeypatch.setenv("LTE_TPU_FLOAT_BOUNDARY", "never")
    base = run()
    monkeypatch.setenv("LTE_TPU_FLOAT_BOUNDARY", "always")
    split = run()
    assert [c.n_id_cell() for c in base] == [c.n_id_cell() for c in split]
    for b, s in zip(base, split):
        assert b.n_rb_dl == s.n_rb_dl
        assert b.sfn == s.sfn
        np.testing.assert_allclose(b.freq_superfine, s.freq_superfine,
                                   rtol=1e-9)


def test_front_batch_boundary_parity(monkeypatch):
    """The single-chip multi-carrier front end (_front_batch, the axon
    wide-band path) matches the unsplit vmapped core under the forced
    boundary."""
    from lte_cell_scanner_tpu.constants import FS_WORK
    from lte_cell_scanner_tpu.parallel.carriers import (_front_batch,
                                                        plan_carrier_inputs)

    rng = np.random.default_rng(3)
    n_cap = 2 * 9600 + 400
    caps = [(rng.normal(size=n_cap) + 1j * rng.normal(size=n_cap)) * 0.1
            for _ in range(2)]
    fcs = [739e6, 739.1e6]
    f_set = np.array([-5e3, 0.0, 5e3])
    cap, tmpl, starts, _, _ = plan_carrier_inputs(
        caps, fcs, f_set, fcs, FS_WORK, 1, dtype=np.complex64)

    monkeypatch.setenv("LTE_TPU_FLOAT_BOUNDARY", "never")
    base = _front_batch(cap, tmpl, starts, 2)
    monkeypatch.setenv("LTE_TPU_FLOAT_BOUNDARY", "always")
    split = _front_batch(cap, tmpl, starts, 2)
    for b, s in zip(base, split):
        np.testing.assert_allclose(np.asarray(b), np.asarray(s),
                                   rtol=1e-6, atol=1e-12)


def test_get_fd_core_boundary_parity(monkeypatch):
    """The tracker's batched demod front end crosses the boundary
    losslessly (the TPU tracker deployment path)."""
    from lte_cell_scanner_tpu.tracker.batched import _get_fd_core

    rng = np.random.default_rng(5)
    B, S = 3, 16
    data = (rng.normal(size=(B, S, 128))
            + 1j * rng.normal(size=(B, S, 128))).astype(np.complex128)
    fo = np.full((B, S), -2050.0)
    late = np.zeros((B, S))
    nse = np.full((B, S), 137.0)
    valid = np.ones((B, S), bool)
    phase = np.linspace(-1, 1, B)
    args = (data, fo, late, nse, valid, phase, np.float64(739e6),
            np.float64(739e6), np.float64(1.92e6))

    monkeypatch.setenv("LTE_TPU_FLOAT_BOUNDARY", "never")
    base = _get_fd_core(*args)
    monkeypatch.setenv("LTE_TPU_FLOAT_BOUNDARY", "always")
    split = _get_fd_core(*args)
    np.testing.assert_allclose(np.asarray(base[0]), np.asarray(split[0]),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(base[1]), np.asarray(split[1]),
                               rtol=1e-12)
