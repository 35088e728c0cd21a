"""Unit tests for channel coding, rate matching, CRC, and modulation."""

import numpy as np
import jax.numpy as jnp

from lte_cell_scanner_tpu.models.coding import (
    conv_encode, conv_decode_tailbite, conv_ratematch, conv_deratematch,
    crc_parity, crc_matrix, ratematch_map)
from lte_cell_scanner_tpu.models.modulation import (
    lte_modulate, lte_demodulate, mod_map)


def test_conv_encode_tailbiting_property():
    rng = np.random.default_rng(0)
    c = rng.integers(0, 2, 40).astype(np.uint8)
    d = conv_encode(c)
    assert d.shape == (3, 40)
    # tail-biting: encoding a cyclic shift of the input yields the same
    # cyclic shift of each output stream
    d_shift = conv_encode(np.roll(c, 5))
    assert np.array_equal(np.roll(d, 5, axis=1), d_shift)


def test_viterbi_decodes_clean_and_noisy():
    rng = np.random.default_rng(1)
    for trial in range(5):
        c = rng.integers(0, 2, 40).astype(np.uint8)
        d = conv_encode(c)
        llr = (1.0 - 2.0 * d).astype(np.float64)  # clean: +1 for 0, -1 for 1
        dec = np.asarray(conv_decode_tailbite(jnp.asarray(llr)))
        assert np.array_equal(dec, c), f"clean decode failed (trial {trial})"
        # moderate noise
        noisy = llr * 4.0 + rng.normal(0, 1.0, llr.shape)
        dec = np.asarray(conv_decode_tailbite(jnp.asarray(noisy)))
        assert np.array_equal(dec, c), f"noisy decode failed (trial {trial})"


def test_ratematch_roundtrip():
    rng = np.random.default_rng(2)
    for n_e in (120, 1920, 1728):
        c = rng.integers(0, 2, 40).astype(np.uint8)
        d = conv_encode(c)
        e = conv_ratematch(d, n_e)
        assert e.shape == (n_e,)
        llr = (1.0 - 2.0 * e).astype(np.float64)
        d_llr = np.asarray(conv_deratematch(jnp.asarray(llr), 40))
        # every coded bit is observed at least once for n_e >= 120
        assert np.array_equal(d_llr > 0, d == 0)


def test_ratematch_map_covers_all_bits():
    m = ratematch_map(40, 1920)
    seen = set(map(tuple, m))
    assert len(seen) == 120  # every (stream, bit) observed; 1920/120=16 reps


def test_crc16_linearity_and_detection():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 2, 24).astype(np.uint8)
    p = crc_parity(a, "crc16")
    assert p.shape == (16,)
    # matrix form agrees
    m = crc_matrix(24, "crc16")
    assert np.array_equal((a @ m) % 2, p)
    # single-bit error detection
    a2 = a.copy()
    a2[5] ^= 1
    assert not np.array_equal(crc_parity(a2, "crc16"), p)


def test_mod_maps_match_reference_tables():
    # First entries of the reference tables (lte_lib.cpp:559-570)
    qpsk = mod_map("qpsk")
    assert np.allclose(qpsk[:2] * np.sqrt(2), [1 + 1j, 1 - 1j])
    qam16 = mod_map("qam16")
    assert np.allclose(qam16[:4] * np.sqrt(10), [1 + 1j, 1 + 3j, 3 + 1j, 3 + 3j])
    qam64 = mod_map("qam64")
    assert np.allclose(qam64[:4] * np.sqrt(42), [3 + 3j, 3 + 1j, 1 + 3j, 1 + 1j])
    # unit average power
    for m in ("qpsk", "qam16", "qam64"):
        assert abs(np.mean(np.abs(mod_map(m)) ** 2) - 1.0) < 1e-12


def test_demodulate_qpsk_closed_form():
    rng = np.random.default_rng(4)
    bits = rng.integers(0, 2, 20)
    syms = lte_modulate(bits, "qpsk")
    np_vec = np.full(10, 0.3)
    llr = np.asarray(lte_demodulate(jnp.asarray(syms), jnp.asarray(np_vec),
                                    "qpsk"))
    # exact log-MAP for QPSK: llr = 2*sqrt(2)*Re_or_Im(sym)/np
    expect = np.stack([2 * np.sqrt(2) * syms.real / np_vec,
                       2 * np.sqrt(2) * syms.imag / np_vec], axis=1).ravel()
    assert np.allclose(llr, expect, atol=1e-9)
    assert np.array_equal(llr < 0, bits.astype(bool))


def test_demodulate_roundtrip_qam():
    rng = np.random.default_rng(5)
    for m in ("qam16", "qam64"):
        nbits = {"qam16": 4, "qam64": 6}[m] * 8
        bits = rng.integers(0, 2, nbits)
        syms = lte_modulate(bits, m)
        llr = np.asarray(lte_demodulate(jnp.asarray(syms),
                                        jnp.asarray(np.full(8, 0.01)), m))
        assert np.array_equal(llr < 0, bits.astype(bool))


def test_host_decode_chain_matches_jitted():
    """The tracker's host MIB-decode chain (numpy log-MAP demod, cached
    de-ratematch, native/numpy tail-biting Viterbi) must match the
    jitted implementations bit-for-bit on the decoded output and
    tolerance-close on the LLRs, across noise levels and both native and
    numpy Viterbi paths."""
    from lte_cell_scanner_tpu.io.native import get_lib
    from lte_cell_scanner_tpu.models.coding import (
        conv_decode_tailbite, conv_decode_tailbite_host, conv_deratematch,
        conv_deratematch_host, conv_encode, conv_ratematch)
    from lte_cell_scanner_tpu.models.modulation import (
        lte_demodulate, lte_demodulate_host, lte_modulate)

    rng = np.random.default_rng(6)
    for snr_db in (20.0, 0.0, -3.0):
        bits = rng.integers(0, 2, 40)
        d = conv_encode(bits)
        e = conv_ratematch(1.0 - 2.0 * d.astype(float), 1920)
        syms = lte_modulate((e < 0).astype(int), "qpsk")
        npow = 10 ** (-snr_db / 10)
        syms = syms + (rng.normal(size=syms.shape)
                       + 1j * rng.normal(size=syms.shape)) \
            * np.sqrt(npow / 2)
        np_vec = np.full(len(syms), npow)

        llr_host = lte_demodulate_host(syms, np_vec, "qpsk")
        llr_jit = np.asarray(lte_demodulate(jnp.asarray(syms),
                                            jnp.asarray(np_vec), "qpsk"))
        assert np.allclose(llr_host, llr_jit, rtol=1e-9, atol=1e-9)

        d_host = conv_deratematch_host(llr_host, 40)
        d_jit = np.asarray(conv_deratematch(jnp.asarray(llr_host), 40))
        assert np.allclose(d_host, d_jit, rtol=1e-9, atol=1e-9)

        out_jit = np.asarray(conv_decode_tailbite(jnp.asarray(d_host)))
        out_host = conv_decode_tailbite_host(d_host)
        assert np.array_equal(out_host, out_jit)
        if snr_db > 0:
            assert np.array_equal(out_host, bits)

    # both host Viterbi paths agree (native vs numpy fallback)
    if get_lib() is not None:
        import lte_cell_scanner_tpu.io.native as native_mod
        d_llr = rng.normal(size=(3, 40))
        a = conv_decode_tailbite_host(d_llr)
        saved = native_mod._lib
        try:
            native_mod._lib = None
            native_mod_ensure = native_mod.ensure_built
            native_mod.ensure_built = lambda *a, **k: False
            b = conv_decode_tailbite_host(d_llr)
        finally:
            native_mod.ensure_built = native_mod_ensure
            native_mod._lib = saved
        assert np.array_equal(a, b)
