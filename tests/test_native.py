"""Native ingest runtime tests (C++ library vs numpy semantics)."""

import numpy as np
import pytest

from lte_cell_scanner_tpu.io import native


@pytest.fixture(scope="module")
def lib():
    if native.get_lib() is None:
        pytest.skip("native library could not be built")
    return native.get_lib()


def test_iq_conversion_matches_reference_grid(lib):
    raw = np.arange(256, dtype=np.uint8)
    out = native.iq_u8_to_c64(raw)
    expect_re = (raw[0::2].astype(np.float64) - 127.0) / 128.0
    expect_im = (raw[1::2].astype(np.float64) - 127.0) / 128.0
    assert np.allclose(out.real, expect_re)
    assert np.allclose(out.imag, expect_im)


def test_ring_roundtrip_and_wrap(lib):
    ring = native.SampleRing(1 << 12)  # 4096
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 3000).astype(np.uint8)
    assert ring.push(data) == 3000
    assert ring.size() == 3000
    got = ring.pop(1000)
    assert np.array_equal(got, data[:1000])
    # wrap-around: push more than remaining linear space
    data2 = rng.integers(0, 256, 2000).astype(np.uint8)
    assert ring.push(data2) == 2000
    got = ring.pop(4000)
    assert np.array_equal(got, np.concatenate([data[1000:], data2]))


def test_ring_overflow_and_drop(lib):
    ring = native.SampleRing(1 << 10)  # 1024
    data = np.zeros(2000, dtype=np.uint8)
    pushed = ring.push(data)
    assert pushed == 1024       # partial write when full
    assert ring.drop(512) == 512
    assert ring.size() == 512
