"""Capture-integrity diagnostics tests (rtl_sdr_check equivalent)."""

import numpy as np

from lte_cell_scanner_tpu.cell import CpType
from lte_cell_scanner_tpu.diag import check_capture
from lte_cell_scanner_tpu.sim import awgn, create_dl_sig


def _make_sig(ms=120, seed=0):
    rng = np.random.default_rng(seed)
    sig = create_dl_sig(CpType.NORMAL, ms, 0, 92, 1, 0.3, rng=rng)
    return awgn(sig, 15.0, rng=rng)


def test_clean_capture_has_periodic_peaks():
    sig = _make_sig()
    res = check_capture(sig, 739e6, 0.0, 1.92e6, 277)
    assert len(res.peaks) >= 8          # ~11 frames, first peak consumed
    assert res.worst_drop() <= 2        # no dropped samples
    assert not res.missing


def test_wrong_cell_id_rejected():
    """Correlating the wrong cell's sync template must fail the
    peak-to-average gate instead of reporting noise peaks as drops."""
    sig = _make_sig(seed=2)
    good = check_capture(sig, 739e6, 0.0, 1.92e6, 277)
    bad = check_capture(sig, 739e6, 0.0, 1.92e6, 42)
    assert good.sync_found()
    assert not bad.sync_found()


def test_check_cli_subcommand(tmp_path):
    """`cli check` end-to-end: clean .it capture -> exit 0, wrong cell
    -> exit 1 (reference rtl_sdr_check binary surface)."""
    from lte_cell_scanner_tpu.cli import main
    from lte_cell_scanner_tpu.utils.itfile import write_itfile

    p = str(tmp_path / "cap.it")
    write_itfile(p, {"capbuf": _make_sig(ms=80, seed=3),
                     "fc": np.array([739000000])})
    assert main(["check", p, "-f", "739e6", "--cell-id", "277"]) == 0
    assert main(["check", p, "-f", "739e6", "--cell-id", "42"]) == 1


def test_dropped_samples_detected():
    sig = _make_sig(seed=1)
    # drop 50 samples mid-capture (a USB glitch)
    cut = len(sig) // 2
    sig = np.concatenate([sig[:cut], sig[cut + 50:]])
    res = check_capture(sig, 739e6, 0.0, 1.92e6, 277)
    flagged = [p for p in res.peaks if abs(p.n_dropped) >= 40]
    assert flagged, "50-sample drop not detected"
    assert any(p.severity in ("**", "***") for p in flagged)
