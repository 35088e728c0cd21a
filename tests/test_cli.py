"""CLI-level tests: argv -> main() end-to-end (reference CellSearch
getopt semantics, src/CellSearch.cpp:92-280 + second-order validation
:222-262)."""

import numpy as np
import pytest

from lte_cell_scanner_tpu.cli import main


def test_validation_errors(capsys):
    # start frequency under 1 MHz
    assert main(["search", "-s", "500e3", "--sim"]) == 1
    assert "greater than 1MHz" in capsys.readouterr().out
    # end < start
    assert main(["search", "-s", "739e6", "-e", "738e6", "--sim"]) == 1
    assert "end frequency" in capsys.readouterr().out
    # negative ppm
    assert main(["search", "-s", "739e6", "--sim", "-p", "-5"]) == 1
    assert "ppm value must be positive" in capsys.readouterr().out
    # record + load exclusive
    assert main(["search", "-s", "739e6", "-r", "-l"]) == 1
    assert "cannot both record and load" in capsys.readouterr().out


def test_validation_warnings(capsys, tmp_path):
    rc = main(["--platform", "cpu", "search", "-s", "739e6", "--sim",
               "-p", "250", "-c", "1.01", "--no-decode", "-b",
               "--capture-ms", "80"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "unreasonably high" in out
    assert "unreasonable" in out


def test_sim_search_decodes_cell(capsys):
    rc = main(["--platform", "cpu", "search", "-s", "739e6", "--sim",
               "-p", "10", "-b"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "277 2" in out            # cell ID + 2 ports in the table
    assert " N   6 N one" in out     # normal CP, 6 RB, PHICH normal/one


def test_no_decode_skips_mib(capsys):
    rc = main(["--platform", "cpu", "search", "-s", "739e6", "--sim",
               "-p", "10", "-b", "--no-decode"])
    out = capsys.readouterr().out
    assert rc == 0
    # the detection is listed with its fine-FOE offset, but no MIB
    # fields (nRB -1, unknown PHICH)
    assert "277" in out
    assert " -1 U UNK" in out


def test_search_config_flags_roundtrip(capsys):
    # the alternative interpolator + golden compat + low threshold must
    # still decode the sim cell end-to-end
    rc = main(["--platform", "cpu", "search", "-s", "739e6", "--sim",
               "-p", "10", "-b", "--interp", "freq_time",
               "--thresh2-sigma", "2.5"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "277 2" in out


def test_record_then_load_session_numbering(tmp_path, capsys):
    """Two scans in one process: recording writes capbuf_0000/0001.it,
    and a subsequent --load run replays from 0000 again (run-scoped
    numbering, reference capbuf.cpp:94)."""
    d = str(tmp_path)
    rc = main(["--platform", "cpu", "search", "-s", "739e6",
               "-e", "739.1e6", "--sim", "-p", "10", "-b", "-r",
               "-d", d, "--no-shard-carriers"])
    assert rc == 0
    assert (tmp_path / "capbuf_0000.it").exists()
    assert (tmp_path / "capbuf_0001.it").exists()
    capsys.readouterr()
    rc = main(["--platform", "cpu", "search", "-s", "739e6",
               "-e", "739.1e6", "-l", "-d", d, "-p", "10", "-b",
               "--no-shard-carriers"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "277 2" in out


def test_missing_capture_file_clean_error(tmp_path, capsys):
    rc = main(["--platform", "cpu", "search", "-s", "739e6", "-l",
               "-d", str(tmp_path), "-b"])
    assert rc == 1
    assert "file not found" in capsys.readouterr().err
