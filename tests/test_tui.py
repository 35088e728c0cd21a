"""Interactive dashboard key dispatch + screen rendering (tracker/tui.py)
against the reference key map (display_thread.cpp:763-830)."""

import numpy as np

from lte_cell_scanner_tpu.tracker.tui import (N_DETAILS, TuiState,
                                              handle_key, render_screen)
from lte_cell_scanner_tpu.tracker.state import GlobalState, TrackedCell


def k(state, key, n=3):
    if isinstance(key, str):
        key = ord(key)
    return handle_key(state, key, n)


def test_quit_keys():
    for key in "qQ":
        _, quit_ = k(TuiState(), key)
        assert quit_


def test_refresh_and_rate():
    s = TuiState()
    s, _ = k(s, "r")
    assert not s.auto_refresh
    s, _ = k(s, "r")
    assert s.auto_refresh
    s, _ = k(s, "-")
    assert s.refresh_delay_sec == 1.5
    for _ in range(20):
        s, _ = k(s, "-")
    assert s.refresh_delay_sec == 15.0          # clamp (reference MIN 15)
    for _ in range(40):
        s, _ = k(s, "+")
    assert s.refresh_delay_sec >= 0.001         # clamp (reference MAX .001)


def test_toggles():
    s = TuiState()
    s, _ = k(s, "f")
    assert s.fifo_status
    s, _ = k(s, "a")
    assert not s.avg_values


def test_cell_selection_bounds():
    s = TuiState()
    s, _ = k(s, "j")
    s, _ = k(s, "j")
    assert s.highlight == 2
    s, _ = k(s, "j")                            # at last cell of 3
    assert s.highlight == 2
    for _ in range(5):
        s, _ = k(s, "k")
    assert s.highlight == 0


def test_detail_mode_cycle():
    s = TuiState()
    s, _ = k(s, "l")
    assert s.mode == "detail" and s.detail_type == 0
    for _ in range(10):
        s, _ = k(s, "l")
    assert s.detail_type == N_DETAILS - 1       # clamp
    s, _ = k(s, 260)                            # KEY_LEFT: back one
    assert s.detail_type == N_DETAILS - 2
    s, _ = k(s, 27)                             # ESC: straight to std
    assert s.mode == "std"
    s, _ = k(s, "l")
    s, _ = k(s, 260)                            # left at detail 0 -> std
    assert s.mode == "std"


def test_no_key_noop():
    s = TuiState()
    s2, quit_ = handle_key(s, -1, 3)
    assert s2 == s and not quit_


def _cell(n_id=277):
    from lte_cell_scanner_tpu.cell import CpType
    return TrackedCell(n_id_cell=n_id, n_id_1=n_id // 3, n_id_2=n_id % 3,
                       cp_type=CpType.NORMAL, n_ports=2,
                       frame_timing=100.0)


def test_render_screen_std_and_detail():
    gs = GlobalState(fc_requested=739e6, fc_programmed=739e6,
                     fs_programmed=1.92e6)
    cells = [_cell(277), _cell(271)]
    tui = TuiState(highlight=1, fifo_status=True)
    text = render_screen(tui, gs, cells)
    assert "q quit" in text
    lines = [ln for ln in text.splitlines() if "Cell " in ln]
    assert lines[0].startswith(" ") and lines[1].startswith(">")
    assert "[fifo" in lines[1]
    # detail mode renders the selected cell's plot page
    tui = TuiState(mode="detail", detail_type=2, highlight=0)
    text = render_screen(tui, gs, cells)
    assert "detail 3/4" in text
    assert "ac_fd" in text
