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


class FakeScreen:
    """Headless stand-in for a curses window: scripted key stream,
    painted text captured."""

    def __init__(self, keys):
        self._keys = list(keys)
        self.painted = []
        self.frames = 0
        self.erases = 0
        self.refreshes = 0

    def nodelay(self, flag):
        self.nodelay_set = flag

    def erase(self):
        self.erases += 1

    def getmaxyx(self):
        return (40, 120)

    def addstr(self, y, x, s):
        self.painted.append(s)

    def refresh(self):
        self.refreshes += 1

    def getch(self):
        if self._keys:
            v = self._keys.pop(0)
            return ord(v) if isinstance(v, str) else v
        return -1


def test_tui_loop_headless_quit_path():
    """The shell loop itself (erase/paint/getch dispatch/quit) executes
    headlessly: keys flow through handle_key, 'q' exits while the
    stream is still live (VERDICT r2 item 8)."""
    from lte_cell_scanner_tpu.tracker.tui import tui_loop

    gs = GlobalState(fc_requested=739e6, fc_programmed=739e6,
                     fs_programmed=1.92e6)
    cells = [_cell(277)]
    # frame 1: no key; frame 2: toggle fifo + select; frame 3: quit
    scr = FakeScreen([-1, "f", "j", -1, "q"])
    calls = []

    def process_for(seconds):
        calls.append(seconds)
        return True                   # stream never ends: only 'q' exits

    tui_loop(scr, process_for, gs, lambda: cells)
    assert len(calls) >= 2            # loop ran multiple frames
    assert scr.erases >= 2 and scr.refreshes >= 2
    joined = "\n".join(scr.painted)
    assert "q quit" in joined and "Cell 277" in joined


def test_tui_loop_headless_stream_end():
    from lte_cell_scanner_tpu.tracker.tui import tui_loop

    gs = GlobalState(fc_requested=739e6, fc_programmed=739e6,
                     fs_programmed=1.92e6)
    scr = FakeScreen([])
    seen = []

    def process_for(seconds):
        seen.append(1)
        return len(seen) < 3          # stream ends on the 3rd frame

    tui_loop(scr, process_for, gs, lambda: [])
    assert len(seen) == 3


def test_run_tui_real_curses_under_pty():
    """run_tui itself -- curses.wrapper, real terminal init -- enters
    and exits via the 'q' key on a pty."""
    import os
    import pty
    import subprocess
    import sys
    import time

    child = (
        "from lte_cell_scanner_tpu.tracker.tui import run_tui\n"
        "from lte_cell_scanner_tpu.tracker.state import GlobalState\n"
        "gs = GlobalState(fc_requested=739e6, fc_programmed=739e6,\n"
        "                 fs_programmed=1.92e6)\n"
        "run_tui(lambda s: True, gs, lambda: [])\n"
        "print('TUI-EXITED-CLEANLY')\n")
    master, slave = pty.openpty()
    env = dict(os.environ)
    env["TERM"] = "xterm"
    env.setdefault("JAX_PLATFORMS", "cpu")
    proc = subprocess.Popen(
        [sys.executable, "-c", child], stdin=slave, stdout=slave,
        stderr=subprocess.PIPE, env=env, close_fds=True)
    os.close(slave)
    try:
        time.sleep(1.0)               # let curses init + first frame
        os.write(master, b"q")
        out = b""
        deadline = time.time() + 20
        while time.time() < deadline and proc.poll() is None:
            time.sleep(0.1)
        assert proc.poll() == 0, \
            f"run_tui child rc={proc.poll()}: {proc.stderr.read()[-2000:]}"
        try:
            out = os.read(master, 65536)
        except OSError:
            pass
        assert b"TUI-EXITED-CLEANLY" in out
    finally:
        if proc.poll() is None:
            proc.kill()
        os.close(master)
