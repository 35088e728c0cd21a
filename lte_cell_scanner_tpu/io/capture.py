"""Capture acquisition: record/replay and pluggable sample sources.

Behavioral contract: reference capture_data (/root/reference/src/
capbuf.cpp:81-200): 80 ms capture from the dongle or from a recorded
``capbuf_XXXX.it`` file (fields ``capbuf`` + ``fc``); ``--record`` writes
the same files.  Raw ``rtl_sdr``-format u8 files are supported through
utils.rtl.  Live SDR hardware is not present in this environment; the
``CaptureSource`` protocol is the seam where a librtlsdr binding would
plug in.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np

from ..cell import CpType
from ..constants import CAPLENGTH, FS_WORK
from ..utils.itfile import read_itfile, write_itfile
from ..utils.rtl import read_rtlsdr_file
from .e4000 import fc_programmed_with_fudge


class CaptureSource:
    """A source of 80 ms capture buffers."""

    fs_programmed: float = FS_WORK

    def capture(self, fc_requested: float) -> Tuple[np.ndarray, float]:
        """Return (capbuf[CAPLENGTH], fc_programmed)."""
        raise NotImplementedError

    def stream(self, block: int = 10000) -> Iterator[np.ndarray]:
        """Yield continuous sample blocks (tracker mode)."""
        raise NotImplementedError


class FileSource(CaptureSource):
    """Replay recorded captures: .it containers or raw rtl_sdr u8 files."""

    def __init__(self, paths, drop_seconds: float = 0.0,
                 repeat: bool = False, noise_power: Optional[float] = None,
                 rng: Optional[np.random.Generator] = None):
        self.paths = list(paths)
        self.drop_seconds = drop_seconds
        self.repeat = repeat
        self.noise_power = noise_power
        self.rng = rng or np.random.default_rng()
        self._idx = 0

    def _load(self, path: str) -> Tuple[np.ndarray, Optional[float]]:
        if path.endswith(".it"):
            d = read_itfile(path)
            fc = float(d["fc"][0]) if "fc" in d else None
            return d["capbuf"], fc
        return read_rtlsdr_file(path, self.drop_seconds), None

    def capture(self, fc_requested: float) -> Tuple[np.ndarray, float]:
        if self._idx >= len(self.paths):
            if not self.repeat:
                # ValueError (not StopIteration, which the iteration
                # protocol would swallow/mangle) so the CLI's error
                # handling prints a clean message
                raise ValueError("no more recorded captures")
            self._idx = 0
        buf, fc = self._load(self.paths[self._idx])
        self._idx += 1
        buf = buf[:CAPLENGTH]
        if self.noise_power is not None:
            n = (self.rng.normal(size=len(buf))
                 + 1j * self.rng.normal(size=len(buf))) \
                * np.sqrt(self.noise_power / 2)
            buf = buf + n
        return buf, fc_requested

    def stream(self, block: int = 10000) -> Iterator[np.ndarray]:
        while True:
            for path in self.paths:
                buf, _ = self._load(path)
                if self.noise_power is not None:
                    n = (self.rng.normal(size=len(buf))
                         + 1j * self.rng.normal(size=len(buf))) \
                        * np.sqrt(self.noise_power / 2)
                    buf = buf + n
                for i in range(0, len(buf), block):
                    yield buf[i: i + block]
            if not self.repeat:
                return


class SimSource(CaptureSource):
    """Synthetic eNodeB source (fault injection / self-test)."""

    def __init__(self, n_id_1: int = 92, n_id_2: int = 1,
                 cp_type: CpType = CpType.NORMAL, n_ports: int = 2,
                 snr_db: float = 10.0, freq_offset: float = 0.0,
                 load_factor: float = 0.5, seed: int = 0,
                 capture_ms: int = 80, coupled_fc: float = 0.0):
        """coupled_fc > 0 applies ``freq_offset`` through the
        coupled-crystal channel at that carrier (carrier AND sample
        clock offset together, sim.apply_coupled_offset); 0 = ideal
        clock, carrier mix only."""
        from ..sim import (apply_coupled_offset, apply_freq_offset, awgn,
                           create_dl_sig)

        self._coupled = bool(coupled_fc and freq_offset)
        self._fc = coupled_fc
        self._f_off = freq_offset
        self._snr_db = snr_db

        def chan(sig):
            if self._coupled:
                return apply_coupled_offset(sig, freq_offset, coupled_fc)
            return apply_freq_offset(sig, freq_offset)

        def make_nominal(ms, rng):
            return create_dl_sig(cp_type, ms, 0, n_id_1, n_id_2,
                                 load_factor, rng=rng, n_ports=n_ports)

        self._make_nominal = make_nominal
        self._make = lambda ms, rng: awgn(chan(make_nominal(ms, rng)),
                                          snr_db, rng=rng)
        self.rng = np.random.default_rng(seed)
        # >80 ms lengthens the incoherent fold (n_comb grows) -- the
        # detection-SNR "long-context" axis (SURVEY.md section 5)
        self.capture_ms = capture_ms

    def capture(self, fc_requested: float) -> Tuple[np.ndarray, float]:
        return self._make(self.capture_ms, self.rng), fc_requested

    def stream(self, block: int = 10000) -> Iterator[np.ndarray]:
        if not self._coupled:
            while True:
                buf = self._make(200, self.rng)
                for i in range(0, len(buf), block):
                    yield buf[i: i + block]
        # coupled-crystal streaming: the clock resampler carries the
        # fractional sample position across generated blocks, so the
        # timing drift accumulates continuously instead of resetting at
        # each 200 ms boundary (a per-block apply_coupled_offset would
        # snap timing back by fs*f_off/fc * 0.2s every block)
        from ..sim import ClockResampler, awgn

        rs = ClockResampler((self._fc - self._f_off) / self._fc)
        mixed_at = 0
        pending = np.zeros(0, np.complex128)
        while True:
            nominal = self._make_nominal(200, self.rng)
            # continuous mixer phase across blocks
            mixed = nominal * np.exp(
                1j * 2 * np.pi * self._f_off
                * (mixed_at + np.arange(len(nominal))) / FS_WORK)
            mixed_at += len(nominal)
            out = rs.push(mixed)
            if len(out):
                pending = np.concatenate([pending, awgn(out, self._snr_db,
                                                        rng=self.rng)])
            while len(pending) >= block:
                yield pending[:block]
                pending = pending[block:]


class CaptureSession:
    """Run-scoped capture numbering + the reference capture_data flow.

    The reference numbers capbuf_XXXX.it files with a function-static
    counter reset per process run (capbuf.cpp:94); a module-global here
    would silently misnumber files when one process performs two scans
    (library use, record-then-load).  Each scan/tracker run owns one
    session."""

    def __init__(self, data_dir: str = "."):
        self.data_dir = data_dir
        self._counter = 0

    def capture_data(self, fc_requested: float,
                     source: Optional[CaptureSource],
                     save_cap: bool = False,
                     use_recorded_data: bool = False,
                     tuner: str = "e4000",
                     index: Optional[int] = None
                     ) -> Tuple[np.ndarray, float]:
        """Capture or replay one buffer, optionally recording it.

        Returns (capbuf, fc_programmed).  A source that reports its own
        fc_programmed (e.g. the live RTL-SDR source, io/rtlsdr.py) is
        trusted; otherwise an E4000-style tuner emulates the PLL model
        (+58 Hz fudge, reference capbuf.cpp:134-149).

        ``index`` overrides the session counter for the capbuf_XXXX.it
        filename (and leaves the counter untouched): a multi-host scan
        must number each capture by its GLOBAL band index, so process p
        replays/records its own strided carriers rather than the first
        files of a full-band recording.
        """
        n = self._counter if index is None else index
        filename = os.path.join(self.data_dir, f"capbuf_{n:04d}.it")
        if use_recorded_data:
            d = read_itfile(filename)
            capbuf = d["capbuf"]
            fc_file = float(d["fc"][0])
            if fc_file != fc_requested:
                print(f"Warning: capture {filename} was taken at "
                      f"{fc_file / 1e6:.3f} MHz, "
                      f"not {fc_requested / 1e6:.3f}")
            fc_programmed = fc_requested
        else:
            if source is None:
                raise RuntimeError("no capture source available")
            capbuf, fc_programmed = source.capture(fc_requested)
            if fc_programmed is None or fc_programmed == fc_requested:
                fc_programmed = fc_programmed_with_fudge(fc_requested) \
                    if tuner == "e4000" else fc_requested
        if save_cap:
            write_itfile(filename, {
                "capbuf": np.asarray(capbuf, dtype=np.complex128),
                "fc": np.array([int(fc_requested)], dtype=np.int32)})
        if index is None:
            self._counter += 1
        return capbuf, fc_programmed


def capture_data(fc_requested: float, source: Optional[CaptureSource],
                 save_cap: bool = False, use_recorded_data: bool = False,
                 data_dir: str = ".", tuner: str = "e4000",
                 session: Optional[CaptureSession] = None
                 ) -> Tuple[np.ndarray, float]:
    """One-shot wrapper over CaptureSession.capture_data (numbering is
    per-session; pass `session` to keep it across calls)."""
    if session is None:
        session = CaptureSession(data_dir)
    return session.capture_data(fc_requested, source, save_cap,
                                use_recorded_data, tuner)
