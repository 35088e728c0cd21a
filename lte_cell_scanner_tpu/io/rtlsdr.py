"""Live RTL-SDR capture source: a ctypes librtlsdr binding.

Behavioral contract: the reference's USB configuration and capture flow
-- config_usb (/root/reference/src/CellSearch.cpp:344-433: device-index
selection, sample rate round(1920000*correction), fs_programmed read
back, AGC gain mode, buffer reset, ~1.5 s AGC-settle discard) and
capture_data's live path (/root/reference/src/capbuf.cpp:117-186:
set_center_freq(round(fc_requested*correction)) with up to 5 retries,
E4000 PLL model (+58 Hz fudge) for the true programmed frequency,
(x-127)/128 unit scaling of the 8-bit IQ stream).

The binding is dependency-injected: ``RtlSdrSource(lib=...)`` accepts
any object with the librtlsdr function surface, so tests drive the
retry/settle/correction semantics against a fake without hardware, and
environments without the shared library fail with a clear message at
construction time only.

The reference reads via an async USB callback; this source uses
synchronous block reads (librtlsdr buffers internally) -- capture() is
a one-shot 80 ms read and stream() a generator of raw blocks for the
tracker's producer loop.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import time
from typing import Iterator, Optional, Tuple

import numpy as np

from ..constants import CAPLENGTH
from ..utils.rtl import iq_u8_to_complex
from .capture import CaptureSource
from .e4000 import fc_programmed_with_fudge

RTLSDR_TUNER_E4000 = 1  # enum rtlsdr_tuner (librtlsdr.h)

_AGC_SETTLE_BYTES = 2880000 * 2   # ~1.5 s at 1.92 Msps (CellSearch.cpp:431)
_SETTLE_BLOCK = 16 * 16384


def load_librtlsdr():
    """Load the librtlsdr shared library, or raise RuntimeError."""
    name = ctypes.util.find_library("rtlsdr")
    candidates = [name] if name else []
    candidates += ["librtlsdr.so.0", "librtlsdr.so", "librtlsdr.dylib"]
    for cand in candidates:
        if not cand:
            continue
        try:
            lib = ctypes.CDLL(cand)
        except OSError:
            continue
        _declare(lib)
        return lib
    raise RuntimeError(
        "librtlsdr not found -- live capture needs the rtl-sdr runtime "
        "(use --load/--sim for recorded/synthetic sources)")


def _declare(lib):
    """Declare the argument/return types actually used."""
    u32, i32, p = ctypes.c_uint32, ctypes.c_int, ctypes.c_void_p
    lib.rtlsdr_get_device_count.restype = u32
    lib.rtlsdr_get_device_name.restype = ctypes.c_char_p
    lib.rtlsdr_get_device_name.argtypes = [u32]
    lib.rtlsdr_open.restype = i32
    lib.rtlsdr_open.argtypes = [ctypes.POINTER(p), u32]
    lib.rtlsdr_close.argtypes = [p]
    lib.rtlsdr_set_sample_rate.restype = i32
    lib.rtlsdr_set_sample_rate.argtypes = [p, u32]
    lib.rtlsdr_get_sample_rate.restype = u32
    lib.rtlsdr_get_sample_rate.argtypes = [p]
    lib.rtlsdr_set_center_freq.restype = i32
    lib.rtlsdr_set_center_freq.argtypes = [p, u32]
    lib.rtlsdr_get_tuner_type.restype = i32
    lib.rtlsdr_get_tuner_type.argtypes = [p]
    lib.rtlsdr_set_tuner_gain_mode.restype = i32
    lib.rtlsdr_set_tuner_gain_mode.argtypes = [p, i32]
    lib.rtlsdr_reset_buffer.restype = i32
    lib.rtlsdr_reset_buffer.argtypes = [p]
    lib.rtlsdr_read_sync.restype = i32
    lib.rtlsdr_read_sync.argtypes = [p, ctypes.c_char_p, i32,
                                     ctypes.POINTER(i32)]


class RtlSdrSource(CaptureSource):
    """80 ms captures / continuous blocks from a live RTL2832 dongle."""

    def __init__(self, device_index: int = 0, correction: float = 1.0,
                 sample_rate: float = 1920000.0, lib=None,
                 sleep=time.sleep, agc_settle: bool = True):
        self._lib = lib if lib is not None else load_librtlsdr()
        self._sleep = sleep
        self.correction = correction
        self.device_index = max(0, device_index)

        n = self._lib.rtlsdr_get_device_count()
        if n == 0:
            raise RuntimeError("no RTL-SDR devices found")
        if self.device_index >= n:
            raise RuntimeError(
                f"device index {self.device_index} out of range "
                f"({n} device(s) present)")
        self.device_name = self._name(self.device_index)

        dev = ctypes.c_void_p()
        if self._lib.rtlsdr_open(ctypes.byref(dev), self.device_index) < 0:
            raise RuntimeError("unable to open RTL-SDR device")
        self._dev = dev

        # sample rate carries the correction factor too
        # (CellSearch.cpp:380) and the actually-programmed rate is read
        # back as fs_programmed (:385)
        if self._lib.rtlsdr_set_sample_rate(
                self._dev, int(round(sample_rate * correction))) < 0:
            raise RuntimeError("unable to set sampling rate")
        self.fs_programmed = float(
            self._lib.rtlsdr_get_sample_rate(self._dev))

        if self._lib.rtlsdr_set_tuner_gain_mode(self._dev, 0) < 0:
            raise RuntimeError("unable to enter AGC mode")
        if self._lib.rtlsdr_reset_buffer(self._dev) < 0:
            raise RuntimeError("unable to reset RTLSDR buffer")
        if agc_settle:
            self._discard(_AGC_SETTLE_BYTES)

    def _name(self, idx: int) -> str:
        try:
            raw = self._lib.rtlsdr_get_device_name(idx)
            return raw.decode() if isinstance(raw, bytes) else str(raw)
        except Exception:
            return "unknown"

    # -- low-level helpers --------------------------------------------------

    def _read_exact(self, n_bytes: int) -> bytes:
        buf = ctypes.create_string_buffer(n_bytes)
        n_read = ctypes.c_int(0)
        got = 0
        while got < n_bytes:
            chunk = ctypes.cast(ctypes.addressof(buf) + got,
                                ctypes.c_char_p)
            if self._lib.rtlsdr_read_sync(self._dev, chunk, n_bytes - got,
                                          ctypes.byref(n_read)) < 0:
                raise RuntimeError("synchronous read failed")
            if n_read.value <= 0:
                raise RuntimeError("short read; samples lost")
            got += n_read.value
        return buf.raw

    def _discard(self, n_bytes: int) -> None:
        """AGC settle: read and drop ~1.5 s (CellSearch.cpp:414-432)."""
        done = 0
        while done < n_bytes:
            self._read_exact(_SETTLE_BLOCK)
            done += _SETTLE_BLOCK

    def tune(self, fc_requested: float) -> float:
        """set_center_freq(round(fc*correction)) with up to 5 attempts,
        1 s apart (capbuf.cpp:122-131); returns fc_programmed from the
        E4000 PLL model (+58 Hz) or fc_requested for other tuners
        (capbuf.cpp:134-149)."""
        target = int(round(fc_requested * self.correction))
        n_fail = 0
        while self._lib.rtlsdr_set_center_freq(self._dev, target) < 0:
            n_fail += 1
            if n_fail >= 5:
                raise RuntimeError("unable to set center frequency")
            self._sleep(1)
        if self._lib.rtlsdr_get_tuner_type(self._dev) == RTLSDR_TUNER_E4000:
            return fc_programmed_with_fudge(fc_requested)
        return float(fc_requested)

    # -- CaptureSource interface --------------------------------------------

    def capture(self, fc_requested: float) -> Tuple[np.ndarray, float]:
        fc_programmed = self.tune(fc_requested)
        if self._lib.rtlsdr_reset_buffer(self._dev) < 0:
            raise RuntimeError("unable to reset RTLSDR buffer")
        raw = self._read_exact(CAPLENGTH * 2)
        return iq_u8_to_complex(np.frombuffer(raw, dtype=np.uint8)), fc_programmed

    def stream(self, block: int = 10000) -> Iterator[np.ndarray]:
        while True:
            raw = self._read_exact(block * 2)
            yield iq_u8_to_complex(np.frombuffer(raw, dtype=np.uint8))

    def close(self) -> None:
        if getattr(self, "_dev", None) is not None:
            self._lib.rtlsdr_close(self._dev)
            self._dev = None
