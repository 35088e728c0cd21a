"""ctypes binding for the native ingest runtime (native/libingest.so).

The C++ library covers the reference's native sample path: LUT-based 8-bit
IQ conversion, a lock-free SPSC byte ring for the radio->host boundary
(with drop-based overflow recovery), and the producer trigger scan.  Every
entry point has a numpy fallback so the framework runs without the
compiled library; `ensure_built()` compiles it on demand with make/g++.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libingest.so"
_lib: Optional[ctypes.CDLL] = None


def ensure_built(quiet: bool = True) -> bool:
    """Build libingest.so if missing; returns availability."""
    if _LIB_PATH.exists():
        return True
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=quiet)
        return _LIB_PATH.exists()
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not ensure_built():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.iq_u8_to_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_int64]
    lib.ring_create.restype = ctypes.c_void_p
    lib.ring_create.argtypes = [ctypes.c_uint64]
    lib.ring_destroy.argtypes = [ctypes.c_void_p]
    for fn in ("ring_size", "ring_free"):
        getattr(lib, fn).restype = ctypes.c_uint64
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    for fn in ("ring_push", "ring_pop"):
        getattr(lib, fn).restype = ctypes.c_uint64
        getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_uint64]
    lib.ring_drop.restype = ctypes.c_uint64
    lib.ring_drop.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.find_trigger.restype = ctypes.c_int64
    lib.find_trigger.argtypes = [ctypes.c_double, ctypes.c_double,
                                 ctypes.c_int64, ctypes.c_double,
                                 ctypes.POINTER(ctypes.c_double)]
    lib.interp72.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                             ctypes.c_void_p]
    lib.rs_window_update.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p]
    _lib = lib
    return lib


def iq_u8_to_c64(raw: np.ndarray) -> np.ndarray:
    """u8 interleaved IQ -> complex64 on the (x-127)/128 grid."""
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    lib = get_lib()
    if lib is None:
        f = (raw.astype(np.float32) - 127.0) / 128.0
        return (f[0::2] + 1j * f[1::2]).astype(np.complex64)
    out = np.empty(raw.size, dtype=np.float32)
    lib.iq_u8_to_f32(raw.ctypes.data, out.ctypes.data, raw.size)
    return out.view(np.complex64)[: raw.size // 2].copy()


class SampleRing:
    """SPSC byte ring over raw IQ (reference sampbuf_sync_t role)."""

    def __init__(self, capacity_bytes: int = 1 << 24):
        self._lib = get_lib()
        if self._lib is None:
            raise RuntimeError("native ingest library unavailable")
        self._h = self._lib.ring_create(capacity_bytes)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.ring_destroy(self._h)
            self._h = None

    def size(self) -> int:
        return self._lib.ring_size(self._h)

    def push(self, data: np.ndarray) -> int:
        data = np.ascontiguousarray(data, dtype=np.uint8)
        return self._lib.ring_push(self._h, data.ctypes.data, data.size)

    def pop(self, n: int) -> np.ndarray:
        out = np.empty(n, dtype=np.uint8)
        got = self._lib.ring_pop(self._h, out.ctypes.data, n)
        return out[:got]

    def drop(self, n: int) -> int:
        return self._lib.ring_drop(self._h, n)


def find_trigger(ts0: float, step: float, n: int, target: float):
    """First trigger index in the block, or (-1, 0.0)."""
    lib = get_lib()
    late = ctypes.c_double(0.0)
    if lib is None:
        ts = (ts0 + step * np.arange(1, n + 1)) % 19200.0
        d = (ts - target + 9600.0) % 19200.0 - 9600.0
        hits = np.nonzero((np.abs(d) < 0.5) | ((d > 0) & (d < 3)))[0]
        if len(hits) == 0:
            return -1, 0.0
        return int(hits[0]), float(d[hits[0]])
    idx = lib.find_trigger(ts0, step, n, target, ctypes.byref(late))
    return int(idx), float(late.value)
