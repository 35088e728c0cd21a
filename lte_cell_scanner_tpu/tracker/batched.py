"""Batched device front end of the tracker: get_fd over (cells, symbols).

The reference runs one thread per tracked cell, each calling get_fd once
per OFDM symbol (/root/reference/src/tracker_thread.cpp:91-174: ICI
removal mixer, 2-sample rotation, 128-pt DFT, 72-subcarrier extraction,
bulk-phase + lateness compensation).  TPU-native design (SURVEY.md
section 2.4 "tracker thread"): all pending symbols of ALL tracked cells
become one [n_cells, n_symbols, 128] batch processed by a single jitted
program -- the mixers and DFTs are the tracker's FLOPs, and batching
them keeps the MXU/VPU busy instead of dispatching 128-sample ops one at
a time.  The sequential bulk-phase accumulator becomes an inclusive
cumulative sum of per-symbol phase increments.

The small per-symbol control-loop math (CE filtering, FOE/TOE blending,
MIB bookkeeping -- 12-element vectors) stays on host in float64
(cell_tracker.py), consuming the precomputed symbols.

Shapes are bucketed (symbol axis rounded up to a multiple of 32) so jit
caches a handful of programs instead of one per block size.

When the default JAX backend is the host CPU (no accelerator attached),
the same math runs as one vectorized numpy batch instead: the per-tick
jit dispatch + host<->device staging overhead (~5 ms) dwarfs the actual
FLOPs (a few thousand 128-pt FFTs take ~1 ms in numpy), so the numpy
path is what keeps the tracker realtime on a CPU-only box.  Identical
formulas in float64; `backend=` forces either path for parity tests.
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import numpy as np

from ..constants import FS_LTE

_CN = np.concatenate([np.arange(-36, 0), np.arange(1, 37)])
_BUCKET = 32


def _get_fd_core_impl(data, fo, late, n_samp_elapsed, valid, init_phase,
                      fc_requested, fc_programmed, fs_programmed):
    """data [B,S,128] complex; fo/late/n_samp_elapsed/valid [B,S];
    init_phase [B].  Returns (syms [B,S,72], final_phase [B])."""
    import jax.numpy as jnp

    cdt = data.dtype
    rdt = jnp.real(data).dtype
    n = jnp.arange(128, dtype=rdt)

    k_factor = (fc_requested - fo) / fc_programmed            # [B,S]
    mix = jnp.exp((-2j * jnp.pi) * fo[..., None] * n
                  / (fs_programmed * k_factor)[..., None])
    mixed = data * mix.astype(cdt)
    dft_in = jnp.roll(mixed, -2, axis=-1)
    dft_out = jnp.fft.fft(dft_in, axis=-1) / np.sqrt(128.0)
    syms = jnp.concatenate([dft_out[..., -36:], dft_out[..., 1:37]],
                           axis=-1)                           # [B,S,72]

    incr = 2 * jnp.pi * n_samp_elapsed * (16.0 / FS_LTE) * (-fo)
    incr = jnp.where(valid, incr, 0.0)
    phase = init_phase[:, None] + jnp.cumsum(incr, axis=1)    # [B,S]
    cn = jnp.asarray(_CN, dtype=rdt)
    comp = jnp.exp(1j * (phase[..., None]
                         - 2 * jnp.pi * late[..., None] / 128.0 * cn))
    syms = syms * comp.astype(cdt)

    final = init_phase + jnp.sum(incr, axis=1)
    final = (final + jnp.pi) % (2 * jnp.pi) - jnp.pi
    return syms, final


# safe_jit: on the axon TPU client complex buffers cannot cross the
# host<->device boundary; the wrapper crosses as (re, im) float planes
# (ops/boundary.py).  Everywhere else this IS jax.jit.
from ..ops.boundary import safe_jit  # noqa: E402

_get_fd_core = safe_jit(_get_fd_core_impl)


def _get_fd_block_core_impl(block, starts, fo, late, n_samp_elapsed,
                            valid, init_phase, fc_requested,
                            fc_programmed, fs_programmed):
    """_get_fd_core_impl with the [B,S,128] symbol windows gathered ON
    DEVICE from one shared raw block (+ appendix rows for symbols that
    straddled producer blocks).  Through a remote tunnel this is the
    difference between uploading the stream once (~1.6 MB per 200 k-
    sample tick) and uploading every cell's window copies (~6 MB/cell)
    -- the tracker's measured binding constraint is tunnel transfer
    bandwidth, not device compute (docs/SCALING.md round 4)."""
    import jax.numpy as jnp

    win = jnp.arange(128, dtype=starts.dtype)
    data = block[starts[..., None] + win]                    # [B,S,128]
    return _get_fd_core_impl(data, fo, late, n_samp_elapsed, valid,
                             init_phase, fc_requested, fc_programmed,
                             fs_programmed)


_get_fd_block_core = safe_jit(_get_fd_block_core_impl)


def n_samp_elapsed_of(sym_num: int, extended_cp: bool) -> int:
    """Samples consumed by this symbol (reference tracker_thread.cpp
    :121-131): extended CP 160, else 138 for symbol 0, 137 otherwise."""
    if extended_cp:
        return 128 + 32
    return 128 + 10 if sym_num == 0 else 128 + 9


def _nse_of_chunk(chunk, n_symb: int) -> np.ndarray:
    """Per-symbol sample strides for a PduChunk (n_samp_elapsed_of,
    vectorized over the chunk's running symbol index)."""
    n = len(chunk)
    if n_symb == 6:
        return np.full(n, 160.0)
    sym = (chunk.sym0 + np.arange(n)) % n_symb
    return np.where(sym == 0, 138.0, 137.0)


def _get_fd_native(cell_pdus: Sequence[Tuple[object, object]], state,
                   lib) -> List[np.ndarray]:
    """One native C call per cell (native/tracker_math.cpp get_fd_batch:
    mixer + radix-2 FFT-128 + phase compensation) -- the CPU fast path."""
    out: List[np.ndarray] = []
    fc_req = float(state.fc_requested)
    fc_prog = float(state.fc_programmed)
    fs_prog = float(state.fs_programmed)
    for proc, chunk in cell_pdus:
        m = len(chunk)
        data = np.ascontiguousarray(chunk.data, dtype=np.complex128)
        fo = np.ascontiguousarray(chunk.fo, dtype=np.float64)
        late = np.ascontiguousarray(chunk.late, dtype=np.float64)
        nse = _nse_of_chunk(chunk, proc.cell.n_symb_dl())
        o = np.empty((m, 72), np.complex128)
        final = lib.get_fd_batch(
            data.ctypes.data, m, fo.ctypes.data, late.ctypes.data,
            nse.ctypes.data, proc.bulk_phase_offset, fc_req, fc_prog,
            fs_prog, FS_LTE, o.ctypes.data)
        proc.bulk_phase_offset = float(final)
        out.append(o)
    return out


def _get_fd_numpy(cell_pdus: Sequence[Tuple[object, object]], state
                  ) -> List[np.ndarray]:
    """Vectorized numpy batch with the exact _get_fd_core math."""
    out: List[np.ndarray] = []
    n = np.arange(128.0)
    fc_req = float(state.fc_requested)
    fc_prog = float(state.fc_programmed)
    fs_prog = float(state.fs_programmed)
    for proc, chunk in cell_pdus:
        data, fo, late = chunk.data, chunk.fo, chunk.late
        nse = _nse_of_chunk(chunk, proc.cell.n_symb_dl())
        k_factor = (fc_req - fo) / fc_prog
        mix = np.exp((-2j * np.pi) * fo[:, None] * n
                     / (fs_prog * k_factor)[:, None])
        dft_in = np.roll(data * mix, -2, axis=-1)
        dft_out = np.fft.fft(dft_in, axis=-1) / np.sqrt(128.0)
        syms = np.concatenate([dft_out[:, -36:], dft_out[:, 1:37]], axis=-1)
        incr = 2 * np.pi * nse * (16.0 / FS_LTE) * (-fo)
        phase = proc.bulk_phase_offset + np.cumsum(incr)
        comp = np.exp(1j * (phase[:, None]
                            - 2 * np.pi * late[:, None] / 128.0 * _CN))
        final = proc.bulk_phase_offset + float(np.sum(incr))
        proc.bulk_phase_offset = float((final + np.pi) % (2 * np.pi)
                                       - np.pi)
        out.append(syms * comp)
    return out


_AUTO_BACKEND = None


def _auto_backend() -> str:
    global _AUTO_BACKEND
    if _AUTO_BACKEND is None:
        _AUTO_BACKEND = ("host" if jax.default_backend() == "cpu"
                         else "device")
    return _AUTO_BACKEND


def _native_lib():
    from ..io.native import get_lib
    return get_lib()


def _stage_block_inputs(cell_pdus: Sequence[Tuple[object, object]],
                        raw_block, block_seq: int, dtype):
    """Host staging shared by the batched device paths: per-cell symbol
    metadata padded to the (B, S) bucket, plus either the [B, S, 128]
    window copies (raw_block=None) or the extended raw block + per-
    symbol start indices for the on-device window gather.

    Returns (ext, data, starts, fo, late, nse, valid, init_phase);
    exactly one of ext/data is not None."""
    B = len(cell_pdus)
    s_max = max(len(c) for _, c in cell_pdus)
    S = -(-s_max // _BUCKET) * _BUCKET

    fo = np.zeros((B, S))
    late = np.zeros((B, S))
    nse = np.zeros((B, S))
    valid = np.zeros((B, S), dtype=bool)
    init_phase = np.zeros(B)
    use_block = raw_block is not None
    data = None if use_block else np.zeros((B, S, 128), dtype=dtype)
    starts = np.zeros((B, S), dtype=np.int32) if use_block else None
    appendix = [] if use_block else None
    n_app = 0
    L = len(raw_block) if use_block else 0
    for b, (proc, chunk) in enumerate(cell_pdus):
        m = len(chunk)
        if use_block:
            cs = chunk.start if (chunk.start is not None
                                 and chunk.block_seq == block_seq) \
                else np.full(m, -1, np.int64)
            ok = (cs >= 0) & (cs <= L - 128)
            row = np.empty(m, np.int32)
            row[ok] = cs[ok].astype(np.int32)
            n_bad = int(m - ok.sum())
            if n_bad:                      # straddlers / stale blocks
                row[~ok] = L + 128 * (n_app + np.arange(n_bad))
                appendix.append(np.ascontiguousarray(
                    chunk.data[~ok]).ravel())
                n_app += n_bad
            starts[b, :m] = row
        else:
            data[b, :m] = chunk.data
        fo[b, :m] = chunk.fo
        late[b, :m] = chunk.late
        nse[b, :m] = _nse_of_chunk(chunk, proc.cell.n_symb_dl())
        valid[b, :m] = True
        init_phase[b] = proc.bulk_phase_offset
    ext = None
    if use_block:
        # padding rows gather zeros from one trailing guard window;
        # ext is zero-padded to a 16 Ki-sample bucket so the program
        # compiles once per (B, S, bucket) shape, not per tick
        pad_at = L + 128 * n_app
        starts[~valid] = pad_at
        ext_len = -(-(pad_at + 128) // 16384) * 16384
        ext = np.zeros(ext_len, dtype)
        ext[:L] = np.asarray(raw_block, dtype)
        if n_app:
            ext[L: pad_at] = np.concatenate(appendix)
    return ext, data, starts, fo, late, nse, valid, init_phase


def batched_get_fd(cell_pdus: Sequence[Tuple[object, object]], state,
                   dtype=np.complex128, backend: str = "auto",
                   raw_block: np.ndarray = None, block_seq: int = -1
                   ) -> List[np.ndarray]:
    """Run get_fd for every (processor, PduChunk) pair in one batch call.

    Updates each processor's bulk_phase_offset and returns, per cell, an
    array [n_pdus, 72] of compensated frequency-domain symbols.
    backend: 'device' (jitted), 'native' (C runtime), 'numpy'
    (vectorized host), or 'auto' (host path when the default JAX backend
    is the host CPU -- native C when the library is available, numpy
    otherwise).

    raw_block/block_seq (device backend only): the producer block the
    chunks were framed from.  When given, the device program receives
    the block ONCE plus per-symbol start indices and gathers the
    128-sample windows on device; symbols framed from older blocks (or
    by chunk builders that carry no starts) ride in a small appendix of
    host-extracted windows.  Cuts the per-tick upload ~(1 + 6.7 per
    cell) -> ~1.7x of the raw stream bytes.
    """
    if backend == "auto":
        backend = _auto_backend()
    if backend == "host":
        lib = _native_lib()
        if lib is not None:
            return _get_fd_native(cell_pdus, state, lib)
        return _get_fd_numpy(cell_pdus, state)
    if backend == "numpy":
        return _get_fd_numpy(cell_pdus, state)

    use_block = raw_block is not None
    (ext, data, starts, fo, late, nse, valid, init_phase) = \
        _stage_block_inputs(cell_pdus, raw_block, block_seq, dtype)

    # host numpy in: safe_jit splits complex data into float planes at
    # the transfer point when the boundary is active (plain jit stages
    # the same arrays otherwise)
    if use_block:
        syms, final = _get_fd_block_core(
            ext, starts, fo, late, nse, valid, init_phase,
            np.float64(state.fc_requested),
            np.float64(state.fc_programmed),
            np.float64(state.fs_programmed))
    else:
        syms, final = _get_fd_core(
            data, fo, late, nse, valid, init_phase,
            np.float64(state.fc_requested),
            np.float64(state.fc_programmed),
            np.float64(state.fs_programmed))
    syms = np.asarray(syms)
    final = np.asarray(final)

    out: List[np.ndarray] = []
    for b, (proc, chunk) in enumerate(cell_pdus):
        proc.bulk_phase_offset = float(final[b])
        out.append(syms[b, : len(chunk)])
    return out
