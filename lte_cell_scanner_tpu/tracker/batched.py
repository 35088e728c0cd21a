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
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import numpy as np

from ..constants import FS_LTE

_CN = np.concatenate([np.arange(-36, 0), np.arange(1, 37)])
_BUCKET = 32


@jax.jit
def _get_fd_core(data, fo, late, n_samp_elapsed, valid, init_phase,
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


def n_samp_elapsed_of(sym_num: int, extended_cp: bool) -> int:
    """Samples consumed by this symbol (reference tracker_thread.cpp
    :121-131): extended CP 160, else 138 for symbol 0, 137 otherwise."""
    if extended_cp:
        return 128 + 32
    return 128 + 10 if sym_num == 0 else 128 + 9


def batched_get_fd(cell_pdus: Sequence[Tuple[object, List]], state,
                   dtype=np.complex128) -> List[np.ndarray]:
    """Run get_fd for every (processor, pdu-list) pair in one device call.

    cell_pdus: sequence of (TrackedCellProcessor, [SymbolPdu, ...]).
    Updates each processor's bulk_phase_offset and returns, per cell, an
    array [n_pdus, 72] of compensated frequency-domain symbols.
    """
    import jax.numpy as jnp

    B = len(cell_pdus)
    s_max = max(len(p) for _, p in cell_pdus)
    S = -(-s_max // _BUCKET) * _BUCKET

    data = np.zeros((B, S, 128), dtype=dtype)
    fo = np.zeros((B, S))
    late = np.zeros((B, S))
    nse = np.zeros((B, S))
    valid = np.zeros((B, S), dtype=bool)
    init_phase = np.zeros(B)
    for b, (proc, pdus) in enumerate(cell_pdus):
        ext = proc.cell.n_symb_dl() == 6
        for s, pdu in enumerate(pdus):
            data[b, s] = pdu.data
            fo[b, s] = pdu.frequency_offset
            late[b, s] = pdu.late
            nse[b, s] = n_samp_elapsed_of(pdu.sym_num, ext)
            valid[b, s] = True
        init_phase[b] = proc.bulk_phase_offset

    syms, final = _get_fd_core(
        jnp.asarray(data), jnp.asarray(fo), jnp.asarray(late),
        jnp.asarray(nse), jnp.asarray(valid), jnp.asarray(init_phase),
        jnp.asarray(float(state.fc_requested)),
        jnp.asarray(float(state.fc_programmed)),
        jnp.asarray(float(state.fs_programmed)))
    syms = np.asarray(syms)
    final = np.asarray(final)

    out: List[np.ndarray] = []
    for b, (proc, pdus) in enumerate(cell_pdus):
        proc.bulk_phase_offset = float(final[b])
        out.append(syms[b, : len(pdus)])
    return out
