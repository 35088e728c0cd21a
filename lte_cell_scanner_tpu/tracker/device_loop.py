"""Device-resident tracker tick: demod + CRS extraction on device.

Round-4 measurement (docs/SCALING.md) pinned the remote-tunnel tracker
to the LINK: with the raw-block upload already minimal, the residual
wire floor was the DOWNLOAD of every cell's [S, 72] compensated symbols
(~32 MB/s at 4 cells), shipped to the host solely so it could gather
the 12 CRS subcarriers per RS symbol and feed its control loops
(reference per-symbol loop: /root/reference/src/tracker_thread.cpp
:856-906 extracts CRS from each demodulated symbol; :176-393 runs the
per-RS-window statistics and FOE/TOE feedback on them).

This module moves the symbol CONSUMERS' data dependencies on device:

- the per-port CRS extraction (shift-table gather x conjugated-RS
  multiply) runs inside the same jitted program as the batched demod,
  so only the [n_rs, 12] raw channel-estimate rows come down
  (12/72 of the RS symbols' bins, and none of the non-RS symbols);
- the few SPECIAL symbols the host event loop actually reads -- the
  PSS/SSS sync-SNR pair at each half frame and the 4 PBCH symbols per
  frame (slot 1, syms 0-3) -- are gathered on device and downloaded as
  a dense [n_spec, 72] slab (~6% of symbols).

Everything downstream is UNCHANGED and stays in host float64: the
RS-window statistics, the sequential FOE/frame-timing register chain,
interp72 + pair interpolation, sync SNR and the 40 ms MIB re-decode run
through the exact same native/numpy code paths as the host-extract
design (cell_tracker.TrackedCellProcessor.process_device), which at 4
cells measure ~4x realtime of headroom on 2 CPU cores.  The deliberate
trade: the sequential feedback chain COULD also fold on device (a
lax.scan over windows), saving a further ~0.8 MB/s/cell of scalar
downloads, at the cost of f32 register drift vs the reference's double
math -- the measured wire budget (docs/SCALING.md round 5) shows the
CRS-row cut alone moves the 4-cell total below the tunnel's floor, so
the registers keep their exact f64 semantics.

Tunnel RPC discipline (measured with cProfile on the axon client):
device->host transfers cost ~40-50 ms PER ARRAY regardless of size --
the per-RPC round trip, not bandwidth, dominates small transfers.  The
program therefore returns ONE packed float vector (raw-CE planes +
special-row planes + final phases concatenated on device) and takes its
gather metadata as three packed arrays; masks ride in index signs.

Wire budget per second of 4-cell 2-port stream at 1.92 Msps (float32
planes): download was ~32 MB/s ([S,72] symbols), becomes
~12/72 * (2/7 of symbols) + 6% full rows ~= 4-5 MB/s; upload is
unchanged (~16 MB/s raw block + ~0.3 MB/s gather metadata).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from ..ops.boundary import safe_jit
from .batched import _get_fd_block_core_impl, _get_fd_core_impl, \
    _stage_block_inputs

_RS_BUCKET = 64        # rs-row / special-row axis rounding (compile cache)


def _extract_core_impl(ext_re, ext_im, data, starts, fln, init_phase,
                       fc_requested, fc_programmed, fs_programmed,
                       rs_pack, spec_idx, conj_planes):
    """Fused batched demod + CRS/special gather (ONE device program per
    tick, ONE packed output leaf).

    fln [B, 3, S]: (fo, late, nse) per symbol; padding rows have
    nse == 0, which doubles as the validity mask.  rs_pack [B, P, NR, 3]
    int32: per (cell, port) RS-row plan -- (symbol index, CRS frequency
    shift, conj-table row); masked rows have symbol index -1.  spec_idx
    [B, NQ] int32: sync/PBCH symbol indices, -1 = padding.  conj_planes
    [B, T, 12, 2]: the per-cell conjugated-RS table as float planes.

    Returns one float vector: [ce_re, ce_im, spec_re, spec_im, final]
    raveled in that order (host unpacks by the known static sizes)."""
    import jax
    import jax.numpy as jnp

    fo = fln[:, 0]
    late = fln[:, 1]
    nse = fln[:, 2]
    valid = nse > 0
    if ext_re is not None:
        # raw-block planes arrive in the narrowest exact wire dtype
        # (float16 for ADC-grid blocks: 8-bit dongle codes /128 are
        # exact in f16's 11-bit mantissa, halving the dominant upload)
        cdt = jnp.complex64 if ext_re.dtype != jnp.float64 \
            else jnp.complex128
        rdt0 = jnp.float32 if cdt == jnp.complex64 else jnp.float64
        ext = jax.lax.complex(ext_re.astype(rdt0), ext_im.astype(rdt0))
        syms, final = _get_fd_block_core_impl(
            ext, starts, fo, late, nse, valid, init_phase,
            fc_requested, fc_programmed, fs_programmed)
    else:
        syms, final = _get_fd_core_impl(
            data, fo, late, nse, valid, init_phase,
            fc_requested, fc_programmed, fs_programmed)
    rdt = jnp.real(syms).dtype

    # CRS rows: [B, P, NR, 72] symbol gather, then the 12-subcarrier
    # comb at stride 6 from the per-row shift
    rs_idx = rs_pack[..., 0]
    rs_mask = rs_idx >= 0
    rows = jnp.take_along_axis(
        syms[:, None, :, :], jnp.maximum(rs_idx, 0)[..., None], axis=2)
    cols = rs_pack[..., 1:2] + 6 * jnp.arange(12, dtype=rs_pack.dtype)
    vals = jnp.take_along_axis(rows, cols, axis=3)          # [B,P,NR,12]
    tab_re = jnp.take_along_axis(
        conj_planes[:, None, :, :, 0], rs_pack[..., 2:3], axis=2)
    tab_im = jnp.take_along_axis(
        conj_planes[:, None, :, :, 1], rs_pack[..., 2:3], axis=2)
    m = rs_mask[..., None].astype(rdt)
    ce_re = (jnp.real(vals) * tab_re - jnp.imag(vals) * tab_im) * m
    ce_im = (jnp.real(vals) * tab_im + jnp.imag(vals) * tab_re) * m

    sm = (spec_idx >= 0)[..., None].astype(rdt)
    spec = jnp.take_along_axis(
        syms, jnp.maximum(spec_idx, 0)[..., None], axis=1)
    return jnp.concatenate([
        ce_re.ravel(), ce_im.ravel(),
        (jnp.real(spec) * sm).ravel(), (jnp.imag(spec) * sm).ravel(),
        final.astype(rdt).ravel()])


_extract_core = safe_jit(_extract_core_impl)


def _bucket_up(n: int, b: int = _RS_BUCKET) -> int:
    return max(b, -(-n // b) * b)


def batched_tick_extract(cell_pdus: Sequence[Tuple[object, object]],
                         state, raw_block: np.ndarray = None,
                         block_seq: int = -1,
                         dtype=np.complex128) -> None:
    """Run one tracker tick for every (processor, PduChunk) pair with
    the demod + CRS extraction on device, then drive each processor's
    host control loops on the downloaded rows
    (TrackedCellProcessor.process_device).

    Mirrors batched_get_fd's staging (raw-block upload + on-device
    window gather when raw_block is given); adds the per-cell RS-row
    and special-row plans derived from each processor's running
    (slot, sym) counter -- the planner reads the counters, the
    processors advance them when applying the tick."""
    B = len(cell_pdus)
    ext, data, starts, fo, late, nse, valid, init_phase = \
        _stage_block_inputs(cell_pdus, raw_block, block_seq, dtype)
    fln = np.stack([fo, late, nse], axis=1)        # [B, 3, S]
    ext_re = ext_im = None
    if ext is not None:
        # narrowest exact wire dtype for the dominant upload: f16 for
        # ADC-grid blocks (real dongle streams; exact), else f64 planes
        # under x64 (CPU parity tests) or f32
        import jax as _jax
        from ..ops.corr_pallas import is_adc_grid
        if is_adc_grid(ext):
            wire_dt = np.float16
        elif _jax.config.jax_enable_x64:
            wire_dt = np.float64
        else:
            wire_dt = np.float32
        ext_re = np.ascontiguousarray(ext.real, wire_dt)
        ext_im = np.ascontiguousarray(ext.imag, wire_dt)
        ext = None

    # ---- per-cell structural plans (host-known label arithmetic) ----
    plans = []
    nr_max = 1
    nq_max = 1
    t_max = 1
    p_max = 1
    for proc, chunk in cell_pdus:
        m = len(chunk)
        c = proc.cell
        n_symb = c.n_symb_dl()
        start = proc.slot_num * n_symb + proc.sym_num
        k = start + np.arange(m)
        slots_a = (k // n_symb) % 20
        syms_a = k % n_symb
        sh_all = proc.rs_dl.shift_table[slots_a, syms_a]       # [m, 4]
        rs_sel = [np.nonzero(sh_all[:, p] >= 0)[0]
                  for p in range(c.n_ports)]
        sync = ((slots_a == 0) | (slots_a == 10)) \
            & ((syms_a == n_symb - 2) | (syms_a == n_symb - 1))
        pbch = (slots_a == 1) & (syms_a <= 3)
        spec_sel = np.nonzero(sync | pbch)[0]
        plans.append((slots_a, syms_a, sh_all, rs_sel, spec_sel, n_symb))
        nr_max = max(nr_max, *(len(s) for s in rs_sel)) \
            if rs_sel else nr_max
        nq_max = max(nq_max, len(spec_sel))
        t_max = max(t_max, 20 * n_symb)
        p_max = max(p_max, c.n_ports)

    NR = _bucket_up(nr_max)
    NQ = _bucket_up(nq_max)
    P = p_max
    rs_pack = np.zeros((B, P, NR, 3), np.int32)
    rs_pack[..., 0] = -1
    conj_planes = np.zeros((B, t_max, 12, 2), np.float64)
    spec_idx = np.full((B, NQ), -1, np.int32)
    for b, ((proc, chunk), plan) in enumerate(zip(cell_pdus, plans)):
        slots_a, syms_a, sh_all, rs_sel, spec_sel, n_symb = plan
        tabs = np.asarray(proc._rs_conj).reshape(20 * n_symb, 12)
        conj_planes[b, : 20 * n_symb, :, 0] = tabs.real
        conj_planes[b, : 20 * n_symb, :, 1] = tabs.imag
        for p, sel in enumerate(rs_sel):
            n = len(sel)
            rs_pack[b, p, :n, 0] = sel
            rs_pack[b, p, :n, 1] = sh_all[sel, p]
            rs_pack[b, p, :n, 2] = slots_a[sel] * n_symb + syms_a[sel]
        spec_idx[b, : len(spec_sel)] = spec_sel

    packed = np.asarray(_extract_core(
        ext_re, ext_im, data, starts, fln, init_phase,
        np.float64(state.fc_requested), np.float64(state.fc_programmed),
        np.float64(state.fs_programmed), rs_pack, spec_idx, conj_planes))

    n_ce = B * P * NR * 12
    n_sp = B * NQ * 72
    ce_re = packed[:n_ce].reshape(B, P, NR, 12)
    ce_im = packed[n_ce: 2 * n_ce].reshape(B, P, NR, 12)
    sp_re = packed[2 * n_ce: 2 * n_ce + n_sp].reshape(B, NQ, 72)
    sp_im = packed[2 * n_ce + n_sp: 2 * (n_ce + n_sp)].reshape(B, NQ, 72)
    final = packed[2 * (n_ce + n_sp):]
    ce_raw = ce_re + 1j * ce_im
    spec_rows = sp_re + 1j * sp_im

    for b, ((proc, chunk), plan) in enumerate(zip(cell_pdus, plans)):
        slots_a, syms_a, sh_all, rs_sel, spec_sel, _n_symb = plan
        rows = [ce_raw[b, p, : len(sel)]
                for p, sel in enumerate(rs_sel)]
        proc.process_device(chunk, slots_a, syms_a, sh_all, rs_sel, rows,
                            spec_sel, spec_rows[b, : len(spec_sel)],
                            float(final[b]))
