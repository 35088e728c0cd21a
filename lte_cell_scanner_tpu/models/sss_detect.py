"""SSS detection (N_id_1, CP type, frame timing) and PSS/SSS fine FOE.

Behavioral contract: reference sss_detect_getce_sss / sss_detect_ml /
sss_detect / pss_sss_foe (/root/reference/src/searcher.cpp:516-850).

TPU-native design: all per-PSS-location work is batched -- the n_pss
5 ms-spaced PSS/SSS positions become a leading array axis, the 128-sample
DFT windows are gathered in one take, smoothing is a cumsum difference,
and the 168 x {order} x {CP} log-likelihood table is one vectorized einsum
against the whole SSS ROM table.  Fractional-timing planning (k_factor
strides, rounding) stays in float64 host scalars exactly as the reference's
double math does.

Two semantic variants are supported via ``compat``:

- "production" (default): the modern reference C++ semantics -- segment
  mixers and frequency conversions run at the true sample rate
  fs_programmed*k_factor (searcher.cpp:523, 741, 848).
- "golden": the shipped golden vectors' semantics (the MATLAB prototype and
  the old C++ API they were generated with, Matlab/sss_detect.m /
  pss_sss_foe.m): mixers at the nominal FS_LTE/16 rate, half-frame
  increment 9600*k (not 9600*k^2), frame_start wrap window of exactly
  19200 samples, and 1-based range upper bounds.  test/test_sss_detect.it
  verifies this path at 1e-12.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..cell import Cell, CpType
from ..constants import FS_LTE
from ..ops.boundary import (device_complex, needs_float_boundary,
                            safe_jit)
from ..ops.dsp import fshift_ramp, matlab_range
from .pss import PSS_FD
from .sss import SSS_FD
from .xcorr import round_i


def extract_dft_segments(capbuf, locs: np.ndarray, foc_freq: float,
                         fs_mix: float, n_sc: int = 62):
    """Batched extract_psss (reference searcher.cpp:516-530).

    For each integer location l in locs: take capbuf[l:l+128], apply the
    frequency-offset-correction ramp exp(j*2*pi*foc_freq*t/fs_mix)
    (restarting at phase 0 per segment), undo the 2-sample timing margin
    (cyclic left rotation), 128-pt unitary DFT, return the n_sc center
    subcarriers.  -> [len(locs), n_sc]
    """
    capbuf = jnp.asarray(capbuf)
    idx = np.asarray(locs, dtype=np.int64)[:, None] + np.arange(128)[None, :]
    return _dft_segments_idx(capbuf, jnp.asarray(idx), foc_freq, fs_mix,
                             n_sc)


def _dft_segments_idx(capbuf, idx, foc_freq, fs_mix, n_sc: int = 62):
    """Trace-compatible body of extract_dft_segments: gather indices
    precomputed on host, freq/fs as (possibly traced) scalars."""
    segs = capbuf[idx]                                    # [n, 128]
    ramp = fshift_ramp(128, foc_freq, fs_mix, dtype=capbuf.dtype)
    segs = segs * ramp[None, :]
    segs = jnp.roll(segs, -2, axis=-1)
    dft_out = jnp.fft.fft(segs, axis=-1) / jnp.sqrt(
        jnp.asarray(128.0, segs.real.dtype))
    h = n_sc // 2
    return jnp.concatenate([dft_out[:, -h:], dft_out[:, 1:h + 1]], axis=-1)


def _smooth13(h_raw):
    """13-tap boxcar over subcarriers with shrinking edges.

    h_sm[:, t] = mean(h_raw[:, max(0,t-6):min(61,t+6)+1])
    (reference searcher.cpp:584-588).

    Accumulated left-to-right (not as a cumsum difference) so the float
    rounding matches the reference's sequential window mean at the 1e-12
    golden tolerance.
    """
    n = h_raw.shape[-1]
    t = np.arange(n)
    lt = np.maximum(0, t - 6)
    rt = np.minimum(n - 1, t + 6)
    acc = jnp.zeros_like(h_raw)
    for i in range(13):
        idx = lt + i
        valid = jnp.asarray(idx <= rt)
        idxc = np.minimum(idx, n - 1)
        acc = acc + jnp.where(valid[None, :], h_raw[:, idxc], 0)
    return acc / jnp.asarray(rt - lt + 1, h_raw.real.dtype)


def _pad_locs(n_cap: int, locs: np.ndarray):
    """Pad a half-frame location list to a capacity that depends only on
    the capture length (one XLA compile per length, never per peak).

    The stride is 9600*k_factor, so with margin for up to +-2000 ppm of
    crystal error the capacity is n_cap/(9600*0.998)+2 -- still a pure
    function of n_cap.  Returns (locs_padded [cap], mask [cap]); padded
    entries point at sample 200 (safely inside any capture) and carry
    weight 0 downstream, contributing exact zeros to every sum.
    """
    cap_n = int(n_cap / (9600 * 0.998)) + 2
    n = len(locs)
    if n > cap_n:  # pathological ppm beyond the design margin
        cap_n = n
    out = np.full(cap_n, 200, dtype=np.int64)
    out[:n] = np.asarray(locs, dtype=np.int64)
    mask = np.zeros(cap_n, dtype=bool)
    mask[:n] = True
    return out, mask


def _getce_prepare(cell: Cell, n_cap: int, fc_requested: float,
                   fc_programmed: float, fs_programmed: float,
                   compat: str) -> Tuple[np.ndarray, np.ndarray, float, float]:
    """Host half of sss_detect_getce_sss: the padded PSS DFT location
    list, its validity mask, and the per-peak mixer scalars.  Float64
    host arithmetic, exactly as the reference's double math."""
    peak_loc = float(cell.ind)
    peak_freq = cell.freq
    k_factor = (fc_requested - peak_freq) / fc_programmed
    fs_mix = FS_LTE / 16 if compat == "golden" else fs_programmed * k_factor

    # No room to the left for the SSS? skip right by 5 subframes.
    if peak_loc + 9 < 162:
        peak_loc += 9600 * k_factor
    # Upper bound: the golden vectors use the MATLAB 1-based bound, one
    # sample tighter than the C++ translation (searcher.cpp:562).
    stop = n_cap - 125 - 9 - (1 if compat == "golden" else 0)
    pss_loc_set = matlab_range(peak_loc, k_factor * 9600, float(stop))
    pss_locs = round_i(pss_loc_set)
    pss_dft_locs = pss_locs + 9 - 2

    # Pad the location list to a capture-length-only capacity: n_pss
    # itself depends on the peak position, and a per-peak shape would
    # trigger a fresh XLA compile per shape at runtime (measured 11 s
    # searcher stalls in the streaming tracker).  Padded rows carry
    # weight-0 masks, so every sum gains only exact zeros and the
    # results stay bit-identical to the unpadded math.
    locs, mask = _pad_locs(n_cap, pss_dft_locs)
    return locs, mask, peak_freq, fs_mix


def _extend_pad(locs: np.ndarray, mask: np.ndarray, rows: int):
    """Grow a padded (locs, mask) pair to `rows` entries (same padding
    convention as _pad_locs: location 200, mask False) so every peak of
    a batch shares one shape even when one peak overflowed the
    capture-length capacity (pathological ppm)."""
    if len(locs) >= rows:
        return locs, mask
    out_l = np.full(rows, 200, dtype=locs.dtype)
    out_l[: len(locs)] = locs
    out_m = np.zeros(rows, dtype=bool)
    out_m[: len(mask)] = mask
    return out_l, out_m


def sss_detect_getce_sss(cell: Cell, capbuf, fc_requested: float,
                         fc_programmed: float, fs_programmed: float,
                         compat: str = "production"):
    """Channel-compensated SSS estimates for both CP hypotheses
    (debugging/inspection helper; routes through the same fused core as
    sss_detect).  Returns (h1_np, h2_np, h1_nrm, h2_nrm, h1_ext,
    h2_ext), each length 62.
    """
    n_cap = int(capbuf.shape[0])
    args = _detect_device_inputs(cell, n_cap, fc_requested, fc_programmed,
                                 fs_programmed, compat)
    out = _detect_single(device_complex(capbuf), *args,
                         *_detect_rom_args())
    return out[:6]


def _getce_impl(capbuf, idx_pss, idx_ext, idx_nrm, mask, freq, fs_mix,
                pss_fd_conj):
    """Device portion of sss_detect_getce_sss (one traced program,
    compiles once per capture length): PSS channel estimates, 13-tap
    smoothing, noise power, SSS extraction at both CP offsets, and the
    inverse-noise MMSE combine into h1 (even half-frames) / h2 (odd).
    Rows where mask is False are padding and contribute exact zeros."""
    h_raw = _dft_segments_idx(capbuf, idx_pss, -freq, fs_mix) \
        * pss_fd_conj[None]
    h_sm = _smooth13(h_raw)
    resid = h_sm - h_raw
    pss_np = jnp.mean(jnp.real(resid) ** 2 + jnp.imag(resid) ** 2, axis=-1)
    sss_ext_raw = _dft_segments_idx(capbuf, idx_ext, -freq, fs_mix)
    sss_nrm_raw = _dft_segments_idx(capbuf, idx_nrm, -freq, fs_mix)

    # MMSE combining across half-frames with inverse-noise weights
    # (reference searcher.cpp:600-631).
    def combine(h, npv, m, nrm_raw, ext_raw):
        np_inv = jnp.where(m, 1.0 / npv, 0.0)[:, None]   # [n_half, 1]
        h2 = jnp.real(h) ** 2 + jnp.imag(h) ** 2
        np_est = 1.0 / (1.0 + jnp.sum(h2 * np_inv, axis=0))     # [62]
        w = jnp.conj(h) * np_inv
        nrm = np_est * jnp.sum(w * nrm_raw, axis=0)
        ext = np_est * jnp.sum(w * ext_raw, axis=0)
        return np_est, nrm, ext

    h1_np, h1_nrm, h1_ext = combine(h_sm[0::2], pss_np[0::2], mask[0::2],
                                    sss_nrm_raw[0::2], sss_ext_raw[0::2])
    h2_np, h2_nrm, h2_ext = combine(h_sm[1::2], pss_np[1::2], mask[1::2],
                                    sss_nrm_raw[1::2], sss_ext_raw[1::2])
    return h1_np, h2_np, h1_nrm, h2_nrm, h1_ext, h2_ext


@lru_cache(maxsize=1)
def _ml_tables() -> Tuple[np.ndarray, np.ndarray]:
    """SSS candidate tables for the ML stage, indexed by n_id_2:
    try12/try21 [3, 168, 124] float64 (slot-0|slot-10 and swapped)."""
    t = SSS_FD().astype(np.float64)                 # [168, 3, 2, 62]
    h1 = t[:, :, 0]                                 # [168, 3, 62]
    h2 = t[:, :, 1]
    try12 = np.concatenate([h1, h2], axis=-1).transpose(1, 0, 2).copy()
    try21 = np.concatenate([h2, h1], axis=-1).transpose(1, 0, 2).copy()
    return try12, try21


def _ml_impl(h1_np, h2_np, h1_nrm, h2_nrm, h1_ext, h2_ext, try12, try21):
    """Log-likelihood of all 168 N_id_1 x {h12,h21} x {normal,ext}
    hypotheses (reference searcher.cpp:636-693 loops per candidate).
    try12/try21: [168, 124] real candidate tables for this peak's n_id_2.
    Returns (log_lik_nrm [168,2], log_lik_ext [168,2])."""
    np12 = jnp.concatenate([h1_np, h2_np])          # [124]
    est_nrm = jnp.concatenate([h1_nrm, h2_nrm])     # [124]
    est_ext = jnp.concatenate([h1_ext, h2_ext])

    def loglik(est, trys):
        # phase-align the (real) candidate to the estimate, then Gaussian LL
        corr = jnp.sum(jnp.conj(est)[None, :] * trys, axis=1)     # [168]
        ang = jnp.arctan2(jnp.imag(corr), jnp.real(corr))
        rot = (jnp.cos(ang) - 1j * jnp.sin(ang))[:, None]
        diff = trys * rot - est[None, :]
        return -jnp.sum((jnp.real(diff) ** 2 + jnp.imag(diff) ** 2)
                        / np12[None, :], axis=1)

    log_lik_nrm = jnp.stack([loglik(est_nrm, try12), loglik(est_nrm, try21)],
                            axis=1)
    log_lik_ext = jnp.stack([loglik(est_ext, try12), loglik(est_ext, try21)],
                            axis=1)
    return log_lik_nrm, log_lik_ext


def sss_detect_ml(cell: Cell, h1_np, h2_np, h1_nrm, h2_nrm, h1_ext, h2_ext):
    """Per-peak ML stage over precomputed SSS estimates (public helper;
    the fused cores below run the same math inside one jitted program)."""
    try12, try21 = _ml_tables()
    return _ml_impl(h1_np, h2_np, h1_nrm, h2_nrm, h1_ext, h2_ext,
                    jnp.asarray(try12[cell.n_id_2]),
                    jnp.asarray(try21[cell.n_id_2]))


def _detect_impl(capbuf, locs, mask, freq, fs_mix,
                 n_id_2, pss_conj_all, try12_all, try21_all):
    """Fused device program: channel/SSS estimation (_getce_impl) plus the
    168 x 2 x 2 ML table (_ml_impl) for one peak.  n_id_2 is a traced
    scalar selecting rows of the ROM tables, so one compiled program
    serves every peak (and vmaps over a batch of peaks).  locs [rows]
    are the PSS DFT window starts; the three [rows, 128] gather maps
    (PSS window, extended-CP SSS at -160, normal-CP SSS at -137) are
    expanded on DEVICE -- 128x less host->device traffic."""
    base = jnp.arange(128, dtype=locs.dtype)[None, :]
    lc = locs[:, None]
    idx_pss = lc + base
    idx_ext = lc - (128 + 32) + base
    idx_nrm = lc - (128 + 9) + base
    ests = _getce_impl(capbuf, idx_pss, idx_ext, idx_nrm, mask, freq,
                       fs_mix, pss_conj_all[n_id_2])
    lln, lle = _ml_impl(*ests, try12_all[n_id_2], try21_all[n_id_2])
    return ests + (lln, lle)


def _detect_impl_multi(capbufs, ci, *args):
    """_detect_impl against a [C, n_cap] stack of captures; ci (traced)
    selects this peak's carrier -- lets one vmapped program refine the
    peaks of a whole band scan."""
    return _detect_impl(capbufs[ci], *args)


def _detect_ll_impl(*args):
    """Batch variant: only the two log-likelihood tables leave the
    device -- the per-peak SSS channel estimates (6 complex arrays) are
    intermediates the batch path never reads, and on a remote-tunnel
    device each extra output is transfer latency."""
    return _detect_impl(*args)[6:8]


def _detect_ll_impl_multi(*args):
    return _detect_impl_multi(*args)[6:8]


_detect_single = safe_jit(_detect_impl)
_detect_batch = safe_jit(jax.vmap(
    _detect_ll_impl,
    in_axes=(None, 0, 0, 0, 0, 0, None, None, None)))
_detect_batch_multi = safe_jit(jax.vmap(
    _detect_ll_impl_multi,
    in_axes=(None, 0, 0, 0, 0, 0, 0, None, None, None)))


def _decide_sss(cell: Cell, lln: np.ndarray, lle: np.ndarray,
                thresh2_n_sigma: float, fc_requested: float,
                fc_programmed: float, fs_programmed: float,
                compat: str) -> Cell:
    """Host decision half of sss_detect: CP type + frame timing from the
    log-likelihood tables, second-threshold acceptance (reference
    searcher.cpp:695-761).  Float64 host scalars."""
    if lln.max() > lle.max():
        log_lik, cp_type = lln, CpType.NORMAL
    else:
        log_lik, cp_type = lle, CpType.EXTENDED

    k_factor = (fc_requested - cell.freq) / fc_programmed
    # Sample-scale factor: 1 at the nominal rate; rescales LTE-timescale
    # constants to the dongle timescale (searcher.cpp:735).
    s = 16 / FS_LTE * fs_programmed * k_factor
    frame_start = cell.ind + (128 + 9 - 960 - 2) * s
    if log_lik[:, 0].max() > log_lik[:, 1].max():
        ll = log_lik[:, 0]
    else:
        ll = log_lik[:, 1]
        # golden/MATLAB: one half frame is 9600*k samples; the modern C++
        # applies the timescale factor twice (9600*k*s, searcher.cpp:741).
        frame_start += 9600 * k_factor * (1.0 if compat == "golden" else s)
    if compat == "golden":
        wrap_len = 2 * 9600.0            # MATLAB wrap(x, 0.5, 2*9600+0.5)
    else:
        wrap_len = (2 * 9600.0 - 0.5) * s + 0.5
    frame_start = (frame_start + 0.5) % wrap_len - 0.5

    n_id_1_est = int(np.argmax(ll))
    lik_final = ll[n_id_1_est]

    L = np.concatenate([lln.ravel(), lle.ravel()])
    lik_mean = L.mean()
    lik_var = L.var(ddof=1)

    cell_out = cell
    if lik_final >= lik_mean + np.sqrt(lik_var) * thresh2_n_sigma:
        cell_out = cell.evolve(n_id_1=n_id_1_est, cp_type=cp_type,
                               frame_start=float(frame_start))
    return cell_out


def _detect_device_inputs(cell: Cell, n_cap: int, fc_requested: float,
                          fc_programmed: float, fs_programmed: float,
                          compat: str):
    """Per-peak device inputs for _detect_impl (everything but capbuf and
    the shared ROM tables)."""
    locs, mask, freq, fs_mix = _getce_prepare(
        cell, n_cap, fc_requested, fc_programmed, fs_programmed, compat)
    return (locs.astype(np.int32), mask, freq, fs_mix, cell.n_id_2)


@lru_cache(maxsize=2)
def _detect_rom_args_for(boundary_active: bool):
    try12, try21 = _ml_tables()
    return (device_complex(np.conj(PSS_FD())), jnp.asarray(try12),
            jnp.asarray(try21))


def _detect_rom_args():
    # keyed on the boundary mode so toggling LTE_TPU_FLOAT_BOUNDARY in
    # one process (tests) cannot serve a stale ComplexPair/complex array
    return _detect_rom_args_for(needs_float_boundary())


def sss_detect(cell: Cell, capbuf, thresh2_n_sigma: float, fc_requested: float,
               fc_programmed: float, fs_programmed: float,
               return_extras: bool = False, compat: str = "production"):
    """Full SSS detection stage (reference searcher.cpp:696-761).

    Returns the updated Cell (n_id_1/cp_type/frame_start set on acceptance),
    plus an extras dict when requested.
    """
    n_cap = int(capbuf.shape[0])
    args = _detect_device_inputs(cell, n_cap, fc_requested, fc_programmed,
                                 fs_programmed, compat)
    out = _detect_single(device_complex(capbuf), *args,
                         *_detect_rom_args())
    h1_np, h2_np, h1_nrm, h2_nrm, h1_ext, h2_ext, log_lik_nrm, log_lik_ext \
        = out

    lln = np.asarray(log_lik_nrm, dtype=np.float64)
    lle = np.asarray(log_lik_ext, dtype=np.float64)
    cell_out = _decide_sss(cell, lln, lle, thresh2_n_sigma, fc_requested,
                           fc_programmed, fs_programmed, compat)

    if return_extras:
        extras: Dict[str, np.ndarray] = {
            "sss_h1_np_est": np.asarray(h1_np),
            "sss_h2_np_est": np.asarray(h2_np),
            "sss_h1_nrm_est": np.asarray(h1_nrm),
            "sss_h2_nrm_est": np.asarray(h2_nrm),
            "sss_h1_ext_est": np.asarray(h1_ext),
            "sss_h2_ext_est": np.asarray(h2_ext),
            "log_lik_nrm": lln,
            "log_lik_ext": lle,
        }
        return cell_out, extras
    return cell_out


def _bucket(n: int) -> int:
    """Round a batch size up to a power of two so the vmapped programs
    compile O(log n_peaks) times per capture length, not once per count."""
    b = 1
    while b < n:
        b *= 2
    return b


def _run_detect_batch(batch_fn, capbuf_args, cells_fc,
                      fs_programmed: float, compat: str):
    """Shared body of the detect batch paths: per-peak host prepare
    (once), re-pad to one shared row capacity (normally the
    capture-length capacity; a pathological-ppm peak can exceed it),
    bucket to a power of two (duplicating the first peak's inputs;
    discarded), run the vmapped program.  Returns (lln [n, 168, 2],
    lle [n, 168, 2]).  cells_fc: (cell, fc_requested, fc_programmed)
    triples; capbuf_args: leading device args (a single capture, or a
    capture stack + per-peak carrier index)."""
    n_cap = int(capbuf_args[0].shape[-1])
    preps = [(_getce_prepare(c, n_cap, fcr, fcp, fs_programmed, compat),
              c.n_id_2) for c, fcr, fcp in cells_fc]
    rows = max(len(p[0][0]) for p in preps)
    n = len(preps)
    preps = preps + [preps[0]] * (_bucket(n) - n)
    padded = [_extend_pad(locs, mask, rows)
              for (locs, mask, _f, _m), _ in preps]
    locs_b = np.stack([pl for pl, _ in padded]).astype(np.int32)
    mask_b = np.stack([pm for _, pm in padded])
    freq = np.array([p[0][2] for p in preps], dtype=np.float64)
    fs_mix = np.array([p[0][3] for p in preps], dtype=np.float64)
    n_id_2 = np.array([p[1] for p in preps], dtype=np.int64)
    lln, lle = batch_fn(*capbuf_args,
                        jnp.asarray(locs_b), jnp.asarray(mask_b),
                        jnp.asarray(freq), jnp.asarray(fs_mix),
                        jnp.asarray(n_id_2), *_detect_rom_args())
    return (np.asarray(lln, dtype=np.float64),
            np.asarray(lle, dtype=np.float64))


def sss_detect_batch(cells: Sequence[Cell], capbuf, thresh2_n_sigma: float,
                     fc_requested: float, fc_programmed: float,
                     fs_programmed: float, compat: str = "production"
                     ) -> List[Cell]:
    """sss_detect over a whole peak list as ONE device program.

    The reference (and refine_peaks before this) runs the SSS stage
    per peak; on an accelerator each tiny program pays a dispatch
    round-trip, which dominates the back half of cell_search.  Peaks are
    independent, so the fused detect core vmaps over them
    (_run_detect_batch), decided per peak on host exactly as the serial
    path."""
    if not cells:
        return []
    lln, lle = _run_detect_batch(
        _detect_batch, (device_complex(capbuf),),
        [(c, fc_requested, fc_programmed) for c in cells],
        fs_programmed, compat)
    return [_decide_sss(c, lln[i], lle[i], thresh2_n_sigma, fc_requested,
                        fc_programmed, fs_programmed, compat)
            for i, c in enumerate(cells)]


def sss_detect_batch_multi(cells: Sequence[Cell], capbufs,
                           carrier_idx: Sequence[int],
                           thresh2_n_sigma: float, fs_programmed: float,
                           compat: str = "production") -> List[Cell]:
    """sss_detect over the peaks of a whole BAND SCAN as one program.

    capbufs: [C, n_cap] stack of per-carrier captures; carrier_idx[i]
    names peak i's carrier.  Each Cell carries its own
    fc_requested/fc_programmed (filled by peak_search), so carriers with
    different tuning mix freely in one batch.
    """
    if not cells:
        return []
    n = len(cells)
    ci = np.asarray(list(carrier_idx) + [carrier_idx[0]]
                    * (_bucket(n) - n), dtype=np.int64)
    lln, lle = _run_detect_batch(
        _detect_batch_multi, (device_complex(capbufs), jnp.asarray(ci)),
        [(c, c.fc_requested, c.fc_programmed) for c in cells],
        fs_programmed, compat)
    return [_decide_sss(c, lln[i], lle[i], thresh2_n_sigma, c.fc_requested,
                        c.fc_programmed, fs_programmed, compat)
            for i, c in enumerate(cells)]


def _foe_prepare(cell: Cell, n_cap: int, fc_requested: float,
                 fc_programmed: float, fs_programmed: float, compat: str):
    """Host half of pss_sss_foe: SSS DFT locations, slot-number sequence,
    PSS-SSS distance, and the mixer/output-rate scalars."""
    k_factor = (fc_requested - cell.freq) / fc_programmed
    s = 16 / FS_LTE * fs_programmed * k_factor
    golden = compat == "golden"
    fs_mix = FS_LTE / 16 if golden else fs_programmed * k_factor
    fs_out = FS_LTE / 16 if golden else fs_programmed * k_factor

    if cell.cp_type is CpType.NORMAL:
        pss_sss_dist = int(round_i((128 + 9) * (k_factor if golden else s)))
        first_sss_dft = cell.frame_start + (960 - 128 - 9 - 128) \
            * (k_factor if golden else s)
    elif cell.cp_type is CpType.EXTENDED:
        # the modern C++ uses raw k here even though elsewhere it uses s
        # (searcher.cpp:783); identical at the nominal rate.
        pss_sss_dist = int(round_i((128 + 32) * k_factor))
        first_sss_dft = cell.frame_start + (960 - 128 - 32 - 128) \
            * (k_factor if golden else s)
    else:
        raise ValueError("cp_type must be decided before pss_sss_foe")

    first_sss_dft = (first_sss_dft + 0.5) % (9600 * 2) - 0.5
    if first_sss_dft - 9600 * k_factor > -0.5:
        first_sss_dft -= 9600 * k_factor
        sn0 = 10
    else:
        sn0 = 0

    stop = n_cap - 127 - pss_sss_dist - 100 - (1 if golden else 0)
    sss_dft_loc_set = matlab_range(
        first_sss_dft, 9600 * (k_factor if golden else s), float(stop))
    sss_locs = round_i(sss_dft_loc_set)
    n_sss = len(sss_locs)
    # sn alternates starting at sn0 for k=0 (reference searcher.cpp:789-814)
    sn_seq = np.array([(sn0 + 10 * k) % 20 for k in range(n_sss)]) // 10  # 0/1

    # Compensate the per-segment phase-restart between SSS and PSS windows
    # (both variants use the nominal rate here, searcher.cpp:832).
    phase = np.pi * -cell.freq / (FS_LTE / 16 / 2) * -pss_sss_dist
    seg_phase = complex(np.cos(phase), np.sin(phase))
    # pad to a capture-length-only capacity (see _getce_impl): padded
    # rows get weight 0, keeping the jitted shape peak-independent
    locs, mask = _pad_locs(n_cap, sss_locs)
    sn_pad = np.zeros(len(locs), dtype=np.int64)
    sn_pad[:n_sss] = sn_seq
    return (locs, mask, sn_pad, pss_sss_dist, seg_phase, cell.freq, fs_mix,
            fs_out)


def _expand_foe(locs: np.ndarray, mask: np.ndarray, sn_pad: np.ndarray,
                rows: int = 0):
    """Grow a padded FOE (locs, mask, sn) triple to `rows` entries (the
    [rows, 128] gather maps are expanded on device in _foe_impl)."""
    if rows:
        locs, mask = _extend_pad(locs, mask, rows)
        if len(sn_pad) < rows:
            sn_pad = np.concatenate(
                [sn_pad, np.zeros(rows - len(sn_pad), dtype=sn_pad.dtype)])
    return locs.astype(np.int32), mask, sn_pad


def _foe_device_inputs(cell: Cell, n_cap: int, fc_requested: float,
                       fc_programmed: float, fs_programmed: float,
                       compat: str):
    """Per-peak device inputs for _foe_impl plus the host scalars needed
    to map M back to freq_fine."""
    locs, mask, sn_pad, pss_sss_dist, seg_phase, freq, fs_mix, fs_out = \
        _foe_prepare(cell, n_cap, fc_requested, fc_programmed,
                     fs_programmed, compat)
    locs, mask, sn_pad = _expand_foe(locs, mask, sn_pad)
    dev = (locs, mask, pss_sss_dist, freq, fs_mix, seg_phase, sn_pad,
           cell.n_id_1, cell.n_id_2)
    return dev, pss_sss_dist, fs_out


@lru_cache(maxsize=2)
def _foe_rom_args_for(boundary_active: bool):
    return (device_complex(np.conj(PSS_FD())),
            jnp.asarray(SSS_FD().astype(np.float64)))


def _foe_rom_args():
    return _foe_rom_args_for(needs_float_boundary())


def pss_sss_foe(cell: Cell, capbuf, fc_requested: float, fc_programmed: float,
                fs_programmed: float, compat: str = "production") -> Cell:
    """Fine frequency-offset estimation from PSS/SSS phase difference.

    Behavioral contract: reference pss_sss_foe (searcher.cpp:767-850),
    including its CP-specific pss_sss_dist formulas; the "golden" variant
    matches Matlab/pss_sss_foe.m (verified by test/test_sss_detect.it).
    """
    n_cap = int(capbuf.shape[0])
    dev, pss_sss_dist, fs_out = _foe_device_inputs(
        cell, n_cap, fc_requested, fc_programmed, fs_programmed, compat)
    M = _foe_single(device_complex(capbuf),
                    *(device_complex(np.asarray(a)) for a in dev),
                    *_foe_rom_args())
    M = complex(np.asarray(M))

    freq_fine = cell.freq + np.angle(M) / (2 * np.pi) * fs_out / pss_sss_dist
    return cell.evolve(freq_fine=float(freq_fine))


def _run_foe_batch(batch_fn, capbuf_args, cells_fc,
                   fs_programmed: float, compat: str):
    """Shared body of the FOE batch paths (see _run_detect_batch for the
    batching rules).  Returns (M [n] complex, per-peak
    (pss_sss_dist, fs_out) scalars)."""
    n_cap = int(capbuf_args[0].shape[-1])
    preps = [(_foe_prepare(c, n_cap, fcr, fcp, fs_programmed, compat),
              c.n_id_1, c.n_id_2) for c, fcr, fcp in cells_fc]
    rows = max(len(p[0][0]) for p in preps)
    n = len(preps)
    preps_b = preps + [preps[0]] * (_bucket(n) - n)
    ex = [_expand_foe(pr[0], pr[1], pr[2], rows) for pr, _, _ in preps_b]
    locs_b = np.stack([e[0] for e in ex])
    mask_b = np.stack([e[1] for e in ex])
    sn_pad = np.stack([e[2] for e in ex])
    dist = np.array([pr[3] for pr, _, _ in preps_b], dtype=np.int32)
    freq = np.array([pr[5] for pr, _, _ in preps_b], dtype=np.float64)
    fs_mix = np.array([pr[6] for pr, _, _ in preps_b], dtype=np.float64)
    seg_phase = np.array([pr[4] for pr, _, _ in preps_b],
                         dtype=np.complex128)
    n_id_1 = np.array([p[1] for p in preps_b], dtype=np.int64)
    n_id_2 = np.array([p[2] for p in preps_b], dtype=np.int64)
    M = np.asarray(batch_fn(
        *capbuf_args, jnp.asarray(locs_b), jnp.asarray(mask_b),
        jnp.asarray(dist), jnp.asarray(freq), jnp.asarray(fs_mix),
        device_complex(seg_phase), jnp.asarray(sn_pad),
        jnp.asarray(n_id_1),
        jnp.asarray(n_id_2), *_foe_rom_args()))
    scalars = [(pr[3], pr[7]) for pr, _, _ in preps[:n]]
    return M, scalars


def _apply_foe(cells: Sequence[Cell], M: np.ndarray, scalars) -> List[Cell]:
    out = []
    for i, (c, (pss_sss_dist, fs_out)) in enumerate(zip(cells, scalars)):
        freq_fine = c.freq + np.angle(complex(M[i])) / (2 * np.pi) \
            * fs_out / pss_sss_dist
        out.append(c.evolve(freq_fine=float(freq_fine)))
    return out


def pss_sss_foe_batch(cells: Sequence[Cell], capbuf, fc_requested: float,
                      fc_programmed: float, fs_programmed: float,
                      compat: str = "production") -> List[Cell]:
    """pss_sss_foe over a whole accepted-peak list as ONE device program
    (vmapped _foe_impl; see sss_detect_batch for the batching rules)."""
    if not cells:
        return []
    M, scalars = _run_foe_batch(
        _foe_batch, (device_complex(capbuf),),
        [(c, fc_requested, fc_programmed) for c in cells],
        fs_programmed, compat)
    return _apply_foe(cells, M, scalars)


def pss_sss_foe_batch_multi(cells: Sequence[Cell], capbufs,
                            carrier_idx: Sequence[int],
                            fs_programmed: float,
                            compat: str = "production") -> List[Cell]:
    """pss_sss_foe over the accepted peaks of a whole band scan as one
    vmapped program (see sss_detect_batch_multi for the capbufs/
    carrier_idx convention)."""
    if not cells:
        return []
    n = len(cells)
    ci = np.asarray(list(carrier_idx) + [carrier_idx[0]]
                    * (_bucket(n) - n), dtype=np.int64)
    M, scalars = _run_foe_batch(
        _foe_batch_multi, (device_complex(capbufs), jnp.asarray(ci)),
        [(c, c.fc_requested, c.fc_programmed) for c in cells],
        fs_programmed, compat)
    return _apply_foe(cells, M, scalars)


def _foe_impl(capbuf, locs, mask, pss_sss_dist, freq, fs_mix, seg_phase,
              sn_pad, n_id_1, n_id_2, pss_conj_all, sss_all):
    """Device portion of pss_sss_foe (one traced program, compiles once
    per capture length): PSS channel estimates + smoothing, SSS
    extraction/derotation, and the weighted conj(SSS)*H_pss accumulation
    (reference searcher.cpp:816-848).  mask=False rows are padding;
    n_id_1/n_id_2/pss_sss_dist are traced scalars; the [rows, 128]
    PSS/SSS gather maps expand on device from locs [rows]."""
    base = jnp.arange(128, dtype=locs.dtype)[None, :]
    idx_pss = locs[:, None] + pss_sss_dist + base
    idx_sss = locs[:, None] + base
    pss_fd_conj = pss_conj_all[n_id_2]
    sss_expect = sss_all[n_id_1, n_id_2][sn_pad]          # [cap, 62]
    h_raw = _dft_segments_idx(capbuf, idx_pss, -freq, fs_mix) \
        * pss_fd_conj[None]
    h_sm = _smooth13(h_raw)
    resid = h_sm - h_raw
    pss_np = jnp.mean(jnp.real(resid) ** 2 + jnp.imag(resid) ** 2, axis=-1)
    sss_raw = _dft_segments_idx(capbuf, idx_sss, -freq, fs_mix)
    sss_raw = sss_raw * seg_phase * sss_expect
    h2 = jnp.real(h_sm) ** 2 + jnp.imag(h_sm) ** 2
    w = h2 / (2 * h2 * pss_np[:, None] + (pss_np ** 2)[:, None])
    w = jnp.where(mask[:, None], w, 0.0)
    return jnp.sum(jnp.conj(sss_raw) * h_raw * w)


def _foe_impl_multi(capbufs, ci, *args):
    """_foe_impl against a [C, n_cap] capture stack (see
    _detect_impl_multi)."""
    return _foe_impl(capbufs[ci], *args)


_foe_single = safe_jit(_foe_impl)
_foe_batch = safe_jit(jax.vmap(
    _foe_impl,
    in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0, 0, None, None)))
_foe_batch_multi = safe_jit(jax.vmap(
    _foe_impl_multi,
    in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, None, None)))


# ---------------------------------------------------------------------------
# Fused SSS-detect + fine-FOE (round 4): ONE device program for both
# stages.  The serial chain's structure was sss_detect -> host decision
# -> pss_sss_foe, costing two blocking round trips on a remote device;
# on the tunnel each round trip is tens of ms against sub-ms of compute.
# The fusion re-derives the decision half of _decide_sss AND the whole
# _foe_prepare plan in traced form (CP/order/n_id_1 selection, frame
# timing, SSS DFT location grid, slot-number sequence) so the FOE runs
# in the same dispatch; shapes stay peak-independent because both
# stages' location lists already use the capture-length-only padding of
# _pad_locs.  The host still makes the AUTHORITATIVE accept/reject +
# cp/n_id_1/frame_start decision in float64 from the returned
# log-likelihood tables (exactly _decide_sss); the device's fused FOE
# result is used when its traced decision agrees (the normal case --
# both argmax the same tables), with a per-peak fallback to the staged
# pss_sss_foe otherwise (f32 ties on TPU).
# ---------------------------------------------------------------------------


def _round_half_away(x):
    return jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5))


def _detect_foe_impl(capbuf, locs, mask, freq, fs_mix, n_id_2,
                     ind, k_factor, s_scale, fs_out,
                     pss_conj_all, try12_all, try21_all, sss_all,
                     golden: bool = False):
    """Fused sss_detect + pss_sss_foe for one peak (traced; vmaps over
    a batch).  Scalar per-peak inputs: ind (coarse peak location),
    k_factor, s_scale (the searcher.cpp:735 timescale factor), fs_out.
    Returns (lln, lle, M, n_id_1_dev, use_norm_dev, late_dev)."""
    n_cap = capbuf.shape[0]
    ests = _detect_impl(capbuf, locs, mask, freq, fs_mix, n_id_2,
                        pss_conj_all, try12_all, try21_all)
    lln, lle = ests[6], ests[7]

    # --- traced _decide_sss core (searcher.cpp:695-761) ----------------
    use_norm = jnp.max(lln) > jnp.max(lle)
    ll = jnp.where(use_norm, lln, lle)                       # [168, 2]
    late = jnp.max(ll[:, 0]) <= jnp.max(ll[:, 1])
    ll_col = jnp.where(late, ll[:, 1], ll[:, 0])
    n_id_1 = jnp.argmax(ll_col)

    half_step = 9600.0 * k_factor * (1.0 if golden else s_scale)
    frame_start = ind + (128 + 9 - 960 - 2) * s_scale \
        + jnp.where(late, half_step, 0.0)
    wrap_len = 2 * 9600.0 if golden else (2 * 9600.0 - 0.5) * s_scale + 0.5
    frame_start = (frame_start + 0.5) % wrap_len - 0.5

    # --- traced _foe_prepare (searcher.cpp:767-814) --------------------
    ks = k_factor if golden else s_scale
    dist_n = _round_half_away((128 + 9) * ks)
    dist_e = _round_half_away((128 + 32) * k_factor)  # raw k: :783
    dist = jnp.where(use_norm, dist_n, dist_e)
    first = frame_start + jnp.where(
        use_norm, (960 - 128 - 9 - 128) * ks,
        (960 - 128 - 32 - 128) * ks)
    first = (first + 0.5) % (9600.0 * 2) - 0.5
    shift_back = first - 9600.0 * k_factor > -0.5
    first = jnp.where(shift_back, first - 9600.0 * k_factor, first)
    sn0_half = jnp.where(shift_back, 1, 0)               # sn0 // 10

    stride = 9600.0 * ks
    stop = n_cap - 127 - dist - 100 - (1 if golden else 0)
    cap_n = locs.shape[0]                                 # _pad_locs cap
    j = jnp.arange(cap_n)
    loc_set = first + j * stride
    foe_mask = loc_set <= stop                            # matlab_range
    foe_locs = jnp.where(
        foe_mask, _round_half_away(loc_set), 200.0).astype(locs.dtype)
    sn = (sn0_half + j) % 2

    phase = jnp.pi * -freq / (FS_LTE / 16 / 2) * -dist
    seg_phase = jax.lax.complex(jnp.cos(phase), jnp.sin(phase)) \
        .astype(capbuf.dtype)
    dist_i = dist.astype(locs.dtype)
    M = _foe_impl(capbuf, foe_locs, foe_mask, dist_i, freq, fs_mix,
                  seg_phase, sn, n_id_1, n_id_2,
                  pss_conj_all, sss_all)
    # dist_i + masked-location count let the host verify the device's
    # TIMING plan, not just the discrete decision: with x64 off the
    # traced scalars are f32, and a .5-boundary round could shift the
    # PSS-SSS distance or drop/add an SSS location without changing
    # (n_id_1, cp, late) -- the caller falls back to the staged f64
    # path when either deviates from the host plan (ADVICE r4)
    return (lln, lle, M, n_id_1, use_norm, late, dist_i,
            jnp.sum(foe_mask.astype(jnp.int32)))


def _detect_foe_impl_multi(capbufs, ci, *args, **kw):
    return _detect_foe_impl(capbufs[ci], *args, **kw)


_detect_foe_cache: Dict[Tuple[bool, bool], object] = {}


def _pack_detect_foe_outs(outs):
    """One output leaf (the tunnel charges a ~13-50 ms round trip PER
    transferred array): [B, 168*2*2 + 8] = lln | lle | Re M | Im M |
    n_id_1 | use_norm | late | dist | n_loc, all in the compute float
    dtype (the discrete fields are small integers, exact in f32)."""
    lln, lle, M, n_id_1, use_norm, late, dist, n_loc = outs
    rdt = lln.dtype
    b = lln.shape[0]
    cols = [lln.reshape(b, -1), lle.reshape(b, -1)] + [
        x.reshape(b, 1).astype(rdt)
        for x in (jnp.real(M), jnp.imag(M), n_id_1, use_norm, late,
                  dist, n_loc)]
    return jnp.concatenate(cols, axis=1)


def _unpack_detect_foe_outs(vec: np.ndarray):
    vec = np.asarray(vec)
    b = len(vec)
    h = 168 * 2
    lln = vec[:, :h].reshape(b, 168, 2)
    lle = vec[:, h: 2 * h].reshape(b, 168, 2)
    t = vec[:, 2 * h:]
    M = t[:, 0] + 1j * t[:, 1]
    return (lln, lle, M, np.rint(t[:, 2]).astype(np.int64),
            t[:, 3] > 0.5, t[:, 4] > 0.5,
            np.rint(t[:, 5]).astype(np.int64),
            np.rint(t[:, 6]).astype(np.int64))


def _detect_foe_fn(multi: bool, golden: bool):
    """Jitted fused batch program, one per (multi, golden) variant (the
    golden flag changes traced constants, so it is baked per closure
    rather than threaded as a static kwarg through vmap)."""
    key = (multi, golden)
    hit = _detect_foe_cache.get(key)
    if hit is None:
        if multi:
            def fn(capbufs, ci, *args):
                return _detect_foe_impl_multi(capbufs, ci, *args,
                                              golden=golden)
            in_axes = (None, 0) + (0,) * 9 + (None,) * 4
        else:
            def fn(capbuf, *args):
                return _detect_foe_impl(capbuf, *args, golden=golden)
            in_axes = (None,) + (0,) * 9 + (None,) * 4
        vm = jax.vmap(fn, in_axes=in_axes)
        hit = safe_jit(lambda *a: _pack_detect_foe_outs(vm(*a)))
        _detect_foe_cache[key] = hit
    return hit


def _sss_foe_scalars(cell: Cell, fc_requested: float, fc_programmed: float,
                     fs_programmed: float, compat: str):
    k_factor = (fc_requested - cell.freq) / fc_programmed
    s = 16 / FS_LTE * fs_programmed * k_factor
    fs_out = FS_LTE / 16 if compat == "golden" \
        else fs_programmed * k_factor
    return k_factor, s, fs_out


def sss_foe_batch_fused(cells: Sequence[Cell], capbuf,
                        thresh2_n_sigma: float, fs_programmed: float,
                        compat: str = "production",
                        skip_ids: frozenset = frozenset(),
                        capbuf_stack=None, carrier_idx=None
                        ) -> List[Cell]:
    """SSS detection AND fine FOE for a whole peak list in ONE device
    dispatch (the former sss_detect_batch + pss_sss_foe_batch pair,
    halving the back half's blocking round trips).  Peaks the SSS gate
    rejects come back with n_id_1 = -1 exactly as sss_detect_batch;
    accepted peaks carry freq_fine.  skip_ids cells are returned
    accepted-but-undecoded like refine_peaks' filter expects.

    capbuf_stack/carrier_idx: band-scan variant (same convention as
    sss_detect_batch_multi); capbuf is then unused."""
    if not cells:
        return []
    n = len(cells)
    multi = capbuf_stack is not None
    # peak_search fills every peak's fc_requested/fc_programmed
    cells_fc = [(c, c.fc_requested, c.fc_programmed) for c in cells]
    n_cap = int((capbuf_stack if multi else capbuf).shape[-1])
    preps = [(_getce_prepare(c, n_cap, fcr, fcp, fs_programmed, compat),
              c.n_id_2) for c, fcr, fcp in cells_fc]
    rows = max(len(p[0][0]) for p in preps)
    preps_b = preps + [preps[0]] * (_bucket(n) - n)
    cells_b = list(cells) + [cells[0]] * (_bucket(n) - n)
    fc_b = cells_fc + [cells_fc[0]] * (_bucket(n) - n)
    padded = [_extend_pad(locs, mask, rows)
              for (locs, mask, _f, _m), _ in preps_b]
    locs_b = np.stack([pl for pl, _ in padded]).astype(np.int32)
    mask_b = np.stack([pm for _, pm in padded])
    freq = np.array([p[0][2] for p in preps_b], dtype=np.float64)
    fs_mix = np.array([p[0][3] for p in preps_b], dtype=np.float64)
    n_id_2 = np.array([p[1] for p in preps_b], dtype=np.int64)
    sc = [_sss_foe_scalars(c, fcr, fcp, fs_programmed, compat)
          for c, fcr, fcp in fc_b]
    ind = np.array([float(c.ind) for c in cells_b])
    kf = np.array([x[0] for x in sc])
    ss = np.array([x[1] for x in sc])
    fso = np.array([x[2] for x in sc])

    args = (jnp.asarray(locs_b), jnp.asarray(mask_b), jnp.asarray(freq),
            jnp.asarray(fs_mix), jnp.asarray(n_id_2), jnp.asarray(ind),
            jnp.asarray(kf), jnp.asarray(ss), jnp.asarray(fso))
    roms = _detect_rom_args() + _foe_rom_args()[1:]
    golden = compat == "golden"
    if multi:
        ci = np.asarray(list(carrier_idx)
                        + [carrier_idx[0]] * (_bucket(n) - n),
                        dtype=np.int64)
        out = _detect_foe_fn(True, golden)(
            device_complex(capbuf_stack), jnp.asarray(ci), *args, *roms)
    else:
        out = _detect_foe_fn(False, golden)(
            device_complex(capbuf), *args, *roms)
    lln_b, lle_b, M_b, nid1_d, usenorm_d, late_d, dist_d, nloc_d = \
        _unpack_detect_foe_outs(out)

    result: List[Cell] = []
    for i, (c, fcr, fcp) in enumerate(cells_fc):
        lln = np.asarray(lln_b[i], np.float64)
        lle = np.asarray(lle_b[i], np.float64)
        cell = _decide_sss(c, lln, lle, thresh2_n_sigma, fcr, fcp,
                           fs_programmed, compat)
        if cell.n_id_1 < 0 or cell.n_id_cell() in skip_ids:
            result.append(cell)
            continue
        # host re-derivation of the decision AND the f64 timing plan
        # the device FOE'd against: discrete choice, PSS-SSS distance
        # and masked SSS-location count must all match before the
        # device M is trusted (the f32 traced scalars can round .5
        # boundaries differently from the host plan)
        host_norm = cell.cp_type is CpType.NORMAL
        host_late = bool(
            (lln if host_norm else lle)[:, 0].max()
            <= (lln if host_norm else lle)[:, 1].max())
        _hl, h_mask, _sn, h_dist, _ph, _fq, _fm, _fo = _foe_prepare(
            cell, n_cap, fcr, fcp, fs_programmed, compat)
        if (int(nid1_d[i]) == cell.n_id_1
                and bool(usenorm_d[i]) == host_norm
                and bool(late_d[i]) == host_late
                and int(dist_d[i]) == h_dist
                and int(nloc_d[i]) == int(np.sum(h_mask))):
            _k_factor, _s, fs_out = sc[i]
            freq_fine = cell.freq + np.angle(complex(M_b[i])) \
                / (2 * np.pi) * fs_out / h_dist
            result.append(cell.evolve(freq_fine=float(freq_fine)))
        else:
            # f32 tie on device: redo this peak's FOE staged (exact)
            cap_i = capbuf_stack[carrier_idx[i]] if multi else capbuf
            result.append(pss_sss_foe(cell, cap_i, fcr, fcp,
                                      fs_programmed, compat=compat))
    return result
